package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.conditions.{FilterSchema, UiSchema}
import graft.cursor.{Cursor, CursorMode}
import graft.format.{FieldMap, FormatterRegistry}
import graft.pipeline.ConfigPipeline
import graft.sources.{RestParams, SqlWhere, WarehouseRegistry}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors

/** Embedded HTTP service layer (reference: app/api.py — config-driven
  * pipeline runs + catalogue/schema endpoints over FastAPI; here the JDK
  * HttpServer, zero extra dependencies, sharing one SparkSession):
  *
  *   GET  /warehouses            registered warehouse metas (/connectors)
  *   GET  /schema/{resource}     UI field catalogue (/schema/{c}/{r})
  *   GET  /schema/unified/{r}    unified job|profile model fields
  *                               (/schema/unified/{resource}), with
  *                               ?only_prefilterable=true
  *   GET  /schema/auth/{w}       warehouse auth scheme + param names
  *                               (/schema/auth/{connector_name})
  *   POST /formatters/{id}       store a mapping-formatter spec
  *   GET  /formatters/{id}       read it back (/formatters endpoints)
  *   POST /run/pull              run a pull config, JSON result line
  *   POST /run/push              run a push config (PushResult counters)
  *   POST /debug/params          compile Condition/Cursor to origin params
  *                               (/debug/connector_params): both the REST
  *                               query-param and the SQL WHERE renderings
  *
  * Run endpoints delegate to [[Main.run]], so the CLI and the API accept
  * the SAME config documents. An optional API key gates every route
  * (header X-API-Key) — the reference ships its FastAPI app unauthenticated.
  */
final class ApiServer private (
    server: HttpServer,
    pool: java.util.concurrent.ExecutorService) {
  def port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object ApiServer {

  private val schemas =
    scala.collection.concurrent.TrieMap.empty[String, FilterSchema]

  /** Publish a resource's filterable-field catalogue (the reference reads
    * pydantic model metadata; here the embedding app registers specs). */
  def registerSchema(resource: String, schema: FilterSchema): Unit =
    schemas.put(resource, schema)

  def start(spark: SparkSession, apiKey: Option[String] = None): ApiServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pool = Executors.newFixedThreadPool(4, (r: Runnable) => {
      val t = new Thread(r, "graft-api")
      t.setDaemon(true)
      t
    })
    server.setExecutor(pool)
    val api = new ApiServer(server, pool)

    def handle(ex: HttpExchange): Unit = {
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      respondedFlag.set(false)
      try {
        // constant-time compare: a '==' on strings leaks the matching
        // prefix length through timing
        val authorized = apiKey.forall(k =>
          Option(ex.getRequestHeaders.getFirst("X-API-Key")).exists(h =>
            java.security.MessageDigest.isEqual(
              h.getBytes(UTF_8), k.getBytes(UTF_8))))
        // the playground page is static markup with no data — servable
        // without the key (browsers can't set headers on navigation); its
        // JS passes ?key= as X-API-Key to every gated JSON call
        // /routes is the same: a fixed self-description, zero data
        val isPlayground = method == "GET" &&
          (path == "/" || path.stripSuffix("/") == "/playground" ||
            path.stripSuffix("/") == "/routes")
        if (!authorized && !isPlayground)
          respond(ex, 401, """{"error":"unauthorized"}""")
        else route(ex, method, path)
      } catch {
        // post-response failures can't be reported to this client — a
        // second respond() would throw out of the handler and mask the
        // cause. Log and drop.
        case e: Exception if respondedFlag.get() =>
          System.err.println(s"[graft-api] post-response failure on $method $path: $e")
        case e: Exception =>
          // caller errors (bad config, unknown names, unparsable JSON)
          // are 4xx; anything else is a server fault and says so
          val status = e match {
            case _: IllegalArgumentException | _: MappingException |
                 _: com.fasterxml.jackson.core.JsonProcessingException => 400
            case _: NoSuchElementException => 404
            case _ => 500
          }
          respond(ex, status, JsonMethods.compact(JsonMethods.render(
            "error" -> String.valueOf(e.getMessage))))
      }
    }

    // one shared query-param parse for every route: split on '&'/'=' on
    // the RAW query, then percent-decode each key and value — a literal
    // '&'/'=' inside a value arrives escaped and must not split, while
    // zorder=a%2Cb has to reach the route as the decoded "a,b"
    def queryParams(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getRawQuery)
        .map(_.split("&").toSeq.flatMap(_.split("=", 2) match {
          case Array(k, v) => Some(dec(k) -> dec(v))
          case Array(k) if k.nonEmpty => Some(dec(k) -> "")
          case _ => scala.None
        }).toMap).getOrElse(Map.empty)

    def dec(s: String): String =
      java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

    def route(ex: HttpExchange, method: String, path: String): Unit =
      (method, path.stripSuffix("/").split("/").toList.drop(1)) match {
        case ("GET", Nil) | ("GET", List("playground")) =>
          respond(ex, 200, playgroundHtml, contentType = "text/html; charset=utf-8")

        case ("GET", List("routes")) =>
          // the self-describing route table (reference app/api.py keeps
          // its FastAPI routes discoverable the same way) — every
          // endpoint incl. the table-maintenance family, so a client
          // can find OPTIMIZE/ANALYZE/stats without reading source
          respond(ex, 200, routesJson)

        case ("GET", List("warehouses")) =>
          val metas = WarehouseRegistry.list().values.toSeq.sortBy(_.name).map { m =>
            ("name" -> m.name) ~ ("label" -> m.label) ~
              ("type" -> m.warehouseType) ~ ("format" -> m.format)
          }
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JArray(metas.toList))))

        case ("GET", List("schema", "unified", resource)) =>
          val only = queryParams(ex).get("only_prefilterable").contains("true")
          unifiedFieldsJson(resource, only) match {
            case Some(json) => respond(ex, 200, json)
            case scala.None => respond(ex, 404, JsonMethods.compact(JsonMethods.render(
              "error" -> s"unknown unified resource '$resource' (job|profile)")))
          }

        case ("GET", List("schema", "auth", whName)) =>
          authSchemaJson(whName) match {
            case Some(json) => respond(ex, 200, json)
            case scala.None => respond(ex, 404, JsonMethods.compact(JsonMethods.render(
              "error" -> s"unknown warehouse '$whName'")))
          }

        case ("GET", List("schema", resource)) =>
          schemas.get(resource) match {
            case Some(s) => respond(ex, 200, UiSchema.exportFields(s))
            case None => respond(ex, 404, JsonMethods.compact(JsonMethods.render(
              "error" -> s"no schema for '$resource'")))
          }

        case ("POST", List("formatters", id)) =>
          val j = JsonMethods.parse(body(ex))
          val mapping = (j \ "mapping") match {
            case JArray(items) => items.map { it =>
              ((it \ "from"), (it \ "to")) match {
                case (JString(f), JString(t)) => FieldMap(f, t)
                case _ => throw new IllegalArgumentException("mapping entries need string from/to")
              }
            }
            case _ => throw new IllegalArgumentException("body needs a mapping array")
          }
          FormatterRegistry.register(id, mapping)
          // json4s rendering, not interpolation: the id comes percent-
          // decoded off the URL and may contain quotes/control chars
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(
            ("id" -> id) ~ ("n_fields" -> mapping.length))))

        case ("GET", List("formatters", id)) =>
          FormatterRegistry.specs(id) match {
            case Some(m) =>
              val arr = m.map(f => ("from" -> f.from) ~ ("to" -> f.to))
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("id" -> id) ~ ("mapping" -> JArray(arr.toList)))))
            case None => respond(ex, 404, JsonMethods.compact(JsonMethods.render(
              "error" -> s"no formatter '$id'")))
          }

        case ("POST", List("run", cmd)) if cmd == "pull" || cmd == "push" =>
          respond(ex, 200, Main.run(spark, cmd, body(ex)))

        // SIMILARITY SEARCH over a registered resource's embedding
        // column — the matching endpoint of an HR-tech service (score a
        // profile against a corpus). Exact brute-force top-k per
        // request (one corpus scan, query broadcast); a deployment
        // serving high QPS loads a persisted index
        // (VectorIndexStore) behind the same contract instead.
        // Body: {"vector":[...], "k":5, "id_col":"vec_id",
        //        "vec_col":"embedding"}
        case ("POST", List("search", whName, resource)) =>
          implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
          val j = JsonMethods.parse(body(ex))
          val vec = (j \ "vector").extract[List[Double]]
          require(vec.nonEmpty, "search needs a non-empty 'vector'")
          val k = (j \ "k").extractOpt[Int].getOrElse(5)
          val idCol = (j \ "id_col").extractOpt[String].getOrElse("vec_id")
          val vecCol = (j \ "vec_col").extractOpt[String]
            .getOrElse("embedding")
          val corpus = WarehouseRegistry.instance(whName)
            .read(spark, resource)
          import spark.implicits._
          val q = Seq((-1L, vec)).toDF(idCol, vecCol)
          val hits = graft.operators.similarity.Similarity
            .knnBrute(corpus, q, idCol, vecCol, k)
            .orderBy("rk").collect().map { r =>
              ("id" -> r.getLong(1)) ~ ("cosine" -> r.getDouble(2)) ~
                ("rk" -> r.getInt(3))
            }.toList
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(
            ("warehouse" -> whName) ~ ("resource" -> resource) ~
              ("k" -> k) ~ ("hits" -> hits))))

        // table maintenance over registered ManifestWarehouses only —
        // the service never touches arbitrary filesystem paths
        case (m, "table" :: whName :: resource :: rest)
            if m == "GET" || m == "POST" =>
          val wh = WarehouseRegistry.instance(whName) match {
            case mw: graft.sources.ManifestWarehouse => mw
            case _ => throw new IllegalArgumentException(
              s"'$whName' is not a manifest warehouse")
          }
          val tablePath = s"${wh.baseDir}/$resource"
          (m, rest) match {
            case ("GET", List("versions")) =>
              // each version with its commit wall-time so clients can
              // drive TIMESTAMP-AS-OF reads (ManifestTable.readAsOf)
              val vs = graft.sources.ManifestTable.versions(tablePath)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("warehouse" -> whName) ~ ("resource" -> resource) ~
                  ("versions" -> vs) ~
                  ("commit_ts" -> vs.map(v => graft.sources.ManifestTable
                    .commitTimeMillis(tablePath, v))))))
            case ("POST", List("compact")) =>
              // ?zorder=colA,colB re-clusters along the z-curve during
              // the rewrite (OPTIMIZE ... ZORDER BY) so the fresh file
              // stats prune on every listed column
              val zcols = queryParams(ex).get("zorder")
                .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
                .getOrElse(Seq.empty)
              // ?mode=incremental folds only under-filled files and
              // carries compacted ones; ?where=<pred> scopes the
              // rewrite to stats-matching files (OPTIMIZE ... WHERE,
              // the compact-yesterday's-partition shape); together they
              // fold only the under-filled slice of the scope — the
              // O(new data in the partition) nightly job
              val where = queryParams(ex).get("where").filter(_.nonEmpty)
              val incremental =
                queryParams(ex).get("mode").contains("incremental")
              val v = where match {
                case Some(pred) =>
                  graft.sources.ManifestTable.compactWhere(spark, tablePath,
                    graft.plans.GraftSqlParser.whereConditions(spark, pred),
                    zorderBy = zcols,
                    minFill = if (incremental) Some(0.5) else None)
                case None if incremental =>
                  graft.sources.ManifestTable.compactIncremental(
                    spark, tablePath, zorderBy = zcols)
                case None =>
                  graft.sources.ManifestTable.compactCommit(
                    spark, tablePath, zorderBy = zcols)
              }
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("compacted_version" -> v) ~ ("zorder" -> zcols.toList))))
            case ("POST", List("analyze")) =>
              // column statistics for cost-based planning — the HTTP
              // door of SQL's ANALYZE TABLE: ?cols=a,b (subset) or
              // ?cols=all (every analyzable column); absent = the
              // metadata-only rows/bounds refresh. Incremental when the
              // sidecar's sketches still cover the live files.
              val spec = queryParams(ex).get("cols")
              val names = spec match {
                case None        => Seq.empty[String]
                case Some("all") => graft.sources.ColumnStats
                  .analyzableColumns(
                    graft.sources.ManifestTable.schemaAt(spark, tablePath))
                case Some(cs)    =>
                  cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
              }
              val st = graft.sources.ColumnStats.analyze(spark, tablePath, names)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("analyzed_version" -> st.version) ~ ("row_count" -> st.rows) ~
                  ("columns" -> st.cols.keys.toList.sorted))))
            case ("GET", List("stats")) =>
              // the persisted ANALYZE estimates, as the optimizer sees
              // them (sketch bytes omitted — internal merge state)
              graft.sources.ColumnStats.load(tablePath) match {
                case Some(st) =>
                  respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                    ("version" -> st.version) ~ ("row_count" -> st.rows) ~
                      ("columns" -> st.cols.toList.sortBy(_._1).map {
                        case (n, c) =>
                          ("name" -> n) ~ ("distinct" -> c.distinct) ~
                            ("nulls" -> c.nulls) ~ ("min" -> c.min) ~
                            ("max" -> c.max) ~ ("avg_len" -> c.avgLen) ~
                            ("max_len" -> c.maxLen)
                      }))))
                case None => respond(ex, 404, JsonMethods.compact(
                  JsonMethods.render(("error" -> "no statistics") ~
                    ("hint" -> "POST .../analyze?cols=all first"))))
              }
            case ("GET", List("constraints")) =>
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("warehouse" -> whName) ~ ("resource" -> resource) ~
                  ("constraints" ->
                    graft.sources.ManifestTable.constraints(tablePath).toList))))
            case ("POST", List("constraints")) =>
              // declare table CHECK constraints (Delta invariants):
              // validates existing rows first, then every subsequent
              // write through any surface enforces them in-scan; an
              // empty list drops all constraints
              implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
              val cons = (JsonMethods.parse(body(ex)) \ "constraints")
                .extract[List[String]]
              val v = graft.sources.ManifestTable.setConstraints(
                spark, tablePath, cons)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("constraints_version" -> v) ~ ("constraints" -> cons))))
            case ("GET", List("generated")) =>
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("warehouse" -> whName) ~ ("resource" -> resource) ~
                  ("generated" -> graft.sources.ManifestTable
                    .generatedColumns(tablePath)
                    .map { case (c, e) => ("column" -> c) ~ ("expr" -> e) }
                    .toList))))
            case ("POST", List("generated")) =>
              // declare generated columns: {"generated":[{"column":...,
              // "expr":...}]} — validates existing rows first; [] drops
              implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
              val gens = (JsonMethods.parse(body(ex)) \ "generated") match {
                case org.json4s.JArray(gs) => gs.map(g =>
                  ((g \ "column").extract[String], (g \ "expr").extract[String]))
                case _ => Nil
              }
              val v = graft.sources.ManifestTable.setGeneratedColumns(
                spark, tablePath, gens)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("generated_version" -> v) ~ ("n_columns" -> gens.size))))
            case ("POST", List("index", "bloom")) =>
              // build the per-file value Bloom index: ?cols=a,b
              val cols = queryParams(ex).get("cols")
                .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
                .getOrElse(Seq.empty)
              require(cols.nonEmpty, "index/bloom needs ?cols=<a,b,...>")
              val n = graft.sources.BloomIndex.build(spark, tablePath, cols)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("index" -> "bloom") ~ ("cols" -> cols.toList) ~
                  ("sidecars_written" -> n))))
            case ("POST", List("index", "trigram")) =>
              // build the per-file substring trigram index: ?col=x
              val c = queryParams(ex).get("col").getOrElse(
                throw new IllegalArgumentException(
                  "index/trigram needs ?col=<column>"))
              val n = graft.sources.TrigramIndex.build(spark, tablePath, c)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("index" -> "trigram") ~ ("col" -> c) ~
                  ("sidecars_written" -> n))))
            case ("POST", List("fold_deletes")) =>
              // targeted MoR maintenance: fold the delete ledger
              // rewriting only stats-affected files (ManifestTable
              // .compactDeletes)
              val v = graft.sources.ManifestTable.compactDeletes(
                spark, tablePath)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("folded_version" -> v))))
            case ("POST", List("tag")) =>
              // ?name=<tag>[&version=v]: pin (default: current head);
              // ?name=<tag>&drop=true: release
              val qp = queryParams(ex)
              val name = qp.getOrElse("name",
                throw new IllegalArgumentException("?name= is required"))
              if (qp.get("drop").exists(_.toBoolean))
                respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                  ("tag" -> name) ~ ("action" -> "dropped") ~
                    ("version" -> graft.sources.ManifestTable
                      .dropTag(tablePath, name)))))
              else
                respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                  ("tag" -> name) ~ ("action" -> "created") ~
                    ("version" -> graft.sources.ManifestTable.createTag(
                      tablePath, name, qp.get("version").map(_.toLong))))))
            case ("GET", List("tags")) =>
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("warehouse" -> whName) ~ ("resource" -> resource) ~
                  ("tags" -> graft.sources.ManifestTable.tags(tablePath)
                    .toSeq.sortBy(_._1).map { case (n, v) =>
                      ("name" -> n) ~ ("version" -> v) }))))
            case ("POST", List("widen_column")) =>
              // metadata-only TYPE WIDENING over HTTP: ?col=&type=
              // (same validation as ALTER COLUMN TYPE — widening only)
              val qp = queryParams(ex)
              val c = qp.getOrElse("col",
                throw new IllegalArgumentException("?col= is required"))
              val t = qp.getOrElse("type",
                throw new IllegalArgumentException("?type= is required"))
              val wide = org.apache.spark.sql.types.DataType.fromDDL(t)
              graft.sources.GraftCatalog.widenColumnAt(
                java.nio.file.Paths.get(tablePath), c, wide)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("column" -> c) ~ ("widened_to" -> wide.simpleString))))
            case ("GET", List("wap")) =>
              // staged-unpublished WAP ids (operator visibility before
              // a publish/abort decision)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("warehouse" -> whName) ~ ("resource" -> resource) ~
                  ("staged" -> graft.sources.ManifestTable
                    .stagedWaps(tablePath)))))
            case ("POST", List("wap", "publish")) =>
              // ?id=<wap id>: adopt every staged batch of the id in ONE
              // idempotent commit (the SQL ALTER TABLE ... PUBLISH WAP)
              val id = queryParams(ex).getOrElse("id",
                throw new IllegalArgumentException("?id= is required"))
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("wap_id" -> id) ~ ("action" -> "published") ~
                  ("version" -> graft.sources.ManifestTable
                    .publishWap(tablePath, id)))))
            case ("POST", List("wap", "abort")) =>
              val id = queryParams(ex).getOrElse("id",
                throw new IllegalArgumentException("?id= is required"))
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("wap_id" -> id) ~ ("action" -> "aborted") ~
                  ("released_files" -> graft.sources.ManifestTable
                    .abortWap(tablePath, id).length))))
            case ("POST", List("expire")) =>
              // ?keep=n (count-based) or ?hours=n (time-based — the
              // latest version always survives); mutually exclusive
              val qp = queryParams(ex)
              require(!(qp.contains("keep") && qp.contains("hours")),
                "?keep= and ?hours= are mutually exclusive")
              val (dropped, freed) = qp.get("hours") match {
                case Some(h) => graft.sources.ManifestTable.expireOlderThan(
                  tablePath, maxAgeMs = h.toLong * 3600000L)
                case None => graft.sources.ManifestTable.expire(
                  tablePath, keepLast = qp.get("keep").map(_.toInt).getOrElse(1))
              }
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("expired_versions" -> dropped) ~ ("freed_files" -> freed.length))))
            case ("POST", List("rename_column")) =>
              // COLUMN MAPPING over HTTP (same metadata-only commit the
              // SQL ALTER lands): ?from=<col>&to=<col>
              val from = queryParams(ex).getOrElse("from",
                throw new IllegalArgumentException("rename_column needs ?from="))
              val to = queryParams(ex).getOrElse("to",
                throw new IllegalArgumentException("rename_column needs ?to="))
              val v = graft.sources.ManifestTable.renameColumn(
                spark, tablePath, from, to)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("renamed_version" -> v) ~ ("from" -> from) ~ ("to" -> to))))
            case ("POST", List("drop_column")) =>
              // metadata-only DROP COLUMN: ?col=<col>
              val c = queryParams(ex).getOrElse("col",
                throw new IllegalArgumentException("drop_column needs ?col="))
              val v = graft.sources.ManifestTable.dropColumn(spark, tablePath, c)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("dropped_version" -> v) ~ ("column" -> c))))
            case ("GET", List("change_summary")) =>
              // change-feed SUMMARY over (?from, ?to]: per-type row
              // counts by version — metadata-sized JSON (row-level
              // changes stay on the /changes, SQL, and stream doors)
              val from = queryParams(ex).get("from").map(_.toLong).getOrElse(0L)
              val to = queryParams(ex).get("to").map(_.toLong).getOrElse(
                graft.sources.ManifestTable.versions(tablePath).max)
              val summary = graft.sources.ManifestTable
                .changeFeed(spark, tablePath, from, to)
                .groupBy("_commit_version", "_change_type").count()
                .orderBy("_commit_version", "_change_type").collect().map { r =>
                  ("version" -> r.getLong(0)) ~
                    ("change_type" -> r.getString(1)) ~
                    ("rows" -> r.getLong(2))
                }.toList
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("warehouse" -> whName) ~ ("resource" -> resource) ~
                  ("from" -> from) ~ ("to" -> to) ~ ("changes" -> summary))))
            case ("GET", List("history")) =>
              // DESCRIBE HISTORY: the audit rows as JSON
              val h = graft.sources.ManifestTable.history(spark, tablePath)
                .orderBy("version").collect().map { r =>
                  ("version" -> r.getLong(0)) ~
                    ("commit_ts" -> r.getLong(1)) ~
                    ("commit_id" -> Option(r.getString(2))) ~
                    ("n_files" -> r.getInt(3)) ~
                    ("n_delete_files" -> r.getInt(4)) ~
                    ("recorded_rows" -> r.getLong(5)) ~
                    ("files_added" -> r.getInt(6)) ~
                    ("files_removed" -> r.getInt(7)) ~
                    ("merge_keys" -> r.getString(9))
                }.toList
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("warehouse" -> whName) ~ ("resource" -> resource) ~
                  ("history" -> h))))
            case ("POST", List("restore")) =>
              // RESTORE ... TO VERSION ?to=<version> — forward commit,
              // history intact
              val to = queryParams(ex).get("to").map(_.toLong).getOrElse(
                throw new IllegalArgumentException("restore needs ?to=<version>"))
              val v = graft.sources.ManifestTable.restore(tablePath, to)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("restored_to" -> to) ~ ("new_version" -> v))))
            case ("POST", List("mv")) =>
              // CREATE MATERIALIZED VIEW over HTTP: this resource
              // becomes the maintained rollup of another resource of
              // the SAME manifest warehouse. Body: {"source": "<res>",
              // "dims": ["a"], "measures": ["m"]}
              implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
              val j = JsonMethods.parse(body(ex))
              val srcRes = requireSegment("mv source",
                (j \ "source").extract[String])
              val dims = (j \ "dims").extract[List[String]]
              val measures = (j \ "measures").extract[List[String]]
              require(dims.nonEmpty, "mv needs at least one dim")
              require(graft.sources.ManifestTable.versions(tablePath).isEmpty,
                s"mv target '$resource' already has commits")
              val srcPath = s"${wh.baseDir}/$srcRes"
              val srcV = graft.sources.ManifestTable.latestVersion(srcPath)
              val mv = graft.operators.IncrementalAgg.materialize(
                graft.sources.ManifestTable.read(spark, srcPath, Some(srcV)),
                dims, measures)
              graft.plans.GraftMaterializedView.createAt(
                spark, tablePath, srcPath, dims, measures, srcV, mv)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("mv" -> resource) ~ ("source" -> srcRes) ~
                  ("source_version" -> srcV))))
            case ("POST", List("mv", "refresh")) =>
              val (v, mode) = graft.plans.GraftMaterializedView
                .refreshAt(spark, tablePath)
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("mv" -> resource) ~ ("source_version" -> v) ~
                  ("mode" -> mode))))
            case ("POST", List("clone")) =>
              // zero-copy SHALLOW CLONE to another resource of the SAME
              // manifest warehouse: ?to=<resource> [&version=<v> clones
              // an older snapshot — a dev branch of last week's table]
              val to = requireSegment("clone target",
                queryParams(ex).get("to").getOrElse(throw
                  new IllegalArgumentException("clone needs ?to=<resource>")))
              val v = graft.sources.ManifestTable.cloneShallow(
                tablePath, s"${wh.baseDir}/$to",
                queryParams(ex).get("version").map(_.toLong))
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("cloned_to" -> to) ~ ("clone_version" -> v))))
            case ("POST", List("merge")) =>
              // MERGE INTO the table from a registered origin resource;
              // the optional tombstone rule is a (column, value) equality
              // — a declarative form, never an evaluated expression string
              implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
              val j = JsonMethods.parse(body(ex))
              val srcWh = WarehouseRegistry.instance(
                (j \ "origin" \ "warehouse").extract[String])
              val srcDf = srcWh.read(spark, (j \ "origin" \ "resource").extract[String])
              val keys = (j \ "keys").extract[List[String]]
              val deleteWhen = for {
                c <- (j \ "delete_when" \ "column").extractOpt[String]
                v <- (j \ "delete_when" \ "value").extractOpt[String]
              } yield org.apache.spark.sql.functions.col(c) === v
              // "strategy": "mor" commits delete files instead of
              // rewriting touched data files (merge-on-read)
              val v = (j \ "strategy").extractOpt[String] match {
                case Some("mor") => graft.sources.ManifestTable.mergeMoR(
                  spark, tablePath, srcDf, keys, deleteWhen)
                case Some("cow") | None => graft.sources.ManifestTable.merge(
                  spark, tablePath, srcDf, keys, deleteWhen)
                case Some(other) => throw new IllegalArgumentException(
                  s"unknown merge strategy: $other (cow|mor)")
              }
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("merged_version" -> v))))
            case ("GET", List("changes")) =>
              // bounded summary of the version-to-version change feed —
              // the row-level feed is data-sized and flows through pull
              // configs, not a JSON response
              val qp = queryParams(ex)
              val from = qp.getOrElse("from",
                throw new IllegalArgumentException("missing 'from'")).toLong
              val to = qp.getOrElse("to",
                throw new IllegalArgumentException("missing 'to'")).toLong
              val key = qp.getOrElse("key",
                throw new IllegalArgumentException("missing 'key'"))
              val counts = graft.sources.ManifestTable
                .changes(spark, tablePath, from, to, key)
                .groupBy("change_type").count().collect()
                .map(r => r.getString(0) -> r.getLong(1)).toMap
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                ("from" -> from) ~ ("to" -> to) ~
                  ("added" -> counts.getOrElse("added", 0L)) ~
                  ("removed" -> counts.getOrElse("removed", 0L)) ~
                  ("changed" -> counts.getOrElse("changed", 0L)))))
            case _ => respond(ex, 404, JsonMethods.compact(JsonMethods.render(
              "error" -> s"no table route: $m /${rest.mkString("/")}")))
          }

        case ("POST", List("debug", "params")) =>
          // build_connector_params debug surface: show BOTH origin-side
          // compilations of the same logical filter
          val j = JsonMethods.parse(body(ex))
          val conds = ConfigPipeline.parseConditions(j \ "conditions")
          val cursorField = (j \ "cursor" \ "field") match {
            case JString(s) => Some(s); case _ => None
          }
          val cursor = cursorField.map { _ =>
            val mode = (j \ "cursor" \ "mode") match {
              case JString("uid") => CursorMode.Uid
              case JString("created_at") => CursorMode.CreatedAt
              case _ => CursorMode.UpdatedAt
            }
            Cursor(mode,
              (j \ "cursor" \ "start") match { case JString(s) => Some(s); case _ => None },
              (j \ "cursor" \ "end") match { case JString(s) => Some(s); case _ => None },
              (j \ "cursor" \ "sort_by") match { case JString("desc") => false; case _ => true })
          }
          val restParams = conds.map(RestParams.condition) ++
            (cursorField zip cursor).toSeq.flatMap { case (f, c) => RestParams.cursor(f, c) }
          val sqlFrags = conds.map(SqlWhere.condition(_)) ++
            (cursorField zip cursor).toSeq.flatMap { case (f, c) => SqlWhere.cursor(f, c) }
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(
            ("rest_params" -> JObject(restParams.map { case (k, v) => k -> JString(v) }.toList)) ~
              ("sql_where" -> SqlWhere.and(sqlFrags).getOrElse("")))))

        case _ => respond(ex, 404, JsonMethods.compact(JsonMethods.render(
          "error" -> s"no route: $method $path")))
      }

    server.createContext("/", handle(_))
    server.start()
    api
  }

  /** GET /routes — the API's own catalogue (reference app/api.py: the
    * FastAPI app publishes its route table; this is the same
    * self-description for the JDK-HttpServer port). Static by design:
    * the table IS the dispatch contract, pinned by ApiServerSpec. */
  private[graft] val routesJson: String = {
    def r(method: String, pattern: String, what: String) =
      ("method" -> method) ~ ("path" -> pattern) ~ ("description" -> what)
    JsonMethods.compact(JsonMethods.render(JArray(List(
      r("GET", "/", "playground page (also /playground)"),
      r("GET", "/routes", "this route table"),
      r("GET", "/warehouses", "registered warehouse metas"),
      r("GET", "/schema/{resource}", "UI field catalogue"),
      r("GET", "/schema/unified/{job|profile}",
        "unified model fields (?only_prefilterable=true)"),
      r("GET", "/schema/auth/{warehouse}", "auth scheme + param names"),
      r("POST", "/formatters/{id}", "store a mapping-formatter spec"),
      r("GET", "/formatters/{id}", "read a mapping-formatter spec"),
      r("POST", "/run/pull", "run a pull config"),
      r("POST", "/run/push", "run a push config"),
      r("POST", "/search/{warehouse}/{resource}",
        "embedding top-k similarity search"),
      r("POST", "/debug/params",
        "compile conditions/cursor to origin params"),
      r("GET", "/table/{warehouse}/{resource}/versions",
        "versions + commit timestamps (time travel)"),
      r("POST", "/table/{warehouse}/{resource}/compact",
        "OPTIMIZE: compact live rows (?zorder=a,b ?mode=incremental " +
          "?where=<pred> for predicate-scoped rewrites)"),
      r("POST", "/table/{warehouse}/{resource}/analyze",
        "ANALYZE: column statistics for CBO (?cols=a,b|all; " +
          "incremental over appends)"),
      r("GET", "/table/{warehouse}/{resource}/stats",
        "persisted ANALYZE estimates as the optimizer sees them"),
      r("GET", "/table/{warehouse}/{resource}/constraints",
        "declared CHECK constraints"),
      r("POST", "/table/{warehouse}/{resource}/constraints",
        "declare CHECK constraints (validates existing rows)"),
      r("GET", "/table/{warehouse}/{resource}/generated",
        "declared generated columns"),
      r("POST", "/table/{warehouse}/{resource}/generated",
        "declare generated columns"),
      r("POST", "/table/{warehouse}/{resource}/index/bloom",
        "build per-file value Bloom index (?cols=a,b)"),
      r("POST", "/table/{warehouse}/{resource}/index/trigram",
        "build per-file substring trigram index (?col=x)"),
      r("POST", "/table/{warehouse}/{resource}/fold_deletes",
        "fold the MoR delete ledger (targeted rewrite)"),
      r("POST", "/table/{warehouse}/{resource}/expire",
        "expire old versions + sweep unreferenced files (?keep=n | ?hours=n)"),
      r("POST", "/table/{warehouse}/{resource}/tag",
        "pin/release a named version tag (?name= [&version=v] [&drop=true])"),
      r("GET", "/table/{warehouse}/{resource}/tags",
        "named version tags (retention never expires a tagged version)"),
      r("POST", "/table/{warehouse}/{resource}/widen_column",
        "metadata-only type widening (?col=&type=)"),
      r("GET", "/table/{warehouse}/{resource}/wap",
        "staged-unpublished write-audit-publish ids"),
      r("POST", "/table/{warehouse}/{resource}/wap/publish",
        "adopt a wap id's staged batches in one commit (?id=)"),
      r("POST", "/table/{warehouse}/{resource}/wap/abort",
        "drop a wap id's staged batches unpublished (?id=)"),
      r("POST", "/table/{warehouse}/{resource}/rename_column",
        "metadata-only column rename (?from=&to=)"),
      r("POST", "/table/{warehouse}/{resource}/drop_column",
        "metadata-only column drop (?col=)"),
      r("GET", "/table/{warehouse}/{resource}/change_summary",
        "per-version change-type row counts (?from=&to=)"),
      r("GET", "/table/{warehouse}/{resource}/history",
        "DESCRIBE HISTORY audit rows"),
      r("POST", "/table/{warehouse}/{resource}/restore",
        "RESTORE to an earlier version (?to=v, forward commit)"),
      r("POST", "/table/{warehouse}/{resource}/clone",
        "zero-copy shallow clone (?to=resource [&version=v])"),
      r("POST", "/table/{warehouse}/{resource}/mv",
        "become the maintained rollup of another resource " +
          "(body: source, dims, measures)"),
      r("POST", "/table/{warehouse}/{resource}/mv/refresh",
        "catch the rollup up (incremental over the change feed, " +
          "full recompute otherwise)"),
      r("POST", "/table/{warehouse}/{resource}/merge",
        "MERGE INTO from a registered origin (cow|mor)"),
      r("GET", "/table/{warehouse}/{resource}/changes",
        "bounded change-feed summary (?from=&to=&key=)")))))
  }

  /** A body- or query-supplied RESOURCE must be one plain path
    * segment: route-path resources can never contain slashes (the
    * router splits on them), but these fields could — and a value like
    * `../../etc` would escape the warehouse directory, registering or
    * probing arbitrary on-disk paths. Same segment rules as URLs. */
  private def requireSegment(name: String, v: String): String = {
    require(v.nonEmpty && !v.contains('/') && !v.contains('\\') &&
      v != "." && v != "..",
      s"$name must be a plain resource name (no path separators), got '$v'")
    v
  }

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  /** Marks the current exchange answered: a later exception must NOT
    * respond again (sendResponseHeaders would throw and mask the real
    * error). Thread-local, NOT HttpExchange.setAttribute — exchange
    * attributes live on the shared HttpContext, so one response would
    * mark every subsequent request as answered. Each exchange is handled
    * synchronously on one pool thread, which makes the thread-local
    * per-request; handle() resets it on entry. */
  private val respondedFlag = ThreadLocal.withInitial[java.lang.Boolean](() => false)

  private def respond(ex: HttpExchange, status: Int, payload: String,
      contentType: String = "application/json"): Unit = {
    val bytes = payload.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    respondedFlag.set(true)
    ex.close()
  }

  /** Playground page (reference app/main.py + templates/): a static
    * single-file UI over the JSON API — warehouse catalogue, config
    * editor wired to /run/pull and /run/push, and the param-compilation
    * debug view. No assets, no framework: the operational surface stays
    * the JSON API; this is the human window onto it. */
  private[graft] val playgroundHtml: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>graft playground</title>
      |<style>
      | body{font-family:sans-serif;margin:2em;max-width:60em}
      | textarea{width:100%;height:14em;font-family:monospace}
      | pre{background:#f4f4f4;padding:1em;overflow:auto}
      | button{margin-right:.5em}
      |</style></head><body>
      |<h1>graft playground</h1>
      |<p>API key: <input id="key" type="password" size="24">
      |<button onclick="setKey()">Use key</button>
      |<span id="keystate"></span></p>
      |<h2>Warehouses</h2><pre id="wh">loading…</pre>
      |<h2>Endpoints</h2>
      |<p>The full route table — including table maintenance
      |(<code>compact</code> = OPTIMIZE, <code>analyze</code> = ANALYZE,
      |<code>stats</code>, history, restore, clone) — is self-described at
      |<a href="/routes">/routes</a>.</p>
      |<pre id="routes">loading…</pre>
      |<h2>Run a config</h2>
      |<textarea id="cfg">{
      |  "origin": {"warehouse": "", "resource": ""},
      |  "target": {"warehouse": "", "resource": ""}
      |}</textarea><br>
      |<button onclick="run('pull')">Run pull</button>
      |<button onclick="run('push')">Run push</button>
      |<button onclick="post('/debug/params')">Compile params</button>
      |<h2>Result</h2><pre id="out">—</pre>
      |<script>
      |// The key never rides the URL: a ?key= query param lands in browser
      |// history, referers and access logs. It lives in sessionStorage and
      |// is entered in-page; a legacy ?key= link is honored once, then
      |// scrubbed from the address bar before any request is made.
      |const hdrs = {'Content-Type':'application/json'};
      |const legacy = new URLSearchParams(location.search).get('key');
      |if (legacy) {
      |  sessionStorage.setItem('graft_api_key', legacy);
      |  history.replaceState(null, '', location.pathname);
      |}
      |function applyKey(){
      |  const k = sessionStorage.getItem('graft_api_key');
      |  if (k) hdrs['X-API-Key'] = k; else delete hdrs['X-API-Key'];
      |  document.getElementById('keystate').textContent = k ? 'key set' : 'no key';
      |}
      |function setKey(){
      |  sessionStorage.setItem('graft_api_key',
      |    document.getElementById('key').value);
      |  document.getElementById('key').value='';
      |  applyKey(); load();
      |}
      |applyKey();
      |function load(){
      |  fetch('/warehouses',{headers:hdrs}).then(r=>r.text()).then(t=>{
      |    document.getElementById('wh').textContent=t;});
      |  fetch('/routes',{headers:hdrs}).then(r=>r.json()).then(rs=>{
      |    document.getElementById('routes').textContent=
      |      rs.map(r=>r.method.padEnd(5)+r.path+'  —  '+r.description)
      |        .join('\n');});}
      |load();
      |function post(path){
      |  fetch(path,{method:'POST',headers:hdrs,
      |    body:document.getElementById('cfg').value})
      |  .then(r=>r.text()).then(t=>{
      |    document.getElementById('out').textContent=t;});}
      |function run(cmd){post('/run/'+cmd);}
      |</script></body></html>""".stripMargin

  /** Reference prefilter metadata on the unified models
    * (core/models.py json_schema_extra blocks): field → allowed origin-side
    * operators. */
  private val jobPrefilter: Map[String, List[String]] = Map(
    "key" -> List("eq"), "reference" -> List("eq"), "board_key" -> List("in"),
    "created_at" -> List("gte", "lte"), "updated_at" -> List("gte", "lte"),
    "name" -> List("contains"), "tags" -> List("in"))
  private val profilePrefilter: Map[String, List[String]] = Map(
    "key" -> List("eq"), "reference" -> List("eq"), "source_key" -> List("in"),
    "created_at" -> List("gte", "lte"), "updated_at" -> List("gte", "lte"),
    "full_name" -> List("eq", "contains"), "text" -> List("contains"),
    "tags" -> List("in"))

  /** GET /schema/unified/{job|profile} (reference app/api.py:77
    * `unified_fields`): the unified model's fields straight off the
    * case-class Encoder schema — name, Spark SQL type, and the
    * reference's prefilter operator sets. */
  private def unifiedFieldsJson(
      resource: String, onlyPrefilterable: Boolean): Option[String] = {
    import org.apache.spark.sql.Encoders
    val spec = resource match {
      case "job"     => Some((Encoders.product[models.UnifiedJob].schema, jobPrefilter))
      case "profile" => Some((Encoders.product[models.UnifiedProfile].schema, profilePrefilter))
      case _         => scala.None
    }
    spec.map { case (schema, pre) =>
      val fields = schema.fields.toList
        .filter(f => !onlyPrefilterable || pre.contains(f.name))
        .map { f =>
          val base: JObject =
            ("name" -> f.name) ~ ("type" -> f.dataType.simpleString)
          pre.get(f.name).fold(base)(ops =>
            base ~ ("prefilter" -> ("operators" -> ops)))
        }
      JsonMethods.compact(JsonMethods.render(JArray(fields.map(identity[JValue]))))
    }
  }

  /** GET /schema/auth/{warehouse} (reference app/api.py:97
    * `connector_auth_schema`): which auth scheme the warehouse uses and
    * the parameters a client must render — names only, never values
    * (`secret` marks fields a UI should mask). */
  private def authSchemaJson(whName: String): Option[String] =
    WarehouseRegistry.list().get(whName).map { _ =>
      import graft.sources.{Auth, HttpAuth, RestWarehouse}
      val (scheme, fields) = WarehouseRegistry.instance(whName) match {
        case r: RestWarehouse => r.httpAuth match {
          case _: HttpAuth.NoAuth => ("none", Nil)
          case _: HttpAuth.ApiKey =>
            ("api_key", List("header_name" -> false, "key" -> true))
          case _: HttpAuth.Bearer => ("bearer", List("token" -> true))
          case _: HttpAuth.Token =>
            ("token", List("scheme" -> false, "token" -> true))
          case _: HttpAuth.OAuth2 =>
            ("oauth2_client_credentials", List("token_url" -> false,
              "client_id" -> false, "client_secret" -> true, "scope" -> false))
          case _: HttpAuth.OAuth1 =>
            ("oauth1", List("consumer_key" -> false, "consumer_secret" -> true,
              "token" -> false, "token_secret" -> true))
          case _: HttpAuth.Login =>
            ("login", List("login_url" -> false, "username" -> false,
              "password" -> true))
        }
        case wh => wh.auth match {
          case Auth.None => ("none", Nil)
          case _: Auth.ApiKey =>
            ("api_key", List("option_name" -> false, "key" -> true))
          case _: Auth.Token =>
            ("token", List("option_name" -> false, "scheme" -> false,
              "token" -> true))
          case _: Auth.Expiring => ("expiring_token", List("token" -> true))
          case _: Auth.Options => ("options", List("options" -> true))
        }
      }
      val arr = fields.map { case (n, secret) =>
        (("name" -> n) ~ ("secret" -> secret)): JValue
      }
      JsonMethods.compact(JsonMethods.render(
        ("scheme" -> scheme) ~ ("fields" -> JArray(arr))))
    }
}
