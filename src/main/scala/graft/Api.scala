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
      try {
        val authorized = apiKey.forall(k =>
          Option(ex.getRequestHeaders.getFirst("X-API-Key")).contains(k))
        if (!authorized) respond(ex, 401, """{"error":"unauthorized"}""")
        else route(ex, method, path)
      } catch {
        case e: Exception =>
          respond(ex, 400, JsonMethods.compact(JsonMethods.render(
            "error" -> String.valueOf(e.getMessage))))
      }
    }

    def route(ex: HttpExchange, method: String, path: String): Unit =
      (method, path.stripSuffix("/").split("/").toList.drop(1)) match {
        case ("GET", List("warehouses")) =>
          val metas = WarehouseRegistry.list().values.toSeq.sortBy(_.name).map { m =>
            ("name" -> m.name) ~ ("label" -> m.label) ~
              ("type" -> m.warehouseType) ~ ("format" -> m.format)
          }
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JArray(metas.toList))))

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

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def respond(ex: HttpExchange, status: Int, payload: String): Unit = {
    val bytes = payload.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
