package graft

import graft.conditions.{FieldSpec, FilterSchema, Op}
import graft.sources.{Http, ParquetWarehouse, WarehouseMeta, WarehouseRegistry}
import java.nio.file.Files

/** The embedded HTTP service layer (app/api.py analogue): catalogue,
  * schema, formatter CRUD, run endpoints sharing the CLI's config format,
  * and the debug param-compilation surface. */
class ApiServerSpec extends SparkSpecBase {

  test("warehouses / schema / formatters / run / debug endpoints") {
    WarehouseRegistry.clear()
    val outDir = Files.createTempDirectory("graft-api-").toString
    WarehouseRegistry.register(
      WarehouseMeta("apisrc", "API source", "lake", "parquet"),
      () => ParquetWarehouse("apisrc", sf0001))
    WarehouseRegistry.register(
      WarehouseMeta("apidst", "API target", "lake", "parquet"),
      () => ParquetWarehouse("apidst", outDir, ext = ""))
    ApiServer.registerSchema("orders", FilterSchema(Seq(
      FieldSpec("o_orderstatus", Set(Op.Eq, Op.In)),
      FieldSpec("o_orderdate", cursorTag = Some("created_at")))))

    val api = ApiServer.start(spark, apiKey = Some("k1"))
    val h = Map("X-API-Key" -> "k1")
    try {
      // unauthorized without the key
      val denied = intercept[graft.sources.RestHttpError] {
        Http.get(s"${api.baseUrl}/warehouses", Map.empty)
      }
      assert(denied.status == 401)

      // the playground page is static HTML and serves WITHOUT the key
      // (browsers can't add headers to a navigation); data stays gated
      val page = Http.get(s"${api.baseUrl}/", Map.empty)
      assert(page.contains("<title>graft playground</title>") &&
        page.contains("/run/") && page.contains("X-API-Key"))
      assert(Http.get(s"${api.baseUrl}/playground", Map.empty) == page)
      // the playground advertises the self-describing route table
      assert(page.contains("/routes"))

      // /routes is the API's own catalogue: static self-description,
      // keyless like the playground, and it MUST advertise the table
      // maintenance family (OPTIMIZE/ANALYZE/stats over HTTP)
      val routes = Http.get(s"${api.baseUrl}/routes", Map.empty)
      for (p <- Seq(
          "/table/{warehouse}/{resource}/compact",
          "/table/{warehouse}/{resource}/analyze",
          "/table/{warehouse}/{resource}/stats",
          "/table/{warehouse}/{resource}/history",
          "/table/{warehouse}/{resource}/restore",
          "/run/pull", "/search/{warehouse}/{resource}"))
        assert(routes.contains(p), s"/routes must list $p")
      assert(routes.contains("OPTIMIZE") && routes.contains("ANALYZE"))

      val whs = Http.get(s"${api.baseUrl}/warehouses", h)
      assert(whs.contains("\"apisrc\"") && whs.contains("\"apidst\""))

      val schema = Http.get(s"${api.baseUrl}/schema/orders", h)
      assert(schema.contains("o_orderstatus") && schema.contains("\"cursor\":\"created_at\""))
      assert(intercept[graft.sources.RestHttpError] {
        Http.get(s"${api.baseUrl}/schema/nope", h)
      }.status == 404)

      // formatter CRUD round-trip
      val put = Http.post(s"${api.baseUrl}/formatters/f1", h,
        """{"mapping":[{"from":"o_orderkey","to":"id"},{"from":"o_totalprice","to":"total"}]}""",
        "application/json")
      assert(put.contains("\"n_fields\":2"))
      val got = Http.get(s"${api.baseUrl}/formatters/f1", h)
      assert(got.contains("\"from\":\"o_orderkey\"") && got.contains("\"to\":\"total\""))

      // run a pull through the API — same config document as the CLI
      val res = Http.post(s"${api.baseUrl}/run/pull", h, s"""{
        "resource": "orders", "origin": "apisrc", "target": "apidst",
        "cursor": {"mode": "created_at", "field": "o_orderdate", "start": "1996-01-01"},
        "where": [{"field": "o_orderstatus", "op": "eq", "value": "O"}],
        "mapping": [{"from": "o_orderkey", "to": "id"}]
      }""", "application/json")
      assert(res.contains("\"rows\":") && res.contains("\"cursor_end\":"))
      assert(spark.read.parquet(s"$outDir/orders").count() > 0)

      // formatter + run in ONE call (reference run_pull_with_formatter,
      // app/api.py:226): the run config references the registered f1 by
      // id instead of carrying the mapping inline
      val resFmt = Http.post(s"${api.baseUrl}/run/pull", h, s"""{
        "resource": "orders", "origin": "apisrc", "target": "apidst",
        "cursor": {"mode": "created_at", "field": "o_orderdate", "start": "1996-01-01"},
        "formatter_id": "f1"
      }""", "application/json")
      assert(resFmt.contains("\"rows\":"))
      val cols = spark.read.parquet(s"$outDir/orders").columns.toSet
      assert(cols == Set("id", "total"), s"f1 mapping must apply: $cols")
      // unknown id fails loudly; mapping+formatter_id together is ambiguous
      assert(intercept[graft.sources.RestHttpError] {
        Http.post(s"${api.baseUrl}/run/pull", h, s"""{
          "resource": "orders", "origin": "apisrc", "target": "apidst",
          "cursor": {"mode": "created_at", "field": "o_orderdate"},
          "formatter_id": "nope"
        }""", "application/json")
      }.status / 100 == 4)
      assert(intercept[graft.sources.RestHttpError] {
        Http.post(s"${api.baseUrl}/run/pull", h, s"""{
          "resource": "orders", "origin": "apisrc", "target": "apidst",
          "cursor": {"mode": "created_at", "field": "o_orderdate"},
          "formatter_id": "f1",
          "mapping": [{"from": "o_orderkey", "to": "id"}]
        }""", "application/json")
      }.status / 100 == 4)

      // debug param compilation: both origin renderings of one filter
      val dbg = Http.post(s"${api.baseUrl}/debug/params", h, """{
        "conditions": [{"field": "segment", "op": "eq", "value": "GOLD"},
                       {"field": "name", "op": "contains", "value": "smith"}],
        "cursor": {"mode": "uid", "field": "id", "start": "100", "end": "900"}
      }""", "application/json")
      assert(dbg.contains("\"segment\":\"GOLD\"") && dbg.contains("\"name__contains\":\"smith\""))
      assert(dbg.contains("\"id_min\":\"100\"") && dbg.contains("\"id_max\":\"900\""))
      // quotes inside the JSON string arrive escaped
      assert(dbg.contains("""\"id\" >= 100 AND \"id\" <= 900"""))

      // malformed config is a 400, not a server crash
      assert(intercept[graft.sources.RestHttpError] {
        Http.post(s"${api.baseUrl}/run/pull", h, """{"resource": 7}""", "application/json")
      }.status == 400)
    } finally api.stop()
  }

  test("index endpoints build bloom and trigram sidecars that serve reads") {
    import graft.sources.{ManifestTable, ManifestWarehouse, TrigramIndex}
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    WarehouseRegistry.clear()
    val base = Files.createTempDirectory("graft-api-idx-").toString
    WarehouseRegistry.register(
      WarehouseMeta("idxlake", "idx lake", "lake", "manifest"),
      () => ManifestWarehouse("idxlake", base))
    ManifestTable.overwrite(
      (1L to 200L).map(i => (i, s"value-$i")).toDF("k", "txt")
        .repartition(4, col("k")), s"$base/items")
    val api = ApiServer.start(spark)
    try {
      val b = Http.post(
        s"${api.baseUrl}/table/idxlake/items/index/bloom?cols=k",
        Map.empty, "", "application/json")
      assert(b.contains("\"sidecars_written\":4"), b)
      val b2 = Http.post(
        s"${api.baseUrl}/table/idxlake/items/index/bloom?cols=k",
        Map.empty, "", "application/json")
      assert(b2.contains("\"sidecars_written\":0"), b2)
      val t1 = Http.post(
        s"${api.baseUrl}/table/idxlake/items/index/trigram?col=txt",
        Map.empty, "", "application/json")
      assert(t1.contains("\"sidecars_written\":4"), t1)
      // generated columns: declare over a table carrying the column,
      // read back, see an absent-column append compute it
      ManifestTable.append(
        (201L to 210L).map(i => (i, s"value-$i", i % 7))
          .toDF("k", "txt", "kb"), s"$base/items2")
      val gset = Http.post(s"${api.baseUrl}/table/idxlake/items2/generated",
        Map.empty, """{"generated":[{"column":"kb","expr":"k % 7"}]}""",
        "application/json")
      assert(gset.contains("\"n_columns\":1"), gset)
      val gget = Http.get(s"${api.baseUrl}/table/idxlake/items2/generated",
        Map.empty)
      assert(gget.contains("\"expr\":\"k % 7\""), gget)
      ManifestTable.append(
        Seq((300L, "v")).toDF("k", "txt"), s"$base/items2")
      assert(ManifestTable.read(spark, s"$base/items2")
        .where(col("k") === 300L).select("kb").head.getLong(0) == 300L % 7)
      // the built indexes actually serve pruned, exact reads
      assert(TrigramIndex.indexedFiles(s"$base/items", "txt").size == 4)
      assert(ManifestTable.readWhereContains(
        spark, s"$base/items", "txt", "value-200").count() == 1)
    } finally api.stop()
  }

  test("/run/pull reports per-run HTTP request/retry counters for a REST origin") {
    import graft.sources.{RequestMetrics, RestFixture, RestWarehouse}
    WarehouseRegistry.clear()
    val outDir = Files.createTempDirectory("graft-api-http-").toString
    val rows = Tables(spark, sf0001, "customer")
      .select("c_custkey", "c_name").limit(80)
    // first data request (the driver probe) is 429'd → one retry
    val fx = RestFixture.serve(rows, "customer", "c_custkey", flaky429 = 1)
    try {
      val wh = RestWarehouse("resto", fx.baseUrl, pageSize = 40,
        metrics = Some(RequestMetrics(spark)))
      // one shared instance: the factory must return the SAME warehouse
      // so run-report deltas read the accumulators the fetches hit
      WarehouseRegistry.register(
        WarehouseMeta("resto", "rest origin", "api", "rest"), () => wh)
      WarehouseRegistry.register(
        WarehouseMeta("apidst2", "target", "lake", "parquet"),
        () => ParquetWarehouse("apidst2", outDir, ext = ""))
      val api = ApiServer.start(spark, apiKey = Some("k2"))
      val h = Map("X-API-Key" -> "k2")
      try {
        val res = Http.post(s"${api.baseUrl}/run/pull", h,
          """{"resource": "customer", "origin": "resto", "target": "apidst2",
             "cursor": {"mode": "uid", "field": "c_custkey", "start": "0"}}""",
          "application/json")
        assert(res.contains("\"rows\":80"), res)
        // probe (429 + retry) + 2 pages = 4 requests, 1 retry, 1 4xx
        assert(res.contains(
          """"http":{"resto":{"requests":4,"retries":1,"http_4xx":1,"http_5xx":0}}"""),
          res)
      } finally api.stop()
    } finally fx.stop()
  }

  test("table maintenance endpoints: versions, compact, expire") {
    import graft.sources.{ManifestTable, ManifestWarehouse}
    import spark.implicits._
    WarehouseRegistry.clear()
    val base = Files.createTempDirectory("graft-api-mt-").toString
    val wh = ManifestWarehouse("txlake", base)
    WarehouseRegistry.register(
      WarehouseMeta("txlake", "tx lake", "lake", "manifest"), () => wh)
    WarehouseRegistry.register(
      WarehouseMeta("plain", "plain lake", "lake", "parquet"),
      () => ParquetWarehouse("plain", base))
    ManifestTable.append(Seq(1, 2).toDF("x"), s"$base/items")
    ManifestTable.append(Seq(3).toDF("x"), s"$base/items")

    val api = ApiServer.start(spark)
    try {
      val vs = Http.get(s"${api.baseUrl}/table/txlake/items/versions", Map.empty)
      assert(vs.contains("\"versions\":[1,2]"), vs)
      val c = Http.post(s"${api.baseUrl}/table/txlake/items/compact?zorder=x",
        Map.empty, "", "application/json")
      assert(c.contains("\"compacted_version\":3") &&
        c.contains("\"zorder\":[\"x\"]"), c)
      val e = Http.post(s"${api.baseUrl}/table/txlake/items/expire?keep=1",
        Map.empty, "", "application/json")
      assert(e.contains("\"expired_versions\":[1,2]"), e)
      assert(ManifestTable.versions(s"$base/items") == Seq(3L))
      assert(ManifestTable.read(spark, s"$base/items")
        .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
      // a non-manifest warehouse is refused
      assert(intercept[graft.sources.RestHttpError] {
        Http.get(s"${api.baseUrl}/table/plain/items/versions", Map.empty)
      }.status == 400)
      // predicate-scoped compaction (OPTIMIZE ... WHERE over HTTP):
      // three single-value commits, compact only g=1's files
      (0 to 2).foreach(g => ManifestTable.append(
        Seq.fill(5)(g).toDF("g").coalesce(1), s"$base/scoped"))
      val beforeW = ManifestTable.dataFiles(s"$base/scoped").toSet
      val matchW = ManifestTable.statsSurvivors(s"$base/scoped",
        Seq(graft.conditions.Condition("g", graft.conditions.Op.Eq, 1))).toSet
      assert(matchW.nonEmpty && matchW.size < beforeW.size)
      val cw = Http.post(
        s"${api.baseUrl}/table/txlake/scoped/compact?where=g%20%3D%201",
        Map.empty, "", "application/json")
      assert(cw.contains("\"compacted_version\":4"), cw)
      val afterW = ManifestTable.dataFiles(s"$base/scoped").toSet
      assert(afterW.intersect(beforeW) == beforeW.diff(matchW),
        s"only g=1's files rewrite: $beforeW -> $afterW")
      // ?where + ?mode=incremental = fold only the scope's under-filled
      // files; everything here is already one freshly-compacted file,
      // so the combined call is an idempotent no-op (same version back)
      val v4 = ManifestTable.versions(s"$base/scoped").max
      Http.post(s"${api.baseUrl}/table/txlake/scoped/compact?where=g%20%3D%201&mode=incremental",
        Map.empty, "", "application/json")
      assert(ManifestTable.versions(s"$base/scoped").max == v4)
      // CHECK constraints: declare, read back, see a violating append
      // refused through the warehouse write path, drop again
      val cset = Http.post(s"${api.baseUrl}/table/txlake/items/constraints",
        Map.empty, """{"constraints":["x > 0"]}""", "application/json")
      assert(cset.contains("\"constraints\":[\"x > 0\"]"), cset)
      val cget = Http.get(s"${api.baseUrl}/table/txlake/items/constraints",
        Map.empty)
      assert(cget.contains("\"constraints\":[\"x > 0\"]"), cget)
      val vBefore = ManifestTable.versions(s"$base/items").max
      intercept[Throwable] {
        wh.write(Seq(-1).toDF("x"), "items", org.apache.spark.sql.SaveMode.Append)
      }
      assert(ManifestTable.versions(s"$base/items").max == vBefore)
      val cdrop = Http.post(s"${api.baseUrl}/table/txlake/items/constraints",
        Map.empty, """{"constraints":[]}""", "application/json")
      assert(cdrop.contains("\"constraints\":[]"), cdrop)
      // history: one audit row per surviving version
      val h = Http.get(s"${api.baseUrl}/table/txlake/items/history", Map.empty)
      assert(h.contains("\"history\":[") && h.contains("\"recorded_rows\""), h)
      // shallow clone to a sibling resource, then restore the source
      val cl = Http.post(s"${api.baseUrl}/table/txlake/items/clone?to=items2",
        Map.empty, "", "application/json")
      assert(cl.contains("\"clone_version\":1"), cl)
      assert(ManifestTable.read(spark, s"$base/items2")
        .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
      val curV = ManifestTable.versions(s"$base/items").max
      val rs = Http.post(
        s"${api.baseUrl}/table/txlake/items/restore?to=$curV",
        Map.empty, "", "application/json")
      assert(rs.contains(s"\"new_version\":${curV + 1}"), rs)
      assert(ManifestTable.read(spark, s"$base/items")
        .as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
      // column mapping over HTTP: rename is metadata-only, the read
      // answers to the new name, drop hides it again
      val filesBefore = ManifestTable.dataFiles(s"$base/items2")
      val rn = Http.post(
        s"${api.baseUrl}/table/txlake/items2/rename_column?from=x&to=qty",
        Map.empty, "", "application/json")
      assert(rn.contains("\"from\":\"x\"") && rn.contains("\"to\":\"qty\""), rn)
      assert(ManifestTable.dataFiles(s"$base/items2") == filesBefore)
      assert(ManifestTable.read(spark, s"$base/items2")
        .schema.fieldNames.toSeq == Seq("qty"))
      // the only column can't be dropped — loud 400, not a broken table
      assert(intercept[graft.sources.RestHttpError] {
        Http.post(s"${api.baseUrl}/table/txlake/items2/drop_column?col=qty",
          Map.empty, "", "application/json")
      }.status == 400)
      // change-feed summary: the clone's initial version summarizes as
      // synthesized inserts (carried seqs resolved through reconcile)
      val ch = Http.get(
        s"${api.baseUrl}/table/txlake/items2/change_summary?from=0&to=1",
        Map.empty)
      assert(ch.contains("\"change_type\":\"insert\"") &&
        ch.contains("\"rows\":3"), ch)
    } finally api.stop()
  }

  test("analyze and stats endpoints: sketch pass, metadata refresh, optimizer view") {
    import graft.sources.{ColumnStats, ManifestTable, ManifestWarehouse}
    import spark.implicits._
    WarehouseRegistry.clear()
    val base = Files.createTempDirectory("graft-api-an-").toString
    WarehouseRegistry.register(
      WarehouseMeta("anlake", "an lake", "lake", "manifest"),
      () => ManifestWarehouse("anlake", base))
    ManifestTable.append(
      (0 until 500).map(i => (i.toLong, s"g${i % 7}")).toDF("k", "g"),
      s"$base/items")
    val api = ApiServer.start(spark)
    try {
      // no stats yet → 404 with a hint
      assert(intercept[graft.sources.RestHttpError] {
        Http.get(s"${api.baseUrl}/table/anlake/items/stats", Map.empty)
      }.status == 404)
      val a = Http.post(s"${api.baseUrl}/table/anlake/items/analyze?cols=all",
        Map.empty, "", "application/json")
      assert(a.contains("\"row_count\":500") &&
        a.contains("\"columns\":[\"g\",\"k\"]"), a)
      val st = Http.get(s"${api.baseUrl}/table/anlake/items/stats", Map.empty)
      assert(st.contains("\"row_count\":500") && st.contains("\"name\":\"g\""), st)
      // append + the metadata-only refresh (no cols param)
      ManifestTable.append(
        (500 until 600).map(i => (i.toLong, s"g${i % 7}")).toDF("k", "g"),
        s"$base/items")
      val r = Http.post(s"${api.baseUrl}/table/anlake/items/analyze",
        Map.empty, "", "application/json")
      assert(r.contains("\"row_count\":600"), r)
      val after = ColumnStats.load(s"$base/items").get
      assert(after.cols("k").max.contains("599"), after.cols("k").toString)
    } finally api.stop()
  }

  test("materialized-view endpoints: create, transparent rewrite, refresh") {
    import graft.sources.{ManifestTable, ManifestWarehouse}
    import spark.implicits._
    WarehouseRegistry.clear()
    val base = Files.createTempDirectory("graft-api-mv-").toString
    WarehouseRegistry.register(
      WarehouseMeta("mvlake", "mv lake", "lake", "manifest"),
      () => ManifestWarehouse("mvlake", base))
    ManifestTable.append(
      (0L until 300L).map(i => (i, s"g${i % 3}", i * 1.0)).toDF("k", "g", "v"),
      s"$base/fact")
    val api = ApiServer.start(spark)
    try {
      val mk = Http.post(s"${api.baseUrl}/table/mvlake/rollup/mv", Map.empty,
        """{"source":"fact","dims":["g"],"measures":["v"]}""",
        "application/json")
      assert(mk.contains("\"source_version\":1"), mk)
      // the rollup is a real table in the maintainable shape
      val mv = ManifestTable.read(spark, s"$base/rollup")
      assert(mv.columns.sorted.sameElements(Array("g", "n", "sum_v")))
      assert(mv.count() == 3L)
      // the creating session got the transparent rewrite
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      val agg = ManifestTable.read(spark, s"$base/fact")
        .groupBy("g").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      // (plan-level rewrite checked in the SQL specs; here: values)
      assert(agg.collect().map(_.getLong(1)).sum == 300L)
      // append + refresh = incremental; state equals a rebuild
      ManifestTable.append(
        (300L until 400L).map(i => (i, s"g${i % 3}", i * 1.0)).toDF("k", "g", "v"),
        s"$base/fact")
      val rf = Http.post(s"${api.baseUrl}/table/mvlake/rollup/mv/refresh",
        Map.empty, "", "application/json")
      assert(rf.contains("\"mode\":\"incremental\""), rf)
      assert(ManifestTable.read(spark, s"$base/rollup")
        .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == 400L)
      // creating over an existing table refuses; refreshing a non-MV too
      assert(intercept[graft.sources.RestHttpError] {
        Http.post(s"${api.baseUrl}/table/mvlake/fact/mv", Map.empty,
          """{"source":"fact","dims":["g"],"measures":["v"]}""",
          "application/json")
      }.status == 400)
      assert(intercept[graft.sources.RestHttpError] {
        Http.post(s"${api.baseUrl}/table/mvlake/fact/mv/refresh",
          Map.empty, "", "application/json")
      }.status == 400)
    } finally api.stop()
  }

  test("table merge and change-feed endpoints") {
    import graft.sources.{ManifestTable, ManifestWarehouse}
    import spark.implicits._
    WarehouseRegistry.clear()
    val base = Files.createTempDirectory("graft-api-merge-").toString
    WarehouseRegistry.register(
      WarehouseMeta("txlake", "tx lake", "lake", "manifest"),
      () => ManifestWarehouse("txlake", base))
    // source rows land in a plain parquet warehouse resource
    WarehouseRegistry.register(
      WarehouseMeta("stage", "staging", "lake", "parquet"),
      () => ParquetWarehouse("stage", base))
    ManifestTable.overwrite(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "s"), s"$base/items")
    Seq((2, "B", "U"), (9, "i", "U"), (3, "c", "D")).toDF("k", "s", "op")
      .write.parquet(s"$base/updates.parquet")

    val api = ApiServer.start(spark)
    try {
      val m = Http.post(s"${api.baseUrl}/table/txlake/items/merge", Map.empty,
        """{"origin": {"warehouse": "stage", "resource": "updates"},
           "keys": ["k"],
           "delete_when": {"column": "op", "value": "D"}}""",
        "application/json")
      assert(m.contains("\"merged_version\":2"), m)
      assert(ManifestTable.read(spark, s"$base/items")
        .select("k", "s").as[(Int, String)].collect().sortBy(_._1).toSeq ==
        Seq((1, "a"), (2, "B"), (9, "i")))
      val ch = Http.get(
        s"${api.baseUrl}/table/txlake/items/changes?from=1&to=2&key=k", Map.empty)
      assert(ch.contains("\"added\":1") && ch.contains("\"removed\":1") &&
        ch.contains("\"changed\":1"), ch)
      // missing params are a client error
      assert(intercept[graft.sources.RestHttpError] {
        Http.get(s"${api.baseUrl}/table/txlake/items/changes?from=1", Map.empty)
      }.status == 400)
    } finally api.stop()
  }

  test("unified-fields and auth-schema endpoints; fault statuses split 4xx/5xx") {
    WarehouseRegistry.clear()
    WarehouseRegistry.register(
      WarehouseMeta("plain", "Plain lake", "lake", "parquet"),
      () => ParquetWarehouse("plain", sf0001))
    WarehouseRegistry.register(
      WarehouseMeta("restish", "REST origin", "rest", "json"),
      () => graft.sources.RestWarehouse("restish", "http://127.0.0.1:1/api",
        httpAuth = new graft.sources.HttpAuth.Login(
          "http://127.0.0.1:1/login", "u", "p")))
    // a factory that explodes = a server fault, not a client error
    WarehouseRegistry.register(
      WarehouseMeta("broken", "Broken", "lake", "parquet"),
      () => throw new IllegalStateException("factory exploded"))

    val api = ApiServer.start(spark, apiKey = Some("k2"))
    val h = Map("X-API-Key" -> "k2")
    try {
      // unified job fields straight off the Encoder schema
      val jf = Http.get(s"${api.baseUrl}/schema/unified/job", h)
      assert(jf.contains("\"name\":\"ranges_float\"") &&
        jf.contains("value_min:double"))
      assert(jf.contains("\"name\":\"board_key\"") &&
        jf.contains("\"operators\":[\"in\"]"))
      // prefilterable subset only
      val pf = Http.get(s"${api.baseUrl}/schema/unified/job?only_prefilterable=true", h)
      assert(pf.contains("\"key\"") && !pf.contains("ranges_float"))
      val prof = Http.get(s"${api.baseUrl}/schema/unified/profile", h)
      assert(prof.contains("\"name\":\"attachments\"") &&
        prof.contains("\"name\":\"urls\""))
      assert(intercept[graft.sources.RestHttpError] {
        Http.get(s"${api.baseUrl}/schema/unified/widget", h)
      }.status == 404)

      // auth schema: scheme + parameter names, never values
      val none = Http.get(s"${api.baseUrl}/schema/auth/plain", h)
      assert(none.contains("\"scheme\":\"none\""))
      val login = Http.get(s"${api.baseUrl}/schema/auth/restish", h)
      assert(login.contains("\"scheme\":\"login\"") &&
        login.contains("\"name\":\"password\"") &&
        login.contains("\"secret\":true") && !login.contains("\"p\""))
      assert(intercept[graft.sources.RestHttpError] {
        Http.get(s"${api.baseUrl}/schema/auth/ghost", h)
      }.status == 404)

      // a server-side fault is a 500, not a 400 blamed on the caller
      assert(intercept[graft.sources.RestHttpError] {
        Http.get(s"${api.baseUrl}/schema/auth/broken", h, maxAttempts = 1)
      }.status == 500)
    } finally {
      api.stop()
      WarehouseRegistry.clear()
    }
  }
}
