package graft

import graft.conditions._
import graft.pipeline.ConfigPipeline
import graft.sources._
import org.apache.spark.sql.functions.col
import java.nio.file.Files

class SourcesConfigSpec extends SparkSpecBase {
  import spark.implicits._

  test("parquet warehouse reads testdata resources; csv/json round-trip") {
    val wh = ParquetWarehouse("testdata", sf0001)
    assert(wh.read(spark, "region").count() == 5)

    val tmp = Files.createTempDirectory("graft-wh-").toString
    val csv = CsvWarehouse("csv_wh", tmp)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    csv.write(df, "things")
    assert(csv.read(spark, "things").count() == 2)
    val json = JsonWarehouse("json_wh", tmp)
    json.write(df, "things")
    assert(json.read(spark, "things").count() == 2)
    val orc = OrcWarehouse("orc_wh", tmp)
    orc.write(df, "things")
    assert(orc.read(spark, "things").count() == 2)
    // ORC gets the same filter pushdown as parquet
    val scan = orc.read(spark, "things").where(col("id") === 1L)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("id"))
  }

  test("registry: register/list/instance; duplicate names rejected") {
    WarehouseRegistry.clear()
    WarehouseRegistry.register(
      WarehouseMeta("td", "Test Data", "lake", "parquet"),
      () => ParquetWarehouse("td", sf0001))
    assert(WarehouseRegistry.list().contains("td"))
    assert(WarehouseRegistry.instance("td").read(spark, "nation").count() == 25)
    assertThrows[IllegalArgumentException] {
      WarehouseRegistry.register(
        WarehouseMeta("td", "dup", "lake", "parquet"),
        () => ParquetWarehouse("td", sf0001))
    }
    assertThrows[NoSuchElementException](WarehouseRegistry.instance("nope"))
  }

  test("config-driven pull: json -> plan -> target write -> advanced cursor") {
    WarehouseRegistry.clear()
    val outDir = Files.createTempDirectory("graft-target-").toString
    WarehouseRegistry.register(
      WarehouseMeta("src", "Source", "lake", "parquet"),
      () => ParquetWarehouse("src", sf0001))
    WarehouseRegistry.register(
      WarehouseMeta("dst", "Target", "lake", "parquet"),
      () => ParquetWarehouse("dst", outDir, ext = ""))

    val cfgJson = """{
      "resource": "orders",
      "origin": "src",
      "target": "dst",
      "cursor": {"mode": "created_at", "field": "o_orderdate", "start": "1996-01-01"},
      "where": [{"field": "o_orderstatus", "op": "eq", "value": "O"}],
      "having": [{"field": "o_totalprice", "op": "gt", "value": 1000}],
      "mapping": [{"from": "o_orderkey", "to": "id"}, {"from": "o_totalprice", "to": "total"}]
    }"""
    val (out, cursor) = ConfigPipeline.runPull(spark, cfgJson)
    assert(out.columns.toSeq == Seq("id", "total"))
    val written = spark.read.parquet(s"$outDir/orders")
    assert(written.count() == out.count() && written.count() > 0)
    assert(cursor.end.isDefined && cursor.end.get >= "1996-01-01")

    // dry_run writes nothing
    val cfg2 = ConfigPipeline.parsePull(cfgJson.replace("\"mapping\"",
      "\"dry_run\": true, \"mapping\""))
    assert(cfg2.dryRun)
  }

  test("config-driven push: events mode joins, counts, writes") {
    WarehouseRegistry.clear()
    val outDir = Files.createTempDirectory("graft-push-").toString
    WarehouseRegistry.register(
      WarehouseMeta("psrc", "Source", "lake", "parquet"),
      () => ParquetWarehouse("psrc", sf0001))
    WarehouseRegistry.register(
      WarehouseMeta("pdst", "Target", "lake", "parquet"),
      () => ParquetWarehouse("pdst", outDir, ext = ""))
    val (out, counters) = ConfigPipeline.runPush(spark, """{
      "resource": "customer", "origin": "psrc", "target": "pdst",
      "mode": "events", "events_resource": "events",
      "event_id_col": "user_id", "resource_id_col": "c_custkey",
      "having": [{"field": "c_acctbal", "op": "gt", "value": 0}],
      "mapping": [{"from": "event_id", "to": "event_id"}, {"from": "c_name", "to": "name"}]
    }""")
    assert(out.columns.toSeq == Seq("event_id", "name") && out.count() > 0)
    assert(counters.isDefined)
    val c = counters.get.collect().head
    assert(c.getLong(0) == 1000 && c.getLong(3) == 0) // 1000 events, none missing
    assert(spark.read.parquet(s"$outDir/customer").count() == out.count())
  }

  test("config events push against a REST origin hydrates by id, never the table") {
    WarehouseRegistry.clear()
    val customer = Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val fx = RestFixture.serve(customer, "customer", "c_custkey")
    try {
      val outDir = Files.createTempDirectory("graft-rest-push-").toString
      WarehouseRegistry.register(
        WarehouseMeta("restsrc", "REST origin", "rest", "json"),
        () => RestWarehouse("restsrc", fx.baseUrl))
      WarehouseRegistry.register(
        WarehouseMeta("evlake", "Events lake", "lake", "parquet"),
        () => ParquetWarehouse("evlake", sf0001))
      WarehouseRegistry.register(
        WarehouseMeta("pdst2", "Target", "lake", "parquet"),
        () => ParquetWarehouse("pdst2", outDir, ext = ""))
      val (out, counters) = ConfigPipeline.runPush(spark, """{
        "resource": "customer", "origin": "restsrc", "target": "pdst2",
        "mode": "events", "events_origin": "evlake",
        "events_resource": "events",
        "event_id_col": "user_id", "resource_id_col": "c_custkey",
        "having": [{"field": "c_acctbal", "op": "gt", "value": 0}],
        "mapping": [{"from": "event_id", "to": "event_id"}, {"from": "c_name", "to": "name"}]
      }""")
      assert(out.count() > 0 && counters.isDefined)
      // the origin served only the ids the events name — by-id batches,
      // not a full-table pull; the hydrated frame is pinned once and
      // shared by the push and its counters
      val distinctIds = Tables(spark, sf0001, "events")
        .select(col("user_id")).distinct().count()
      assert(fx.servedRows.get() <= distinctIds,
        s"origin served ${fx.servedRows.get()} rows for $distinctIds distinct ids")
      assert(fx.requestLog.forall(_.contains("c_custkey__in=")),
        "every origin request must be an id__in hydration")
      assert(spark.read.parquet(s"$outDir/customer").count() == out.count())
    } finally {
      fx.stop()
      WarehouseRegistry.clear()
    }
  }

  test("CLI pull into a manifest-format target: versioned transactional commits") {
    WarehouseRegistry.clear()
    val tbl = Files.createTempDirectory("graft-cli-mt-").toString
    def pullOnce(): String = { WarehouseRegistry.clear(); Main.run(spark, "pull", s"""{
      "resource": "orders",
      "origin": "src", "origin_dir": "$sf0001",
      "target": "mt", "target_dir": "$tbl", "target_format": "manifest",
      "cursor": {"mode": "created_at", "field": "o_orderdate", "start": "1992-01-01"},
      "where": [{"field": "o_orderstatus", "op": "eq", "value": "F"}],
      "mapping": [{"from": "o_orderkey", "to": "id"}]
    }""") }
    val line = pullOnce()
    assert(line.contains("\"rows\":"))
    import graft.sources.ManifestTable
    assert(ManifestTable.versions(s"$tbl/orders") == Seq(1L))
    val v1Rows = ManifestTable.read(spark, s"$tbl/orders").count()
    assert(v1Rows > 0)
    // a second pull lands as version 2 (overwrite commit), same rows
    pullOnce()
    assert(ManifestTable.versions(s"$tbl/orders") == Seq(1L, 2L))
    assert(ManifestTable.read(spark, s"$tbl/orders").count() == v1Rows)
  }

  test("config pull with as_of reads the origin snapshot at that wall time") {
    // reproducibility: rerun yesterday's pipeline against yesterday's
    // table — the config names a timestamp, the pull resolves the
    // version committed at or before it
    WarehouseRegistry.clear()
    val base = Files.createTempDirectory("graft-asof-").toString
    import graft.sources.ManifestTable
    ManifestTable.overwrite(
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), s"$base/things")
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(20)
    ManifestTable.overwrite(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), s"$base/things")
    WarehouseRegistry.register(
      WarehouseMeta("mw", "MW", "mw", "manifest"),
      () => ManifestWarehouse("mw", base))
    val out = Files.createTempDirectory("graft-asof-out-").toString
    WarehouseRegistry.register(
      WarehouseMeta("out", "Out", "out", "parquet"),
      () => ParquetWarehouse("out", out))
    def pull(asOf: String): Long = ConfigPipeline.runPull(spark, s"""{
      "resource": "things", "origin": "mw", "target": "out",
      "cursor": {"mode": "uid", "field": "id"}$asOf
    }""")._1.count()
    assert(pull(s""", "as_of": $betweenCommits""") == 2,
      "as_of between commits must read v1")
    assert(pull("") == 3, "no as_of reads the latest version")
    // time travel over a non-versioned origin fails loudly
    val err = intercept[IllegalArgumentException](
      ConfigPipeline.runPull(spark, s"""{
        "resource": "things", "origin": "out", "target": "out",
        "cursor": {"mode": "uid", "field": "id"},
        "as_of": $betweenCommits
      }"""))
    assert(err.getMessage.contains("manifest-warehouse origin"))
  }

  test("config pull from a manifest origin opens only stats-surviving files") {
    import graft.sources.{ManifestTable, ManifestWarehouse}
    import org.apache.spark.sql.functions.col
    WarehouseRegistry.clear()
    val base = Files.createTempDirectory("graft-cfg-skip-").toString
    val outDir = Files.createTempDirectory("graft-cfg-skip-out-").toString
    // range layout on the cursor column → tight per-file key ranges
    ManifestTable.overwrite(
      spark.read.parquet(s"$sf0001/orders.parquet")
        .repartitionByRange(8, col("o_orderkey")), s"$base/orders")
    WarehouseRegistry.register(
      WarehouseMeta("txorigin", "tx origin", "lake", "manifest"),
      () => ManifestWarehouse("txorigin", base))
    WarehouseRegistry.register(
      WarehouseMeta("sink", "sink", "lake", "parquet"),
      () => ParquetWarehouse("sink", outDir))
    val (out, advanced) = ConfigPipeline.runPull(spark, s"""{
      "resource": "orders",
      "origin": "txorigin", "target": "sink",
      "cursor": {"mode": "uid", "field": "o_orderkey",
                 "start": "100", "end": "700"},
      "where": [{"field": "o_orderstatus", "op": "eq", "value": "F"}]
    }""")
    val total = ManifestTable.read(spark, s"$base/orders").inputFiles.length
    val opened = out.inputFiles.length
    assert(opened < total, s"pull opened $opened of $total files — no skipping")
    // pruning never changes rows: equals the plain filtered read
    val expect = spark.read.parquet(s"$sf0001/orders.parquet")
      .where(col("o_orderkey").between(100, 700) && col("o_orderstatus") === "F")
      .count()
    assert(out.count() == expect && expect > 0)
    assert(advanced.end.exists(_.toLong <= 700))
  }

  test("config push with save_mode merge upserts into a manifest target") {
    import graft.sources.{ManifestTable, ManifestWarehouse}
    import spark.implicits._
    WarehouseRegistry.clear()
    val base = Files.createTempDirectory("graft-cfg-merge-").toString
    // seed the versioned target and a staging origin with updates
    ManifestTable.overwrite(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "s"), s"$base/items")
    Seq((2, "B", "U"), (9, "i", "U"), (3, "c", "D")).toDF("k", "s", "op")
      .write.parquet(s"$base/items.parquet")
    WarehouseRegistry.register(
      WarehouseMeta("stage", "staging", "lake", "parquet"),
      () => ParquetWarehouse("stage", base))
    WarehouseRegistry.register(
      WarehouseMeta("txlake", "tx lake", "lake", "manifest"),
      () => ManifestWarehouse("txlake", base))
    val (_, counters) = ConfigPipeline.runPush(spark, s"""{
      "resource": "items",
      "origin": "stage", "target": "txlake",
      "mode": "resources", "save_mode": "merge",
      "merge_keys": ["k"],
      "delete_when": {"column": "op", "value": "D"}
    }""")
    assert(counters.isDefined)
    assert(ManifestTable.versions(s"$base/items") == Seq(1L, 2L))
    assert(ManifestTable.read(spark, s"$base/items")
      .select("k", "s").as[(Int, String)].collect().sortBy(_._1).toSeq ==
      Seq((1, "a"), (2, "B"), (9, "i")))
    // merge_strategy "mor": same semantics, zero rewritten data files —
    // the new version only ADDS files (upserts + a delete file)
    val filesBefore = ManifestTable.dataFiles(s"$base/items").toSet
    ConfigPipeline.runPush(spark, s"""{
      "resource": "items",
      "origin": "stage", "target": "txlake",
      "mode": "resources", "save_mode": "merge",
      "merge_strategy": "mor",
      "merge_keys": ["k"],
      "delete_when": {"column": "op", "value": "D"}
    }""")
    assert(ManifestTable.versions(s"$base/items") == Seq(1L, 2L, 3L))
    assert(filesBefore.subsetOf(ManifestTable.dataFiles(s"$base/items").toSet))
    assert(ManifestTable.deleteFiles(s"$base/items").nonEmpty)
    // idempotent on the same change set: state unchanged
    assert(ManifestTable.read(spark, s"$base/items")
      .select("k", "s").as[(Int, String)].collect().sortBy(_._1).toSeq ==
      Seq((1, "a"), (2, "B"), (9, "i")))
    // merge without keys / onto a non-manifest target / unknown strategy
    // fails loudly
    intercept[IllegalArgumentException] {
      ConfigPipeline.runPush(spark, s"""{
        "resource": "items", "origin": "stage", "target": "txlake",
        "mode": "resources", "save_mode": "merge"}""")
    }
    intercept[IllegalArgumentException] {
      ConfigPipeline.runPush(spark, s"""{
        "resource": "items", "origin": "stage", "target": "stage",
        "mode": "resources", "save_mode": "merge", "merge_keys": ["k"]}""")
    }
    intercept[IllegalArgumentException] {
      ConfigPipeline.runPush(spark, s"""{
        "resource": "items", "origin": "stage", "target": "txlake",
        "mode": "resources", "save_mode": "merge", "merge_keys": ["k"],
        "merge_strategy": "nope"}""")
    }
  }

  test("CLI push command runs end-to-end and prints PushResult counters") {
    WarehouseRegistry.clear()
    val outDir = Files.createTempDirectory("graft-cli-push-").toString
    val line = Main.run(spark, "push", s"""{
      "resource": "customer", "origin": "cliorigin", "target": "clitarget",
      "origin_dir": "$sf0001", "target_dir": "$outDir",
      "mode": "events", "events_resource": "events",
      "event_id_col": "user_id", "resource_id_col": "c_custkey",
      "having": [{"field": "c_acctbal", "op": "gt", "value": 0}],
      "mapping": [{"from": "event_id", "to": "event_id"}, {"from": "c_name", "to": "name"}]
    }""")
    assert(line.contains("\"push_result\":") && line.contains("\"total_events\":1000"))
    assert(spark.read.parquet(s"$outDir/customer").count() > 0)
    // resources mode counters, including the errors counter (zero here)
    val outDir2 = Files.createTempDirectory("graft-cli-push2-").toString
    val line2 = Main.run(spark, "push", s"""{
      "resource": "customer", "origin": "cliorigin", "target": "clitarget2",
      "target_dir": "$outDir2", "mode": "resources",
      "having": [{"field": "c_acctbal", "op": "gt", "value": 0}]
    }""")
    assert(line2.contains("\"push_result\":") &&
      line2.contains("\"total_resources_fetched\":") && line2.contains("\"errors\":0"))
  }

  test("config push isolates format errors via `required`; dry_run skips the write") {
    WarehouseRegistry.clear()
    val outDir = Files.createTempDirectory("graft-cli-safe-").toString
    // mapping a nonexistent source field yields a null output column —
    // with `required` on it, every row is an isolated error, none written
    val line = Main.run(spark, "push", s"""{
      "resource": "customer", "origin": "cliorigin", "target": "clitarget",
      "origin_dir": "$sf0001", "target_dir": "$outDir", "mode": "resources",
      "mapping": [{"from": "c_custkey", "to": "id"}, {"from": "no_such_col", "to": "v"}],
      "required": ["v"]
    }""")
    val nCustomers = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(line.contains("\"rows\":0") && line.contains("\"total_resources_pushed\":0"))
    assert(line.contains(s""""errors":$nCustomers"""))
    // dry_run: plan + counters, nothing lands on the target
    WarehouseRegistry.clear()
    val dryDir = Files.createTempDirectory("graft-cli-dry-").toString
    val dryLine = Main.run(spark, "push", s"""{
      "resource": "customer", "origin": "cliorigin", "target": "clitarget",
      "origin_dir": "$sf0001", "target_dir": "$dryDir", "mode": "resources",
      "having": [{"field": "c_acctbal", "op": "gt", "value": 0}],
      "dry_run": true
    }""")
    assert(dryLine.contains("\"push_result\":"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dryDir/customer")),
      "dry_run must not write the target")
  }

  test("mapping formatter: missing source field writes as typed null") {
    val outDir = Files.createTempDirectory("graft-fmt-null-").toString
    val out = graft.format.Formatters.mapping(Seq(
      graft.format.FieldMap("c_custkey", "id"), graft.format.FieldMap("nope", "gone")))(
      spark.read.parquet(s"$sf0001/customer.parquet"))
    out.write.mode("overwrite").parquet(s"$outDir/t") // NullType would throw here
    val back = spark.read.parquet(s"$outDir/t")
    assert(back.schema("gone").dataType == org.apache.spark.sql.types.StringType)
    assert(back.where(col("gone").isNull).count() == back.count())
  }

  test("ui schema export carries operators + bindings") {
    val schema = FilterSchema(Seq(
      FieldSpec("created_at", Set(Op.Gte, Op.Lte), cursorTag = Some("created_at")),
      FieldSpec("name", Set(Op.Contains),
        searchBinding = Some(SearchBinding("keywords", BoolJoin.And, BoolJoin.Or)))))
    val json = UiSchema.exportFields(schema)
    assert(json.contains("\"cursor\":\"created_at\""))
    assert(json.contains("\"operators\":[\"gte\",\"lte\"]"))
    assert(json.contains("\"search_field\":\"keywords\""))
  }
}
