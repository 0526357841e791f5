package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** SQL OPTIMIZE / VACUUM via the injected parser
  * ([[graft.plans.GraftSqlParser]]): superset dialect (everything else
  * delegates), catalog-name and quoted-path targets, ZORDER BY
  * re-clustering, retention semantics, and the age-gated sweep. The
  * spec session is built with `spark.sql.extensions`
  * (SparkSpecBase), the only way a parser can be injected. */
class GraftMaintenanceSpec extends SparkSpecBase {

  private def freshWh(): String =
    Files.createTempDirectory("graft-maint-").toString

  test("RUN MAINTENANCE executes the plan's recommended rows, converges, " +
      "and no-ops cleanly on an already-maintained table") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("""CREATE TABLE graft.nm (k BIGINT, v DOUBLE)
              TBLPROPERTIES ('merge.keys'='k')""")
    val p = s"$wh/nm"
    def rows(a: Long, b: Long) = s2.range(a, b).select(
      col("id").as("k"), (col("id") * 1.0).as("v"))
    (0 until 4).foreach(i => ManifestTable.append(rows(i * 50, i * 50 + 50), p))
    ManifestTable.mergeMoR(s2, p, rows(1, 21).withColumn("v", -col("v")),
      Seq("k"))
    val rep = s2.sql("RUN MAINTENANCE graft.nm RETAIN 1 VERSIONS").collect()
    assert(rep.exists(r => r.getString(0) == "fold_deletes" &&
      r.getString(3).startsWith("committed")), rep.mkString("; "))
    assert(rep.exists(r => r.getString(0) == "compact_incremental" &&
      r.getString(3).startsWith("committed")))
    assert(rep.exists(r => r.getString(0) == "expire" &&
      r.getString(3).startsWith("expired")))
    // converged: the whole plan reads not-recommended now
    assert(ManifestTable.maintenancePlan(s2, p)
      .where(col("recommended")).count() == 0)
    // relational truth untouched
    val t = ManifestTable.read(s2, p)
    assert(t.count() == 200 && t.where(col("v") < 0).count() == 20)
    // a second pass is a clean no-op: every action reports skipped
    val rep2 = s2.sql("RUN MAINTENANCE graft.nm RETAIN 1 VERSIONS").collect()
    assert(rep2.forall(_.getString(3) == "skipped"), rep2.mkString("; "))
    // quoted-path form hits the path API
    assert(s2.sql(s"RUN MAINTENANCE '$p'").collect().nonEmpty)
  }

  test("OPTIMIZE compacts a catalog table; plain SQL still parses; unknown targets refuse") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT, v DOUBLE)")
    (0 until 6).foreach(i => s2.sql(
      s"INSERT INTO graft.t SELECT id, CAST(id AS DOUBLE) FROM range(${i * 100}, ${i * 100 + 100})"))
    val before = ManifestTable.dataFiles(s"$wh/t").size
    assert(before >= 6)

    // the dialect is a superset: ordinary SQL delegates untouched
    assert(s2.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 600L)

    val r = s2.sql("OPTIMIZE graft.t").collect()
    assert(r.length == 1 && r(0).getLong(1) == before.toLong &&
      r(0).getLong(2) < before.toLong)
    assert(!ManifestTable.isDataChange(s"$wh/t", r(0).getLong(0)))
    assert(s2.sql("SELECT sum(v) FROM graft.t").head().getDouble(0) ==
      (0 until 600).map(_.toDouble).sum)

    // unresolvable targets refuse loudly at execution
    intercept[Exception] { s2.sql("OPTIMIZE graft.nope").collect() }
    intercept[Exception] { s2.sql("OPTIMIZE spark_catalog.default.x").collect() }
  }

  test("OPTIMIZE WHERE compacts only stats-matching files; rich predicates refuse") {
    import graft.conditions.{Condition, Op}
    val path = freshWh() + "/t"
    // six single-value-range commits on g: stats make g=2 prunable
    (0 until 6).foreach { g =>
      ManifestTable.append(
        spark.range(0, 300).toDF("k").withColumn("g", lit(g.toLong)),
        path)
    }
    val before = ManifestTable.dataFiles(path).toSet
    val matching = ManifestTable.statsSurvivors(path,
      Seq(Condition("g", Op.Eq, 2L))).toSet
    assert(matching.nonEmpty && matching.size < before.size)
    val r = spark.sql(s"OPTIMIZE '$path' WHERE g = 2").collect()
    val after = ManifestTable.dataFiles(path, Some(r(0).getLong(0))).toSet
    assert(after.intersect(before) == before.diff(matching),
      "non-matching files must be carried untouched")
    assert(!ManifestTable.isDataChange(path, r(0).getLong(0)))
    assert(ManifestTable.read(spark, path).count() == 1800L)
    // a no-match predicate is a no-op (same version back)
    val v0 = ManifestTable.latestVersion(path)
    spark.sql(s"OPTIMIZE '$path' WHERE g = 99").collect()
    assert(ManifestTable.latestVersion(path) == v0)
    // predicates beyond the stats-prunable algebra refuse loudly
    intercept[Exception] {
      spark.sql(s"OPTIMIZE '$path' WHERE g + 1 = 3").collect()
    }
    // WHERE composes with TARGET and ZORDER BY in one statement
    val rz = spark.sql(
      s"OPTIMIZE '$path' TARGET 8192 WHERE g <= 1 ZORDER BY (k)").collect()
    assert(rz.length == 1)
  }

  test("ALTER TABLE ADD/DROP PARTITION FIELD evolves the spec; refusals hold") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("""CREATE TABLE graft.t (k BIGINT, g STRING, v DOUBLE)
              PARTITIONED BY (g)""")
    s2.sql("INSERT INTO graft.t SELECT id, CAST(id % 3 AS STRING), id * 1.0 FROM range(0, 300)")
    val files = ManifestTable.dataFiles(s"$wh/t").toSet
    // evolve: g out, k in — metadata only, zero file movement
    val r1 = s2.sql("ALTER TABLE graft.t DROP PARTITION FIELD g").collect()
    assert(r1.head.getString(1).isEmpty, r1.head.toString)
    val r2 = s2.sql("ALTER TABLE graft.t ADD PARTITION FIELD k").collect()
    assert(r2.head.getString(1) == "k")
    assert(ManifestTable.dataFiles(s"$wh/t").toSet == files)
    // the evolved spec round-trips through the catalog and SHOW CREATE
    val declared = s2.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "t")).partitioning()
    assert(declared.length == 1 &&
      declared.head.references().head.fieldNames().sameElements(Array("k")))
    assert(s2.sql("SHOW CREATE TABLE graft.t").head().getString(0)
      .contains("PARTITIONED BY (k)"))
    // refusals: unknown column, duplicate field, dropping a non-field
    intercept[Exception] {
      s2.sql("ALTER TABLE graft.t ADD PARTITION FIELD nope").collect() }
    intercept[Exception] {
      s2.sql("ALTER TABLE graft.t ADD PARTITION FIELD k").collect() }
    intercept[Exception] {
      s2.sql("ALTER TABLE graft.t DROP PARTITION FIELD g").collect() }
    // zorder excludes a layout; bucket layouts refuse evolution
    s2.sql("""CREATE TABLE graft.tz (k BIGINT, v DOUBLE)
              TBLPROPERTIES ('zorder.cols'='k')""")
    intercept[Exception] {
      s2.sql("ALTER TABLE graft.tz ADD PARTITION FIELD v").collect() }
    // plain ALTER TABLE statements still delegate to Spark untouched
    s2.sql("ALTER TABLE graft.t ADD COLUMN extra DOUBLE")
    assert(s2.table("graft.t").columns.contains("extra"))
  }

  test("OPTIMIZE INCREMENTAL folds only under-filled files; composes with WHERE") {
    import graft.conditions.{Condition, Op}
    val path = freshWh() + "/t"
    // one big compacted file + several small appends
    ManifestTable.overwrite(spark.range(0, 5000).toDF("k")
      .withColumn("g", lit(0L)).coalesce(1), path)
    (1 to 4).foreach(g => ManifestTable.append(
      spark.range(0, 50).toDF("k").withColumn("g", lit(g.toLong))
        .coalesce(1), path))
    val before = ManifestTable.dataFiles(path).toSet
    val big = before.maxBy(f => java.nio.file.Files.size(
      java.nio.file.Paths.get(path, "data", f)))
    // INCREMENTAL: the big file carries, the four smalls fold into one
    val r = spark.sql(s"OPTIMIZE '$path' TARGET 20000 INCREMENTAL").collect()
    val after = ManifestTable.dataFiles(path, Some(r(0).getLong(0))).toSet
    assert(after.contains(big), "the at-target file must carry untouched")
    assert(after.size < before.size)
    assert(ManifestTable.read(spark, path).count() == 5200L)
    // idempotent: a second run commits nothing
    val v = ManifestTable.latestVersion(path)
    spark.sql(s"OPTIMIZE '$path' TARGET 20000 INCREMENTAL").collect()
    assert(ManifestTable.latestVersion(path) == v)
    // INCREMENTAL WHERE: fold only the under-filled files INSIDE the
    // scope — append two more smalls per g, scope to g = 2
    (1 to 2).foreach(_ => (1 to 4).foreach(g => ManifestTable.append(
      spark.range(0, 50).toDF("k").withColumn("g", lit(g.toLong))
        .coalesce(1), path)))
    val pre = ManifestTable.dataFiles(path).toSet
    val g2 = ManifestTable.statsSurvivors(path,
      Seq(Condition("g", Op.Eq, 2L))).toSet
    spark.sql(s"OPTIMIZE '$path' TARGET 20000 INCREMENTAL WHERE g = 2").collect()
    val post = ManifestTable.dataFiles(path).toSet
    assert(post.intersect(pre) == pre.diff(g2),
      "only g=2's under-filled files fold")
    assert(ManifestTable.read(spark, path).count() == 5600L)
    // unknown columns refuse instead of conservatively matching all
    intercept[Exception] {
      spark.sql(s"OPTIMIZE '$path' WHERE nope = 1").collect() }
    // an ALL-NULL column now carries null-count statistics, so a
    // comparison scope over it is PROVEN EMPTY in metadata: the scoped
    // optimize is a no-op (no new version), never a silent whole-table
    // rewrite — and never a refusal, since the stats really exist
    val npath = freshWh() + "/n"
    ManifestTable.overwrite(spark.range(0, 100).toDF("k")
      .withColumn("x", lit(null).cast("double")), npath)
    val nv = ManifestTable.latestVersion(npath)
    val nFiles = ManifestTable.dataFiles(npath).toSet
    spark.sql(s"OPTIMIZE '$npath' WHERE x = 1.0").collect()
    assert(ManifestTable.latestVersion(npath) == nv &&
      ManifestTable.dataFiles(npath).toSet == nFiles,
      "an empty proven scope must be a no-op")
    // a STRUCT column (genuinely unsupported stats type) still refuses
    val spath = freshWh() + "/s"
    ManifestTable.overwrite(spark.range(0, 100).toDF("k")
      .withColumn("st", struct(lit(1).as("a"))), spath)
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE '$spath' WHERE st = 1").collect() }
    assert(e.getMessage.contains("no file statistics"), e.getMessage)
    // DATE columns DO carry footer stats (epoch days) — the canonical
    // compact-yesterday's-partition scope works end-to-end
    val dpath = freshWh() + "/d"
    (0 until 4).foreach(w => ManifestTable.append(
      spark.range(0, 50).toDF("k").withColumn("day",
        expr(s"date_add(DATE'2024-01-01', CAST($w AS INT))")).coalesce(1),
      dpath))
    val dBefore = ManifestTable.dataFiles(dpath).toSet
    val dScope = ManifestTable.statsSurvivors(dpath,
      Seq(Condition("day", Op.Eq, java.sql.Date.valueOf("2024-01-03")))).toSet
    assert(dScope.size == 1 && dBefore.size == 4, s"$dScope of $dBefore")
    spark.sql(s"OPTIMIZE '$dpath' WHERE day = DATE'2024-01-03'").collect()
    assert(ManifestTable.dataFiles(dpath).toSet.intersect(dBefore) ==
      dBefore.diff(dScope), "only the matching day's file rewrites")
    // and the read path prunes on dates too
    assert(ManifestTable.readWhere(spark, dpath,
      Seq(Condition("day", Op.Gte, java.sql.Date.valueOf("2024-01-04"))))
      .count() == 50L)
  }

  test("MATERIALIZED VIEW SQL: shape refusals, rewrite scoping, refresh modes") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.src (k BIGINT, g STRING, v DOUBLE)")
    s2.sql("""INSERT INTO graft.src
              SELECT id, CAST(id % 3 AS STRING), id * 1.0 FROM range(0, 300)""")
    // shapes the maintenance machinery cannot keep fresh refuse at CREATE
    for (bad <- Seq(
        "SELECT g, count(*) AS n, avg(v) AS sum_v FROM graft.src GROUP BY g",
        "SELECT g, count(DISTINCT v) AS n FROM graft.src GROUP BY g",
        "SELECT g, count(*) AS cnt FROM graft.src GROUP BY g", // alias != n
        "SELECT g, count(*) AS n, sum(v) AS total FROM graft.src GROUP BY g",
        "SELECT g, sum(v) AS sum_v FROM graft.src GROUP BY g", // no count
        "SELECT count(*) AS n FROM graft.src", // no dims
        "SELECT g, count(*) AS n FROM graft.src WHERE v > 0 GROUP BY g"))
      intercept[Exception] {
        s2.sql(s"CREATE MATERIALIZED VIEW graft.bad AS $bad").collect() }
    // the good shape: created, rewrite serves a SUBSET grouping too
    s2.sql("""CREATE MATERIALIZED VIEW graft.mv AS
              SELECT g, count(*) AS n, sum(v) AS sum_v
              FROM graft.src GROUP BY g""").collect()
    def scansMv(df: org.apache.spark.sql.DataFrame): Boolean = {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
      }.flatten.exists(_.contains("/mv/data"))
    }
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    try {
      val total = s2.sql(
        """SELECT count(*) AS n,
             CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sv
           FROM graft.src GROUP BY g""")
      assert(scansMv(total),
        total.queryExecution.optimizedPlan.toString.take(500))
      assert(total.collect().map(_.getLong(0)).sum == 300L)
      // a time-travel read of the source must NOT rewrite
      val tt = s2.sql(
        "SELECT g, count(*) AS n FROM graft.src VERSION AS OF 1 GROUP BY g")
      assert(!scansMv(tt))
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    // REFRESH of a non-MV refuses; a current MV no-ops
    intercept[Exception] {
      s2.sql("REFRESH MATERIALIZED VIEW graft.src").collect() }
    assert(s2.sql("REFRESH MATERIALIZED VIEW graft.mv")
      .collect().head.getString(1) == "noop")
    // DROP TABLE on the MV purges the registration — the dashboard
    // plans (and answers) from the base again, never from deleted files
    s2.sql("DROP TABLE graft.mv")
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    try {
      val back = s2.sql("SELECT g, count(*) AS n FROM graft.src GROUP BY g")
      assert(!scansMv(back))
      assert(back.collect().map(_.getLong(1)).sum == 300L)
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("CREATE TABLE SHALLOW CLONE: zero-copy, version-pinned, sidecars carried") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("""CREATE TABLE graft.src (k BIGINT, g STRING, v DOUBLE)
              PARTITIONED BY (g) TBLPROPERTIES ('merge.keys'='k')""")
    s2.sql("INSERT INTO graft.src SELECT id, CAST(id % 3 AS STRING), id * 1.0 FROM range(0, 300)")
    s2.sql("INSERT INTO graft.src SELECT id, CAST(id % 3 AS STRING), id * 1.0 FROM range(300, 400)")
    val srcFiles = ManifestTable.dataFiles(s"$wh/src").toSet
    val r = s2.sql("CREATE TABLE graft.dev SHALLOW CLONE graft.src").collect()
    assert(r.head.getLong(0) == 1L && r.head.getLong(1) == srcFiles.size.toLong)
    // zero-copy: the clone's data dir holds no bytes, reads answer
    assert(scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$wh/dev/data"))) {
        st => !st.iterator().hasNext })
    assert(s2.sql("SELECT count(*) FROM graft.dev").head().getLong(0) == 400L)
    // declarative sidecars carried: layout + merge keys behave
    assert(s2.sql("SHOW CREATE TABLE graft.dev").head().getString(0)
      .contains("PARTITIONED BY (g)"))
    s2.sql("UPDATE graft.dev SET v = v * 2 WHERE k % 7 = 0") // keyed DML works
    // writes to the clone never touch the source
    assert(ManifestTable.dataFiles(s"$wh/src").toSet == srcFiles)
    assert(s2.sql("SELECT count(*) FROM graft.src").head().getLong(0) == 400L)
    // VERSION AS OF pins an older snapshot
    s2.sql("CREATE TABLE graft.old SHALLOW CLONE graft.src VERSION AS OF 1")
    assert(s2.sql("SELECT count(*) FROM graft.old").head().getLong(0) == 300L)
    // an existing target refuses; plain CREATE TABLE still delegates
    intercept[Exception] {
      s2.sql("CREATE TABLE graft.dev SHALLOW CLONE graft.src").collect() }
    s2.sql("CREATE TABLE graft.plain (x BIGINT)")
    assert(s2.table("graft.plain").columns.sameElements(Array("x")))
  }

  test("OPTIMIZE ZORDER BY re-clusters; quoted-path targets hit the path API") {
    val path = freshWh() + "/t"
    ManifestTable.overwrite(
      spark.range(0, 2000).toDF("k")
        .withColumn("a", pmod(col("k") * 37, lit(1000)))
        .withColumn("b", pmod(col("k") * 91, lit(1000)))
        .repartition(8), path)
    val r = spark.sql(s"OPTIMIZE '$path' TARGET 8192 ZORDER BY (a, b)").collect()
    assert(r.length == 1 && r(0).getLong(2) >= 2)
    // z-ordered files carry tighter per-file ranges on BOTH columns than
    // the random layout: an equality predicate on `a` prunes
    import graft.conditions.{Condition, Op}
    val sv = ManifestTable.statsSurvivors(path, Seq(Condition("a", Op.Lt, 50L)))
    assert(sv.size < ManifestTable.dataFiles(path).size,
      s"zorder must make `a` prunable: ${sv.size}/${ManifestTable.dataFiles(path).size}")
  }

  test("DDL contract: generated columns, CHECK, PRIMARY KEY at CREATE; refusals for the rest") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("""CREATE TABLE graft.t (
                k BIGINT, v DOUBLE,
                twice DOUBLE GENERATED ALWAYS AS (v * 2),
                CONSTRAINT pos CHECK (v > 0),
                CONSTRAINT pk PRIMARY KEY (k))""")
    // absent generated column computes; supplied values must match
    s2.sql("INSERT INTO graft.t (k, v) VALUES (1, 2.0)")
    s2.sql("INSERT INTO graft.t VALUES (2, 3.0, 6.0)")
    intercept[Exception] {
      s2.sql("INSERT INTO graft.t VALUES (3, 4.0, 9.0)") } // 9 != 8
    intercept[Exception] {
      s2.sql("INSERT INTO graft.t (k, v) VALUES (4, -1.0)") } // CHECK
    assert(s2.sql("SELECT sum(twice) FROM graft.t").head().getDouble(0) == 10.0)
    // PK keys the table: UPDATE plans as a delta write. The delta bytes
    // land pre-written, so a stale generated value is REJECTED (assign
    // the expression in the statement), never silently committed
    intercept[Exception] {
      s2.sql("UPDATE graft.t SET v = 5.0 WHERE k = 1") }
    s2.sql("UPDATE graft.t SET v = 5.0, twice = 10.0 WHERE k = 1")
    assert(s2.sql("SELECT twice FROM graft.t WHERE k = 1")
      .head().getDouble(0) == 10.0)
    // refusals: DEFAULT, UNIQUE, NOT ENFORCED
    intercept[Exception] {
      s2.sql("CREATE TABLE graft.bad1 (k BIGINT, v DOUBLE DEFAULT 1.0)") }
    intercept[Exception] {
      s2.sql("CREATE TABLE graft.bad2 (k BIGINT, CONSTRAINT u UNIQUE (k))") }
    intercept[Exception] {
      s2.sql("""CREATE TABLE graft.bad3 (k BIGINT,
                CONSTRAINT c CHECK (k > 0) NOT ENFORCED)""") }
    // ALTER ADD CONSTRAINT validates existing rows and then enforces
    s2.sql("ALTER TABLE graft.t ADD CONSTRAINT cap CHECK (v < 100)")
    intercept[Exception] {
      s2.sql("INSERT INTO graft.t (k, v) VALUES (5, 200.0)") }
    assert(ManifestTable.constraints(s"$wh/t") == Seq("v > 0", "v < 100"))
  }

  test("declared zorder.cols: a parameter-free OPTIMIZE re-clusters on the table property") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT, a BIGINT, b BIGINT)")
    s2.sql("""INSERT INTO graft.t
              SELECT id, pmod(id * 37, 1000), pmod(id * 91, 1000)
              FROM range(0, 2000)""")
    s2.sql("ALTER TABLE graft.t SET TBLPROPERTIES ('zorder.cols'='a,b')")
    // TARGET sized so the rewrite yields ≥5 z-slices: since r20's
    // data-sized staging the INSERT above lands ONE ~20 KB file (not 4
    // with per-file overhead), and at 8192 the 3 resulting slices were
    // too wide to bound `a` (range-sampling jitter flipped the margin)
    s2.sql("OPTIMIZE graft.t TARGET 4096").collect()
    import graft.conditions.{Condition, Op}
    val path = s"$wh/t"
    val sv = ManifestTable.statsSurvivors(path, Seq(Condition("a", Op.Lt, 50L)))
    assert(sv.size < ManifestTable.dataFiles(path).size,
      s"declared zorder must make `a` prunable: ${sv.size}/${ManifestTable.dataFiles(path).size}")
    // refused on partitioned tables and for unknown columns
    s2.sql("CREATE TABLE graft.pt (k BIGINT, g STRING) PARTITIONED BY (g)")
    intercept[Exception] {
      s2.sql("ALTER TABLE graft.pt SET TBLPROPERTIES ('zorder.cols'='k')") }
    intercept[Exception] {
      s2.sql("ALTER TABLE graft.t SET TBLPROPERTIES ('zorder.cols'='nope')") }
  }

  test("write.compression: every write door honors the declared codec") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    def codecOf(file: java.nio.file.Path): String = {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString),
        new org.apache.hadoop.conf.Configuration()))
      try r.getFooter.getBlocks.get(0).getColumns.get(0).getCodec.toString
      finally r.close()
    }
    def dataCodecs(t: String): Map[String, String] =
      ManifestTable.dataFiles(t).map(f =>
        f -> codecOf(java.nio.file.Paths.get(t, "data", f))).toMap
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("""CREATE TABLE graft.t (k BIGINT, v DOUBLE)
              TBLPROPERTIES ('merge.keys'='k', 'write.compression'='zstd')""")
    s2.sql("INSERT INTO graft.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 1000)")
    val t = s"$wh/t"
    assert(dataCodecs(t).values.toSet == Set("ZSTD"), dataCodecs(t).toString)
    // the row-level delta door (UPDATE → upsert + delete files)
    s2.sql("UPDATE graft.t SET v = v * 2 WHERE k % 10 = 0")
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.list(
        java.nio.file.Paths.get(t, "data"))) { st =>
      st.iterator().asScala.filter(_.toString.endsWith(".parquet")).foreach(p =>
        assert(codecOf(p) == "ZSTD", s"$p not zstd"))
    }
    // OPTIMIZE rewrites converge in the declared codec
    s2.sql("OPTIMIZE graft.t").collect()
    assert(dataCodecs(t).values.toSet == Set("ZSTD"))
    // ALTER switches the codec for FUTURE files only
    s2.sql("ALTER TABLE graft.t SET TBLPROPERTIES ('write.compression'='gzip')")
    s2.sql("INSERT INTO graft.t SELECT id, CAST(id AS DOUBLE) FROM range(1000, 1100)")
    assert(dataCodecs(t).values.toSet == Set("ZSTD", "GZIP"), dataCodecs(t).toString)
    // CTAS + SHOW CREATE round trip; undeclared tables stay snappy
    s2.sql("CREATE TABLE graft.c TBLPROPERTIES ('write.compression'='zstd') AS " +
      "SELECT * FROM graft.t")
    assert(dataCodecs(s"$wh/c").values.toSet == Set("ZSTD"))
    val ddl = s2.sql("SHOW CREATE TABLE graft.c").head().getString(0)
    assert(ddl.contains("'write.compression' = 'zstd'"), ddl)
    s2.sql("CREATE TABLE graft.plain AS SELECT * FROM graft.t")
    assert(dataCodecs(s"$wh/plain").values.toSet == Set("SNAPPY"))
    intercept[Exception] {
      s2.sql("CREATE TABLE graft.bad (k BIGINT) TBLPROPERTIES ('write.compression'='lzma')") }
  }

  test("CREATE-time TBLPROPERTIES declare the same surface ALTER does") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    // zorder.cols + check.* at CREATE: honored, not silently dropped
    s2.sql("""CREATE TABLE graft.t (k BIGINT, a BIGINT, b BIGINT)
              TBLPROPERTIES ('zorder.cols'='a,b', 'check.pos'='a >= 0')""")
    val props = s2.sql("SHOW TBLPROPERTIES graft.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("zorder.cols").contains("a,b"), props.toString)
    assert(props.get("check.0").contains("a >= 0"), props.toString)
    intercept[Exception] {
      s2.sql("INSERT INTO graft.t VALUES (1, -5, 0)") }
    s2.sql("""INSERT INTO graft.t
              SELECT id, pmod(id * 37, 1000), pmod(id * 91, 1000)
              FROM range(0, 2000)""")
    // TARGET sized for ≥5 z-slices on the single data-sized INSERT file
    // (see the declared-zorder test above)
    s2.sql("OPTIMIZE graft.t TARGET 4096").collect()
    import graft.conditions.{Condition, Op}
    val path = s"$wh/t"
    val sv = ManifestTable.statsSurvivors(path, Seq(Condition("a", Op.Lt, 50L)))
    assert(sv.size < ManifestTable.dataFiles(path).size,
      "CREATE-declared zorder must make `a` prunable after OPTIMIZE")
    // CTAS carries the declarations through the atomic staging commit
    s2.sql("""CREATE TABLE graft.c TBLPROPERTIES ('zorder.cols'='a') AS
              SELECT k, a FROM graft.t""")
    val cProps = s2.sql("SHOW TBLPROPERTIES graft.c").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cProps.get("zorder.cols").contains("a"), cProps.toString)
    // refusals, all BEFORE any table directory lands: unknown keys,
    // zorder×PARTITIONED BY, bad column names
    intercept[Exception] {
      s2.sql("CREATE TABLE graft.b1 (k BIGINT) TBLPROPERTIES ('no.such'='x')") }
    intercept[Exception] {
      s2.sql("""CREATE TABLE graft.b2 (k BIGINT, g STRING) PARTITIONED BY (g)
                TBLPROPERTIES ('zorder.cols'='k')""") }
    intercept[Exception] {
      s2.sql("CREATE TABLE graft.b3 (k BIGINT) TBLPROPERTIES ('zorder.cols'='nope')") }
    Seq("b1", "b2", "b3").foreach { n =>
      assert(!s2.catalog.tableExists(s"graft.$n"),
        s"refused CREATE must leave no half-created table graft.$n") }
  }

  test("VACUUM retention: age gate without FORCE, full sweep with it") {
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT)")
    s2.sql("INSERT INTO graft.t SELECT id FROM range(0, 10)")
    s2.sql("INSERT OVERWRITE graft.t SELECT id FROM range(0, 5)")
    s2.sql("INSERT INTO graft.t SELECT id FROM range(5, 8)")
    val t = s"$wh/t"
    assert(ManifestTable.versions(t).size == 3)

    // DRY RUN reports the exact sweep FORCE would perform — and
    // touches nothing (every version and file still present)
    val dry = s2.sql("VACUUM graft.t RETAIN 1 VERSIONS FORCE DRY RUN").collect()
    assert(dry(0).getString(3) == "dry_run" &&
      dry(0).getLong(0) == 2L && dry(0).getLong(1) >= 1L, dry(0).toString)
    assert(ManifestTable.versions(t).size == 3)

    // without FORCE the sweep is age-gated: history expires, but the
    // just-written bytes survive for in-flight readers
    val gated = s2.sql("VACUUM graft.t RETAIN 2 VERSIONS").collect()
    assert(gated(0).getLong(0) == 1L && gated(0).getLong(1) == 0L)
    assert(ManifestTable.versions(t).size == 2)

    val forced = s2.sql("VACUUM graft.t RETAIN 1 VERSIONS FORCE").collect()
    assert(forced(0).getLong(0) == 1L && forced(0).getLong(1) >= 1L)
    assert(ManifestTable.versions(t).size == 1)
    // the earlier dry run predicted at least this sweep's file count
    assert(dry(0).getLong(1) >= forced(0).getLong(1))
    assert(s2.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 8L)

    // TIME-BASED retention: everything here committed seconds ago, so
    // RETAIN 1 HOURS expires nothing; RETAIN 0 HOURS expires all but
    // the latest (which always survives, whatever its age)
    s2.sql("INSERT INTO graft.t SELECT id FROM range(100, 103)")
    s2.sql("INSERT INTO graft.t SELECT id FROM range(200, 203)")
    assert(ManifestTable.versions(t).size == 3)
    val fresh = s2.sql("VACUUM graft.t RETAIN 1 HOURS FORCE").collect()
    assert(fresh(0).getLong(0) == 0L && ManifestTable.versions(t).size == 3)
    val aged = s2.sql("VACUUM graft.t RETAIN 0 HOURS FORCE DRY RUN").collect()
    assert(aged(0).getString(3) == "dry_run" && aged(0).getLong(0) == 2L &&
      ManifestTable.versions(t).size == 3)
    s2.sql("VACUUM graft.t RETAIN 0 HOURS FORCE").collect()
    assert(ManifestTable.versions(t).size == 1)
    assert(s2.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 14L)
  }

  test("registerAll picks up only CURRENT materialized views for a fresh session") {
    import graft.plans.{GraftMaterializedView, MvRewrite}
    val wh = freshWh()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.a (k BIGINT, g STRING)")
    s2.sql("INSERT INTO graft.a SELECT id, CAST(id % 2 AS STRING) FROM range(0, 100)")
    s2.sql("CREATE TABLE graft.b (k BIGINT, g STRING)")
    s2.sql("INSERT INTO graft.b SELECT id, CAST(id % 2 AS STRING) FROM range(0, 50)")
    s2.sql("CREATE MATERIALIZED VIEW graft.mva AS SELECT g, count(*) AS n FROM graft.a GROUP BY g").collect()
    s2.sql("CREATE MATERIALIZED VIEW graft.mvb AS SELECT g, count(*) AS n FROM graft.b GROUP BY g").collect()
    // stale b: one more append, no refresh
    s2.sql("INSERT INTO graft.b SELECT id, CAST(id % 2 AS STRING) FROM range(50, 60)")
    // a FRESH session registers only the current view (a's)
    val s3 = spark.newSession()
    val got = GraftMaterializedView.registerAll(s3, wh)
    assert(got.map(_._2.split('/').last).sorted.sameElements(Array("a")),
      got.toString)
    MvRewrite.deregister(s3, s"$wh/a")
  }
}
