package graft

import graft.conditions.{Condition, Op}
import graft.cursor.{Cursor, CursorMode}
import graft.sources.{Auth, JdbcPartitioning, JdbcWarehouse, SqlWhere}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.DriverManager

/** JdbcWarehouse against an embedded Derby database (on the Spark
  * classpath): origin-side cursor/condition compilation, Spark-side filter
  * pushdown, partitioned parallel scans, and the write path. */
class JdbcWarehouseSpec extends SparkSpecBase {

  private lazy val dbDir = Files.createTempDirectory("graft-derby-").toString + "/db"
  private lazy val url = s"jdbc:derby:$dbDir;create=true"
  private lazy val wh = JdbcWarehouse(
    "derby", url,
    auth = Auth.Options(Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")))

  override def beforeAll(): Unit = {
    super.beforeAll()
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // quoted lowercase columns — the shape Spark's own JDBC write path
      // creates (dialect-quoted, case preserved)
      st.execute(
        """CREATE TABLE people (
           "id" BIGINT NOT NULL, "name" VARCHAR(64), "segment" VARCHAR(16),
           "created" VARCHAR(10), "score" DOUBLE)""")
      val ins = conn.prepareStatement(
        "INSERT INTO people VALUES (?, ?, ?, ?, ?)")
      (1 to 200).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setString(2, s"name_$i")
        ins.setString(3, if (i % 3 == 0) "GOLD" else "BASE")
        ins.setString(4, f"2024-01-${i % 28 + 1}%02d")
        ins.setDouble(5, i * 0.5)
        ins.addBatch()
      }
      ins.executeBatch()
      ()
    } finally conn.close()
  }

  test("read loads the full table through JDBC") {
    assert(wh.read(spark, "people").count() == 200)
  }

  test("readSlice compiles cursor + conditions into the origin query") {
    // uid cursor window [50, 120] AND segment = GOLD, filtered by Derby
    val out = wh.readSlice(spark, "people",
      conditions = Seq(Condition("segment", Op.Eq, "GOLD")),
      cursorField = Some("id"),
      cursor = Some(Cursor(CursorMode.Uid, start = Some("50"), end = Some("120"))))
    val expected = (50 to 120).count(_ % 3 == 0)
    assert(out.count() == expected)
    // the WHERE ran origin-side: the scan's generated query is the slice
    // subquery, and Spark adds no post-filter of its own
    val scan = out.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("graft_slice"))
  }

  test("readSlice desc cursor swaps the bounds like Cursor.slice") {
    val desc = wh.readSlice(spark, "people",
      cursorField = Some("created"),
      cursor = Some(Cursor(CursorMode.CreatedAt,
        start = Some("2024-01-20"), end = Some("2024-01-05"), ascending = false)))
    val asc = wh.readSlice(spark, "people",
      cursorField = Some("created"),
      cursor = Some(Cursor(CursorMode.CreatedAt,
        start = Some("2024-01-05"), end = Some("2024-01-20"))))
    assert(desc.count() == asc.count() && desc.count() > 0)
  }

  test("contains condition escapes LIKE metacharacters") {
    // name_10 matches name_10, name_100..109 — the underscore must stay
    // literal or name_1Xx would match too
    val out = wh.readSlice(spark, "people",
      conditions = Seq(Condition("name", Op.Contains, "name_10")))
    assert(out.count() == 11)
    assert(SqlWhere.condition(Condition("name", Op.Contains, "a_b%c")) ==
      "\"name\" LIKE '%a!_b!%c%' ESCAPE '!'")
  }

  test("Spark-side filters push into the JDBC scan") {
    val df = wh.read(spark, "people").where(col("segment") === "GOLD")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(segment,GOLD)"))
    assert(df.count() == 66)
  }

  test("partitioned read fans out to N origin queries") {
    val df = wh.readSlice(spark, "people",
      conditions = Seq(Condition("segment", Op.Eq, "BASE")),
      partitioning = Some(JdbcPartitioning("id", 1, 200, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 134)
  }

  test("write round-trips a DataFrame through the origin") {
    val src = Tables(spark, sf0001, "nation")
      .select(col("n_nationkey").cast("long").as("nkey"),
        col("n_name").cast("string").as("nname"))
    wh.write(src.withColumn("nname", col("nname").cast("string")), "nations_rt",
      SaveMode.Overwrite)
    val back = wh.read(spark, "nations_rt")
    assert(back.count() == src.count())
    assert(back.agg(sum(col("nkey"))).head().getLong(0) ==
      src.agg(sum(col("nkey"))).head().getLong(0))
  }

  test("backslash literals render per dialect (ANSI vs backslash-escaping)") {
    // ANSI: backslash is not special, quote doubling alone
    assert(SqlWhere.literal("a\\") == "'a\\'")
    // backslash mode: a trailing '\' must not escape the closing quote
    assert(SqlWhere.literal("a\\", backslashEscapes = true) == "'a\\\\'")
    assert(SqlWhere.condition(Condition("name", Op.Eq, "a\\"),
      backslashEscapes = true) == "\"name\" = 'a\\\\'")
    // Contains: string-level doubling composes with the LIKE '!' escaping
    assert(SqlWhere.condition(Condition("name", Op.Contains, "a\\_b"),
      backslashEscapes = true) == "\"name\" LIKE '%a\\\\!_b%' ESCAPE '!'")
    // cursor values pass through the same literal path
    assert(SqlWhere.cursor("created",
      Cursor(CursorMode.CreatedAt, start = Some("x\\")),
      backslashEscapes = true) == Seq("\"created\" >= 'x\\\\'"))
  }

  test("MySQL-url warehouse wires backslash doubling and backtick quoting") {
    val my = JdbcWarehouse("mysql", "jdbc:mysql://example.invalid:3306/db")
    val sql = my.compileSlice("people",
      conditions = Seq(Condition("name", Op.Eq, "O'Brien\\")),
      cursorField = Some("created"),
      cursor = Some(Cursor(CursorMode.CreatedAt, start = Some("2024-01-01"))))
    assert(sql == "(SELECT * FROM people WHERE `name` = 'O''Brien\\\\'" +
      " AND `created` >= '2024-01-01') AS graft_slice")
    // the ANSI warehouse leaves backslashes untouched on the same call path
    assert(wh.compileSlice("people",
      conditions = Seq(Condition("name", Op.Eq, "a\\"))) ==
      "(SELECT * FROM people WHERE \"name\" = 'a\\') AS graft_slice")
  }

  test("SqlWhere rejects identifier injection and quotes literals") {
    intercept[IllegalArgumentException] {
      SqlWhere.condition(Condition("id; DROP TABLE people", Op.Eq, 1))
    }
    assert(SqlWhere.condition(Condition("name", Op.Eq, "O'Brien")) ==
      "\"name\" = 'O''Brien'")
    assert(SqlWhere.cursor("id",
      Cursor(CursorMode.Uid, start = Some("5"))) == Seq("\"id\" >= 5"))
    intercept[NumberFormatException] {
      SqlWhere.cursor("id", Cursor(CursorMode.Uid, start = Some("5 OR 1=1")))
    }
  }
}
