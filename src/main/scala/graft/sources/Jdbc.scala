package graft.sources

import graft.conditions.{Condition, Op}
import graft.cursor.{Cursor, CursorMode}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Compile the Condition/Cursor algebra into an ANSI SQL WHERE fragment.
  *
  * This is the Spark analogue of the reference's connector-side query
  * compilation (core/utils.py:195-652 `build_cursor_query_params` /
  * `build_connector_params`): where the reference turns a logical filter
  * into per-warehouse HTTP params so the ORIGIN does the filtering, a JDBC
  * warehouse turns it into a WHERE clause inside the pushed-down query so
  * the DATABASE does — at 100 TB the difference between shipping a table
  * and shipping a slice.
  *
  * Identifiers are validated (no injection surface) and then QUOTED with
  * the caller-supplied quoting function — Spark's JDBC writer creates
  * quoted, case-exact column names, so an unquoted WHERE would fold to
  * the database's default case and miss them. Values render as ANSI
  * literals with quote doubling; CONTAINS renders as LIKE with an explicit
  * ESCAPE so wildcard characters in the needle stay literal.
  *
  * Backslash-escaping dialects (MySQL family with default sql_mode treat
  * `\` inside a string literal as an escape): quote doubling alone is NOT
  * enough there — a value ending in `\` would render as `'foo\'`, the
  * backslash escaping the closing quote, which both breaks the query and
  * re-opens an injection surface. Callers pass `backslashEscapes = true`
  * (JdbcWarehouse derives it from the url) and literals double backslashes
  * too.
  */
object SqlWhere {

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r

  def identifier(name: String): String = name match {
    case Ident() => name
    case _ => throw new IllegalArgumentException(s"invalid SQL identifier: $name")
  }

  /** ANSI double-quote after validation — matches how Spark's JDBC write
    * path creates columns (dialect-quoted, case preserved). */
  def ansiQuote(name: String): String = "\"" + identifier(name) + "\""

  def literal(v: Any, backslashEscapes: Boolean = false): String = v match {
    case null => "NULL"
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Short => n.toString
    case n: Byte => n.toString
    case n: Double => n.toString
    case n: Float => n.toString
    case n: BigDecimal => n.toString
    case n: java.math.BigDecimal => n.toString
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case s => "'" + escapeString(s.toString, backslashEscapes) + "'"
  }

  private def escapeString(raw: String, backslashEscapes: Boolean): String = {
    val bs = if (backslashEscapes) raw.replace("\\", "\\\\") else raw
    bs.replace("'", "''")
  }

  /** LIKE pattern for a contains-match: escape the escape char first, then
    * the LIKE metacharacters, then wrap in %...%. The explicit ESCAPE
    * clause overrides MySQL's default `\` pattern-escape, so only the
    * string-literal level needs backslash doubling. */
  private def likePattern(needle: String, backslashEscapes: Boolean): String = {
    val esc = needle.replace("!", "!!").replace("%", "!%").replace("_", "!_")
    "'%" + escapeString(esc, backslashEscapes) + "%' ESCAPE '!'"
  }

  def condition(c: Condition, quote: String => String = ansiQuote,
      backslashEscapes: Boolean = false): String = {
    val f = quote(c.field)
    def lit(v: Any): String = literal(v, backslashEscapes)
    c.op match {
      case Op.Eq  => s"$f = ${lit(c.value)}"
      case Op.Gt  => s"$f > ${lit(c.value)}"
      case Op.Gte => s"$f >= ${lit(c.value)}"
      case Op.Lt  => s"$f < ${lit(c.value)}"
      case Op.Lte => s"$f <= ${lit(c.value)}"
      case Op.In =>
        val vs = c.value match {
          case xs: Seq[_]      => xs
          case xs: Array[_]    => xs.toSeq
          case xs: Iterable[_] => xs.toSeq
          case single          => Seq(single)
        }
        require(vs.nonEmpty, s"IN condition on '$f' with no values")
        s"$f IN (${vs.map(lit).mkString(", ")})"
      case Op.Contains => s"$f LIKE ${likePattern(c.value.toString, backslashEscapes)}"
      case Op.StartsWith =>
        val esc = c.value.toString
          .replace("!", "!!").replace("%", "!%").replace("_", "!_")
        s"$f LIKE '${escapeString(esc, backslashEscapes)}%' ESCAPE '!'"
      case Op.IsNull   => s"$f IS NULL"
      case Op.NotNull  => s"$f IS NOT NULL"
    }
  }

  /** Cursor window → range fragments (asc: start is the lower bound, desc
    * swaps — same bound semantics as [[graft.cursor.Cursor.slice]]). Uid
    * cursors render numeric literals (the cursor value is a stringified
    * number, reference core/types.py:24); date/timestamp cursors render
    * quoted strings the database compares/casts itself. */
  def cursor(cursorField: String, cur: Cursor,
      quote: String => String = ansiQuote,
      backslashEscapes: Boolean = false): Seq[String] = {
    val f = quote(cursorField)
    def render(v: String): String = cur.mode match {
      case CursorMode.Uid =>
        // fail loudly on a non-numeric uid rather than quote-switching
        BigDecimal(v).toString
      case _ => literal(v, backslashEscapes)
    }
    val (lo, hi) = if (cur.ascending) (cur.start, cur.end) else (cur.end, cur.start)
    lo.map(v => s"$f >= ${render(v)}").toSeq ++ hi.map(v => s"$f <= ${render(v)}").toSeq
  }

  def and(fragments: Seq[String]): Option[String] =
    if (fragments.isEmpty) None else Some(fragments.mkString(" AND "))
}

/** Range partitioning for a parallel JDBC scan: Spark issues one query per
  * stride of [lower, upper] on `column` — the lever that turns a 1-thread
  * JDBC read into an N-executor one. The column must be numeric/date/
  * timestamp and SHOULD be indexed on the origin. */
final case class JdbcPartitioning(
    column: String, lower: Long, upper: Long, numPartitions: Int)

/** JDBC warehouse: resources are tables reachable through one JDBC url
  * (reference: core/connector.py `BaseConnector` over HTTP — here the
  * origin speaks SQL, so WHERE/cursor compilation pushes into the origin
  * instead of into query params).
  *
  * Two read paths, both origin-filtered:
  *  - `read(...).where(col)` — Spark's own JDBC pushdown compiles Catalyst
  *    filters into the generated query (visible as PushedFilters in the
  *    scan node);
  *  - `readSlice(...)` — conditions + cursor compile through [[SqlWhere]]
  *    into a subquery BEFORE Spark sees the plan, mirroring the
  *    reference's connector-side param compilation and guaranteeing the
  *    origin filters even for predicates Spark's dialect would not push.
  */
final case class JdbcWarehouse(
    name: String,
    url: String,
    auth: Auth = Auth.None,
    readOptions: Map[String, String] = Map.empty,
    writeOptions: Map[String, String] = Map.empty) extends Warehouse {

  private def table(resource: String): String = SqlWhere.identifier(resource)

  /** Per-origin identifier quoting (backticks for MySQL, double quotes
    * for ANSI databases) — the same rule Spark's own pushdown uses, so
    * SqlWhere-compiled predicates hit the case-exact columns the JDBC
    * write path creates. */
  private def quote(name: String): String =
    org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(SqlWhere.identifier(name))

  /** MySQL-family origins treat `\` as a string-literal escape under the
    * default sql_mode, so literals there must double backslashes as well
    * as quotes (NO_BACKSLASH_ESCAPES origins tolerate the doubling being
    * absent only; doubling is never harmful because `\\` is `\` either
    * way under backslash mode and ANSI origins never see the flag). */
  private def backslashEscapes: Boolean = {
    val u = url.toLowerCase(java.util.Locale.ROOT)
    u.startsWith("jdbc:mysql") || u.startsWith("jdbc:mariadb")
  }

  override def read(spark: SparkSession, resource: String): DataFrame =
    spark.read.format("jdbc")
      .options(readOptions ++ auth.asOptions)
      .option("url", url)
      .option("dbtable", table(resource))
      .load()

  /** The derived-table expression readSlice scans: SELECT * FROM resource
    * WHERE <conditions AND cursor window>, rendered in this origin's
    * dialect (identifier quoting AND backslash-escape mode) — exposed so
    * dialect rendering is testable without a live connection. */
  def compileSlice(
      resource: String,
      conditions: Seq[Condition] = Nil,
      cursorField: Option[String] = None,
      cursor: Option[Cursor] = None): String = {
    val cursorFrags = (cursorField, cursor) match {
      case (Some(f), Some(c)) => SqlWhere.cursor(f, c, quote, backslashEscapes)
      case (None, None)       => Nil
      case _ => throw new IllegalArgumentException(
        "cursorField and cursor must be provided together")
    }
    val where = SqlWhere.and(
      conditions.map(SqlWhere.condition(_, quote, backslashEscapes)) ++ cursorFrags)
    where match {
      case Some(w) => s"(SELECT * FROM ${table(resource)} WHERE $w) AS graft_slice"
      case None    => table(resource)
    }
  }

  /** Origin-side slice: SELECT * FROM resource WHERE <conditions AND
    * cursor window>, wrapped as a derived table so it composes with
    * Spark's column pruning and (optionally) a partitioned parallel scan. */
  def readSlice(
      spark: SparkSession,
      resource: String,
      conditions: Seq[Condition] = Nil,
      cursorField: Option[String] = None,
      cursor: Option[Cursor] = None,
      partitioning: Option[JdbcPartitioning] = None): DataFrame = {
    val dbtable = compileSlice(resource, conditions, cursorField, cursor)
    val reader = spark.read.format("jdbc")
      .options(readOptions ++ auth.asOptions)
      .option("url", url)
      .option("dbtable", dbtable)
    partitioning.fold(reader) { p =>
      reader
        .option("partitionColumn", SqlWhere.identifier(p.column))
        .option("lowerBound", p.lower)
        .option("upperBound", p.upper)
        .option("numPartitions", p.numPartitions)
    }.load()
  }

  override def write(df: DataFrame, resource: String, mode: SaveMode): Unit =
    df.write.format("jdbc")
      .options(writeOptions ++ auth.asOptions)
      .option("url", url)
      .option("dbtable", table(resource))
      .mode(mode)
      .save()
}
