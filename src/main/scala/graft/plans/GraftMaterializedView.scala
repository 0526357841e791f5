package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

import graft.operators.IncrementalAgg
import graft.sources.{GraftCatalog, ManifestTable}

/** SQL MATERIALIZED VIEW doors over the incremental-aggregate stack:
  *
  * {{{
  *   CREATE MATERIALIZED VIEW graft.mv AS
  *     SELECT status, count(*) AS n, sum(price) AS sum_price
  *     FROM graft.src GROUP BY status
  *   REFRESH MATERIALIZED VIEW graft.mv
  * }}}
  *
  * CREATE materializes the rollup in [[IncrementalAgg.materialize]]'s
  * maintainable shape as a graft table, records the (source, dims,
  * measures, refreshed-version) contract in an `_mv.json` sidecar, and
  * registers the transparent [[MvRewrite]] for the session — a
  * `GROUP BY` over the SOURCE then scans the few-KB rollup instead of
  * the fact table. REFRESH catches the rollup up to the source's
  * current version: INCREMENTALLY over the change feed when every
  * missing commit is append-only or CDC-materialized (cost rides the
  * delta — the 100 TB nightly-refresh shape), by full recompute
  * otherwise (correct for any history, cost rides the table).
  *
  * The accepted SELECT shape is exactly the maintainable algebra —
  * plain dim grouping, `count(*) AS n`, `sum(m) AS sum_<m>` —
  * anything richer (distinct, holistic aggs, expressions, filters)
  * refuses loudly at CREATE rather than silently materializing a
  * rollup the maintenance machinery cannot keep fresh.
  */
object GraftMaterializedView {

  private[plans] val SidecarFile = "_mv.json"

  case class MvSpec(source: String, dims: Seq[String],
      measures: Seq[String], version: Long,
      // min/max measure columns (min_<m>/max_<m> in the rollup) —
      // absent in pre-minmax sidecars, json4s fills the default
      minMax: Seq[String] = Seq.empty)

  private[plans] def writeSpec(mvPath: String, spec: MvSpec): Unit = {
    import org.json4s._
    import org.json4s.jackson.Serialization
    implicit val fmt: Formats = DefaultFormats
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(mvPath, SidecarFile),
      Serialization.write(spec))
    ()
  }

  def readSpec(mvPath: String): Option[MvSpec] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val f = java.nio.file.Paths.get(mvPath, SidecarFile)
    if (!java.nio.file.Files.isRegularFile(f)) None
    else scala.util.Try(
      JsonMethods.parse(java.nio.file.Files.readString(f))
        .extract[MvSpec]).toOption
  }

  /** Destructure the CREATE's SELECT into (source table parts, dims,
    * measures), refusing any shape the incremental maintenance cannot
    * keep fresh. */
  private[plans] def parseSelect(spark: SparkSession, selectSql: String)
      : (Seq[String], Seq[String], Seq[String], Seq[String]) = {
    def refuse(why: String): Nothing = throw new IllegalArgumentException(
      "CREATE MATERIALIZED VIEW accepts exactly " +
        "`SELECT <dims...>, count(*) AS n, sum(<m>) AS sum_<m>..., " +
        "min(<m>) AS min_<m>, max(<m>) AS max_<m> " +
        s"FROM <table> GROUP BY <dims...>` — $why")
    val plan = spark.sessionState.sqlParser.parsePlan(selectSql)
    val agg = plan match {
      case a: Aggregate => a
      case _ => refuse(s"got a ${plan.nodeName}, not a grouped aggregate")
    }
    val srcParts = agg.child match {
      case r: UnresolvedRelation => r.multipartIdentifier
      case other => refuse(s"FROM must be a catalog table, got ${other.nodeName}")
    }
    val dims = agg.groupingExpressions.map {
      case a: UnresolvedAttribute => a.nameParts.last
      case other => refuse(s"GROUP BY must name plain columns, got ${other.sql}")
    }
    val minMaxBuf = scala.collection.mutable.LinkedHashSet[String]()
    val measures = agg.aggregateExpressions.flatMap {
      case a: UnresolvedAttribute =>
        if (!dims.contains(a.nameParts.last))
          refuse(s"selected column '${a.nameParts.last}' is not a GROUP BY dim")
        None
      case Alias(f: UnresolvedFunction, alias) =>
        (f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)),
            f.arguments) match {
          case (Seq("count"), Seq(_: Literal) | Seq(_: UnresolvedStar))
              if !f.isDistinct =>
            if (alias != "n") refuse("count(*) must be aliased AS n")
            None
          case (Seq("sum"), Seq(m: UnresolvedAttribute)) if !f.isDistinct =>
            val name = m.nameParts.last
            if (alias != s"sum_$name")
              refuse(s"sum($name) must be aliased AS sum_$name")
            Some(name)
          case (Seq(fn @ ("min" | "max")), Seq(m: UnresolvedAttribute))
              if !f.isDistinct =>
            val name = m.nameParts.last
            if (alias != s"${fn}_$name")
              refuse(s"$fn($name) must be aliased AS ${fn}_$name")
            minMaxBuf += name
            None
          case _ => refuse(s"unsupported aggregate ${f.nameParts.mkString(".")}" +
            (if (f.isDistinct) " DISTINCT" else ""))
        }
      case other => refuse(s"unsupported select item ${other.sql}")
    }
    val hasCount = agg.aggregateExpressions.exists {
      case Alias(f: UnresolvedFunction, "n") =>
        f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("count")
      case _ => false
    }
    if (!hasCount) refuse("the view must carry count(*) AS n " +
      "(the maintenance state that lets deletes retire groups)")
    if (dims.isEmpty) refuse("need at least one GROUP BY dim")
    // a min without its max (or vice versa) would leave the stored
    // shape asymmetric for no gain; require the pair
    minMaxBuf.foreach { m =>
      def has(fn: String) = agg.aggregateExpressions.exists {
        case Alias(f: UnresolvedFunction, a) =>
          a == s"${fn}_$m" &&
            f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq(fn)
        case _ => false
      }
      if (!has("min") || !has("max"))
        refuse(s"min/max of '$m' must be selected as a pair " +
          s"(min($m) AS min_$m, max($m) AS max_$m)")
    }
    (srcParts, dims, measures, minMaxBuf.toSeq)
  }

  /** Re-register the session's transparent rewrite onto the CURRENT
    * live rollup files (the registration pins a concrete file listing,
    * so every CREATE/REFRESH re-registers). */
  private[plans] def registerRewrite(spark: SparkSession,
      mvPath: String, spec: MvSpec): Unit = {
    // the rollup read pins the manifest's LIVE file listing, never a
    // directory glob: superseded rollup files stay on disk through the
    // vacuum grace window (see commitRollup) and a glob would
    // double-count them
    val m = ManifestTable.snapshotAt(mvPath, None).getOrElse(
      throw new IllegalStateException(s"$mvPath has no committed rollup"))
    val files = m.files.map(f =>
      java.nio.file.Paths.get(mvPath, "data").resolve(f).toString)
    MvRewrite.register(spark, spec.source,
      spark.read.parquet(files: _*), spec.dims, spec.measures,
      // version-ARMED: the rewrite re-checks the source head at
      // substitution time, so a post-registration base write de-arms
      // this registration instead of serving a pre-write rollup
      baseVersion = Some(spec.version),
      minMax = spec.minMax)
  }

  /** Commit the rollup frame as the MV table's next version and retire
    * the superseded rollup — the MV is DERIVED data with a fresh-files
    * registration contract, not an archival table. Before the sweep,
    * every session's registration pinned to the OLD rollup listing is
    * purged (those dashboards fall back to base scans until they
    * re-register — correct, the listing they pinned is being replaced),
    * and the vacuum keeps the standard age grace so a query already
    * mid-flight on the old files drains before they disappear. */
  private[plans] def commitRollup(spark: SparkSession, mvPath: String,
      mv: org.apache.spark.sql.DataFrame): Unit = {
    ManifestTable.overwrite(mv, mvPath)
    MvRewrite.purgeForPath(mvPath)
    ManifestTable.expire(mvPath, keepLast = 1)
    ()
  }

  /** The CREATE machinery behind both doors (SQL statement, HTTP
    * route): commit the materialized rollup at `mvPath`, persist the
    * maintenance contract, register the session's rewrite. */
  def createAt(spark: SparkSession, mvPath: String, srcPath: String,
      dims: Seq[String], measures: Seq[String], srcVersion: Long,
      mv: org.apache.spark.sql.DataFrame,
      minMax: Seq[String] = Seq.empty): Unit = {
    commitRollup(spark, mvPath, mv)
    val spec = MvSpec(srcPath, dims, measures, srcVersion, minMax)
    writeSpec(mvPath, spec)
    registerRewrite(spark, mvPath, spec)
  }

  /** Register every CURRENT materialized view of a warehouse for this
    * session — the opt-in a fresh session (notebook, service worker)
    * makes to benefit from rollups other sessions maintain. Only views
    * whose sidecar version EQUALS the source's latest register: the
    * rewrite's freshness contract is never guessed, a stale view simply
    * stays unregistered until someone REFRESHes it. Returns the
    * registered (mvPath, sourcePath) pairs. */
  def registerAll(spark: SparkSession,
      warehouseDir: String): Seq[(String, String)] = {
    val root = java.nio.file.Paths.get(warehouseDir)
    if (!java.nio.file.Files.isDirectory(root)) return Seq.empty
    val found = scala.util.Using.resource(
        java.nio.file.Files.walk(root, 3)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(_.getFileName.toString == SidecarFile)
        .map(_.getParent.toString).toList
    }
    found.flatMap { mvPath =>
      readSpec(mvPath).flatMap { spec =>
        val fresh = scala.util.Try(
          ManifestTable.latestVersion(spec.source) == spec.version)
          .getOrElse(false)
        if (!fresh) None
        else {
          registerRewrite(spark, mvPath, spec)
          Some(mvPath -> spec.source)
        }
      }
    }
  }

  /** The REFRESH machinery behind both doors: catch the rollup up to
    * the source's current version — incrementally over the change feed
    * when every missing data commit supports one, by full recompute
    * otherwise, noop across maintenance-only gaps. Returns
    * (source version, mode). */
  def refreshAt(spark: SparkSession, mvPath: String): (Long, String) = {
    val spec = readSpec(mvPath).getOrElse(throw new IllegalArgumentException(
      s"$mvPath is not a materialized view (no ${SidecarFile})"))
    val cur = ManifestTable.latestVersion(spec.source)
    // maintenance commits (OPTIMIZE/compaction, dataChange=false) change
    // no rows — a gap of only those is as fresh as no gap at all; the
    // sidecar advances so the next refresh doesn't re-walk it
    if (ManifestTable.versions(spec.source)
        .filter(v => v > spec.version && v <= cur)
        .forall(v => !ManifestTable.isDataChange(spec.source, v))) {
      val advanced = spec.copy(version = cur)
      if (cur != spec.version) writeSpec(mvPath, advanced)
      registerRewrite(spark, mvPath, advanced) // freshness contract holds
      return (cur, "noop")
    }
    // incremental over the change feed when every missing commit can
    // produce one (appends always; delta commits need materialized CDC);
    // otherwise a full recompute — correct for ANY history
    val (next, mode) =
      try {
        val feed = ManifestTable.changeFeed(spark, spec.source,
          spec.version, cur)
        (graft.operators.IncrementalAgg.applyCdf(
          ManifestTable.read(spark, mvPath), feed,
          spec.dims, spec.measures, spec.minMax), "incremental")
      } catch {
        case _: IllegalStateException =>
          // no materialized CDC for a commit, or a delete touched a
          // min/max view — either way the full recompute is correct
          (graft.operators.IncrementalAgg.materialize(
            ManifestTable.read(spark, spec.source, Some(cur)),
            spec.dims, spec.measures, spec.minMax), "full")
      }
    commitRollup(spark, mvPath, next)
    val updated = spec.copy(version = cur)
    writeSpec(mvPath, updated)
    registerRewrite(spark, mvPath, updated)
    (cur, mode)
  }
}

/** `CREATE MATERIALIZED VIEW <mv> AS <select>` */
case class GraftCreateMvCommand(target: Either[String, Seq[String]],
    selectSql: String) extends LeafRunnableCommand {
  import GraftMaterializedView._

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("source_version", LongType),
    GraftSqlParser.attr("groups", LongType))

  override def run(spark: SparkSession): Seq[Row] = {
    val (srcParts, dims, measures, minMax) = parseSelect(spark, selectSql)
    val srcPath = GraftSqlParser.resolvePath(spark, Right(srcParts))
    val mvPath = GraftSqlParser.resolveNewPath(spark, target)
    val srcV = ManifestTable.latestVersion(srcPath)
    createAt(spark, mvPath, srcPath, dims, measures, srcV,
      IncrementalAgg.materialize(
        ManifestTable.read(spark, srcPath, Some(srcV)), dims, measures,
        minMax),
      minMax)
    Seq(Row(srcV, ManifestTable.read(spark, mvPath).count()))
  }
}

/** `REFRESH MATERIALIZED VIEW <mv>` */
case class GraftRefreshMvCommand(target: Either[String, Seq[String]])
  extends LeafRunnableCommand {
  import GraftMaterializedView._

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("source_version", LongType),
    GraftSqlParser.attr("mode", StringType))

  override def run(spark: SparkSession): Seq[Row] = {
    val (v, mode) = refreshAt(spark,
      GraftSqlParser.resolvePath(spark, target))
    Seq(Row(v, mode))
  }
}
