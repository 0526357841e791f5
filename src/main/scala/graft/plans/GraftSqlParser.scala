package graft.plans

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}

import graft.sources.{GraftCatalog, ManifestTable}

/** SQL MAINTENANCE statements — the lakehouse surface Spark's grammar
  * lacks (Delta/Iceberg ship the same families through their own
  * injected parsers):
  *
  * {{{
  *   OPTIMIZE graft.crm.orders                          -- compact
  *   OPTIMIZE graft.crm.orders ZORDER BY (k, ts)        -- re-cluster
  *   OPTIMIZE '<path>' TARGET 134217728                 -- path form
  *   OPTIMIZE t INCREMENTAL                             -- fold small files
  *   OPTIMIZE t WHERE day = '2024-06-01'                -- scoped rewrite
  *   OPTIMIZE t INCREMENTAL WHERE day = '2024-06-01'    -- O(new data)
  *   VACUUM graft.crm.orders RETAIN 10 VERSIONS         -- expire + sweep
  *   VACUUM t RETAIN 1 VERSIONS FORCE DRY RUN           -- report only
  *   ANALYZE TABLE t COMPUTE STATISTICS [FOR ... COLUMNS] -- CBO stats
  *   ALTER TABLE t ADD|DROP PARTITION FIELD c           -- spec evolution
  *   CREATE TABLE dev SHALLOW CLONE t [VERSION AS OF 3] -- zero-copy branch
  *   CREATE MATERIALIZED VIEW mv AS SELECT ...          -- maintained rollup
  *   REFRESH MATERIALIZED VIEW mv                       -- incremental/full
  *   ALTER TABLE t PUBLISH WAP 'id'                     -- adopt staged batches
  *   ALTER TABLE t ABORT WAP 'id'                       -- drop them unpublished
  *   ALTER TABLE t CREATE TAG 'v2' [AS OF VERSION n]    -- named version pin
  *   ALTER TABLE t DROP TAG 'v2'                        -- release the pin
  *   ALTER TABLE t CREATE BRANCH 'b' [AS OF VERSION n]  -- fork a writable ref
  *   ALTER TABLE t FAST FORWARD BRANCH 'b'              -- publish it atomically
  *   ALTER TABLE t REBASE BRANCH 'b'                    -- re-point the fork base
  *   ALTER TABLE t DROP BRANCH 'b'                      -- abandon it
  * }}}
  *
  * (WAP staging itself is the session conf `spark.graft.wap.id`: while
  * set, `INSERT INTO` a graft table stages instead of committing, and
  * direct-commit doors — overwrite, merge, update, delete, streaming
  * epochs — refuse loudly rather than bypass the isolation.)
  *
  * Injected via `SparkSessionExtensions.injectParser`; everything that
  * is not one of these statements delegates verbatim to Spark's
  * parser, so the dialect is a strict superset. The statements parse
  * into [[LeafRunnableCommand]]s — side effects run at EXECUTION, not
  * analysis, exactly like Spark's own DDL commands. Targets name either
  * a catalog table (resolved through the session's registered
  * [[GraftCatalog]]) or a quoted filesystem path (the manifest API's
  * path form).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // target = quoted path | multipart identifier (backquotes allowed —
  // the identifier tail re-parses through Spark's own identifier parser)
  private val Optimize = Pattern.compile(
    """(?is)^\s*OPTIMIZE\s+('[^']+'|[\w.`]+)""" +
      """(?:\s+TARGET\s+(\d+))?""" +
      """(?:\s+(INCREMENTAL))?""" +
      """(?:\s+WHERE\s+(.+?))?""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""")
  private val Vacuum = Pattern.compile(
    """(?is)^\s*VACUUM\s+('[^']+'|[\w.`]+)""" +
      """(?:\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?(\s+FORCE)?""" +
      """(?:\s+(DRY\s+RUN))?\s*;?\s*$""")
  // the maintenance advisor's execution door (RUN is a non-Spark
  // leading token, so every real statement still delegates)
  private val RunMaint = Pattern.compile(
    """(?is)^\s*RUN\s+MAINTENANCE\s+('[^']+'|[\w.`]+)""" +
      """(?:\s+TARGET\s+(\d+))?""" +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$""")
  private val Analyze = Pattern.compile(
    """(?is)^\s*ANALYZE\s+TABLE\s+('[^']+'|[\w.`]+)\s+COMPUTE\s+STATISTICS""" +
      """(?:\s+FOR\s+(?:(ALL)\s+COLUMNS|COLUMNS\s+([\w.`]+(?:\s*,\s*[\w.`]+)*)))?""" +
      """\s*;?\s*$""")
  // Iceberg's partition-spec-evolution statements (not Spark grammar —
  // Spark's own ALTER TABLE ... ADD PARTITION takes a value spec, a
  // different token sequence, and still delegates)
  private val AlterPartField = Pattern.compile(
    """(?is)^\s*ALTER\s+TABLE\s+('[^']+'|[\w.`]+)\s+""" +
      """(ADD|DROP)\s+PARTITION\s+FIELD\s+([\w.`]+)\s*;?\s*$""")
  // Delta's zero-copy clone statement (SHALLOW is a non-Spark token, so
  // plain CREATE TABLE still delegates)
  private val Clone = Pattern.compile(
    """(?is)^\s*CREATE\s+TABLE\s+('[^']+'|[\w.`]+)\s+SHALLOW\s+CLONE\s+""" +
      """('[^']+'|[\w.`]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""")
  // materialized views (Spark has no MV grammar; Databricks/Redshift
  // shape) — the SELECT tail re-parses through Spark's own parser
  private val CreateMv = Pattern.compile(
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+('[^']+'|[\w.`]+)\s+AS\s+""" +
      """(.+?)\s*;?\s*$""")
  private val RefreshMv = Pattern.compile(
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+('[^']+'|[\w.`]+)\s*;?\s*$""")
  // write-audit-publish resolution (PUBLISH/ABORT are non-Spark tokens
  // after ALTER TABLE <t>, so every real ALTER still delegates)
  // version tags (Iceberg's named snapshot pins; CREATE/DROP TAG are
  // non-Spark tokens after ALTER TABLE <t>, so real ALTERs delegate)
  private val TagStmt = Pattern.compile(
    """(?is)^\s*ALTER\s+TABLE\s+('[^']+'|[\w.`]+)\s+""" +
      """(CREATE|DROP)\s+TAG\s+'([^']+)'""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""")
  private val WapResolve = Pattern.compile(
    """(?is)^\s*ALTER\s+TABLE\s+('[^']+'|[\w.`]+)\s+""" +
      """(PUBLISH|ABORT)\s+WAP\s+'([^']+)'\s*;?\s*$""")
  // branch refs (Iceberg branches; CREATE/DROP/FAST FORWARD/REBASE
  // BRANCH are non-Spark token sequences, so real ALTERs delegate)
  private val BranchStmt = Pattern.compile(
    """(?is)^\s*ALTER\s+TABLE\s+('[^']+'|[\w.`]+)\s+""" +
      """(CREATE|DROP|FAST\s+FORWARD|REBASE)\s+BRANCH\s+'([^']+)'""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""")

  private def target(raw: String, delegate: ParserInterface)
      : Either[String, Seq[String]] =
    if (raw.startsWith("'")) Left(raw.substring(1, raw.length - 1))
    else Right(delegate.parseMultipartIdentifier(raw))

  private[plans] def parseMaintenance(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = {
    val om = Optimize.matcher(sqlText)
    if (om.matches()) {
      val zorder = Option(om.group(5)).toSeq.flatMap(_.split(",").toSeq)
        .map(c => delegate.parseMultipartIdentifier(c.trim).last)
      return Some(GraftOptimizeCommand(target(om.group(1), delegate),
        Option(om.group(2)).map(_.toLong), zorder,
        where = Option(om.group(4)).map(_.trim).filter(_.nonEmpty),
        incremental = om.group(3) != null))
    }
    val vm = Vacuum.matcher(sqlText)
    if (vm.matches())
      return Some(GraftVacuumCommand(target(vm.group(1), delegate),
        Option(vm.group(2)).map(_.toInt),
        hours = Option(vm.group(3)).exists(_.equalsIgnoreCase("HOURS")),
        force = vm.group(4) != null,
        dryRun = vm.group(5) != null))
    val rm = RunMaint.matcher(sqlText)
    if (rm.matches())
      return Some(GraftRunMaintenanceCommand(target(rm.group(1), delegate),
        Option(rm.group(2)).map(_.toLong),
        Option(rm.group(3)).map(_.toInt)))
    val cmv = CreateMv.matcher(sqlText)
    if (cmv.matches())
      return Some(GraftCreateMvCommand(target(cmv.group(1), delegate),
        cmv.group(2)))
    val rmv = RefreshMv.matcher(sqlText)
    if (rmv.matches())
      return Some(GraftRefreshMvCommand(target(rmv.group(1), delegate)))
    val tm = TagStmt.matcher(sqlText)
    if (tm.matches())
      return Some(GraftTagCommand(target(tm.group(1), delegate),
        create = tm.group(2).equalsIgnoreCase("CREATE"),
        name = tm.group(3),
        version = Option(tm.group(4)).map(_.toLong)))
    val wm = WapResolve.matcher(sqlText)
    if (wm.matches())
      return Some(GraftWapCommand(target(wm.group(1), delegate),
        publish = wm.group(2).equalsIgnoreCase("PUBLISH"),
        wapId = wm.group(3)))
    val bm = BranchStmt.matcher(sqlText)
    if (bm.matches())
      return Some(GraftBranchCommand(target(bm.group(1), delegate),
        action = bm.group(2).toUpperCase.replaceAll("\\s+", " "),
        name = bm.group(3),
        version = Option(bm.group(4)).map(_.toLong)))
    val cm = Clone.matcher(sqlText)
    if (cm.matches())
      return Some(GraftCloneCommand(target(cm.group(1), delegate),
        target(cm.group(2), delegate),
        Option(cm.group(3)).map(_.toLong)))
    val pm = AlterPartField.matcher(sqlText)
    if (pm.matches())
      return Some(GraftAlterPartitionFieldCommand(
        target(pm.group(1), delegate),
        add = pm.group(2).equalsIgnoreCase("ADD"),
        column = delegate.parseMultipartIdentifier(pm.group(3)).last))
    val am = Analyze.matcher(sqlText)
    if (am.matches()) {
      val tgt = target(am.group(1), delegate)
      // strict-superset discipline: ANALYZE is valid Spark syntax for
      // session-catalog (v1) tables — `mydb.mytable` has a DATABASE
      // head, not a catalog. Only intercept when the head is a catalog
      // the session has REGISTERED as a GraftCatalog (conf probe — no
      // catalog instantiation at parse time); everything else delegates
      val ours = tgt match {
        case Left(_)      => true
        case Right(parts) =>
          parts.length >= 2 &&
            org.apache.spark.sql.SparkSession.getActiveSession.exists(
              _.conf.getOption(s"spark.sql.catalog.${parts.head}")
                .contains(classOf[GraftCatalog].getName))
      }
      if (ours) {
        val cols: Option[Seq[String]] =
          if (am.group(2) != null) Some(Seq.empty) // FOR ALL COLUMNS
          else Option(am.group(3)).map(_.split(",").toSeq
            .map(c => delegate.parseMultipartIdentifier(c.trim).last))
        return Some(GraftAnalyzeCommand(tgt, cols))
      }
    }
    None
  }

  /** Resolve a statement target to a manifest-table path: quoted paths
    * pass through; identifiers resolve through the named catalog (which
    * must be a [[GraftCatalog]] — resolved lazily at EXECUTION so the
    * command works however the session learned its catalogs). */
  private[plans] def resolvePath(spark: SparkSession,
      target: Either[String, Seq[String]]): String = target match {
    case Left(path) => path
    case Right(parts) =>
      require(parts.length >= 2,
        s"qualify the table as <catalog>.[<ns>...]<table>, got ${parts.mkString(".")}")
      val cat = spark.sessionState.catalogManager.catalog(parts.head)
      require(cat.isInstanceOf[GraftCatalog],
        s"catalog '${parts.head}' is not a graft catalog")
      cat.asInstanceOf[GraftCatalog].pathOf(
        Identifier.of(parts.tail.init.toArray, parts.last))
  }

  /** Resolve a CREATE-family target to the directory the new table
    * will live at: quoted paths pass through, identifiers resolve to
    * the catalog's table dir and refuse an existing table. */
  private[plans] def resolveNewPath(spark: SparkSession,
      target: Either[String, Seq[String]]): String = target match {
    case Left(path) => path
    case Right(parts) =>
      require(parts.length >= 2,
        s"qualify the table as <catalog>.[<ns>...]<table>, got ${parts.mkString(".")}")
      val cat = spark.sessionState.catalogManager.catalog(parts.head)
      require(cat.isInstanceOf[GraftCatalog],
        s"catalog '${parts.head}' is not a graft catalog")
      cat.asInstanceOf[GraftCatalog].newTablePath(
        Identifier.of(parts.tail.init.toArray, parts.last))
  }

  private[plans] def attr(name: String, dt: DataType): AttributeReference =
    AttributeReference(name, dt, nullable = false)()

  /** Fold an `OPTIMIZE ... WHERE` predicate into the condition algebra
    * file-stats pruning speaks: a conjunction of
    * `col (=|>|>=|<|<=) literal`, `col IN (...)`, `col IS [NOT] NULL`.
    * Scoped compaction selects FILES, not rows (non-matching rows in a
    * matching file ride along unchanged), so only stats-prunable shapes
    * are meaningful — anything richer fails loudly here rather than
    * silently compacting the whole table. */
  private[graft] def whereConditions(spark: SparkSession,
      pred: String): Seq[graft.conditions.Condition] = {
    import org.apache.spark.sql.catalyst.expressions._
    import graft.conditions.{Condition, Op}
    def name(e: Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(a.nameParts.last)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def scala(l: Literal): Any = l.value match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case d: org.apache.spark.sql.types.Decimal       => d.toBigDecimal
      case v                                           => v
    }
    def fold(e: Expression): Seq[Condition] = e match {
      case And(l, r) => fold(l) ++ fold(r)
      case EqualTo(a, l: Literal) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Eq, scala(l)))
      case EqualTo(l: Literal, a) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Eq, scala(l)))
      case GreaterThan(a, l: Literal) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Gt, scala(l)))
      case GreaterThan(l: Literal, a) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Lt, scala(l)))
      case GreaterThanOrEqual(a, l: Literal) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Gte, scala(l)))
      case GreaterThanOrEqual(l: Literal, a) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Lte, scala(l)))
      case LessThan(a, l: Literal) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Lt, scala(l)))
      case LessThan(l: Literal, a) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Gt, scala(l)))
      case LessThanOrEqual(a, l: Literal) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Lte, scala(l)))
      case LessThanOrEqual(l: Literal, a) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.Gte, scala(l)))
      case In(a, vs) if name(a).isDefined &&
          vs.forall(_.isInstanceOf[Literal]) =>
        Seq(Condition(name(a).get, Op.In,
          vs.map(v => scala(v.asInstanceOf[Literal]))))
      case IsNull(a) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.IsNull, null))
      case IsNotNull(a) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.NotNull, null))
      case StartsWith(a, l: Literal) if name(a).isDefined =>
        Seq(Condition(name(a).get, Op.StartsWith, scala(l)))
      // LIKE 'prefix%' (no other wildcards, default escape) is a pure
      // prefix match — the one LIKE shape manifest bounds can prune
      case Like(a, l: Literal, escapeChar) if name(a).isDefined &&
          escapeChar == '\\' && {
            val s = scala(l).toString
            s.length > 1 && s.endsWith("%") &&
              !s.dropRight(1).exists(ch => ch == '%' || ch == '_' || ch == '\\')
          } =>
        Seq(Condition(name(a).get, Op.StartsWith,
          scala(l).toString.dropRight(1)))
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE ... WHERE supports conjunctions of simple " +
          s"column-vs-literal comparisons (file-level pruning), got: " +
          s"${other.sql}")
    }
    fold(spark.sessionState.sqlParser.parseExpression(pred))
  }
}

/** `OPTIMIZE <t> [TARGET <bytes>] [INCREMENTAL] [WHERE <pred>]
  * [ZORDER BY (cols)]` → [[ManifestTable.compactCommit]]: rewrite the
  * current version's live rows into ~TARGET-byte files (declared
  * partition layouts and ZORDER re-cluster, MoR deletes fold away),
  * publish ONE maintenance commit (dataChange=false — streams don't
  * replay it), keep every earlier version time-travelable. With WHERE,
  * [[ManifestTable.compactWhere]] compacts ONLY the files whose
  * stats-range intersects the predicate (compact yesterday's
  * partition, not the table) — the predicate must be a conjunction of
  * simple comparisons (the same language file-stats pruning speaks),
  * anything richer is rejected at execution. INCREMENTAL folds only
  * UNDER-FILLED files ([[ManifestTable.compactIncremental]], or the
  * under-filled slice of the WHERE scope) and carries every
  * already-at-target file — the nightly job that costs O(new data),
  * idempotent on re-run. */
case class GraftOptimizeCommand(target: Either[String, Seq[String]],
    targetBytes: Option[Long], zorderBy: Seq[String],
    where: Option[String] = None, incremental: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("version", LongType),
    GraftSqlParser.attr("files_before", LongType),
    GraftSqlParser.attr("files_after", LongType))

  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val before = ManifestTable.dataFiles(path).size.toLong
    // a parameter-free OPTIMIZE re-clusters on the table's DECLARED
    // layout: zorder.cols when set (Delta's table-property model);
    // declared PARTITIONED BY columns are handled by compactCommit
    val zs =
      if (zorderBy.nonEmpty) zorderBy
      else GraftCatalog.readDeclaredZOrder(java.nio.file.Paths.get(path))
    val bytes = targetBytes.getOrElse(128L * 1024 * 1024)
    val v = (where, incremental) match {
      case (Some(pred), inc) =>
        ManifestTable.compactWhere(spark, path,
          GraftSqlParser.whereConditions(spark, pred),
          targetBytes = bytes, zorderBy = zs,
          minFill = if (inc) Some(0.5) else None)
      case (None, true) =>
        ManifestTable.compactIncremental(spark, path,
          targetBytes = bytes, zorderBy = zs)
      case (None, false) =>
        ManifestTable.compactCommit(spark, path,
          targetBytes = bytes, zorderBy = zs)
    }
    Seq(Row(v, before, ManifestTable.dataFiles(path, Some(v)).size.toLong))
  }
}

/** `CREATE TABLE <t> SHALLOW CLONE <src> [VERSION AS OF <v>]` — Delta's
  * zero-copy clone as a SQL statement: the clone's v1 manifest
  * REFERENCES the source snapshot's files (absolute paths, no bytes
  * moved), history starts fresh, writes to the clone land next to it
  * and never touch the source. Declarative sidecars (schema,
  * partition layout, z-order, codec, merge keys) copy so the clone
  * BEHAVES like the source; constraints/generated columns already ride
  * the manifest. Standard shallow-clone hazard, same as Delta's:
  * VACUUM on the source can reap files a clone still references —
  * clones are for experiments and short-lived branches, not archival.
  * `VERSION AS OF` clones an older snapshot (zero-copy dev branch of
  * last week's table). */
case class GraftCloneCommand(target: Either[String, Seq[String]],
    source: Either[String, Seq[String]], srcVersion: Option[Long])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("clone_version", LongType),
    GraftSqlParser.attr("referenced_files", LongType))

  override def run(spark: SparkSession): Seq[Row] = {
    val srcPath = GraftSqlParser.resolvePath(spark, source)
    val dstPath = GraftSqlParser.resolveNewPath(spark, target)
    val v = ManifestTable.cloneShallow(srcPath, dstPath, srcVersion)
    // declarative sidecars: copy what the source declares so writes to
    // the clone honor the same layout/codec/keys contract
    val from = java.nio.file.Paths.get(srcPath)
    val to = java.nio.file.Paths.get(dstPath)
    Seq(GraftCatalog.SchemaFile, GraftCatalog.PartsFile,
      GraftCatalog.ZOrderFile, GraftCatalog.CompressionFile,
      GraftCatalog.KeysFile).foreach { f =>
      val s0 = from.resolve(f)
      if (java.nio.file.Files.isRegularFile(s0))
        java.nio.file.Files.copy(s0, to.resolve(f),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    Seq(Row(v, ManifestTable.dataFiles(dstPath, Some(v)).size.toLong))
  }
}

/** `ALTER TABLE <t> ADD|DROP PARTITION FIELD <col>` — PARTITION-SPEC
  * EVOLUTION (Iceberg's statement, on this format's stats-pruned
  * model): the declared layout changes for FUTURE writes only; no file
  * rewrites, no directory moves — existing files keep their clustering
  * and their manifest stats, so reads stay correct through the mix
  * (pruning is per-file stats, never directory paths, and
  * grouped-scan/SPJ eligibility is re-proven from the manifest each
  * plan, so it simply lapses for mixed snapshots until OPTIMIZE
  * re-clusters). The 100 TB operational story: yesterday's partition
  * scheme was wrong — fix it for tomorrow's data NOW, re-layout the
  * archive with OPTIMIZE when (or if) it pays. */
case class GraftAlterPartitionFieldCommand(target: Either[String, Seq[String]],
    add: Boolean, column: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("column", StringType),
    GraftSqlParser.attr("layout", StringType))

  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val dir = java.nio.file.Paths.get(path)
    val layout = GraftCatalog.readDeclaredLayout(dir)
    require(layout.forall(_.isInstanceOf[GraftCatalog.IdentityPart]),
      "partition-spec evolution supports identity layouts " +
        "(bucket layouts are a physical join contract — re-create)")
    val next: Seq[GraftCatalog.PartTransform] =
      if (add) {
        require(GraftCatalog.readDeclaredZOrder(dir).isEmpty,
          "zorder.cols and PARTITIONED BY are mutually exclusive")
        require(!layout.exists(_.col == column),
          s"'$column' is already a partition field")
        val schema = ManifestTable.schemaAt(spark, path)
        require(schema.fieldNames.contains(column),
          s"no column '$column' in table $path")
        require(ManifestTable.snapshotAt(path, None).forall(
            !_.renames.contains(column)),
          s"cannot partition on renamed column '$column' (column mapping)")
        layout :+ GraftCatalog.IdentityPart(column)
      } else {
        require(layout.exists(_.col == column),
          s"'$column' is not a partition field (layout: " +
            s"${layout.map(_.col).mkString(",")})")
        layout.filterNot(_.col == column)
      }
    if (next.nonEmpty)
      java.nio.file.Files.writeString(
        dir.resolve(GraftCatalog.PartsFile), GraftCatalog.encodeLayout(next))
    else
      java.nio.file.Files.deleteIfExists(dir.resolve(GraftCatalog.PartsFile))
    Seq(Row(column, GraftCatalog.encodeLayout(next)))
  }
}

/** `VACUUM <t> [RETAIN <n> VERSIONS|HOURS] [FORCE] [DRY RUN]` →
  * [[ManifestTable.expire]] / [[ManifestTable.expireOlderThan]]: drop
  * manifests beyond the retention horizon (count-based, or Delta's
  * time-based `RETAIN n HOURS` — the latest version always survives),
  * then sweep data files only the dropped versions referenced.
  * Without FORCE the sweep is age-gated (1 h minimum, the API default)
  * so files an in-flight reader may still hold survive — FORCE sweeps
  * immediately (tests, decommissioned tables). Default retention is
  * RETAIN 1 (current version only stays time-travelable). DRY RUN
  * (Delta's safety valve) reports what WOULD expire and sweep under the
  * same rules, touching nothing. */
/** `RUN MAINTENANCE <t> [TARGET <bytes>] [RETAIN <n> VERSIONS]` — the
  * [[graft.sources.ManifestTable.maintenancePlan]] advisor's execution
  * door: every recommended row runs (ledger fold → compaction → index
  * catch-up → retention), each through its own conflict-rebasing
  * machinery, and the report comes back as rows. */
case class GraftRunMaintenanceCommand(target: Either[String, Seq[String]],
    targetBytes: Option[Long], keepLast: Option[Int])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("action", StringType),
    GraftSqlParser.attr("metric", LongType),
    GraftSqlParser.attr("recommended", BooleanType),
    GraftSqlParser.attr("result", StringType))

  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    ManifestTable.runMaintenance(spark, path,
      targetBytes = targetBytes.getOrElse(128L * 1024 * 1024),
      keepLast = keepLast.getOrElse(1)).collect().toSeq
  }
}

case class GraftVacuumCommand(target: Either[String, Seq[String]],
    retain: Option[Int], hours: Boolean = false, force: Boolean = false,
    dryRun: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("expired_versions", LongType),
    GraftSqlParser.attr("deleted_files", LongType),
    GraftSqlParser.attr("retained", StringType),
    GraftSqlParser.attr("mode", StringType))

  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val age = if (force) 0L else 3600000L
    val (expired, deleted) =
      if (hours)
        ManifestTable.expireOlderThan(path,
          maxAgeMs = retain.getOrElse(0).toLong * 3600000L,
          vacuumMinAgeMs = age, dryRun = dryRun)
      else if (dryRun)
        ManifestTable.expireDryRun(path, retain.getOrElse(1), age)
      else
        ManifestTable.expire(path, retain.getOrElse(1), vacuumMinAgeMs = age)
    val retained = ManifestTable.versions(path)
      .filterNot(v => dryRun && expired.contains(v))
    Seq(Row(expired.size.toLong, deleted.size.toLong,
      retained.mkString(","), if (dryRun) "dry_run" else "vacuum"))
  }
}

/** `ALTER TABLE <t> CREATE TAG '<name>' [AS OF VERSION <n>]` /
  * `ALTER TABLE <t> DROP TAG '<name>'` — named version pins (Iceberg
  * tags): `VERSION AS OF '<name>'` resolves the pin, and retention
  * NEVER expires a tagged version (the reproducible-dataset contract:
  * a training run's exact snapshot stays readable however the table's
  * history horizon moves). Tag names are immutable; DROP releases. */
case class GraftTagCommand(target: Either[String, Seq[String]],
    create: Boolean, name: String, version: Option[Long])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("tag", StringType),
    GraftSqlParser.attr("action", StringType),
    GraftSqlParser.attr("version", LongType))

  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    if (create)
      Seq(Row(name, "created", ManifestTable.createTag(path, name, version)))
    else
      Seq(Row(name, "dropped", ManifestTable.dropTag(path, name)))
  }
}

/** `ALTER TABLE <t> PUBLISH WAP '<id>'` / `ALTER TABLE <t> ABORT WAP
  * '<id>'` — the SQL half of write-audit-publish: a session stages
  * batches with `spark.graft.wap.id` set (INSERT INTO stages instead of
  * committing), audits them, then resolves the id here. PUBLISH adopts
  * every staged batch of the id in ONE conflict-retried idempotent
  * commit; ABORT releases the staged files to the age-gated vacuum. */
case class GraftWapCommand(target: Either[String, Seq[String]],
    publish: Boolean, wapId: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("wap_id", StringType),
    GraftSqlParser.attr("action", StringType),
    GraftSqlParser.attr("result", LongType))

  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    if (publish)
      Seq(Row(wapId, "published", ManifestTable.publishWap(path, wapId)))
    else
      Seq(Row(wapId, "aborted",
        ManifestTable.abortWap(path, wapId).size.toLong))
  }
}

/** `ALTER TABLE <t> CREATE BRANCH '<name>' [AS OF VERSION <n>]` /
  * `DROP BRANCH` / `FAST FORWARD BRANCH` / `REBASE BRANCH` — the SQL
  * lifecycle of branch refs (Iceberg branches). Write-to-branch is the
  * session conf `spark.graft.branch` (INSERT INTO appends to the ref
  * instead of committing); reads resolve `VERSION AS OF '<name>'`;
  * FAST FORWARD publishes the whole chain in one atomic commit. */
case class GraftBranchCommand(target: Either[String, Seq[String]],
    action: String, name: String, version: Option[Long])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("branch", StringType),
    GraftSqlParser.attr("action", StringType),
    GraftSqlParser.attr("result", LongType))

  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    action match {
      case "CREATE" =>
        Seq(Row(name, "created",
          ManifestTable.createBranch(path, name, version)))
      case "DROP" =>
        Seq(Row(name, "dropped",
          ManifestTable.dropBranch(path, name).size.toLong))
      case "FAST FORWARD" =>
        Seq(Row(name, "fast_forwarded", ManifestTable.fastForward(path, name)))
      case "REBASE" =>
        Seq(Row(name, "rebased", ManifestTable.rebaseBranch(path, name)))
    }
  }
}

/** `ANALYZE TABLE <t> COMPUTE STATISTICS [FOR ALL COLUMNS | FOR COLUMNS
  * a, b]` → [[graft.sources.ColumnStats.analyze]]: ONE map-side-combined
  * aggregation pass (HLL++ NDV sketches, null counts, numeric min/max,
  * string lengths) persisted as advisory sidecar metadata the scan
  * reports through DSv2 `columnStats()`. With `spark.sql.cbo.enabled`
  * these drive filter-cardinality estimates and
  * `spark.sql.cbo.joinReorder.enabled` multi-way join re-ordering.
  * `cols` = None → row count only; Some(empty) → every analyzable
  * column; Some(list) → exactly those. */
case class GraftAnalyzeCommand(target: Either[String, Seq[String]],
    cols: Option[Seq[String]]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    GraftSqlParser.attr("version", LongType),
    GraftSqlParser.attr("row_count", LongType),
    GraftSqlParser.attr("columns_analyzed", LongType))

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.sources.ColumnStats
    val path = GraftSqlParser.resolvePath(spark, target)
    val names = cols match {
      case None      => Seq.empty[String]
      case Some(Nil) =>
        ColumnStats.analyzableColumns(ManifestTable.schemaAt(spark, path))
      case Some(cs)  => cs
    }
    val stats = ColumnStats.analyze(spark, path, names)
    Seq(Row(stats.version, stats.rows, stats.cols.size.toLong))
  }
}
