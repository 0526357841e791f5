package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.ResolvedTable
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ShowCreateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.types.StructField
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{GraftCatalog, GraftKeyedSqlTable, GraftSqlTable, ManifestTable}

/** Faithful `SHOW CREATE TABLE` for graft catalog tables.
  *
  * Spark's built-in V2 renderer loses `GENERATED ALWAYS AS` (StructField
  * .toDDL carries name/type/nullability/DEFAULT/COMMENT only) and
  * re-renders declared constraints alongside the `check.*` / `merge.keys`
  * TBLPROPERTIES — so feeding its output back into CREATE would duplicate
  * every constraint. This strategy replaces the exec for graft tables
  * with DDL that ROUND-TRIPS: running the emitted statement against an
  * empty catalog recreates the same contract (generated columns, CHECK
  * constraints, PRIMARY KEY, PARTITIONED BY layout, zorder.cols) —
  * nothing doubled, nothing dropped. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`, which runs before the
  * built-in strategies; non-graft tables fall through untouched.
  */
class GraftShowCreateStrategy
  extends org.apache.spark.sql.execution.SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // AS SERDE (asSerde = true) falls through to Spark's own refusal —
    // a v2 table has no Hive serde rendering
    case ShowCreateTable(r: ResolvedTable, false, output)
        if r.table.isInstanceOf[GraftSqlTable] =>
      GraftShowCreateExec(output, r.name,
        r.table.asInstanceOf[GraftSqlTable]) :: Nil
    case _ => Nil
  }
}

case class GraftShowCreateExec(output: Seq[Attribute], tableName: String,
    table: GraftSqlTable) extends LeafExecNode {

  private def quoted(name: String): String =
    if (name.matches("[a-zA-Z_][a-zA-Z0-9_]*")) name
    else "`" + name.replace("`", "``") + "`"

  private def columnDdl(f: StructField, gens: Map[String, String]): String = {
    val base = s"  ${quoted(f.name)} " +
      f.dataType.sql + (if (f.nullable) "" else " NOT NULL")
    gens.get(f.name).map(e => s"$base GENERATED ALWAYS AS ($e)").getOrElse(base)
  }

  private[graft] def ddl: String = {
    val dir = java.nio.file.Paths.get(table.path)
    val gens = ManifestTable.generatedColumns(table.path).toMap
    val cols = table.schema().fields.map(columnDdl(_, gens))
    val checks = ManifestTable.constraints(table.path).zipWithIndex.map {
      case (c, i) => s"  CONSTRAINT check_$i CHECK ($c)" }
    val pk = table match {
      case k: GraftKeyedSqlTable =>
        Seq(s"  CONSTRAINT pk PRIMARY KEY (${k.keyCols.mkString(", ")})")
      case _ => Seq.empty
    }
    val layout = GraftCatalog.readDeclaredLayout(dir).map {
      case GraftCatalog.IdentityPart(c)  => c
      case GraftCatalog.BucketPart(n, c) => s"bucket($n, $c)"
    }
    val zorder = GraftCatalog.readDeclaredZOrder(dir)
    val props =
      zorder.headOption.map(_ => "'zorder.cols' = '" + zorder.mkString(",") + "'").toSeq ++
        GraftCatalog.readDeclaredCompression(dir)
          .map(c => s"'write.compression' = '$c'").toSeq
    val sb = new StringBuilder
    sb ++= s"CREATE TABLE $tableName (\n"
    sb ++= (cols ++ checks ++ pk).mkString(",\n")
    sb ++= ")\n"
    if (layout.nonEmpty)
      sb ++= s"PARTITIONED BY (${layout.mkString(", ")})\n"
    if (props.nonEmpty)
      sb ++= s"TBLPROPERTIES (${props.mkString(", ")})\n"
    sb.result()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(output.map(_.dataType).toArray)
    val row: InternalRow =
      proj(InternalRow(UTF8String.fromString(ddl))).copy()
    sparkContext.parallelize(Seq(row), 1)
  }
}
