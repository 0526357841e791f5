package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the validation pass a sync pipeline runs on
  * every pulled batch before trusting it (the reference validates per
  * record through Pydantic models; column profiles are the distributed
  * analogue): per-column null counts, exact distinct counts, and min/max,
  * in ONE scan of the data.
  *
  * All per-column aggregates ride a single agg (the multi-countDistinct
  * Expand is the standard profiling plan: one pass over the data,
  * spec-width × rows intermediate, map-side partials throughout), then the
  * 1-row wide result is unpivoted to long form with `stack` — codegen'd,
  * no second pass, no driver loop. min/max are rendered to strings by a
  * per-column render (decimal cast for doubles, date cast for timestamps)
  * so the output is engine-portable. */
object Profile {

  /** @param render min/max → output string (engine-portable formatting) */
  final case class ColSpec(name: String,
      render: Column => Column = _.cast("string"))

  object ColSpec {
    /** double columns: exact-decimal render (plain double→string
      * formatting diverges across engines). */
    def decimal(name: String, scale: Int = 4): ColSpec =
      ColSpec(name, _.cast(org.apache.spark.sql.types.DecimalType(18, scale))
        .cast("string"))
    /** timestamp columns rendered as dates. */
    def date(name: String): ColSpec =
      ColSpec(name, _.cast("date").cast("string"))
  }

  /** Long-form profile: (col_name, n_rows, n_null, n_distinct, min_val,
    * max_val), one row per spec. */
  def profile(df: DataFrame, specs: Seq[ColSpec]): DataFrame = {
    require(specs.nonEmpty)
    val aggs = count(lit(1)).as("n_rows") +: specs.flatMap { pc =>
      Seq(
        sum(when(col(pc.name).isNull, 1L).otherwise(0L)).as(s"__${pc.name}_nn"),
        countDistinct(col(pc.name)).as(s"__${pc.name}_nd"),
        pc.render(min(col(pc.name))).as(s"__${pc.name}_min"),
        pc.render(max(col(pc.name))).as(s"__${pc.name}_max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = specs.map { pc =>
      s"'${pc.name}', `__${pc.name}_nn`, `__${pc.name}_nd`, " +
        s"`__${pc.name}_min`, `__${pc.name}_max`"
    }.mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${specs.length}, $stackArgs) AS (col_name, n_null, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
