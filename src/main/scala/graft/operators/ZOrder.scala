package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER layout — multi-dimensional clustering for data skipping
  * (Delta's OPTIMIZE ZORDER BY / the Morton-curve file layout): rows are
  * sorted along an interleaved-bit space-filling curve over several
  * columns, so every data file covers a small HYPER-RECTANGLE of the key
  * space and per-file min/max stats become selective on EVERY z-ordered
  * column at once. A single-column range layout prunes scans on that
  * column only; a z-order layout lets the same stats-pruned read
  * ([[graft.sources.ManifestTable.readWhere]]) skip files for predicates
  * on any of the dimensions — the layout decision that makes a 100 TB
  * table scannable by more than one access path.
  *
  * Mechanics (the distributed-safe shape Delta uses):
  *  1. each column maps to a `2^bits`-bucket RANK via approximate
  *     quantile boundaries — one mergeable-sketch pass per layout run,
  *     boundaries broadcast as literals (robust to skew, unlike min/max
  *     linear scaling);
  *  2. bucket ids interleave bitwise into the z-value (all plain
  *     shift/and/or column ops — whole-stage codegen);
  *  3. `repartitionByRange` + in-partition sort on the z-value clusters
  *     the curve into files; the helper column is dropped before write.
  */
object ZOrder {

  /** Bucket id (0 .. 2^bits-1) for a numeric column via quantile
    * boundaries: a chain of `when` comparisons against 2^bits-1 literal
    * boundaries — branchy but codegen'd, and evaluated once per row per
    * layout run. */
  private def bucket(c: Column, boundaries: Seq[Double]): Column =
    boundaries.zipWithIndex.foldRight(lit(boundaries.size): Column) {
      case ((b, i), rest) => when(c <= b, lit(i)).otherwise(rest)
    }

  /** The interleaved z-value of pre-computed bucket columns. */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val terms = for {
      bit <- 0 until bits
      (b, dim) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftright(b, bit).bitwiseAND(lit(1)),
      bit * buckets.size + dim)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Return `df` re-laid-out along the z-curve of `cols` (numeric
    * columns), targeting `nFiles` output files. The result is what you
    * hand to a table commit/overwrite; schema is unchanged. */
  def layout(df: DataFrame, cols: Seq[String], nFiles: Int,
      bitsPerDim: Int = 4): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one dimension")
    // one dimension degenerates to a plain range-cluster sort — valid,
    // it is what OPTIMIZE ZORDER BY (single col) means
    require(bitsPerDim >= 1 && bitsPerDim * cols.size <= 30,
      s"bit budget out of range: $bitsPerDim × ${cols.size} dims")
    val nBuckets = 1 << bitsPerDim
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    // one pass, mergeable sketches; boundaries are O(dims·buckets) doubles
    val bounds: Map[String, Seq[Double]] = {
      val row = df.select(cols.map(c => expr(
        s"approx_percentile(CAST($c AS DOUBLE), array(${probs.mkString(",")}), 10000)")
        .as(c)): _*).head()
      cols.zipWithIndex.map { case (c, i) =>
        c -> Option(row.getSeq[Double](i)).getOrElse(Seq.empty)
      }.toMap
    }
    val z = interleave(cols.map(c =>
      bucket(col(c).cast("double"), bounds(c))), bitsPerDim)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
