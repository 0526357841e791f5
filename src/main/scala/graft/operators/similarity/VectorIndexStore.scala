package graft.operators.similarity

import graft.sources.ManifestTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for vector-index artifacts — build once, query from any
  * later job. The expensive half of every ANN ladder rung is the BUILD
  * (quantizer training, corpus encoding, NN-Descent rounds); without
  * persistence that cost recurs per session. Every artifact serializes
  * through [[ManifestTable]], so index state gets the same versioned
  * atomic commits, time travel, and vacuum as data tables — an index is
  * just more tables:
  *
  *  - PQ:      `centers` (subspace, code, center), `encoded`, `unit`
  *  - IVF-PQ:  those plus `coarse` (list, cvec)
  *  - SQ8:     `calib` (pos, lo, w), `codes`, `unit`
  *  - NND graph: the (src, dst, sim, rank) edge table, verbatim
  *
  * Quantizer metadata (k-means centers, calibration arrays) is KB-scale
  * and round-trips exactly: doubles persist through parquet bit-for-bit,
  * so a loaded index's search is byte-identical to the builder's — the
  * load-equals-build determinism the spec pins. Loaded tables are pinned
  * with localCheckpoint (same lifecycle as built ones; `close()`
  * releases). At 100 TB the encoded/unit tables are corpus-sized — the
  * manifest commit is a rename, and readers scan the same parquet the
  * build wrote, no re-encode. */
object VectorIndexStore {

  // ---------------------------------------------------------------- graph

  /** NN-Descent / GraphSearch edge tables are plain DataFrames — persist
    * as a table commit. */
  def saveGraph(graph: DataFrame, path: String): Unit = {
    ManifestTable.overwrite(graph, path)
    ()
  }

  def loadGraph(spark: SparkSession, path: String): DataFrame =
    ManifestTable.read(spark, path)

  // ------------------------------------------------------------------ PQ

  def savePq(index: PqIndex, path: String): Unit = {
    ManifestTable.overwrite(centersDf(index.encoded.sparkSession, index.sq),
      s"$path/centers")
    ManifestTable.overwrite(index.encoded, s"$path/encoded")
    ManifestTable.overwrite(index.unit, s"$path/unit")
  }

  def loadPq(spark: SparkSession, path: String): PqIndex =
    new PqIndex(loadSq(spark, s"$path/centers"),
      ManifestTable.read(spark, s"$path/encoded").localCheckpoint(),
      ManifestTable.read(spark, s"$path/unit").localCheckpoint())

  // -------------------------------------------------------------- IVF-PQ

  def saveIvfPq(index: IvfPq.Index, path: String): Unit = {
    val spark = index.encoded.sparkSession
    import spark.implicits._
    ManifestTable.overwrite(
      index.coarse.zipWithIndex
        .map { case (c, l) => (l, c.toSeq) }.toSeq.toDF("list", "cvec"),
      s"$path/coarse")
    ManifestTable.overwrite(centersDf(spark, index.sq), s"$path/centers")
    ManifestTable.overwrite(index.encoded, s"$path/encoded")
    ManifestTable.overwrite(index.unit, s"$path/unit")
  }

  def loadIvfPq(spark: SparkSession, path: String): IvfPq.Index = {
    val coarseRows = ManifestTable.read(spark, s"$path/coarse")
      .orderBy("list").collect()
    val coarse = coarseRows.map(_.getSeq[Double](1).toArray)
    require(coarseRows.map(_.getInt(0)).toSeq == coarse.indices,
      "coarse centroid list ids must be dense 0..n-1")
    IvfPq.Index(coarse, loadSq(spark, s"$path/centers"),
      ManifestTable.read(spark, s"$path/encoded").localCheckpoint(),
      ManifestTable.read(spark, s"$path/unit").localCheckpoint(),
      coarse.length)
  }

  // ----------------------------------------------------------------- SQ8

  def saveSq8(index: Sq8Index, path: String): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    ManifestTable.overwrite(
      index.lo.indices.map(i => (i, index.lo(i), index.w(i)))
        .toDF("pos", "lo", "w"),
      s"$path/calib")
    ManifestTable.overwrite(index.codes, s"$path/codes")
    ManifestTable.overwrite(index.unitTab, s"$path/unit")
  }

  def loadSq8(spark: SparkSession, path: String): Sq8Index = {
    val calib = ManifestTable.read(spark, s"$path/calib")
      .orderBy("pos").collect()
    new Sq8Index(calib.map(_.getDouble(1)), calib.map(_.getDouble(2)),
      ManifestTable.read(spark, s"$path/codes").localCheckpoint(),
      ManifestTable.read(spark, s"$path/unit").localCheckpoint())
  }

  // ------------------------------------------------------------- helpers

  private def centersDf(spark: SparkSession, sq: SubQuantizer): DataFrame = {
    import spark.implicits._
    (for {
      i <- sq.centers.indices
      j <- sq.centers(i).indices
    } yield (i, j, sq.centers(i)(j).toSeq)).toDF("subspace", "code", "center")
  }

  private def loadSq(spark: SparkSession, path: String): SubQuantizer = {
    val rows = ManifestTable.read(spark, path)
      .orderBy("subspace", "code").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val nCodes = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * nCodes, "sparse center table")
    val centers = Array.ofDim[Array[Double]](m, nCodes)
    rows.foreach(r => centers(r.getInt(0))(r.getInt(1)) =
      r.getSeq[Double](2).toArray)
    SubQuantizer(centers, centers(0)(0).length)
  }
}
