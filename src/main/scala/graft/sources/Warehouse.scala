package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Credential/endpoint spec for a warehouse, the data-lake analogue of the
  * reference's HTTP auth layer (reference: core/auth.py — ApiKeyAuth /
  * TokenAuth / BearerAuth build per-request headers). On Spark, auth
  * material becomes reader/writer OPTIONS (e.g. s3a access keys, JDBC
  * credentials) merged into every read/write of that warehouse. */
sealed trait Auth { def asOptions: Map[String, String] }
object Auth {
  case object None extends Auth { def asOptions: Map[String, String] = Map.empty }
  final case class ApiKey(optionName: String, key: String) extends Auth {
    def asOptions: Map[String, String] = Map(optionName -> key)
  }
  final case class Token(optionName: String, token: String, scheme: String = "Token") extends Auth {
    def asOptions: Map[String, String] = Map(optionName -> s"$scheme $token")
  }
  final case class Options(opts: Map[String, String]) extends Auth {
    def asOptions: Map[String, String] = opts
  }

  /** OAuth-style EXPIRING credentials (reference: core/auth.py:82-121 —
    * access token + expiry, refreshed when stale). `refresh` returns the
    * option map plus its expiry instant; `asOptions` serves the cached
    * material until `clock()` passes (expiry − `skewMs`), then refreshes
    * under a lock. The clock is injectable so specs can drive expiry
    * deterministically. */
  final class Expiring(
      refresh: () => (Map[String, String], Long),
      clock: () => Long = () => System.currentTimeMillis(),
      skewMs: Long = 30000) extends Auth {
    private var cached: Map[String, String] = Map.empty
    private var expiresAt: Long = Long.MinValue
    private val lock = new Object
    /** Number of refresh() calls so far (observability + specs). */
    @volatile var refreshCount: Int = 0
    def asOptions: Map[String, String] = lock.synchronized {
      // clock()+skew vs expiry (addition on the clock side: the initial
      // MinValue sentinel must not underflow)
      if (clock() + skewMs >= expiresAt) {
        val (opts, exp) = refresh()
        cached = opts
        expiresAt = exp
        refreshCount += 1
      }
      cached
    }
  }
}

/** A warehouse is a named collection of resources (tables) with a format
  * (reference: core/connector.py `BaseConnector` — but where the reference
  * reads paginated HTTP batches, a lake warehouse exposes each resource as
  * a DataFrame and lets Catalyst handle partitioning/pushdown). */
trait Warehouse {
  def name: String
  def auth: Auth
  def read(spark: SparkSession, resource: String): DataFrame
  def write(df: DataFrame, resource: String, mode: SaveMode = SaveMode.Overwrite): Unit
}

/** A warehouse that can serve a METADATA-PRUNED read for a condition
  * set: the pull pipeline hands its cursor window + WHERE conditions to
  * the source, which skips whole files/partitions before Spark plans a
  * scan (manifest min/max stats, partition directories, …). The result
  * must equal `read().where(conds)` — pruning cuts cost, never rows.
  * The lake-side analogue of the reference compiling its filter into
  * origin query params (core/utils.py:195-652): same logical filter,
  * pushed to whatever the origin can evaluate cheaply. */
trait PrunedReads { self: Warehouse =>
  def readWhere(spark: SparkSession, resource: String,
      conds: Seq[graft.conditions.Condition]): DataFrame
}

/** Directory-per-warehouse, file-per-resource layout. `ext` is the file
  * suffix of existing resources (the driver's testdata uses
  * `<resource>.parquet`); written resources become directories. */
abstract class FileWarehouse extends Warehouse {
  def baseDir: String
  def format: String
  def ext: String
  def readOptions: Map[String, String] = Map.empty
  def writeOptions: Map[String, String] = Map.empty

  protected def resourcePath(resource: String): String = {
    require(!resource.contains("/") && !resource.contains(".."),
      s"invalid resource name: $resource")
    s"$baseDir/$resource$ext"
  }

  override def read(spark: SparkSession, resource: String): DataFrame =
    spark.read.format(format)
      .options(readOptions ++ auth.asOptions)
      .load(resourcePath(resource))

  override def write(df: DataFrame, resource: String, mode: SaveMode): Unit =
    df.write.format(format)
      .options(writeOptions ++ auth.asOptions)
      .mode(mode)
      .save(resourcePath(resource))

  /** Hive-style partitioned write: readers filtering on `partitionCols`
    * prune directories at planning time (PartitionFilters in the scan) —
    * the physical layout half of incremental-pull efficiency at 100 TB. */
  def writePartitioned(df: DataFrame, resource: String,
      partitionCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format(format)
      .options(writeOptions ++ auth.asOptions)
      .partitionBy(partitionCols: _*)
      .mode(mode)
      .save(resourcePath(resource))
}

/** Idempotent per-partition overwrite (dynamic partition overwrite
  * mode): rewriting the same partition value replaces ONLY that
  * partition's files — the exactly-once building block for streaming
  * foreachBatch sinks (a replayed micro-batch rewrites its own partition
  * instead of duplicating or clobbering the table). */
trait PartitionedWrites { self: FileWarehouse =>
  def overwritePartitions(df: DataFrame, resource: String,
      partitionCols: Seq[String]): Unit =
    df.write.format(format)
      .options(writeOptions ++ auth.asOptions)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
      .save(resourcePath(resource))
}

/** Catalog-backed bucketed tables: two tables bucketed by the same key
  * into the same bucket count join WITHOUT a shuffle (no Exchange in the
  * plan) — the standard co-location strategy for repeated big joins. */
object BucketedTables {
  def write(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }
}

final case class ParquetWarehouse(
    name: String, baseDir: String, ext: String = ".parquet",
    auth: Auth = Auth.None) extends FileWarehouse with PartitionedWrites {
  val format = "parquet"
}

final case class CsvWarehouse(
    name: String, baseDir: String, ext: String = ".csv",
    auth: Auth = Auth.None,
    override val readOptions: Map[String, String] =
      Map("header" -> "true", "inferSchema" -> "true"),
    override val writeOptions: Map[String, String] = Map("header" -> "true"))
  extends FileWarehouse {
  val format = "csv"
}

final case class JsonWarehouse(
    name: String, baseDir: String, ext: String = ".json",
    auth: Auth = Auth.None) extends FileWarehouse {
  val format = "json"
}

/** ORC — the other columnar lake format Spark ships natively; same
  * pushdown/pruning story as parquet (PushedFilters + ReadSchema reach
  * the scan), so warehouses can mix formats per resource family. */
final case class OrcWarehouse(
    name: String, baseDir: String, ext: String = ".orc",
    auth: Auth = Auth.None) extends FileWarehouse with PartitionedWrites {
  val format = "orc"
}

/** Warehouse metadata + factory registry (reference: core/registry.py
  * `ConnectorMeta` / `register_connector` / `get_connector_instance`). */
final case class WarehouseMeta(
    name: String,
    label: String,
    warehouseType: String, // ats | crm | jobboard | hcm | customers | lake
    format: String)

object WarehouseRegistry {
  private val metas = scala.collection.concurrent.TrieMap.empty[String, WarehouseMeta]
  private val factories = scala.collection.concurrent.TrieMap.empty[String, () => Warehouse]
  // ONE instance per name: run reports read request/retry accumulators
  // off the instance the pipeline used — a per-call factory would hand
  // the report a throwaway twin whose counters are forever zero. Auth
  // state (refresh-on-expiry tokens) also belongs to one shared instance.
  private val instances = scala.collection.concurrent.TrieMap.empty[String, Warehouse]

  def register(meta: WarehouseMeta, factory: () => Warehouse): Unit = {
    if (metas.putIfAbsent(meta.name, meta).isDefined)
      throw new IllegalArgumentException(
        s"Warehouse with name '${meta.name}' is already registered.")
    factories.put(meta.name, factory)
    instances.remove(meta.name)
  }

  def list(): Map[String, WarehouseMeta] = metas.toMap

  def instance(name: String): Warehouse =
    instances.getOrElseUpdate(name,
      factories.getOrElse(name,
        throw new NoSuchElementException(
          s"No factory registered for warehouse '$name'"))())

  def clear(): Unit = { metas.clear(); factories.clear(); instances.clear() }
}
