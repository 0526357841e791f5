package graft

import org.apache.spark.sql.functions._

import graft.operators.LoopScale

/** Round-20 BSP partition-derivation contract ([[graft.operators
  * .LoopScale]]): loop operators size their round shuffles from their
  * OWN data, clamped to the session default — never above it (a stream
  * gate at 4 partitions stays at 4), never below 1, and big inputs keep
  * full parallelism. Rebinding moves a frame between sessions without
  * changing its rows. */
class LoopScaleSpec extends SparkSpecBase {

  test("partitionsFor derives from rows and clamps to the session default") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    s.conf.set("spark.graft.loop.rowsPerPartition", "1000")
    assert(LoopScale.partitionsFor(s, 0L) === 1)
    assert(LoopScale.partitionsFor(s, 999L) === 1)
    assert(LoopScale.partitionsFor(s, 1001L) === 2)
    assert(LoopScale.partitionsFor(s, 1000000L) === 32) // clamped at default
    s.conf.set("spark.sql.shuffle.partitions", "4")
    assert(LoopScale.partitionsFor(s, 1000000L) === 4) // smaller session wins
  }

  test("sessionFor leaves the parent session alone and sizes only the clone") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "32")
    val sized = LoopScale.sessionFor(s, 10L)
    assert(sized ne s)
    assert(sized.conf.get("spark.sql.shuffle.partitions") === "1")
    assert(s.conf.get("spark.sql.shuffle.partitions") === "32")
    // data already bigger than the default: the parent itself comes back
    assert(LoopScale.sessionFor(s, Long.MaxValue / 2) eq s)
  }

  test("rebind preserves rows and drives shuffle partitioning") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._
    val df = (0 until 100).map(i => (i.toLong, i % 5)).toDF("id", "g")
    val sized = LoopScale.sessionFor(s, 100L)
    val re = LoopScale.rebind(df, sized)
    val agg = re.groupBy("g").agg(count(lit(1)).as("n"))
    assert(agg.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      (0 until 5).map(_ -> 20L).toMap)
    // the aggregation executed at the DERIVED partitioning (1), not 4
    assert(agg.rdd.getNumPartitions === 1)
  }
}
