package graft

import graft.cursor.{Cursor, CursorMode, CursorStore}
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CursorStoreSpec extends SparkSpecBase {

  test("incremental pulls resume from the persisted cursor") {
    val store = new CursorStore(spark, Files.createTempDirectory("graft-cur-").toString + "/cursors")
    val srcDir = Files.createTempDirectory("graft-incr-").toString
    val orders = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("string").as("created"))

    // day 1: only history before 1998 has landed
    orders.where(col("created") < "1998-01-01").write.parquet(s"$srcDir/orders")
    val initial = Cursor(CursorMode.CreatedAt)
    val cur1 = store.nextCursor("sync1", "orders", initial)
    val (out1, adv1) = Pipeline.pullWithCursor(
      spark.read.parquet(s"$srcDir/orders"), "created", cur1)
    store.save("sync1", "orders", adv1)
    val n1 = out1.count() // materialize before the source dir is overwritten
    assert(n1 > 0 && adv1.end.isDefined)
    assert(adv1.end.get < "1998-01-01")

    // day 2: the full table has landed; resume from the stored end
    orders.write.mode("overwrite").parquet(s"$srcDir/orders")
    val cur2 = store.nextCursor("sync1", "orders", initial)
    assert(cur2.start == adv1.end && cur2.end.isEmpty)
    val (out2, adv2) = Pipeline.pullWithCursor(
      spark.read.parquet(s"$srcDir/orders"), "created", cur2)
    store.save("sync1", "orders", adv2)

    // second slice starts at the boundary (at-least-once) and the two
    // slices together cover the full table
    assert(out2.agg(min(col("created"))).head().getString(0) >= adv1.end.get)
    val total = orders.count()
    val boundaryRows = orders.where(col("created") === adv1.end.get).count()
    assert(n1 + out2.count() == total + boundaryRows)
    // store survives: an unrelated pipeline is isolated
    assert(store.load("other", "orders").isEmpty)
    assert(store.load("sync1", "orders").get.end == adv2.end)
  }

  test("corrupt store file raises instead of silently wiping the table") {
    val dir = Files.createTempDirectory("graft-cur-corrupt-").toString + "/cursors"
    val store = new CursorStore(spark, dir)
    store.save("p1", "orders", Cursor(CursorMode.CreatedAt, end = Some("1997-01-01")))
    store.save("p2", "orders", Cursor(CursorMode.Uid, end = Some("42")))
    assert(store.load("p1", "orders").isDefined && store.load("p2", "orders").isDefined)

    // corrupt the table: replace its parquet files with garbage bytes
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      Files.write(f.toPath, "not a parquet file".getBytes)
    }
    intercept[Exception](store.load("p1", "orders"))
    // save() must refuse to rewrite the table it could not read...
    intercept[Exception](store.save("p3", "orders", Cursor(CursorMode.Uid)))
    // ...so the on-disk bytes (operator-recoverable) are untouched
    assert(d.listFiles().exists(f =>
      f.getName.endsWith(".parquet") &&
        new String(Files.readAllBytes(f.toPath)) == "not a parquet file"))
  }

  test("crash between backup and swap recovers from the .__old backup") {
    val dir = Files.createTempDirectory("graft-cur-crash-").toString + "/cursors"
    val store = new CursorStore(spark, dir)
    store.save("p1", "orders", Cursor(CursorMode.CreatedAt, end = Some("1997-01-01")))
    store.save("p2", "orders", Cursor(CursorMode.Uid, end = Some("42")))
    // simulate a crash between rename(dst -> old) and rename(tmp -> dst):
    // the main table is gone, only the backup remains
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".__old")))
    // reads recover the complete pre-crash state
    assert(store.load("p1", "orders").get.end.contains("1997-01-01"))
    assert(store.load("p2", "orders").get.end.contains("42"))
    // the next save preserves BOTH rows and heals the layout
    store.save("p3", "orders", Cursor(CursorMode.Uid, end = Some("7")))
    assert(store.load("p1", "orders").isDefined && store.load("p2", "orders").isDefined
      && store.load("p3", "orders").isDefined)
  }

  test("missing store still reads as empty (first run)") {
    val store = new CursorStore(spark,
      Files.createTempDirectory("graft-cur-missing-").toString + "/never-written")
    assert(store.load("p", "r").isEmpty)
    val init = Cursor(CursorMode.CreatedAt)
    assert(store.nextCursor("p", "r", init) == init)
  }
}
