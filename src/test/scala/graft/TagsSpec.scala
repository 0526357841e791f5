package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** VERSION TAGS: named immutable snapshot pins. Reads resolve names,
  * retention never expires a tagged version, drops release it. */
class TagsSpec extends SparkSpecBase {

  test("tag lifecycle: create, resolve, immutability, drop, refusals") {
    val path = Files.createTempDirectory("graft-tags-").toString + "/t"
    ManifestTable.overwrite(spark.range(0, 10).toDF("k"), path) // v1
    ManifestTable.append(spark.range(10, 20).toDF("k"), path) // v2
    assert(ManifestTable.createTag(path, "ds-v1", Some(1L)) == 1L)
    assert(ManifestTable.createTag(path, "latest-release") == 2L) // head
    assert(ManifestTable.resolveTag(path, "ds-v1").contains(1L))
    assert(ManifestTable.tags(path) ==
      Map("ds-v1" -> 1L, "latest-release" -> 2L))
    // immutability: re-pointing a released name refuses
    assert(scala.util.Try(
      ManifestTable.createTag(path, "ds-v1", Some(2L))).isFailure)
    // numeric names collide with literal versions; absent versions refuse
    assert(scala.util.Try(ManifestTable.createTag(path, "7")).isFailure)
    assert(scala.util.Try(
      ManifestTable.createTag(path, "nope", Some(99L))).isFailure)
    assert(ManifestTable.dropTag(path, "ds-v1") == 1L)
    assert(scala.util.Try(ManifestTable.dropTag(path, "ds-v1")).isFailure)
    assert(ManifestTable.tags(path) == Map("latest-release" -> 2L))
  }

  test("retention never expires a tagged version; DROP TAG releases it") {
    val path = Files.createTempDirectory("graft-tagexp-").toString + "/t"
    (1 to 4).foreach(i => ManifestTable.append(
      spark.range(i * 10, i * 10 + 10).toDF("k"), path)) // v1..v4
    ManifestTable.createTag(path, "pin", Some(2L))
    val (dropped, _) = ManifestTable.expire(path, keepLast = 1,
      vacuumMinAgeMs = 0L)
    assert(dropped == Seq(1L, 3L), s"tagged v2 must survive: $dropped")
    assert(ManifestTable.versions(path) == Seq(2L, 4L))
    // the pinned snapshot still reads EXACTLY (its files survived the sweep)
    assert(ManifestTable.read(spark, path, Some(2L)).count() == 20)
    // dry runs agree with the real expire
    ManifestTable.append(spark.range(0, 5).toDF("k"), path) // v5
    val (wouldDrop, _) = ManifestTable.expireDryRun(path, keepLast = 1)
    assert(wouldDrop == Seq(4L), s"dry run must also pin tags: $wouldDrop")
    // DROP releases: the version expires on the next pass
    ManifestTable.dropTag(path, "pin")
    val (dropped2, _) = ManifestTable.expire(path, keepLast = 1,
      vacuumMinAgeMs = 0L)
    assert(dropped2 == Seq(2L, 4L))
    assert(ManifestTable.versions(path) == Seq(5L))
  }

  test("SQL: CREATE/DROP TAG and VERSION AS OF 'tag'") {
    val wh = Files.createTempDirectory("graft-tagsql-").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s2.sql("CREATE TABLE graft.t (k BIGINT)")
    s2.sql("INSERT INTO graft.t SELECT id FROM range(0, 100)")
    val r = s2.sql("ALTER TABLE graft.t CREATE TAG 'train-v1'").collect().head
    assert(r.getString(1) == "created" && r.getLong(2) == 1L)
    s2.sql("INSERT INTO graft.t SELECT id FROM range(100, 150)")
    // the tag reads the pinned snapshot; the literal version agrees
    assert(s2.sql("SELECT count(*) FROM graft.t VERSION AS OF 'train-v1'")
      .collect().head.getLong(0) == 100)
    assert(s2.sql("SELECT count(*) FROM graft.t VERSION AS OF 1")
      .collect().head.getLong(0) == 100)
    assert(s2.sql("SELECT count(*) FROM graft.t")
      .collect().head.getLong(0) == 150)
    // unknown tags refuse with the available names
    val e = scala.util.Try(
      s2.sql("SELECT * FROM graft.t VERSION AS OF 'nope'").collect())
    assert(e.isFailure && e.failed.get.getMessage.contains("train-v1"))
    // VACUUM through SQL pins the tag too
    s2.sql("VACUUM graft.t RETAIN 1 VERSIONS FORCE")
    assert(s2.sql("SELECT count(*) FROM graft.t VERSION AS OF 'train-v1'")
      .collect().head.getLong(0) == 100)
    s2.sql("ALTER TABLE graft.t DROP TAG 'train-v1'")
    assert(ManifestTable.tags(s"$wh/t").isEmpty)
  }
}
