package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Logical commit-conflict rules: a file-level rewrite that loses the
  * optimistic version claim to a DISJOINT commit rebases metadata-only —
  * its already-staged files are adopted onto the new head, zero bytes
  * re-staged — while an OVERLAPPING winner still forces the attempt to
  * re-run (the old, always-safe behavior). Disjointness is proven, not
  * assumed: input files still live, delete ledger untouched, table
  * metadata untouched, and (for predicate scopes) no winner-added file
  * holds an in-scope row. */
class ConflictRebaseSpec extends SparkSpecBase {

  private def mk(): String = {
    val path = Files.createTempDirectory("graft-cr-").toString + "/t"
    val df = spark.range(0, 800).select(
      col("id").as("k"), (col("id") % 8).as("g"),
      (col("id") * 1.5).as("v"))
    ManifestTable.append(df.repartitionByRange(8, col("g")), path)
    path
  }

  /** Every file currently in the table's data directory (staged files
    * included — that is the point: files staged BEFORE the winner's
    * commit must be the ones the final manifest adopts). */
  private def dataDirListing(path: String): Set[String] =
    scala.util.Using.resource(Files.list(Paths.get(path, "data"))) { st =>
      st.iterator().asScala.map(_.getFileName.toString).toSet
    }

  /** Arm the one-shot race: `winner` runs at the exact point where the
    * loser has STAGED its rewrite but not yet published. Returns the
    * data-dir listing captured at that point (base + loser's staged). */
  private def armRace(path: String)(winner: => Unit): () => Set[String] = {
    var captured = Set.empty[String]
    ManifestTable.beforePublishHook = () => {
      ManifestTable.beforePublishHook = () => () // one-shot: the winner
      captured = dataDirListing(path)            // commits through here too
      winner
    }
    () => captured
  }

  override def afterAll(): Unit = {
    ManifestTable.beforePublishHook = () => ()
    super.afterAll()
  }

  test("disjoint replaceWhere backfills: the loser rebases metadata-only, " +
      "its staged files are reused, both commits land") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val dataA = spark.range(0, 40).select(
      col("id").as("k"), lit(2L).as("g"), lit(-2.0).as("v"))
    val dataB = spark.range(0, 30).select(
      col("id").as("k"), lit(5L).as("g"), lit(-5.0).as("v"))
    val staged = armRace(path) {
      ManifestTable.replaceWhere(spark, path, col("g") === 5, dataB)
    }
    ManifestTable.replaceWhere(spark, path, col("g") === 2, dataA)
    assert(ManifestTable.latestVersion(path) == v0 + 2,
      "both backfills must land as their own versions")
    // the loser's files in the final manifest are EXACTLY the ones it
    // staged before the winner committed — a re-run would have staged
    // fresh names, absent from the captured listing
    val winnerM = ManifestTable.snapshotAt(path, Some(v0 + 1)).get
    val finalM = ManifestTable.snapshotAt(path, None).get
    val loserAdded = finalM.files.toSet -- winnerM.files.toSet
    assert(loserAdded.nonEmpty)
    assert(loserAdded.forall(staged().contains),
      s"rebase must reuse the loser's staged files, not re-stage: " +
        s"${loserAdded -- staged()} were staged after the winner's commit")
    val t = ManifestTable.read(spark, path)
    assert(t.where(col("g") === 2).count() == 40)
    assert(t.where(col("g") === 2 && col("v") =!= -2.0).count() == 0)
    assert(t.where(col("g") === 5).count() == 30)
    assert(t.where(col("g") === 5 && col("v") =!= -5.0).count() == 0)
    assert(t.where(col("g") =!= 2 && col("g") =!= 5).count() == 600,
      "out-of-scope groups must be untouched by either backfill")
  }

  test("overlapping replaceWhere: the loser re-runs against the new head " +
      "and its replace wins the shared scope") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val dataA = spark.range(0, 40).select(
      col("id").as("k"), lit(3L).as("g"), lit(-2.0).as("v"))
    val dataB = spark.range(0, 30).select(
      col("id").as("k"), lit(3L).as("g"), lit(-5.0).as("v"))
    val staged = armRace(path) {
      ManifestTable.replaceWhere(spark, path, col("g") === 3, dataB)
    }
    ManifestTable.replaceWhere(spark, path, col("g") === 3, dataA)
    assert(ManifestTable.latestVersion(path) == v0 + 2)
    // the loser re-ran: its adopted files were staged AFTER the capture
    val winnerM = ManifestTable.snapshotAt(path, Some(v0 + 1)).get
    val finalM = ManifestTable.snapshotAt(path, None).get
    val loserAdded = finalM.files.toSet -- winnerM.files.toSet
    assert(loserAdded.nonEmpty && loserAdded.forall(f => !staged()(f)),
      "an overlapping winner must force a fresh rewrite, not a rebase")
    val t = ManifestTable.read(spark, path)
    assert(t.where(col("g") === 3).count() == 40, "last writer wins the scope")
    assert(t.where(col("g") === 3 && col("v") =!= -2.0).count() == 0)
  }

  test("replaceWhere rebase refused when the winner ADDED in-scope rows: " +
      "the re-run replaces them too") {
    val path = mk()
    val inScope = spark.range(9000, 9010).select(
      col("id").as("k"), lit(2L).as("g"), lit(0.0).as("v"))
    val dataA = spark.range(0, 40).select(
      col("id").as("k"), lit(2L).as("g"), lit(-2.0).as("v"))
    val staged = armRace(path) { ManifestTable.append(inScope, path) }
    ManifestTable.replaceWhere(spark, path, col("g") === 2, dataA)
    assert(staged().nonEmpty, "the race must have fired")
    val t = ManifestTable.read(spark, path)
    assert(t.where(col("g") === 2).count() == 40,
      "the winner's in-scope appends must be replaced by the re-run")
    assert(t.where(col("k") >= 9000).count() == 0)
  }

  test("OPTIMIZE racing a disjoint append: the compaction rebases with " +
      "zero re-staged bytes and the append's file carries") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val extra = spark.range(9000, 9100).select(
      col("id").as("k"), lit(99L).as("g"), lit(9.0).as("v")).coalesce(1)
    val staged = armRace(path) { ManifestTable.append(extra, path) }
    ManifestTable.compactCommit(spark, path)
    assert(ManifestTable.latestVersion(path) == v0 + 2)
    val appendM = ManifestTable.snapshotAt(path, Some(v0 + 1)).get
    val baseM = ManifestTable.snapshotAt(path, Some(v0)).get
    val appended = appendM.files.toSet -- baseM.files.toSet
    val finalM = ManifestTable.snapshotAt(path, None).get
    assert(appended.subsetOf(finalM.files.toSet),
      "the winner's appended files must carry through the rebased compaction")
    val compacted = finalM.files.toSet -- appended
    assert(compacted.nonEmpty && compacted.forall(staged().contains),
      "the compaction's output must be the files staged BEFORE the race")
    val t = ManifestTable.read(spark, path)
    assert(t.count() == 900)
    assert(t.where(col("g") === 99).count() == 100)
  }

  test("OPTIMIZE WHERE racing a disjoint append rebases; racing an " +
      "overlapping rewrite re-plans") {
    import graft.conditions.{Condition, Op}
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    // disjoint: append g=99 while compacting g<=3's files
    val extra = spark.range(9000, 9050).select(
      col("id").as("k"), lit(99L).as("g"), lit(9.0).as("v")).coalesce(1)
    val staged = armRace(path) { ManifestTable.append(extra, path) }
    ManifestTable.compactWhere(spark, path,
      Seq(Condition("g", Op.Lte, 3L)), targetBytes = 1L << 20)
    assert(ManifestTable.latestVersion(path) == v0 + 2)
    val finalM = ManifestTable.snapshotAt(path, None).get
    val appendM = ManifestTable.snapshotAt(path, Some(v0 + 1)).get
    val baseM = ManifestTable.snapshotAt(path, Some(v0)).get
    val loserAdded = finalM.files.toSet -- appendM.files.toSet -- baseM.files.toSet
    assert(loserAdded.nonEmpty && loserAdded.forall(staged().contains),
      "disjoint append: the scoped compaction must reuse its staged files")
    // overlapping: a replaceWhere that REWRITES one of the compaction's
    // input files while it stages — the rebase must refuse and re-plan
    val dataA = spark.range(0, 10).select(
      col("id").as("k"), lit(1L).as("g"), lit(-1.0).as("v"))
    val staged2 = armRace(path) {
      ManifestTable.replaceWhere(spark, path, col("g") === 1, dataA)
    }
    ManifestTable.compactWhere(spark, path,
      Seq(Condition("g", Op.Lte, 3L)), targetBytes = 1L << 20)
    val t = ManifestTable.read(spark, path)
    assert(staged2().nonEmpty, "the race must have fired")
    assert(t.where(col("g") === 1).count() == 10,
      "the replace's rows must survive the re-planned compaction")
    assert(t.count() == 760, "800 - 100 replaced by 10 + 50 appended")
  }

  test("MoR merge racing a key-disjoint append: rebases with its staged " +
      "files reused; the appended rows stay visible above the pinned delete") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val extra = spark.range(9000, 9010).select(
      col("id").as("k"), lit(99L).as("g"), lit(9.0).as("v")).coalesce(1)
    // source: upsert k<10 with new values, tombstone k in [790, 795)
    val src = spark.range(0, 10).select(col("id").as("k"),
        (col("id") % 8).as("g"), lit(-7.0).as("v"), lit("U").as("op"))
      .unionByName(spark.range(790, 795).select(col("id").as("k"),
        (col("id") % 8).as("g"), lit(0.0).as("v"), lit("D").as("op")))
    val staged = armRace(path) { ManifestTable.append(extra, path) }
    ManifestTable.mergeMoR(spark, path, src, Seq("k"),
      deleteWhen = Some(col("op") === "D"))
    assert(ManifestTable.latestVersion(path) == v0 + 2)
    val winnerM = ManifestTable.snapshotAt(path, Some(v0 + 1)).get
    val finalM = ManifestTable.snapshotAt(path, None).get
    val loserAdded = (finalM.files.toSet ++ finalM.deletes.map(_._1)) --
      winnerM.files.toSet
    assert(loserAdded.nonEmpty && loserAdded.forall(staged().contains),
      "the merge must reuse its staged data AND delete files")
    val t = ManifestTable.read(spark, path)
    assert(t.count() == 800 - 5 + 10, "800 base - 5 tombstones + 10 appended")
    assert(t.where(col("k") >= 9000).count() == 10,
      "the winner's appended rows must stay visible above the pinned delete")
    assert(t.where(col("k") < 10 && col("v") =!= -7.0).count() == 0,
      "upserted values must win")
    assert(t.where(col("k").between(790, 794)).count() == 0,
      "tombstoned keys must be gone")
  }

  test("MoR merge racing an append WITH an overlapping key: re-runs and " +
      "merges the winner's row too") {
    val path = mk()
    // winner appends a SECOND row for key 5 — the merge must see it
    val extra = spark.range(5, 6).select(
      col("id").as("k"), lit(99L).as("g"), lit(111.0).as("v")).coalesce(1)
    val src = spark.range(0, 10).select(col("id").as("k"),
      (col("id") % 8).as("g"), lit(-7.0).as("v"))
    val staged = armRace(path) { ManifestTable.append(extra, path) }
    ManifestTable.mergeMoR(spark, path, src, Seq("k"))
    assert(staged().nonEmpty, "the race must have fired")
    val t = ManifestTable.read(spark, path)
    assert(t.where(col("k") === 5).count() == 1,
      "the re-run merge must collapse the winner's duplicate key too")
    assert(t.where(col("k") === 5).select("v").head().getDouble(0) == -7.0,
      "the merge source must win the overlapped key")
  }

  test("COW merge racing a key-disjoint append rebases; its rewrite files " +
      "are reused and the append carries") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val extra = spark.range(9000, 9020).select(
      col("id").as("k"), lit(99L).as("g"), lit(9.0).as("v")).coalesce(1)
    val src = spark.range(0, 10).select(col("id").as("k"),
      (col("id") % 8).as("g"), lit(-3.0).as("v"))
    val staged = armRace(path) { ManifestTable.append(extra, path) }
    ManifestTable.merge(spark, path, src, Seq("k"))
    assert(ManifestTable.latestVersion(path) == v0 + 2)
    val winnerM = ManifestTable.snapshotAt(path, Some(v0 + 1)).get
    val finalM = ManifestTable.snapshotAt(path, None).get
    val loserAdded = finalM.files.toSet -- winnerM.files.toSet
    assert(loserAdded.nonEmpty && loserAdded.forall(staged().contains),
      "the COW merge must reuse its staged rewrite files")
    val t = ManifestTable.read(spark, path)
    assert(t.count() == 820)
    assert(t.where(col("k") < 10 && col("v") =!= -3.0).count() == 0)
    assert(t.where(col("k") >= 9000).count() == 20)
  }

  test("four genuinely-racing disjoint backfills: all land, and ZERO " +
      "staged files are orphaned (nobody re-staged)") {
    // no injected hook — real thread contention. Each writer's scope is
    // file-disjoint by construction (ingest-by-group commits), so every
    // claim loser should rebase metadata-only. The invariant that proves
    // no re-staging happened without assuming a winner order: every file
    // in the data dir is referenced by SOME version's manifest — an
    // abandoned re-run would leave its first attempt's files orphaned.
    val path = Files.createTempDirectory("graft-cr4-").toString + "/t"
    (0 until 4).foreach { g =>
      ManifestTable.append(
        spark.range(0, 200).select((col("id") + g * 1000).as("k"),
          lit(g.toLong).as("g"), (col("id") * 1.5).as("v")).coalesce(2),
        path)
    }
    val v0 = ManifestTable.latestVersion(path)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val futs = (0 until 4).map { g =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          gate.await()
          ManifestTable.replaceWhere(spark, path, col("g") === g.toLong,
            spark.range(0, 50).select((col("id") + g * 1000).as("k"),
              lit(g.toLong).as("g"), lit(-g.toDouble).as("v")))
        }
      })
    }
    gate.countDown()
    futs.foreach(_.get())
    pool.shutdown()
    assert(ManifestTable.latestVersion(path) == v0 + 4,
      "all four backfills must land as their own versions")
    val t = ManifestTable.read(spark, path)
    (0 until 4).foreach { g =>
      assert(t.where(col("g") === g.toLong).count() == 50, s"group $g")
      assert(t.where(col("g") === g.toLong &&
        col("v") =!= -g.toDouble).count() == 0, s"group $g values")
    }
    // zero orphans = zero re-staged bytes across the whole race
    val referenced = (1L to (v0 + 4)).flatMap(v =>
      ManifestTable.snapshotAt(path, Some(v)).get.files).toSet
    val onDisk = dataDirListing(path)
    assert((onDisk -- referenced).isEmpty,
      s"every staged file must be adopted by some version; orphans: " +
        s"${(onDisk -- referenced).size}")
  }

  test("metadata×data: replaceWhere racing ADD CONSTRAINT rebases " +
      "metadata-only when its staged rows satisfy the new contract") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val dataA = spark.range(0, 40).select(
      col("id").as("k"), lit(2L).as("g"), lit(2.0).as("v"))
    val staged = armRace(path) {
      ManifestTable.setConstraints(spark, path, Seq("v >= 0"))
    }
    ManifestTable.replaceWhere(spark, path, col("g") === 2, dataA)
    assert(ManifestTable.latestVersion(path) == v0 + 2,
      "the constraint commit AND the rebased rewrite must both land")
    // the loser reused its staged files — zero bytes re-staged
    val winnerM = ManifestTable.snapshotAt(path, Some(v0 + 1)).get
    val finalM = ManifestTable.snapshotAt(path, None).get
    val loserAdded = finalM.files.toSet -- winnerM.files.toSet
    assert(loserAdded.nonEmpty && loserAdded.forall(staged().contains),
      "rebase across a satisfied contract drift must reuse staged files")
    // the adopted head carries the winner's contract, enforced from now on
    assert(ManifestTable.constraints(path) == Seq("v >= 0"))
    intercept[Exception] {
      ManifestTable.append(spark.range(0, 1).select(
        col("id").as("k"), lit(9L).as("g"), lit(-1.0).as("v")), path)
    }
    // DESCRIBE HISTORY surfaces the contention: the rebased commit names
    // the version its work was staged against
    val h = ManifestTable.history(spark, path)
      .where(col("version") === v0 + 2).select("rebased_from").head()
    assert(!h.isNullAt(0) && h.getLong(0) == v0,
      s"rebased_from must record the staged-against version, got $h")
  }

  test("metadata×data: replaceWhere whose staged rows VIOLATE the racing " +
      "constraint refuses the rebase and the re-run fails loudly") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val bad = spark.range(0, 40).select(
      col("id").as("k"), lit(2L).as("g"), lit(-2.0).as("v"))
    armRace(path) {
      ManifestTable.setConstraints(spark, path, Seq("v >= 0"))
    }
    val e = intercept[Exception] {
      ManifestTable.replaceWhere(spark, path, col("g") === 2, bad)
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("CHECK constraint violated") ||
      msgs.contains("constraint"), s"want a constraint failure, got: $msgs")
    // only the constraint landed; the violating rewrite landed NOTHING
    assert(ManifestTable.latestVersion(path) == v0 + 1)
    assert(ManifestTable.read(spark, path).where(col("v") < 0).count() == 0)
  }

  test("metadata×data: staged rows whose constraint evaluates to NULL " +
      "count as violations in the delta prover - 3VL matches " +
      "assert_true's null-is-violation enforcement") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    // v IS NULL makes `v >= 0` evaluate to NULL: the old NOT(pred)
    // violation query filtered those rows OUT (NOT(null) = null),
    // approving a rebase the full-scan enforcement path would reject
    val nullV = spark.range(0, 40).select(col("id").as("k"),
      lit(2L).as("g"), lit(null).cast("double").as("v"))
    armRace(path) {
      ManifestTable.setConstraints(spark, path, Seq("v >= 0"))
    }
    val e = intercept[Exception] {
      ManifestTable.replaceWhere(spark, path, col("g") === 2, nullV)
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("CHECK constraint violated") ||
      msgs.contains("constraint"), s"want a constraint failure, got: $msgs")
    // only the constraint landed; no NULL row dodged the contract
    assert(ManifestTable.latestVersion(path) == v0 + 1)
    assert(ManifestTable.read(spark, path)
      .where(col("v").isNull).count() == 0)
  }

  test("metadata×data: an append racing ADD CONSTRAINT re-validates its " +
      "staged rows against the head's contract inside the commit loop") {
    val path = mk()
    val okRows = spark.range(2000, 2010).select(
      col("id").as("k"), lit(60L).as("g"), lit(1.0).as("v"))
    val badRows = spark.range(3000, 3010).select(
      col("id").as("k"), lit(61L).as("g"), lit(-9.0).as("v"))
    // satisfied: the append validates O(staged) against the new contract
    // and lands on top of the constraint commit
    armRace(path) { ManifestTable.setConstraints(spark, path, Seq("v >= 0")) }
    ManifestTable.append(okRows, path)
    assert(ManifestTable.read(spark, path)
      .where(col("g") === 60).count() == 10)
    ManifestTable.setConstraints(spark, path, Seq.empty) // drop for leg 2
    // violating: the append staged under NO contract, the constraint
    // landed mid-commit, and the adoption must refuse
    armRace(path) { ManifestTable.setConstraints(spark, path, Seq("v >= 0")) }
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(badRows, path)
    }
    assert(e.getMessage.contains("do not satisfy the new contract"),
      s"got: ${e.getMessage}")
    assert(ManifestTable.read(spark, path).where(col("v") < 0).count() == 0,
      "the refused append must land nothing")
  }

  test("metadata×data: ADD CONSTRAINT losing its claim to an append " +
      "re-validates ONLY the delta and both land") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    // the interleaved append's rows satisfy → constraint lands on retry
    armRace(path) {
      ManifestTable.append(spark.range(4000, 4010).select(
        col("id").as("k"), lit(70L).as("g"), lit(4.0).as("v")), path)
    }
    val v = ManifestTable.setConstraints(spark, path, Seq("v >= 0"))
    assert(v == v0 + 2 && ManifestTable.constraints(path) == Seq("v >= 0"))
    assert(ManifestTable.read(spark, path).where(col("g") === 70).count() == 10)
    // the interleaved append's rows satisfy the CURRENT contract (they
    // stage fine) but VIOLATE the one being declared → must refuse
    armRace(path) {
      ManifestTable.append(spark.range(7000, 7010).select(
        col("id").as("k"), lit(71L).as("g"), lit(4.0).as("v")), path)
    }
    val e = intercept[Exception] {
      ManifestTable.setConstraints(spark, path, Seq("v >= 0", "k < 6000"))
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("CHECK constraint violated") ||
      msgs.contains("constraint"), s"want a constraint failure, got: $msgs")
    assert(ManifestTable.constraints(path) == Seq("v >= 0"),
      "the refused constraint change must leave the previous contract")
  }

  test("metadata×metadata: ADD CONSTRAINT and GENERATED COLUMNS " +
      "interleave - both land, neither update lost") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    armRace(path) {
      ManifestTable.setGeneratedColumns(spark, path, Seq("g" -> "k % 8"))
    }
    ManifestTable.setConstraints(spark, path, Seq("v >= 0"))
    assert(ManifestTable.latestVersion(path) == v0 + 2)
    assert(ManifestTable.constraints(path) == Seq("v >= 0"))
    assert(ManifestTable.generatedColumns(path) == Seq("g" -> "k % 8"),
      "the constraint retry must carry the generated columns forward")
  }

  test("plain appends still rebase in the commit loop itself (no staging " +
      "re-run on contention)") {
    val path = mk()
    val v0 = ManifestTable.latestVersion(path)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val rows = (0 until 4).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = ManifestTable.append(
          spark.range(10000 + i * 10, 10000 + i * 10 + 10).select(
            col("id").as("k"), lit(50L + i).as("g"), lit(0.0).as("v")),
          path)
      })
    }
    rows.foreach(_.get())
    pool.shutdown()
    assert(ManifestTable.latestVersion(path) == v0 + 4)
    assert(ManifestTable.read(spark, path).count() == 840)
  }
}
