package graft

import graft.sources.ManifestTable
import org.apache.spark.sql.functions._

/** Constraint/generated enforcement must not leak across the MoR
  * reconcile join onto delete-key files (EnforcementGate's contract). */
class EnforcementGateSpec extends SparkSpecBase {
  import spark.implicits._

  test("declaring a constraint the DELETED keys violate succeeds; " +
      "live-row violations still fail") {
    val t = java.nio.file.Files
      .createTempDirectory("gate-spec-").toString + "/t"
    // key 0 is the only row violating `k > 0` — and it gets DELETED,
    // so its key sits in the ledger when the constraint is declared
    ManifestTable.overwrite(
      (0L to 40L).map(k => (k, s"v$k")).toDF("k", "v").repartition(3), t)
    ManifestTable.mergeMoR(spark, t,
      Seq((0L, "v0", "D")).toDF("k", "v", "op"), Seq("k"),
      deleteWhen = Some(col("op") === "D"))
    // without the gate, InferFiltersFromConstraints cloned the check
    // onto the delete-key scan and this threw on the ledger's key 0
    ManifestTable.setConstraints(spark, t, Seq("k > 0"))
    assert(ManifestTable.constraints(t) == Seq("k > 0"))
    // the check still has teeth on actual table rows
    val bad = intercept[Throwable](
      ManifestTable.append(Seq((0L, "back")).toDF("k", "v"), t))
    def leaves(e: Throwable): Seq[String] =
      if (e == null) Seq.empty
      else String.valueOf(e.getMessage) +: leaves(e.getCause)
    assert(leaves(bad).exists(_.contains("CHECK constraint violated")))
    // generated-column validation takes the same gated path
    ManifestTable.setGeneratedColumns(spark, t, Seq.empty)
    assert(ManifestTable.read(spark, t).count() == 40L)
  }
}
