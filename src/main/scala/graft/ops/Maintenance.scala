package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared contract enforcement for the INSERT-ONLY maintenance
  * members (r15, r14 verdict item 5). The Z-join kernels
  * ([[Incremental.deltaJoinZ]] and friends) take deletes; the
  * derived-view maintainers ([[Scd2.deltaMaintain]],
  * [[AsOf.deltaJoin]], `Dedup.incrementalComponents`,
  * `Sampling.fixedKDelta`, `Curation.curateDelta`) deliberately do
  * NOT — each states a structural reason (an edge removal can split a
  * component; an evicted quota row is forgotten; …). A user migrating
  * from the Z-kernels hits that asymmetry, so the contract must be
  * ENFORCED, not just documented: every member routes its delta
  * through [[insertOnly]], which fails loudly — naming the member,
  * its reason, and the full-recompute pointer — the moment a delete
  * row executes.
  */
object Maintenance {

  /** Return `delta` with an IN-BAND insert-only guard: if the frame
    * carries a signed-multiplicity column (named `mult`, the Z-set
    * convention), any row with mult < 0 fails the job with the
    * member's named reason. Frames without the column pass through
    * untouched (their rows cannot express a delete at all).
    *
    * The guard is a FILTER predicate, not a projected column — a
    * projected guard would be pruned away the moment the member
    * selects its own columns, while a filter stays on the data path
    * and runs codegen'd per row (zero extra jobs, zero shuffles;
    * `assert_true` evaluates to null ⇒ `isNull` keeps every passing
    * row).
    */
  def insertOnly(
      delta: DataFrame, member: String, reason: String,
      mult: String = "mult"): DataFrame =
    if (!delta.columns.contains(mult)) delta
    else delta.filter(assert_true(
      col(mult).isNull || col(mult) >= 0,
      concat(lit(s"$member: delete batches are out of scope — $reason" +
        s" (saw $mult="), col(mult).cast("string"), lit(")"))).isNull)
}
