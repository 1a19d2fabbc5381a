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

  /** A routed maintenance result: the frame, whether the delete batch
    * forced the full-recompute arm, and how many delete rows drove
    * the decision.
    */
  final case class Routed(
      df: DataFrame, recomputed: Boolean, deletes: Long)

  /** Wire the [[insertOnly]] pointer (r16, r15 verdict item 5): the
    * five insert-only members fail LOUDLY on a delete batch and tell
    * the caller to "re-run the full recompute" — this wrapper runs
    * it. The delta is inspected for delete rows (one delta-sized
    * count on the `mult` column — callers should pass a materialized
    * delta, the same localCheckpoint discipline every maintenance
    * gate already follows); an insert-only delta routes to `fold`
    * (the member's delta kernel, which re-verifies via its own
    * in-band guard), a delta carrying any `mult < 0` row routes to
    * `recompute` (the member's full rebuild over the corrected
    * inputs — the caller owns constructing them, because only the
    * caller knows which base tables the deletes retract from). Both
    * arms land on the state the corrected-tables recompute produces
    * (spec-pinned per member in MaintenanceSpec); the returned
    * [[Routed]] carries the routing evidence so a nightly job can
    * log WHY it recomputed — the [[DurableState.MaintainDecision]]
    * discipline.
    *
    * A frame without the `mult` column cannot express a delete at
    * all and always folds.
    */
  def maintainOrRecompute(
      delta: DataFrame, mult: String = "mult")(
      fold: DataFrame => DataFrame)(
      recompute: => DataFrame): Routed =
    if (!delta.columns.contains(mult)) Routed(fold(delta), false, 0L)
    else {
      val deletes = delta.filter(col(mult) < 0).count()
      if (deletes == 0L) Routed(fold(delta), false, 0L)
      else Routed(recompute, true, deletes)
    }
}
