package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slowly-changing-dimension TYPE 2 as a first-class pair: build the
  * versioned history from an event log, and MAINTAIN it incrementally
  * under late-arriving events (r14 — the warehouse member of the
  * temporal-IVM family).
  *
  * The maintained store carries the defining `event_id` alongside the
  * derived columns, because SCD2 rows ARE their defining events
  * ((key, event_id, attr, valid_from) reconstructs the input row
  * exactly) — that is what makes delta maintenance possible without
  * an event archive.
  */
object Scd2 {

  /** Versioned history: one row per event, `[valid_from, valid_to)`
    * from consecutive event timestamps per key ((ts, event_id)
    * order), open interval + `is_current` on the last. Output:
    * (key, event_id, version, attr, valid_from, valid_to,
    * is_current). One key-window shuffle.
    */
  def build(
      events: DataFrame, key: Column, id: Column, attr: Column,
      ts: Column): DataFrame =
    fromDefining(events.select(
      key.as("key"), id.as("event_id"), attr.as("attr"),
      ts.as("valid_from")))

  private def fromDefining(defining: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("valid_from"), col("event_id"))
    defining.select(
      col("key"),
      col("event_id"),
      row_number().over(w).cast("long").as("version"),
      col("attr"),
      col("valid_from"),
      lead(col("valid_from"), 1).over(w).as("valid_to"),
      lead(col("valid_from"), 1).over(w).isNull.as("is_current"))
  }

  /** Fold a batch of LATE-ARRIVING events into the maintained store
    * at touched-key cost. A late event does more than append: it
    * SPLITS the covering validity interval, closes the previously
    * open row when it lands last, and RENUMBERS every later version
    * of its key — so per-row Z-deltas cannot express the change and
    * the honest granularity is the touched-KEY slice (the
    * `applyDeltaZ` discipline applied to a window-derived view):
    *
    *  - untouched keys pass through a broadcast ANTI join, NO shuffle;
    *  - touched keys' store rows project back to their defining
    *    events (the store carries `event_id` exactly for this),
    *    union the delta batch, and rebuild through ONE window over
    *    the touched slice only.
    *
    * Insert-only by contract (deleting an event would re-open or
    * merge intervals — run [[build]] over the corrected log);
    * (key, ts, event_id) unique across base ∪ deltas. Returns the
    * updated store; equality with [[build]] over the unioned log and
    * the bit-identical untouched passthrough are spec-pinned.
    */
  def deltaMaintain(
      store: DataFrame, deltaEvents: DataFrame,
      key: Column, id: Column, attr: Column, ts: Column): DataFrame = {
    val want = Seq("key", "event_id", "version", "attr", "valid_from",
      "valid_to", "is_current")
    require(store.columns.toSeq == want,
      s"deltaMaintain: store must have the build() schema " +
        s"(${want.mkString(",")}), got ${store.columns.mkString(",")}")
    val delta = Maintenance.insertOnly(deltaEvents, "Scd2.deltaMaintain",
      "deleting an event re-opens or merges validity intervals, which " +
        "a touched-key rebuild of the remaining store rows cannot " +
        "express — run build() over the corrected log")
    val touched = delta.select(key.as("_t_k")).distinct()
    // NULL-SAFE key match (r15, r14 advice): build()'s window groups
    // null keys together, so a null-key late event must pull the
    // null-key store slice into the rebuild — === would leave old
    // null-key rows in the passthrough and renumber the delta's rows
    // in isolation, silently breaking the build() equality. Same
    // discipline as applyDeltaZ/applyZSum.
    val cond = col("key") <=> col("_t_k")
    val untouched = store.join(broadcast(touched), cond, "left_anti")
    val touchedStore = store.join(broadcast(touched), cond, "left_semi")
    // VERSION-OFFSET awareness (r16, retention): a store pruned by
    // [[pruneFrozen]] keeps each live key's chain SUFFIX with its
    // ABSOLUTE version numbers, so the rebuild must renumber from
    // the suffix's base, not from 1. The offset is min(version) − 1
    // over the key's retained rows — 0 for unpruned stores, making
    // this bit-identical to the pre-retention kernel there. The
    // store's version rides the defining projection (null on delta
    // rows), so the offset and the first retained row come from
    // UNBOUNDED window aggregates over the SAME key partitioning as
    // the rebuild window — no extra shuffle, no joins, no extra
    // slice pass (the first r16 cut used a groupBy + two broadcast
    // joins and cost a dense sf10 fold ~55%; measured, replaced).
    val oldDefining = touchedStore.select(
      col("key"), col("event_id"), col("attr"), col("valid_from"),
      col("version").as("_v"))
    val newDefining = delta.select(
      key.as("key"), id.as("event_id"), attr.as("attr"),
      ts.as("valid_from"), lit(null).cast("long").as("_v"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("valid_from"), col("event_id"))
    // the unbounded aggregates share w's partitioning AND ordering
    // (with an explicit full frame), so Catalyst collapses all the
    // window functions into ONE WindowExec pass — a frameless
    // Window.partitionBy(key) spec would be a second pass (measured
    // ~2× on dense sf10 folds). DERIVED from w so the shared-spec
    // invariant is structural, not textual (r16 review).
    val wAll =
      w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val off = coalesce(min(col("_v")).over(wAll), lit(1L)) - 1L
    val firstRetained = min(when(col("_v").isNotNull,
      struct(col("valid_from"), col("event_id")))).over(wAll)
    // PRUNED-HISTORY GUARD: on a pruned key (offset > 0), a delta
    // event sorting BEFORE the first retained row would splice into
    // pruned history and silently take a wrong absolute version —
    // in-band assert, naming the remediation. (Events with ts
    // strictly above the prune horizon can never trip it: the
    // interval containing such a ts has valid_to > horizon and was
    // retained. A below-horizon event inside a RETAINED interval
    // folds correctly and legally — it just lowers the store's
    // effective retention horizon; see pruneFrozen's doc.)
    val rebuilt = oldDefining.unionByName(newDefining)
      .select(
        col("key"), col("event_id"), col("attr"), col("valid_from"),
        col("_v"), off.as("_off"), firstRetained.as("_first"),
        row_number().over(w).cast("long").as("_rn"),
        lead(col("valid_from"), 1).over(w).as("valid_to"),
        lead(col("valid_from"), 1).over(w).isNull.as("is_current"))
      .filter(assert_true(
        col("_v").isNotNull || col("_off") === 0L ||
          struct(col("valid_from"), col("event_id")) >= col("_first"),
        concat(lit("Scd2.deltaMaintain: event "),
          col("event_id").cast("string"),
          lit(" precedes its key's first RETAINED version — it would " +
            "splice into pruned history; re-run build() over the " +
            "full corrected log or widen the retention horizon")))
        .isNull)
      .select(col("key"), col("event_id"),
        (col("_rn") + col("_off")).as("version"), col("attr"),
        col("valid_from"), col("valid_to"), col("is_current"))
    untouched.unionByName(rebuilt)
  }

  /** RETENTION for the maintained store (r16 — the batch analog of
    * `scd2Stream`'s frozen-prefix eviction): drop every version with
    * `valid_to <= horizon`. Along each key's chain `valid_to` is
    * nondecreasing, so the dropped set is a PREFIX and the survivors
    * keep their absolute version numbers (the open row has null
    * `valid_to` and always survives — every live key retains at
    * least one row, which is what lets [[deltaMaintain]] recover the
    * version offset). Late events with ts STRICTLY above `horizon`
    * stay foldable forever AND preserve the retention equality
    * (maintained == build(full log) filtered at `horizon`): the
    * interval containing such a ts has `valid_to > horizon` and was
    * retained, so the event lands at or after its key's first
    * retained row (ties included — a pruned row's
    * `valid_to <= horizon < ts` rules out same-timestamp
    * interleaving with pruned history). An event AT OR BELOW the
    * horizon splits in two (r16 review — the precise contract):
    * one sorting BEFORE its key's first retained row trips
    * deltaMaintain's in-band pruned-history guard loudly (it would
    * take a wrong absolute version); one landing INSIDE a retained
    * interval folds with CORRECT absolute versions, but the store
    * then holds a row with `valid_to <= horizon` — i.e. it equals
    * the full-log build pruned at a LOWER effective horizon, not at
    * this one. That is benign (re-run pruneFrozen any time to
    * restore the bound); only version correctness is load-bearing,
    * and the guard protects exactly that.
    */
  def pruneFrozen(store: DataFrame, horizon: Long): DataFrame = {
    val want = Seq("key", "event_id", "version", "attr", "valid_from",
      "valid_to", "is_current")
    require(store.columns.toSeq == want,
      s"pruneFrozen: store must have the build() schema " +
        s"(${want.mkString(",")}), got ${store.columns.mkString(",")}")
    store.filter(col("valid_to").isNull || col("valid_to") > horizon)
  }
}
