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
    val oldDefining = store.join(broadcast(touched), cond, "left_semi")
      .select(col("key"), col("event_id"), col("attr"), col("valid_from"))
    val newDefining = delta.select(
      key.as("key"), id.as("event_id"), attr.as("attr"),
      ts.as("valid_from"))
    untouched.unionByName(
      fromDefining(oldDefining.unionByName(newDefining)))
  }
}
