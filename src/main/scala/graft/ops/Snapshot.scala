package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key of two table versions
  * as added / deleted / changed / same — the change-data-capture twin
  * of the reference's file-vs-API indicator merge (reference
  * `weekly alignments GQL API.py:391-425`, which diffs last week's
  * loaded state against this week's file).
  *
  * Scale notes: ONE full-outer shuffle join on the key; the payload
  * comparison is a null-safe conjunction evaluated while streaming the
  * join output, so nothing is materialized and no second pass runs.
  * At 100 TB both snapshots hash-partition on the key and compare
  * co-located rows; for a cheap cross-cluster pre-check compose with
  * [[graft.ops.Stats.checksumRollup]] and diff O(groups) summary rows
  * first, descending to this per-row diff only for groups whose
  * checksums disagree.
  */
object Snapshot {

  /** Per-key diff of `oldDf` vs `newDf`.
    *
    * Both frames must have at most one row per `key` and carry all
    * `payload` columns. Output: one row per key present in either
    * side, with `status` ∈ added (new only) / deleted (old only) /
    * changed (both, any payload column differs under null-safe
    * equality) / same.
    */
  def diff(
      oldDf: DataFrame, newDf: DataFrame,
      key: String, payload: Seq[String]): DataFrame = {
    val oldTagged = oldDf.select(
      col(key).as("_k_old") +: lit(true).as("_in_old") +:
        payload.map(c => col(c).as(s"_old_$c")): _*)
    val newTagged = newDf.select(
      col(key).as("_k_new") +: lit(true).as("_in_new") +:
        payload.map(c => col(c).as(s"_new_$c")): _*)
    val samePayload = payload
      .map(c => col(s"_old_$c") <=> col(s"_new_$c"))
      .reduce(_ && _)
    oldTagged
      .join(newTagged, col("_k_old") === col("_k_new"), "full_outer")
      .select(
        coalesce(col("_k_old"), col("_k_new")).as(key),
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "deleted")
          .when(samePayload, "same")
          .otherwise("changed")
          .as("status"))
  }
}
