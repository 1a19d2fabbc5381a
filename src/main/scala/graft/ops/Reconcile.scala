package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset reconciliation: the Spark-native re-expression of pandas
  * `merge(how="outer", indicator=True)` and its `_merge`-based splits,
  * which the reference uses to diff file-vs-API locations, users and
  * districts (reference `weekly alignments GQL API.py:391-425,
  * 805-841`).
  *
  * Scale notes: `mergeIndicator` is a single full-outer join — one
  * shuffle on the join key, streamed, never materialized on the
  * driver (pandas holds both frames in RAM). The indicator is derived
  * from per-side constant marker columns, so it is correct even when
  * join keys are nullable. Anti/semi variants map to Spark's
  * `left_anti`/`left_semi`, which skip materializing the right side's
  * payload entirely.
  */
object Reconcile {

  val IndicatorCol = "merge_status"

  /** Full-outer join `left` with `right` on `cond`, adding a
    * `merge_status` column ∈ {both, left_only, right_only}.
    */
  def mergeIndicator(left: DataFrame, right: DataFrame, cond: Column): DataFrame = {
    val lTag = "_graft_present_l"
    val rTag = "_graft_present_r"
    val l = left.withColumn(lTag, lit(true))
    val r = right.withColumn(rTag, lit(true))
    l.join(r, cond, "full_outer")
      .withColumn(
        IndicatorCol,
        when(col(lTag).isNotNull && col(rTag).isNotNull, "both")
          .when(col(lTag).isNotNull, "left_only")
          .otherwise("right_only"))
      .drop(lTag, rTag)
  }

  /** Rows of `left` with no match in `right` — the reference's
    * `_merge == "left_only"` split (new records not yet in the API).
    */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Rows of `left` with at least one match in `right` — the
    * reference's `_merge == "both"` split, without duplicating on
    * multi-matches.
    */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** Count rows per indicator bucket — the reference prints these
    * counts as its reconciliation report.
    */
  def indicatorCounts(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    mergeIndicator(left, right, cond)
      .groupBy(IndicatorCol)
      .agg(count(lit(1)).as("n"))
}
