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

  /** Dynamic reconcile key (reference 390-415, 481-506): join by the
    * primary condition (file `Unit` = API `remoteId`) normally, but
    * fall back to the secondary condition (normalized location name)
    * exactly when the reference's `(remoteId == "").all()` is true —
    * i.e. EVERY row of the API frame carries the literal empty
    * string. Null (pandas NaN) and whitespace-only remoteIds make the
    * elementwise `== ""` False, so their presence forces the PRIMARY
    * branch, and an empty API frame vacuously falls back — both
    * replicated here. The branch test is one `LIMIT 1` scan over the
    * API frame (control-plane-sized next to the fact data), after
    * which either branch is the one-shuffle [[mergeIndicator]].
    */
  def mergeIndicatorWithFallback(
      left: DataFrame,
      right: DataFrame,
      rightPrimary: Column,
      primaryCond: Column,
      fallbackCond: Column): DataFrame = {
    // usable key ⇔ some row where (remoteId == "") does NOT hold:
    // null or any non-empty string (whitespace included)
    val anyUsableKey = !right
      .filter(rightPrimary.isNull || rightPrimary =!= lit(""))
      .isEmpty
    mergeIndicator(left, right, if (anyUsableKey) primaryCond else fallbackCond)
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

  /** Blocked fuzzy join: candidate pairs share a `blockPrefix`-char
    * prefix of the (pre-normalized) match string; only candidates are
    * scored with Levenshtein and kept at distance ≤ `maxDist`. The
    * approximate-match half of the reference's name-fallback
    * reconcile (reference 390-415 joins on normalized names exactly;
    * this tolerates typos/truncations).
    *
    * Shape: one equi-shuffle per side on the block key — never an
    * all-pairs product; the quadratic work is confined to within a
    * block, so prefix length tunes the block-size/recall trade
    * (lengthen it, or compose a second blocking pass, when a hot
    * prefix dominates). Levenshtein runs inside whole-stage codegen.
    * Distance semantics are engine-portable (unit-cost edit distance,
    * identical in DuckDB).
    */
  def fuzzyJoin(
      left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column,
      maxDist: Int, blockPrefix: Int = 3): DataFrame = {
    val l = left.select(leftId.as("id_a"), leftStr.as("_sa"))
    val r = right.select(rightId.as("id_b"), rightStr.as("_sb"))
    l.join(r,
        substring(col("_sa"), 1, blockPrefix) ===
          substring(col("_sb"), 1, blockPrefix))
      .withColumn("d", levenshtein(col("_sa"), col("_sb")))
      .filter(col("d") <= maxDist)
      .select(col("id_a"), col("id_b"), col("d").cast("long").as("d"))
  }

  /** Post-load resync validation (reference 38-42): after the
    * delete + reload cycle the just-loaded group count must equal the
    * count the file asked for. Returns a one-row
    * (loaded_n, expected_n, ok) report — two single-row aggregates,
    * no data movement beyond the counts; with `strict` the mismatch
    * raises, which is the reference's `raise Exception` behavior.
    */
  def loadedCountCheck(
      loaded: DataFrame, expected: DataFrame,
      strict: Boolean = false): DataFrame = {
    val report = loaded.agg(count(lit(1)).as("loaded_n"))
      .crossJoin(expected.agg(count(lit(1)).as("expected_n")))
      .withColumn("ok", col("loaded_n") === col("expected_n"))
    if (strict) {
      val row = report.head()
      if (!row.getAs[Boolean]("ok"))
        throw new IllegalStateException(
          s"loaded-count mismatch: loaded=${row.getAs[Long]("loaded_n")} " +
            s"expected=${row.getAs[Long]("expected_n")}")
    }
    report
  }
}
