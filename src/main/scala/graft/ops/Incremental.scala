package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance: keep a compact per-key STATE
  * (count / decimal sum / min / max), fold new batches into it with
  * an algebraic MERGE, and never re-scan history — the pattern that
  * turns a daily 100 TB re-aggregation into a merge of yesterday's
  * state with today's delta.
  *
  * Correctness rests on the state being a commutative monoid: counts
  * add, decimal sums add (exactly — no float order-dependence), mins
  * take least, maxes take greatest. `merge(state(a), state(b)) ==
  * state(a ∪ b)` at any batch split, which the oracle checks by
  * recomputing from the full input.
  */
object Incremental {

  /** Per-key aggregate state of one batch. Sum is exact DECIMAL so
    * merge order can never change the result.
    */
  def state(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("k"))
      .agg(
        count(lit(1)).as("n"),
        sum(value.cast(DecimalType(18, 2))).as("sum_v"),
        min(value).as("min_v"),
        max(value).as("max_v"))

  /** Merge two states (full outer on key; absent side contributes the
    * identity). Output schema equals `state` output, so merges chain.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(
      col("k").as("k2"), col("n").as("n2"), col("sum_v").as("sum_v2"),
      col("min_v").as("min_v2"), col("max_v").as("max_v2"))
    a.join(bb, col("k") === col("k2"), "full_outer")
      .select(
        coalesce(col("k"), col("k2")).as("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0).cast(DecimalType(18, 2))) +
          coalesce(col("sum_v2"), lit(0).cast(DecimalType(18, 2)))).as("sum_v"),
        least(
          coalesce(col("min_v"), col("min_v2")),
          coalesce(col("min_v2"), col("min_v"))).as("min_v"),
        greatest(
          coalesce(col("max_v"), col("max_v2")),
          coalesce(col("max_v2"), col("max_v"))).as("max_v"))
  }

  /** Surface a state for consumption: exact decimal sum → double. */
  def finish(state: DataFrame): DataFrame =
    state.select(
      col("k"), col("n"),
      col("sum_v").cast("double").as("sum_v"),
      col("min_v"), col("max_v"))

  /** Incremental INNER-JOIN maintenance: given a join result already
    * materialized over bases (A, B) and insert-only deltas (ΔA, ΔB),
    * return exactly the NEW join rows — the delta-join identity
    *
    *   (A∪ΔA) ⋈ (B∪ΔB)  =  A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
    *
    * (disjoint union for insert-only deltas: every output row pairs
    * one left with one right row, and each combination falls in
    * exactly one of the four terms by which side(s) its rows came
    * from). This is the 100 TB pattern that turns a nightly re-join
    * of two full tables into three joins where EVERY join has a
    * delta side: the deltas are the small probes (Catalyst
    * broadcasts them when they fit), the base tables are scanned
    * once each, and the already-materialized A⋈B is never touched.
    *
    * Output: the three delta terms unioned, columns `left ++ right`
    * (the [[AdaptiveJoin]] contract — disjoint column names).
    */
  def deltaJoin(
      baseLeft: DataFrame, deltaLeft: DataFrame,
      baseRight: DataFrame, deltaRight: DataFrame,
      leftKey: Column, rightKey: Column): DataFrame = {
    require(
      baseLeft.columns.toSet.intersect(baseRight.columns.toSet).isEmpty,
      "deltaJoin: left/right column names must be disjoint")
    val cond = leftKey === rightKey
    val outCols = (baseLeft.columns ++ baseRight.columns).map(col).toSeq
    deltaLeft.join(baseRight, cond).select(outCols: _*)
      .unionByName(baseLeft.join(deltaRight, cond).select(outCols: _*))
      .unionByName(deltaLeft.join(deltaRight, cond).select(outCols: _*))
  }
}
