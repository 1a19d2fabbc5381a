package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-class as-of join — each left row is matched with the LATEST
  * right row whose timestamp is ≤ the left row's (per key), the
  * operator kdb/QuestDB/Flink ship natively and Spark lacks.
  *
  * Implementation is the union trick, which is the scale-correct
  * shape: tag both sides, union (no shuffle), ONE shuffle+sort per
  * key, and a running `last(ignoreNulls)` window carries the most
  * recent right payload forward into each left row. Never builds the
  * (left × right-candidates) blow-up a range-condition join would;
  * cost is O((|L|+|R|) log) per key, skew handled by AQE on the one
  * shuffle.
  */
object AsOf {

  /** `rightPayload` columns (evaluated against `right`) are attached
    * to every left row, null when no right row precedes it. Ties: a
    * right row at exactly the left row's timestamp DOES match
    * (inclusive); multiple right rows at one timestamp resolve to the
    * last by `rightTie` ordering.
    *
    * `tolerance` (same units as the timestamp columns) bounds match
    * staleness: a right row older than `leftTs - tolerance` does not
    * match (kdb's `wj`/pandas `merge_asof(tolerance=)` semantics).
    * Because the as-of match is the LATEST preceding right row, the
    * bound is a post-filter on the single carried match — no change
    * to the one-shuffle union plan.
    */
  def join(
      left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightPayload: Seq[(String, Column)],
      rightTie: Column = lit(0),
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Set("_k", "_ts", "_side", "_tie", "_rp", "_match")
    require(!leftCols.exists(reserved), s"left columns collide with " +
      s"as-of internals: ${leftCols.filter(reserved).mkString(", ")}")
    // with a tolerance the match timestamp rides inside the payload
    // struct so the staleness bound can be applied after the window
    val payloadCols = rightPayload.map { case (n, c) => c.as(n) } ++
      (if (tolerance.isDefined) Seq(rightTs.cast("long").as("__mts")) else Nil)
    val payload = struct(payloadCols: _*)
    // resolve the payload struct type against `right`, so the left
    // side can carry a matching typed null
    val rBase = right.select(
      rightKey.as("_k"), rightTs.as("_ts"), lit(0).as("_side"),
      rightTie.cast("long").as("_tie"), payload.as("_rp"))
    val rpType = rBase.schema("_rp").dataType
    val rAligned = rBase.select(
      Seq(col("_k"), col("_ts"), col("_side"), col("_tie"), col("_rp")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lAligned = left.select(
      Seq(leftKey.as("_k"), leftTs.as("_ts"), lit(1).as("_side"),
        lit(Long.MaxValue).as("_tie"), lit(null).cast(rpType).as("_rp")) ++
        leftCols.map(col): _*)
    // right rows sort BEFORE left at equal ts (side 0 < 1) → inclusive
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = lAligned.unionByName(rAligned)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(tol) => matched.withColumn("_match",
        when(col("_ts").cast("long") - col("_match.__mts") <= tol, col("_match")))
      case None => matched
    }
    bounded.select(leftCols.map(col) ++
      rightPayload.map { case (n, _) => col(s"_match.$n").as(n) }: _*)
  }
}
