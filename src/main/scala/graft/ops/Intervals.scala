package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join without the cross product.
  *
  * A naive overlap join (`a.start <= b.end AND b.start <= a.end`) has
  * no equi-key, so Spark plans it as BroadcastNestedLoopJoin — O(n·m)
  * and driver-bound. Binning restores an equi-key: each interval is
  * replicated to the fixed-width bins it covers, the join runs as a
  * plain shuffled hash/sort-merge join on the bin id, and the overlap
  * predicate filters within the bin.
  *
  * Duplicate elimination is free: an overlapping pair is emitted only
  * from the bin containing `max(a.start, b.start)` — a point that lies
  * in both intervals, hence in both bin lists — so no `distinct`
  * shuffle is needed afterwards.
  *
  * 100 TB notes: replication factor per side is `span/binWidth + 1`,
  * so pick `binWidth` near the median interval span (cost ≈ 2× input
  * rows). The shuffle is keyed by bin id; temporal skew (a hot day)
  * is bounded by AQE skew-join splitting since each bin is a plain
  * equi-join key.
  */
object Intervals {

  /** All overlapping (a, b) interval pairs with the exact overlap
    * length, via bin-replicated equi-join. Bounds are inclusive
    * integers (e.g. epoch days) and must be non-negative (`div`
    * truncation = floor only for non-negative operands); the two
    * frames must have disjoint column names.
    */
  def overlapPairs(
      a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, s: String, e: String, bin: String) =
      df.withColumn(
        bin,
        explode(expr(
          s"sequence(CAST($s AS BIGINT) div $binWidth, CAST($e AS BIGINT) div $binWidth)")))
    val ab = binned(a, aStart, aEnd, "_bin_a")
    val bb = binned(b, bStart, bEnd, "_bin_b")
    ab.join(
        bb,
        col("_bin_a") === col("_bin_b") &&
          col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
          col("_bin_a") === expr(
            s"greatest(CAST($aStart AS BIGINT), CAST($bStart AS BIGINT)) div $binWidth"))
      .drop("_bin_a", "_bin_b")
      .withColumn(
        "overlap_len",
        (least(col(aEnd), col(bEnd)) - greatest(col(aStart), col(bStart)) + lit(1L))
          .cast("long"))
  }
}
