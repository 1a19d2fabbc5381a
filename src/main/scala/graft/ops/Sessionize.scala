package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch gap-based sessionization over an event stream — the batch
  * twin of the Structured Streaming `flatMapGroupsWithState` variant
  * in `graft.streaming`. Gap comparison is done in exact integer
  * microseconds on both engines (no float epoch rounding), so the
  * DuckDB oracle bit-matches.
  *
  * Scale: one shuffle (partition by entity key) + per-key sort; state
  * never leaves the executors. Skewed keys are handled by AQE skew
  * splitting on the window's shuffle.
  */
object Sessionize {

  /** Assign session ids per entity: a new session starts when the gap
    * from the previous event exceeds `gapUs` microseconds. Returns
    * per-session rows: (key, sess_id, n_events, start_us, end_us).
    */
  def sessions(
      events: DataFrame,
      key: Column,
      tsUs: Column,
      tieBreak: Column,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsUs, tieBreak)
    val flagged = events
      .withColumn("_ts_us", tsUs)
      .withColumn("_prev_us", lag(col("_ts_us"), 1).over(w))
      .withColumn(
        "_new_sess",
        when(col("_prev_us").isNull || col("_ts_us") - col("_prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn(
        "sess_id",
        sum(col("_new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(key.as("key"), col("sess_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("_ts_us")).as("start_us"),
        max(col("_ts_us")).as("end_us"))
  }
}
