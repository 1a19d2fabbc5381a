package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn an irregular per-key event series
  * into a dense fixed-step grid with carried-forward values — the
  * "resample + ffill" pattern (pandas `resample('1D').ffill()`), but
  * distributed: no per-key driver loop, no in-memory series.
  */
object Timeseries {

  /** Dense integer-step spine per key with forward-filled values.
    *
    * `daily` must be pre-aggregated to at most one row per
    * (`key`, `step`); `step` is an integer grid position (e.g. epoch
    * day) and `value` the (nullable after the spine join) observation.
    * Output: one row per key per step in [min step, max step] of that
    * key, with
    *   - `filled`    — last non-null value at or before the step,
    *   - `staleness` — steps since that observation (0 on observation
    *     rows).
    *
    * Shape: one aggregation for per-key bounds, `sequence`+`explode`
    * for the spine (distributed — each key's spine is generated on the
    * executor holding the key, never the driver), a shuffled join back
    * on (key, step), and a running `last(ignoreNulls)` window keyed by
    * the same key. Forward-fill copies values bit-exactly — no
    * re-accumulation, so the result is deterministic at any
    * parallelism.
    */
  /** Trailing moving average over the last `window` OBSERVED rows per
    * key (compose with [[resampleFill]] first if the average must be
    * over calendar steps instead). The windowed sum stays in exact
    * decimal — only the final divide is double — so the result is
    * bit-deterministic at any parallelism. One shuffle on the key.
    */
  def movingAvg(
      daily: DataFrame, key: String, step: String, value: String,
      window: Int = 7, scale: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(step))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily.select(
      col(key), col(step),
      col(value),
      (sum(col(value).cast(DecimalType(18, scale))).over(w).cast("double")
        / count(lit(1)).over(w)).as("mavg"),
      count(lit(1)).over(w).cast("long").as("n_window"))
  }

  def resampleFill(
      daily: DataFrame, key: String, step: String, value: String): DataFrame = {
    val bounds = daily
      .groupBy(col(key))
      .agg(min(col(step)).as("_d0"), max(col(step)).as("_d1"))
    val spine = bounds.select(
      col(key),
      explode(sequence(col("_d0"), col("_d1"))).as(step))
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(step))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq(key, step), "left")
      .select(
        col(key),
        col(step).cast("long").as(step),
        last(col(value), ignoreNulls = true).over(w).as("filled"),
        (col(step) - last(when(col(value).isNotNull, col(step)), ignoreNulls = true)
          .over(w)).cast("long").as("staleness"))
  }
}
