package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Trailing-window z-score anomaly detection: each observation is
    * scored against the mean/std of the `window` rows strictly BEFORE
    * it (so the anomaly never contaminates its own baseline). Only
    * rows with a full baseline window emit a score — partial windows
    * would make the early scores depend on series start, which is
    * noise, not signal.
    *
    * Determinism: the windowed aggregates are INTEGER sums (the value
    * must be integral — counts); mean/var/z are then a fixed dag of
    * double ops on those integers, so every engine computes the same
    * bits. Sample variance via the power-sum identity
    * (Σx² − (Σx)²/n)/(n−1). One shuffle on the key.
    */
  def anomalyScores(
      counts: DataFrame, key: String, step: String, value: String,
      window: Int = 7): DataFrame = {
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(step))
      .rowsBetween(-window, -1)
    val s1 = sum(col(value)).over(w).cast("double")
    val s2 = sum(col(value) * col(value)).over(w).cast("double")
    val n = count(lit(1)).over(w)
    val nd = lit(window).cast("double")
    val mean = s1 / nd
    val variance = (s2 - (s1 * s1) / nd) / (nd - 1.0)
    counts
      .select(col(key), col(step), col(value),
        n.as("_n"), mean.as("baseline_mean"), variance.as("_var"))
      .filter(col("_n") === window)
      .select(col(key), col(step), col(value),
        col("baseline_mean"),
        when(col("_var") > 0.0,
          (col(value).cast("double") - col("baseline_mean")) / sqrt(col("_var")))
          .otherwise(lit(null).cast("double")).as("z"))
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

  /** Trailing exponentially-weighted moving average with α = 1/2,
    * bit-exact across engines: the value is quantized to integer
    * cents, the window's weighted sum uses powers of two (weight of
    * the i-th oldest of m rows = 2^i — a pure bit-shift, no float
    * pow), and the normalizer 2^m − 1 makes the weights sum to 1.
    * `ewma = Σ centsᵢ·2^i / (2^m − 1)` is one integer sum and ONE
    * IEEE division — no accumulation-order dependence anywhere, so
    * the result is identical at any parallelism AND recomputable by
    * the SQL oracle (float EWMAs are neither). The window is capped
    * at `k` rows, so the weighted sum stays within Long for any
    * realistic magnitude (cents·2^(k−1) with k = 32 ⇒ values up to
    * ~2^31 cents are safe).
    *
    * One shuffle (key window); bounded per-row state (k longs).
    */
  def ewmaDyadic(
      df: DataFrame, key: Column, order: Seq[Column], value: Column,
      k: Int = 32): DataFrame = {
    require(k >= 1 && k <= 62, "window must fit long shifts")
    val w = Window.partitionBy(key).orderBy(order: _*).rowsBetween(-(k - 1), 0)
    val cents = floor(value * 100).cast("long")
    df
      .withColumn("_w", collect_list(cents).over(w))
      .select(
        key.as("key"),
        order.last.as("ord"),
        size(col("_w")).cast("long").as("n_window"),
        expr("aggregate(transform(_w, (x, i) -> shiftleft(x, i)), 0L, (a, x) -> a + x)")
          .as("ewma_num"))
      .withColumn(
        "ewma",
        col("ewma_num").cast("double")
          / (expr("shiftleft(CAST(1 AS BIGINT), CAST(n_window AS INT))") - lit(1L))
              .cast("double"))
  }
}
