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

  /** Engine-exact additive seasonal decomposition of a per-key daily
    * count series: n = trend + seasonal + residual with a centered
    * 7-step moving-average trend and a cycle-of-7 seasonal index
    * (dow = step mod 7). The classic STL-lite — but formulated so a
    * second engine replays it BIT-EXACTLY: every cross-row aggregation
    * runs on INTEGERS (window sum7/cnt7; the seasonal numerator sums
    * the scaled detrend 7·n − sum7 over full-window steps only, where
    * it equals 7·(n − trend) exactly), and every double is either one
    * exact-integer divide (trend = sum7/cnt7, seasonal =
    * s_num/(7·s_cnt)) or a fixed-order subtraction of those
    * (residual) — floating sums never cross rows, so engine
    * summation order cannot matter.
    *
    * Scale shape: one map-combined count to the (key, step) frame —
    * everything after is calendar-sized, not corpus-sized: one
    * range-window pass per key and a key×7 seasonal frame joined back
    * broadcast. Boundary steps (window short of 7) get the shortened
    * trend and are excluded from the seasonal fit.
    * Output: (key, step, dow, n, trend, seasonal, residual).
    */
  def seasonalDecompose(
      df: DataFrame, key: Column, step: Column): DataFrame = {
    val daily = df
      .select(key.cast("string").as("key"), step.cast("long").as("step"))
      .groupBy(col("key"), col("step"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("key")).orderBy(col("step"))
      .rangeBetween(-3, 3)
    val trended = daily
      .withColumn("sum7", sum(col("n")).over(w))
      .withColumn("cnt7", count(lit(1)).over(w))
      .withColumn("dow", (col("step") % 7).cast("int"))
    val seasonal = trended
      .filter(col("cnt7") === 7)
      .groupBy(col("key"), col("dow"))
      .agg(sum(col("n") * 7 - col("sum7")).as("s_num"),
        count(lit(1)).as("s_cnt"))
    trended
      .join(broadcast(seasonal), Seq("key", "dow"), "left")
      .select(
        col("key"), col("step"), col("dow"), col("n"),
        (col("sum7").cast("double") / col("cnt7").cast("double"))
          .as("trend"),
        coalesce(
          col("s_num").cast("double") / (col("s_cnt") * 7).cast("double"),
          lit(0.0)).as("seasonal"))
      .withColumn("residual",
        col("n").cast("double") - col("trend") - col("seasonal"))
  }
}
