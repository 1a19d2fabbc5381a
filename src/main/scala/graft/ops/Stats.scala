package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Moment statistics computed from exact decimal power sums, so the
  * result is bit-deterministic across engines and partitionings —
  * Spark's builtin `var_pop`/`corr` stream doubles in shuffle order,
  * which is irreproducible at scale. Here each partition contributes
  * exact decimal partial sums (map-side combine, one shuffle) and the
  * closed-form moments are evaluated on the merged sums in one fixed
  * double expression.
  */
object Stats {

  /** Per-key n, mean, population variance/stddev of `x`, and Pearson
    * correlation of (`x`,`y`) — all derived from exact INTEGER-unit
    * sums: inputs are quantized to `scale` fractional digits, scaled
    * to integers, and every power sum AND the cancellation-prone
    * numerators n·Σx²−(Σx)², n·Σxy−ΣxΣy are computed in exact
    * decimal(38,0) arithmetic. Only the final closed forms touch
    * doubles, each exact integer cast once — so no catastrophic
    * cancellation ever happens in floating point, and no
    * engine-specific FMA contraction of `a·b − c·d` can shift the
    * last ULP (DuckDB vs JVM disagreed by exactly 1 ULP on the
    * double formulation at sf1 magnitudes, where the products leave
    * double-exact range).
    *
    * `scale` is the decimal scale inputs are quantized to before
    * summing (default 2 — currency-style data). Inputs with more
    * fractional digits than `scale` are ROUNDED first; raise it to
    * match the data's precision.
    */
  def exactMoments(
      df: DataFrame, key: Column, x: Column, y: Column,
      scale: Int = 2): DataFrame = {
    val unit = math.pow(10, scale) // 10^scale, exact for small scales
    def u(c: Column): Column = // integer units, exact
      (c.cast(DecimalType(18, scale)) * lit(unit.toLong)).cast(DecimalType(38, 0))
    val merged = df
      .select(key.as("key"), u(x).as("xu"), u(y).as("yu"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("xu")).as("sx"),
        sum(col("xu") * col("xu")).as("sxx"),
        sum(col("yu")).as("sy"),
        sum(col("yu") * col("yu")).as("syy"),
        sum(col("xu") * col("yu")).as("sxy"))
    val nD = col("n").cast(DecimalType(38, 0))
    val nd = col("n").cast("double")
    // exact integer numerators; ONE double cast each
    val varxN = (nD * col("sxx") - col("sx") * col("sx")).cast("double")
    val varyN = (nD * col("syy") - col("sy") * col("sy")).cast("double")
    val covN = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
    merged.select(
      col("key"),
      col("n"),
      (col("sx").cast("double") / (nd * unit)).as("mean_x"),
      (varxN / (nd * nd * (unit * unit))).as("var_x"),
      sqrt(varxN / (nd * nd * (unit * unit))).as("std_x"),
      (covN / (sqrt(varxN) * sqrt(varyN))).as("corr_xy"))
  }

  /** Order-independent table fingerprint for cross-system
    * reconciliation (the reference's loaded-count validation, ref
    * 38-42, upgraded to content equality): per-group row count and
    * 64-bit XOR of a caller-supplied row hash, with a ROLLUP grand
    * total. XOR is commutative/associative, so the checksum is
    * bit-identical at any partitioning — map-side partial aggregation,
    * one shuffle on the group key, a few bytes of state per group.
    * Two 100 TB tables compare by exchanging O(groups) rows.
    */
  /** Equi-width histogram in pure integer math: the value is floored
    * to a long, then integer-divided by `binWidth` — every step
    * bit-exact on any engine (no double division whose rounding could
    * shift an edge value across a bin boundary). One hash aggregation
    * with map-side partials; bins arrive sorted nowhere — order is
    * the consumer's concern. Values are assumed non-negative (integer
    * division = floor there).
    */
  def histogram(df: DataFrame, value: Column, binWidth: Long): DataFrame =
    df.select(floor(value).cast("long").as("_v"))
      .groupBy(expr(s"_v div $binWidth").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(col("_v")).as("v_min"),
        max(col("_v")).as("v_max"))
      .withColumn("bin_lo", col("bin") * binWidth)

  /** Equi-depth (quantile) binning — the feature-engineering
    * bucketizer: `bins`-way ntile over a TOTAL order (value +
    * unique tiebreak, so tied values split deterministically and the
    * result is engine-exact), summarized per (key, bin) as count +
    * value range. Both Spark and DuckDB implement ntile with the
    * same floor-split rule (earlier tiles take the remainder), so
    * the bin boundaries match bit-for-bit.
    *
    * Shape: one shuffle on the key for the window; the summary
    * aggregation then groups by (key, bin) — a subset of rows per
    * key, map-side combinable. At 100 TB, keys must be reasonably
    * numerous (per-key windows sort within a partition); for ONE
    * global key use `q_percentiles`-style interpolated quantile cuts
    * instead.
    */
  def quantileBins(
      df: DataFrame, key: Column, value: Column, tiebreak: Column,
      bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(key.as("_key"), value.as("_v"), tiebreak.as("_t"))
      .withColumn("bin",
        ntile(bins).over(
          Window.partitionBy(col("_key")).orderBy(col("_v"), col("_t")))
          .cast("long"))
      .groupBy(col("_key").as("key"), col("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(col("_v")).as("lo"),
        max(col("_v")).as("hi"))
  }

  /** Per-key IQR outlier report: exact interpolated quartiles (the
    * same bit-exact `percentile` as `q_percentiles`), Tukey fences at
    * 1.5·IQR, and counts below/above the fences.
    *
    * Shape: one aggregation for per-key quartiles, then the fences
    * join BACK to the data on the key — the fence frame is
    * key-cardinality-sized, so the join broadcasts and the data
    * stream is never shuffled a second time; the final count
    * re-aggregates on the same key.
    */
  def iqrOutliers(df: DataFrame, key: Column, value: Column): DataFrame = {
    val fences = df
      .groupBy(key.as("_key"))
      .agg(
        percentile(value, lit(0.25)).as("q1"),
        percentile(value, lit(0.75)).as("q3"))
      .select(
        col("_key"),
        col("q1"), col("q3"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("fence_lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("fence_hi"))
    df.select(key.as("_key"), value.as("_v"))
      .join(broadcast(fences), "_key")
      .groupBy(col("_key"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("_v") < col("fence_lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("_v") > col("fence_hi"), 1L).otherwise(0L)).as("n_above"),
        first(col("q1")).as("q1"),
        first(col("q3")).as("q3"),
        first(col("fence_lo")).as("fence_lo"),
        first(col("fence_hi")).as("fence_hi"))
      .withColumnRenamed("_key", "key")
  }

  /** Winsorization summary: clip at the exact interpolated
    * [`lo`, `hi`] quantiles per key and report the clip counts,
    * bounds, and winsorized mean. Same two-phase shape as
    * [[iqrOutliers]]: a key-cardinality bounds frame broadcast back
    * onto the stream — the data shuffles once for each of the two
    * aggregations and never sorts globally.
    *
    * The winsorized mean stays deterministic without float-sum order
    * dependence: interior values sum exactly in DECIMAL, the two
    * clipped tails contribute count × bound (one IEEE product each),
    * one final division.
    */
  def winsorize(
      df: DataFrame, key: Column, value: Column,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val bounds = df
      .groupBy(key.as("_key"))
      .agg(
        percentile(value, lit(lo)).as("b_lo"),
        percentile(value, lit(hi)).as("b_hi"))
    val interiorSum = sum(when(
      col("_v") >= col("b_lo") && col("_v") <= col("b_hi"),
      col("_v").cast(DecimalType(18, 2)))).cast("double")
    val nLo = sum(when(col("_v") < col("b_lo"), 1L).otherwise(0L))
    val nHi = sum(when(col("_v") > col("b_hi"), 1L).otherwise(0L))
    df.select(key.as("_key"), value.as("_v"))
      .join(broadcast(bounds), "_key")
      .groupBy(col("_key"))
      .agg(
        count(lit(1)).as("n"),
        nLo.as("n_clip_lo"),
        nHi.as("n_clip_hi"),
        min(col("b_lo")).as("b_lo"),
        min(col("b_hi")).as("b_hi"),
        ((interiorSum
          + nLo.cast("double") * min(col("b_lo"))
          + nHi.cast("double") * min(col("b_hi")))
          / count(lit(1)).cast("double")).as("win_mean"))
      .withColumnRenamed("_key", "key")
  }

  def checksumRollup(df: DataFrame, group: Column, rowHash: Column): DataFrame =
    df.select(group.as("grp"), rowHash.as("_h"))
      .rollup(col("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(_h)").as("xor_hash"))

  /** Per-key median absolute deviation — the robust scale estimate
    * (breakdown point 50%, vs 25% for the IQR fences). Median via the
    * same exact interpolated percentile kernel the winsorize bounds
    * use; the per-key median frame (one row per key) broadcasts back
    * for the deviation pass, so the fact table shuffles only for its
    * two percentile aggregations. |x − med| is a single IEEE
    * subtraction on exact inputs — bit-identical in any engine.
    */
  def medianAbsDev(df: DataFrame, key: Column, value: Column): DataFrame = {
    val med = df
      .groupBy(key.as("_key"))
      .agg(percentile(value, lit(0.5)).as("med"))
    df.select(key.as("_key"), value.as("_v"))
      .join(broadcast(med), "_key")
      .groupBy(col("_key"))
      .agg(
        count(lit(1)).as("n"),
        min(col("med")).as("median"),
        percentile(abs(col("_v") - col("med")), lit(0.5)).as("mad"))
      .withColumnRenamed("_key", "key")
  }

  /** Classifier threshold sweep in ONE corpus pass: bin scores to an
    * integer grid (deterministic cents, `floor(score·100) div
    * binCents` — the q_ewma quantization, identical in every engine),
    * aggregate (n, n_pos) per bin map-combined, then suffix-sum the
    * tiny bins frame so each grid threshold reports predicted
    * positives / true positives / precision / recall. The corpus
    * never shuffles per-threshold — the sweep costs one aggregation
    * regardless of grid size (vs one pass PER candidate threshold
    * naively). The suffix window runs on the bins frame (a global
    * window over ≤ a few hundred rows — explicitly fine, the
    * tokenBudgetAllocation pattern).
    *
    * Precision/recall are single IEEE divisions of exact longs.
    */
  def thresholdSweep(
      df: DataFrame, score: Column, label: Column,
      binCents: Long = 2500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // non-negative scores only: Spark `div` truncates toward zero,
    // DuckDB `//` floors — they agree on nonnegatives
    val bins = df
      .select(
        floor(score * 100).cast("long").as("_c"),
        label.cast("boolean").as("_pos"))
      .select(expr(s"_c div $binCents").as("bin"), col("_pos"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("_n"),
        sum(when(col("_pos"), 1L).otherwise(0L)).as("_np"))
    val suffix = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    bins
      .select(
        (col("bin") * binCents).as("threshold_cents"),
        sum(col("_n")).over(suffix).as("predicted_pos"),
        sum(col("_np")).over(suffix).as("true_pos"),
        sum(col("_np")).over(all).as("_allpos"))
      .select(
        col("threshold_cents"), col("predicted_pos"), col("true_pos"),
        (col("true_pos").cast("double") / col("predicted_pos").cast("double"))
          .as("prec"),
        (col("true_pos").cast("double") / col("_allpos").cast("double"))
          .as("recall"))
  }

  /** HyperLogLog distinct-count sketch (Flajolet et al. 2007)
    * expressed as a pure two-level aggregation — no custom aggregate
    * buffer needed: level 1 reduces the corpus to ≤ m register rows
    * per key (map-side combined), level 2 folds the registers. The
    * register update max(ρ) is re-expressed as min(2^(cap−ρ)) so
    * every value is a plain integer — the trailing-zero count never
    * materializes: 2^tz is isolated overflow-safely as h ^ (h & (h−1))
    * (no negation — −Long.Min overflows checked engines) and the
    * register contribution is one integer division 2^43 div 2^tz,
    * floored to 1 at the ρ cap. The harmonic-mean denominator
    * Σ 2^(cap−ρ_j) is then an exact ≤ 2^53 long — integer-exact,
    * order-independent, and its one double cast is exact, so the raw
    * estimate is bit-identical across engines and partitionings.
    *
    * Returns per key: occupied-register count, the exact integer
    * denominator, and the raw HLL estimate α·m²·2^44/denominator.
    * The small-range (linear counting) correction needs ln —
    * transcendental, engine-varying — so it is the CALLER's driver-
    * side step: apply it when n_nonzero < m and raw_est ≤ 2.5·m.
    * Sketch state is mergeable: registers of two frames merge by the
    * same (key, idx) min-contribution aggregation.
    */
  def hllDistinct(df: DataFrame, key: Column, id: Column): DataFrame =
    hllEstimate(hllRegisters(df, key, id))

  /** HLL register frame for [[hllDistinct]]-style sketches: one row
    * per (key, register) with the min-contribution value — the
    * MERGEABLE representation (two frames merge by the same
    * (key, idx) min aggregation; union-distinct estimates come free).
    */
  def hllRegisters(df: DataFrame, key: Column, id: Column): DataFrame = {
    val p = 9
    df.select(key.as("_key"), graft.functions.F.splitmix64(id).as("_h"))
      .select(
        col("_key"),
        shiftrightunsigned(col("_h"), 64 - p).as("_idx"),
        when(col("_h") === 0L, lit(1L))
          .otherwise(greatest(
            expr("8796093022208 div (_h ^ (_h & (_h - 1)))"), lit(1L)))
          .as("_c"))
      .groupBy(col("_key"), col("_idx"))
      .agg(min(col("_c")).as("_mc"))
  }

  /** Fold merged HLL registers to (n_nonzero, denominator, raw_est) —
    * the second level of [[hllDistinct]], exposed so pre-merged
    * register frames (e.g. a union of cohorts) can be estimated.
    */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val m = 512L
    val alpha = 0.7197831133217303
    regs
      .groupBy(col("_key"))
      .agg(count(lit(1)).as("n_nonzero"), sum(col("_mc")).as("_s"))
      .select(
        col("_key").as("key"), col("n_nonzero"),
        (col("_s") + (lit(m) - col("n_nonzero")) * lit(1L << 44))
          .as("denominator"),
        (lit(alpha) * (lit(4.611686018427388e18)
          / (col("_s") + (lit(m) - col("n_nonzero")) * lit(1L << 44))
            .cast("double"))).as("raw_est"))
  }

  /** Distribution drift between two cohorts of one stream — the
    * monitoring check before a data mix changes silently. Per bin:
    * cohort counts, cohort shares, and a log-free chi-square
    * contribution ((p_a − p_b)² / pooled share) — PSI's ln(p_a/p_b)
    * is a transcendental whose last ulp differs across engines, so
    * the statistic here sticks to share differences: every operand
    * is an exact integer count cast to double (≤2^53 — exact), and
    * the contribution is a fixed IEEE chain, bit-identical anywhere.
    *
    * ONE map-combined aggregation over the stream (conditional counts
    * per bin); the totals frame is a single row broadcast back onto
    * the bins frame. Nothing shuffles twice.
    */
  def driftChi2(df: DataFrame, bin: Column, inCohortA: Column): DataFrame = {
    val bins = df
      .select(bin.as("bin"), inCohortA.cast("boolean").as("_a"))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("n_b"))
    val totals = bins.agg(
      sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    val pa = col("n_a").cast("double") / col("tot_a").cast("double")
    val pb = col("n_b").cast("double") / col("tot_b").cast("double")
    val pooled = (col("n_a") + col("n_b")).cast("double") /
      (col("tot_a") + col("tot_b")).cast("double")
    bins.join(broadcast(totals))
      .select(
        col("bin"), col("n_a"), col("n_b"),
        pa.as("p_a"), pb.as("p_b"),
        ((pa - pb) * (pa - pb) / pooled).as("chi2_contrib"))
  }

  /** Per-key Pareto coverage: the minimal prefix of members (by
    * descending weight, id tiebreak) whose weights cover `num/den` of
    * the key's total. The cutoff test compares den·cum_before <
    * num·total in exact DECIMAL — integer-scaled cross-multiplication
    * instead of a share division, so no float rounding can flip a
    * boundary row. One window pass per key partition; no global
    * (empty-PARTITION BY) window.
    */
  def paretoCoverage(
      df: DataFrame, key: Column, id: Column, weight: Column,
      num: Int = 4, den: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = df.select(key.as("key"), id.as("id"),
      weight.cast(DecimalType(18, 2)).as("wt"))
    val ord = Window.partitionBy(col("key"))
      .orderBy(col("wt").desc, col("id"))
    val cumBefore = sum(col("wt"))
      .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
      col("wt")
    val total = sum(col("wt")).over(Window.partitionBy(col("key")))
    w.select(
        col("key"), col("id"), col("wt").cast("double").as("weight"),
        row_number().over(ord).cast("long").as("rank"),
        (cumBefore * den < total * num).as("_keep"))
      .filter(col("_keep")).drop("_keep")
  }

  /** EXACT per-group weighted percentiles — each requested
    * `(name, num, den)` fraction emits `name` = min v with
    * den·cum ≥ num·Σw over the (v, tie…) ordering (defaults:
    * quartiles p25/p50/p75). A NULL group key is one ordinary group
    * (the key rides in a one-field struct through the internal
    * equi-joins, where struct equality treats null fields as equal).
    * This is the two-phase decomposition that survives FEW LARGE
    * groups, where `Window.partitionBy(group)` collapses to
    * one-sorting-task-per-group:
    *
    *  1. coarse bucket each row by ~B approximate per-group value
    *     boundaries (`percentile_approx` + a binary-search codegen
    *     placement — boundary QUALITY only affects balance, never
    *     correctness: placement is monotone and ties share a bucket);
    *  2. per-(group, bucket) weight partials, prefix-summed by a tiny
    *     window over ≤B rows per group → each bucket's global weight
    *     offset + the group total;
    *  3. the exact ordered cumulative scan runs ONLY inside the ≤3
    *     threshold-crossing buckets (≈3/B of each group), with the
    *     bucket's offset carried in — the result is bit-identical to
    *     a full per-group sorted scan.
    *
    * Parallelism is groups×B for the heavy phases instead of groups;
    * no task ever sorts more than one bucket of one group.
    */
  def weightedPercentiles(
      df: DataFrame, group: Column, value: Column, weight: Column,
      tie: Seq[Column], buckets: Int = 64,
      percentiles: Seq[(String, Int, Int)] =
        Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4))): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(percentiles.nonEmpty, "percentiles must be non-empty")
    percentiles.foreach { case (n, num, den) =>
      require(den > 0 && num >= 0 && num <= den,
        s"percentile $n: need 0 ≤ num ≤ den with den > 0, got $num/$den")
    }
    val tieNames = tie.indices.map(i => s"_t$i")
    // the group key rides inside a one-field struct: struct equality
    // treats null fields as equal, so the equi-joins below ("_g" on
    // bounds / cand / tot) keep a NULL group as one ordinary group —
    // matching the Window.partitionBy semantics this decomposition
    // replaces (a bare null key would silently drop out of every join)
    val base = df.select(
      (struct(group.as("k")).as("_g") +: value.as("_v") +:
        weight.cast("long").as("_w") +:
        tie.zip(tieNames).map { case (c, n) => c.as(n) }): _*)
    val probs = (1 until buckets).map(_.toDouble / buckets)
    // low sketch accuracy on purpose: boundaries only steer bucket
    // BALANCE — a skewed boundary costs a bigger threshold-bucket
    // scan, never a wrong answer — and a tight sketch costs more than
    // it saves (accuracy 10000 made the sketch pass the dominant cost)
    val bounds = base.groupBy(col("_g")).agg(
      percentile_approx(
        col("_v").cast("double"), array(probs.map(lit): _*), lit(100)).as("_bs"))
    val withB = base.join(broadcast(bounds), "_g")
      .withColumn("_b", graft.functions.F.bucketIndex(col("_v").cast("double"), col("_bs")))
      .drop("_bs")
    val parts = withB.groupBy(col("_g"), col("_b")).agg(sum(col("_w")).as("_bw"))
    val pref = parts
      .withColumn("_cumEnd",
        sum(col("_bw")).over(Window.partitionBy(col("_g")).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_off", col("_cumEnd") - col("_bw"))
    val tot = parts.groupBy(col("_g")).agg(sum(col("_bw")).as("total_w"))
    // threshold-crossing buckets; `≤` (not `<`) on the offset side so a
    // boundary-equality crossing keeps BOTH adjacent buckets and an
    // all-zero-weight group (Σw = 0) degenerates to scanning every
    // bucket — exactly the full-window semantics. The SAME (num, den)
    // fractions drive this filter and the final aggregate — one
    // parameter, so the two predicates cannot drift apart.
    val crossing = percentiles
      .map { case (_, num, den) =>
        col("_cumEnd") * den >= col("total_w") * num &&
          col("_off") * den <= col("total_w") * num
      }
      .reduce(_ || _)
    val cand = pref.join(tot, "_g")
      .filter(crossing)
      .select(col("_g"), col("_b"), col("_off"))
    val ow = Window.partitionBy(col("_g"), col("_b"))
      .orderBy((col("_v") +: tieNames.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outs = percentiles.map { case (name, num, den) =>
      min(when(col("_cum") * den >= col("total_w") * num, col("_v"))).as(name)
    } :+ max(col("total_w")).as("total_w")
    withB.join(cand, Seq("_g", "_b"))
      .withColumn("_cum", col("_off") + sum(col("_w")).over(ow))
      .join(tot, "_g")
      .groupBy(col("_g"))
      .agg(outs.head, outs.tail: _*)
      .withColumn("_g", col("_g.k")) // unwrap the null-safe struct
  }

  /** Smoothed target encoding (the m-estimate a tabular-ML feature
    * pipeline applies to high-cardinality categoricals):
    * enc(g) = (sum_y(g) + m·prior) / (n_g + m) with prior = S/N the
    * global target mean — a rare category shrinks toward the prior,
    * a frequent one trusts its own mean, and unseen-at-inference
    * categories default to the prior the output carries.
    *
    * Ratios are DOUBLE with FIXED evaluation order (prior first, then
    * the numerator sum, then one divide — the [[qualityScore]]
    * oracle-parity discipline), so two engines compute the encoding
    * bit-identically; counts and target sums stay exact integers.
    *
    * Scale shape: one map-combined (count, sum) aggregation to the
    * category-cardinality frame, which MATERIALIZES ONCE
    * (localCheckpoint) so the 1-row global total aggregates over the
    * materialized rows instead of re-running the corpus aggregation,
    * then rides back as a broadcast cross join.
    * Output: (category, n, sum_y, encoding).
    */
  def targetEncode(
      df: DataFrame, category: Column, target: Column,
      m: Long = 10L): DataFrame = {
    require(m >= 0, s"smoothing m must be >= 0, got $m")
    val g = df
      .select(category.cast("string").as("category"),
        target.cast("long").as("_y"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("sum_y"))
      .localCheckpoint()
    val tot = g.agg(sum(col("n")).as("_N"), sum(col("sum_y")).as("_S"))
    g.crossJoin(broadcast(tot))
      .select(col("category"), col("n"), col("sum_y"),
        ((col("sum_y").cast("double") +
          lit(m.toDouble) * (col("_S").cast("double") / col("_N").cast("double"))) /
          (col("n") + lit(m)).cast("double")).as("encoding"))
  }
}
