package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Differentially-private release primitives for training-data
  * pipelines: the aggregate a curation job can PUBLISH (per-source
  * document counts, per-language mix, contamination tallies) without
  * leaking any single document's presence.
  *
  * The mechanism is the discrete Laplace (two-sided geometric) with
  * p = 1/2, realized WITHOUT floating-point sampling: noise =
  * G₁ − G₂ where each Gᵢ ~ Geometric(1/2) is the TRAILING-ONES count
  * of a 53-bit SplitMix64 draw — every bit of a uniform word is an
  * independent fair coin, so "count leading successes" IS the inverse
  * CDF of Geometric(1/2), in pure integer bit-ops. No `ln`, no
  * rejection loop, no RNG state: the draw is a function of
  * (group key, salt), so the release is deterministic, engine-exact
  * (a DuckDB oracle replays it bit-for-bit) and reproducible on any
  * cluster — while remaining unpredictable to anyone without the
  * salt, which is the secret of the mechanism exactly as the seed of
  * a seeded Laplace sampler would be.
  *
  * Privacy: counts have sensitivity 1 and discrete-Laplace(p) noise
  * gives ε = ln(1/p); p = 1/2 fixes ε = ln 2 ≈ 0.69 per release.
  * Tighter ε needs smaller p (more noise) — callers composing many
  * releases should account ε per the usual composition rules. The
  * truncation at 53 trailing ones shifts total variation by < 2⁻⁵²,
  * far below any practical δ.
  *
  * Scale shape: ONE map-combined count aggregation (the corpus
  * never shuffles raw rows — partial counts combine map-side), then
  * the noise projection runs map-only on the groups-sized frame.
  */
object Privacy {

  /** Geometric(1/2) draw from a 64-bit hash column: the trailing-ones
    * count of the top 53 bits. trailing-ones(v) = trailing-zeros(v+1),
    * and the lowest set bit of w is `w & -w`, so the count is
    * bit_count((w & -w) − 1) — integer ops both engines share.
    * The >>> 11 keeps w = v + 1 overflow-free (ANSI mode) and matches
    * the repo-wide 53-bit splitmix fraction convention.
    */
  private def geometric(hash64: Column): Column = {
    val w = shiftrightunsigned(hash64, 11) + lit(1L)
    bit_count(w.bitwiseAND(-w) - lit(1L)).cast("long")
  }

  /** ε = ln 2 differentially-private group counts.
    *
    * Output: (key, n, noise, n_dp) — `n` and `noise` are included so
    * the correctness gate (and an auditor holding the salt) can check
    * the mechanism end-to-end; a production release selects
    * `(key, n_dp)` only, since publishing `n` would defeat the
    * mechanism. `n_dp` may be negative (noise is two-sided);
    * consumers conventionally clamp at read time — the release
    * itself must NOT clamp, post-processing is the consumer's right
    * and clamping inside the mechanism would bias sums.
    *
    * The noise seed is splitmix64(fnv1a(key) XOR salt·2+i): keyed by
    * the GROUP, not the rows, so re-running the release on the same
    * partition layout, cluster size, or row order reproduces the same
    * published numbers — and two groups collide only on an fnv1a
    * collision (2⁻⁶⁴).
    */
  def dpCounts(df: DataFrame, key: Column, salt: Long): DataFrame = {
    val counts = df.groupBy(key.cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val h = F.fnvText(col("key"))
    val g1 = geometric(F.splitmix64(h.bitwiseXOR(lit(salt * 2 + 1))))
    val g2 = geometric(F.splitmix64(h.bitwiseXOR(lit(salt * 2 + 2))))
    counts
      .withColumn("noise", g1 - g2)
      .select(col("key"), col("n"), col("noise"),
        (col("n") + col("noise")).as("n_dp"))
  }
}
