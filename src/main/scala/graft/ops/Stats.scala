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
    * correlation of (`x`,`y`) — all derived from exact decimal
    * sums: var = (n·Σx² − (Σx)²)/n², corr = (n·Σxy − ΣxΣy)/√(…)·√(…).
    *
    * `scale` is the decimal scale inputs are quantized to before
    * summing (default 2 — currency-style data). Inputs with more
    * fractional digits than `scale` are ROUNDED first; raise it to
    * match the data's precision.
    */
  def exactMoments(
      df: DataFrame, key: Column, x: Column, y: Column,
      scale: Int = 2): DataFrame = {
    def d(c: Column): Column = c.cast(DecimalType(18, scale))
    val merged = df
      .groupBy(key)
      .agg(
        count(lit(1)).as("n"),
        sum(d(x)).as("sx"),
        sum(d(x) * d(x)).as("sxx"),
        sum(d(y)).as("sy"),
        sum(d(y) * d(y)).as("syy"),
        sum(d(x) * d(y)).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val sy = col("sy").cast("double")
    val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    merged.select(
      key.as("key"),
      col("n"),
      (sx / n).as("mean_x"),
      ((n * sxx - sx * sx) / (n * n)).as("var_x"),
      sqrt((n * sxx - sx * sx) / (n * n)).as("std_x"),
      ((n * sxy - sx * sy)
        / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_xy"))
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
  def checksumRollup(df: DataFrame, group: Column, rowHash: Column): DataFrame =
    df.select(group.as("grp"), rowHash.as("_h"))
      .rollup(col("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(_h)").as("xor_hash"))
}
