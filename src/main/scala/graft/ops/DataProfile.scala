package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the "what did the extract actually bring in"
  * step every ETL run wants before loading (the reference eyeballs
  * row counts; at 100 TB you want nulls/cardinality per column).
  *
  * ONE aggregation pass computes every column's counts simultaneously
  * (a single scan + single reduce — not one job per column), then a
  * literal explode reshapes wide → long. count_distinct is exact; at
  * extreme cardinalities swap in approx_count_distinct via `approx`.
  */
object DataProfile {

  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        (if (approx) approx_count_distinct(col(c)) else count_distinct(col(c)))
          .as(s"_nd_$c"))
    }
    val wide = df.agg(count(lit(1)).as("_n_rows"), aggs: _*)
    val entries = cols.map(c =>
      struct(
        lit(c).as("column"),
        col("_n_rows").as("n_rows"),
        (col("_n_rows") - col(s"_nn_$c")).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct")))
    wide
      .select(explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"), col("p.n_distinct"))
  }

  /** Join/shuffle-key SKEW profile: per group, the distribution of
    * per-key row counts — key cardinality, the heaviest key's count
    * and share, and exact interpolated p50/p90/p99 of the frequency
    * distribution. This is the report that decides whether a key
    * needs salting ([[Skew]]) or AQE skew-join before the shuffle is
    * ever run; a top_share near 1 means one key holds the partition.
    *
    * Shape: one (group, key) aggregation with map-side combine, then
    * a group-level rollup over key-cardinality rows. The percentile
    * is the same exact interpolated kernel `q_percentiles` proves
    * bit-equal to DuckDB's quantile_cont.
    */
  def keySkew(df: DataFrame, group: Column, key: Column): DataFrame =
    df.select(group.as("grp"), key.as("k"))
      .groupBy(col("grp"), col("k"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"),
        percentile(col("n"), lit(0.5)).as("p50"),
        percentile(col("n"), lit(0.9)).as("p90"),
        percentile(col("n"), lit(0.99)).as("p99"))
      .withColumn("top_share",
        col("max_n").cast("double") / col("n_rows").cast("double"))
}
