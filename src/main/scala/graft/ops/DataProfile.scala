package graft.ops

import org.apache.spark.sql.{DataFrame}
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
}
