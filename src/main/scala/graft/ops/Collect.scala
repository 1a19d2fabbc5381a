package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Grouping / reshaping ops from the reference: per-district location
  * collection (`groupby(...).unique()`, reference `weekly alignments
  * GQL API.py:563-574`), region/district frame stacking (`pd.concat`
  * + `drop_duplicates`, 773-801), and the top-k / pivot reshapes a
  * reporting layer needs.
  */
object Collect {

  /** groupBy key → sorted distinct values joined to a string. Sorted
    * so the result is deterministic regardless of shuffle order; a
    * string so cross-engine comparison is exact.
    */
  def groupCollect(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key)
      .agg(
        array_join(sort_array(collect_set(value)), ",").as("collected"),
        count(lit(1)).as("n"))

  /** Stack two same-shaped frames and dedup — `pd.concat` +
    * `drop_duplicates`. Union is shuffle-free; the distinct is one
    * shuffle with map-side partial dedup.
    */
  def stackDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Keep-first dedup: one row per key, chosen by the minimal
    * (orderCols) tuple. Implemented as `min(struct(...))` — a hash
    * aggregation with map-side partials, which scales better than a
    * row_number window (no per-partition sort of the full data).
    */
  def keepFirst(df: DataFrame, key: Column, orderCols: Column*): DataFrame = {
    df.groupBy(key)
      .agg(min(struct(orderCols: _*)).as("_first"), count(lit(1)).as("n"))
  }

  /** Per-key top-k by explicit ordering (window row_number — needs
    * the per-key sort, used where the full ranked rows are wanted).
    */
  def topKPerKey(df: DataFrame, key: Column, k: Int, order: Column*): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
