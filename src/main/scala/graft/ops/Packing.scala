package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents into
  * fixed-budget training sequences (next-fit, in a deterministic
  * order) so short documents don't waste context-window tokens as
  * padding.
  *
  * Scale shape: one shuffle keyed by `group` (hash partition), then
  * an EXTERNAL sort within partitions (`sortWithinPartitions` spills;
  * no per-group in-memory materialization, unlike
  * groupByKey+sortBy-in-heap) and a single streaming pass that keeps
  * O(1) state (current group, running size, sequence counter). Groups
  * never split across partitions, so the packing is identical at any
  * parallelism.
  *
  * Next-fit (not first-fit/best-fit) is the streaming-friendly
  * packing every large corpus pipeline uses: one pass, no bin
  * lookback, deterministic. A document larger than the budget gets a
  * sequence of its own (the downstream tokenizer truncates).
  */
object Packing {

  /** Pack rows into sequences per `group`, visiting rows in `order`,
    * closing a sequence when adding the next row would exceed
    * `budget` (sum of `size`). Returns (grp, ord, sz, seq_id).
    */
  def nextFit(
      df: DataFrame,
      group: Column,
      order: Column,
      size: Column,
      budget: Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(
        group.cast("string").as("grp"),
        order.cast("long").as("ord"),
        size.cast("long").as("sz"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("ord"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curGrp: String = null
        var acc = 0L
        var seq = 0L
        it.map { case (g, o, sz) =>
          if (g != curGrp) { curGrp = g; seq = 0L; acc = sz }
          else if (acc + sz > budget) { seq += 1L; acc = sz }
          else acc += sz
          (g, o, sz, seq)
        }
      }
      .toDF("grp", "ord", "sz", "seq_id")
  }

  /** Length-bucketed batch assembly (dynamic batching): group rows
    * into integer length buckets (`size div bucketWidth` — sequences
    * of similar length batch together so per-batch padding waste is
    * bounded by `bucketWidth`), then number batches of `batchSize`
    * inside each bucket by a deterministic order. Padding waste per
    * row = bucket ceiling − size, reported so the cost of the
    * bucketing config is measurable (Σ waste / Σ size is the padding
    * overhead a trainer pays).
    *
    * One shuffle: the per-bucket window. Bucket count is small
    * (maxLen/bucketWidth), but each bucket's rows can be many — the
    * window sorts within the bucket partition; for corpora where one
    * bucket dominates, widen shuffle partitions or sub-salt the
    * bucket key upstream.
    */
  def lengthBuckets(
      df: DataFrame, id: Column, size: Column,
      bucketWidth: Long, batchSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (sz-1) div w, not sz div w: an exactly-full sequence pads to
    // its own length (waste 0), not to the next boundary. Requires
    // sz >= 1 (sz-1 must stay nonnegative — Spark `div` truncates
    // toward zero where DuckDB floors, so negatives would diverge).
    val rows = df.select(id.as("id"), size.cast("long").as("sz"))
      .withColumn("bucket", expr(s"(sz - 1) div $bucketWidth"))
    val rn = row_number()
      .over(Window.partitionBy(col("bucket")).orderBy(col("sz"), col("id")))
    rows
      .withColumn("rn", rn.cast("long"))
      .select(
        col("id"), col("sz"), col("bucket"),
        expr(s"(rn - 1) div $batchSize").as("batch_id"),
        ((col("bucket") + 1) * bucketWidth - col("sz")).as("pad_waste"))
  }
}
