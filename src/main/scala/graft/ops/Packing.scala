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
}
