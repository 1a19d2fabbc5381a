package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared two-pass ranged-rank kernel behind the chunk-parallel
  * forms of the per-key ordered operators (r13): the window form of
  * "rank within key by order" sorts each key in ONE task, so a single
  * 10 TB key is one sorting partition. This kernel RANGE-partitions
  * on (key, order) — a giant key spreads over every chunk — and
  * recovers the exact global rank because rank state composes by
  * ADDITION: pass 1 counts each chunk-run per key (control-plane
  * rows), the driver prefix-sums them in chunk order, pass 2 emits
  * offset + local position. The same machinery as
  * [[Packing.nextFit]]'s transfer functions, degenerate case
  * (consumers: [[graft.llm.Sampling.kfoldAssignChunked]],
  * [[Packing.lengthBucketsChunked]]).
  */
object Chunked {

  /** Exact 0-based rank of each row within `key` ordered by
    * (o1, o2), at chunk parallelism. `df` must have exactly the
    * columns (key: string, o1: long, o2: long) and (o1, o2) must
    * order each key's rows uniquely (the window form's assumption
    * too). Output: (key, o1, o2, rnk) — bit-equal to
    * row_number() − 1 over (partitionBy key, orderBy o1, o2).
    * `chunks` = 0 uses spark.sql.shuffle.partitions;
    * `materializeInput` as in [[Packing.nextFit]] (the range
    * exchange's sampling job re-executes an expensive upstream;
    * pass false ONLY over a deterministic, already-materialized
    * input — the two kernel passes must see identical partition
    * contents, same contract as nextFit's).
    *
    * DRIVER-MEMORY CONTRACT (r13 advice): pass 1 collects one
    * (chunk, key, count) run per key per chunk — the control plane
    * is O(distinct keys crossing chunks) on the DRIVER. The intended
    * callers' keys are low-cardinality by construction (sampling
    * strata, length buckets); do NOT point this kernel at a
    * high-cardinality key — use the plain window form there, whose
    * per-key sort task is exactly what a high-cardinality key makes
    * cheap. The same note applies to [[Packing.nextFit]]'s
    * SegSummary collect.
    */
  def rangedRank(
      df: DataFrame, chunks: Int = 0,
      materializeInput: Boolean = true): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val n =
      if (chunks > 0) chunks
      else s.conf.get("spark.sql.shuffle.partitions").toInt
    require(df.columns.length == 3,
      s"rangedRank: expected exactly 3 columns (key, o1, o2), got " +
        s"${df.columns.length} (${df.columns.mkString(", ")})")
    val Seq(kc, c1, c2) = df.columns.toSeq
    val proj = df.select(
      col(kc).cast("string").as("k"),
      col(c1).cast("long").as("o1"),
      col(c2).cast("long").as("o2"))
    val sorted = (if (materializeInput) proj.localCheckpoint() else proj)
      .repartitionByRange(n, col("k"), col("o1"), col("o2"))
      .sortWithinPartitions(col("k"), col("o1"), col("o2"))
      .as[(String, Long, Long)]
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      val runs = List.newBuilder[(Int, String, Long)]
      var cur: String = null
      var c = 0L
      var seen = false
      it.foreach { case (k, _, _) =>
        if (!seen || k != cur) {
          if (seen) runs += ((pid, cur, c))
          cur = k; c = 0L; seen = true
        }
        c += 1L
      }
      if (seen) runs += ((pid, cur, c))
      runs.result().iterator
    }.collect()
    val offsets = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    counts.groupBy(_._2).foreach { case (k, runs) =>
      var acc = 0L
      runs.sortBy(_._1).foreach { case (pid, _, c) =>
        offsets((pid, k)) = acc
        acc += c
      }
    }
    val bc = s.sparkContext.broadcast(offsets.toMap)
    rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: String = null
      var pos = 0L
      var seen = false
      it.map { case (k, o1, o2) =>
        if (!seen || k != cur) {
          cur = k; seen = true
          pos = bc.value.getOrElse((pid, k),
            // a key present in pass 2 but absent from pass 1's
            // offsets means the two passes saw different partition
            // contents — a nondeterministic upstream under
            // materializeInput = false (r13 advice: fail loudly, not
            // with a bare NoSuchElementException)
            throw new IllegalStateException(
              s"rangedRank: no pass-1 offset for key '$k' in chunk " +
                s"$pid — the input re-evaluated differently between " +
                "the two kernel passes; materializeInput=false " +
                "requires a deterministic, already-materialized input"))
        }
        val r = pos
        pos += 1L
        (k, o1, o2, r)
      }
    }.toDF(kc, c1, c2, "rnk")
  }
}
