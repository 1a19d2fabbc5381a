package graft

import org.apache.spark.sql.functions._

/** Pins the safety envelope of the ObjectHashAggregate fallback
  * threshold the Bench/Verify/Profile sessions raise to 65536 (the
  * 128-key default silently demoted EVERY collapse / collect_list
  * task to sort-based aggregation — r17, measured
  * numTasksFallBacked == numTasks).
  *
  * Sizing rule the 65536 encodes (documented in Bench.scala): the
  * threshold bounds the number of live BUFFER ENTRIES, whose fixed
  * overhead is ~128 B/entry beyond the buffered values — 65536
  * entries ≈ 8 MiB of overhead per task, negligible against any sane
  * per-task memory budget. The buffered VALUES are bounded by the
  * task's input-split bytes regardless of the threshold (every input
  * row lands in exactly one buffer), so the knob cannot protect
  * against a skewed giant bucket either way — sane input splits do.
  * Both failure directions are exercised here under the exact Bench
  * value:
  *
  *  - MORE distinct keys in one task than the threshold: the
  *    operator must fall back to sort-based aggregation and still
  *    produce exact results (the fallback path is correctness-
  *    neutral, only slower);
  *  - ONE giant bucket (heavy skew) far under the key threshold: the
  *    single collect_list buffer holds the task's whole input and
  *    must aggregate exactly (the threshold is no guard here — the
  *    state was always input-split-bounded).
  */
class ObjAggFallbackSpec extends SparkSpec {

  private def withThreshold[T](n: Int)(f: => T): T = {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try f
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("above-threshold distinct keys in one task: sort-based fallback is exact") {
    withThreshold(65536) {
      // 100_000 distinct keys forced into ONE task — crosses the 64k
      // buffer bound mid-task, so the operator falls back
      val df = spark.range(200000).repartition(1)
        .selectExpr("id % 100000 AS k", "id AS v")
        .groupBy(col("k"))
        .agg(collect_list(col("v")).as("vs"))
        .select(col("k"), size(col("vs")).as("n"),
          aggregate(col("vs"), lit(0L), (a, x) => a + x).as("s"))
      val rows = df.collect()
      assert(rows.length == 100000)
      // every key k holds exactly {k, k + 100000}
      assert(rows.forall(_.getInt(1) == 2))
      assert(rows.forall(r => r.getLong(2) == 2 * r.getLong(0) + 100000))
    }
  }

  test("skewed giant bucket far under the key threshold aggregates exactly") {
    withThreshold(65536) {
      // one key owns 200_000 values in one task: a single buffer the
      // size of the whole input split — the key-count threshold never
      // trips, the buffer is input-bounded, the result exact
      val row = spark.range(200000).repartition(1)
        .selectExpr("0L AS k", "id AS v")
        .groupBy(col("k"))
        .agg(collect_list(col("v")).as("vs"))
        .select(size(col("vs")).as("n"),
          aggregate(col("vs"), lit(0L), (a, x) => a + x).as("s"))
        .head()
      assert(row.getInt(0) == 200000)
      assert(row.getLong(1) == 199999L * 200000L / 2)
    }
  }

  test("graft's FirstAny collapse stays exact across the fallback boundary") {
    // the repo's own ObjectHashAggregate user: identical results with
    // the demoting default (128) and the raised Bench value (65536)
    val docs = spark.range(3000)
      .selectExpr("id AS doc_id", "concat('txt', id % 1000) AS text")
    def classes(th: Int) = withThreshold(th) {
      graft.llm.Dedup.contentClasses(docs, col("doc_id"), col("text"))
        .classes.select(col("rep"), col("n"), col("_t")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    }
    assert(classes(128).toSeq == classes(65536).toSeq)
  }
}
