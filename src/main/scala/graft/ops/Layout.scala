package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton) interleaving of two
  * dimension columns, so that sorting/range-partitioning by ONE key
  * gives file-level min-max locality on BOTH dimensions — the layout
  * that makes parquet row-group skipping work for queries filtering
  * either (or both) dimensions. At 100 TB this is the difference
  * between a full scan and reading a few percent of files for a
  * two-dimensional predicate.
  */
object Layout {

  /** Morton/Z-order key: interleave the low `bits` bits of `a` (even
    * positions) and `b` (odd positions). Inputs must already be
    * non-negative dimension indexes (bucketize/rank first); only the
    * low `bits` bits participate. Built from shift/mask primitives —
    * whole-stage-codegen, map-only, engine-replicable (the oracle
    * computes the identical bit sum).
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Physically cluster `df` by the Z-key of two dimensions: range
    * partition (so files hold contiguous Z-ranges) and sort within
    * partitions. The write path after this produces files whose
    * min-max stats are tight on BOTH `a` and `b`. Range boundaries
    * come from Spark's reservoir sampling — layout-only, so sampling
    * nondeterminism is fine here (the DATA is unchanged; only file
    * assignment varies), which is why the oracle checks
    * [[zOrderKey]] math through fixed-shift buckets instead.
    */
  def cluster(
      df: DataFrame, a: Column, b: Column,
      partitions: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("_zkey", zOrderKey(a, b, bits))
    keyed
      .repartitionByRange(partitions, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
  }

  /** Write `df` as a bucketed + per-bucket-sorted external table: the
    * hash-partitioned layout that AMORTIZES the join/agg shuffle. Two
    * tables bucketed on the same key with the same bucket count
    * sort-merge join with ZERO Exchange, and a groupBy on the bucket
    * key needs no shuffle — at 100 TB, writing the fact table
    * bucketed once turns every subsequent key-join/agg from a
    * full-data shuffle into a local merge. The per-bucket `sortBy`
    * additionally elides the merge's Sort when
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` is on
    * (post-SPARK-28632 the scan only advertises the ordering behind
    * that flag; the one-file-per-bucket precondition it needs is
    * guaranteed here by the pre-repartition). External path +
    * `saveAsTable` (bucket metadata lives in the catalog; files live
    * at `path`).
    */
  /** Every parquet file under `path` (recursive) with its mtime —
    * the "these files were NOT rewritten" verification primitive the
    * durable gates and specs share (an unchanged map across an
    * operation proves the operation's write set excluded them).
    */
  def parquetFiles(path: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator()
      .asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  def bucketWrite(
      df: DataFrame, table: String, path: String,
      buckets: Int, key: String, moreKeys: String*): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    // repartition on the bucket key first: one file per bucket, not
    // one per (task × bucket). That is what keeps the downstream
    // merge SORT-FREE (multi-file buckets lose the sortBy guarantee
    // and reintroduce a Sort) and what stops a 10k-task write from
    // spraying 10k tiny files into every bucket. repartition() and
    // bucketBy share Murmur3 hash partitioning, so the alignment is
    // exact. One shuffle at write time buys shuffle-AND-sort-free
    // joins/aggs on the key forever after.
    df.repartition(buckets, (key +: moreKeys).map(col): _*)
      .write
      .option("path", path)
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Per-Z-bucket locality stats (deterministic — buckets are fixed
    * `zkey >> (2·bits − log2Buckets)` prefixes, not sampled ranges):
    * row count and the min/max of each dimension inside the bucket.
    * Tight per-bucket dimension ranges are exactly the property that
    * makes min-max skipping effective after a Z-order write.
    */
  def zOrderStats(
      df: DataFrame, a: Column, b: Column,
      bits: Int = 16, bucketShift: Int = 24): DataFrame =
    df.select(a.as("_a"), b.as("_b"))
      .withColumn("zbucket",
        shiftright(zOrderKey(col("_a"), col("_b"), bits), bucketShift))
      .groupBy(col("zbucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("_a")).as("a_min"), max(col("_a")).as("a_max"),
        min(col("_b")).as("b_min"), max(col("_b")).as("b_max"))
}
