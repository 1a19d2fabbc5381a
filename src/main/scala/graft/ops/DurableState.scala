package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DURABLE maintained state (r15, r14 verdict item 3): the last leg
  * between "gates localCheckpoint their frames" and "a deployment's
  * nightly job". The persisted scalar agg Z-state
  * ([[Incremental.stateZSum]] schema `(k, n, sum_v)`) lives as a
  * SHARD-PARTITIONED external table, and a maintenance run
  *
  *  1. reads ONLY the delta-touched shards — a PARTITION-PRUNED scan
  *     (the untouched passthrough becomes not-reading: file-level,
  *     stronger than the in-memory applies' broadcast-anti, which
  *     still scans every store row);
  *  2. re-aggregates the touched slice ∪ delta — the one shuffle is
  *     touched-shard-sized, delta-derived;
  *  3. writes back with DYNAMIC PARTITION OVERWRITE — only touched
  *     shard directories are rewritten; untouched files are
  *     byte-identical on disk (spec-pinned via the file listing).
  *
  * Shard grain, not bucket grain, on purpose: [[Layout.bucketWrite]]
  * gives zero-Exchange JOINS against the store, but `bucketBy` +
  * `saveAsTable` cannot overwrite a subset of buckets — the WRITE
  * leg of maintenance would rewrite the full table every run, which
  * is exactly what maintenance exists to avoid. A partition column
  * derived from the key hash supports both legs: literal `IN`
  * filters prune the read (the touched set collects to the driver —
  * at most `shards` ints, control-plane), and dynamic overwrite
  * prunes the write. The shard count is recorded as a table property
  * at write time so a maintenance run can never mis-shard a probe
  * (a mismatched modulus would silently drop untouched keys of a
  * rewritten partition).
  */
object DurableState {

  private val want = Seq("k", "n", "sum_v")
  private val propKey = "graft.zsum.shards"

  /** The shard of a key — xxhash64 so skewless for any key type;
    * deterministic across sessions (seed-free), which the durable
    * contract requires.
    */
  def shardOf(k: Column, shards: Int): Column =
    pmod(xxhash64(k), lit(shards.toLong)).cast("int")

  private def requireZSum(df: DataFrame, who: String): Unit =
    require(df.columns.toSeq == want,
      s"$who: frame must have the stateZSum schema " +
        s"(${want.mkString(",")}), got ${df.columns.mkString(",")}")

  /** Materialize a scalar agg Z-state as the shard-partitioned
    * external table `table` at `path`. One write-time shuffle
    * (partitionBy groups shard directories); the shard count rides a
    * table property for [[maintainZSum]].
    */
  def writeZSum(
      state: DataFrame, table: String, path: String,
      shards: Int): Unit = {
    requireZSum(state, "DurableState.writeZSum")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val s = state.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    state.withColumn("_shard", shardOf(col("k"), shards))
      .write
      .option("path", path)
      .partitionBy("_shard")
      .mode("overwrite")
      .saveAsTable(table)
    s.sql(s"ALTER TABLE `$table` SET TBLPROPERTIES " +
      s"('$propKey' = '$shards')")
  }

  /** The write-time shard count, from the table property — loud when
    * the table was not written by [[writeZSum]].
    */
  def shardsOf(spark: SparkSession, table: String): Int = {
    val prop = spark.sql(s"SHOW TBLPROPERTIES `$table`")
      .collect().find(_.getString(0) == propKey).map(_.getString(1))
    require(prop.isDefined,
      s"DurableState: table $table has no $propKey property — " +
        "not a DurableState.writeZSum table")
    prop.get.toInt
  }

  /** The state as a consumer reads it (partition column dropped). */
  def readZSum(spark: SparkSession, table: String): DataFrame =
    spark.table(table).select(col("k"), col("n"), col("sum_v"))

  /** The delta's touched shards — collected to the driver (≤ shards
    * ints; the control-plane cost that buys literal partition
    * pruning on both the read and the write).
    */
  def touchedShards(delta: DataFrame, shards: Int): Seq[Int] =
    delta.select(shardOf(col("k"), shards).as("_s")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  /** The partition-pruned touched slice: a literal `IN` filter on the
    * partition column, so the scan reads ONLY the named shard
    * directories (spec-pinned: PartitionFilters carries the IN, and
    * the scan's partition count equals the touched count).
    */
  def shardSlice(
      spark: SparkSession, table: String, shardIds: Seq[Int]): DataFrame =
    spark.table(table)
      .filter(col("_shard").isin(shardIds.map(Integer.valueOf): _*))

  /** One durable maintenance run: fold a [[Incremental.stateZSum]]
    * delta into the table at touched-shard cost and return the
    * updated state (reading the table back). Untouched shards are
    * neither read nor written; a shard whose every key drops to the
    * identity is removed outright (dynamic overwrite only replaces
    * partitions PRESENT in the written data, so emptied shards need
    * the explicit drop — silently keeping their stale files would
    * resurrect dead keys). Equality with [[Incremental.mergeZSum]] /
    * [[Incremental.applyZSum]] over the same inputs is spec-pinned.
    */
  def maintainZSum(
      spark: SparkSession, table: String, delta: DataFrame): DataFrame = {
    requireZSum(delta, "DurableState.maintainZSum")
    val shards = shardsOf(spark, table)
    val touched = touchedShards(delta, shards)
    if (touched.isEmpty) return readZSum(spark, table)
    // touched-slice compaction; materialized once (it feeds the
    // emptied-shard check AND the write — lazy, the slice scan and
    // delta would re-execute per consumer)
    val compacted = shardSlice(spark, table, touched)
      .select(col("k"), col("n"), col("sum_v"))
      .unionByName(delta)
      .groupBy(col("k"))
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"))
      .filter(col("n") =!= 0L ||
        col("sum_v") =!= lit(0).cast(DecimalType(18, 2)))
      // re-align to the TABLE's exact column types (the agg widened
      // the decimal), so the positional insertInto cast is identity
      .select(col("k"),
        col("n").cast(spark.table(table).schema("n").dataType).as("n"),
        col("sum_v").cast(spark.table(table).schema("sum_v").dataType)
          .as("sum_v"))
      .withColumn("_shard", shardOf(col("k"), shards))
      .localCheckpoint()
    val present = compacted.select(col("_shard")).distinct()
      .collect().map(_.getInt(0)).toSet
    // dynamic overwrite MUST ride the session conf: insertInto does
    // not honor the writer-level option, and static overwrite would
    // truncate the whole table (measured — the untouched shards
    // vanished under the option-only form)
    val confKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "dynamic")
    try compacted.write.mode("overwrite").insertInto(table)
    finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
    touched.filterNot(present).foreach { sh =>
      spark.sql(
        s"ALTER TABLE `$table` DROP IF EXISTS PARTITION (_shard=$sh)")
    }
    readZSum(spark, table)
  }
}
