package graft

import org.apache.spark.sql.functions._
import graft.ops.{DurableState, Incremental}

/** The durable maintained-state round-trip (r15, r14 verdict item 3):
  * the persisted stateZSum frame lives as a shard-partitioned
  * external table, and a maintenance run reads ONLY touched shards
  * (partition-pruned scan, pinned in the plan), rewrites ONLY touched
  * shard directories (dynamic overwrite — untouched files
  * byte-identical on disk, pinned via the listing), and lands on the
  * same state as the in-memory mergeZSum/applyZSum folds.
  */
class DurableStateSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ds_$tag").toString

  private def stateOf(rows: Seq[(String, Double)], m: Long = 1L) =
    Incremental.stateZSum(rows.toDF("g", "v"), col("g"), col("v"), lit(m))

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("n"), col("sum_v").cast("string"))
      .as[(String, Long, String)].collect().toSet

  private def listing(path: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator()
      .asScala.filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        ((java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)))
      .toMap
  }

  test("durable round-trip == mergeZSum/applyZSum; untouched shards neither read nor rewritten") {
    val base = (0 until 400).map(i => (s"k${i % 40}", (i % 13).toDouble))
    val baseState = stateOf(base).localCheckpoint()
    val path = freshDir("rt")
    DurableState.writeZSum(baseState, "graft_ds_rt", path, shards = 16)
    // key-sparse delta: appends + a retraction on TWO keys only
    val delta = Incremental.mergeZSum(
        stateOf(Seq(("k3", 2.5), ("k3", 4.0), ("k7", 1.0))),
        stateOf(Seq(("k7", 3.0)), m = -1L))
      .localCheckpoint()
    val touched = DurableState.touchedShards(delta, col("k"), 16)
    assert(touched.size <= 2, s"two keys must touch <= 2 shards: $touched")
    // (1) the pruned READ: the touched slice's scan carries the
    // literal IN partition filter — the untouched passthrough is
    // not-reading, file-level
    val slice = DurableState.shardSlice(spark, "graft_ds_rt", touched)
    val plan = slice.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_shard"),
      plan)
    val scanned = slice.select(col("_shard")).distinct()
      .as[Int].collect().toSet
    assert(scanned == touched.toSet, s"read shards $scanned != $touched")
    val before = listing(path)
    // (2) the maintenance run
    val got = DurableState.maintainZSum(spark, "graft_ds_rt", delta)
    assert(rowsOf(got) == rowsOf(Incremental.mergeZSum(baseState, delta)))
    assert(rowsOf(got) == rowsOf(Incremental.applyZSum(baseState, delta)))
    // (3) the pruned WRITE: untouched shard directories byte-identical
    val after = listing(path)
    val untouchedBefore = before.filterNot(f =>
      touched.exists(sh => f._1.contains(s"_shard=$sh/")))
    val untouchedAfter = after.filterNot(f =>
      touched.exists(sh => f._1.contains(s"_shard=$sh/")))
    assert(untouchedBefore == untouchedAfter,
      "untouched shard files changed on disk")
    assert(before.keySet.exists(f =>
      touched.exists(sh => f.contains(s"_shard=$sh/"))),
      "degenerate: no touched-shard file existed before")
    // (4) the table IS the state: a fresh read equals the return
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_rt")) ==
      rowsOf(got))
    // (4b) one file per shard directory — the write repartitions on
    // the shard, so maintenance never sprays task-count small files
    val perDir = after.keys.groupBy(f =>
      f.replaceAll("/[^/]*$", "")).view.mapValues(_.size)
    assert(perDir.values.forall(_ == 1),
      s"small-files: ${perDir.filter(_._2 > 1)}")
    // (5) chaining: a second run folds on top of the first
    val delta2 = stateOf(Seq(("k3", 1.0), ("k11", 9.0))).localCheckpoint()
    val got2 = DurableState.maintainZSum(spark, "graft_ds_rt", delta2)
    val want2 = Incremental.mergeZSum(
      Incremental.mergeZSum(baseState, delta), delta2)
    assert(rowsOf(got2) == rowsOf(want2))
  }

  test("a shard emptied by retractions drops its partition instead of resurrecting stale files") {
    // one key per shard-ish: retract key kX completely
    val base = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0))
    val baseState = stateOf(base).localCheckpoint()
    val path = freshDir("empty")
    DurableState.writeZSum(baseState, "graft_ds_empty", path, shards = 8)
    val aShard = DurableState.touchedShards(
      stateOf(Seq(("a", 1.0))), col("k"), 8).head
    // full retraction of key a (n and sum both net to the identity)
    val delta = stateOf(Seq(("a", 1.0)), m = -1L).localCheckpoint()
    val got = DurableState.maintainZSum(spark, "graft_ds_empty", delta)
    assert(rowsOf(got) == rowsOf(Incremental.mergeZSum(baseState, delta)))
    assert(!rowsOf(got).exists(_._1 == "a"))
    // the emptied shard's directory holds no live partition
    val parts = spark.sql("SHOW PARTITIONS graft_ds_empty")
      .as[String].collect().toSet
    assert(!parts.contains(s"_shard=$aShard"), parts)
    // and the FILES are gone too (r16 review: the table is external,
    // so DROP PARTITION alone leaves dead bytes the byte-routing
    // listing would count — a one-key delta on this shard would then
    // look like a huge rewrite)
    assert(!new java.io.File(s"$path/_shard=$aShard").exists(),
      "emptied shard directory left on disk")
  }

  test("maintainKeyed composes with the SCD2 kernel: durable touched-shard rebuild == full rebuild") {
    import graft.ops.Scd2
    // 12 keys over 8 shards: late events touch TWO keys; their shards
    // rebuild through Scd2.deltaMaintain over the pruned slice, every
    // other shard's files stay byte-identical
    val base = (0 until 120).map(i =>
      (i % 12L, i.toLong, s"a${i % 3}", (i / 12L) * 100L + 10L))
      .toDF("uid", "eid", "at", "ets")
    val late = Seq((3L, 900L, "zz", 150L), (7L, 901L, "zz", 5L))
      .toDF("uid", "eid", "at", "ets")
    val store = Scd2.build(base, col("uid"), col("eid"), col("at"),
      col("ets")).localCheckpoint()
    val path = freshDir("scd2")
    DurableState.writeKeyed(store, "graft_ds_scd2", path,
      shards = 8, keyCol = "key")
    val before = listing(path)
    val touched = DurableState.touchedShards(late, col("uid"), 8)
    val got = DurableState.maintainKeyed(spark, "graft_ds_scd2", late,
      col("uid"),
      (slice, d) => Scd2.deltaMaintain(slice, d, col("uid"), col("eid"),
        col("at"), col("ets")), canEmpty = false)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    val want = Scd2.build(base.unionByName(late), col("uid"),
      col("eid"), col("at"), col("ets"))
    assert(rows(got) == rows(want))
    assert(rows(DurableState.readKeyed(spark, "graft_ds_scd2")) ==
      rows(want))
    // untouched shard files unchanged on disk
    val after = listing(path)
    def untouchedOf(m: Map[String, (Long, Long)]) = m.filterNot(f =>
      touched.exists(sh => f._1.contains(s"_shard=$sh/")))
    assert(untouchedOf(before) == untouchedOf(after),
      "untouched shard files changed on disk")
    assert(touched.size < 8, s"degenerate: all shards touched $touched")
    // the rebuild-contract guard is loud: wrong output columns
    val e = intercept[IllegalArgumentException] {
      DurableState.maintainKeyed(spark, "graft_ds_scd2", late,
        col("uid"), (slice, _) => slice.drop("version"))
    }
    assert(e.getMessage.contains("data columns"))
  }

  test("streaming→durable bridge: CDC micro-batches fold into the sharded store; replays are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.ZRow
    val base = stateOf(Seq(("a", 1.0), ("b", 2.0))).localCheckpoint()
    val path = freshDir("bridge")
    DurableState.writeZSum(base, "graft_ds_bridge", path, shards = 8)
    val mem = MemoryStream[ZRow]
    val q = mem.toDS().writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[ZRow], id: Long) =>
        val delta = Incremental.stateZSum(df.toDF(),
          col("key"), col("value"), col("mult")).localCheckpoint()
        DurableState.maintainZSumBatch(spark, "graft_ds_bridge",
          delta, id)
        ()
      }.start()
    mem.addData(ZRow("a", 5.0, 1L), ZRow("c", 7.0, 1L))
    q.processAllAvailable()
    mem.addData(ZRow("a", 1.0, -1L), ZRow("b", 3.5, 1L))
    q.processAllAvailable()
    q.stop()
    // the durable table == the batch recompute over surviving rows
    val want = stateOf(
      Seq(("a", 5.0), ("b", 2.0), ("b", 3.5), ("c", 7.0)))
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_bridge")) ==
      rowsOf(want))
    assert(DurableState.lastAppliedBatch(spark, "graft_ds_bridge") == 1L)
    // a REPLAYED micro-batch (sink retry after failure) is a no-op —
    // Z-deltas are not idempotent, the batch-id property gates them
    val replay = stateOf(Seq(("a", 100.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_ds_bridge", replay, 1L)
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_bridge")) ==
      rowsOf(want), "replayed batch was double-applied")
    // the NEXT id applies
    DurableState.maintainZSumBatch(spark, "graft_ds_bridge", replay, 2L)
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_bridge")) ==
      rowsOf(Incremental.mergeZSum(want, replay)))
  }

  test("streaming SCD2 lands durably: event micro-batches fold via maintainKeyedBatch; replays are no-ops") {
    import graft.ops.Scd2
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.Scd2Event
    val base = Seq((1L, 10L, "a", 100L), (2L, 20L, "x", 100L))
      .toDF("uid", "eid", "at", "ets")
    val path = freshDir("scd2b")
    DurableState.writeKeyed(
      Scd2.build(base, col("uid"), col("eid"), col("at"), col("ets")),
      "graft_ds_scd2b", path, shards = 8, keyCol = "key")
    val mem = MemoryStream[Scd2Event]
    val q = mem.toDS().writeStream
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[Scd2Event], id: Long) =>
          DurableState.maintainKeyedBatch(spark, "graft_ds_scd2b",
            df.toDF(), col("key"),
            (slice, d) => Scd2.deltaMaintain(slice, d, col("key"),
              col("event_id"), col("attr"), col("ts")),
            id, canEmpty = false)
          ()
      }.start()
    mem.addData(Scd2Event(1L, 11L, "b", 300L))
    q.processAllAvailable()
    mem.addData(Scd2Event(1L, 12L, "c", 200L)) // the late split
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
    val allEvents = base.unionByName(Seq(
      (1L, 11L, "b", 300L), (1L, 12L, "c", 200L))
      .toDF("uid", "eid", "at", "ets"))
    val want = Scd2.build(allEvents, col("uid"), col("eid"),
      col("at"), col("ets"))
    assert(rows(DurableState.readKeyed(spark, "graft_ds_scd2b")) ==
      rows(want))
    // replaying batch 1 changes nothing
    DurableState.maintainKeyedBatch(spark, "graft_ds_scd2b",
      Seq((1L, 13L, "zz", 400L))
        .toDF("key", "event_id", "attr", "ts"), col("key"),
      (slice, d) => Scd2.deltaMaintain(slice, d, col("key"),
        col("event_id"), col("attr"), col("ts")),
      batchId = 1L, canEmpty = false)
    assert(rows(DurableState.readKeyed(spark, "graft_ds_scd2b")) ==
      rows(want), "replayed batch was re-applied")
  }

  test("checkpoint RESTART + sink crash: the durable bridge applies each micro-batch exactly once end to end") {
    // the REAL at-least-once redelivery, not a simulated one: the
    // sink crashes AFTER the durable fold of batch 1 (so the batch
    // never commits to the checkpoint), the query dies, and the
    // restarted query REDELIVERS batch 1 — Structured Streaming's
    // actual replay machinery driving the marker/property gate. A
    // double-apply would show as a: n=2/sum=10 style drift.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.ZRow
    val base = stateOf(Seq(("a", 1.0))).localCheckpoint()
    val path = freshDir("bridge_rs")
    DurableState.writeZSum(base, "graft_ds_bridge_rs", path, shards = 8)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_bridge").toString
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val mem = MemoryStream[ZRow]
    def start() = mem.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[ZRow], id: Long) =>
        val delta = Incremental.stateZSum(df.toDF(),
          col("key"), col("value"), col("mult")).localCheckpoint()
        DurableState.maintainZSumBatch(spark, "graft_ds_bridge_rs",
          delta, id)
        if (crashOnce.getAndSet(false))
          sys.error("injected sink crash AFTER the durable fold")
        ()
      }.start()
    val q1 = start()
    mem.addData(ZRow("a", 5.0, 1L), ZRow("b", 2.0, 1L))
    q1.processAllAvailable()
    q1.stop() // the kill: state only in the checkpoint + the table
    // down-time data; its FIRST delivery will fold durably and then
    // die before acknowledging
    mem.addData(ZRow("a", 1.0, -1L), ZRow("c", 7.0, 1L))
    crashOnce.set(true)
    val q2 = start()
    intercept[Throwable] { q2.processAllAvailable() }
    scala.util.Try(q2.stop())
    // restart: batch 1 is REDELIVERED (never committed); the gate
    // must make the re-fold a no-op
    val q3 = start()
    q3.processAllAvailable(); q3.stop()
    val want = Incremental.mergeZSum(
      Incremental.mergeZSum(base,
        stateOf(Seq(("a", 5.0), ("b", 2.0)))),
      stateOf(Seq(("a", 1.0)), m = -1L)
        .unionByName(stateOf(Seq(("c", 7.0)))))
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_bridge_rs")) ==
      rowsOf(want), "redelivered batch was double-applied")
    assert(
      DurableState.lastAppliedBatch(spark, "graft_ds_bridge_rs") == 1L)
  }

  test("maintainKeyed one-pass path (canEmpty=false) kills a stray-shard write in-band") {
    val base = stateOf((0 until 40).map(i => (s"k$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("stray")
    DurableState.writeZSum(base, "graft_ds_stray", path, shards = 16)
    val delta = stateOf(Seq(("k3", 1.0))).localCheckpoint()
    val strayKey = (0 until 40).map(i => s"k$i").find { k =>
      DurableState.touchedShards(stateOf(Seq((k, 1.0))), col("k"), 16) !=
        DurableState.touchedShards(delta, col("k"), 16)
    }.get
    // a contract-violating rebuild emits a key from an UN-READ shard:
    // the in-band guard must fail the write, not let dynamic overwrite
    // replace that shard with the stray row
    val e = intercept[Throwable] {
      DurableState.maintainKeyed(spark, "graft_ds_stray", delta,
        col("k"),
        (slice, d) => slice.unionByName(
          stateOf(Seq((strayKey, 9.0))).select(
            col("k"), col("n"), col("sum_v"))),
        canEmpty = false)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("un-read shard")),
      msgs(e).mkString("\n"))
    // and the table is intact: the stray shard's row count unchanged
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_stray")) ==
      rowsOf(base))
  }

  test("maintainKeyed is loud on a mis-typed delta key (xxhash64 is type-sensitive)") {
    val base = stateOf(Seq(("a", 1.0), ("b", 2.0))).localCheckpoint()
    val path = freshDir("ktype")
    DurableState.writeZSum(base, "graft_ds_ktype", path, shards = 8)
    // an int-typed key would hash differently than the store's string
    val badDelta = Seq((1, 1L, java.math.BigDecimal.ONE))
      .toDF("k", "n", "sum_v")
    val e = intercept[IllegalArgumentException] {
      DurableState.maintainKeyed(spark, "graft_ds_ktype", badDelta,
        col("k"), (slice, d) => slice)
    }
    assert(e.getMessage.contains("mis-shards"), e.getMessage)
  }

  test("concurrent same-table folds both land (per-table run serialization)") {
    val base = stateOf((0 until 20).map(i => (s"k$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("conc")
    DurableState.writeZSum(base, "graft_ds_conc", path, shards = 8)
    val d1 = stateOf(Seq(("k1", 10.0))).localCheckpoint()
    val d2 = stateOf(Seq(("k2", 20.0))).localCheckpoint()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // without the per-table lock this is a read-modify-write race:
    // both folds read the pre-write slice and the later write
    // discards the earlier fold
    val fs = Seq(d1, d2).map(d => Future {
      DurableState.maintainZSum(spark, "graft_ds_conc", d).count()
    })
    Await.result(Future.sequence(fs), 120.seconds)
    val want = Incremental.mergeZSum(Incremental.mergeZSum(base, d1), d2)
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_conc")) ==
      rowsOf(want), "a concurrent fold was lost")
  }

  test("null keys land deterministically in the xxhash64-seed shard and maintain like any other") {
    // r15 advice: xxhash64 is NON-nullable — a null input leaves the
    // hash at its seed (42), so null keys land in pmod(42, shards),
    // not shard 0 as the old comment claimed. Pin the shard and the
    // maintenance round-trip through it.
    val base = stateOf(Seq(("a", 1.0), (null, 2.0), ("b", 4.0)))
      .localCheckpoint()
    val path = freshDir("null")
    DurableState.writeZSum(base, "graft_ds_null", path, shards = 16)
    val fromExpr = spark.range(1)
      .select(DurableState.shardOf(lit(null).cast("string"), 16))
      .head.getInt(0)
    assert(fromExpr == 42 % 16, s"xxhash64(null) is the seed 42, so " +
      s"the null shard is pmod(42,16)=${42 % 16}; expression gave " +
      s"$fromExpr")
    val gotShard = spark.table("graft_ds_null")
      .filter(col("k").isNull).select(col("_shard"))
      .as[Int].collect().toSeq
    assert(gotShard == Seq(fromExpr), s"null key in $gotShard")
    // a null-key delta touches exactly that shard and folds correctly
    val delta = stateOf(Seq((null, 3.0))).localCheckpoint()
    assert(DurableState.touchedShards(delta, col("k"), 16) ==
      Seq(fromExpr))
    val got = DurableState.maintainZSum(spark, "graft_ds_null", delta)
    assert(rowsOf(got) == rowsOf(Incremental.mergeZSum(base, delta)))
  }

  test("atomic bridge: after the commit point the STAGED bytes roll forward — the fold never re-executes") {
    val base = stateOf((0 until 40).map(i => (s"k$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("crash1")
    DurableState.writeZSum(base, "graft_ds_crash1", path, shards = 8)
    val d0 = stateOf(Seq(("k1", 5.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_ds_crash1", d0, 0L)
    val want0 = Incremental.mergeZSum(base, d0).localCheckpoint()
    // simulate a batch-1 run that crashed immediately AFTER the
    // commit point: stage the fold output and the marker BY HAND
    // (this is the on-disk protocol contract), live table untouched
    val d1 = stateOf(Seq(("k2", 7.0), ("k2", 1.0))).localCheckpoint()
    val touched = DurableState.touchedShards(d1, col("k"), 8)
    val slice = DurableState
      .shardSlice(spark, "graft_ds_crash1", touched).drop("_shard")
    Incremental.mergeZSum(slice, d1)
      .withColumn("_shard", DurableState.shardOf(col("k"), 8))
      .repartition(col("_shard"))
      .write.partitionBy("_shard").parquet(s"$path/_staging_b1")
    val present = new java.io.File(s"$path/_staging_b1").listFiles()
      .map(_.getName).filter(_.startsWith("_shard="))
      .map(_.stripPrefix("_shard=").toInt).toSeq.sorted
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_commit_b1.txt"),
      s"batch=1\npresent=${present.mkString(",")}\ndrops=\n"
        .getBytes("UTF-8"))
    val want1 = Incremental.mergeZSum(want0, d1).localCheckpoint()
    // the REDELIVERED batch 1 arrives with a POISON delta: if the
    // implementation re-ran the fold instead of rolling the staged
    // bytes forward, the poison would land and double-apply
    val poison = stateOf(Seq(("k2", 999.0))).localCheckpoint()
    val got = DurableState.maintainZSumBatch(
      spark, "graft_ds_crash1", poison, 1L)
    assert(rowsOf(got) == rowsOf(want1),
      "recovery re-executed the fold instead of rolling forward")
    assert(DurableState.lastAppliedBatch(spark, "graft_ds_crash1") == 1L)
    // marker + staging cleaned; the NEXT id applies normally
    assert(!new java.io.File(s"$path/_commit_b1.txt").exists())
    assert(!new java.io.File(s"$path/_staging_b1").exists())
    val d2 = stateOf(Seq(("k3", 2.0))).localCheckpoint()
    val got2 = DurableState.maintainZSumBatch(
      spark, "graft_ds_crash1", d2, 2L)
    assert(rowsOf(got2) == rowsOf(Incremental.mergeZSum(want1, d2)))
  }

  test("atomic bridge: a crash BEFORE the commit point leaves garbage staging that is swept, and the batch restages") {
    val base = stateOf(Seq(("a", 1.0), ("b", 2.0))).localCheckpoint()
    val path = freshDir("crash2")
    DurableState.writeZSum(base, "graft_ds_crash2", path, shards = 8)
    // a torn staging write with NO marker: garbage rows that must
    // never reach the live table
    stateOf(Seq(("a", 12345.0)))
      .withColumn("_shard", DurableState.shardOf(col("k"), 8))
      .write.partitionBy("_shard").parquet(s"$path/_staging_b0")
    val d0 = stateOf(Seq(("a", 5.0))).localCheckpoint()
    val got = DurableState.maintainZSumBatch(
      spark, "graft_ds_crash2", d0, 0L)
    val want = Incremental.mergeZSum(base, d0)
    assert(rowsOf(got) == rowsOf(want),
      "pre-commit staging garbage leaked into the fold")
    assert(!new java.io.File(s"$path/_staging_b0").exists())
  }

  test("atomic bridge: the r15 window (data applied, property unset) recovers WITHOUT double-applying") {
    val base = stateOf(Seq(("a", 1.0), ("b", 2.0))).localCheckpoint()
    val path = freshDir("crash3")
    DurableState.writeZSum(base, "graft_ds_crash3", path, shards = 8)
    val d0 = stateOf(Seq(("a", 5.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_ds_crash3", d0, 0L)
    val d1 = stateOf(Seq(("b", 7.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_ds_crash3", d1, 1L)
    val want = Incremental.mergeZSum(
      Incremental.mergeZSum(base, d0), d1).localCheckpoint()
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_crash3")) ==
      rowsOf(want))
    // simulate the crash between APPLY and the property/cleanup: the
    // marker reappears (staging already consumed) and the property
    // regresses to the pre-batch value — exactly the r15 hole where
    // recovery re-applied the batch
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_commit_b1.txt"),
      "batch=1\npresent=\ndrops=\n".getBytes("UTF-8"))
    spark.sql("ALTER TABLE graft_ds_crash3 SET TBLPROPERTIES " +
      "('graft.durable.batch' = '0')")
    // the redelivered batch 1 (poison payload again) must heal the
    // marker, advance the property, and apply NOTHING
    val poison = stateOf(Seq(("b", 999.0))).localCheckpoint()
    val got = DurableState.maintainZSumBatch(
      spark, "graft_ds_crash3", poison, 1L)
    assert(rowsOf(got) == rowsOf(want), "batch 1 was double-applied")
    assert(DurableState.lastAppliedBatch(spark, "graft_ds_crash3") == 1L)
    assert(!new java.io.File(s"$path/_commit_b1.txt").exists())
    // and a fresh batch 2 (new key) folds cleanly on top of the
    // healed marker
    val d2 = stateOf(Seq(("c", 3.0))).localCheckpoint()
    val got2 = DurableState.maintainZSumBatch(
      spark, "graft_ds_crash3", d2, 2L)
    assert(rowsOf(got2) == rowsOf(Incremental.mergeZSum(want, d2)))
  }

  test("maintainAuto: sparse deltas fold, dense deltas rebuild, arms bit-equal, evidence carried") {
    val base = stateOf((0 until 40).map(i => (s"k$i", (i % 7).toDouble)))
      .localCheckpoint()
    val path = freshDir("auto")
    DurableState.writeZSum(base, "graft_ds_auto", path, shards = 16)
    val kernel = (sl: org.apache.spark.sql.DataFrame,
        d: org.apache.spark.sql.DataFrame) => Incremental.mergeZSum(sl, d)
    // sparse: one key → fold arm
    val sparse = stateOf(Seq(("k1", 5.0))).localCheckpoint()
    val r1 = DurableState.maintainAuto(spark, "graft_ds_auto", sparse,
      col("k"), kernel)
    assert(r1.decision.strategy == "fold", r1.decision.toString)
    assert(r1.decision.touchedShards <= 1 &&
      r1.decision.totalShards == 16 &&
      r1.decision.touchedFraction < 0.5)
    val want1 = Incremental.mergeZSum(base, sparse).localCheckpoint()
    assert(rowsOf(r1.df) == rowsOf(want1))
    // dense: most keys → rebuild arm, same state
    val dense = stateOf((0 until 40).map(i => (s"k$i", 1.5)))
      .localCheckpoint()
    val r2 = DurableState.maintainAuto(spark, "graft_ds_auto", dense,
      col("k"), kernel)
    assert(r2.decision.strategy == "rebuild", r2.decision.toString)
    assert(r2.decision.touchedFraction >= 0.5)
    val want2 = Incremental.mergeZSum(want1, dense).localCheckpoint()
    assert(rowsOf(r2.df) == rowsOf(want2))
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_auto")) ==
      rowsOf(want2))
    // the rebuilt table is still a maintainable DurableState table
    val again = stateOf(Seq(("k2", 1.0))).localCheckpoint()
    assert(rowsOf(DurableState.maintainZSum(spark, "graft_ds_auto",
      again)) == rowsOf(Incremental.mergeZSum(want2, again)))
    // empty delta → noop
    val r3 = DurableState.maintainAuto(spark, "graft_ds_auto",
      stateOf(Seq.empty[(String, Double)]).localCheckpoint(),
      col("k"), kernel)
    assert(r3.decision.strategy == "noop")
    // ARMS BIT-EQUAL: force each arm over the identical start state
    val pathA = freshDir("autoA"); val pathB = freshDir("autoB")
    val d = stateOf(Seq(("k3", 2.0), ("k4", 3.0), ("k4", 1.0)))
      .localCheckpoint()
    DurableState.writeZSum(base, "graft_ds_autoA", pathA, shards = 16)
    val armFold = DurableState.maintainAuto(spark, "graft_ds_autoA", d,
      col("k"), kernel, rebuildThreshold = 1.01)
    assert(armFold.decision.strategy == "fold")
    DurableState.writeZSum(base, "graft_ds_autoB", pathB, shards = 16)
    val armRebuild = DurableState.maintainAuto(spark, "graft_ds_autoB",
      d, col("k"), kernel, rebuildThreshold = 0.0)
    assert(armRebuild.decision.strategy == "rebuild")
    assert(rowsOf(armFold.df) == rowsOf(armRebuild.df),
      "fold and rebuild arms diverged")
    // the rebuild arm preserves the applied-batch lineage property
    DurableState.maintainZSumBatch(spark, "graft_ds_autoB",
      stateOf(Seq(("k5", 1.0))).localCheckpoint(), 7L)
    DurableState.maintainAuto(spark, "graft_ds_autoB", dense,
      col("k"), kernel, rebuildThreshold = 0.0)
    assert(DurableState.lastAppliedBatch(spark, "graft_ds_autoB") == 7L,
      "rebuild arm lost the applied-batch property")
  }

  test("maintainAuto routes on BYTES, not shard count: one giant touched shard rebuilds, a tiny one folds") {
    // skewed store: most of the bytes live in ONE shard. A delta
    // touching only that shard is nearly a full rewrite however few
    // shards it counts (1/8 here) — the count fraction would say
    // "fold", the byte fraction says "rebuild". The tiny-shard delta
    // routes the other way.
    val shards = 8
    // one job computes every candidate's shard (a per-key probe job
    // would be thousands of jobs)
    val cands = ((0 until 40000).map(i => s"g$i") ++
      (0 until 200).map(i => s"s$i"))
      .toDF("k")
      .select(col("k"), DurableState.shardOf(col("k"), shards).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    val giantShard = cands.find(_._1 == "g0").get._2
    // cohabitants of the giant shard (same pmod bucket) — enough that
    // real data dwarfs the per-file parquet footer floor
    val giants = cands
      .filter(c => c._1.startsWith("g") && c._2 == giantShard)
      .map(_._1).take(4000).toSeq
    assert(giants.size >= 2000, s"need cohabitants, got ${giants.size}")
    val smalls = cands
      .filter(c => c._1.startsWith("s") && c._2 != giantShard)
      .map(_._1).take(7).toSeq
    val base = stateOf(
      giants.map(k => (k, 1.0)) ++ smalls.map(k => (k, 1.0)))
      .localCheckpoint()
    val path = freshDir("skew")
    DurableState.writeZSum(base, "graft_ds_skew", path, shards = shards)
    val kernel = (sl: org.apache.spark.sql.DataFrame,
        d: org.apache.spark.sql.DataFrame) => Incremental.mergeZSum(sl, d)
    // delta touching ONLY the giant shard: count 1/8 but bytes ≫ 1/2
    val dGiant = stateOf(Seq((giants.head, 5.0))).localCheckpoint()
    val r1 = DurableState.maintainAuto(spark, "graft_ds_skew", dGiant,
      col("k"), kernel)
    assert(r1.decision.strategy == "rebuild", r1.decision.toString)
    assert(r1.decision.touchedFraction < 0.5 &&
      r1.decision.byteFraction >= 0.5,
      s"the routing must disagree with the count: ${r1.decision}")
    val want1 = Incremental.mergeZSum(base, dGiant).localCheckpoint()
    assert(rowsOf(r1.df) == rowsOf(want1))
    // delta touching one TINY shard: both fractions small → fold
    val dSmall = stateOf(Seq((smalls.head, 2.0))).localCheckpoint()
    val r2 = DurableState.maintainAuto(spark, "graft_ds_skew", dSmall,
      col("k"), kernel)
    assert(r2.decision.strategy == "fold", r2.decision.toString)
    assert(rowsOf(r2.df) ==
      rowsOf(Incremental.mergeZSum(want1, dSmall)))
    // evidence is self-consistent
    assert(r2.decision.touchedBytes <= r2.decision.totalBytes &&
      r2.decision.totalBytes > 0L)
  }

  test("maintainAutoBatch: dense batches rebuild ATOMICALLY, sparse batches fold, replays no-op") {
    val base = stateOf((0 until 40).map(i => (s"k$i", (i % 5).toDouble)))
      .localCheckpoint()
    val path = freshDir("ab")
    DurableState.writeZSum(base, "graft_ds_ab", path, shards = 16)
    val kernel = (sl: org.apache.spark.sql.DataFrame,
        d: org.apache.spark.sql.DataFrame) => Incremental.mergeZSum(sl, d)
    // batch 0 is DENSE → the rebuild arm, but through the staged
    // commit (batch identity + crash atomicity), not writeKeyed
    val dense = stateOf((0 until 40).map(i => (s"k$i", 2.0)))
      .localCheckpoint()
    val r0 = DurableState.maintainAutoBatch(spark, "graft_ds_ab",
      dense, col("k"), kernel, batchId = 0L)
    assert(r0.decision.strategy == "rebuild", r0.decision.toString)
    val want0 = Incremental.mergeZSum(base, dense).localCheckpoint()
    assert(rowsOf(r0.df) == rowsOf(want0))
    assert(DurableState.lastAppliedBatch(spark, "graft_ds_ab") == 0L)
    // batch 1 is SPARSE → the fold arm
    val sparse = stateOf(Seq(("k3", 9.0))).localCheckpoint()
    val r1 = DurableState.maintainAutoBatch(spark, "graft_ds_ab",
      sparse, col("k"), kernel, batchId = 1L)
    assert(r1.decision.strategy == "fold", r1.decision.toString)
    val want1 = Incremental.mergeZSum(want0, sparse).localCheckpoint()
    assert(rowsOf(r1.df) == rowsOf(want1))
    // a REPLAYED id is a no-op whichever arm it would take
    val poison = stateOf((0 until 40).map(i => (s"k$i", 777.0)))
      .localCheckpoint()
    val r1r = DurableState.maintainAutoBatch(spark, "graft_ds_ab",
      poison, col("k"), kernel, batchId = 1L)
    assert(r1r.decision.strategy == "replay", r1r.decision.toString)
    assert(rowsOf(r1r.df) == rowsOf(want1), "replay was applied")
    // an empty batch advances the id without touching state
    val r2 = DurableState.maintainAutoBatch(spark, "graft_ds_ab",
      stateOf(Seq.empty[(String, Double)]).localCheckpoint(),
      col("k"), kernel, batchId = 2L)
    assert(r2.decision.strategy == "noop")
    assert(DurableState.lastAppliedBatch(spark, "graft_ds_ab") == 2L)
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_ab")) ==
      rowsOf(want1))
  }

  test("reshardKeyed: modulus and directory layout flip atomically; probes keep working after") {
    import org.apache.spark.sql.DataFrame
    val base = stateOf((0 until 60).map(i => (s"k$i", (i % 7).toDouble)))
      .localCheckpoint()
    val path = freshDir("rs")
    DurableState.writeZSum(base, "graft_ds_resh", path, shards = 8)
    DurableState.maintainZSumBatch(spark, "graft_ds_resh",
      stateOf(Seq(("k1", 4.0))).localCheckpoint(), 0L)
    val want0 = Incremental.mergeZSum(base,
      stateOf(Seq(("k1", 4.0)))).localCheckpoint()
    // GROW 8 → 32
    DurableState.reshardKeyed(spark, "graft_ds_resh", 32)
    assert(DurableState.propsOf(spark, "graft_ds_resh")._1 == 32)
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_resh")) ==
      rowsOf(want0), "resharding changed the state")
    val parts = spark.sql("SHOW PARTITIONS graft_ds_resh")
      .as[String].collect().map(_.stripPrefix("_shard=").toInt).toSet
    assert(parts.forall(_ < 32))
    assert(parts.exists(_ >= 8), "growth must use the new id space")
    // the applied-batch property must NOT move (no delta identity)
    assert(DurableState.lastAppliedBatch(spark, "graft_ds_resh") == 0L)
    // the critical hazard: a fold AFTER resharding probes under the
    // NEW modulus and must land on the right shards
    val d1 = stateOf(Seq(("k2", 6.0), ("k9", 1.0))).localCheckpoint()
    val got1 = DurableState.maintainZSum(spark, "graft_ds_resh", d1)
    val want1 = Incremental.mergeZSum(want0, d1).localCheckpoint()
    assert(rowsOf(got1) == rowsOf(want1))
    // SHRINK 32 → 4, then fold again
    DurableState.reshardKeyed(spark, "graft_ds_resh", 4)
    assert(DurableState.propsOf(spark, "graft_ds_resh")._1 == 4)
    val parts4 = spark.sql("SHOW PARTITIONS graft_ds_resh")
      .as[String].collect().map(_.stripPrefix("_shard=").toInt).toSet
    assert(parts4.forall(_ < 4), parts4.toString)
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_resh")) ==
      rowsOf(want1))
    val d2 = stateOf(Seq(("k4", 2.0))).localCheckpoint()
    assert(rowsOf(DurableState.maintainZSum(spark, "graft_ds_resh",
      d2)) == rowsOf(Incremental.mergeZSum(want1, d2)))
    // TORN reshard: a crash right after the commit point — staged
    // new-modulus layout + marker with shards= on disk, property and
    // dirs still old. The next maintenance entry must complete BOTH
    // the swap and the modulus flip before folding.
    val cur = rowsOf(DurableState.readZSum(spark, "graft_ds_resh"))
    val staged: DataFrame = DurableState
      .readZSum(spark, "graft_ds_resh")
      .withColumn("_shard",
        DurableState.shardOf(col("k"), 5))
    staged.write.partitionBy("_shard").parquet(s"$path/_staging_b0")
    val present5 = new java.io.File(s"$path/_staging_b0").listFiles()
      .map(_.getName).filter(_.startsWith("_shard="))
      .map(_.stripPrefix("_shard=").toInt).toSeq.sorted
    val old4 = spark.sql("SHOW PARTITIONS graft_ds_resh")
      .as[String].collect().map(_.stripPrefix("_shard=").toInt)
      .toSeq.sorted
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_commit_b0.txt"),
      (s"batch=0\nadvance=0\nshards=5\n" +
        s"present=${present5.mkString(",")}\n" +
        s"drops=${old4.filterNot(present5.toSet).mkString(",")}\n")
        .getBytes("UTF-8"))
    val d3 = stateOf(Seq(("k5", 3.0))).localCheckpoint()
    val got3 = DurableState.maintainZSum(spark, "graft_ds_resh", d3)
    assert(DurableState.propsOf(spark, "graft_ds_resh")._1 == 5,
      "torn reshard did not flip the modulus")
    val want3 = Incremental.mergeZSum(
      Incremental.mergeZSum(want1, d2), d3)
    assert(rowsOf(got3) == rowsOf(want3))
    assert(cur == rowsOf(Incremental.mergeZSum(want1, d2)),
      "sanity: pre-heal snapshot")
  }

  test("cross-process lease: live lease blocks, stale lease steals, a stolen fence aborts before the write") {
    val base = stateOf(Seq(("a", 1.0), ("b", 2.0))).localCheckpoint()
    val path = freshDir("lease")
    DurableState.writeZSum(base, "graft_ds_lease", path, shards = 8)
    val l1 = DurableState.acquireLease(spark, "graft_ds_lease")
    // a second acquirer fails loudly, naming the holder
    val e1 = intercept[IllegalArgumentException] {
      DurableState.acquireLease(spark, "graft_ds_lease")
    }
    assert(e1.getMessage.contains("under maintenance"), e1.getMessage)
    // fenced write under the valid lease works
    val d0 = stateOf(Seq(("a", 3.0))).localCheckpoint()
    val got0 = DurableState.maintainKeyed(spark, "graft_ds_lease", d0,
      col("k"), (sl, d) => Incremental.mergeZSum(sl, d),
      fence = Some(l1))
    val want0 = Incremental.mergeZSum(base, d0).localCheckpoint()
    assert(rowsOf(got0.select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(want0))
    // age the lease file (the holder "crashed"): a second maintainer
    // STEALS it and the fencing token bumps
    // (delete the Hadoop LocalFileSystem checksum sibling first — the
    // hand-edit below would otherwise trip the CRC on the next read)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$path/._lease.txt.crc"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_lease.txt"),
      s"holder=dead@host/t0\nsinceMs=${System.currentTimeMillis() - 100000}\n"
        .getBytes("UTF-8"))
    val l2 = DurableState.acquireLease(spark, "graft_ds_lease",
      ttlMs = 1000L)
    assert(l2.token == l1.token + 1, s"${l1.token} -> ${l2.token}")
    // the zombie holder aborts LOUDLY before mutating anything
    val before = rowsOf(DurableState.readZSum(spark, "graft_ds_lease"))
    val e2 = intercept[IllegalArgumentException] {
      DurableState.maintainKeyed(spark, "graft_ds_lease",
        stateOf(Seq(("b", 50.0))).localCheckpoint(), col("k"),
        (sl, d) => Incremental.mergeZSum(sl, d), fence = Some(l1))
    }
    assert(e2.getMessage.contains("STOLEN"), e2.getMessage)
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_lease")) ==
      before, "a fenced-out writer mutated the table")
    // the current holder still writes; release frees the lease
    val d1 = stateOf(Seq(("b", 4.0))).localCheckpoint()
    DurableState.maintainKeyed(spark, "graft_ds_lease", d1, col("k"),
      (sl, d) => Incremental.mergeZSum(sl, d), fence = Some(l2))
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_lease")) ==
      rowsOf(Incremental.mergeZSum(want0, d1)))
    DurableState.releaseLease(spark, l2)
    val l3 = DurableState.acquireLease(spark, "graft_ds_lease")
    DurableState.releaseLease(spark, l3)
    // a lease on table A cannot fence table B
    val e3 = intercept[IllegalArgumentException] {
      DurableState.maintainKeyed(spark, "graft_ds_lease", d1, col("k"),
        (sl, d) => Incremental.mergeZSum(sl, d),
        fence = Some(l3.copy(table = "other_table")))
    }
    assert(e3.getMessage.contains("lease for table"), e3.getMessage)
  }

  test("serving projection: bucketed zero-Exchange join, staleness tracked by batch id") {
    val base = stateOf((0 until 60).map(i => (s"u$i", (i % 9).toDouble)))
      .localCheckpoint()
    val path = freshDir("serve")
    DurableState.writeZSum(base, "graft_ds_serve", path, shards = 16)
    val d0 = stateOf(Seq(("u1", 5.0), ("u2", 1.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_ds_serve", d0, 0L)
    val b = DurableState.refreshServing(spark, "graft_ds_serve",
      "graft_ds_serve_sv", freshDir("sv"), buckets = 8)
    assert(b == 0L)
    assert(DurableState.servedBatch(spark, "graft_ds_serve_sv") == 0L)
    assert(DurableState.servingStaleness(spark, "graft_ds_serve",
      "graft_ds_serve_sv") == 0L)
    // projection rows == the durable state
    assert(rowsOf(spark.table("graft_ds_serve_sv")
      .select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(DurableState.readZSum(spark, "graft_ds_serve")))
    // consumer join: serving table ⋈ an equally-bucketed probe table
    // runs with ZERO shuffle Exchange (the whole point of the
    // projection — the shard-grain table cannot offer this)
    graft.ops.Layout.bucketWrite(
      base.select(col("k"), col("n").as("base_n")),
      "graft_ds_probe_sv", freshDir("pb"), buckets = 8, key = "k")
    val prevThresh =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_ds_serve_sv")
        .join(spark.table("graft_ds_probe_sv"), Seq("k"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
        s"bucketed serving join shuffled:\n$plan")
      // the CONTRAST: the same join through the shard-grain table
      // pays the shuffle the projection exists to remove
      val j2 = DurableState.readKeyed(spark, "graft_ds_serve")
        .join(spark.table("graft_ds_probe_sv"), Seq("k"))
      j2.collect()
      val plan2 = j2.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan2).nonEmpty,
        s"expected the shard-grain join to shuffle:\n$plan2")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
    // PROJECTED serving (r16): the view function shapes the state
    // before the bucketed write — rows equal the projection of the
    // state, staleness semantics unchanged, and a projection that
    // drops the bucket key is loud
    DurableState.refreshServing(spark, "graft_ds_serve",
      "graft_ds_serve_cur", freshDir("svc"), buckets = 8,
      project = _.filter(col("n") > 1L))
    assert(rowsOf(spark.table("graft_ds_serve_cur")
      .select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(DurableState.readZSum(spark, "graft_ds_serve")
        .filter(col("n") > 1L)))
    assert(DurableState.servedBatch(spark, "graft_ds_serve_cur") == 0L)
    val eProj = intercept[IllegalArgumentException] {
      DurableState.refreshServing(spark, "graft_ds_serve",
        "graft_ds_serve_bad", freshDir("svb"), buckets = 8,
        project = _.drop("k"))
    }
    assert(eProj.getMessage.contains("key column"), eProj.getMessage)
    // staleness: a new applied batch opens the gap; refresh closes it
    val d1 = stateOf(Seq(("u3", 9.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_ds_serve", d1, 1L)
    assert(DurableState.servingStaleness(spark, "graft_ds_serve",
      "graft_ds_serve_sv") == 1L)
    DurableState.refreshServing(spark, "graft_ds_serve",
      "graft_ds_serve_sv", freshDir("sv2"), buckets = 8)
    assert(DurableState.servingStaleness(spark, "graft_ds_serve",
      "graft_ds_serve_sv") == 0L)
    assert(rowsOf(spark.table("graft_ds_serve_sv")
      .select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(DurableState.readZSum(spark, "graft_ds_serve")))
  }

  test("TWO-PROCESS lease: a rival JVM's fresh lease blocks us, its stale lease steals, ours blocks the rival") {
    val base = stateOf(Seq(("a", 1.0))).localCheckpoint()
    val path = freshDir("lease2p")
    DurableState.writeZSum(base, "graft_ds_lease2p", path, shards = 4)
    def rival(ageMs: Long): (Int, String) = {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val pb = new ProcessBuilder(javaBin, "-cp", cp,
        "graft.tools.LeaseRival", path, ageMs.toString)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      (p.waitFor(), out)
    }
    // (1) the rival PROCESS plants a fresh lease: our acquire fails
    // loudly, naming the holder across the process boundary
    val (c1, o1) = rival(0L)
    assert(c1 == 0 && o1.startsWith("HELD "), s"$c1 $o1")
    val rivalHolder = o1.stripPrefix("HELD ").trim
    val e1 = intercept[IllegalArgumentException] {
      DurableState.acquireLease(spark, "graft_ds_lease2p",
        ttlMs = 60000L)
    }
    assert(e1.getMessage.contains(rivalHolder), e1.getMessage)
    // (2) a STALE rival lease (its process long dead): we steal it
    // through the rename-tombstone-compare path and get a fenced
    // lease whose file is now ours
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(path, "_lease.txt"))
    val (c2, _) = rival(120000L)
    assert(c2 == 0)
    val lease = DurableState.acquireLease(spark, "graft_ds_lease2p",
      ttlMs = 60000L)
    assert(lease.token >= 1L)
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_lease.txt")), "UTF-8")
    assert(content.contains(s"holder=${lease.holder}"), content)
    // (3) OUR live lease blocks the rival process at its
    // create-exclusive — contention is loud in both directions
    val (c3, o3) = rival(0L)
    assert(c3 == 2 && o3.startsWith("BUSY"), s"$c3 $o3")
    // (4) CROSS-PROCESS FENCING through the FILE half (r17): the
    // fence token rides _fence.txt beside the catalog property, so a
    // newer maintainer in another process — which cannot see our
    // InMemoryCatalog at all — fences us out via the shared
    // filesystem alone. The rival bumps the file; our next fenced
    // write must abort BEFORE mutating.
    def rivalFence(token: Long): (Int, String) = {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val pb = new ProcessBuilder(javaBin, "-cp", cp,
        "graft.tools.LeaseRival", path, "fence", token.toString)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      (p.waitFor(), out)
    }
    val (cf, of) = rivalFence(lease.token + 100L)
    assert(cf == 0 && of.startsWith("FENCED"), s"$cf $of")
    val before = rowsOf(DurableState.readZSum(spark, "graft_ds_lease2p"))
    val eFence = intercept[IllegalArgumentException] {
      DurableState.maintainKeyed(spark, "graft_ds_lease2p",
        stateOf(Seq(("a", 77.0))).localCheckpoint(), col("k"),
        (sl: org.apache.spark.sql.DataFrame,
         d: org.apache.spark.sql.DataFrame) =>
          Incremental.mergeZSum(sl, d),
        fence = Some(lease))
    }
    assert(eFence.getMessage.contains("fencing token mismatch"),
      eFence.getMessage)
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_lease2p"))
      == before, "the fenced-out write must leave the table untouched")
    // (5) release frees the file; the rival acquires cleanly
    DurableState.releaseLease(spark, lease)
    val (c4, o4) = rival(0L)
    assert(c4 == 0 && o4.startsWith("HELD "), s"$c4 $o4")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(path, "_lease.txt"))
  }

  test("self-calibrating router: measured rates flip the route both ways; toy-scale samples stay on the threshold") {
    val base = stateOf((0 until 40).map(i => (s"k$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("cal")
    DurableState.writeZSum(base, "graft_ds_cal", path, shards = 16)
    val kernel = (sl: org.apache.spark.sql.DataFrame,
        d: org.apache.spark.sql.DataFrame) =>
      Incremental.mergeZSum(sl, d)
    def plant(foldRate: Double, foldBytes: Long,
        rebuildRate: Double, rebuildBytes: Long): Unit =
      spark.sql("ALTER TABLE graft_ds_cal SET TBLPROPERTIES (" +
        s"'graft.durable.foldNsPerByte' = '$foldRate', " +
        s"'graft.durable.foldSampleBytes' = '$foldBytes', " +
        s"'graft.durable.rebuildNsPerByte' = '$rebuildRate', " +
        s"'graft.durable.rebuildSampleBytes' = '$rebuildBytes')")
    // organic first run: no measured history → the static threshold
    // routes and the decision says so
    val d0 = stateOf(Seq(("k1", 5.0))).localCheckpoint()
    val r0 = DurableState.maintainAuto(spark, "graft_ds_cal", d0,
      col("k"), kernel)
    assert(r0.decision.strategy == "fold" &&
      r0.decision.calibration == "threshold", r0.decision.toString)
    // both rates present but measured at TOY byte mass: the floor
    // keeps routing on the threshold (a ns/byte rate from a
    // kilobyte-sized run is fixed-cost noise, not a crossover)
    plant(1.0, 1000L, 100.0, 1000L)
    val d1 = stateOf((0 until 40).map(i => (s"k$i", 2.0)))
      .localCheckpoint()
    val r1 = DurableState.maintainAuto(spark, "graft_ds_cal", d1,
      col("k"), kernel)
    assert(r1.decision.strategy == "rebuild" &&
      r1.decision.calibration == "threshold", r1.decision.toString)
    // a FAST-FOLD history at trustworthy mass: folding is measured
    // 100× cheaper per byte, so even a dense delta folds — the
    // static threshold would have said rebuild
    val mb64 = DurableState.calibrationFloorBytes
    plant(1.0, mb64, 100.0, mb64)
    val d2 = stateOf((0 until 40).map(i => (s"k$i", 3.0)))
      .localCheckpoint()
    val r2 = DurableState.maintainAuto(spark, "graft_ds_cal", d2,
      col("k"), kernel)
    assert(r2.decision.strategy == "fold" &&
      r2.decision.calibration == "measured", r2.decision.toString)
    // the FLIP: folding measured 10⁶× dearer — even a single-key
    // delta rebuilds, where the threshold would have folded
    plant(1e6, mb64, 1.0, mb64)
    val d3 = stateOf(Seq(("k2", 7.0))).localCheckpoint()
    val r3 = DurableState.maintainAuto(spark, "graft_ds_cal", d3,
      col("k"), kernel)
    assert(r3.decision.strategy == "rebuild" &&
      r3.decision.calibration == "measured", r3.decision.toString)
    // whatever routed, the state is the same fold of all deltas
    val want = Seq(d0, d1, d2, d3).foldLeft(base)(
      (acc, d) => Incremental.mergeZSum(acc, d))
    assert(rowsOf(DurableState.readZSum(spark, "graft_ds_cal")) ==
      rowsOf(want))
    // and the organic runs kept recording: both rates present with
    // sample stamps at least the planted mass
    val props = spark.sql("SHOW TBLPROPERTIES graft_ds_cal")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.contains("graft.durable.foldNsPerByte") &&
      props.contains("graft.durable.rebuildNsPerByte"))
    assert(props("graft.durable.foldSampleBytes").toLong >= mb64 &&
      props("graft.durable.rebuildSampleBytes").toLong >= mb64)
  }

  test("maintainZSum is loud on schema drift and foreign tables") {
    val e1 = intercept[IllegalArgumentException] {
      DurableState.maintainZSum(spark, "graft_ds_rt",
        Seq(("x", 1L)).toDF("k", "n"))
    }
    assert(e1.getMessage.contains("stateZSum schema"))
    spark.sql("DROP TABLE IF EXISTS graft_ds_foreign")
    Seq(("x", 1L, "0.0")).toDF("k", "n", "sum_v")
      .write.mode("overwrite").saveAsTable("graft_ds_foreign")
    val e2 = intercept[IllegalArgumentException] {
      DurableState.maintainZSum(spark, "graft_ds_foreign",
        stateOf(Seq(("x", 1.0))))
    }
    assert(e2.getMessage.contains("graft.durable"))
  }
}
