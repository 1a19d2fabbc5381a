package graft

import org.apache.spark.sql.functions._
import graft.ops.{DurableState, Incremental}

/** Incremental serving (r17, r16 verdict item 2) and the deployment
  * loop as one API (item 3): the base projection refreshes ONCE;
  * after that each tick rewrites only a bucketed DELTA of the shards
  * whose manifest stamp moved — latest-wins by shard membership (a
  * literal predicate, no join), zero-Exchange consumer legs, and a
  * byte-crossover route back to full compaction.
  */
class ServingSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_srv_$tag").toString

  private def stateOf(rows: Seq[(String, Double)], m: Long = 1L) =
    Incremental.stateZSum(rows.toDF("g", "v"), col("g"), col("v"), lit(m))

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("n"), col("sum_v").cast("string"))
      .as[(String, Long, String)].collect().toSet

  private def parquetListing(path: String): Map[String, Long] =
    graft.ops.Layout.parquetFiles(path)

  test("refreshServingDelta: a sparse fold refreshes delta-sized — base files untouched, pair staleness 0, view exact") {
    val base = stateOf((0 until 60).map(i => (s"u$i", (i % 9).toDouble)))
      .localCheckpoint()
    val path = freshDir("sd")
    DurableState.writeZSum(base, "graft_srv_sd", path, shards = 16)
    val svPath = freshDir("sd_base")
    DurableState.refreshServing(spark, "graft_srv_sd",
      "graft_srv_sd_sv", svPath, buckets = 8)
    val baseFiles = parquetListing(svPath)
    // a sparse identified batch folds, the pair falls behind
    val d0 = stateOf(Seq(("u1", 5.0), ("u2", 1.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_sd", d0, 0L)
    assert(DurableState.servingStaleness(spark, "graft_srv_sd",
      "graft_srv_sd_sv") == 1L)
    val dec = DurableState.refreshServingDelta(spark, "graft_srv_sd",
      "graft_srv_sd_sv", svPath, "graft_srv_sd_dl", freshDir("sd_dl"),
      buckets = 8)
    assert(dec.strategy == "delta", dec.toString)
    assert(dec.changedShards > 0 && dec.byteFraction < 0.5, dec.toString)
    // the BASE projection was not rewritten — that is the point
    assert(parquetListing(svPath) == baseFiles,
      "delta refresh must not touch the base projection")
    // the pair is fresh (staleness rides the delta table's stamp)
    assert(DurableState.servingStaleness(spark, "graft_srv_sd",
      "graft_srv_sd_dl") == 0L)
    // the latest-wins view equals the store
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_sd_sv",
      "graft_srv_sd_dl").select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(DurableState.readZSum(spark, "graft_srv_sd")))
    // a second tick with nothing new: noop, zero writes
    val dec2 = DurableState.refreshServingDelta(spark, "graft_srv_sd",
      "graft_srv_sd_sv", svPath, "graft_srv_sd_dl", freshDir("sd_dl2"),
      buckets = 8)
    assert(dec2.strategy == "noop", dec2.toString)
  }

  test("serving legs join zero-Exchange and the union-of-joins equals the join of the current view") {
    val base = stateOf((0 until 60).map(i => (s"u$i", i.toDouble)))
      .localCheckpoint()
    val path = freshDir("legs")
    DurableState.writeZSum(base, "graft_srv_legs", path, shards = 16)
    val svPath = freshDir("legs_base")
    DurableState.refreshServing(spark, "graft_srv_legs",
      "graft_srv_legs_sv", svPath, buckets = 8)
    val d0 = stateOf(Seq(("u7", 100.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_legs", d0, 0L)
    DurableState.refreshServingDelta(spark, "graft_srv_legs",
      "graft_srv_legs_sv", svPath, "graft_srv_legs_dl",
      freshDir("legs_dl"), buckets = 8)
    graft.ops.Layout.bucketWrite(
      base.select(col("k"), col("n").as("base_n")),
      "graft_srv_legs_pb", freshDir("legs_pb"), buckets = 8, key = "k")
    val probe = spark.table("graft_srv_legs_pb")
    val prevThresh =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (baseLive, delta) = DurableState.servingLegs(spark,
        "graft_srv_legs_sv", "graft_srv_legs_dl")
      val legJoin = baseLive.join(probe, Seq("k"))
        .unionByName(delta.join(probe, Seq("k")))
      legJoin.collect()
      val plan = legJoin.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
        s"serving-leg joins must not shuffle:\n$plan")
      // distributed-join identity: the legs partition the key space,
      // so union-of-joins == join-of-the-union-view
      val viewJoin = DurableState.servingCurrent(spark,
        "graft_srv_legs_sv", "graft_srv_legs_dl").join(probe, Seq("k"))
      assert(legJoin.select(col("k"), col("n"),
        col("sum_v").cast("string"), col("base_n"))
        .as[(String, Long, String, Long)].collect().sorted.toSeq ==
        viewJoin.select(col("k"), col("n"),
          col("sum_v").cast("string"), col("base_n"))
          .as[(String, Long, String, Long)].collect().sorted.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("the byte crossover routes delta-vs-compact both ways; dropped keys disappear from the view") {
    val base = stateOf((0 until 60).map(i => (s"u$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("cmp")
    DurableState.writeZSum(base, "graft_srv_cmp", path, shards = 16)
    val svPath = freshDir("cmp_base")
    DurableState.refreshServing(spark, "graft_srv_cmp",
      "graft_srv_cmp_sv", svPath, buckets = 8)
    // batch 0: a RETRACTION that empties u3's whole key (its shard
    // may survive with other keys or drop — both must serve right)
    val d0 = stateOf(Seq(("u3", 1.0)), m = -1L).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_cmp", d0, 0L)
    val dec0 = DurableState.refreshServingDelta(spark, "graft_srv_cmp",
      "graft_srv_cmp_sv", svPath, "graft_srv_cmp_dl",
      freshDir("cmp_dl"), buckets = 8)
    assert(dec0.strategy == "delta", dec0.toString)
    val cur = DurableState.servingCurrent(spark, "graft_srv_cmp_sv",
      "graft_srv_cmp_dl")
    assert(cur.filter(col("k") === "u3").count() == 0L,
      "a retracted key must disappear from the serving view")
    assert(rowsOf(cur.select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(DurableState.readZSum(spark, "graft_srv_cmp")))
    // a DENSE batch (touches nearly every shard) crosses the byte
    // threshold: the refresh compacts — base rewritten fresh, delta
    // emptied, staleness 0
    val dense = stateOf((0 until 60).map(i => (s"u$i", 10.0)))
      .localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_cmp", dense, 1L)
    val baseFiles = parquetListing(svPath)
    val dec1 = DurableState.refreshServingDelta(spark, "graft_srv_cmp",
      "graft_srv_cmp_sv", svPath, "graft_srv_cmp_dl",
      freshDir("cmp_dl2"), buckets = 8)
    assert(dec1.strategy == "compact", dec1.toString)
    assert(dec1.byteFraction >= 0.5, dec1.toString)
    assert(parquetListing(svPath) != baseFiles,
      "compaction must rewrite the base")
    assert(spark.table("graft_srv_cmp_dl").count() == 0L,
      "compaction must empty the delta")
    assert(DurableState.servingStaleness(spark, "graft_srv_cmp",
      "graft_srv_cmp_dl") == 0L)
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_cmp_sv",
      "graft_srv_cmp_dl").select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(DurableState.readZSum(spark, "graft_srv_cmp")))
  }

  test("a vacuumed base version forces compaction (the changed set is no longer derivable)") {
    val base = stateOf((0 until 40).map(i => (s"u$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("vac")
    DurableState.writeZSum(base, "graft_srv_vac", path, shards = 8)
    val svPath = freshDir("vac_base")
    DurableState.refreshServing(spark, "graft_srv_vac",
      "graft_srv_vac_sv", svPath, buckets = 4)
    val d0 = stateOf(Seq(("u1", 2.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_vac", d0, 0L)
    val d1 = stateOf(Seq(("u2", 3.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_vac", d1, 1L)
    // vacuum to ONE retained version: the base's served version (1)
    // is gone
    DurableState.vacuumSnapshots(spark, "graft_srv_vac",
      keepVersions = 1)
    val dec = DurableState.refreshServingDelta(spark, "graft_srv_vac",
      "graft_srv_vac_sv", svPath, "graft_srv_vac_dl",
      freshDir("vac_dl"), buckets = 4)
    assert(dec.strategy == "compact", dec.toString)
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_vac_sv",
      "graft_srv_vac_dl").select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(DurableState.readZSum(spark, "graft_srv_vac")))
  }

  test("a serving pair from a PREVIOUS store incarnation is dead state: refresh compacts, the loop re-bootstraps, never a silent noop") {
    // first incarnation: store + base + delta pair, all fresh
    val base1 = stateOf((0 until 30).map(i => (s"u$i", 1.0)))
      .localCheckpoint()
    val path1 = freshDir("inc1")
    DurableState.writeZSum(base1, "graft_srv_inc", path1, shards = 8)
    val svPath = freshDir("inc_base")
    DurableState.refreshServing(spark, "graft_srv_inc",
      "graft_srv_inc_sv", svPath, buckets = 4)
    val d0 = stateOf(Seq(("u1", 5.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_inc", d0, 0L)
    assert(DurableState.refreshServingDelta(spark, "graft_srv_inc",
      "graft_srv_inc_sv", svPath, "graft_srv_inc_dl",
      freshDir("inc_dl"), buckets = 4).strategy == "delta")
    // RESET: a new incarnation of the store under the same name —
    // manifest versions and batch ids restart, so the old pair's
    // numbers can look exactly "fresh" while describing dead state
    // (the bench caught precisely this: a replayed gate saw "noop")
    val base2 = stateOf((0 until 30).map(i => (s"u$i", 7.0)))
      .localCheckpoint()
    DurableState.writeZSum(base2, "graft_srv_inc", freshDir("inc2"),
      shards = 8)
    val d1 = stateOf(Seq(("u2", 2.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_inc", d1, 0L)
    val dec = DurableState.refreshServingDelta(spark, "graft_srv_inc",
      "graft_srv_inc_sv", svPath, "graft_srv_inc_dl",
      freshDir("inc_dl2"), buckets = 4)
    assert(dec.strategy == "compact",
      s"a dead-incarnation pair must force a full compact: $dec")
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_inc_sv",
      "graft_srv_inc_dl").select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(Incremental.mergeZSum(base2, d1)))
    // and the one-call loop: reset again, the stale pair must read
    // as ABSENT (bootstrap), not as "ahead of" the new store
    val base3 = stateOf((0 until 30).map(i => (s"u$i", 3.0)))
      .localCheckpoint()
    DurableState.writeZSum(base3, "graft_srv_inc", freshDir("inc3"),
      shards = 8)
    val d2 = stateOf(Seq(("u3", 4.0))).localCheckpoint()
    val r = DurableState.maintainAndServe(spark, "graft_srv_inc", d2,
      col("k"),
      (sl: org.apache.spark.sql.DataFrame,
       d: org.apache.spark.sql.DataFrame) =>
        Incremental.mergeZSum(sl, d),
      0L, "graft_srv_inc_sv", svPath, "graft_srv_inc_dl",
      freshDir("inc_dl3"), buckets = 4, cadence = 1L)
    assert(r.serving.nonEmpty && r.stalenessAfter == 0L,
      s"the loop must re-bootstrap over a dead pair: $r")
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_inc_sv",
      "graft_srv_inc_dl").select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(Incremental.mergeZSum(base3, d2)))
  }

  test("a reshard between delta publication and read cannot corrupt latest-wins: the stamped modulus filters, the next refresh compacts") {
    val base = stateOf((0 until 40).map(i => (s"u$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("rsv")
    DurableState.writeZSum(base, "graft_srv_rsv", path, shards = 16)
    val svPath = freshDir("rsv_base")
    DurableState.refreshServing(spark, "graft_srv_rsv",
      "graft_srv_rsv_sv", svPath, buckets = 4)
    val d0 = stateOf(Seq(("u5", 9.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_rsv", d0, 0L)
    DurableState.refreshServingDelta(spark, "graft_srv_rsv",
      "graft_srv_rsv_sv", svPath, "graft_srv_rsv_dl",
      freshDir("rsv_dl"), buckets = 4)
    val want = rowsOf(Incremental.mergeZSum(base, d0))
    // the source RESHARDS (16 → 8) after the pair was published: the
    // pair still describes the same rows, and the latest-wins filter
    // must use the modulus stamped AT PUBLICATION — the live modulus
    // would assign u5's superseded base row to a different shard id
    // and duplicate it into the view
    DurableState.reshardKeyed(spark, "graft_srv_rsv", 8)
    val cur = DurableState.servingCurrent(spark, "graft_srv_rsv_sv",
      "graft_srv_rsv_dl")
    assert(cur.groupBy(col("k")).count().filter(col("count") > 1L)
      .count() == 0L, "no key may appear twice in the view")
    assert(rowsOf(cur.select(col("k"), col("n"), col("sum_v"))) == want)
    // a reshard stamps EVERY shard, so the next refresh compacts and
    // the pair tracks the resharded store exactly
    val dec = DurableState.refreshServingDelta(spark, "graft_srv_rsv",
      "graft_srv_rsv_sv", svPath, "graft_srv_rsv_dl",
      freshDir("rsv_dl2"), buckets = 4)
    assert(dec.strategy == "compact", dec.toString)
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_rsv_sv",
      "graft_srv_rsv_dl").select(col("k"), col("n"), col("sum_v"))) ==
      want)
  }

  test("a half-published alias (view without stamps) self-heals through the deployment loop") {
    val base = stateOf((0 until 20).map(i => (s"u$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("wdg")
    DurableState.writeZSum(base, "graft_srv_wdg", path, shards = 8)
    // simulate the pre-fix crash window: an alias exists as a bare
    // view with NO serving properties (publishServing now lands view
    // + stamps in one statement, but a wedged alias from any source
    // must still heal, not throw forever)
    spark.sql("CREATE OR REPLACE VIEW graft_srv_wdg_sv AS SELECT 1 AS x")
    val d0 = stateOf(Seq(("u1", 4.0))).localCheckpoint()
    val r = DurableState.maintainAndServe(spark, "graft_srv_wdg", d0,
      col("k"),
      (sl: org.apache.spark.sql.DataFrame,
       d: org.apache.spark.sql.DataFrame) =>
        Incremental.mergeZSum(sl, d),
      0L, "graft_srv_wdg_sv", freshDir("wdg_base"), "graft_srv_wdg_dl",
      freshDir("wdg_dl"), buckets = 4, cadence = 1L)
    assert(r.serving.nonEmpty && r.stalenessAfter == 0L,
      s"the loop must re-bootstrap over a stampless alias: $r")
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_wdg_sv",
      "graft_srv_wdg_dl").select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(Incremental.mergeZSum(base, d0)))
  }

  test("serving publication is an atomic alias flip: in-flight plans survive one refresh, the flip never exposes a missing table") {
    val base = stateOf((0 until 30).map(i => (s"u$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("pub")
    DurableState.writeZSum(base, "graft_srv_pub", path, shards = 8)
    val svPath = freshDir("pub_base")
    DurableState.refreshServing(spark, "graft_srv_pub",
      "graft_srv_pub_sv", svPath, buckets = 4)
    // the alias is a VIEW over the versioned physical table
    assert(spark.catalog.getTable("graft_srv_pub_sv").tableType
      == "VIEW")
    assert(spark.catalog.tableExists("graft_srv_pub_sv__v1"))
    // an in-flight consumer: plan resolved BEFORE the next refresh
    val pinned = spark.table("graft_srv_pub_sv")
      .select(col("k"), col("n"), col("sum_v"))
    val d0 = stateOf(Seq(("u1", 9.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_pub", d0, 0L)
    DurableState.refreshServing(spark, "graft_srv_pub",
      "graft_srv_pub_sv", svPath, buckets = 4)
    // the flip happened (v2 live), but the GRANDFATHERED v1 keeps
    // the pinned plan collectable — it reads the state it resolved
    assert(rowsOf(pinned) == rowsOf(base),
      "an in-flight plan must survive one refresh with its own state")
    assert(rowsOf(spark.table("graft_srv_pub_sv")
      .select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(Incremental.mergeZSum(base, d0)),
      "the alias must serve the new version")
    // a SECOND refresh retires v1: two-refresh-stale plans die
    // loudly (missing table/files), never silently
    val d1 = stateOf(Seq(("u2", 3.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_srv_pub", d1, 1L)
    DurableState.refreshServing(spark, "graft_srv_pub",
      "graft_srv_pub_sv", svPath, buckets = 4)
    assert(!spark.catalog.tableExists("graft_srv_pub_sv__v1"),
      "v1 must retire at the second refresh")
    assert(spark.catalog.tableExists("graft_srv_pub_sv__v2"))
    intercept[Exception] { pinned.collect() }
  }

  test("maintainAndServe through a REAL checkpoint restart: staleness bounded by the cadence, replays no-op end to end") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.ZRow
    val base = stateOf(Seq(("a", 1.0), ("b", 2.0))).localCheckpoint()
    val path = freshDir("mas")
    DurableState.writeZSum(base, "graft_srv_mas", path, shards = 8)
    val svPath = freshDir("mas_base")
    val dlPath = freshDir("mas_dl")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_mas").toString
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val served = new java.util.concurrent.ConcurrentLinkedQueue[
      DurableState.Served]()
    val mem = MemoryStream[ZRow]
    def start() = mem.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[ZRow], id: Long) =>
        val delta = Incremental.stateZSum(df.toDF(),
          col("key"), col("value"), col("mult")).localCheckpoint()
        val s = DurableState.maintainAndServe(spark, "graft_srv_mas",
          delta, col("k"),
          (sl: org.apache.spark.sql.DataFrame,
           d: org.apache.spark.sql.DataFrame) =>
            Incremental.mergeZSum(sl, d),
          id, "graft_srv_mas_sv", svPath, "graft_srv_mas_dl", dlPath,
          buckets = 4, cadence = 1L)
        served.add(s)
        if (crashOnce.getAndSet(false))
          sys.error("injected sink crash AFTER maintainAndServe")
        ()
      }.start()
    val q1 = start()
    mem.addData(ZRow("a", 5.0, 1L))
    q1.processAllAvailable()
    q1.stop()
    // every completed tick leaves the pair FRESH (cadence 1 → the
    // serving view is never behind after the call returns)
    assert(served.size() == 1)
    assert(served.peek().stalenessAfter == 0L)
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_mas_sv",
      "graft_srv_mas_dl").select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(Incremental.mergeZSum(base, stateOf(Seq(("a", 5.0))))))
    // batch 1 folds + serves, then the sink dies before the
    // checkpoint acknowledges — the restarted query REDELIVERS it
    mem.addData(ZRow("c", 7.0, 1L))
    crashOnce.set(true)
    val q2 = start()
    intercept[Throwable] { q2.processAllAvailable() }
    scala.util.Try(q2.stop())
    val q3 = start()
    q3.processAllAvailable()
    mem.addData(ZRow("b", 2.0, -1L)) // batch 2: retract b entirely
    q3.processAllAvailable()
    q3.stop()
    val replays = served.toArray(Array.empty[DurableState.Served])
      .filter(_.maintained.decision.strategy == "replay")
    assert(replays.nonEmpty, "the redelivered batch must route replay")
    assert(replays.forall(_.serving.isEmpty),
      "a replayed batch must not trigger a refresh")
    val want = Incremental.mergeZSum(
      Incremental.mergeZSum(base,
        stateOf(Seq(("a", 5.0), ("c", 7.0)))),
      stateOf(Seq(("b", 2.0)), m = -1L))
    assert(rowsOf(DurableState.readZSum(spark, "graft_srv_mas")) ==
      rowsOf(want))
    assert(rowsOf(DurableState.servingCurrent(spark, "graft_srv_mas_sv",
      "graft_srv_mas_dl").select(col("k"), col("n"), col("sum_v"))) ==
      rowsOf(want), "the serving pair must track the store")
    assert(DurableState.servingCurrent(spark, "graft_srv_mas_sv",
      "graft_srv_mas_dl").filter(col("k") === "b").count() == 0L)
    assert(served.toArray(Array.empty[DurableState.Served])
      .forall(_.stalenessAfter == 0L),
      "cadence 1 must leave every completed tick fresh")
  }
}
