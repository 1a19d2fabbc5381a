package graft

import org.apache.spark.sql.functions._
import graft.ops.{DurableState, Incremental, Scd2}

/** Manifest-pinned snapshot reads over the durable store (r17, r16
  * verdict item 1): every mutation writes a manifest and RETIRES the
  * directories it replaces under `_snap` (one rename — never a
  * delete), so an external reader plans from a manifest and can
  * never see the torn cross-shard state the live catalog scan could
  * observe mid-apply. Retaining manifests is time travel; vacuum
  * bounds the history; pruneKeyed is retention as a staged commit.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_snap_$tag").toString

  private def stateOf(rows: Seq[(String, Double)], m: Long = 1L) =
    Incremental.stateZSum(rows.toDF("g", "v"), col("g"), col("v"), lit(m))

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("n"), col("sum_v").cast("string"))
      .as[(String, Long, String)].collect().toSet

  test("every mutation appends a manifest; readKeyedAt time-travels each version bit-exactly") {
    val base = stateOf((0 until 40).map(i => (s"k$i", (i % 5).toDouble)))
      .localCheckpoint()
    val path = freshDir("tt")
    DurableState.writeZSum(base, "graft_snap_tt", path, shards = 8)
    val d0 = stateOf(Seq(("k3", 2.5), ("k7", 1.0))).localCheckpoint()
    DurableState.maintainZSum(spark, "graft_snap_tt", d0) // caller fold
    val d1 = stateOf(Seq(("k3", 4.0)), m = -1L).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_snap_tt", d1, 0L)
    assert(DurableState.snapshotVersions(spark, "graft_snap_tt") ==
      Seq(1L, 2L, 3L))
    val v1 = rowsOf(base)
    val v2 = rowsOf(Incremental.mergeZSum(base, d0))
    val v3 = rowsOf(Incremental.mergeZSum(
      Incremental.mergeZSum(base, d0), d1))
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_tt", 1L))
      == v1, "version 1 must be the bootstrap state")
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_tt", 2L))
      == v2, "version 2 must be the post-fold state")
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_tt", 3L))
      == v3, "version 3 must be the post-batch state")
    assert(rowsOf(DurableState.readKeyedSnapshot(spark, "graft_snap_tt"))
      == rowsOf(DurableState.readZSum(spark, "graft_snap_tt")),
      "the latest snapshot must equal the live read")
  }

  test("a HALF-APPLIED commit frozen on disk: the pinned pre-commit read is bit-exact while swapped-in dirs are live") {
    val base = stateOf((0 until 40).map(i => (s"k$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("torn")
    DurableState.writeZSum(base, "graft_snap_torn", path, shards = 8)
    val d0 = stateOf(Seq(("k5", 3.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_snap_torn", d0, 0L)
    val wantPre = rowsOf(Incremental.mergeZSum(base, d0))
    // batch 1 touches TWO different shards; stage it + the marker BY
    // HAND (the on-disk protocol contract), then apply exactly ONE
    // of the two shard swaps and freeze — the exact mid-apply window
    // an external reader could race
    val twoKeys = Seq("k1", "k2", "k3", "k4").map { k =>
      k -> DurableState.touchedShards(
        stateOf(Seq((k, 1.0))), col("k"), 8).head
    }
    val (ka, sa) = twoKeys.head
    val (kb, sb) = twoKeys.find(_._2 != sa).get
    val d1 = stateOf(Seq((ka, 10.0), (kb, 20.0))).localCheckpoint()
    val touched = DurableState.touchedShards(d1, col("k"), 8)
    assert(touched.toSet == Set(sa, sb))
    val slice = DurableState
      .shardSlice(spark, "graft_snap_torn", touched).drop("_shard")
    Incremental.mergeZSum(slice, d1)
      .withColumn("_shard", DurableState.shardOf(col("k"), 8))
      .repartition(col("_shard"))
      .write.partitionBy("_shard").parquet(s"$path/_staging_b1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_commit_b1.txt"),
      (s"batch=1\nadvance=1\nver=3\npresent=${touched.mkString(",")}\n" +
        "drops=\n").getBytes("UTF-8"))
    // half-apply: shard `sa` retires + swaps; shard `sb` stays old
    def mv(from: String, to: String): Unit = {
      val t = java.nio.file.Paths.get(to)
      java.nio.file.Files.createDirectories(t.getParent)
      java.nio.file.Files.move(java.nio.file.Paths.get(from), t)
    }
    mv(s"$path/_shard=$sa", s"$path/_snap/v3/_shard=$sa")
    mv(s"$path/_staging_b1/_shard=$sa", s"$path/_shard=$sa")
    spark.catalog.refreshTable("graft_snap_torn")
    // the LIVE layout is now torn (shard sa post-batch, sb pre) —
    // but the pinned manifest read returns the pre-commit state
    // bit-exactly, which is the whole point of the manifest layer
    val latest = DurableState.snapshotVersions(
      spark, "graft_snap_torn").last
    assert(latest == 2L, "the half-applied commit has no manifest yet")
    val pinned = rowsOf(
      DurableState.readKeyedAt(spark, "graft_snap_torn", 2L))
    assert(pinned == wantPre,
      "pinned pre-commit read must not see the half-applied batch")
    val torn = rowsOf(spark.table("graft_snap_torn").drop("_shard")
      .select(col("k"), col("n"), col("sum_v")))
    assert(torn != wantPre && torn != rowsOf(
      Incremental.mergeZSum(Incremental.mergeZSum(base, d0), d1)),
      "sanity: the live layout IS torn while the snapshot is clean")
    // recovery (redelivered batch with poison payload) rolls the
    // SAME staged bytes forward; both versions readable after
    val poison = stateOf(Seq((ka, 999.0))).localCheckpoint()
    val got = DurableState.maintainZSumBatch(
      spark, "graft_snap_torn", poison, 1L)
    val wantPost = rowsOf(Incremental.mergeZSum(
      Incremental.mergeZSum(base, d0), d1))
    assert(rowsOf(got) == wantPost, "heal must finish the staged batch")
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_torn", 3L))
      == wantPost)
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_torn", 2L))
      == wantPre, "the pre-commit version must survive the heal")
  }

  test("a pinned version re-plans bit-exactly after later folds; a stale pinned PLAN fails loudly, never mixed") {
    val base = stateOf((0 until 20).map(i => (s"k$i", 2.0)))
      .localCheckpoint()
    val path = freshDir("iso")
    DurableState.writeZSum(base, "graft_snap_iso", path, shards = 8)
    val pinnedPlan = DurableState.readKeyedSnapshot(spark, "graft_snap_iso")
    val d0 = stateOf(Seq(("k1", 7.0))).localCheckpoint()
    DurableState.maintainZSum(spark, "graft_snap_iso", d0)
    // re-planning version 1 AFTER the fold still returns the
    // bootstrap state bit-exactly: the fold retired the replaced
    // directory instead of deleting it
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_iso", 1L))
      == rowsOf(base))
    // the PLAN pinned before the fold points at a live directory the
    // fold retired: it must fail LOUDLY (missing files), never
    // return a silent mix of old and new bytes
    val e = intercept[Exception] { pinnedPlan.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("does not exist") ||
      m.contains("FileNotFound") || m.contains("No such file")),
      s"stale plan must die on missing files, got: ${msgs(e)}")
  }

  test("vacuumSnapshots keeps the newest N versions readable and deletes unreachable history only") {
    val base = stateOf((0 until 30).map(i => (s"k$i", 1.0)))
      .localCheckpoint()
    val path = freshDir("vac")
    DurableState.writeZSum(base, "graft_snap_vac", path, shards = 8)
    val deltas = Seq(
      stateOf(Seq(("k1", 1.0))), stateOf(Seq(("k2", 2.0))),
      stateOf(Seq(("k3", 3.0))))
    var cur = base
    val states = scala.collection.mutable.ArrayBuffer(rowsOf(base))
    deltas.zipWithIndex.foreach { case (d, i) =>
      val dc = d.localCheckpoint()
      DurableState.maintainZSumBatch(spark, "graft_snap_vac", dc, i.toLong)
      cur = Incremental.mergeZSum(cur, dc).localCheckpoint()
      states += rowsOf(cur)
    }
    assert(DurableState.snapshotVersions(spark, "graft_snap_vac") ==
      Seq(1L, 2L, 3L, 4L))
    DurableState.vacuumSnapshots(spark, "graft_snap_vac", keepVersions = 2)
    assert(DurableState.snapshotVersions(spark, "graft_snap_vac") ==
      Seq(3L, 4L), "older manifests must retire")
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_vac", 3L))
      == states(2))
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_vac", 4L))
      == states(3))
    val gone = intercept[IllegalArgumentException] {
      DurableState.readKeyedAt(spark, "graft_snap_vac", 1L)
    }
    assert(gone.getMessage.contains("no manifest version 1"))
    // _snap holds ONLY directories some retained manifest resolves
    // to: version 3 pins the pre-state of the batch-3 touched shard
    // (retired at v4); everything older is unreachable and gone
    val snap = new java.io.File(s"$path/_snap")
    val kept =
      if (!snap.exists()) Set.empty[String]
      else snap.listFiles().flatMap(v =>
        v.listFiles().map(s => s"${v.getName}/${s.getName}")).toSet
    val s3 = DurableState.touchedShards(
      deltas(2).localCheckpoint(), col("k"), 8).head
    assert(kept == Set(s"v4/_shard=$s3"),
      s"retained history must be exactly v4's replaced shard, got $kept")
  }

  test("pruneKeyed: durable SCD2 retention — affected shards only, snapshot-covered, folds keep absolute versions") {
    // only u0 carries history below the horizon — every other key's
    // intervals close above it, so their shards must NOT rewrite
    val early = Seq(("u0", 1L, "e1", 10L), ("u0", 2L, "e2", 20L),
      ("u0", 3L, "e3", 500L))
    val rest = (1 to 11).flatMap { k =>
      Seq((s"u$k", (100 + k * 2).toLong, "x", (200 + k).toLong),
        (s"u$k", (101 + k * 2).toLong, "y", (400 + k).toLong))
    }
    val events = (early ++ rest)
      .toDF("key", "event_id", "attr", "ts").localCheckpoint()
    val store = Scd2.build(events, col("key"), col("event_id"),
      col("attr"), col("ts")).localCheckpoint()
    val path = freshDir("prune")
    DurableState.writeKeyed(store, "graft_snap_prune", path,
      shards = 8, keyCol = "key")
    val horizon = 100L
    val keep = col("valid_to").isNull || col("valid_to") > horizon
    val before = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_shard=")).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
    val stats = DurableState.pruneKeyed(spark, "graft_snap_prune", keep)
    assert(stats.affectedShards.nonEmpty)
    // equality with the in-memory retention kernel
    val want = Scd2.pruneFrozen(store, horizon)
    def scd2Rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("key"), col("event_id"), col("version"),
        col("attr"), col("valid_from"), col("valid_to"),
        col("is_current"))
        .as[(String, Long, Long, String, Long, Option[Long], Boolean)]
        .collect().toSet
    assert(scd2Rows(DurableState.readKeyed(spark, "graft_snap_prune")
      .select(store.columns.map(col): _*)) == scd2Rows(want))
    // UNAFFECTED shards' files are byte-identical (not rewritten)
    val after = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_shard="))
      .filterNot(d => stats.affectedShards.contains(
        d.getName.stripPrefix("_shard=").toInt))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
    assert(after.nonEmpty && after.forall { case (p, m) =>
      before.get(p).contains(m)
    }, "untouched shards must not rewrite")
    // the pre-prune state stays pinned for snapshot readers
    val preVer = DurableState.snapshotVersions(
      spark, "graft_snap_prune").init.last
    assert(scd2Rows(DurableState.readKeyedAt(
      spark, "graft_snap_prune", preVer)) == scd2Rows(store))
    // late events (ts above the horizon) fold against the PRUNED
    // durable store with absolute versions intact: equality with the
    // full-log build filtered at the horizon
    val late = Seq(("u0", 2000L, "lateA", 600L),
      ("u3", 2001L, "lateB", 650L))
      .toDF("key", "event_id", "attr", "ts").localCheckpoint()
    DurableState.maintainKeyed(spark, "graft_snap_prune", late,
      col("key"),
      (slice, d) => Scd2.deltaMaintain(slice, d, col("key"),
        col("event_id"), col("attr"), col("ts")),
      canEmpty = false)
    val wantFold = Scd2.pruneFrozen(
      Scd2.build(events.unionByName(late), col("key"),
        col("event_id"), col("attr"), col("ts")), horizon)
    assert(scd2Rows(DurableState.readKeyed(spark, "graft_snap_prune")
      .select(store.columns.map(col): _*)) == scd2Rows(wantFold),
      "post-prune folds must equal the full-log build at the horizon")
  }

  test("snapshotDiff: the signed Z-delta between versions — exact, composable, direction-symmetric, shard-pruned") {
    val base = stateOf((0 until 40).map(i => (s"k$i", (i % 5).toDouble)))
      .localCheckpoint()
    val path = freshDir("diff")
    DurableState.writeZSum(base, "graft_snap_diff", path, shards = 16)
    val d0 = stateOf(Seq(("k1", 2.5))).localCheckpoint() // change k1
    DurableState.maintainZSumBatch(spark, "graft_snap_diff", d0, 0L)
    // retract k2 entirely, add a NEW key
    val d1 = Incremental.mergeZSum(
        stateOf(Seq(("k2", 2.0)), m = -1L),
        stateOf(Seq(("k99", 9.0))))
      .localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_snap_diff", d1, 1L)
    def zRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("n"), col("sum_v").cast("string"),
        col("mult")).as[(String, Long, String, Long)].collect().toSet
    def vAt(v: Long) = DurableState.readKeyedAt(spark,
      "graft_snap_diff", v).select(col("k"), col("n"), col("sum_v"))
    // exactness vs the exceptAll ground truth, both hops
    for ((f, t) <- Seq((1L, 2L), (2L, 3L), (1L, 3L))) {
      val diff = DurableState.snapshotDiff(spark, "graft_snap_diff", f, t)
      val want = vAt(t).exceptAll(vAt(f)).withColumn("mult", lit(1L))
        .unionByName(
          vAt(f).exceptAll(vAt(t)).withColumn("mult", lit(-1L)))
      assert(zRows(diff) == zRows(want), s"diff $f->$t")
    }
    // the retracted key leaves with −1 and the new key enters with +1
    val d13 = DurableState.snapshotDiff(spark, "graft_snap_diff", 1L, 3L)
    assert(d13.filter(col("k") === "k2" && col("mult") === -1L)
      .count() == 1L)
    assert(d13.filter(col("k") === "k99" && col("mult") === 1L)
      .count() == 1L)
    // composition: diff(1,3) == Z-merge of diff(1,2) ⊎ diff(2,3)
    val merged = DurableState.snapshotDiff(spark, "graft_snap_diff",
        1L, 2L)
      .unionByName(
        DurableState.snapshotDiff(spark, "graft_snap_diff", 2L, 3L))
      .groupBy(col("k"), col("n"), col("sum_v"))
      .agg(sum(col("mult")).as("mult"))
      .filter(col("mult") =!= 0L)
    assert(zRows(merged) == zRows(d13), "diffs must compose")
    // direction: swapping the versions negates mult
    val d31 = DurableState.snapshotDiff(spark, "graft_snap_diff", 3L, 1L)
    assert(zRows(d31) == zRows(d13.withColumn("mult", -col("mult"))))
    // SHARD PRUNING: between v2 and v3 only d1's touched shards can
    // differ — the resolved read set excludes every other shard
    val touched1 = DurableState.touchedShards(d1, col("k"), 16).toSet
    val changed23 = DurableState.changedShardsBetween(spark,
      "graft_snap_diff", 2L, 3L)._3.toSet
    assert(changed23 == touched1,
      s"changed set $changed23 must be exactly d1's shards $touched1")
    val changed12 = DurableState.changedShardsBetween(spark,
      "graft_snap_diff", 1L, 2L)._3.toSet
    assert(changed12 ==
      DurableState.touchedShards(d0, col("k"), 16).toSet)
    // the CDC contract: a consumer exports (version, incarnation);
    // the matching incarnation diffs fine, and after a writeKeyed
    // RESET (numbering restarted) the stale expectation dies loudly
    // instead of silently diffing two unrelated histories
    val inc = DurableState.storeIncarnation(spark, "graft_snap_diff")
    assert(zRows(DurableState.snapshotDiff(spark, "graft_snap_diff",
      1L, 3L, expectIncarnation = Some(inc))) == zRows(d13))
    DurableState.writeZSum(base, "graft_snap_diff",
      freshDir("diff_reset"), shards = 16)
    val eInc = intercept[IllegalArgumentException] {
      DurableState.snapshotDiff(spark, "graft_snap_diff", 1L, 2L,
        expectIncarnation = Some(inc))
    }
    assert(eInc.getMessage.contains("re-export in full"),
      eInc.getMessage)
  }

  test("time travel crosses reshard, prune, and full-rebuild boundaries bit-exactly") {
    // the resolution rule must hold when the LAYOUT ITSELF changes:
    // a reshard retires every old-modulus directory, a prune shrinks
    // shards, a routed full rebuild swaps the whole store — each is
    // one more commit, and every prior version must keep reading
    val base = stateOf((0 until 40).map(i => (s"k$i", i.toDouble)))
      .localCheckpoint()
    val path = freshDir("xb")
    DurableState.writeZSum(base, "graft_snap_xb", path, shards = 8)
    val d0 = stateOf(Seq(("k1", 100.0))).localCheckpoint()
    DurableState.maintainZSumBatch(spark, "graft_snap_xb", d0, 0L) // v2
    val v2 = Incremental.mergeZSum(base, d0).localCheckpoint()
    DurableState.reshardKeyed(spark, "graft_snap_xb", 16) // v3
    DurableState.pruneKeyed(spark, "graft_snap_xb",
      col("sum_v") >= 10.0) // v4
    val v4 = v2.filter(col("sum_v") >= 10.0).localCheckpoint()
    // a dense delta routes to the full-rebuild arm (staged whole)
    val dense = stateOf((0 until 40).map(i => (s"k$i", 1.0)))
      .localCheckpoint()
    val r = DurableState.maintainAuto(spark, "graft_snap_xb", dense,
      col("k"), (sl: org.apache.spark.sql.DataFrame,
          d: org.apache.spark.sql.DataFrame) =>
        Incremental.mergeZSum(sl, d)) // v5
    assert(r.decision.strategy == "rebuild", r.decision.toString)
    val v5 = Incremental.mergeZSum(v4, dense).localCheckpoint()
    assert(DurableState.snapshotVersions(spark, "graft_snap_xb") ==
      Seq(1L, 2L, 3L, 4L, 5L))
    def at(v: Long) = rowsOf(DurableState.readKeyedAt(spark,
      "graft_snap_xb", v))
    assert(at(1L) == rowsOf(base), "v1 across 4 structural commits")
    assert(at(2L) == rowsOf(v2), "v2 across reshard+prune+rebuild")
    assert(at(3L) == rowsOf(v2), "the reshard is physical only")
    assert(at(4L) == rowsOf(v4), "the pruned version")
    assert(at(5L) == rowsOf(v5), "the rebuilt current state")
    assert(at(5L) == rowsOf(DurableState.readZSum(spark,
      "graft_snap_xb")))
    // vacuum to the newest two: they survive, the rest is loud
    DurableState.vacuumSnapshots(spark, "graft_snap_xb",
      keepVersions = 2)
    assert(at(4L) == rowsOf(v4) && at(5L) == rowsOf(v5))
    intercept[IllegalArgumentException] {
      DurableState.readKeyedAt(spark, "graft_snap_xb", 2L)
    }
  }

  test("a torn prune heals: staged retention rolls forward to BOTH the layout and its manifest, or neither ran") {
    val base = stateOf((0 until 30).map(i => (s"k$i", i.toDouble)))
      .localCheckpoint()
    val path = freshDir("ptorn")
    DurableState.writeZSum(base, "graft_snap_ptorn", path, shards = 8)
    // a real prune first, to learn the staged layout it produces
    val keep = col("sum_v") >= 10.0
    // inject: stage the prune output + marker (advance=0), apply
    // NOTHING — the crash-before-any-swap window
    val pruned = DurableState.readZSum(spark, "graft_snap_ptorn")
      .filter(keep)
      .withColumn("_shard", DurableState.shardOf(col("k"), 8))
      .repartition(col("_shard"))
    pruned.write.partitionBy("_shard").parquet(s"$path/_staging_b0")
    val present = new java.io.File(s"$path/_staging_b0").listFiles()
      .map(_.getName).filter(_.startsWith("_shard="))
      .map(_.stripPrefix("_shard=").toInt).toSeq.sorted
    val affected = (0 until 8).toSeq
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_commit_b0.txt"),
      (s"batch=0\nadvance=0\nver=2\npresent=${present.mkString(",")}\n" +
        s"drops=${affected.filterNot(present.toSet).mkString(",")}\n")
        .getBytes("UTF-8"))
    // ANY maintenance entry heals it (here: an empty caller fold)
    DurableState.maintainZSum(spark, "graft_snap_ptorn",
      stateOf(Nil).localCheckpoint())
    val want = rowsOf(base.filter(col("sum_v") >= 10.0))
    assert(rowsOf(DurableState.readZSum(spark, "graft_snap_ptorn"))
      == want, "the committed prune must roll forward")
    assert(rowsOf(DurableState.readKeyedSnapshot(
      spark, "graft_snap_ptorn")) == want)
    assert(!new java.io.File(s"$path/_commit_b0.txt").exists())
    assert(!new java.io.File(s"$path/_staging_b0").exists())
    // and version 1 still reads the unpruned bootstrap
    assert(rowsOf(DurableState.readKeyedAt(spark, "graft_snap_ptorn", 1L))
      == rowsOf(base))
  }
}
