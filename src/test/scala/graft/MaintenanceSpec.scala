package graft

import org.apache.spark.sql.functions._

/** The insert-only maintenance members ENFORCE their delete contract
  * (r15, r14 verdict item 5): a delta batch carrying a signed `mult`
  * column with a negative row fails loudly at execution, naming the
  * member, its structural reason, and the full-recompute pointer —
  * instead of silently folding a delete the member's algebra cannot
  * express. Frames without a `mult` column (the normal append shape)
  * and all-positive `mult` frames pass through untouched.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  /** The guard surfaces as a task failure; walk the cause chain. */
  private def loudFail(frag: String)(body: => Any): Unit = {
    val e = intercept[Throwable](body)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains(frag) &&
      m.contains("delete batches are out of scope")),
      msgs(e).mkString("\n---\n"))
  }

  test("Maintenance.insertOnly passes mult-free and positive-mult frames untouched") {
    import graft.ops.Maintenance
    val plain = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Maintenance.insertOnly(plain, "m", "r").collect().toSet ==
      plain.collect().toSet)
    val pos = Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "v", "mult")
    assert(Maintenance.insertOnly(pos, "m", "r").collect().toSet ==
      pos.collect().toSet)
    loudFail("m:") {
      Maintenance.insertOnly(
        Seq((1L, "a", -1L)).toDF("id", "v", "mult"), "m", "r").collect()
    }
  }

  test("Scd2.deltaMaintain rejects a delete batch loudly") {
    import graft.ops.Scd2
    val base = Seq((1L, 101L, "a", 10L)).toDF("uid", "eid", "at", "ets")
    val store = Scd2.build(base, col("uid"), col("eid"), col("at"),
      col("ets")).localCheckpoint()
    val del = Seq((1L, 101L, "a", 10L, -1L))
      .toDF("uid", "eid", "at", "ets", "mult")
    loudFail("Scd2.deltaMaintain") {
      Scd2.deltaMaintain(store, del, col("uid"), col("eid"),
        col("at"), col("ets")).collect()
    }
  }

  test("AsOf.deltaJoin rejects delete batches loudly; the input mult flag is reserved and enforcement survives output renaming") {
    import graft.ops.AsOf
    // the INPUT signed-multiplicity convention is the reserved
    // LITERAL column "mult", independent of the member's output
    // `mult` param (r15 advice, resolved the other way: threading
    // the output name into the input guard is structurally dead —
    // an input column named like the output Z column collides at
    // analysis before any guard row executes — so "mult" is
    // reserved, guarded, then dropped; see AsOf.deltaJoin)
    def T(rows: Seq[(Long, String, Long, Long)]) =
      rows.toDF("trade_id", "sym", "t_ts", "mult")
    def Q(rows: Seq[(String, Long, Double, Long)]) =
      rows.toDF("q_sym", "q_ts", "px", "mult")
    // default mult name: a delete on either side fails loudly
    loudFail("AsOf.deltaJoin") {
      AsOf.deltaJoin(
        T(Seq((1L, "A", 100L, 1L))), T(Seq((2L, "A", 200L, -1L))),
        Q(Seq(("A", 50L, 1.0, 1L))), Q(Seq(("A", 150L, 2.0, 1L))),
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px"))).collect()
    }
    loudFail("AsOf.deltaJoin") {
      AsOf.deltaJoin(
        T(Seq((1L, "A", 100L, 1L))), T(Seq((2L, "A", 200L, 1L))),
        Q(Seq(("A", 50L, 1.0, 1L))), Q(Seq(("A", 150L, 2.0, -1L))),
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px"))).collect()
    }
    // renamed OUTPUT mult: enforcement still fires — the input Z
    // convention is the reserved literal "mult" column, so renaming
    // the output cannot weaken delete enforcement
    loudFail("AsOf.deltaJoin") {
      AsOf.deltaJoin(
        T(Seq((1L, "A", 100L, 1L))), T(Seq((2L, "A", 200L, -1L))),
        Q(Seq(("A", 50L, 1.0, 1L))), Q(Seq(("A", 150L, 2.0, 1L))),
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")), mult = "zm").collect()
    }
    // all-positive flags pass; the flag column is DROPPED from the
    // output and the Z column rides under the caller's name — even
    // the default "mult" name cannot collide with the input flag
    val out = AsOf.deltaJoin(
      T(Seq((1L, "A", 100L, 1L))), T(Seq((2L, "A", 200L, 1L))),
      Q(Seq(("A", 50L, 1.0, 1L))), Q(Seq(("A", 150L, 2.0, 1L))),
      col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
      rightPayload = Seq("px" -> col("px")), mult = "zm")
    assert(out.columns.contains("zm") && !out.columns.contains("mult"))
    assert(out.collect().nonEmpty)
    val outDefault = AsOf.deltaJoin(
      T(Seq((1L, "A", 100L, 1L))), T(Seq((2L, "A", 200L, 1L))),
      Q(Seq(("A", 50L, 1.0, 1L))), Q(Seq(("A", 150L, 2.0, 1L))),
      col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
      rightPayload = Seq("px" -> col("px")))
    assert(outDefault.columns.count(_ == "mult") == 1)
    assert(outDefault.collect().nonEmpty)
    // an output mult name colliding with a DATA column is loud
    val e = intercept[IllegalArgumentException] {
      AsOf.deltaJoin(
        T(Seq((1L, "A", 100L, 1L))), T(Seq((2L, "A", 200L, 1L))),
        Q(Seq(("A", 50L, 1.0, 1L))), Q(Seq(("A", 150L, 2.0, 1L))),
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")), mult = "px")
    }
    assert(e.getMessage.contains("collides"), e.getMessage)
  }

  test("Dedup.incrementalComponents rejects an edge-removal batch loudly") {
    import graft.llm.Dedup
    val labels = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "comp")
    val del = Seq((1L, 2L, -1L)).toDF("x", "y", "mult")
    loudFail("Dedup.incrementalComponents") {
      Dedup.incrementalComponents(labels, del, col("x"), col("y"))
        .collect()
    }
  }

  test("Sampling.fixedKDelta rejects a delete batch loudly") {
    import graft.llm.Sampling
    val state = Sampling.fixedKState(
      Seq(("g", 1L), ("g", 2L)).toDF("st", "id"),
      col("id"), col("st"), k = 2).localCheckpoint()
    val del = Seq(("g", 3L, -1L)).toDF("st", "id", "mult")
    loudFail("Sampling.fixedKDelta") {
      Sampling.fixedKDelta(state, del, col("id"), col("st"), k = 2)
        .collect()
    }
  }

  test("Curation.curateDelta rejects a delete batch loudly") {
    import graft.llm.Curation
    val mkText = (i: Long) =>
      s"document number $i has plenty of ordinary words to pass the " +
        s"quality gate without any trouble at all $i"
    val base = (1L to 5L).map(i => (i, mkText(i))).toDF("doc_id", "text")
    val del = Seq((9L, mkText(9L), -1L)).toDF("doc_id", "text", "mult")
    loudFail("Curation.curateDelta") {
      Curation.curateDelta(base, del, col("doc_id"), col("text"))
        .collect()
    }
  }

  // ------------------------------------------------------------------
  // maintainOrRecompute (r16, r15 verdict item 5): wire the
  // full-recompute pointer — a delete batch routes to the member's
  // full rebuild instead of dead-ending on the loud guard. One test
  // per insert-only member: an insert-only delta takes the fold arm,
  // a delete batch takes the recompute arm, and the result equals the
  // corrected-tables recompute either way.
  // ------------------------------------------------------------------

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  /** Apply a fold's signed output onto a base result (all rows here
    * are unique, so surviving rows are exactly sum(mult) > 0).
    */
  private def foldZ(zs: org.apache.spark.sql.DataFrame,
      mult: String = "mult") =
    zs.groupBy(zs.columns.filterNot(_ == mult).map(col): _*)
      .agg(sum(col(mult)).as("_m")).filter(col("_m") > 0).drop("_m")

  test("maintainOrRecompute routes Scd2: inserts fold, deletes recompute == corrected build") {
    import graft.ops.{Maintenance, Scd2}
    val base = Seq((1L, 10L, "a", 100L), (1L, 11L, "b", 300L),
      (2L, 20L, "x", 100L)).toDF("uid", "eid", "at", "ets")
    val store = Scd2.build(base, col("uid"), col("eid"), col("at"),
      col("ets")).localCheckpoint()
    // insert-only delta → fold arm (deltaMaintain)
    val ins = Seq((1L, 12L, "c", 200L, 1L))
      .toDF("uid", "eid", "at", "ets", "mult")
    val r1 = Maintenance.maintainOrRecompute(ins.localCheckpoint()) {
      d => Scd2.deltaMaintain(store, d, col("uid"), col("eid"),
        col("at"), col("ets"))
    } { sys.error("recompute must not run for an insert-only delta") }
    assert(!r1.recomputed && r1.deletes == 0L)
    assert(rows(r1.df) == rows(Scd2.build(
      base.unionByName(ins.drop("mult")), col("uid"), col("eid"),
      col("at"), col("ets"))))
    // delete batch → recompute arm over the corrected log
    val del = Seq((1L, 11L, "b", 300L, -1L))
      .toDF("uid", "eid", "at", "ets", "mult")
    val corrected = base.except(del.drop("mult"))
    val r2 = Maintenance.maintainOrRecompute(del.localCheckpoint()) {
      d => sys.error("fold must not run for a delete batch")
    } { Scd2.build(corrected, col("uid"), col("eid"), col("at"),
        col("ets")) }
    assert(r2.recomputed && r2.deletes == 1L)
    assert(rows(r2.df) == rows(Scd2.build(corrected, col("uid"),
      col("eid"), col("at"), col("ets"))))
  }

  test("maintainOrRecompute routes AsOf.deltaJoin: deletes recompute == as-of over corrected inputs") {
    import graft.ops.{AsOf, Maintenance}
    def T(rows: Seq[(Long, String, Long)]) =
      rows.toDF("trade_id", "sym", "t_ts")
    def Q(rows: Seq[(String, Long, Double)]) =
      rows.toDF("q_sym", "q_ts", "px")
    val t0 = T(Seq((1L, "A", 100L), (2L, "A", 250L)))
    val q0 = Q(Seq(("A", 50L, 1.0), ("A", 150L, 2.0)))
    val baseRes = AsOf.join(t0, col("sym"), col("t_ts"),
      q0, col("q_sym"), col("q_ts"), Seq("px" -> col("px")))
      .withColumn("mult", lit(1L)).localCheckpoint()
    // insert-only ΔQ → fold arm: Z-deltas fold onto the base result
    val dq = Q(Seq(("A", 200L, 3.0))).withColumn("mult", lit(1L))
    val r1 = Maintenance.maintainOrRecompute(dq.localCheckpoint()) {
      d => AsOf.deltaJoin(t0, T(Nil), q0, d.drop("mult"),
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        Seq("px" -> col("px")))
    } { sys.error("recompute must not run for an insert-only delta") }
    assert(!r1.recomputed)
    val folded = foldZ(baseRes.unionByName(r1.df))
    val wantIns = AsOf.join(t0, col("sym"), col("t_ts"),
      q0.unionByName(Q(Seq(("A", 200L, 3.0)))), col("q_sym"),
      col("q_ts"), Seq("px" -> col("px")))
    assert(rows(folded) == rows(wantIns))
    // a quote DELETE → recompute arm: as-of over the corrected quotes
    val delQ = Q(Seq(("A", 150L, 2.0))).withColumn("mult", lit(-1L))
    val correctedQ = q0.except(delQ.drop("mult"))
    val r2 = Maintenance.maintainOrRecompute(delQ.localCheckpoint()) {
      d => sys.error("fold must not run for a delete batch")
    } { AsOf.join(t0, col("sym"), col("t_ts"), correctedQ,
        col("q_sym"), col("q_ts"), Seq("px" -> col("px"))) }
    assert(r2.recomputed && r2.deletes == 1L)
    assert(rows(r2.df) == rows(AsOf.join(t0, col("sym"), col("t_ts"),
      correctedQ, col("q_sym"), col("q_ts"), Seq("px" -> col("px")))))
  }

  test("maintainOrRecompute routes Sampling.fixedKDelta: deletes recompute == quota over corrected corpus") {
    import graft.llm.Sampling
    import graft.ops.Maintenance
    val base = (1L to 20L).map(i => (s"g${i % 3}", i))
      .toDF("st", "id")
    val state = Sampling.fixedKState(base, col("id"), col("st"), k = 3)
      .localCheckpoint()
    // append batch → fold arm == fixedKState over the union
    val ins = Seq(("g0", 21L, 1L), ("g1", 22L, 1L))
      .toDF("st", "id", "mult")
    val r1 = Maintenance.maintainOrRecompute(ins.localCheckpoint()) {
      d => Sampling.fixedKDelta(state, d.drop("mult"), col("id"),
        col("st"), k = 3)
    } { sys.error("recompute must not run for an append batch") }
    assert(!r1.recomputed)
    assert(rows(r1.df) == rows(Sampling.fixedKState(
      base.unionByName(ins.drop("mult")), col("id"), col("st"), k = 3)))
    // delete batch → recompute arm over the corrected corpus
    val del = Seq(("g0", 3L, -1L)).toDF("st", "id", "mult")
    val corrected = base.except(del.drop("mult"))
    val r2 = Maintenance.maintainOrRecompute(del.localCheckpoint()) {
      d => sys.error("fold must not run for a delete batch")
    } { Sampling.fixedKState(corrected, col("id"), col("st"), k = 3) }
    assert(r2.recomputed && r2.deletes == 1L)
    assert(rows(r2.df) == rows(Sampling.fixedKState(corrected,
      col("id"), col("st"), k = 3)))
  }

  test("maintainOrRecompute routes Dedup.incrementalComponents: edge removals recompute == connectivity over corrected edges") {
    import graft.llm.Dedup
    import graft.ops.Maintenance
    val edges0 = Seq((1L, 2L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val labels = Dedup.connectedComponents(edges0, col("x"), col("y"))
      .localCheckpoint()
    // new edges → fold arm == full connectivity over the union
    val ins = Seq((2L, 6L, 1L)).toDF("x", "y", "mult")
    val r1 = Maintenance.maintainOrRecompute(ins.localCheckpoint()) {
      d => Dedup.incrementalComponents(labels, d.drop("mult"),
        col("x"), col("y"))
    } { sys.error("recompute must not run for an edge-append batch") }
    assert(!r1.recomputed)
    assert(rows(r1.df) == rows(Dedup.connectedComponents(
      edges0.unionByName(ins.drop("mult")), col("x"), col("y"))))
    // an edge REMOVAL (can split a component) → recompute arm
    val del = Seq((4L, 5L, -1L)).toDF("x", "y", "mult")
    val corrected = edges0.except(del.drop("mult"))
    val r2 = Maintenance.maintainOrRecompute(del.localCheckpoint()) {
      d => sys.error("fold must not run for an edge-removal batch")
    } { Dedup.connectedComponents(corrected, col("x"), col("y")) }
    assert(r2.recomputed && r2.deletes == 1L)
    assert(rows(r2.df) == rows(Dedup.connectedComponents(corrected,
      col("x"), col("y"))))
  }

  test("maintainOrRecompute routes Curation.curateDelta: doc deletes recompute == curate over corrected docs") {
    import graft.llm.Curation
    import graft.ops.Maintenance
    val mkText = (i: Long) =>
      s"document number $i has plenty of ordinary words to pass the " +
        s"quality gate without any trouble at all $i"
    val base = (1L to 5L).map(i => (i, mkText(i))).toDF("doc_id", "text")
    // append batch → fold arm (curateDelta emits the NEW survivors);
    // the new doc's text is DISTINCT (mkText(9) would near-dup the
    // base docs and be correctly deduped away)
    val freshText = "a completely different report about mountain " +
      "rivers forests and weather patterns across several regions " +
      "with plenty of ordinary words to pass the quality gate"
    val ins = Seq((9L, freshText, 1L)).toDF("doc_id", "text", "mult")
    val r1 = Maintenance.maintainOrRecompute(ins.localCheckpoint()) {
      d => Curation.curateDelta(base, d.drop("mult"), col("doc_id"),
        col("text"))
    } { sys.error("recompute must not run for an append batch") }
    assert(!r1.recomputed)
    assert(r1.df.select(col("doc_id")).collect().map(_.getLong(0))
      .toSet == Set(9L))
    // a doc DELETE (retract from the curated corpus) → recompute arm
    val del = Seq((3L, mkText(3L), -1L)).toDF("doc_id", "text", "mult")
    val corrected = base.except(del.drop("mult"))
    val r2 = Maintenance.maintainOrRecompute(del.localCheckpoint()) {
      d => sys.error("fold must not run for a delete batch")
    } { Curation.curate(corrected, col("doc_id"), col("text")) }
    assert(r2.recomputed && r2.deletes == 1L)
    assert(rows(r2.df) == rows(Curation.curate(corrected,
      col("doc_id"), col("text"))))
  }
}
