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

  test("AsOf.deltaJoin rejects delete batches loudly") {
    import graft.ops.AsOf
    // base/delta schemas must match, so the signed column rides both;
    // the output mult renames away from the input's
    def T(rows: Seq[(Long, String, Long, Long)]) =
      rows.toDF("trade_id", "sym", "t_ts", "mult")
    def Q(rows: Seq[(String, Long, Double, Long)]) =
      rows.toDF("q_sym", "q_ts", "px", "mult")
    loudFail("AsOf.deltaJoin") {
      AsOf.deltaJoin(
        T(Seq((1L, "A", 100L, 1L))), T(Seq((2L, "A", 200L, -1L))),
        Q(Seq(("A", 50L, 1.0, 1L))), Q(Seq(("A", 150L, 2.0, 1L))),
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")), mult = "out_mult")
        .collect()
    }
    loudFail("AsOf.deltaJoin") {
      AsOf.deltaJoin(
        T(Seq((1L, "A", 100L, 1L))), T(Seq((2L, "A", 200L, 1L))),
        Q(Seq(("A", 50L, 1.0, 1L))), Q(Seq(("A", 150L, 2.0, -1L))),
        col("sym"), col("t_ts"), col("q_sym"), col("q_ts"),
        rightPayload = Seq("px" -> col("px")), mult = "out_mult")
        .collect()
    }
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
}
