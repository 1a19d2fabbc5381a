package graft

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.llm.Ann

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Long, d: Int = 64): Array[Float] =
    Array.tabulate(d) { i =>
      // deterministic pseudo-random floats in [-1, 1)
      val h = graft.functions.HashOps.splitmix64(seed * 131 + i)
      (h.toDouble / Long.MaxValue.toDouble).toFloat
    }

  test("pqEncode of a codebook row codes to itself; ADC is then the exact dot") {
    val book = Array.tabulate(16)(b => vec(b.toLong))
    val q = vec(99L)
    for (r <- Seq(0, 5, 15)) {
      // own subvector has squared-L2 zero in every subspace
      val code = graft.functions.HashOps.pqEncode(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(book(r)), book, 8)
      (0 until 8).foreach { j =>
        assert(((code >>> (4 * j)) & 15L) == r, s"subspace $j of row $r")
      }
      val adc = graft.functions.HashOps.pqAdc(
        code, org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q), book, 8)
      val exact = (0 until 64).foldLeft(0.0)((a, i) =>
        a + q(i).toDouble * book(r)(i).toDouble)
      assert(adc == exact)
    }
  }

  test("pqTopK returns k ranked rows per query with finite scores") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Ann.pqTopK(
      e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 3), col("vec_id"), col("embedding"), k = 5)
      .collect()
    assert(out.length == 15)
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    val perQ = out.groupBy(_.getLong(0))
    assert(perQ.values.forall(_.map(_.getLong(3)).sorted.toSeq == (1L to 5L)))
  }

  test("exact re-rank recall >= PQ-only recall against brute-force truth") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }
    val truth = topSet(Ann.bruteTopK(
      e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10))
    val pq = topSet(Ann.pqTopK(
      e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10))
    val refined = topSet(Ann.pqRefineTopK(
      e, col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
      k = 10, shortlist = 50))
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.keys.map(q => got.getOrElse(q, Set.empty)
        .intersect(truth(q)).size.toDouble / truth(q).size).sum / truth.size
    assert(recall(refined) >= recall(pq),
      s"refine ${recall(refined)} must not lose to raw PQ ${recall(pq)}")
    assert(refined.values.forall(_.size == 10))
  }

  test("PQ encode stage is map-only: zero Exchange between scan and codes") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("c_vec"))
    val book = e.orderBy(F.splitmix64(col("vec_id")), col("vec_id")).limit(16)
      .select(col("c_vec")).collect().map(_.getSeq[Float](0).toArray)
    val codes = e.select(col("vec_id"), F.pqEncode(col("c_vec"), book, 8).as("code"))
    val plan = codes.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected map-only encode:\n$plan")
  }

  test("pqRefineTopKCodes serves from maintained codes == fresh encode == one-shot refine") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val all = e.select(col("vec_id"), col("embedding").as("c_vec"))
    val queries = e.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    // (a) with the book pqRefineTopK would sample (full corpus), the
    // maintained-serving path equals the one-shot path exactly
    val fullBook = all.orderBy(F.splitmix64(col("vec_id")), col("vec_id"))
      .limit(16).select(col("c_vec").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val fullCodes = all.select(
      col("vec_id"), F.pqEncode(col("c_vec"), fullBook, 8).as("code"))
    val served = Ann.pqRefineTopKCodes(fullCodes,
      e, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"),
      fullBook, k = 10, shortlist = 50)
    val oneShot = Ann.pqRefineTopK(
      e, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), k = 10, shortlist = 50)
    assert(rows(served) == rows(oneShot) && served.count() == 50)
    // (b) under a BASE-pinned book, serving from the delta-ingested
    // frame equals serving from a fresh full encode — the maintained
    // state is a faithful serving artifact
    val base = all.filter(col("vec_id") % 10 < 8)
    val delta = all.filter(col("vec_id") % 10 >= 8)
    val book = base.orderBy(F.splitmix64(col("vec_id")), col("vec_id"))
      .limit(16).select(col("c_vec").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    val baseCodes = base.select(
      col("vec_id"), F.pqEncode(col("c_vec"), book, 8).as("code"))
    val ingested = Ann.pqDeltaIngest(baseCodes, delta, book, 8)
    val fresh = all.select(
      col("vec_id"), F.pqEncode(col("c_vec"), book, 8).as("code"))
    def serve(codes: org.apache.spark.sql.DataFrame) =
      rows(Ann.pqRefineTopKCodes(codes, e, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), book, k = 10,
        shortlist = 50))
    assert(serve(ingested) == serve(fresh))
  }

  test("pqDeltaIngest under a pinned codebook == the full encode; drift report flags an all-new codeword") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("c_vec"))
    val base = e.filter(col("vec_id") % 10 < 8)
    val delta = e.filter(col("vec_id") % 10 >= 8)
    // codebook pinned from the BASE slice only
    val book = base.orderBy(F.splitmix64(col("vec_id")), col("vec_id"))
      .limit(16).select(col("c_vec")).collect()
      .map(_.getSeq[Float](0).toArray)
    val baseCodes = base.select(
      col("vec_id"), F.pqEncode(col("c_vec"), book, 8).as("code"))
    val ingested = Ann.pqDeltaIngest(baseCodes, delta, book, 8)
    val full = base.unionByName(delta).select(
      col("vec_id"), F.pqEncode(col("c_vec"), book, 8).as("code"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows(ingested) == rows(full) && ingested.count() == e.count())
    // drift ingest is map-only on the delta side too
    val plan = ingested.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected map-only ingest:\n$plan")
    // drift flags: a synthetic delta concentrated on one codeword of
    // one subspace must flag exactly that (sub, cb) cell; balanced
    // cells stay quiet. Base: one vector per codeword (shares 1/16);
    // delta: every vector codes to codeword 0 in every subspace.
    val bookRows = (0 until 16).map(b => (b.toLong, book(b)))
    val bCodes = bookRows.toDF("vec_id", "c_vec")
      .select(col("vec_id"),
        F.pqEncode(col("c_vec").cast("array<float>"), book, 8).as("code"))
    val dCodes = Seq((100L, book(0)), (101L, book(0)), (102L, book(0)))
      .toDF("vec_id", "c_vec")
      .select(col("vec_id"),
        F.pqEncode(col("c_vec").cast("array<float>"), book, 8).as("code"))
    val report = Ann.pqDriftReport(bCodes, dCodes, m = 8)
      .as[(Int, Long, Long, Long, Boolean)].collect()
    assert(report.length == 8 * 16)
    report.foreach { case (sub, cb, nb, nd, drifted) =>
      assert(nb == 1L, s"base is one vector per codeword at ($sub, $cb)")
      if (cb == 0L) assert(nd == 3L && drifted,
        s"delta share 100% vs base 1/16 must flag at ($sub, $cb)")
      else assert(nd == 0L && !drifted, s"quiet cell flagged at ($sub, $cb)")
    }
  }
}
