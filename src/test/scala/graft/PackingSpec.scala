package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("nextFit closes a sequence exactly when the budget would overflow") {
    val df = Seq(
      ("a", 1L, 40L), ("a", 2L, 50L), ("a", 3L, 20L), // 40+50 = 90, +20 > 100
      ("a", 4L, 95L),                                  // 20+95 > 100 → new seq
      ("b", 1L, 10L))
      .toDF("g", "id", "sz")
    val got = Packing.nextFit(df, col("g"), col("id"), col("sz"), budget = 100)
      .select("grp", "ord", "seq_id").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 2L), ("b", 1L, 0L)))
  }

  test("a document larger than the budget still gets its own sequence") {
    val df = Seq(("a", 1L, 500L), ("a", 2L, 10L), ("a", 3L, 10L)).toDF("g", "id", "sz")
    val got = Packing.nextFit(df, col("g"), col("id"), col("sz"), budget = 100)
      .select("ord", "seq_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("packing is identical at any input partitioning") {
    val base = (0 until 500).map(i => (s"g${i % 7}", i.toLong, 10L + i % 90))
    def run(parts: Int) =
      Packing.nextFit(base.toDF("g", "id", "sz").repartition(parts),
        col("g"), col("id"), col("sz"), budget = 256)
        .select("grp", "ord", "seq_id").as[(String, Long, Long)].collect().toSet
    assert(run(1) == run(11))
  }

  // --- chunk-parallel kernel vs the sequential reference ---

  private def both(rows: Seq[(String, Long, Long)], budget: Long, chunks: Int) = {
    val df = rows.toDF("g", "id", "sz")
    val seqK = Packing.nextFitSeq(df, col("g"), col("id"), col("sz"), budget)
      .as[(String, Long, Long, Long)].collect().toSet
    val par = Packing.nextFit(df, col("g"), col("id"), col("sz"), budget, chunks)
      .as[(String, Long, Long, Long)].collect().toSet
    (seqK, par)
  }

  test("chunked kernel is bit-equal to the sequential kernel on random data") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 20000).map { i =>
      (s"src${rnd.nextInt(3)}", i.toLong, rnd.nextInt(200).toLong)
    }
    val (a, b) = both(rows, budget = 512, chunks = 17)
    assert(a == b)
  }

  test("chunked kernel handles oversized docs, zero sizes and chunk boundaries") {
    val rnd = new scala.util.Random(7)
    // one giant group (spans every chunk), sizes include 0 and >budget
    val rows = (0 until 5000).map { i =>
      val sz = rnd.nextInt(10) match {
        case 0 => 0L                       // zero-size: flat prefix dedupe
        case 1 => 300L + rnd.nextInt(400)  // oversized (> budget 256)
        case _ => rnd.nextInt(120).toLong
      }
      ("big", i.toLong, sz)
    } ++ Seq(("tiny", 0L, 1L), ("tiny2", 0L, 999L)) // 1-row groups
    val (a, b) = both(rows, budget = 256, chunks = 23)
    assert(a == b)
  }

  test("chunked kernel: null group keys pack exactly like the sequential kernel") {
    val rows: Seq[(String, Long, Long)] =
      (0 until 800).map(i => (if (i % 3 == 0) null else s"g${i % 2}", i.toLong, 30L + i % 80))
    val (a, b) = both(rows, budget = 128, chunks = 7)
    assert(a == b)
    assert(b.exists(_._1 == null), "null group missing from output")
  }

  test("chunked kernel: chunks=1 and chunk-count > row-count degenerate cleanly") {
    val rows = (0 until 50).map(i => (s"g${i % 2}", i.toLong, 40L))
    val (a1, b1) = both(rows, budget = 100, chunks = 1)
    assert(a1 == b1)
    val (a2, b2) = both(rows, budget = 100, chunks = 128)
    assert(a2 == b2)
  }

  test("chunked kernel: a whole group below one budget stays one sequence") {
    val rows = (0 until 400).map(i => ("s", i.toLong, 1L))
    val (a, b) = both(rows, budget = 100000, chunks = 11)
    assert(a == b)
    assert(b.forall(_._4 == 0L))
  }

  test("chunked kernel parallelism: the pack runs at chunk count, not group count") {
    // one group, many chunks: every pass-2 task carries a slice
    val rows = (0 until 3000).map(i => ("one", i.toLong, 10L + i % 90))
    val df = rows.toDF("g", "id", "sz")
    val packed = Packing.nextFit(df, col("g"), col("id"), col("sz"),
      budget = 256, chunks = 13)
    assert(packed.rdd.getNumPartitions == 13)
    val nonEmpty = packed.rdd
      .mapPartitions(it => Iterator.single(if (it.hasNext) 1 else 0)).collect().sum
    assert(nonEmpty > 8, s"only $nonEmpty chunks carried rows for the one group")
  }

  test("lengthBucketsChunked is bit-equal to the window form; one bucket spans chunks") {
    val rnd = new scala.util.Random(3)
    // one DOMINATING bucket: 90% of rows share a length band
    val rows = (0 until 8000).map { i =>
      (i.toLong, if (i % 10 == 0) (200 + rnd.nextInt(800)).toLong
                 else (10 + rnd.nextInt(30)).toLong)
    }
    val df = rows.toDF("id", "n")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = canon(Packing.lengthBuckets(df, col("id"), col("n"), 32, 8))
    for (chunks <- Seq(1, 11)) {
      val got = canon(Packing.lengthBucketsChunked(
        df, col("id"), col("n"), 32, 8, chunks))
      assert(got == want, s"chunks=$chunks diverged")
    }
    val out = Packing.lengthBucketsChunked(df, col("id"), col("n"), 32, 8, 11)
    assert(out.rdd.getNumPartitions == 11)
    val dom = want.groupBy(_._3).maxBy(_._2.size)._1
    val spread = out.rdd.mapPartitions { it =>
      Iterator.single(if (it.exists(_.getLong(2) == dom)) 1 else 0)
    }.collect().sum
    assert(spread > 7, s"dominating bucket only on $spread chunks")
  }

  test("every sequence except possibly the last per group respects the budget") {
    val df = (0 until 300).map(i => (s"g${i % 3}", i.toLong, 30L + i % 150)).toDF("g", "id", "sz")
    val fills = Packing.nextFit(df, col("g"), col("id"), col("sz"), budget = 512)
      .groupBy("grp", "seq_id").agg(sum("sz").as("fill"), max("sz").as("mx"))
      .as[(String, Long, Long, Long)].collect()
    fills.foreach { case (g, seq, fill, mx) =>
      assert(fill <= 512 || mx > 512, s"$g/$seq overfilled: $fill")
    }
  }
}
