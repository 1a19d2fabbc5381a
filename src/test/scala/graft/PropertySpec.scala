package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.ops.{Sessionize, Skew}

/** Randomized equivalence properties (seeded — deterministic):
  * the skew-safe rewrites must be EXACTLY the direct plans' results
  * on arbitrary data, not just on the benchmark tables, and the
  * sessionizer must satisfy its gap invariants on random event
  * streams.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("saltedCountSum equals direct groupBy on random skewed data") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed)
      val rows = (1 to 800).map { i =>
        // zipf-ish skew: most rows land on key 0
        val k = if (rnd.nextDouble() < 0.7) "hot" else s"k${rnd.nextInt(20)}"
        (i.toLong, k, math.round(rnd.nextDouble() * 1000) / 100.0)
      }
      val df = rows.toDF("id", "k", "v")
      val salted = Skew.saltedCountSum(df, col("k"), col("v"), col("id"))
        .select(col("key"), col("n"), col("v"))
        .as[(String, Long, Double)].collect().map { case (k, n, v) => k -> ((n, v)) }.toMap
      val direct = df.groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("v"))
        .as[(String, Long, Double)].collect().map { case (k, n, v) => k -> ((n, v)) }.toMap
      assert(salted == direct, s"seed $seed mismatch")
    }
  }

  test("saltedJoin equals plain join on random many-to-many data") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 100)
      val probe = (1 to 300).map(i => (i.toLong, s"k${rnd.nextInt(10)}")).toDF("id", "k")
      val build = (1 to 30).map(i => (s"k${rnd.nextInt(12)}", i)).toDF("bk", "w")
      val got = Skew.saltedJoin(probe, build, col("k"), col("bk"), col("id"), salts = 4)
        .select(col("id"), col("w")).as[(Long, Int)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = probe.join(build, col("k") === col("bk"))
        .select(col("id"), col("w")).as[(Long, Int)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"seed $seed mismatch (multiplicity-sensitive)")
    }
  }

  test("sessionize: no intra-session gap exceeds the threshold, sessions cover all events") {
    val gapUs = 1000L
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 200)
      val events = (1 to 250).map { i =>
        (rnd.nextInt(5).toLong, math.abs(rnd.nextLong() % 100000L), i.toLong)
      }
      val df = events.toDF("uid", "ts_us", "eid")
      val sess = Sessionize.sessions(df, col("uid"), col("ts_us"), col("eid"), gapUs)
        .select(col("key"), col("n_events"), col("start_us"), col("end_us"))
        .as[(Long, Long, Long, Long)].collect()
      // every event is in exactly one session
      assert(sess.map(_._2).sum == events.length)
      // sessions of one user never overlap and are separated by > gap
      sess.groupBy(_._1).foreach { case (_, ss) =>
        val sorted = ss.sortBy(_._3)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(b._3 - a._4 > gapUs,
            s"sessions closer than gap: $a then $b")
          case _ =>
        }
      }
      // per-session span sanity: start <= end
      assert(sess.forall(s => s._3 <= s._4))
    }
  }

  test("HashOps.cosine is symmetric, bounded, and exact on unit axes") {
    val rnd = new Random(42)
    for (_ <- 1 to 20) {
      val n = 8 + rnd.nextInt(56)
      val a = Array.fill(n)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(n)(rnd.nextFloat() * 2 - 1)
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      def ad(x: Array[Float]) = new GenericArrayData(x.map(_.asInstanceOf[Any]))
      val ab = graft.functions.HashOps.cosine(ad(a), ad(b))
      val ba = graft.functions.HashOps.cosine(ad(b), ad(a))
      assert(ab == ba, "cosine not symmetric")
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      assert(graft.functions.HashOps.cosine(ad(a), ad(a)) > 0.999999)
    }
  }

  test("nextFit packing invariants hold on random sizes and budgets") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val budget = 100L + rnd.nextInt(400)
      val rows = (0 until 300).map { i =>
        (s"g${rnd.nextInt(4)}", i.toLong, 1L + rnd.nextInt(budget.toInt))
      }
      val packed = graft.ops.Packing.nextFit(
        rows.toDF("g", "id", "sz"), col("g"), col("id"), col("sz"), budget)
        .select("grp", "ord", "sz", "seq_id")
        .as[(String, Long, Long, Long)].collect()
      assert(packed.length == 300)
      packed.groupBy(_._1).foreach { case (g, rs) =>
        val byOrd = rs.sortBy(_._2)
        // seq ids start at 0, never decrease, step at most 1
        assert(byOrd.head._4 == 0L, s"$g first seq != 0")
        byOrd.sliding(2).foreach {
          case Array(p, c) =>
            assert(c._4 - p._4 >= 0 && c._4 - p._4 <= 1, s"$g seq jump")
          case _ =>
        }
        // no sequence with >1 doc exceeds the budget
        byOrd.groupBy(_._4).foreach { case (seq, docs) =>
          if (docs.length > 1)
            assert(docs.map(_._3).sum <= budget, s"$g/$seq overfull (trial $trial)")
        }
      }
    }
  }

  test("Bloom prunedSemiJoin equals plain semi join on random keys and sizes") {
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      val bigKeys = Seq.fill(500)(rnd.nextInt(200).toLong)
      val smallKeys = Seq.fill(30)(rnd.nextInt(300).toLong).distinct
      val big = bigKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "x")
      val small = smallKeys.toDF("y")
      val m = 64 << rnd.nextInt(3) // tiny filters: force false positives
      val got = graft.functions.BloomOps
        .prunedSemiJoin(big, col("x"), small, col("y"), mBits = m, k = 2)
        .select("id").as[Long].collect().sorted.toSeq
      val want = big.join(small, col("x") === col("y"), "left_semi")
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == want, s"trial $trial mBits=$m")
    }
  }

  test("hammingPairs equals brute force on random signatures") {
    val rnd = new Random(17)
    for (trial <- 1 to 2) {
      // cluster sigs around a few centers so some pairs are close
      val centers = Seq.fill(5)(rnd.nextLong())
      val sigs = (1 to 120).map { i =>
        val c = centers(rnd.nextInt(centers.length))
        val flips = rnd.nextInt(6) // 0..5 bit flips off the center
        val s = (1 to flips).foldLeft(c)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
        (i.toLong, s)
      }
      val got = graft.llm.Dedup.hammingPairs(sigs.toDF("doc_id", "sig"), maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (ia, ib, h.toLong)).toSet
      assert(got == want, s"trial $trial: ${got.size} vs ${want.size}")
    }
  }

  test("VectorSumLong is partition-count invariant and equals explicit sums") {
    val rnd = new Random(23)
    val dim = 16
    val rows = (1 to 300).map { i =>
      (i.toLong % 4, Seq.fill(dim)(rnd.nextInt(2000).toLong - 1000))
    }
    val expected = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(_._2).transpose.map(_.sum)
    }
    for (parts <- Seq(1, 7)) {
      val got = rows.toDF("k", "v").repartition(parts)
        .groupBy("k")
        .agg(graft.functions.VectorSum.vecSumLong(col("v")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == expected, s"parts=$parts")
    }
  }
}
