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

  test("spanDedup: kept segments are exactly one owner per distinct segment") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 500)
      // small vocab so chunk collisions actually happen
      val docs = (1L to 60L).map { i =>
        i -> (1 to (4 + rnd.nextInt(12)))
          .map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
      }
      val out = graft.llm.Dedup
        .spanDedup(docs.toDF("id", "txt"), col("id"), col("txt"), chunk = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      // brute-force: chunk every doc, count distinct segments
      val allSegs = docs.flatMap { case (id, txt) =>
        txt.split(" ").grouped(2).zipWithIndex
          .map { case (c, i) => (id, i, c.mkString(" ")) }
      }
      val distinctSegs = allSegs.map(_._3).distinct.size
      assert(out.map(_._3).sum == distinctSegs.toLong,
        s"seed $seed: kept-sum != distinct segments")
      assert(out.map(_._2).sum == allSegs.size.toLong, "n_segs mismatch")
      // every rebuilt text's segments are pairwise-distinct corpus-wide
      val keptSegs = out.toSeq.flatMap { case (_, _, kept, txt) =>
        if (kept == 0) Nil else txt.split(" ").grouped(2).map(_.mkString(" ")).toSeq
      }
      assert(keptSegs.size == keptSegs.distinct.size,
        s"seed $seed: a segment survived twice")
    }
  }

  test("boilerplateStrip equals brute-force df-threshold removal") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 700)
      val docs = (1L to 60L).map { i =>
        i -> (1 to (4 + rnd.nextInt(12)))
          .map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
      }
      val out = graft.llm.Dedup
        .boilerplateStrip(docs.toDF("id", "txt"), col("id"), col("txt"),
          chunk = 2, maxDf = 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val allSegs = docs.flatMap { case (id, txt) =>
        txt.split(" ").grouped(2).zipWithIndex
          .map { case (c, i) => (id, i, c.mkString(" ")) }
      }
      val dfBySeg = allSegs.groupBy(_._3).map { case (s, occ) =>
        s -> occ.map(_._1).distinct.size
      }
      docs.foreach { case (id, txt) =>
        val mine = allSegs.filter(_._1 == id).sortBy(_._2)
        val kept = mine.filter(s => dfBySeg(s._3) <= 2).map(_._3)
        val (nSegs, nDropped, clean) = out(id)
        assert(nSegs == mine.size.toLong, s"seed $seed doc $id n_segs")
        assert(nDropped == (mine.size - kept.size).toLong,
          s"seed $seed doc $id n_dropped")
        assert(clean == kept.mkString(" "), s"seed $seed doc $id text")
      }
    }
  }

  test("paretoCoverage: kept prefix is the minimal cover at num/den") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 800)
      val rows = (1 to 300).map { i =>
        (s"k${rnd.nextInt(5)}", i.toLong,
          math.round(rnd.nextDouble() * 10000) / 100.0)
      }
      val df = rows.toDF("k", "id", "w")
      val kept = graft.ops.Stats
        .paretoCoverage(df, col("k"), col("id"), col("w"), num = 4, den = 5)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      def cents(d: Double): Long = math.round(d * 100)
      val totals = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.map(r => cents(r._3)).sum
      }
      kept.groupBy(_._1).foreach { case (k, ks) =>
        val sorted = ks.sortBy(_._4)
        assert(sorted.map(_._4).toSeq == (1L to sorted.length.toLong).toSeq,
          s"seed $seed $k ranks not a contiguous prefix")
        val keptSum = sorted.map(r => cents(r._3)).sum
        // covers the target share...
        assert(5L * keptSum >= 4L * totals(k), s"seed $seed $k under-covers")
        // ...and minimally so: dropping the last kept row goes under
        val allButLast = keptSum - cents(sorted.last._3)
        assert(5L * allButLast < 4L * totals(k), s"seed $seed $k not minimal")
      }
    }
  }

  test("medianAbsDev equals brute-force interpolated median") {
    val rnd = new Random(1200)
    val rows = (1 to 501).map { i =>
      (s"g${i % 3}", math.round(rnd.nextDouble() * 10000) / 100.0)
    }
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val idx = 0.5 * (s.length - 1)
      val lo = s(idx.toInt)
      val hi = s(math.ceil(idx).toInt)
      lo + (idx - idx.toInt) * (hi - lo)
    }
    val got = graft.ops.Stats
      .medianAbsDev(rows.toDF("g", "v"), col("g"), col("v"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val xs = rs.map(_._2)
      val med = medOf(xs)
      val mad = medOf(xs.map(x => math.abs(x - med)))
      val (n, gotMed, gotMad) = got(g)
      assert(n == xs.size.toLong && gotMed == med && gotMad == mad,
        s"group $g: got ($n, $gotMed, $gotMad) want (${xs.size}, $med, $mad)")
    }
  }

  test("chunkWindows: stride-coverage and reconstruction invariants") {
    val rnd = new Random(1700)
    val docs = (1L to 50L).map { i =>
      i -> (1 to (1 + rnd.nextInt(40))).map(_ => s"w${rnd.nextInt(9)}").mkString(" ")
    }
    val out = graft.llm.TextAnalysis
      .chunkWindows(docs.toDF("id", "txt"), col("id"), col("txt"),
        window = 8, stride = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getString(4)))
    docs.foreach { case (id, txt) =>
      val words = txt.split(" ").toSeq
      val chunks = out.filter(_._1 == id).sortBy(_._2)
      assert(chunks.length == (words.length + 4) / 5, s"doc $id chunk count")
      chunks.foreach { case (_, idx, n, text) =>
        val want = words.slice(idx * 5, idx * 5 + 8)
        assert(text == want.mkString(" ") && n == want.length.toLong,
          s"doc $id chunk $idx content")
      }
      // stride-prefixes of the chunks reconstruct the document
      val rebuilt = chunks.toSeq.flatMap { case (_, idx, _, text) =>
        text.split(" ").take(5).toSeq
      }
      assert(rebuilt == words, s"doc $id reconstruction")
    }
    // zero-token text (whitespace-only) emits NO chunks — the
    // sequence(0,-1) descending-array trap must not fire
    val empty = graft.llm.TextAnalysis
      .chunkWindows(Seq((1L, "   "), (2L, "a b")).toDF("id", "txt"),
        col("id"), col("txt"), window = 8, stride = 5)
      .collect()
    assert(empty.map(_.getLong(0)).toSeq == Seq(2L),
      "whitespace-only doc must contribute zero chunks")
  }

  test("lengthBuckets: batch cohesion and padding-waste bounds") {
    val rnd = new Random(1800)
    val rows = (1L to 300L).map(i => (i, 1L + rnd.nextInt(100)))
    val out = graft.ops.Packing
      .lengthBuckets(rows.toDF("id", "n"), col("id"), col("n"),
        bucketWidth = 16, batchSize = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.foreach { case (_, sz, bucket, _, waste) =>
      assert(bucket == (sz - 1) / 16, "bucket quantizer")
      assert(waste >= 0 && waste < 16, s"waste $waste out of [0,16)")
      assert((bucket + 1) * 16 - sz == waste, "waste arithmetic")
    }
    out.groupBy(r => (r._3, r._4)).foreach { case ((b, batch), members) =>
      assert(members.length <= 4, s"batch ($b,$batch) overfull")
      assert(members.map(_._3).distinct.length == 1, "mixed-bucket batch")
    }
    // batches within a bucket are filled in order: only the last may be short
    out.groupBy(_._3).foreach { case (b, members) =>
      val sizes = members.groupBy(_._4).toSeq.sortBy(_._1).map(_._2.length)
      assert(sizes.init.forall(_ == 4), s"bucket $b has a short non-final batch")
    }
  }

  test("hllDistinct: estimate within HLL error bounds of true distinct") {
    val rnd = new Random(2100)
    // three keys with very different true cardinalities
    val rows = (1 to 6000).map { _ =>
      val g = rnd.nextInt(3)
      val card = Seq(50, 800, 4000)(g)
      (s"g$g", rnd.nextInt(card).toLong * 7919L + g)
    }
    val got = graft.ops.Stats
      .hllDistinct(rows.toDF("g", "v"), col("g"), col("v"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val truth = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).distinct.size }
    truth.foreach { case (g, exact) =>
      val (nNonzero, denom, raw) = got(g)
      assert(denom > 0 && denom < (1L << 53), s"$g denominator out of range")
      assert(nNonzero >= 1 && nNonzero <= 512, s"$g register count")
      // apply the documented caller-side small-range correction:
      // linear counting from the occupied-register count
      val est =
        if (raw <= 2.5 * 512 && nNonzero < 512)
          512.0 * math.log(512.0 / (512 - nNonzero))
        else raw
      // within 5x the 1.04/sqrt(m) standard error
      val relErr = math.abs(est - exact) / exact
      assert(relErr < 5 * 1.04 / math.sqrt(512),
        s"$g: est $est (raw $raw) vs true $exact (rel $relErr)")
    }
  }

  test("poissonBootstrap equals host-side replay of the weight draw") {
    val cdf = Array(
      0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
      0.999916758850712, 0.9999897508033253)
    val rnd = new Random(1500)
    val rows = (1L to 400L).map(i => (i, s"g${i % 3}", 10L + rnd.nextInt(90)))
    val reps = 8
    val got = graft.llm.Sampling
      .poissonBootstrap(rows.toDF("id", "g", "v"), col("id"), col("g"),
        col("v"), reps = reps, salt = 5L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def weight(id: Long, r: Int): Long = {
      val u = (graft.functions.HashOps.splitmix64(id * reps + r + 5L) >>> 11)
        .toDouble * 1.1102230246251565e-16
      val k = cdf.indexWhere(u < _)
      if (k < 0) 8L else k.toLong
    }
    rows.groupBy(_._2).foreach { case (g, rs) =>
      val means = (0 until reps).map { r =>
        val ws = rs.map(t => (weight(t._1, r), t._3))
        ws.map(t => t._1 * t._2).sum.toDouble / ws.map(_._1).sum.toDouble
      }
      val (n, mean, lo, hi) = got(g)
      assert(n == rs.size.toLong, s"$g n")
      assert(mean == rs.map(_._3).sum.toDouble / rs.size, s"$g mean")
      assert(lo == means.min && hi == means.max,
        s"$g band: got ($lo,$hi) want (${means.min},${means.max})")
      // the replicate band should bracket the plain mean
      assert(lo <= mean && mean <= hi, s"$g band does not bracket mean")
    }
  }

  test("tokenBudgetAllocation: feasibility and optimality invariants") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 900)
      val rows = (1 to 400).map { i =>
        (s"s${rnd.nextInt(12)}", 1L + rnd.nextInt(100).toLong)
      }
      val out = graft.llm.Sampling
        .tokenBudgetAllocation(rows.toDF("src", "n"), col("src"), col("n"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      val total = rows.map(_._2).sum
      val budget = total * 3 / 5
      val allocSum = out.map(_._3).sum
      assert(allocSum <= budget, s"seed $seed: over budget")
      // never over-allocate a source; funded means fully funded
      out.foreach { case (s, n, a, funded) =>
        assert(a <= n, s"$s over-allocated")
        assert(!funded || a == n, s"$s funded but capped")
      }
      // floor remainder bound: within #capped of the budget
      val nCapped = out.count(!_._4)
      assert(budget - allocSum <= math.max(nCapped.toLong, 0) ||
        allocSum == math.min(budget, total),
        s"seed $seed: left ${budget - allocSum} unallocated with $nCapped capped")
      // all capped sources share one cap value
      val caps = out.filter(!_._4).map(_._3).distinct
      assert(caps.length <= 1, s"seed $seed: differing caps ${caps.toSeq}")
    }
  }

  test("triangleCounts equals brute force on random graphs") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 1300)
      val edges = (1 to 120).map(_ => (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      val got = graft.ops.Graph
        .triangleCounts(edges.toDF("a", "b"), col("a"), col("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val es = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
      val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
        (u, v, w) = (nodes(i), nodes(j), nodes(k))
        if es((u, v)) && es((u, w)) && es((v, w))
      } { brute(u) += 1; brute(v) += 1; brute(w) += 1 }
      assert(got == brute.toMap, s"seed $seed mismatch")
    }
  }

  test("kcorePeel: survivors have deg >= k inside the survivor subgraph") {
    val rnd = new Random(77)
    val edges = (1 to 200).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val out = graft.ops.Graph
      .kcorePeel(edges.toDF("a", "b"), col("a"), col("b"), k = 4, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val es = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val surv = out.keySet
    val degIn = es.filter(e => surv(e._1) && surv(e._2))
      .flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, l) => n -> l.size }
    // 6 rounds is past the fixpoint on 25 nodes: reported degree must
    // BE the survivor-subgraph degree and satisfy the core property
    out.foreach { case (n, d) =>
      assert(degIn.getOrElse(n, 0) == d && d >= 4, s"node $n deg $d")
    }
  }

  test("pairCooccurrence equals the naive basket self-join on random baskets") {
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 900)
      val rows = (1 to 600).map { _ =>
        (rnd.nextInt(80).toLong, s"i${rnd.nextInt(15)}")
      }
      val df = rows.toDF("b", "i")
      val got = graft.ops.Mining.pairCooccurrence(df, col("b"), col("i"),
          minPairs = 2)
        .select(col("item_a"), col("item_b"), col("pair_n"), col("n_a"),
          col("n_b"), col("n_baskets"))
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      // naive reference: distinct (basket, item), self-join, count
      val sets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val itemN = sets.values.toSeq.flatten.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val nb = sets.size.toLong
      val want = sets.values.toSeq
        .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
        .groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= 2)
        .map { case ((a, b), n) => (a, b, n, itemN(a), itemN(b), nb) }.toSet
      assert(got == want, s"seed $seed mismatch")
    }
  }

  test("eventPatterns equals the JDK regex scan on random symbol streams") {
    val pat = "v[^vp]*p"
    for (seed <- 1 to 2) {
      val rnd = new Random(seed + 950)
      val syms = "vcpse"
      val rows = (1 to 400).map { i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong,
          syms(rnd.nextInt(5)).toString)
      }
      val df = rows.toDF("k", "ts", "eid", "sym")
      val got = graft.ops.Mining.eventPatterns(
          df, col("k"), col("ts"), col("eid"), col("sym"), pat)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = rows.groupBy(_._1).map { case (k, es) =>
        val s = es.sortBy(e => (e._2, e._3)).map(_._4).mkString
        val ms = pat.r.findAllIn(s).toSeq
        val gap = if (ms.isEmpty) -1L else ms.map(_.length - 2L).max
        k -> ((es.size.toLong, ms.size.toLong, gap))
      }
      assert(got == want, s"seed $seed mismatch")
    }
  }

  test("targetEncode: encodings are convex combinations of group mean and prior") {
    val rnd = new Random(1234)
    val rows = (1 to 500).map(_ => (s"c${rnd.nextInt(25)}", rnd.nextInt(100).toLong))
    val df = rows.toDF("c", "y")
    val prior = rows.map(_._2).sum.toDouble / rows.size
    val got = graft.ops.Stats.targetEncode(df, col("c"), col("y"), m = 7)
      .as[(String, Long, Long, Double)].collect()
    val byCat = rows.groupBy(_._1)
    assert(got.length == byCat.size)
    got.foreach { case (c, n, sy, enc) =>
      val mean = sy.toDouble / n
      val lo = math.min(mean, prior) - 1e-9
      val hi = math.max(mean, prior) + 1e-9
      assert(n == byCat(c).size && sy == byCat(c).map(_._2).sum)
      assert(enc >= lo && enc <= hi, s"$c enc $enc outside [$lo, $hi]")
      // exact m-estimate value, fixed-order replay
      val expect = (sy.toDouble + 7.0 * (rows.map(_._2).sum.toDouble / rows.size)) / (n + 7).toDouble
      assert(enc == expect, s"$c enc $enc != $expect")
    }
  }

  test("kfoldAssign partitions every stratum into near-equal folds at any k") {
    val rnd = new Random(4321)
    val rows = (1 to 400).map(i => (i.toLong, s"s${rnd.nextInt(6)}"))
    val df = rows.toDF("id", "g")
    for (k <- Seq(2, 3, 7)) {
      val got = graft.llm.Sampling.kfoldAssign(df, col("id"), col("g"), k)
        .as[(Long, String, Int)].collect()
      assert(got.length == 400 && got.map(_._1).distinct.length == 400)
      got.groupBy(_._2).foreach { case (g, rs) =>
        val sizes = (0 until k).map(f => rs.count(_._3 == f))
        assert(sizes.max - sizes.min <= 1,
          s"k=$k stratum $g sizes $sizes not within one")
      }
    }
  }
}
