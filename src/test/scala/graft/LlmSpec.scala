package graft

import org.apache.spark.sql.functions._
import graft.llm._
import graft.functions.F

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup finds planted exact copies") {
    val withCopies = docs.select($"doc_id", $"text").unionByName(
      docs.select(($"doc_id" + 9000000L).as("doc_id"), $"text").limit(5))
    val d = Dedup.exact(withCopies, col("doc_id"), col("text"))
    assert(d.filter($"n" >= 2).count() >= 5)
    // keep_id is the min id → original, not the planted copy
    assert(d.filter($"n" >= 2 && $"keep_id" >= 9000000L).count() == 0)
  }

  test("minhash LSH finds planted near-dup pairs") {
    val planted = docs.select($"doc_id", $"text").unionByName(
      docs.filter($"doc_id" % 50 === 0).select(
        ($"doc_id" + 1000000L).as("doc_id"),
        concat($"text", lit(" near duplicate suffix")).as("text")))
    val pairs = Dedup.minhashLsh(planted, col("doc_id"), col("text"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val expected = docs.filter($"doc_id" % 50 === 0).select($"doc_id")
      .as[Long].collect().map(i => (i, i + 1000000L)).toSet
    val found = expected.intersect(pairs)
    assert(found.size >= expected.size * 8 / 10,
      s"found ${found.size}/${expected.size} planted pairs")
  }

  test("minhash LSH survives a duplicate-heavy corpus (r10 collapse pre-pass)") {
    // 12 distinct texts each replicated 70x — above maxBucket=64, so
    // the pre-r10 code (caps on RAW rows) returned exact-EMPTY here.
    // Post-collapse: caps count distinct content (12 reps), the
    // planted near-dup pair of text 0 is found, and exact-dup pairs
    // come back est-1.0 through the expansion.
    // class vocabularies are fully disjoint so cross-CLASS similarity
    // is near zero and only the planted near-dup pairs with class 0
    val base = (0 until 12).map(i =>
      (0 until 30).map(w => s"w${i}qz$w").mkString(" "))
    val corpus = (for {
      i <- 0 until 12; c <- 0 until 70
    } yield (i * 1000L + c, base(i))) :+ (99999L, base(0) + " almost")
    val df = corpus.toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(df, col("doc_id"), col("text"))
    val got = pairs.select($"id_a", $"id_b", $"jaccard_est")
      .as[(Long, Long, Double)].collect()
    // cross-content recall: the near-dup of text 0 pairs with EVERY
    // member of class 0 (70 copies)
    val nearDup = got.filter(p => p._1 == 99999L || p._2 == 99999L)
    assert(nearDup.length == 70, s"expected 70 near-dup pairs, got ${nearDup.length}")
    assert(nearDup.forall(p => p._3 >= 0.5 && p._3 < 1.0))
    // within-class pairs: C(70,2) per class at est exactly 1.0 (plus
    // class 0's extra member count stays 70 — 99999 is NOT exact)
    val exact = got.filter(_._3 == 1.0)
    assert(exact.length == 12 * (70 * 69 / 2), s"got ${exact.length} exact pairs")

    // compressed mode: one row per distinct-content pair, class sizes
    // (class 1 ⊂ class 11 vocabularies also near-dup — that pair is
    // the operator's true semantics, not noise)
    val compressed = Dedup.minhashLsh(df, col("doc_id"), col("text"),
        expandDups = false)
      .as[(Long, Long, Double, Long, Long)].collect()
    val planted = compressed.filter(_._2 == 99999L)
    assert(planted.length == 1, s"got ${compressed.mkString(";")}")
    assert(planted.head._1 == 0L && planted.head._4 == 70L && planted.head._5 == 1L)

    // composed components equal naive components over expanded pairs
    val composed = Dedup.nearDupComponents(df, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    val naive = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(composed == naive, "rep-composition must equal expanded closure")
    assert(composed.nonEmpty)
  }

  test("hammingPairs collapses identical signatures before banding") {
    // 300 copies of sig A (> maxBucket=256) + one 2-bit neighbor:
    // pre-r10 every piece bucket blew the cap and nothing came back
    val sigs = ((0 until 300).map(i => (i.toLong, 0x0123456789abcdefL)) :+
      (777L, 0x0123456789abcdefL ^ 3L)).toDF("doc_id", "sig")
    val got = Dedup.hammingPairs(sigs, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    val near = got.filter(p => p._1 == 777L || p._2 == 777L)
    assert(near.length == 300 && near.forall(_._3 == 2L))
    assert(got.count(_._3 == 0L) == 300 * 299 / 2)
  }

  test("ngram jaccard finds planted pairs across length buckets") {
    val planted = docs.select($"doc_id", $"text").unionByName(
      docs.filter($"doc_id" % 50 === 0).select(
        ($"doc_id" + 1000000L).as("doc_id"),
        concat($"text", lit(" near duplicate suffix")).as("text")))
    val pairs = Dedup.ngramJaccard(planted, col("doc_id"), col("text"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val expected = docs.filter($"doc_id" % 50 === 0).select($"doc_id")
      .as[Long].collect().map(i => (i, i + 1000000L)).toSet
    assert(expected.subsetOf(pairs), s"missing ${expected.diff(pairs)}")
  }

  test("incremental LSH equals the full run restricted to delta-touching pairs") {
    val base = docs.select($"doc_id", $"text")
    val delta = base.filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"),
        concat($"text", lit(" near duplicate suffix")).as("text"))
    val incr = Dedup.minhashLshDelta(base, delta, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.minhashLsh(base.unionByName(delta), col("doc_id"), col("text"))
      .filter($"id_a" >= 1000000L || $"id_b" >= 1000000L)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr == full, s"incremental diverges: ${incr.diff(full)} / ${full.diff(incr)}")
    assert(incr.nonEmpty, "planted delta dups must be found")
  }

  test("incremental LSH matches the collapsed full run on a DUPLICATE-HEAVY base") {
    // 12 distinct texts x 100 exact copies: pre-r11 the delta path
    // banded RAW rows, every bucket blew the 64-id cap, and the delta
    // probe returned empty while the collapsed full run found the
    // planted near-dup — the r10 batch-path bug, alive on the
    // incremental path. Post-r11 both collapse identically.
    // disjoint per-class alphabets: cross-class shingle overlap ~0, so
    // the only true near-dup is the delta against class 3's copies
    val texts = (0 until 12).map { i =>
      val w = ('a' + i).toChar.toString * 8
      Seq.fill(10)(w).mkString(" ")
    }
    val base = (for (i <- texts.indices; c <- 0 until 100)
      yield ((i * 1000 + c).toLong, texts(i))).toDF("doc_id", "text")
    val delta = Seq((999999L, texts(3) + " tail")).toDF("doc_id", "text")
    val incr = Dedup.minhashLshDelta(base, delta, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.minhashLsh(base.unionByName(delta), col("doc_id"), col("text"))
      .filter($"id_a" === 999999L || $"id_b" === 999999L)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr == full,
      s"diverges: extra=${incr.diff(full).take(3)} missing=${full.diff(incr).take(3)}")
    // the delta must pair with every copy of its near-dup class
    assert(incr.size == 100, s"expected 100 delta pairs, got ${incr.size}")
  }

  test("containment is directed: embedded doc scores 1.0, container does not") {
    // doc 1 is wholly embedded in doc 2 (which is ~3× larger); doc 3
    // shares the wrapper text so the universe has df>=2 grams beyond
    // the embedded span
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val wrapper = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val d = Seq(
      (1L, small),
      (2L, s"$wrapper $small $wrapper"),
      (3L, s"$wrapper other words entirely distinct here $wrapper"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, col("doc_id"), col("text"),
      n = 5, maxDf = 10, minContainment = 0.9)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got.get((1L, 2L)).contains(1.0), s"embedded doc must be fully contained: $got")
    assert(!got.contains((2L, 1L)), "container must NOT be contained in the embedded doc")
  }

  test("embedding cosine near-dup finds scaled copies") {
    val planted = emb.select($"vec_id", $"embedding").unionByName(
      emb.filter($"vec_id" % 50 === 0).select(
        ($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", x => (x.cast("double") * 1.001).cast("float"))
          .as("embedding")))
    val pairs = Ann.cosineNearDupPairs(planted, col("vec_id"), col("embedding"), 0.98)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val expected = emb.filter($"vec_id" % 50 === 0).select($"vec_id")
      .as[Long].collect().map(i => (i, i + 1000000L)).toSet
    assert(expected.subsetOf(pairs), s"missing ${expected.diff(pairs)}")
  }

  test("brute-force ANN: k ordered rows per query, cos within [-1,1]") {
    val q = emb.filter($"vec_id" < 3)
    val res = Ann.bruteTopK(emb, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 5).cache()
    assert(res.groupBy($"q_id").count().filter($"count" =!= 5).count() == 0)
    assert(res.filter(abs($"cos") > 1.0 + 1e-9).count() == 0)
    // rnk ordering matches cos descending
    val perQ = res.filter($"q_id" === 0).orderBy($"rnk").select($"cos").as[Double].collect()
    assert(perQ.sameElements(perQ.sorted(Ordering[Double].reverse)))
  }

  test("LSH ANN neighbors are a subset-quality approximation of brute force") {
    val q = emb.filter($"vec_id" < 3)
    val brute = Ann.bruteTopK(emb, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 10)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(emb, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 10, planes = 4)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    assert(lsh.intersect(brute).nonEmpty, "LSH found none of the true neighbors")
  }

  test("IVF ANN finds a sane share of the true neighbors") {
    val q = emb.filter($"vec_id" < 3)
    val brute = Ann.bruteTopK(emb, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 10)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(emb, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = 10, centroids = 8, nProbe = 3)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    assert(ivf.intersect(brute).nonEmpty, "IVF found none of the true neighbors")
    // each query's own cell is probed first → rank-1 matches brute top
    assert(ivf.size <= 30)
  }

  test("langid marks stopword-rich english and spanish") {
    val df = Seq(
      (1L, "the cat and the dog went to the house of friends"),
      (2L, "el perro y la casa de los amigos que vienen por aqui"),
      (3L, "zxqj vvkw ppqq")).toDF("id", "txt")
    val got = TextAnalysis.langId(df, col("id"), col("txt"))
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "und")
  }

  test("token counts on known text") {
    val df = Seq((1L, "hello world, 42 times!")).toDF("id", "txt")
    val got = TextAnalysis.tokenCounts(df, col("id"), col("txt"))
      .select($"ws_tokens", $"bpe_ish_tokens").as[(Long, Long)].head()
    assert(got._1 == 4)            // hello / world, / 42 / times!
    assert(got._2 == 6)            // hello|world|,|42|times|!
  }

  test("charStats: exact collision index and printable ratio on known text") {
    // "aab\t": counts a=2, b=1, tab=1; n=4; sum_c2=4+1+1=6;
    // collision=6/16; printable 3 of 4 (tab is outside [ -~])
    val df = Seq((1L, "aab\t")).toDF("id", "txt")
    val got = TextAnalysis.charStats(df, col("id"), col("txt"))
      .select($"n_chars", $"distinct_chars", $"char_collision", $"printable_ratio")
      .as[(Long, Long, Double, Double)].head()
    assert(got == ((4L, 3L, 6.0 / 16.0, 3.0 / 4.0)))
  }

  test("multimodal payload + stub decode keeps schema and determinism") {
    val withPayload = Multimodal.attachPayload(docs, col("doc_id"), col("text"))
    assert(withPayload.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.fakeDecode(spark, withPayload)
    val one = feats.filter($"doc_id" === 0L).collect().head
    val again = Multimodal.fakeDecode(spark, withPayload)
      .filter($"doc_id" === 0L).collect().head
    assert(one == again)
    assert(Set("image", "audio", "video").contains(one.modality))
    assert(feats.count() == docs.count())
  }

  test("custom expressions run inside codegen over a DataFrame") {
    val out = docs.select(
      F.simhash64($"text").as("sh"),
      F.rollingFingerprint($"text").as("fp"),
      F.minhashSig($"text", 5, 16).as("mh"))
    assert(out.filter($"sh".isNull || $"fp".isNull).count() == 0)
    assert(out.select(size($"mh")).distinct().as[Int].collect().toSet == Set(16))
  }

  test("rangeSearch returns every neighbor above the threshold") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val got = llm.Ann.rangeSearch(e, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), minCos = 0.2)
    // brute-force the same threshold via the top-k path with k = corpus size
    val n = e.count().toInt
    val want = llm.Ann.bruteTopK(e, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = n)
      .filter(col("cos") >= 0.2)
    assert(got.count() == want.count())
    assert(got.filter(col("cos") < 0.2).count() == 0)
  }

  test("urlNormKeepFirst canonicalizes scheme/www/query/slash variants") {
    val df = Seq(
      (1L, "HTTPS://WWW.Example.com/a/"),
      (2L, "http://example.com/a?q=1"),
      (3L, "example.com/a"),
      (4L, "https://other.com/b")
    ).toDF("id", "url")
    val rows = llm.Dedup.urlNormKeepFirst(df, col("id"), col("url"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows.head == ("example.com/a", 1L, 3L))
    assert(rows(1) == ("other.com/b", 4L, 1L))
  }

  test("ngramStats counts bigrams with deterministic top-k order") {
    val df = Seq("a b a b", "a b c").toDF("text")
    val got = llm.TextAnalysis.ngramStats(df, col("text"), k = 10)
      .as[(String, Long, Long)].collect().toList
    // "a b" x3 ranks first; ties by gram text
    assert(got.head == ("a b", 3L, 1L))
    assert(got.map(_._1).toSet == Set("a b", "b a", "b c"))
  }

  test("resizePlan caps the long edge and preserves aspect") {
    val feats = Seq(
      (1L, "image", 10L, 1024, 512, 1),
      (2L, "image", 10L, 100, 400, 1),
      (3L, "image", 10L, 64, 64, 1)
    ).toDF("doc_id", "modality", "n_bytes", "width", "height", "n_frames")
    val got = llm.Multimodal.resizePlan(feats)
      .select("doc_id", "out_w", "out_h").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((256, 128)))
    assert(got(2L) == ((64, 256)))
    assert(got(3L) == ((64, 64)))
  }

  test("frameSamplePlan never samples more than maxFrames frames") {
    val feats = Seq(
      (1L, "video", 10L, 10, 10, 100),
      (2L, "video", 10L, 10, 10, 3),
      (3L, "image", 10L, 10, 10, 1)
    ).toDF("doc_id", "modality", "n_bytes", "width", "height", "n_frames")
    val got = llm.Multimodal.frameSamplePlan(feats)
      .select("doc_id", "n_sampled").as[(Long, Long)].collect().toMap
    assert(got(1L) == 8) // stride ceil(100/8)=13: 0,13,...,91
    assert(got(2L) == 3) // stride 1: 0,1,2
    assert(got(3L) == 1) // non-video passes through
    assert(got.values.forall(_ <= 8))
  }

  test("tfidfTopTerms ranks rarer terms above common ones, k bounds output") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common common")
    ).toDF("doc_id", "text")
    val top = llm.TextAnalysis
      .tfidfTopTerms(docs, col("doc_id"), col("text"), k = 2)
      .as[(Long, String, Long, Long, Double, Long)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._6).map(_._2).toSeq }
    // doc 1: apple tf=2 df=1 (score 6.0) beats banana tf=1 df=2 (1.5)
    assert(top(1L) == Seq("apple", "banana"))
    // doc 2: cherry df=1 (3.0) beats banana df=2 (1.5)
    assert(top(2L) == Seq("cherry", "banana"))
    // doc 3: only 'common' qualifies — fewer than k rows is fine
    assert(top(3L) == Seq("common"))
  }

  test("duplicateSpans: copied docs show duplicated grams, originals stay first") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (1L, base),                        // original: all grams first
      (2L, base + " tail1 tail2"),       // copy + unique tail
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")    // unrelated: single gram, first
    ).toDF("doc_id", "text")
    val got = llm.Dedup
      .duplicateSpans(docs, col("doc_id"), col("text"), n = 8)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 3L, 0L)))    // 10 tokens -> 3 grams, all first
    assert(got(2L) == ((5L, 2L, 3L)))    // shares doc 1's 3 grams, 2 new
    assert(got(3L) == ((1L, 1L, 0L)))
  }

  test("duplicateSpans counts within-doc repeats as duplicates") {
    val docs = Seq((1L, "a b a b a b a b a b a b")).toDF("doc_id", "text")
    // 12 tokens -> 5 8-grams but only 2 distinct (alternating), so
    // 3 occurrences are within-doc duplicates
    val got = llm.Dedup
      .duplicateSpans(docs, col("doc_id"), col("text"), n = 8)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((1L, 5L, 2L, 3L, 0.6)))
  }

  test("cosinePairs: integer-exact threshold boundary, no-gram docs, class expansion") {
    // A: 9 tokens -> 5 distinct 5-grams g1..g5
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    // B: 5 grams sharing exactly g1,g2,g3 with A -> c=3, na=nb=5,
    // cos = 3/5 EXACTLY -> must be included (>=, not >)
    val b = "w1 w2 w3 w4 w5 w6 w7 x1 x2"
    // C = B + one token: 6 grams, all 5 of B's -> cos(B,C) = 5/sqrt(30)
    // included; but vs A it shares only g1,g2,g3 -> 3/sqrt(30) < 3/5
    // -> (A,C) excluded
    val c = "w1 w2 w3 w4 w5 w6 w7 x1 x2 x3"
    val docs = Seq(
      (1L, a), (2L, b), (3L, c),
      (4L, a),                 // exact duplicate of 1 -> class pair, cos 1.0
      (5L, "too short")        // < 5 tokens: no grams, never pairs
    ).toDF("doc_id", "text")
    val got = TextAnalysis.cosinePairs(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // boundary pair present with the exact rational value
    assert(got((1L, 2L)) == 3.0 / 5.0)
    assert(got((2L, 3L)) == 5.0 / math.sqrt(30.0))
    assert(!got.contains((1L, 3L)) && !got.contains((3L, 4L)))
    // duplicate of A expands: within-class (1,4) at 1.0 and the
    // member-level echo of the (1,2) rep pair
    assert(got((1L, 4L)) == 1.0)
    assert(got((2L, 4L)) == 3.0 / 5.0)
    assert(!got.keys.exists(k => k._1 == 5L || k._2 == 5L))
    assert(got.size == 4)
  }

  test("cosinePairs: prefix filter is exact-recall vs the brute-force join") {
    // brute force: FULL shared-gram self-join (no prefix, no size
    // prune, no collapse) + the same integer predicate — the spec
    // target is the candidate-generation logic, so any pair the
    // prefix filter drops would show up here
    val g = docs.select($"doc_id",
      explode(F.wordNgrams($"text", 5)).as("tok"))
    val sz = g.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val brute = g.select($"doc_id".as("id_a"), $"tok")
      .join(g.select($"doc_id".as("id_b"), $"tok"), Seq("tok"))
      .filter($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("c"))
      .join(sz.select($"doc_id".as("id_a"), $"n".as("na")), "id_a")
      .join(sz.select($"doc_id".as("id_b"), $"n".as("nb")), "id_b")
      .filter($"c" * $"c" * 25 >= $"na" * $"nb" * 9)
      .select($"id_a", $"id_b",
        ($"c".cast("double") / sqrt(($"na" * $"nb").cast("double")))
          .as("cosine"))
      .as[(Long, Long, Double)].collect().toSet
    val got = TextAnalysis.cosinePairs(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute, s"prefix-filtered ${got.size} vs brute ${brute.size}")
  }

  test("ivfDeltaIngest == full encode under a pinned codebook; drift flags fire") {
    import graft.llm.Ann
    val rnd = new scala.util.Random(5)
    def vec(center: Float) =
      Array.tabulate(8)(i => center + rnd.nextFloat() * 0.1f - 0.05f)
    // base: two tight clusters around 1.0 and -1.0
    val base = (0 until 60).map(i =>
      (i.toLong, vec(if (i % 2 == 0) 1.0f else -1.0f).toSeq))
      .toDF("vec_id", "c_vec").withColumn("c_vec", $"c_vec".cast("array<float>"))
    // delta: skewed hard toward the 1.0 cluster — the drift case
    val delta = (100 until 140).map(i => (i.toLong, vec(1.0f).toSeq))
      .toDF("vec_id", "c_vec").withColumn("c_vec", $"c_vec".cast("array<float>"))
    val cent = base.orderBy(graft.functions.F.splitmix64($"vec_id"), $"vec_id")
      .limit(4).select($"vec_id".as("cid"), $"c_vec".as("cent_vec"))
    // equality: ingesting the delta under the pinned codebook equals
    // encoding base ∪ delta from scratch under the same codebook
    val ingested = Ann.ivfDeltaIngest(Ann.assignCells(base, cent), delta, cent)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    val full = Ann.assignCells(base.unionByName(delta), cent)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    assert(ingested == full)
    // drift report: every delta vector lands near the 1.0 cluster, so
    // the cells serving it must flag and the -1.0 cells must not
    val rep = Ann.ivfDriftReport(
        Ann.assignCells(base, cent), Ann.assignCells(delta, cent), factor = 2)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rep.map(_._2).sum == 60L && rep.map(_._3).sum == 40L)
    val flagged = rep.filter(_._4)
    assert(flagged.nonEmpty, "skewed delta must flag at least one cell")
    // flags replay the exact integer rule
    rep.foreach { case (_, nb, nd, f) =>
      assert(f == (nd * 60L > 2L * nb * 40L))
    }
    // a balanced delta (the base itself) flags nothing at factor 2
    val balanced = Ann.ivfDriftReport(
        Ann.assignCells(base, cent), Ann.assignCells(base, cent), factor = 2)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(balanced.forall(!_._4))
  }
}
