package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** Distributed BPE merge learning: the Spark trainer must reproduce a
  * driver-side reference implementation of the same algorithm (greedy
  * left-to-right application, count-DESC / pair-ASC argmax) round for
  * round, and its learned token counts must feed packing
  * deterministically.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference single-machine BPE (the python-exact third engine in
    * Scala): word-freq map, R rounds of pair-count + argmax + greedy
    * merge.
    */
  private def refBpe(
      texts: Seq[String], rounds: Int,
      batch: Int = 1): (Seq[(String, String, Long)], Map[String, Int]) = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split(" ", -1))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    def applyMerge(v: Map[Vector[String], Long], a: String, b: String) =
      v.groupBy { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }.map { case (syms, m) => syms -> m.values.sum }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.nonEmpty) {
        // the trainer's skip-walk over the top 4·batch ranking prefix
        val ranked = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.take(batch * 4)
        val used = scala.collection.mutable.Set.empty[String]
        var n = 0
        ranked.foreach { case ((a, b), c) =>
          // conflict-free = disjoint in symbols AND concatenations
          // (the r10-advice rule the trainer applies)
          if (n < batch && !used.contains(a) && !used.contains(b) &&
              !used.contains(a + b)) {
            used += a; used += b; used += (a + b); n += 1
            merges += ((a, b, c))
            vocab = applyMerge(vocab, a, b)
          }
        }
      }
    }
    (merges.result(), vocab.map { case (syms, _) => syms.mkString -> syms.size })
  }

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "aaaa aaaa baaa",          // a==a run: alternation-within-runs path
    "low lower lowest slow slowly",
    "the the the low low cat") // heavy repeats drive multi-symbol merges

  test("train reproduces the reference implementation round for round") {
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (got, vocabDf) = Bpe.train(docs, col("text"), rounds = 6)
    val (want, wantLens) = refBpe(corpus, 6)
    assert(got.map(m => (m.lhs, m.rhs, m.pair_count)) == want,
      s"got=${got.toList}\nwant=$want")
    assert(got.map(_.rank) == (1L to got.size).toSeq)
    // final vocabulary token lengths match the reference
    val gotLens = vocabDf.select(col("word"), size(col("syms")))
      .as[(String, Int)].collect().toMap
    assert(gotLens == wantLens, s"lens differ: ${gotLens.toSeq.sorted.take(5)}")
  }

  test("batched training equals SEQUENTIAL on a compatibility-partitioned vocab") {
    // disjoint per-class alphabets with strictly decreasing dominant
    // pair counts: every top candidate is symbol-disjoint from and
    // strictly dominates the rest, so the parallel skip-walk batch IS
    // the sequential Sennrich prefix — the "where compatible" clause
    // of the r10 batching, asserted
    // two-symbol words: merging one fuses the whole word, creating NO
    // new pairs — the classes never interact
    val texts =
      Seq.fill(40)("ab ab") ++ Seq.fill(30)("cd cd") ++
        Seq.fill(20)("ef ef") ++ Seq.fill(10)("gh gh")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (seq, seqVocab) = Bpe.train(docs, col("text"), rounds = 4, batch = 1)
    val (bat, batVocab) = Bpe.train(docs, col("text"), rounds = 1, batch = 4)
    assert(bat == seq && bat.size == 4,
      s"batch=${bat.toList}\nseq=${seq.toList}")
    val sv = seqVocab.select(col("word"), col("syms")).as[(String, Seq[String])]
      .collect().toMap
    val bv = batVocab.select(col("word"), col("syms")).as[(String, Seq[String])]
      .collect().toMap
    assert(bv == sv)
  }

  test("batched training replicates the reference skip-walk on randomized corpora") {
    val rnd = new scala.util.Random(20260814L)
    val ab = "abcde"
    (0 until 4).foreach { trial =>
      val texts = (0 until 30).map { _ =>
        (0 until (1 + rnd.nextInt(6)))
          .map(_ => (1 to (1 + rnd.nextInt(6)))
            .map(_ => ab(rnd.nextInt(ab.length))).mkString)
          .mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (want, _) = refBpe(texts, rounds = 4, batch = 5)
      val (bat, _) = Bpe.train(docs, col("text"), rounds = 4, batch = 5)
      assert(bat.map(m => (m.lhs, m.rhs, m.pair_count)) == want,
        s"trial $trial diverged:\nbatch=${bat.toList}\nref=$want\ncorpus=$texts")
    }
  }

  test("64+ merges on the real corpus in <= 8 driver rounds at batch 16") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (merges, _) = Bpe.train(docs, col("text"), rounds = 6, batch = 16)
    assert(merges.size >= 64, s"learned only ${merges.size}")
    assert(Bpe.lastTrainRounds <= 8,
      s"took ${Bpe.lastTrainRounds} driver rounds")
    // ranks are the global learned order
    assert(merges.map(_.rank) == (1L to merges.size).toSeq)
  }

  test("BPE saturates the synthetic corpus's full merge closure (r10 item 3a)") {
    // the driver-generated documents corpus has a 31-word vocabulary:
    // its COMPLETE merge closure (every distinct word fused to one
    // learned token) is the most ANY BPE trainer can learn from it.
    // Assert the batched trainer reaches exactly that — merge count on
    // this corpus is bounded by corpus entropy, not by the trainer.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val (merges, vocab) = Bpe.train(docs, col("text"), rounds = 40, batch = 64)
    assert(vocab.filter(size(col("syms")) > 1).count() == 0L,
      "closure: every distinct word must fuse to a single token")
    assert(merges.size < 200, s"31-word closure, got ${merges.size}")
    assert(Bpe.lastTrainRounds < 40, "must stop on pair exhaustion")
  }

  test("1k+ merge vocabulary: invariants hold at scale config (r10 item 3b)") {
    // a >=1k-merge vocabulary needs corpus entropy the synthetic
    // documents table lacks — generate ~1.1k distinct syllable-composed
    // words with deterministic skewed frequencies, the realistic shape
    // word-level BPE trains on. The oracle replays the PINNED small
    // config round for round (txt_bpe_train); this property spec
    // covers the large config.
    val syl = Vector("spar", "kle", "ba", "tch", "ing", "col", "umn",
      "or", "der", "fil", "ter", "win", "dow", "agg", "re", "gate",
      "shuf", "fle", "par", "ti", "tion", "broad", "cast", "ha", "sh",
      "jo", "in", "scan", "mer", "ge", "sort", "que", "ry", "plan")
    val words = (for { ai <- syl.indices; bi <- syl.indices }
      yield syl(ai) + syl(bi) + syl((ai + bi) % syl.size)).distinct
    val texts = (0 until 1500).map { d =>
      (0 until 16).map { j =>
        words((d * 37 + j * j * 11 + 5) % words.size)
      }.mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, col("text"), rounds = 60, batch = 64)
    assert(merges.size >= 1000, s"learned only ${merges.size} merges")
    // ranks are the contiguous global learned order
    assert(merges.map(_.rank) == (1L to merges.size).toSeq)
    // every recorded pair count is a positive frequency-weighted count
    assert(merges.forall(_.pair_count > 0))
    // RECONSTRUCTION invariant: merge application never loses or
    // reorders characters — the final symbols concatenate back to the
    // word, for every vocabulary entry
    val broken = vocab
      .filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(broken == 0L, s"$broken vocab rows fail reconstruction")
    // learned merges are unique as pairs (a merged pair cannot
    // recur: application is exhaustive and conflict-free per round)
    val pairs = merges.map(m => (m.lhs, m.rhs))
    assert(pairs.distinct.size == pairs.size, "duplicate merge learned")
    // DETERMINISM under physical layout: same merge prefix from a
    // repartitioned corpus (integer counts + total tie-break order)
    val (again, _) = Bpe.train(docs.repartition(7), col("text"),
      rounds = 2, batch = 64)
    assert(again.map(m => (m.lhs, m.rhs, m.pair_count)) ==
      merges.take(again.size).map(m => (m.lhs, m.rhs, m.pair_count)))
  }

  test("merge application handles overlapping same-symbol runs greedily") {
    // "aaaa" under (a,a): [aa, aa]; "aaa": [aa, a]; "abab" under (a,b)
    val df = Seq("aaaa", "aaa", "abab").toDF("w")
      .withColumn("syms", split(col("w"), ""))
      .withColumn("m_aa", graft.functions.F.bpeMerge(col("syms"), "a", "a"))
      .withColumn("m_ab", graft.functions.F.bpeMerge(col("syms"), "a", "b"))
    val got = df.select(col("w"), col("m_aa"), col("m_ab"))
      .as[(String, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("aaaa") == ((Seq("aa", "aa"), Seq("aaaa".map(_.toString): _*))))
    assert(got("aaa") == ((Seq("aa", "a"), Seq("a", "a", "a"))))
    assert(got("abab") == ((Seq("a", "b", "a", "b"), Seq("ab", "ab"))))
  }

  test("encode: ids decode back to the document, id layout and counts hold") {
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, col("text"), rounds = 6)
    // rebuild the id table exactly as encode defines it
    val baseChars = corpus.flatMap(_.toLowerCase.split(" ", -1))
      .filter(_.nonEmpty).flatMap(_.split("")).distinct.sorted
    val idToTok = scala.collection.mutable.Map.empty[Int, String]
    baseChars.zipWithIndex.foreach { case (c, i) => idToTok(i) = c }
    merges.foreach { m =>
      idToTok(baseChars.length + m.rank.toInt - 1) = m.lhs + m.rhs
    }
    val enc = Bpe.encode(docs, col("doc_id"), col("text"), rounds = 6)
      .as[(Long, Seq[Int])].collect().toMap
    // 1. round-trip: concatenating the id's token strings reproduces
    //    the document's words (whitespace removed, in order)
    corpus.zipWithIndex.foreach { case (t, i) =>
      val want = t.toLowerCase.split(" ", -1).filter(_.nonEmpty).mkString
      val got = enc(i.toLong).map(idToTok).mkString
      assert(got == want, s"doc $i decode: $got != $want")
    }
    // 2. sequence length equals docTokenCounts' charge
    val counts = Bpe.docTokenCounts(
        docs, col("doc_id"), col("text"), Seq.empty, rounds = 6)
      .select(col("doc_id"), col("bpe_tokens")).as[(Long, Long)]
      .collect().toMap
    enc.foreach { case (d, ids) => assert(ids.length.toLong == counts(d)) }
    // 3. word-level ids match the trained vocab's symbol sequences
    val tokToMinId = idToTok.toSeq.groupMap(_._2)(_._1)
      .map { case (t, ids) => t -> ids.min }
    val wordSyms = vocab.select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect().toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val want = t.toLowerCase.split(" ", -1).filter(_.nonEmpty)
        .flatMap(w => wordSyms(w).map(tokToMinId))
      assert(enc(i.toLong) == want.toSeq, s"doc $i ids")
    }
  }

  test("encodeWithMerges is bit-equal to the chained-kernel encode (r12 item 2)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = Bpe.encode(docs, col("doc_id"), col("text"),
        rounds = 6, batch = 16)
      .as[(Long, Seq[Int])].collect().toMap
    val merges = Bpe.train(docs, col("text"), rounds = 6, batch = 16)._1
    val got = Bpe.encodeWithMerges(docs, col("doc_id"), col("text"), merges)
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == want)
  }

  test("applyMergesToWord equals the literal pass-per-rank fold") {
    // literal reference: run EVERY rank's greedy pass in order,
    // no-ops included — the trainer's exact application semantics
    def literal(word: String, pairs: Array[(String, String)]): Vector[String] = {
      var syms = word.split("").filter(_.nonEmpty).toVector
      pairs.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val rnd = new scala.util.Random(1234)
    // random merge chains over a tiny alphabet: later merges reference
    // earlier concatenations, so min-rank jumps and stale-rank skips
    // both get exercised (a pass can CREATE a lower-rank pair that
    // must stay unmerged)
    for (trial <- 0 until 200) {
      val alpha = Vector("a", "b", "c")
      val toks = scala.collection.mutable.ArrayBuffer(alpha: _*)
      val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val seen = scala.collection.mutable.Set.empty[(String, String)]
      while (pairs.size < 12) {
        val p = (toks(rnd.nextInt(toks.size)), toks(rnd.nextInt(toks.size)))
        if (!seen(p)) { seen += p; pairs += p; toks += (p._1 + p._2) }
      }
      val pa = pairs.toArray
      val rm = pa.iterator.zipWithIndex.map { case (p, i) => (p, i + 1) }.toMap
      val word = (0 until (3 + rnd.nextInt(15)))
        .map(_ => alpha(rnd.nextInt(3))).mkString
      val got = Bpe.applyMergesToWord(word, pa, rm).toVector
      val want = literal(word, pa)
      assert(got == want, s"trial $trial word $word: $got != $want")
    }
  }

  test("encodeWithMerges at a 1.3k-merge vocabulary (r12 item 2 measurement)") {
    // the syllable corpus from the 1k-merge training spec — enough
    // entropy for >=1000 merges, where the chained-kernel encode arm
    // would build a 1k+-entry codegen literal
    val syl = Vector("spar", "kle", "ba", "tch", "ing", "col", "umn",
      "or", "der", "fil", "ter", "win", "dow", "agg", "re", "gate",
      "shuf", "fle", "par", "ti", "tion", "broad", "cast", "ha", "sh",
      "jo", "in", "scan", "mer", "ge", "sort", "que", "ry", "plan")
    val wordsAll = (for { ai <- syl.indices; bi <- syl.indices }
      yield syl(ai) + syl(bi) + syl((ai + bi) % syl.size)).distinct
    val texts = (0 until 1500).map { d =>
      (0 until 16).map { j =>
        wordsAll((d * 37 + j * j * 11 + 5) % wordsAll.size)
      }.mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, col("text"), rounds = 60, batch = 64)
    assert(merges.size >= 1000, s"learned only ${merges.size} merges")
    val t0 = System.nanoTime()
    val enc = Bpe.encodeWithMerges(docs, col("doc_id"), col("text"), merges)
    val nDocs = enc.count()
    val wall = (System.nanoTime() - t0) / 1e9
    assert(nDocs == 1500L)
    info(f"encodeWithMerges at ${merges.size} merges: $wall%.2f s for $nDocs docs")
    // per-word symbol equality against the trainer's own chained-
    // kernel application: the trie-free arm reproduces the vocabulary
    // the 60 rounds of bpeMerge kernels produced, at full vocab size
    val pa = merges.sortBy(_.rank).map(m => (m.lhs, m.rhs)).toArray
    val rm = pa.iterator.zipWithIndex.map { case (p, i) => (p, i + 1) }.toMap
    val wordSyms = vocab.select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect()
    wordSyms.foreach { case (w, syms) =>
      val got = Bpe.applyMergesToWord(w, pa, rm).toSeq
      assert(got == syms, s"word $w: $got != $syms")
    }
  }

  test("docTokenCounts charges each doc the learned per-word symbol counts") {
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t, s"src${i % 2}") }
      .toDF("doc_id", "text", "source")
    val (_, wantLens) = refBpe(corpus, 6)
    val counts = Bpe.docTokenCounts(
        docs, col("doc_id"), col("text"), Seq(col("source")), rounds = 6)
      .select(col("doc_id"), col("bpe_tokens")).as[(Long, Long)].collect().toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val want = t.toLowerCase.split(" ", -1).filter(_.nonEmpty)
        .map(w => wantLens(w).toLong).sum
      assert(counts(i.toLong) == want, s"doc $i: ${counts(i.toLong)} != $want")
    }
  }
  test("fertilityDrift: exact integer flag, boundary not drifted, zero-delta quiet") {
    // s1: base 3 words / 3 tokens (fert 1.0), delta 2 words / 4 tokens
    // (fert 2.0) -> 8*4*3 = 96 > 9*3*2 = 54 -> drifted
    // s2: both sides fert 2.0 -> 64 > 72 false -> quiet
    // s3: base only -> 0 > 0 false -> quiet
    // s4: delta fert exactly 9/8 x base -> 576 > 576 false (strict)
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "x y", "s1"),
      (3L, "p q", "s2"), (4L, "r s", "s2"),
      (5L, "m n", "s3"),
      (9L, "a b c d e f g h", "s4"), (6L, "a b c d e f g h", "s4"))
      .toDF("doc_id", "text", "source")
    val enc = Seq((1L, 3L), (2L, 4L), (3L, 4L), (4L, 4L), (5L, 9L),
      (9L, 8L), (6L, 9L)).toDF("doc_id", "n_tokens")
    val got = Bpe.fertilityDrift(enc, docs, col("doc_id"), col("text"),
        col("source"), col("doc_id") % 2 === 0)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("s1") == (("s1", 1L, 1L, 3L, 2L, 3L, 4L, true)))
    assert(got("s2") == (("s2", 1L, 1L, 2L, 2L, 4L, 4L, false)))
    assert(got("s3") == (("s3", 1L, 0L, 2L, 0L, 9L, 0L, false)))
    assert(got("s4") == (("s4", 1L, 1L, 8L, 8L, 8L, 9L, false)))
    // one token past the boundary flips the flag
    val enc2 = enc.withColumn("n_tokens",
      org.apache.spark.sql.functions.when(col("doc_id") === 6L, 10L)
        .otherwise(col("n_tokens")))
    val got2 = Bpe.fertilityDrift(enc2, docs, col("doc_id"), col("text"),
        col("source"), col("doc_id") % 2 === 0)
      .filter(col("grp") === "s4")
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().head
    assert(got2._8)
  }
}
