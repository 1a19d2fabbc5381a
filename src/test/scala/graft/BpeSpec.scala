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
      texts: Seq[String], rounds: Int): (Seq[(String, String, Long)], Map[String, Int]) = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.toLowerCase.split(" ", -1))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b, c))
        vocab = vocab.groupBy { case (syms, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result()
        }.map { case (syms, m) => syms -> m.values.sum }
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
}
