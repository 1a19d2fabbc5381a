package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning — the bridge from
  * "BPE-ish regex" token counts to REAL learned-tokenizer counts for
  * the packing/budgeting operators (`pack_sequences`,
  * `ds_token_budget`). Classic word-level BPE (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 — public literature): train on the DISTINCT-word
  * frequency table, not the corpus.
  *
  * Scale shape — the reason this survives 100 TB: the corpus is
  * touched EXACTLY ONCE (the word-frequency aggregation, map-combined
  * on the word key); every training round thereafter runs on the
  * vocabulary frame (distinct words — bounded by language, not by
  * corpus size). A round is:
  *
  *   1. adjacent-pair counts: map-only pair explode over the vocab's
  *      symbol arrays, freq-weighted map-combined aggregation — one
  *      vocab-sized shuffle of (a, b, partial) rows;
  *   2. the deterministic argmax merge (count DESC, pair lexicographic
  *      ASC tie-break) — a 1-row driver collect (control-plane, the
  *      k-means/IVF centroid idiom);
  *   3. merge application: the [[graft.functions.F.bpeMerge]] codegen
  *      kernel, map-only over the vocab frame, localCheckpointed per
  *      round (the q_pagerank iteration discipline — round t must not
  *      re-execute rounds 1..t−1).
  *
  * Everything is deterministic: integer counts, total tie-break
  * order, greedy left-to-right merge application (scan consumes
  * matched pairs and never re-matches inside a consumed span) — so a
  * SQL oracle can replay training round for round.
  */
object Bpe {

  /** One learned merge: `rank`-th round chose to fuse (lhs, rhs),
    * which co-occurred adjacently `pair_count` (freq-weighted) times.
    */
  case class Merge(rank: Long, lhs: String, rhs: String, pair_count: Long)

  /** Distinct-word frequency table: whitespace-split lowercased
    * words. The ONE corpus-sized aggregation of the whole trainer.
    */
  def wordFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(lower(text), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `rounds` merges; returns (merges in rank order, final
    * vocabulary frame (word, freq, syms) whose symbol-array sizes ARE
    * the learned token counts). Stops early if no adjacent pair
    * remains (degenerate single-char corpus).
    */
  def train(
      docs: DataFrame, text: Column, rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, s"rounds must be ≥ 1, got $rounds")
    var vocab = wordFreqs(docs, text)
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // adjacent pairs of the symbol array, freq-weighted: transform
      // emits size-1 structs per word, explode + map-combined agg
      val best = vocab
        .select(col("freq"),
          explode(expr(
            "transform(slice(syms, 1, size(syms) - 1)," +
              " (s, i) -> struct(s AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r.toLong, a, b, c)
        vocab = vocab
          .withColumn("syms", graft.functions.F.bpeMerge(col("syms"), a, b))
          .localCheckpoint()
        r += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Per-document LEARNED-BPE token counts: train `rounds` merges,
    * then charge each document the sum over its word occurrences of
    * the word's final symbol count. One corpus-sized word explode +
    * one vocab-keyed join (the txt_tfidf idiom — no broadcast
    * assumption; Catalyst broadcasts when the vocab is small) + one
    * doc-keyed aggregation.
    */
  def docTokenCounts(
      docs: DataFrame, id: Column, text: Column, extra: Seq[Column],
      rounds: Int): DataFrame = {
    val (_, vocab) = train(docs, text, rounds)
    val tokLen = vocab.select(col("word"), size(col("syms")).cast("long").as("toklen"))
    val exploded = docs.select(
      (id.as("doc_id") +: extra) :+ explode(split(lower(text), " ")).as("word"): _*)
      .filter(col("word") =!= "")
    val keys = exploded.columns.filter(_ != "word").map(col).toSeq
    exploded.join(tokLen, "word")
      .groupBy(keys: _*)
      .agg(sum(col("toklen")).as("bpe_tokens"))
  }
}
