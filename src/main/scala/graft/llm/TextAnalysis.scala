package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Text analysis for training-data curation (SURVEY.md §2 T):
  * token counting, quality scoring, heuristic language ID, document
  * fingerprinting. All built from codegen'd built-ins (regex ops) or
  * custom codegen Expressions — no UDFs in the hot path.
  */
object TextAnalysis {

  /** Whitespace token count + a BPE-ish segmentation count (letter
    * runs / digit runs / single punctuation marks — the pre-tokenizer
    * split GPT-style BPE vocabularies assume).
    */
  def tokenCounts(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      size(split(trim(text), "\\s+")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_ish_tokens"))

  private val StopWords = "the|a|an|and|or|of|to|in|is|it"

  /** Quality signals: length, punctuation / digit / uppercase /
    * stopword ratios, mean word length, composite score. Ratios are
    * DOUBLE with fixed evaluation order for oracle parity.
    */
  def qualityScore(df: DataFrame, id: Column, text: Column): DataFrame = {
    val len = length(text).cast("double")
    val nPunct = size(regexp_extract_all(text, lit("[.!?,;:]"), lit(0))).cast("double")
    val nDigit = size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double")
    val nStop = size(regexp_extract_all(lower(text), lit(s"\\b($StopWords)\\b"), lit(0)))
      .cast("double")
    val nTok = size(split(trim(text), "\\s+")).cast("double")
    df.select(
      id.as("doc_id"),
      len.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      (nPunct / len).as("punct_ratio"),
      (nDigit / len).as("digit_ratio"),
      (nStop / nTok).as("stop_ratio"),
      (len / nTok).as("mean_word_len"))
      .withColumn("quality",
        col("stop_ratio") * 0.4
          + when(col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0, 0.3).otherwise(0.0)
          + when(col("punct_ratio") <= 0.1, 0.2).otherwise(0.0)
          + when(col("digit_ratio") <= 0.2, 0.1).otherwise(0.0))
  }

  /** Stopword-vote language ID over a fixed marker-word table.
    * Returns argmax language or "und"; deterministic ties broken by
    * language order. A real pipeline swaps in fastText — the operator
    * shape (per-row scoring, no shuffle) is identical.
    */
  def langId(df: DataFrame, id: Column, text: Column): DataFrame = {
    val markers = Seq(
      "en" -> "the|and|of|to|in|is|that|for|with|as",
      "es" -> "el|la|de|que|y|en|un|por|con|los",
      "fr" -> "le|la|de|et|un|les|des|du|que|pour",
      "de" -> "der|die|und|das|von|zu|mit|den|ein|ist")
    val lowered = lower(text)
    // r8: word-run membership kernel instead of four regex
    // alternation passes — identical counts (a \b-bounded whole-word
    // match IS a maximal word-char run equal to that word), ~10× less
    // per-row cost; still map-only
    val scores = markers.map { case (lang, words) =>
      lang -> F.wordSetHits(lowered, words).cast("int")
    }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, score)) =>
        when(score > acc.getField("score"),
          struct(score.as("score"), lit(lang).as("lang"))).otherwise(acc)
    }
    df.select(
      id.as("doc_id"),
      when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
        .as("pred_lang"),
      best.getField("score").cast("long").as("marker_hits"))
  }

  /** Corpus-wide top-k word bigrams with counts: per-doc bigram
    * generation is a pure projection (no shuffle); the count is one
    * hash aggregation with map-side partials; the final top-k is a
    * single-partition sort of only `k`-bounded candidates via AQE.
    * Deterministic: ties broken by gram text.
    */
  def ngramStats(df: DataFrame, text: Column, k: Int = 20): DataFrame = {
    // codegen kernel, not a HOF lambda: string building inside
    // interpreted transform() lambdas measured 4.7s at sf0.1 vs
    // ~0.3s for the one-static-call expression
    val top = df.select(explode(F.wordBigrams(text)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)
    // orderBy+limit compiles to TakeOrderedAndProject: per-partition
    // top-k, driver merges k·p rows — never a global sort of all
    // distinct grams (which a bare row_number window would be).
    // The rank window then runs over only k rows.
    top.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("gram"))).cast("long"))
  }

  /** Canonical text normalization (the pass run before hashing /
    * dedup so trivial formatting differences don't defeat exact
    * dedup): lowercase, trim, strip common punctuation, collapse
    * whitespace runs. Pure projection — composes with any scan at
    * full parallelism.
    */
  def normalize(df: DataFrame, id: Column, text: Column): DataFrame = {
    val norm = regexp_replace(
      regexp_replace(lower(trim(text)), "[.,;:!?'\"()\\[\\]{}]", ""),
      "\\s+", " ")
    df.select(
      id.as("doc_id"),
      norm.as("norm_text"),
      length(norm).cast("long").as("n_chars_norm"))
  }

  /** Within-document repetition stats — the boilerplate/spam signal
    * every corpus quality filter uses (cf. Gopher/MassiveText rules):
    * duplicate-bigram fraction and most-frequent-token share. High
    * values mean templated or looping text.
    *
    * Bigram stats are a pure projection (codegen kernel); the
    * top-token share is two hash aggregations keyed by doc — all
    * shuffle-light and linear in corpus size.
    */
  def repetition(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = split(trim(text), "\\s+")
    val bgs = F.wordBigrams(text)
    val base = df.select(
      id.as("doc_id"),
      size(toks).cast("long").as("n_toks"),
      when(size(bgs) === 0, lit(0.0))
        .otherwise(lit(1.0) -
          size(array_distinct(bgs)).cast("double") / size(bgs))
        .as("dup_bigram_frac"))
    val top = df
      .select(id.as("doc_id"), explode(toks).as("tk"))
      .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("mc"))
    base.join(top, Seq("doc_id"))
      .withColumn("top_tok_frac", col("mc").cast("double") / col("n_toks"))
      .drop("mc")
  }

  /** Character-level quality signals: total/distinct char counts, the
    * Simpson collision index Σ(cᵢ/n)² (the entropy-style
    * repetitiveness measure — near 1 for degenerate one-char spam,
    * near 1/alphabet for diverse text) and the printable-ASCII ratio
    * (binary-garbage detector).
    *
    * Determinism by construction: every aggregate is an exact INTEGER
    * sum (Σc, Σc², counts), with a single double division at the end —
    * no float accumulation order to diverge between engines, and no
    * transcendental (`ln`) whose libm bits differ, which is why this
    * uses the collision index rather than Shannon entropy. Shape
    * (r8): MAP-ONLY — one codegen kernel pass per row
    * ([[graft.functions.HashOps.charStatsVec]]) computes all four
    * integer stats with an alphabet-bounded count map. The previous
    * per-char explode + (doc, char) shuffle moved 100× the corpus
    * rows through a shuffle (txt_char_stats was the single slowest
    * sf1 query, ~8 min, long after all 153 others finished); same
    * values, zero shuffles.
    */
  def charStats(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), F.charStatsVec(text).as("cs"))
      .select(
        col("doc_id"),
        col("cs").getItem(0).as("n_chars"),
        col("cs").getItem(1).as("distinct_chars"),
        (col("cs").getItem(2).cast("double")
          / (col("cs").getItem(0).cast("double") * col("cs").getItem(0).cast("double")))
          .as("char_collision"),
        (col("cs").getItem(3).cast("double") / col("cs").getItem(0).cast("double"))
          .as("printable_ratio"))

  /** Benchmark decontamination: flag training docs sharing any word
    * n-gram with a benchmark/eval set — the standard pre-training
    * hygiene pass (an eval question leaking into the corpus inflates
    * scores).
    *
    * Scale shape: the benchmark side is tiny relative to a 100 TB
    * corpus, so its distinct grams are BROADCAST — the corpus is
    * never shuffled; gram explosion is a pure projection (codegen
    * kernel), and only matching (doc, gram) rows — a vanishing
    * fraction — reach the final per-doc aggregation.
    *
    * Returns (doc_id, n_shared) for contaminated docs only; grams are
    * distinct per doc so n_shared counts distinct shared grams.
    */
  def decontaminate(
      train: DataFrame, id: Column, text: Column,
      bench: DataFrame, benchText: Column,
      n: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val benchGrams = bench
      .select(explode(F.wordNgrams(benchText, n)).as("gram")).distinct()
    train
      .select(id.as("doc_id"), explode(F.wordNgrams(text, n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Winnowing fingerprint (codegen Expression): one long per doc —
    * equal fingerprints ⇒ near-identical content with high prob.
    */
  def fingerprint(df: DataFrame, id: Column, text: Column, window: Int = 16): DataFrame =
    df.select(
      id.as("doc_id"),
      F.rollingFingerprint(text, window).as("fp"),
      F.simhash64(text).as("simhash"))

  /** Per-document top-k terms by TF-IDF, rational IDF variant:
    * score = tf · N / df. For a fixed corpus N this ranks identically
    * to the log form but stays bit-exact cross-engine (one integer
    * multiply — exact in a double below 2^53 — and one IEEE division;
    * no libm `ln`).
    *
    * Shape: explode → (doc, term) count with map-side combine →
    * document-frequency aggregate on term → shuffled join back on
    * term (both sides are vocabulary-sized — no broadcast assumption)
    * → per-doc top-k window. `nDocs` defaults to one column-pruned
    * count of `docs` at plan-build time (the eager-literal pattern:
    * the scalar rides into the plan like the Bloom bit-set / IVF
    * centroids).
    */
  def tfidfTopTerms(
      docs: DataFrame, id: Column, text: Column,
      k: Int = 5, nDocs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = nDocs.getOrElse(docs.select(id).count())
    val tf = docs
      .select(id.as("doc_id"), explode(split(text, " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df_, "term")
      .withColumn("score",
        (col("tf") * lit(n)).cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rnk")
  }

  /** Rare-token (out-of-vocabulary) profile per document: of a doc's
    * DISTINCT whitespace tokens, how many occur in fewer than `minDf`
    * documents corpus-wide. A high rare fraction flags noisy or
    * garbled text (hapax-heavy docs) — the vocabulary-level quality
    * signal length/punct ratios can't see.
    *
    * Shape: explode distinct tokens → one shuffle keyed by token for
    * the document-frequency window → one shuffle back to the doc key
    * for the rollup. The ratio is one integer-to-double division —
    * engine-exact.
    */
  def rareTokenStats(
      df: DataFrame, id: Column, text: Column, minDf: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(id.as("doc_id"),
        explode(array_distinct(split(trim(text), "\\s+"))).as("tok"))
      .filter(length(col("tok")) > 0)
    toks
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_distinct_tokens"),
        sum(when(col("df") < minDf, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_ratio",
        col("n_rare").cast("double") / col("n_distinct_tokens").cast("double"))
  }

  // Patterns restricted to syntax with identical semantics in Java
  // regex (Spark) and RE2 (DuckDB/Go): classes, bounded repeats,
  // alternation-free — no lookaround, no backrefs.
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"
  private[graft] val LongIdRe = "\\d{9}\\d*"

  /** PII scrub: count and redact e-mail addresses, dashed phone
    * numbers, and long (≥9-digit) identifier runs — the masking pass a
    * training corpus goes through before anything else sees it.
    *
    * The three patterns are applied IN SEQUENCE (each count runs on
    * the text as already redacted by the previous pass), so a digit
    * run inside an e-mail local part is never double-counted as an
    * identifier. Output per doc: the three counts, the redacted
    * length, and an MD5 of the redacted text (cheap equality witness —
    * the full redacted corpus never needs to be compared).
    *
    * Shape: a pure projection — codegen regexp over each partition,
    * zero shuffles, trivially scale-free.
    */
  def piiRedact(df: DataFrame, id: Column, text: Column): DataFrame = {
    val e1 = regexp_replace(text, EmailRe, "<EMAIL>")
    val e2 = regexp_replace(e1, PhoneRe, "<PHONE>")
    val e3 = regexp_replace(e2, LongIdRe, "<ID>")
    df.select(
      id.as("doc_id"),
      regexp_count(text, lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(e1, lit(PhoneRe)).cast("long").as("n_phone"),
      regexp_count(e2, lit(LongIdRe)).cast("long").as("n_id"),
      length(e3).cast("long").as("red_len"),
      md5(e3.cast("binary")).as("red_md5"))
  }

  /** Inverted index with BOUNDED posting lists: token → document
    * frequency, total term frequency, and the first `maxPostings`
    * doc_ids as an ascending `array<long>` (`postings`). The structure
    * behind corpus-level lookup services (decontamination checks,
    * attribution probes); callers that need a flat string encoding
    * (e.g. cross-engine compares) apply `array_join` downstream.
    *
    * Scale shape: explode → per-(token, doc) partial-aggregated count
    * (shuffle 1) → window ranked by doc_id within token (shuffle 2) →
    * final groupBy(token) reuses the window's hash partitioning, so no
    * third exchange. Per-token collected state is capped at
    * `maxPostings` ids — a stop-word appearing in every document of a
    * 100 TB corpus still collects only `maxPostings` entries; the
    * unbounded-collect_set formulation would OOM on exactly those keys.
    */
  def invertedIndex(
      df: DataFrame, id: Column, text: Column, maxPostings: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df
      .select(id.as("doc_id"), explode(split(text, " ")).as("token"))
      .filter(length(col("token")) > 0)
    val perDoc = tok.groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val ranked = perDoc.withColumn(
      "rn", row_number().over(Window.partitionBy(col("token")).orderBy(col("doc_id"))))
    ranked.groupBy(col("token")).agg(
      count(lit(1)).as("df"),
      sum(col("tf")).as("tf_total"),
      array_sort(collect_list(when(col("rn") <= maxPostings, col("doc_id"))))
        .as("postings"))
  }

  /** Rational unigram-surprisal score, log-free: per document,
    * `surprisal_num = Σ_occurrences (N div cf_t)` where N is the
    * corpus token count and cf_t the token's corpus frequency — the
    * integer floor of each occurrence's inverse relative frequency.
    * Ranks documents by how much rare vocabulary they carry, the same
    * signal a unigram-LM perplexity filter uses, but with NO libm log
    * (cross-engine `ln` is not bit-stable) and an order-independent
    * integer sum, so the score is exact at any parallelism.
    *
    * Shape: token-frequency table (one shuffle, map-combined), joined
    * back on the token key (vocabulary-sized — shuffle join, no
    * broadcast assumption, the `txt_tfidf` idiom), per-doc integer
    * rollup (one shuffle). Output: doc_id, n_tokens, surprisal_num,
    * and the single-division mean.
    */
  def surprisal(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df
      .select(id.as("doc_id"), explode(split(text, " ")).as("token"))
      .filter(length(col("token")) > 0)
    val cf = tok.groupBy(col("token")).agg(count(lit(1)).as("cf"))
    // corpus total as a broadcast 1-row frame (NOT a global window
    // over the vocab frame — that would single-partition the
    // vocabulary at scale)
    val n = cf.agg(sum(col("cf")).as("n_corpus"))
    tok.join(cf.crossJoin(broadcast(n)), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(expr("n_corpus div cf")).as("surprisal_num"))
      .withColumn("mean_surprisal",
        col("surprisal_num").cast("double") / col("n_tokens").cast("double"))
  }

  /** Map-only type/token lexical statistics per document: token count,
    * type (distinct-token) count, hapax legomena count, the integer
    * Simpson-diversity numerator Σc·(c−1) (an order-independent,
    * float-free repetition signal: the number of ordered same-token
    * pairs — 0 for all-distinct text, n·(n−1) for one token repeated),
    * and the type/token ratio.
    *
    * Shape (r8): ONE codegen kernel pass per row
    * ([[graft.functions.HashOps.typeTokenVec]], vocabulary-bounded
    * count map) — zero shuffles at any corpus size, O(words) per row.
    * The previous HOF-lambda version was also map-only but Catalyst
    * INTERPRETS lambda bodies per element, costing O(types×tokens)
    * interpreted calls per row (23.7 s at sf1 → ~2 s). Integer counts
    * make every output exact; the single ttr division is IEEE-exact
    * cross-engine.
    */
  def typeToken(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), F.typeTokenVec(text).as("tt"))
      .select(
        col("doc_id"),
        col("tt").getItem(0).as("n_tokens"),
        col("tt").getItem(1).as("n_types"),
        col("tt").getItem(2).as("n_hapax"),
        col("tt").getItem(3).as("simpson_num"),
        (col("tt").getItem(1).cast("double") / col("tt").getItem(0).cast("double"))
          .as("ttr"))

  /** Sliding context-window chunking — the pretraining splitter that
    * turns long documents into overlapping training windows: window
    * `window` tokens, stride `stride` (< window ⇒ overlap carries
    * context across chunk boundaries). Map-only fan-out: window
    * starts are generated per row (`i·stride < n_tokens`), each chunk
    * sliced from the token array — no shuffle, no self-join; the
    * expansion factor is ~window/stride and every chunk carries its
    * index and true length (the tail chunk may be short — the
    * downstream packer or a `n_tokens = window` filter decides its
    * fate, not this op).
    *
    * A zero-token document (empty or whitespace-only text) emits no
    * chunks at all — not one empty chunk.
    */
  def chunkWindows(
      df: DataFrame, id: Column, text: Column,
      window: Int = 64, stride: Int = 48): DataFrame = {
    require(stride >= 1 && window >= stride, "need 1 <= stride <= window")
    val words = filter(split(text, " "), w => length(w) > 0)
    val n = size(words)
    // number of starts: smallest k with k*stride >= n  ⇒ ceil(n/stride);
    // guard n = 0 explicitly — sequence(0, -1) would produce the
    // DESCENDING [0, -1], two spurious rows, not an empty array
    val nChunks = floor((n + (stride - 1)) / lit(stride)).cast("int")
    val starts = when(n > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    df.select(
        id.as("doc_id"), n.cast("long").as("n_tokens"),
        posexplode(transform(
          starts,
          i => slice(words, i * stride + 1, lit(window))))
          .as(Seq("chunk_idx", "_w")))
      .select(
        col("doc_id"), col("n_tokens"), col("chunk_idx"),
        size(col("_w")).cast("long").as("chunk_tokens"),
        array_join(col("_w"), " ").as("chunk_text"))
  }

  /** All-pairs set-cosine similarity over word n-gram sets — the
    * exact-similarity join (Bayardo et al., WWW'07 "Scaling Up All
    * Pairs Similarity Search") where minhash gives only an estimate:
    * every unordered doc pair with cos(A, B) = |A∩B| / √(|A|·|B|) ≥
    * `simNum/simDen` over their DISTINCT word `n`-gram sets, with the
    * EXACT cosine. The two tiers are complementary: LSH trades recall
    * for one pass; this is exact-recall and prunes with the classic
    * prefix filter instead of banding.
    *
    * Threshold arithmetic is EXACT — t = simNum/simDen stays
    * rational, the qualifying predicate is the integer comparison
    * c²·simDen² ≥ simNum²·|A|·|B| (no float threshold, no epsilon),
    * and the emitted cosine is one integer-exact divide-by-√ both
    * engines compute bit-identically.
    *
    * Scale shape, in order:
    *  - exact-duplicate content collapses to class representatives
    *    first ([[Dedup.contentClasses]] — the family pre-pass), so
    *    the quadratic-risk tiers below see DISTINCT content only and
    *    member pairs re-expand at pinned width at the end;
    *  - candidate generation is PREFIX-FILTERED: each doc's grams
    *    sort by the canonical (global df ASC, gram ASC) order and
    *    only the first |A| − ⌈t²·|A|⌉ + 1 index/probe. Soundness: a
    *    qualifying pair has c ≥ t·√(|A|·|B|) ≥ t²·max(|A|,|B|), so
    *    if the canonically-SMALLEST shared gram sat outside either
    *    doc's prefix, ALL shared grams would sit in that doc's
    *    ⌈t²·n⌉−1 suffix — fewer than c. Hence every qualifying pair
    *    shares a gram inside BOTH prefixes and the prefix self-join
    *    finds it. df-ascending order is also the skew guard: the
    *    corpus's hottest grams sort LAST and fall out of every
    *    prefix, so candidate buckets are keyed by rare grams — no
    *    cap needed, nothing dropped, exact recall;
    *  - the size-ratio prune simDen²·min ≥ simNum²·max (implied by
    *    the threshold) cuts cross-size candidates before dedup;
    *  - candidates then verify EXACTLY: one join back to the full
    *    gram lists keyed (doc, gram) counts c map-combined, the
    *    integer predicate decides.
    * Docs with fewer than `n` tokens have no grams and never pair
    * (filtered before the collapse so within-class pairs of gramless
    * texts are not emitted either).
    *
    * Output: (id_a, id_b, cosine), id_a < id_b, member-level.
    */
  def cosinePairs(
      docs: DataFrame, id: Column, text: Column,
      n: Int = 5, simNum: Int = 3, simDen: Int = 5): DataFrame = {
    val s = cosineStages(docs, id, text, n, simNum, simDen)
    Dedup.expandClassPairs(s.repPairs, s.cc, "cosine", lit(1.0))
  }

  /** Collocation / phrase detection over adjacent token bigrams —
    * the word2vec phrase-merging score (Mikolov et al., NIPS'13
    * "Distributed Representations..."): for each adjacent pair (x, y)
    * occurring ≥ `minCount` times, score = (n_xy − δ)·T / (n_x·n_y) —
    * high when x and y co-occur far above independence, the signal a
    * tokenizer/phrase-vocab builder thresholds to merge "new york"
    * into one unit. δ (`discount`) suppresses rare-pair flukes.
    *
    * Exactness: all counts are integers; the score is ONE double
    * divide of two exact integer products (n_xy·T and n_x·n_y stay
    * under 2^53 far past 100 TB token counts), so any engine
    * computes it bit-identically — no log, unlike textbook PMI,
    * which is the same ranking monotonically.
    *
    * Scale shape: bigram generation is MAP-SIDE from each doc's token
    * array (index transform, codegen), counted by one map-combined
    * hash agg; unigram counts are a second map-combined agg whose
    * vocab-sized result MATERIALIZES ONCE (localCheckpoint) — the
    * token total then aggregates over the materialized vocab rows
    * instead of re-running the corpus explode — and joins onto the
    * bigram frame BROADCAST (vocabulary ≪ distinct bigrams at any
    * scale). Output: (x, y, n_xy, n_x, n_y, n_tokens, score).
    */
  def collocations(
      df: DataFrame, text: Column,
      minCount: Long = 20L, discount: Long = 5L): DataFrame = {
    val w = filter(split(trim(text), "\\s+"), t => t =!= lit(""))
    val toks = df.select(w.as("w"))
    val pairs = toks
      .filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => struct(element_at(col("w"), i).as("x"),
          element_at(col("w"), i + 1).as("y")))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val tot = uni.agg(sum(col("n")).as("n_tokens"))
    pairs
      .join(broadcast(uni.select(col("tok").as("x"), col("n").as("n_x"))),
        Seq("x"))
      .join(broadcast(uni.select(col("tok").as("y"), col("n").as("n_y"))),
        Seq("y"))
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        col("n_tokens"),
        (((col("n_xy") - discount) * col("n_tokens")).cast("double") /
          (col("n_x") * col("n_y")).cast("double")).as("score"))
  }

  /** The prefix-filtered all-pairs pipeline's intermediate frames,
    * shared by the cosine and Jaccard instantiations and the
    * [[cosinePairStats]] funnel report. `counted` carries one row
    * per candidate pair with its shared-gram count (a candidate
    * always matches ≥ 1 gram — it CAME from a shared prefix gram),
    * plus the verification predicate as `_ok`.
    */
  private final case class PairStages(
      cc: Dedup.ContentClasses, prefix: DataFrame, counted: DataFrame,
      repPairs: DataFrame)

  /** The shared prefix-filter all-pairs core under [[cosinePairs]]
    * and [[jaccardPairs]]: collapse to distinct content, sort each
    * doc's grams in the canonical (global df ASC, gram ASC) order,
    * index/probe only each doc's first |A| − ⌈ovNum·|A|/ovDen⌉ + 1
    * grams, prune candidates by the measure's size-ratio bound, then
    * verify candidates EXACTLY from the full gram lists with an
    * integer predicate.
    *
    * The instantiations differ only in the minimum-overlap fraction
    * `ovNum/ovDen` (a qualifying pair must share ≥ ⌈ov·|A|⌉ grams
    * with EITHER side: t² for cosine — c ≥ t·√(na·nb) ≥ t²·max — and
    * t for Jaccard — c ≥ t/(1+t)·(na+nb) ≥ t·max, using min ≥ t·max),
    * the size prune, the verify predicate, and the emitted similarity.
    * Prefix soundness is measure-independent given the overlap bound:
    * the canonically SMALLEST shared gram must sit inside both
    * prefixes — if it fell outside doc A's, every shared gram would
    * sit in A's ⌈ov·na⌉−1 suffix, fewer than the overlap the
    * threshold forces — so the equi-join on prefix grams finds every
    * qualifying pair on the same gram. df-ascending order is also
    * the skew guard: the corpus's hottest grams sort LAST and fall
    * out of every prefix, so candidate buckets are keyed by rare
    * grams — no cap, nothing dropped, exact recall.
    */
  private def pairStages(
      docs: DataFrame, id: Column, text: Column, n: Int,
      ovNum: Long, ovDen: Long,
      sizeOk: (Column, Column) => Column,
      verified: (Column, Column, Column) => Column,
      sim: (Column, Column, Column) => Column): PairStages = {
    import org.apache.spark.sql.expressions.Window
    // r17 collapse shape (operator-metric-measured at sf10): the
    // pre-r17 form filtered gramless docs on RAW rows (a full
    // wordNgrams build per input row, inside the serial scan stage)
    // and fed Dedup.contentClasses, whose class/membership consumers
    // prune different columns — the canonical subtrees differ, AQE
    // exchange reuse misses, and the collapse (plus that raw-row
    // filter) executed TWICE at ~11 s each. Now: (1) the gramless
    // filter runs per DISTINCT CONTENT on the collapsed classes —
    // same class set (the predicate is a pure function of the text;
    // a duplicated gramless text is excluded from classes AND, via
    // the join below, from membership — exactly the old semantics);
    // (2) the class frame localCheckpoints, so the collapse runs
    // ONCE however many subtrees consume it (guide §3.3 — the
    // materialization is the same magnitude as the reuse shuffle
    // files it replaces).
    // r18: delegates to the shared collapse with its class-level
    // filter/checkpoint hook (r17 advice — this was a verbatim inline
    // copy of Dedup.contentClasses that would have drifted)
    val cc = Dedup.contentClasses(docs, id, text,
      classFilter = Some(size(F.wordNgrams(col("_t"), n)) > 0),
      checkpoint = true)
    // nsz (the doc's distinct-gram count) is just the size of the
    // gram array — computed MAP-SIDE at explode time (r17; it was a
    // second count-window over the rep partition, a whole extra
    // WindowExec pass over the full gram stream for a value the
    // projection already knows)
    val toks = cc.classes
      .select(col("rep"), F.wordNgrams(col("_t"), n).as("_g"))
      .select(col("rep"), size(col("_g")).cast("long").as("nsz"),
        explode(col("_g")).as("tok"))
    // r17 (guide §2.3 — shuffle keys, not payloads): every leg whose
    // gram is only an EQUALITY key (the df count, the candidate
    // self-join, both verify joins) keys on the 8-byte xxhash64 of
    // the gram instead of the ~n-word string — the two full-corpus
    // verify shuffles and the vocabulary frame shrink ~4-5× and every
    // join/agg compares longs. The gram STRING survives exactly where
    // its VALUE matters: the canonical (df ASC, tok ASC) prefix order
    // (hash order would reorder ties — prefix contents, and so
    // n_candidates in txt_cosine_stats, must not move). Results are
    // identical modulo 2^-64 xxhash64 collisions — the repo-wide
    // contentClasses convention, already accepted on this kernel's
    // collapse pre-pass. Scale bound, stated (r18, the r17 advice):
    // expected collisions ≈ k²/2⁶⁵ over k distinct grams — ~1 at
    // k ≈ 10¹⁰ (the 100 TB-corpus envelope), each perturbing one df
    // or intersection count by 1. Deployments beyond that bound (or
    // needing exactness on these legs) should widen the key to two
    // independent-seed xxhash64 halves; the prefix window below keeps
    // exact STRINGS regardless, so n_candidates never moves.
    val toksH = toks.select(col("rep"), xxhash64(col("tok")).as("_th"))
    val dfreq = toksH.groupBy(col("_th")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("rep"))
      .orderBy(col("df").asc, col("tok").asc)
    // r18: the prefix frame is projected to its 3 downstream columns
    // and localCheckpointed. Measured at sf10 BEFORE: the candidate
    // self-join's two legs canonicalize differently, so the whole
    // window subtree (18 MB exchange + 102 MB sort + WindowExec + the
    // df join above it) executed TWICE per action — and a third time
    // in cosinePairStats' funnel. Now the window runs once and every
    // consumer re-reads a 24 B/row frame; the materialization is the
    // prefix key set (≤ the gram stream, strings already dropped) —
    // smaller than the class checkpoint above it carries text for.
    val prefix = toks.withColumn("_th", xxhash64(col("tok")))
      .join(dfreq, "_th")
      .withColumn("pos", row_number().over(wDoc).cast("long"))
      .filter(expr(s"pos <= nsz - (nsz * $ovNum + ${ovDen - 1}) div $ovDen + 1"))
      .select(col("_th"), col("rep"), col("nsz"))
      .localCheckpoint()
    val cand = prefix.select(col("_th"), col("rep").as("id_a"), col("nsz").as("na"))
      .join(prefix.select(col("_th"), col("rep").as("id_b"), col("nsz").as("nb")),
        Seq("_th"))
      .filter(col("id_a") < col("id_b"))
      .filter(sizeOk(col("na"), col("nb")))
      // (na, nb) are functions of the ids — carrying them through the
      // dedup and the count keys saves two size joins later. The
      // multi-gram-catch dedup rides a pinned id_a repartition (r17):
      // hash(id_a) satisfies the 4-column dedup clustering, the
      // dropDuplicates aggregates partition-locally, and the verify
      // join below is keyed id_a so it reuses the layout — one
      // Exchange instead of two, and the verify fan-out stays spread
      // at pinned width (the AQE byte-coalescing guard, §5 lesson).
      .select(col("id_a"), col("id_b"), col("na"), col("nb"))
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("id_a"))
      .dropDuplicates(Seq("id_a", "id_b", "na", "nb"))
    val counted = cand
      .join(toksH.select(col("rep").as("id_a"), col("_th")), Seq("id_a"))
      .join(toksH.select(col("rep").as("id_b"), col("_th")), Seq("id_b", "_th"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("_ok", verified(col("c"), col("na"), col("nb")))
    val repPairs = counted
      .filter(col("_ok"))
      .select(col("id_a"), col("id_b"), sim(col("c"), col("na"), col("nb")))
    PairStages(cc, prefix, counted, repPairs)
  }

  private def cosineStages(
      docs: DataFrame, id: Column, text: Column,
      n: Int, simNum: Int, simDen: Int): PairStages = {
    require(simNum > 0 && simNum <= simDen, "threshold must be in (0, 1]")
    val num2 = simNum.toLong * simNum
    val den2 = simDen.toLong * simDen
    pairStages(docs, id, text, n, ovNum = num2, ovDen = den2,
      sizeOk = (na, nb) =>
        lit(num2) * greatest(na, nb) <= lit(den2) * least(na, nb),
      verified = (c, na, nb) => c * c * den2 >= lit(num2) * na * nb,
      sim = (c, na, nb) =>
        (c.cast("double") / sqrt((na * nb).cast("double"))).as("cosine"))
  }

  /** All-pairs set-JACCARD similarity over word n-gram sets — the
    * exact-recall sibling of [[cosinePairs]] for the measure
    * [[graft.llm.Dedup.ngramJaccard]] only estimates candidates for:
    * every unordered doc pair with J(A, B) = |A∩B| / |A∪B| ≥
    * `simNum/simDen` over their DISTINCT word `n`-gram sets, with the
    * EXACT Jaccard. `dd_ngram_jaccard`'s recall is bounded by its
    * MinHash-LSH candidate pass; this pass prunes with the classic
    * prefix filter instead of banding and misses nothing.
    *
    * Threshold arithmetic is EXACT — t = simNum/simDen stays
    * rational. A qualifying pair has c = |A∩B| ≥ t·(na+nb−c), i.e.
    * c·(simNum+simDen) ≥ simNum·(na+nb) — the integer verify
    * predicate — and min/max ≥ J ≥ t gives the size prune
    * simNum·max ≤ simDen·min and the per-doc overlap bound
    * c ≥ t/(1+t)·(na+nb) ≥ t/(1+t)·(1+t)·max = t·max that drives the
    * prefix length |A| − ⌈t·|A|⌉ + 1 (see [[pairStages]]). The
    * emitted jaccard is one integer-exact divide both engines
    * compute bit-identically.
    *
    * Output: (id_a, id_b, jaccard), id_a < id_b, member-level
    * (verified rep pairs re-expand through content classes at pinned
    * width; within-class pairs are Jaccard exactly 1).
    */
  def jaccardPairs(
      docs: DataFrame, id: Column, text: Column,
      n: Int = 5, simNum: Int = 1, simDen: Int = 3): DataFrame = {
    require(simNum > 0 && simNum <= simDen, "threshold must be in (0, 1]")
    val p = simNum.toLong
    val q = simDen.toLong
    val s = pairStages(docs, id, text, n, ovNum = p, ovDen = q,
      sizeOk = (na, nb) => lit(p) * greatest(na, nb) <= lit(q) * least(na, nb),
      verified = (c, na, nb) => c * (p + q) >= lit(p) * (na + nb),
      sim = (c, na, nb) =>
        (c.cast("double") / (na + nb - c).cast("double")).as("jaccard"))
    Dedup.expandClassPairs(s.repPairs, s.cc, "jaccard", lit(1.0))
  }

  /** The [[cosinePairs]] FUNNEL, one row: distinct-content classes
    * entering the kernel, prefix rows the filter indexes, candidate
    * pairs the prefix self-join emits, and verified rep pairs. The
    * no-silent-caps idiom for the one operator in the family with NO
    * cap (exact recall): the prefix length and candidate volume are
    * corpus-statistics-dependent (df distribution), so a
    * degenerate-corpus blowup must be visible from an artifact —
    * n_candidates IS the quadratic-risk number to watch at scale
    * (r11 verdict item 4). All counts are exact integers a SQL
    * oracle replays.
    *
    * TWO subtrees, not four (a crossJoin of four independent
    * aggregations re-executed the shared collapse/prefix pipeline
    * once per count — 39 Exchanges at sf0.01): every class keeps
    * ≥ 1 prefix row (the prefix bound is ≥ 1), so n_classes is
    * countDistinct(rep) OVER the prefix frame; and every candidate
    * pair matches ≥ 1 shared gram, so n_candidates/n_verified are
    * one count/count-if over the verified-flagged count frame.
    */
  def cosinePairStats(
      docs: DataFrame, id: Column, text: Column,
      n: Int = 5, simNum: Int = 3, simDen: Int = 5): DataFrame = {
    val s = cosineStages(docs, id, text, n, simNum, simDen)
    s.prefix
      .agg(countDistinct(col("rep")).as("n_classes"),
        count(lit(1)).as("n_prefix_rows"))
      .crossJoin(s.counted.agg(
        count(lit(1)).as("n_candidates"),
        coalesce(sum(when(col("_ok"), 1L).otherwise(0L)), lit(0L))
          .as("n_verified")))
  }
}
