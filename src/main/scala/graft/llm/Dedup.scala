package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Document deduplication for training-data pipelines (SURVEY.md §2
  * L): exact, MinHash+LSH, SimHash, and character-n-gram Jaccard.
  * All near-dup variants avoid the O(n²) cross join: candidates come
  * from band/bucket self-joins keyed by locality-sensitive hashes —
  * one shuffle per side keyed by (band, bucket), which is the scale
  * path at 100 TB (pairs generated only inside buckets).
  */
object Dedup {

  /** Exact dedup by full-content hash: one hash-aggregation (map-side
    * partial), keeping the minimal id as the canonical copy.
    */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(md5(text).as("h"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n"))

  /** MinHash + banded LSH near-dup pairs.
    *
    * shingle→minhash→band→bucket-join: `perms`-wide signatures over
    * `shingle`-byte shingles ([[graft.functions.MinHashSig]], codegen),
    * split into `bands` bands; docs sharing any band bucket become
    * candidates; the Jaccard estimate is the fraction of matching
    * signature positions. Pairs with estimate ≥ `minJaccard` survive.
    *
    * Buckets larger than `maxBucket` are dropped — degenerate buckets
    * (boilerplate, empty docs) would otherwise produce quadratic
    * pairs; this is the standard guard at scale.
    */
  def minhashLsh(
      df: DataFrame,
      id: Column,
      text: Column,
      shingle: Int = 5,
      perms: Int = 64,
      bands: Int = 16,
      minJaccard: Double = 0.5,
      maxBucket: Int = 64): DataFrame = {
    require(perms % bands == 0, "perms must divide into bands")
    val rows = perms / bands
    val sigs = df.select(id.as("doc_id"), F.minhashSig(text, shingle, perms).as("sig"))
    // (doc_id, band_idx, band_hash, sig) — band hash = Murmur3 of the
    // signature slice plus the band index
    val banded = sigs
      .select(
        col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", hash(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))
    // cap degenerate buckets
    val capped = banded
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val l = capped.select(
      col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = capped.select(
      col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v
        ).cast("double") / perms).as("jaccard_est"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard_est")).as("jaccard_est"))
      .filter(col("jaccard_est") >= minJaccard)
  }

  /** SimHash near-dup pairs: 64-bit signatures, banded into 16-bit
    * pieces (any shared piece → candidate; Hamming ≤ `maxHamming`
    * verified exactly via bit_count(xor)). Guarantees recall for
    * Hamming ≤ 3 with 4 pieces (pigeonhole).
    */
  def simhashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      maxHamming: Int = 3,
      maxBucket: Int = 256): DataFrame = {
    val sigs = df.select(id.as("doc_id"), F.simhash64(text).as("sig"))
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(3))).as("piece"))
      .withColumn("pval", expr("shiftrightunsigned(sig, piece * 16)").bitwiseAND(lit(0xffffL)))
    val capped = banded
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("piece"), col("pval"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    val l = capped.select(col("piece"), col("pval"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = capped.select(col("piece"), col("pval"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("piece", "pval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Character n-gram Jaccard similarity for candidate pairs blocked
    * by a cheap key (length bucket) — exact set Jaccard via
    * array_intersect/array_union on distinct n-gram arrays.
    */
  def ngramJaccard(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int = 3,
      minJaccard: Double = 0.5,
      lengthBucket: Int = 32): DataFrame = {
    val gramsDf = df.select(
      id.as("doc_id"),
      (length(text).cast("long") / lengthBucket).cast("long").as("lb"),
      array_distinct(
        transform(
          sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
          i => text.substr(i, lit(n))))
        .as("grams"))
    // near-dups can differ in length across a bucket edge: the left
    // side probes its own and both neighboring buckets
    val l = gramsDf.select(
      explode(array(col("lb") - 1, col("lb"), col("lb") + 1)).as("lb"),
      col("doc_id").as("id_a"), col("grams").as("g_a"))
    val r = gramsDf.select(col("lb"), col("doc_id").as("id_b"), col("grams").as("g_b"))
    l.join(r, Seq("lb"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b")))).as("jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
