package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.ops.Collect

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 A). Embedding-cosine near-dup lives here too (it is
  * ANN with the corpus as its own query set).
  *
  * Scale: brute-force broadcasts the (small) query set against the
  * corpus — the corpus never shuffles and the dot product is a
  * codegen'd [[graft.functions.CosineSim]]. The LSH variant buckets
  * both sides by sign-random-projection bits — the corpus shuffles
  * once on the bucket key; recall is tunable via `planes` (fewer bits
  * → bigger buckets → higher recall, more compute).
  */
object Ann {

  /** Sign-random-projection bucket id from `planes` deterministic
    * pseudo-random hyperplanes. Plane coefficients are derived from
    * Murmur3 of (element index, plane) — no stored model, identical
    * on any cluster.
    */
  def srpBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val dot = aggregate(
        zip_with(
          vec,
          transform(vec, (_, i) =>
            (pmod(hash(i * 1000003 + j), lit(2000)).cast("double") / 1000.0) - 1.0),
          (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, 1L << j).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Exact top-k cosine neighbors per query vector (baseline). */
  def bruteTopK(
      corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("vec_id"), corpusVec.as("c_vec"))
    val q = queries.select(queryId.as("q_id"), queryVec.as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSim(col("q_vec"), col("c_vec")).as("cos"))
    Collect
      .topKPerKey(scored, col("q_id"), k, col("cos").desc, col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("cos"), col("rnk"))
  }

  /** LSH-bucketed ANN: candidates share the SRP bucket; top-k within.
    * The 100 TB path — corpus shuffles once on (bucket), queries are
    * broadcast per bucket.
    */
  def lshTopK(
      corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, planes: Int = 8): DataFrame = {
    val c = corpus.select(corpusId.as("vec_id"), corpusVec.as("c_vec"),
      srpBucket(corpusVec, planes).as("bucket"))
    val q = queries.select(queryId.as("q_id"), queryVec.as("q_vec"),
      srpBucket(queryVec, planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSim(col("q_vec"), col("c_vec")).as("cos"))
    Collect
      .topKPerKey(scored, col("q_id"), k, col("cos").desc, col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("cos"), col("rnk"))
  }

  /** Embedding-cosine near-duplicate pairs: SRP-bucketed self-join,
    * exact cosine ≥ `minCos` verification inside buckets.
    */
  def cosineNearDupPairs(
      df: DataFrame, id: Column, vec: Column,
      minCos: Double = 0.95, planes: Int = 8): DataFrame = {
    val b = df.select(id.as("vec_id"), vec.as("v"), srpBucket(vec, planes).as("bucket"))
    val l = b.select(col("bucket"), col("vec_id").as("id_a"), col("v").as("v_a"))
    val r = b.select(col("bucket"), col("vec_id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), F.cosineSim(col("v_a"), col("v_b")).as("cos"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cos")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
