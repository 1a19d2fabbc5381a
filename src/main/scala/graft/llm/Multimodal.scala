package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 M): media as opaque
  * `binary` payloads plus typed metadata, routed by modality.
  *
  * The actual codec step is STUBBED — this container has no image/
  * audio libraries — with a deterministic fake "decode" so the
  * Spark-side plumbing (schema, partition-preserving mapPartitions
  * batch shape, modality routing) is real and testable. A production
  * deployment replaces [[fakeDecode]] with a JNI/FFI codec; nothing
  * else changes.
  */
object Multimodal {

  /** A decoded-media feature row: the schema a real decoder would
    * emit (dimensions for images, sample counts for audio, frames for
    * video).
    */
  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Perceptual-hash near-duplicate pairs over binary payloads — the
    * image/audio twin of SimHash text dedup. The pHash itself is
    * STUBBED deterministically (splitmix64 of the payload's FNV-1a —
    * a production pipeline swaps in a DCT/radial pHash, same 64-bit
    * shape, nothing else changes); everything downstream is the real
    * scale machinery: [[Dedup.hammingPairs]]' 4×16-bit banding, one
    * shuffle, pigeonhole-exact recall for Hamming ≤ 3.
    */
  def phashDedupPairs(
      df: DataFrame, id: Column, payload: Column,
      maxHamming: Int = 3): DataFrame = {
    import graft.functions.F
    Dedup.hammingPairs(
      df.select(id.as("doc_id"),
        F.splitmix64(F.fnvBinary(payload)).as("sig")),
      maxHamming)
  }

  /** Attach an opaque binary payload + modality metadata to a
    * documents frame. Payload here is the UTF-8 encoding of the text
    * (deterministic stand-in for real media bytes).
    */
  def attachPayload(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      text.cast("binary").as("payload"),
      when(id % 3 === 0, "image")
        .when(id % 3 === 1, "audio")
        .otherwise("video").as("modality"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))

  /** Resize plan for decoded media: cap the longest edge at `maxDim`
    * preserving aspect ratio (integer arithmetic — the real resample
    * happens in the stubbed codec; this computes the target geometry
    * every image pipeline needs). Pure projection, zero shuffles.
    */
  def resizePlan(features: DataFrame, maxDim: Int = 256): DataFrame = {
    // floor() on both engines — a bare double→int cast truncates in
    // Spark but ROUNDS in DuckDB, which would break oracle parity
    def scaled(a: Column, b: Column): Column =
      greatest(lit(1), floor((a * least(b, lit(maxDim))) / b).cast("int"))
    features.select(
      col("doc_id"), col("modality"), col("width"), col("height"),
      when(col("width") >= col("height"), least(col("width"), lit(maxDim)))
        .otherwise(scaled(col("width"), col("height"))).as("out_w"),
      when(col("height") > col("width"), least(col("height"), lit(maxDim)))
        .otherwise(scaled(col("height"), col("width"))).as("out_h"))
  }

  /** Frame-sampling plan for video rows: at most `maxFrames` evenly
    * strided frames — emits the sampled frame indices (the real frame
    * extraction is codec work; the plan is what the pipeline
    * schedules). Images/audio pass through with frame 0. Stride is
    * ceil(n/maxFrames) so the sample count never exceeds `maxFrames`.
    */
  def frameSamplePlan(features: DataFrame, maxFrames: Int = 8): DataFrame = {
    // (n + maxFrames - 1) / maxFrames in exact integer math; the
    // double-division + int cast truncates (positive) = floor
    val stride = greatest(lit(1),
      ((col("n_frames") + (maxFrames - 1)) / maxFrames).cast("int"))
    features.select(
      col("doc_id"), col("modality"), col("n_frames"),
      when(col("modality") === "video",
        sequence(lit(0), col("n_frames") - 1, stride))
        .otherwise(array(lit(0))).as("frame_idx"))
      .withColumn("n_sampled", size(col("frame_idx")).cast("long"))
  }

  /** Reason-coded curation filter on decoded media features — the
    * keep/drop pass every web-scale image pipeline runs after decode
    * (size floor, aspect-ratio band, payload floor). FIRST-match
    * reason in a stable order, so per-reason rejection counts are
    * additive and reproducible; the aspect test is integer
    * (maxAspect·min(w,h) ≥ max(w,h)) — no float ratio to round.
    * Pure projection: map-only, composes with the decode batch at
    * full scan parallelism.
    */
  def curationFilter(
      features: DataFrame, minDim: Int = 64, maxAspect: Int = 3,
      minBytes: Long = 64L): DataFrame =
    features.select(
      col("doc_id"), col("modality"), col("width"), col("height"),
      col("n_bytes"),
      when(col("width") < minDim || col("height") < minDim, "too_small")
        .when(least(col("width"), col("height")) * maxAspect <
          greatest(col("width"), col("height")), "bad_aspect")
        .when(col("n_bytes") < minBytes, "tiny_payload")
        .otherwise("keep").as("verdict"))

  /** STUB decode: deterministic fake dimensions derived from FNV of
    * the payload. Replaces a real codec; keeps the per-partition
    * batch shape (iterator-in/iterator-out, no per-row JVM↔native
    * crossings in the real version either).
    */
  def fakeDecode(spark: SparkSession, withPayload: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("modality"), col("n_bytes"), col("payload"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, modality, nBytes, payload) =>
          val h = graft.functions.HashOps.fnv1a64(payload, 0, payload.length)
          // deterministic fake dims — a real codec reads the header
          val w = (math.abs(h % 1024) + 1).toInt
          val ht = (math.abs((h >>> 16) % 1024) + 1).toInt
          val frames = if (modality == "video") (math.abs((h >>> 32) % 300) + 1).toInt else 1
          MediaFeatures(docId, modality, nBytes, w, ht, frames)
        }
      }
  }
}
