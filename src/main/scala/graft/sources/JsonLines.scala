package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines ingestion with IN-BAND corrupt-record quarantine.
  *
  * At pipeline scale a single malformed line must neither kill the
  * whole job (FAILFAST) nor silently vanish (DROPMALFORMED);
  * PERMISSIVE mode with a corrupt-record column keeps every input
  * line accounted for — valid rows parse to the declared schema,
  * malformed lines survive verbatim in `raw` with `valid = false`,
  * so the quarantine is auditable and replayable after a fix.
  *
  * The schema is declared, not inferred (inference is an extra full
  * pass and type-unstable); the read is one pass, no shuffle, and
  * column-pruned when callers select less. Quarantine semantics are
  * engine-replicable for structurally malformed lines (the DuckDB
  * oracle classifies with `json_valid`); the fixture keeps
  * wrong-typed-but-well-formed values out of scope because Spark's
  * partial-results behavior for those is version-dependent.
  */
object JsonLines {

  /** Read `path` as JSONL against `fields`, appending `raw` (the
    * verbatim malformed line, null for good rows) and `valid`.
    */
  def readWithQuarantine(
      spark: SparkSession, path: String, fields: StructType): DataFrame = {
    val sch = StructType(fields.fields :+
      StructField("_corrupt_record", StringType))
    spark.read
      .schema(sch)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("raw", col("_corrupt_record"))
      .withColumn("valid", col("_corrupt_record").isNull)
      .drop("_corrupt_record")
  }
}
