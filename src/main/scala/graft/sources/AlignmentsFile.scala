package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Normalize

/** File-based alignments ingestion — the reference's extract step
  * (`weekly alignments GQL API.py:255-273`: `pd.read_excel` of the
  * weekly sheet; 935: `pd.read_csv` of the corporate-managers CSV)
  * as a Spark CSV read plus the reference's exact cleaning: dropna
  * on the key columns, float unit → int → string
  * (`astype(int).astype(str)`, ref 262-263), zip split on `-`
  * (ref 330-332), e-mail `strip().lower()` (ref 756, 801).
  *
  * The schema is declared, not inferred — inference is an extra full
  * pass over the file and type-unstable across SFs; a declared
  * schema keeps the scan single-pass and the plan deterministic.
  * All cleaning is codegen projections over the scan: one pass, no
  * shuffle, column-pruned when callers select less.
  *
  * A `.xlsx` path routes through [[Xlsx.readSheet]] (JDK
  * ZipFile + StAX — the reference's ACTUAL weekly input is an Excel
  * workbook read by sheet name, ref:255) and lands in the SAME
  * declared schema, so the whole cleaning pipeline is
  * format-agnostic past the first projection.
  */
object AlignmentsFile {

  /** The reference's weekly sheet name (ref:255 `sheet_name="Sorted
    * by Store #"`).
    */
  val DefaultSheet = "Sorted by Store #"

  /** The weekly-alignments sheet columns (reference's
    * `REGION / SUPERVISOR, District, Location, Unit` plus the
    * manager/zip columns it cleans).
    */
  val schema: StructType = StructType(Seq(
    StructField("region", StringType),
    StructField("district", StringType),
    StructField("location_name", StringType),
    StructField("unit", DoubleType),
    StructField("manager_email", StringType),
    StructField("zip_raw", StringType)))

  /** Raw read into the declared schema: header CSV, or — when the
    * path ends `.xlsx` — the named workbook sheet (header row =
    * column names, values cast to the declared types; a missing
    * header column surfaces as the usual AnalysisException rather
    * than silent nulls).
    */
  def read(
      spark: SparkSession, path: String,
      sheetName: String = DefaultSheet): DataFrame =
    if (path.toLowerCase.endsWith(".xlsx")) {
      val raw = Xlsx.readSheet(spark, path, sheetName)
      raw.select(schema.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    } else
      spark.read
        .option("header", "true")
        .schema(schema)
        .csv(path)

  /** Read + the reference's cleaning (ref 258-263, 330-332, 756):
    * rows missing any key column drop; unit floors to an integer
    * string; zip keeps the prefix before `-`; e-mails normalize.
    */
  def readCleaned(
      spark: SparkSession, path: String,
      sheetName: String = DefaultSheet): DataFrame =
    read(spark, path, sheetName)
      .na.drop(Seq("region", "district", "unit", "location_name"))
      .select(
        col("region"),
        col("district"),
        Normalize.floorLong(col("unit")).cast("string").as("unit"),
        col("location_name"),
        Normalize.prefixBefore(col("zip_raw"), "-").as("zip"),
        Normalize.normEmail(col("manager_email")).as("email"))
}
