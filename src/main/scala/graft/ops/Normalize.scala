package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cleaning / normalization primitives mirroring the reference's
  * pandas string munging (reference `weekly alignments GQL API.py`:
  * zip split 330-332, email normalization 756+801, name split
  * 616-622, int→str unit casts 262-263), expressed as codegen'd
  * Catalyst column functions — no UDFs, so they inline into
  * WholeStageCodegen and stay pushdown-friendly.
  */
object Normalize {

  /** Email-style key normalization: `str.strip().str.lower()`. */
  def normEmail(c: Column): Column = lower(trim(c))

  /** Zip-code cleanup: `"12345-6789" → "12345"` (prefix before the
    * first `sep`); identity when `sep` is absent.
    */
  def prefixBefore(c: Column, sep: String): Column =
    substring_index(c, sep, 1)

  /** The reference's `get_name_and_lastname`: take the part after the
    * last `/` when present, else drop the leading word.
    */
  def nameTail(c: Column): Column =
    when(c.contains("/"), regexp_extract(c, "([^/]*)$", 1))
      .otherwise(regexp_replace(c, "^\\S+\\s*", ""))

  /** pandas `astype(int).astype(str)` on a float column: truncation
    * via floor (DuckDB CAST rounds, Spark CAST truncates — floor is
    * identical in both, keeping oracle parity).
    */
  def floorLong(c: Column): Column = floor(c).cast("long")

  /** NaN/null → "" on a string column (reference `.replace(np.nan,
    * "")`).
    */
  def blankNull(c: Column): Column = coalesce(c, lit(""))
}
