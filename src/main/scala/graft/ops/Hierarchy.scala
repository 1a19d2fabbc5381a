package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy-group construction: the reference builds a two-level
  * Region→District tree by order-preserving dedup of top names and
  * (region, district) pairs (reference `weekly alignments GQL
  * API.py:276-322`), and level definitions 137-176.
  *
  * Spark-first: the per-level group lists are two distinct
  * aggregations — each a single shuffle on the group key with
  * map-side partial dedup — unioned into one frame. No driver-side
  * row loop, no order dependence (identity is the name, not the file
  * order).
  */
object Hierarchy {

  /** Build the (group_name, level_name, parent_name) frame from a
    * denormalized alignments-style frame with a top-level column and
    * a child column.
    */
  def buildGroups(
      alignments: DataFrame,
      topCol: String,
      childCol: String,
      topLevel: String,
      childLevel: String): DataFrame = {
    val tops = alignments
      .select(col(topCol).as("group_name"))
      .distinct()
      .withColumn("level_name", lit(topLevel))
      .withColumn("parent_name", lit(null).cast("string"))
    val children = alignments
      .select(col(childCol).as("group_name"), col(topCol).as("parent_name"))
      .distinct()
      .withColumn("level_name", lit(childLevel))
    tops.select("group_name", "level_name", "parent_name")
      .unionByName(children.select("group_name", "level_name", "parent_name"))
  }
}
