package graft.sources.graphql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** High-level read path for the GraphQL source plus the
  * json_normalize-equivalent flattener (reference
  * `pd.json_normalize(nodes_list, sep="_")`, `weekly alignments GQL
  * API.py:218`).
  */
object GraphQL {

  /** Read all pages of a registered fetcher as (page_idx, json). */
  def readPages(spark: SparkSession, fetcherName: String): DataFrame =
    spark.read
      .format("graft.sources.graphql.GraphQLTableProvider")
      .option("fetcher", fetcherName)
      .load()

  /** Parse pages of the standard `data.<type>.edges[].{cursor,node}`
    * envelope with an explicit node schema, explode edges, and
    * flatten nested structs with `_` separators — one row per node,
    * computed entirely on executors.
    */
  def flattenResponse(
      pages: DataFrame,
      queryType: String,
      nodeSchema: StructType): DataFrame = {
    val envelope = new StructType().add(
      "data", new StructType().add(
        queryType, new StructType()
          .add("pageInfo", new StructType()
            .add("hasNextPage", "boolean").add("endCursor", "string"))
          .add("edges", org.apache.spark.sql.types.ArrayType(
            new StructType().add("cursor", "string").add("node", nodeSchema)))))
    val edges = pages
      .select(from_json(col("json"), envelope).as("r"))
      .select(explode(col(s"r.data.$queryType.edges")).as("edge"))
      .select(col("edge.cursor").as("cursor"), col("edge.node").as("node"))
    flattenStructs(edges)
  }

  /** Recursively flatten struct columns into `parent_sep_child`
    * top-level columns (pandas `json_normalize(sep=...)` twin). Pure
    * projection — zero shuffles, fully codegen'd.
    */
  def flattenStructs(df: DataFrame, sep: String = "_"): DataFrame = {
    def expand(schema: StructType, prefix: String): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val name = if (prefix.isEmpty) f.name else prefix.replace(".", sep) + sep + f.name
        f.dataType match {
          case s: StructType => expand(s, path)
          case _ => Seq(col(path).as(name))
        }
      }
    df.select(expand(df.schema, ""): _*)
  }
}
