package graft.sources.graphql

import scala.jdk.CollectionConverters._

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

  /** Parse pages whose nodes carry a NESTED child connection — the
    * reference's `QUERY_HIERARCHY_GROUPS` shape (`weekly alignments
    * GQL API.py:1027-1042`: each hierarchy-group node embeds a
    * `children { pageInfo, edges }` connection) — and return one row
    * per (parent, child) edge with `sep="_"` flattened columns.
    *
    * Pagination happens at BOTH levels: the outer connection is the
    * standard partition-per-page scan, and any node whose inline
    * `children.pageInfo.hasNextPage` is true gets its remaining child
    * pages fetched through a per-node continuation fetcher
    * (`childFetcherName(nodeKey)` — the reference would re-query the
    * API with that node's child cursor). Only the continuation KEYS
    * cross the driver (control-plane-sized, the same cursor-walk
    * currency as the outer scan); they become one
    * [[ContinuationGroups]] entry read by a SINGLE
    * [[GraphQLContinuationProvider]] scan whose partitions carry
    * `(parentKey, cursor, fetcher)`. One broadcast join restores
    * parent context, so the PLAN is O(1) in the number of
    * continuation keys — ten thousand parents with extra child pages
    * add partitions, never plan nodes. All page BODIES stay on
    * executors.
    *
    * Driver-boundedness: the continuation keys stream off the query
    * via `toLocalIterator` in `keyBatchSize` groups (one
    * [[ContinuationGroups]] entry + one scan per batch, unioned), so
    * the transient planning allocation on top of the compact
    * registry entries is O(batch), never an all-keys Row array — a
    * pathological parent fan-out cannot balloon the driver. The
    * broadcast that restores parent context carries ONLY the
    * continuing parents (`children.pageInfo.hasNextPage` filter: the
    * continuing subset is derivable from the page data itself, no
    * driver-side key list enters the plan), so broadcast bytes scale
    * with the parents that actually continue, not the full outer
    * extract.
    */
  def flattenNestedResponse(
      spark: SparkSession,
      pages: DataFrame,
      queryType: String,
      nodeSchema: StructType,
      childField: String,
      childSchema: StructType,
      childFetcherName: String => String,
      nodeKey: String,
      keyBatchSize: Int = 100000): DataFrame = {
    val childConn = connectionSchema(childSchema)
    val envelope = new StructType().add(
      "data", new StructType().add(
        queryType, new StructType()
          .add("pageInfo", new StructType()
            .add("hasNextPage", "boolean").add("endCursor", "string"))
          .add("edges", org.apache.spark.sql.types.ArrayType(
            new StructType().add("cursor", "string")
              .add("node", nodeSchema.add(childField, childConn))))))
    val nodes = pages
      .select(from_json(col("json"), envelope).as("r"))
      .select(explode(col(s"r.data.$queryType.edges")).as("edge"))
      .select(col("edge.node.*"))
    // inline child edges: one row per (parent, child)
    val inline = nodes.select(
      (nodeSchema.fieldNames.map(col) :+
        explode(col(s"$childField.edges.node")).as("__child")): _*)
    // nodes with MORE child pages → continuation scans over every
    // (parentKey, cursor) partition; only keys cross the driver, in
    // bounded batches (toLocalIterator streams a partition at a time;
    // grouped() holds at most keyBatchSize strings beyond the
    // registry entries themselves)
    val continuing = nodes.filter(col(s"$childField.pageInfo.hasNextPage"))
    val groupStem = s"$queryType/$childField#cont@${java.util.UUID.randomUUID()}"
    val groups = continuing
      .select(col(nodeKey).cast("string"))
      .toLocalIterator().asScala.map(_.getString(0))
      .grouped(keyBatchSize)
      .zipWithIndex
      .map { case (keys, i) =>
        val group = s"$groupStem/$i"
        ContinuationGroups.register(
          group, keys.map(k => k -> childFetcherName(k)))
        group
      }
      .toList
    val all =
      if (groups.isEmpty) inline
      else {
        val childEnvelope = new StructType().add(
          "data", new StructType().add(childField, childConn))
        val extra = groups.map { group =>
          spark.read
            .format("graft.sources.graphql.GraphQLContinuationProvider")
            .option("group", group)
            .load()
        }.reduce(_ unionByName _)
          .select(col("key").as("__ckey"),
            from_json(col("json"), childEnvelope).as("r"))
          .select(col("__ckey"),
            explode(col(s"r.data.$childField.edges.node")).as("__child"))
        // parent context for the join: ONLY the continuing parents —
        // the hasNextPage filter reproduces exactly the key set the
        // continuation scan serves, so the broadcast never carries a
        // non-continuing row no matter how large the outer extract is
        val parents = continuing.select(
          (nodeSchema.fieldNames.map(col) :+
            col(nodeKey).cast("string").as("__pkey")): _*)
        val continued = extra
          .join(broadcast(parents), col("__ckey") === col("__pkey"))
          .drop("__ckey", "__pkey")
        inline.unionByName(continued)
      }
    flattenStructs(all.withColumnRenamed("__child", childField))
  }

  /** Standard `pageInfo + edges[]{cursor, node}` connection schema. */
  def connectionSchema(nodeSchema: StructType): StructType =
    new StructType()
      .add("pageInfo", new StructType()
        .add("hasNextPage", "boolean").add("endCursor", "string"))
      .add("edges", org.apache.spark.sql.types.ArrayType(
        new StructType().add("cursor", "string").add("node", nodeSchema)))

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
