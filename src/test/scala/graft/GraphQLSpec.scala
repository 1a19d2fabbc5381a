package graft

import org.apache.spark.sql.functions._
import graft.sources.graphql._

class GraphQLSpec extends SparkSpec {
  import spark.implicits._

  test("driver cursor walk visits every page exactly once") {
    val f = GraphQLFixtures.FixturePageFetcher(Vector("p0", "p1", "p2"))
    assert(PagedGraphQL.fetchAllPages(f) == Seq("p0", "p1", "p2"))
  }

  test("DSv2 source plans one partition per page") {
    val (name, _) =
      GraphQLFixtures.registerTableApi(spark, sf, "customer", "customers", pageSize = 40)
    val pages = GraphQL.readPages(spark, name)
    // 150 customers / 40 per page = 4 pages → 4 rows, 4 partitions
    assert(pages.count() == 4)
    assert(pages.rdd.getNumPartitions == 4)
  }

  test("paginated read + flatten round-trips the source table exactly") {
    val (name, schema) =
      GraphQLFixtures.registerTableApi(spark, sf, "customer", "customers")
    val got = GraphQL
      .flattenResponse(GraphQL.readPages(spark, name), "customers", schema)
      .select(
        $"node_c_custkey".as("c_custkey"), $"node_c_name".as("c_name"),
        $"node_c_nationkey".as("c_nationkey"), $"node_c_acctbal".as("c_acctbal"),
        $"node_c_mktsegment".as("c_mktsegment"))
    val want = spark.read.parquet(s"$sf/customer.parquet")
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0)
    assert(want.except(got).count() == 0)
  }

  test("flattenStructs mirrors json_normalize(sep='_') on nested structs") {
    val df = Seq((1, ("a", (2.5, "z")))).toDF("id", "node")
      .select($"id", $"node._1".as("name"),
        struct($"node._1".as("x"), struct(lit(1).as("deep")).as("inner")).as("s"))
    val flat = GraphQL.flattenStructs(df)
    assert(flat.columns.toSeq == Seq("id", "name", "s_x", "s_inner_deep"))
  }

  test("escaped strings survive the JSON round trip") {
    val pages = Vector(
      """{"data": {"things": {"pageInfo": {"hasNextPage": false, "endCursor": "0"}, "edges": [{"cursor": "c", "node": {"v": "a\"b\\c\nd"}}]}}}""")
    PageFetchers.register("esc", GraphQLFixtures.FixturePageFetcher(pages))
    val schema = new org.apache.spark.sql.types.StructType().add("v", "string")
    val got = GraphQL.flattenResponse(GraphQL.readPages(spark, "esc"), "things", schema)
      .select($"node_v").as[String].head()
    assert(got == "a\"b\\c\nd")
  }

  test("mutation sink batches rows into list-input mutations") {
    val sender = new CapturingSender
    MutationSenders.register("cap", sender)
    val df = spark.read.parquet(s"$sf/region.parquet")
      .select(col("r_regionkey"), col("r_name"))
    df.coalesce(1).write
      .format("graft.sources.graphql.GraphQLSinkProvider")
      .option("sender", "cap")
      .option("mutation", "createRegions")
      .option("batchSize", "2")
      .mode("append").save()
    val sent = sender.captured
    // 5 regions at batchSize 2 from one partition → 3 mutations
    assert(sent.size == 3)
    assert(sent.forall(_.startsWith("mutation { createRegions(input: [")))
    // every region name appears exactly once across the batches
    val names = spark.read.parquet(s"$sf/region.parquet")
      .select("r_name").as[String].collect()
    names.foreach { n =>
      assert(sent.count(_.contains("\"r_name\": \"" + n + "\"")) == 1)
    }
  }

  test("RetryingFetcher retries transient IO failures with backoff, then succeeds") {
    import graft.sources.graphql.{Page, PageFetcher, PagedGraphQL, RetryingFetcher}
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new PageFetcher {
      override def fetch(after: Option[String]): Page = {
        calls += 1
        if (calls <= 2) throw new java.io.IOException("connection reset")
        Page(s"""{"page":${calls}}""", None)
      }
    }
    val pages = PagedGraphQL.fetchAllPages(
      new RetryingFetcher(flaky, maxRetries = 3, baseDelayMs = 100, sleeper = delays += _))
    assert(pages == Seq("""{"page":3}"""))
    assert(delays.toSeq == Seq(100L, 200L)) // exponential schedule
  }

  test("RetryingFetcher gives up after maxRetries and rethrows") {
    import graft.sources.graphql.{Page, PageFetcher, RetryingFetcher}
    var calls = 0
    val dead = new PageFetcher {
      override def fetch(after: Option[String]): Page = {
        calls += 1; throw new java.io.IOException("down")
      }
    }
    val f = new RetryingFetcher(dead, maxRetries = 2, sleeper = _ => ())
    intercept[java.io.IOException] { f.fetch(None) }
    assert(calls == 3) // 1 try + 2 retries
  }

  test("RetryingFetcher does NOT retry semantic errors") {
    import graft.sources.graphql.{Page, PageFetcher, RetryingFetcher}
    var calls = 0
    val broken = new PageFetcher {
      override def fetch(after: Option[String]): Page = {
        calls += 1; throw new IllegalArgumentException("GraphQL error: unknown field")
      }
    }
    val f = new RetryingFetcher(broken, sleeper = _ => ())
    intercept[IllegalArgumentException] { f.fetch(None) }
    assert(calls == 1)
  }

  test("planner holds cursors, not bodies: partitions carry no page payload") {
    // structural guarantee that planInputPartitions cannot buffer
    // bodies: the partition type has no body field to put them in
    val fields = classOf[PagePartition].getDeclaredFields.map(_.getName).toSet
    assert(!fields.contains("json"), s"PagePartition holds a body field: $fields")
    assert(fields.contains("after") && fields.contains("fetcher"))
    // and the planning walk yields after-cursors in page order
    val f = GraphQLFixtures.FixturePageFetcher(Vector("p0", "p1", "p2"))
    assert(PagedGraphQL.fetchAllCursors(f) == Seq(None, Some("0"), Some("1")))
  }

  test("many-page read: one planning fetch + one executor fetch per page, exact content") {
    // 25 pages: the driver walk touches each page once for its
    // cursor, each executor task once for its body
    val counts = GraphQLSpecFixtures.counts
    counts.clear()
    val nPages = 25
    val bodies = (0 until nPages).map { i =>
      s"""{"data": {"things": {"pageInfo": {"hasNextPage": ${i < nPages - 1}, "endCursor": "$i"}, "edges": [{"cursor": "c$i", "node": {"v": "row$i"}}]}}}"""
    }.toVector
    PageFetchers.register(
      "counting",
      GraphQLSpecFixtures.CountingFetcher(GraphQLFixtures.FixturePageFetcher(bodies)))
    val schema = new org.apache.spark.sql.types.StructType().add("v", "string")
    val got = GraphQL
      .flattenResponse(GraphQL.readPages(spark, "counting"), "things", schema)
      .select($"node_v").as[String].collect().sorted
    assert(got.toSeq == (0 until nPages).map(i => s"row$i").sorted)
    // one action ⇒ exactly 2 fetches per page (cursor walk + body read)
    import scala.jdk.CollectionConverters._
    assert(counts.asScala.values.forall(_ == 2),
      s"unexpected fetch counts: ${counts.asScala.toMap}")
    assert(counts.size == nPages)
  }

  test("nested children connection: inline + per-node continuation pages round-trip") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val name = GraphQLFixtures.registerNestedApi(
      spark, sf, pageSize = 2, inlineChildren = 3, childPageSize = 2)
    val parentSchema = new StructType()
      .add("parent_id", LongType).add("parent_name", StringType)
    val childSchema = new StructType()
      .add("child_id", LongType).add("child_name", StringType)
    val got = GraphQL.flattenNestedResponse(
        spark, GraphQL.readPages(spark, name),
        "hierarchyGroups", parentSchema, "children", childSchema,
        key => s"$name#children#$key", "parent_id")
      .select($"parent_id", $"children_child_id".as("child_id"))
      .as[(Long, Long)].collect().toSet
    val want = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_regionkey".cast("long"), $"n_nationkey".cast("long"))
      .as[(Long, Long)].collect().toSet
    // every region has 5 nations but only 3 inline edges: equality
    // proves the continuation pages (2 children × per-node fetcher)
    // arrived, not just the inline ones
    assert(got == want)
    assert(got.groupBy(_._1).forall(_._2.size == 5))
  }

  test("nested continuations plan as ONE scan + one join — O(1) in key count") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    // inlineChildren = 1 → EVERY region carries continuation pages (5
    // keys at this SF). The per-key formulation this replaces planned
    // one filter+scan+crossJoin subtree per key — 6 scans, 5 joins —
    // so plan size grew linearly with the continuation count.
    val name = GraphQLFixtures.registerNestedApi(
      spark, sf, queryType = "hgPlanShape", pageSize = 2,
      inlineChildren = 1, childPageSize = 2)
    val parentSchema = new StructType()
      .add("parent_id", LongType).add("parent_name", StringType)
    val childSchema = new StructType()
      .add("child_id", LongType).add("child_name", StringType)
    val df = GraphQL.flattenNestedResponse(
      spark, GraphQL.readPages(spark, name),
      "hgPlanShape", parentSchema, "children", childSchema,
      key => s"$name#children#$key", "parent_id")

    val plan = df.queryExecution.optimizedPlan
    val scans = plan.collect { case s: DataSourceV2ScanRelation => s.relation.table.name() }
    assert(scans.count(_.startsWith("graphql_continuations")) == 1,
      s"want ONE continuation scan, got: $scans")
    assert(scans.length == 3, // outer scan appears twice (inline + parent side of the join) + 1 continuation scan
      s"scan count must not grow with continuation keys: $scans")
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.length == 1, s"want ONE join back to parents, got ${joins.length}")

    // and the data still round-trips: all 25 (region, nation) pairs,
    // 4/5 of which only exist on continuation pages here
    val got = df.select($"parent_id", $"children_child_id".as("child_id"))
      .as[(Long, Long)].collect().toSet
    val want = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_regionkey".cast("long"), $"n_nationkey".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("continuation broadcast carries ONLY the continuing parents") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    // hand-built API: 6 parents on 2 pages, exactly 2 of which
    // (ids 2 and 4) carry extra child pages. The r6 formulation
    // broadcast all 6; the fix must broadcast exactly 2.
    val name = "broadcastShape#nested"
    def conn(edges: Seq[String], hasNext: Boolean): String =
      s"""{"pageInfo": {"hasNextPage": $hasNext, "endCursor": "c"}, "edges": ${edges.mkString("[", ", ", "]")}}"""
    def childEdge(id: Long): String =
      s"""{"cursor": "k$id", "node": {"child_id": $id, "child_name": "ch$id"}}"""
    def parent(id: Long, more: Boolean): String = {
      if (more) {
        PageFetchers.register(
          s"$name#children#$id",
          GraphQLFixtures.FixturePageFetcher(Vector(
            s"""{"data": {"children": ${conn(Seq(childEdge(id * 10 + 1), childEdge(id * 10 + 2)), hasNext = false)}}}""")))
      }
      s"""{"cursor": "p$id", "node": {"parent_id": $id, "parent_name": "par$id", "children": ${conn(Seq(childEdge(id * 10)), more)}}}"""
    }
    val pages = Vector(
      s"""{"data": {"hgBcast": {"pageInfo": {"hasNextPage": true, "endCursor": "0"}, "edges": [${Seq(parent(0, false), parent(1, false), parent(2, true)).mkString(", ")}]}}}""",
      s"""{"data": {"hgBcast": {"pageInfo": {"hasNextPage": false, "endCursor": "1"}, "edges": [${Seq(parent(3, false), parent(4, true), parent(5, false)).mkString(", ")}]}}}""")
    PageFetchers.register(name, GraphQLFixtures.FixturePageFetcher(pages))
    val parentSchema = new StructType()
      .add("parent_id", LongType).add("parent_name", StringType)
    val childSchema = new StructType()
      .add("child_id", LongType).add("child_name", StringType)
    val df = GraphQL.flattenNestedResponse(
      spark, GraphQL.readPages(spark, name),
      "hgBcast", parentSchema, "children", childSchema,
      key => s"$name#children#$key", "parent_id")
    // collect df ITSELF (a .select would be a fresh QueryExecution
    // whose metrics are separate from df.queryExecution's)
    val rows = df.collect()
    val got = rows.map(r =>
      (r.getAs[Long]("parent_id"), r.getAs[Long]("children_child_id"))).toSet
    // 6 inline edges + 2 continuation pages × 2 children
    val want = Set(0L -> 0L, 1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L,
      5L -> 50L, 2L -> 21L, 2L -> 22L, 4L -> 41L, 4L -> 42L)
    assert(got == want)
    // walk the executed (adaptive) plan and read the broadcast's
    // actual output-row metric: exactly the 2 continuing parents
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    // the traversal sees both the executed exchange (inside its
    // query stage) and AQE's unexecuted template copy (metric 0) —
    // the max over instances is what actually crossed the wire
    val bx = allNodes(df.queryExecution.executedPlan)
      .collect { case b: BroadcastExchangeExec => b.metrics("numOutputRows").value }
    assert(bx.nonEmpty, "no broadcast exchange found in the executed plan")
    assert(bx.max == 2,
      s"broadcast must carry exactly the 2 continuing parents, got rows=$bx")
  }

  test("continuation keys register in bounded batches; round-trip stays exact") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    // inlineChildren = 1 → all 5 regions continue; keyBatchSize = 2 →
    // ceil(5/2) = 3 continuation groups, each ≤ 2 keys
    val name = GraphQLFixtures.registerNestedApi(
      spark, sf, queryType = "hgBatch", pageSize = 2,
      inlineChildren = 1, childPageSize = 2)
    val parentSchema = new StructType()
      .add("parent_id", LongType).add("parent_name", StringType)
    val childSchema = new StructType()
      .add("child_id", LongType).add("child_name", StringType)
    val before = ContinuationGroups.registeredCount
    val df = GraphQL.flattenNestedResponse(
      spark, GraphQL.readPages(spark, name),
      "hgBatch", parentSchema, "children", childSchema,
      key => s"$name#children#$key", "parent_id", keyBatchSize = 2)
    assert(ContinuationGroups.registeredCount - before == 3,
      "5 continuing keys at batch 2 must register 3 groups")
    val got = df.select($"parent_id", $"children_child_id".as("child_id"))
      .as[(Long, Long)].collect().toSet
    val want = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_regionkey".cast("long"), $"n_nationkey".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("continuation groups are CONSUMED on first plan; re-execution replays the plan cache") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val name = GraphQLFixtures.registerNestedApi(
      spark, sf, queryType = "hgConsume", pageSize = 2,
      inlineChildren = 1, childPageSize = 2)
    val parentSchema = new StructType()
      .add("parent_id", LongType).add("parent_name", StringType)
    val childSchema = new StructType()
      .add("child_id", LongType).add("child_name", StringType)
    val before = ContinuationGroups.registeredCount
    val df = GraphQL.flattenNestedResponse(
      spark, GraphQL.readPages(spark, name),
      "hgConsume", parentSchema, "children", childSchema,
      key => s"$name#children#$key", "parent_id", keyBatchSize = 2)
    assert(ContinuationGroups.registeredCount - before == 3)
    val n1 = df.count()
    // first materialization planned every continuation scan → the
    // registry entries are consumed; the LRU there is now a backstop
    assert(ContinuationGroups.registeredCount == before,
      "groups must leave the registry once their scan plans")
    // a SECOND action builds fresh Scan instances (Spark re-plans per
    // action) — must replay from the plan cache, not the registry
    val n2 = df.count()
    assert(n1 == n2 && n1 > 0)
  }

  test("ContinuationGroups registry is bounded: oldest group evicts past MaxGroups") {
    val stamp = java.util.UUID.randomUUID().toString
    ContinuationGroups.register(s"evict-probe@$stamp", Seq("k" -> "f"))
    (0 until ContinuationGroups.MaxGroups).foreach { i =>
      ContinuationGroups.register(s"filler-$i@$stamp", Seq("k" -> "f"))
    }
    val e = intercept[NoSuchElementException] {
      ContinuationGroups(s"evict-probe@$stamp")
    }
    assert(e.getMessage.contains("evicted"),
      "an evicted group must be diagnosed as evicted, not merely unregistered")
    // newest still resolvable; registry size stays at the cap
    assert(ContinuationGroups(
      s"filler-${ContinuationGroups.MaxGroups - 1}@$stamp") == Seq("k" -> "f"))
    assert(ContinuationGroups.registeredCount <= ContinuationGroups.MaxGroups)
    // r10 (r9 advice): RE-registering an evicted name clears its
    // tombstone — the fresh entry must resolve, not throw the
    // evicted error whose remedy (rebuild) is what the caller just did
    ContinuationGroups.register(s"evict-probe@$stamp", Seq("k2" -> "f2"))
    assert(ContinuationGroups(s"evict-probe@$stamp") == Seq("k2" -> "f2"),
      "a re-registered name must be live again after eviction")
  }

  test("mutation sink fans out across partitions") {
    val sender = new CapturingSender
    MutationSenders.register("cap2", sender)
    spark.range(100).select(col("id"), concat(lit("u"), col("id")).as("name"))
      .repartition(8)
      .write.format("graft.sources.graphql.GraphQLSinkProvider")
      .option("sender", "cap2")
      .option("mutation", "createUsers")
      .option("batchSize", "16")
      .mode("append").save()
    val sent = sender.captured
    assert(sent.nonEmpty)
    // all 100 ids arrive exactly once, any batch/partition order
    val ids = sent.flatMap("\\\"id\\\": (\\d+)".r.findAllMatchIn(_).map(_.group(1).toLong))
    assert(ids.sorted == (0L until 100L).toList)
  }
}

/** Static home for the counting fetcher: the fetcher instance is
  * serialized into each PagePartition (even in local mode), so
  * per-fetch state must live in a JVM-static object the deserialized
  * copy re-references — an instance field would be a silent copy.
  */
object GraphQLSpecFixtures {
  val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  final case class CountingFetcher(inner: GraphQLFixtures.FixturePageFetcher)
      extends PageFetcher {
    override def fetch(after: Option[String]): Page = {
      counts.merge(after.getOrElse("<first>"), 1,
        (a: Integer, b: Integer) => Integer.valueOf(a + b))
      inner.fetch(after)
    }
  }
}
