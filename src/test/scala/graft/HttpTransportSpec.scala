package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.sources.graphql._

/** The real HTTP transport (HttpPageFetcher / HttpMutationSender over
  * java.net.http) driven against local in-process servers: page flow
  * end-to-end, the retry taxonomy (5xx retries, 4xx and GraphQL
  * errors fail fast), and the mutation sink posting through sockets.
  */
class HttpTransportSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val json = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One-off server whose behavior is the test's closure; returns
    * (url, stop). The fixture façade (FixtureHttpServer) covers the
    * happy path — these servers inject faults.
    */
  private def scriptedServer(
      script: (String, HttpExchange) => (Int, String)): (String, () => Unit) = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext(
      "/",
      (ex: HttpExchange) =>
        try {
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val (code, resp) = script(body, ex)
          val bytes = resp.getBytes(UTF_8)
          ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
          if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        } finally ex.close())
    s.start()
    (s"http://127.0.0.1:${s.getAddress.getPort}", () => s.stop(0))
  }

  test("paginated read flows through real HTTP sockets end-to-end") {
    val (name, schema) =
      GraphQLFixtures.registerTableApi(spark, sfDir, "region", "regions", pageSize = 2)
    val http = FixtureHttpServer.fetcherFor(name, queryType = Some("regions"))
    PageFetchers.register("http-regions", new RetryingFetcher(http))

    val pages = GraphQL.readPages(spark, "http-regions")
    // 5 regions at pageSize 2 → 3 page partitions, each fetched by an
    // executor thread over its own POST
    assert(pages.count() == 3)
    val out = GraphQL.flattenResponse(pages, "regions", schema)
      .select(col("node_r_regionkey").cast("long"), col("node_r_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = spark.read.parquet(s"$sfDir/region.parquet")
      .select(col("r_regionkey").cast("long"), col("r_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == expected)
  }

  test("5xx responses retry with backoff, then succeed (RetryingFetcher contract)") {
    val hits = new AtomicInteger(0)
    val page =
      """{"data": {"things": {"pageInfo": {"hasNextPage": false, "endCursor": null}, "edges": []}}}"""
    val (url, stop) = scriptedServer { (_, _) =>
      if (hits.incrementAndGet() <= 2) (503, "unavailable") else (200, page)
    }
    try {
      val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val f = new RetryingFetcher(
        HttpPageFetcher(url, "query { things { pageInfo { hasNextPage } } }"),
        maxRetries = 3, baseDelayMs = 10, sleeper = slept += _)
      val p = f.fetch(None)
      assert(p.json == page && p.endCursor.isEmpty)
      assert(hits.get() == 3, "two 503s then the 200")
      assert(slept.toSeq == Seq(10L, 20L), "exponential backoff")
    } finally stop()
  }

  test("persistent 5xx exhausts retries as IOException") {
    val hits = new AtomicInteger(0)
    val (url, stop) = scriptedServer { (_, _) =>
      hits.incrementAndGet(); (500, "down")
    }
    try {
      val f = new RetryingFetcher(
        HttpPageFetcher(url, "q"), maxRetries = 2, baseDelayMs = 1, sleeper = _ => ())
      intercept[java.io.IOException](f.fetch(None))
      assert(hits.get() == 3, "initial + 2 retries")
    } finally stop()
  }

  test("4xx and GraphQL error payloads fail fast — no retry") {
    val hits = new AtomicInteger(0)
    val (url, stop) = scriptedServer { (_, _) =>
      hits.incrementAndGet(); (400, "bad query")
    }
    try {
      val f = new RetryingFetcher(HttpPageFetcher(url, "q"), maxRetries = 3)
      intercept[IllegalArgumentException](f.fetch(None))
      assert(hits.get() == 1, "4xx must not be retried")
    } finally stop()

    val hits2 = new AtomicInteger(0)
    val (url2, stop2) = scriptedServer { (_, _) =>
      hits2.incrementAndGet()
      (200, """{"errors": [{"message": "boom"}], "data": null}""")
    }
    try {
      val f2 = new RetryingFetcher(HttpPageFetcher(url2, "q"), maxRetries = 3)
      intercept[IllegalStateException](f2.fetch(None))
      assert(hits2.get() == 1, "GraphQL errors must not be retried")
    } finally stop2()
  }

  test("cursor variables ride the POST body; pageInfo drives the walk") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val (url, stop) = scriptedServer { (body, _) =>
      val after = json.readTree(body).path("variables").path("after")
      val cur = if (after.isTextual) after.asText else "<none>"
      seen.synchronized(seen += cur)
      cur match {
        case "<none>" =>
          (200, """{"data": {"c": {"pageInfo": {"hasNextPage": true, "endCursor": "A"}, "edges": []}}}""")
        case "A" =>
          (200, """{"data": {"c": {"pageInfo": {"hasNextPage": true, "endCursor": "B"}, "edges": []}}}""")
        case _ =>
          (200, """{"data": {"c": {"pageInfo": {"hasNextPage": false, "endCursor": "B"}, "edges": []}}}""")
      }
    }
    try {
      val cursors = PagedGraphQL.fetchAllCursors(HttpPageFetcher(url, "q"))
      assert(cursors == Seq(None, Some("A"), Some("B")))
      assert(seen.toSeq == Seq("<none>", "A", "B"))
    } finally stop()
  }

  test("mutation sink posts batches through real HTTP") {
    import spark.implicits._
    val capture = new CapturingSender
    MutationSenders.register("http-capture-target", capture)
    MutationSenders.register(
      "http-out", new RetryingSender(FixtureHttpServer.senderFor("http-capture-target")))

    val df = Seq(("East", "alice@corp.com"), ("West", "bob@corp.com"))
      .toDF("group_name", "email").coalesce(1)
    df.write
      .format("graft.sources.graphql.GraphQLSinkProvider")
      .option("sender", "http-out")
      .option("mutation", "assignPermissions")
      .option("batchSize", "10")
      .mode("append").save()

    val got = capture.captured
    assert(got.size == 1)
    assert(got.head.startsWith("mutation { assignPermissions(input: ["))
    assert(got.head.contains("\"email\": \"alice@corp.com\"") &&
      got.head.contains("\"email\": \"bob@corp.com\""))
  }

  test("sink 5xx retries via RetryingSender; mutation error payload does not") {
    val hits = new AtomicInteger(0)
    val (url, stop) = scriptedServer { (_, _) =>
      if (hits.incrementAndGet() <= 1) (502, "bad gateway")
      else (200, """{"data": {"ok": true}}""")
    }
    try {
      val s = new RetryingSender(
        HttpMutationSender(url), maxRetries = 2, baseDelayMs = 1, sleeper = _ => ())
      s.send("mutation { x }")
      assert(hits.get() == 2)
    } finally stop()

    val (url2, stop2) = scriptedServer { (_, _) =>
      (200, """{"errors": [{"message": "denied"}]}""")
    }
    try intercept[IllegalStateException] {
      new RetryingSender(HttpMutationSender(url2)).send("mutation { x }")
    } finally stop2()
  }

  test("auth bootstrap fails FAST on 401 — wrong token never reaches the fixture, no retry") {
    val calls = new AtomicInteger(0)
    val name = "authGate#ids"
    PageFetchers.register(name, new PageFetcher {
      override def fetch(after: Option[String]): Page = {
        calls.incrementAndGet()
        Page("""{"data": {"accounts": {"pageInfo": {"hasNextPage": false, "endCursor": "0"}, "edges": []}}}""", None)
      }
    })
    FixtureHttpServer.requireAuth(name, "Authorization", "Bearer good-token")
    try {
      val bad = new RetryingFetcher(
        FixtureHttpServer.fetcherFor(
          name, queryType = Some("accounts"),
          extraHeaders = Map("Authorization" -> "Bearer WRONG")),
        sleeper = _ => ())
      val e = intercept[IllegalArgumentException] {
        Session.accountIds(bad, "accounts", "account_id")
      }
      assert(e.getMessage.contains("401"))
      assert(calls.get() == 0, "401 must be answered before the fixture runs")
      // missing header entirely: same fail-fast class
      intercept[IllegalArgumentException] {
        Session.accountIds(
          new RetryingFetcher(FixtureHttpServer.fetcherFor(
            name, queryType = Some("accounts")), sleeper = _ => ()),
          "accounts", "account_id")
      }
      assert(calls.get() == 0)
    } finally FixtureHttpServer.clearAuth(name)
  }

  test("accountIds throws on a missing id field instead of yielding empty-string ids") {
    val f = new PageFetcher {
      override def fetch(after: Option[String]): Page = Page(
        """{"data": {"accounts": {"pageInfo": {"hasNextPage": false, "endCursor": "0"},
          | "edges": [{"node": {"name": "acme"}}]}}}""".stripMargin, None)
    }
    val e = intercept[IllegalArgumentException] {
      Session.accountIds(f, "accounts", "account_id")
    }
    assert(e.getMessage.contains("account_id"))
    assert(e.getMessage.contains("acme"), "error must carry the offending edge")
  }

  test("authenticated bootstrap composes: token → account ids → per-account paged scans") {
    import spark.implicits._
    val token = "Bearer tok-" + java.util.UUID.randomUUID()
    val auth = Map("Authorization" -> token)
    val (idsName, ids, acctName, nSchema) =
      GraphQLFixtures.registerAuthApi(spark, sf, stem = "authSpec")
    (idsName +: ids.map(acctName))
      .foreach(FixtureHttpServer.requireAuth(_, "Authorization", token))
    try {
      val df = Session.readAllAccounts(
        spark,
        new RetryingFetcher(FixtureHttpServer.fetcherFor(
          idsName, queryType = Some("accounts"), extraHeaders = auth)),
        "accounts", "account_id",
        id => new RetryingFetcher(FixtureHttpServer.fetcherFor(
          acctName(id), queryType = Some("nations"), extraHeaders = auth)),
        "nations", nSchema)
      val got = df.select(
          col("account_id").cast("long"),
          col("node_n_nationkey").cast("long"))
        .as[(Long, Long)].collect().toSet
      val want = spark.read.parquet(s"$sf/nation.parquet")
        .select(col("n_regionkey").cast("long"), col("n_nationkey").cast("long"))
        .as[(Long, Long)].collect().toSet
      assert(got == want)
      assert(ids.size == 5) // one account per region at this SF
    } finally (idsName +: ids.map(acctName)).foreach(FixtureHttpServer.clearAuth)
  }
}
