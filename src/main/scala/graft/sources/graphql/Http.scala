package graft.sources.graphql

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper

/** Real HTTP transport behind [[PageFetcher]]/[[MutationSender]] —
  * the reference's `httpx` client layer (`establish_connections`,
  * `weekly alignments GQL API.py:93-135`; `fetch_data_from_graphql_
  * api`, ref 178-221; `httpx.ReadTimeout` handling, ref 241)
  * re-expressed over `java.net.http.HttpClient` (JDK-standard, zero
  * extra dependencies; JSON parsing via the Jackson shipped in
  * Spark's own runtime).
  *
  * Error taxonomy mirrors [[RetryingFetcher]]'s contract: transport
  * faults and 5xx statuses surface as `java.io.IOException`
  * (retryable — the server may recover), while 4xx statuses and
  * GraphQL `errors` payloads throw non-IO exceptions (a semantic
  * error re-sent verbatim just hammers the API — the reference
  * raises immediately there too).
  */
object Http {
  private[graphql] val mapper = new ObjectMapper()

  private[graphql] def quote(s: String): String =
    "\"" + GraphQLFixtures.jsonEscape(s) + "\""

  /** Standard GraphQL POST body with the continuation cursor bound to
    * an `$after` variable (ref 1002-1026: every paginated query in
    * the reference takes `$after: String`).
    */
  private[graphql] def graphqlBody(query: String, after: Option[String]): String = {
    val vars = after.map(a => s"""{"after": ${quote(a)}}""").getOrElse("{}")
    s"""{"query": ${quote(query)}, "variables": $vars}"""
  }

  /** Raise on a GraphQL `errors` payload, then read `(hasNextPage,
    * endCursor)` from `data.<queryType>.pageInfo` — or the FIRST
    * field of `data` when `queryType` is not given (single-connection
    * responses, the reference's shape). Responses without a
    * `pageInfo` read as single-page.
    */
  private[graphql] def pageInfoOf(
      json: String, queryType: Option[String]): (Boolean, Option[String]) = {
    val root = mapper.readTree(json)
    val errs = root.path("errors")
    if (errs.isArray && errs.size() > 0)
      throw new IllegalStateException(
        "GraphQL error payload: " + errs.toString.take(300))
    val data = root.path("data")
    val conn = queryType match {
      case Some(t) => data.path(t)
      case None if data.isObject && data.size() > 0 => data.elements().next()
      case None => data
    }
    val pi = conn.path("pageInfo")
    val hasNext = pi.path("hasNextPage").asBoolean(false)
    val cursorNode = pi.path("endCursor")
    val cursor = if (cursorNode.isTextual) Some(cursorNode.asText) else None
    (hasNext, cursor)
  }

  /** Shared REQUEST plumbing for fetcher and sender. Returns the 2xx
    * body; throws the taxonomy above otherwise.
    */
  private[graphql] def post(
      client: HttpClient,
      url: String,
      headers: Map[String, String],
      body: String,
      requestTimeoutMs: Long): String = {
    val b = HttpRequest
      .newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = b.POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build()
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw new java.io.IOException("interrupted during HTTP send", e)
      }
    val code = resp.statusCode()
    if (code >= 500)
      throw new java.io.IOException(s"POST $url -> HTTP $code (transient)")
    if (code >= 300)
      throw new IllegalArgumentException(
        s"POST $url -> HTTP $code: ${resp.body().take(300)}")
    resp.body()
  }

  private[graphql] def newClient(connectTimeoutMs: Long): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(connectTimeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  /** JVM-level client pool keyed by connect timeout (the only
    * client-level knob here; URLs bind per-request). Fetcher/sender
    * instances ride inside serialized InputPartitions, so a
    * per-instance lazy client would mint one client PER TASK — this
    * static pool is what actually delivers one connection pool per
    * executor JVM regardless of how many page partitions it reads.
    */
  private val clients = TrieMap.empty[Long, HttpClient]
  private[graphql] def clientFor(connectTimeoutMs: Long): HttpClient =
    clients.getOrElseUpdate(connectTimeoutMs, newClient(connectTimeoutMs))
}

/** [[PageFetcher]] over a live GraphQL endpoint. Serializable by
  * construction — only strings and maps ship to executors; the
  * non-serializable `HttpClient` comes from the JVM-static
  * [[Http.clientFor]] pool, so each executor keeps ONE client
  * (connection pool) per timeout config regardless of how many page
  * partitions — i.e. deserialized fetcher copies — it reads.
  *
  * Statelessness contract: `fetch(after)` posts the same query with
  * the same cursor every time, so re-fetches (planning walk +
  * executor read, task retries) are safe against any cursor-stable
  * API — the same property the reference's while-loop re-entry
  * relies on.
  */
final case class HttpPageFetcher(
    url: String,
    query: String,
    headers: Map[String, String] = Map.empty,
    queryType: Option[String] = None,
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 60000L)
    extends PageFetcher {

  override def fetch(after: Option[String]): Page = {
    val json = Http.post(
      Http.clientFor(connectTimeoutMs), url, headers,
      Http.graphqlBody(query, after), requestTimeoutMs)
    val (hasNext, cursor) = Http.pageInfoOf(json, queryType)
    if (hasNext && cursor.isEmpty)
      throw new IllegalStateException(
        s"GraphQL page from $url has hasNextPage=true but no textual endCursor")
    Page(json, if (hasNext) cursor else None)
  }
}

/** [[MutationSender]] over a live GraphQL endpoint — the reference's
  * `gql_api.post(mutation)` load calls. Same pooled client-per-JVM
  * and error-taxonomy shape as [[HttpPageFetcher]]; a response
  * carrying a GraphQL `errors` array fails the task (at-least-once
  * sink retries re-send the batch, which the reference's idempotent
  * create/assign mutations absorb).
  */
final case class HttpMutationSender(
    url: String,
    headers: Map[String, String] = Map.empty,
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 60000L)
    extends MutationSender {

  override def send(mutation: String): Unit = {
    val body = s"""{"query": ${Http.quote(mutation)}}"""
    val json = Http.post(
      Http.clientFor(connectTimeoutMs), url, headers, body, requestTimeoutMs)
    if (json.nonEmpty) {
      val errs = Http.mapper.readTree(json).path("errors")
      if (errs.isArray && errs.size() > 0)
        throw new IllegalStateException(
          "GraphQL mutation error: " + errs.toString.take(300))
    }
  }
}

/** Bounded-retry wrapper for the sink side, mirroring
  * [[RetryingFetcher]]: IOExceptions (transport faults, 5xx) back off
  * exponentially up to `maxRetries`; semantic errors propagate
  * immediately.
  */
final class RetryingSender(
    inner: MutationSender,
    maxRetries: Int = 3,
    baseDelayMs: Long = 100,
    sleeper: Long => Unit = Thread.sleep)
    extends MutationSender {
  override def send(mutation: String): Unit = {
    var attempt = 0
    while (true) {
      try { inner.send(mutation); return }
      catch {
        case e: java.io.IOException =>
          if (attempt >= maxRetries) throw e
          sleeper(baseDelayMs << attempt)
          attempt += 1
      }
    }
  }
}

/** Loopback HTTP façade over the in-memory fixture registries — the
  * "remote GraphQL API" for this zero-egress container. POSTs to
  * `/graphql` route to the [[PageFetchers]] entry named by the
  * `X-Graft-Fetcher` header (the body's `variables.after` is the
  * cursor); POSTs to `/mutate` deliver the body's `query` document to
  * the [[MutationSenders]] entry named by `X-Graft-Sender`. This
  * makes the PRODUCTION transport ([[HttpPageFetcher]] /
  * [[HttpMutationSender]], real sockets, real status codes) the thing
  * under test, with fixtures only behind the server boundary.
  */
object FixtureHttpServer {
  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

  private var server: HttpServer = _

  /** Per-fetcher auth requirements: requests naming this fetcher must
    * carry `header: value` or the server answers 401 (the 4xx
    * fail-fast class — the reference's token-authenticated API
    * behaves the same on a bad/expired token). Keyed per fetcher so
    * authenticated and open fixtures coexist on the one server.
    */
  private val authRequired = TrieMap.empty[String, (String, String)]
  def requireAuth(fetcherName: String, header: String, value: String): Unit =
    authRequired.put(fetcherName, header -> value)
  def clearAuth(fetcherName: String): Unit = { authRequired.remove(fetcherName); () }
  private def authOk(ex: HttpExchange, name: String): Boolean =
    authRequired.get(name).forall { case (h, v) =>
      ex.getRequestHeaders.getFirst(h) == v
    }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  private val handler: HttpHandler = (ex: HttpExchange) =>
    try {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      ex.getRequestURI.getPath match {
        case "/graphql" =>
          val name = ex.getRequestHeaders.getFirst("X-Graft-Fetcher")
          if (!authOk(ex, name))
            respond(ex, 401, """{"errors": [{"message": "unauthorized"}]}""")
          else {
            val afterNode = Http.mapper.readTree(body).path("variables").path("after")
            val after = if (afterNode.isTextual) Some(afterNode.asText) else None
            respond(ex, 200, PageFetchers(name).fetch(after).json)
          }
        case "/mutate" =>
          val name = ex.getRequestHeaders.getFirst("X-Graft-Sender")
          val q = Http.mapper.readTree(body).path("query").asText
          MutationSenders(name).send(q)
          respond(ex, 200, """{"data": {"ok": true}}""")
        case other =>
          respond(ex, 404, s"""{"errors": [{"message": "no route $other"}]}""")
      }
    } catch {
      // registry misses / fixture faults surface as 5xx — the
      // retryable class, exactly what a flaky upstream looks like
      case e: Throwable =>
        respond(ex, 500, s"""{"errors": [{"message": "${GraphQLFixtures.jsonEscape(
          String.valueOf(e.getMessage))}"}]}""")
    } finally ex.close()

  /** Start (once) and return the loopback base URL. EVERY server
    * thread must be daemon — worker pool explicitly, and the
    * internal HTTP-Dispatcher by inheritance (it is spawned from
    * whatever thread calls `start()`, and it is NON-daemon when
    * started from a user thread, which would pin the JVM open after
    * main returns — `sbt runMain graft.Verify` would never exit).
    */
  def baseUrl(): String = synchronized {
    if (server == null) {
      val s = HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      s.createContext("/", handler)
      s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
        8,
        (r: Runnable) => {
          val t = new Thread(r, "graft-fixture-http")
          t.setDaemon(true)
          t
        }))
      val starter = new Thread(() => s.start(), "graft-fixture-http-start")
      starter.setDaemon(true) // dispatcher inherits daemon from here
      starter.start()
      starter.join()
      server = s
    }
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  /** An [[HttpPageFetcher]] whose requests traverse real HTTP into
    * the named registered fixture. `query` defaults to a
    * representative paginated document (the fixture ignores it; a
    * real API would not).
    */
  def fetcherFor(
      fetcherName: String,
      query: String =
        "query($after: String) { connection(after: $after) { pageInfo { hasNextPage endCursor } edges { cursor node { id } } } }",
      queryType: Option[String] = None,
      extraHeaders: Map[String, String] = Map.empty): HttpPageFetcher =
    HttpPageFetcher(
      url = baseUrl() + "/graphql",
      query = query,
      headers = Map("X-Graft-Fetcher" -> fetcherName) ++ extraHeaders,
      queryType = queryType)

  /** An [[HttpMutationSender]] posting through real HTTP into the
    * named registered sender (e.g. a [[CapturingSender]]).
    */
  def senderFor(targetSender: String): HttpMutationSender =
    HttpMutationSender(
      url = baseUrl() + "/mutate",
      headers = Map("X-Graft-Sender" -> targetSender))
}
