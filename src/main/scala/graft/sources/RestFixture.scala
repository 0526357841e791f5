package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct, to_json}

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, Executors}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.jdk.CollectionConverters._

/** In-process paginated JSON API over a DataFrame's rows — the test double
  * for a reference-style HTTP origin (connectors/hrflow/actions.py:22
  * `GET /storing/jobs?params`), used by specs and the q42 gate query.
  *
  * Supports the param dialect [[RestParams]] compiles: bare `field=` for EQ,
  * `field__gt/gte/lt/lte/contains/in/isnull`, `<cursor>_min`/`<cursor>_max`
  * windows, `sort_by=asc|desc` over the cursor field, `page`/`limit`
  * pagination. Responses are `{"data":[...],"total":N,"page":P}` —
  * `total` counts the FILTERED set, which is what lets the client fan
  * pages out in parallel. Auth: an optional required header (API-key
  * mode), plus optional `/token` (OAuth2 client-credentials) and `/login`
  * (session) endpoints that issue bearer tokens the data endpoint then
  * accepts. Instrumented with request/served-row counters so tests can
  * assert the ORIGIN did the filtering.
  *
  * Fixture only: rows are collected to the server's heap, which is exactly
  * the thing the library's distributed read path exists to avoid.
  */
final class RestFixture private (
    server: HttpServer,
    pool: java.util.concurrent.ExecutorService,
    val resource: String,
    private[sources] val keyset: Boolean,
    private[sources] val keysetStuck: Boolean) {

  val requests = new ConcurrentLinkedQueue[String]()
  // countdown of data requests to answer 429 before serving (rate-limit
  // simulation: lets specs pin the client's retry/backoff counters)
  private[sources] val flaky429Remaining = new AtomicInteger(0)
  // LOST-ACK simulation: the first N WRITE requests are APPLIED and then
  // answered 429 — the classic applied-but-client-saw-failure window
  // where a retried batch double-writes unless the origin dedupes on an
  // idempotency key
  private[sources] val lostAckRemaining = new AtomicInteger(0)
  // Idempotency-Key → the recorded response: a replayed key serves the
  // recorded answer WITHOUT re-applying (the origin-side contract)
  private[sources] val appliedKeys =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // PAGINATION-DRIFT simulation: after N data GETs, a record materializes
  // in the collection (as if another writer inserted mid-read) — every
  // offset past its sort position shifts by one, so a client fanning out
  // offset pages sees one record on TWO pages. armDrift arms it.
  private[sources] val driftCountdown = new AtomicInteger(-1)
  @volatile private[sources] var driftRec
      : Option[(String, Map[String, Any])] = None
  def armDrift(afterDataReads: Int, json: String,
      fields: Map[String, Any]): Unit = {
    driftRec = Some(json -> fields)
    driftCountdown.set(afterDataReads)
  }
  private[sources] def maybeDrift(): Unit =
    if (driftCountdown.get >= 0 && driftCountdown.getAndDecrement() == 0)
      driftRec.foreach { case (j, f) => postedRecs.add(j -> f) }

  val servedRows = new AtomicLong(0)
  val tokensIssued = new AtomicInteger(0)
  val postedRows = new ConcurrentLinkedQueue[String]()
  val postedBatches = new AtomicLong(0)
  val putRows = new ConcurrentLinkedQueue[String]()
  val putBatches = new AtomicLong(0)
  // writable mode: POSTed records parsed into servable (json, fields)
  private[sources] val postedRecs =
    new ConcurrentLinkedQueue[(String, Map[String, Any])]()
  private[sources] val validTokens = new ConcurrentLinkedQueue[String]()

  /** Revoke every bearer issued so far: the next data request carrying one
    * gets 401 — lets specs exercise the client's mid-job re-auth path. */
  def revokeTokens(): Unit = validTokens.clear()

  def port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port/api"
  def tokenUrl: String = s"http://127.0.0.1:$port/token"
  def loginUrl: String = s"http://127.0.0.1:$port/login"
  def requestLog: Seq[String] = requests.asScala.toSeq
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object RestFixture {

  private final case class Rec(json: String, fields: Map[String, Any])

  /** OAuth1 verification secrets: consumer key/secret + token/secret. */
  final case class OAuth1Secrets(consumerKey: String, consumerSecret: String,
      token: String, tokenSecret: String)

  /** Serve `df`'s rows at `/api/<resource>`, sorted by `cursorField`.
    *
    * @param requiredHeader data requests missing this exact header get 401
    * @param issueBearer    activate /token + /login; data requests must
    *                       then carry `Authorization: Bearer <issued>`
    * @param oauth1         verify each request's OAuth1 signature against
    *                       the request ACTUALLY received (method, url,
    *                       query) — a client that signs anything other
    *                       than what it sends gets 401
    */
  /** `keyset = true` switches the GET envelope to token pagination: no
    * `total`, a `next_cursor` continuation token (opaque base64) while
    * rows remain, `cursor=<token>` resumes — the modern-API shape whose
    * client half is RestWarehouse's keyset mode. */
  def serve(df: DataFrame, resource: String, cursorField: String,
      requiredHeader: Option[(String, String)] = None,
      issueBearer: Boolean = false,
      oauth1: Option[OAuth1Secrets] = None,
      keyset: Boolean = false,
      // simulate a broken origin that never advances: every keyset page
      // re-serves offset 0 and re-issues the same continuation token —
      // lets specs pin the client's infinite-loop guard
      keysetStuck: Boolean = false,
      // writable origins SERVE what clients POST (a real collection
      // endpoint, not a write-only sink) — lets gates round-trip the
      // write path: push a slice, pull it back, oracle the result
      writable: Boolean = false,
      // answer 429 to the first N data requests (then serve normally):
      // the rate-limited-origin simulation behind retry-counter specs
      flaky429: Int = 0,
      // APPLY the first N write requests and then answer 429 anyway —
      // the lost-ack window where at-least-once retries double-write;
      // an origin honoring Idempotency-Key serves the recorded response
      // on the replay instead of re-applying
      lostAck429: Int = 0): RestFixture = {
    val names = df.columns.toSeq
    val collected = df
      .select(to_json(struct(names.map(col): _*)).as("__json") +: names.map(col): _*)
      .collect()
    val recs = collected.map { r =>
      Rec(r.getString(0), names.zipWithIndex.map { case (n, i) =>
        n -> r.get(i + 1)
      }.toMap)
    }.sortWith((a, b) => cmpAny(a.fields(cursorField), b.fields(cursorField)) < 0)

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // daemon threads + explicit shutdown in stop(): a fixture must never
    // keep the host JVM (Verify/Bench mains) alive after the run
    val pool = Executors.newFixedThreadPool(8, (r: Runnable) => {
      val t = new Thread(r, "rest-fixture")
      t.setDaemon(true)
      t
    })
    server.setExecutor(pool)
    val fx = new RestFixture(server, pool, resource, keyset, keysetStuck)
    fx.flaky429Remaining.set(flaky429)
    fx.lostAckRemaining.set(lostAck429)
    val validTokens = fx.validTokens
    // writable origins merge POSTed records into the served collection
    def liveRecs: Seq[Rec] = {
      val extra = fx.postedRecs.asScala.map { case (j, f) => Rec(j, f) }.toSeq
      if (extra.isEmpty) recs.toSeq
      else (recs.toSeq ++ extra).sortWith((a, b) =>
        cmpAny(a.fields(cursorField), b.fields(cursorField)) < 0)
    }

    def authorized(ex: HttpExchange): Boolean = {
      val ok1 = requiredHeader.forall { case (k, v) =>
        Option(ex.getRequestHeaders.getFirst(k)).contains(v)
      }
      val ok2 = !issueBearer || Option(ex.getRequestHeaders.getFirst("Authorization"))
        .exists(h => validTokens.asScala.exists(t => h == s"Bearer $t"))
      val ok3 = oauth1.forall(sec => verifyOAuth1(ex, sec))
      ok1 && ok2 && ok3
    }

    server.createContext(s"/api/$resource", (ex: HttpExchange) => {
      try {
        val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        fx.requests.add(s"${ex.getRequestMethod} ${ex.getRequestURI.getPath}?$query")
        if (fx.flaky429Remaining.getAndUpdate(n => math.max(0, n - 1)) > 0)
          respond(ex, 429, """{"error":"rate limited"}""")
        else if (!authorized(ex)) respond(ex, 401, """{"error":"unauthorized"}""")
        else if (ex.getRequestMethod == "POST") {
          val key = Option(ex.getRequestHeaders.getFirst("Idempotency-Key"))
          val replay = key.flatMap(k => Option(fx.appliedKeys.get(k)))
          if (replay.isDefined)
            // the key already applied: serve the RECORDED response,
            // re-apply nothing — exactly-once from the client's retry
            respond(ex, 200, replay.get)
          else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val arr = Http.mapper.readTree(body)
            require(arr.isArray, "POST body must be a JSON array")
            arr.elements().asScala.foreach { n =>
              fx.postedRows.add(n.toString)
              if (writable) {
                def v(x: com.fasterxml.jackson.databind.JsonNode): Any =
                  if (x.isIntegralNumber) x.asLong
                  else if (x.isNumber) x.asDouble
                  else if (x.isNull) null
                  else if (x.isBoolean) x.asBoolean
                  else x.asText
                val fields = n.properties().asScala
                  .map(e => e.getKey -> v(e.getValue)).toMap
                fx.postedRecs.add(n.toString -> fields)
              }
            }
            fx.postedBatches.incrementAndGet()
            val resp = s"""{"accepted":${arr.size()}}"""
            key.foreach(k => fx.appliedKeys.put(k, resp))
            // lost-ack window: the write APPLIED but the client sees 429
            if (fx.lostAckRemaining.getAndUpdate(n => math.max(0, n - 1)) > 0)
              respond(ex, 429, """{"error":"rate limited (after apply)"}""")
            else respond(ex, 200, resp)
          }
        } else if (ex.getRequestMethod == "PUT") {
          // update verb: every element must carry the id (cursor) field
          // for the origin to address it — a request containing any
          // unaddressable record is rejected whole, which is what forces
          // the client's per-record isolation fallback
          val key = Option(ex.getRequestHeaders.getFirst("Idempotency-Key"))
          val replay = key.flatMap(k => Option(fx.appliedKeys.get(k)))
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val arr = Http.mapper.readTree(body)
          require(arr.isArray, "PUT body must be a JSON array")
          if (replay.isDefined) respond(ex, 200, replay.get)
          else if (arr.elements().asScala.exists(n => !n.hasNonNull(cursorField)))
            respond(ex, 400, s"""{"error":"record missing '$cursorField'"}""")
          else {
            arr.elements().asScala.foreach(n => fx.putRows.add(n.toString))
            fx.putBatches.incrementAndGet()
            val resp = s"""{"updated":${arr.size()}}"""
            key.foreach(k => fx.appliedKeys.put(k, resp))
            if (fx.lostAckRemaining.getAndUpdate(n => math.max(0, n - 1)) > 0)
              respond(ex, 429, """{"error":"rate limited (after apply)"}""")
            else respond(ex, 200, resp)
          }
        } else if (fx.keyset) {
          fx.maybeDrift() // armed page-shift fires before serving this GET
          // token pagination: an opaque base64 offset token, no total
          val params = parseQuery(query)
          val limit = params.collectFirst { case ("limit", v) => v.toInt }.getOrElse(100)
          val off = params.collectFirst { case ("cursor", v) => v }
            .map(t => new String(java.util.Base64.getUrlDecoder.decode(t), UTF_8).toLong)
            .getOrElse(0L)
          val filters = params.filterNot { case (k, _) =>
            k == "cursor" || k == "limit" || k == "sort_by" || k == "page"
          }
          val matched = liveRecs.filter(r => filters.forall(f => eval(r.fields, cursorField, f)))
          val effOff = if (fx.keysetStuck) 0L else off
          val slice = matched.slice(effOff.toInt, effOff.toInt + limit)
          fx.servedRows.addAndGet(slice.length.toLong)
          val nextOff = if (fx.keysetStuck) 0L else off + slice.length
          val next =
            if (fx.keysetStuck || nextOff < matched.length)
              s""","next_cursor":"${java.util.Base64.getUrlEncoder.withoutPadding
                .encodeToString(nextOff.toString.getBytes(UTF_8))}""""
            else ""
          respond(ex, 200, slice.map(_.json).mkString(
            """{"data":[""", ",", s"]$next}"))
        } else {
          fx.maybeDrift() // armed page-shift fires before serving this GET
          val params = parseQuery(query)
          val sortDesc = params.collectFirst { case ("sort_by", v) => v }.contains("desc")
          val page = params.collectFirst { case ("page", v) => v.toLong }.getOrElse(1L)
          val limit = params.collectFirst { case ("limit", v) => v.toInt }.getOrElse(100)
          val filters = params.filterNot { case (k, _) =>
            k == "page" || k == "limit" || k == "sort_by"
          }
          val matched = liveRecs.filter(r => filters.forall(f => eval(r.fields, cursorField, f)))
          val ordered = if (sortDesc) matched.reverse else matched
          val slice = ordered.slice(((page - 1) * limit).toInt, (page * limit).toInt)
          fx.servedRows.addAndGet(slice.length.toLong)
          respond(ex, 200, slice.map(_.json).mkString(
            s"""{"total":${matched.length},"page":$page,"data":[""", ",", "]}"))
        }
      } catch {
        case e: Exception =>
          respond(ex, 400, s"""{"error":${Http.jsonString(String.valueOf(e.getMessage))}}""")
      }
    })

    if (issueBearer) {
      server.createContext("/token", (ex: HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val form = parseQuery(body).toMap
        if (form.get("grant_type").contains("client_credentials") &&
            form.contains("client_id") && form.contains("client_secret")) {
          val tok = s"issued-${fx.tokensIssued.incrementAndGet()}"
          validTokens.add(tok)
          respond(ex, 200, s"""{"access_token":"$tok","expires_in":3600}""")
        } else respond(ex, 400, """{"error":"invalid_grant"}""")
      })
      server.createContext("/login", (ex: HttpExchange) => {
        val node = Http.mapper.readTree(ex.getRequestBody)
        if (node.has("username") && node.has("password")) {
          val tok = s"session-${fx.tokensIssued.incrementAndGet()}"
          validTokens.add(tok)
          respond(ex, 200, s"""{"session_token":"$tok"}""")
        } else respond(ex, 400, """{"error":"bad_login"}""")
      })
    }

    server.start()
    fx
  }

  /** Recompute the RFC 5849 signature from the request as RECEIVED:
    * method + reconstructed base url + actual query params + the oauth_*
    * header params (minus the signature itself), HMAC-SHA1 with the shared
    * secrets. Catches clients that sign a different url/param set than
    * they send. */
  private def verifyOAuth1(ex: HttpExchange, sec: OAuth1Secrets): Boolean = {
    def enc(s: String): String = {
      val sb = new StringBuilder
      s.getBytes(UTF_8).foreach { b =>
        val c = b.toChar
        if (c.isLetterOrDigit && c < 128 || c == '-' || c == '.' || c == '_' || c == '~') sb.append(c)
        else sb.append(f"%%${b & 0xFF}%02X")
      }
      sb.toString
    }
    val header = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(return false)
    if (!header.startsWith("OAuth ")) return false
    val oauthParams = header.stripPrefix("OAuth ").split(", ").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> URLDecoder.decode(v.stripPrefix("\"").stripSuffix("\""), UTF_8))
        case _ => None
      }
    }
    val sig = oauthParams.collectFirst { case ("oauth_signature", v) => v }.getOrElse(return false)
    if (!oauthParams.toMap.get("oauth_consumer_key").contains(sec.consumerKey)) return false
    val query = parseQuery(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
    val all = query ++ oauthParams.filterNot(_._1 == "oauth_signature")
    val normalized = all.map { case (k, v) => enc(k) -> enc(v) }
      .sortBy(identity).map { case (k, v) => s"$k=$v" }.mkString("&")
    val baseUrl = s"http://127.0.0.1:${ex.getLocalAddress.getPort}${ex.getRequestURI.getPath}"
    val base = s"${ex.getRequestMethod.toUpperCase}&${enc(baseUrl)}&${enc(normalized)}"
    val key = s"${enc(sec.consumerSecret)}&${enc(sec.tokenSecret)}"
    val mac = javax.crypto.Mac.getInstance("HmacSHA1")
    mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes(UTF_8), "HmacSHA1"))
    val expected = java.util.Base64.getEncoder.encodeToString(mac.doFinal(base.getBytes(UTF_8)))
    expected == sig
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def parseQuery(q: String): Seq[(String, String)] =
    q.split("&").toSeq.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8)
        case Array(k)    => URLDecoder.decode(k, UTF_8) -> ""
      }
    }

  /** Numeric comparison when the stored value is a number (query param
    * values arrive as strings), string otherwise. */
  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number) =>
      BigDecimal(x.toString).compare(BigDecimal(y.toString))
    case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
  }

  private def cmpParam(value: Any, arg: String): Int = value match {
    case n: Number => BigDecimal(n.toString).compare(BigDecimal(arg))
    case other     => String.valueOf(other).compareTo(arg)
  }

  private def eval(fields: Map[String, Any], cursorField: String,
      filter: (String, String)): Boolean = {
    val (key, arg) = filter
    def field(k: String): Any = fields.getOrElse(k,
      throw new IllegalArgumentException(s"unknown field: $k"))
    key match {
      case k if k == s"${cursorField}_min" => cmpParam(field(cursorField), arg) >= 0
      case k if k == s"${cursorField}_max" => cmpParam(field(cursorField), arg) <= 0
      case k if k.endsWith("__gt")  => cmpParam(field(k.dropRight(4)), arg) > 0
      case k if k.endsWith("__gte") => cmpParam(field(k.dropRight(5)), arg) >= 0
      case k if k.endsWith("__lt")  => cmpParam(field(k.dropRight(4)), arg) < 0
      case k if k.endsWith("__lte") => cmpParam(field(k.dropRight(5)), arg) <= 0
      case k if k.endsWith("__contains") =>
        String.valueOf(field(k.dropRight(10))).contains(arg)
      case k if k.endsWith("__in") =>
        arg.split(",").exists(v => cmpParam(field(k.dropRight(4)), v) == 0)
      case k if k.endsWith("__isnull") =>
        (field(k.dropRight(8)) == null) == (arg == "true")
      case k => cmpParam(field(k), arg) == 0
    }
  }
}
