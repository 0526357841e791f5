package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.conditions.{Condition, Op}
import graft.cursor.Cursor
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** Header-based HTTP auth modes (reference: core/auth.py:37-121 — ApiKeyAuth
  * / TokenAuth / BearerAuth / OAuth2Auth / LoginAuth build per-request
  * headers; `build_headers` merges auth headers with static extras,
  * core/auth.py:20-31).
  *
  * Auth material resolves to header strings ON THE DRIVER, once per Spark
  * job; the resolved map ships inside task closures. The auth object
  * itself also rides the closure — for request-signing schemes
  * ([[HttpAuth.OAuth1]]) and so a task rejected with 401 mid-job can
  * [[HttpAuth.invalidate]] + re-resolve once instead of failing the job.
  */
sealed trait HttpAuth extends Serializable {
  /** Auth-specific headers (may refresh cached tokens). */
  def authHeaders(): Map[String, String]
  /** Static extra headers (tenant ids, correlation ids, ...). */
  def extraHeaders: Map[String, String]
  /** Merged headers, extras overriding auth on collision — the reference's
    * `build_headers` update order (core/auth.py:27-31). */
  final def buildHeaders(): Map[String, String] = authHeaders() ++ extraHeaders
  /** PER-REQUEST headers (request-signing schemes): computed against the
    * exact method/url/query of each request, on whichever node issues it.
    * Static schemes return nothing — their material is resolved once via
    * [[buildHeaders]] on the driver. */
  def signRequest(method: String, baseUrl: String,
      params: Seq[(String, String)]): Map[String, String] = Map.empty
  /** Drop any cached token so the next [[buildHeaders]] re-resolves
    * through the scheme's refresh path — called by the read/write paths
    * after the origin rejects the current material (401) even though the
    * local clock considered it fresh (server-side revocation, clock skew
    * beyond `skewMs`). Static schemes have nothing to drop. */
  def invalidate(): Unit = ()
}

object HttpAuth {
  final case class NoAuth(extraHeaders: Map[String, String] = Map.empty)
      extends HttpAuth {
    def authHeaders(): Map[String, String] = Map.empty
  }
  /** Named-header key (core/auth.py:37 ApiKeyAuth). */
  final case class ApiKey(headerName: String, key: String,
      extraHeaders: Map[String, String] = Map.empty) extends HttpAuth {
    def authHeaders(): Map[String, String] = Map(headerName -> key)
  }
  /** `Authorization: <scheme> <token>` (core/auth.py:53 TokenAuth). */
  final case class Token(token: String, scheme: String = "Token",
      extraHeaders: Map[String, String] = Map.empty) extends HttpAuth {
    def authHeaders(): Map[String, String] =
      Map("Authorization" -> s"$scheme $token")
  }
  /** `Authorization: Bearer <token>` (core/auth.py:69 BearerAuth). */
  final case class Bearer(token: String,
      extraHeaders: Map[String, String] = Map.empty) extends HttpAuth {
    def authHeaders(): Map[String, String] =
      Map("Authorization" -> s"Bearer $token")
  }

  /** OAuth2 client-credentials bearer with expiry-aware refresh
    * (core/auth.py:104-140 OAuth2Auth._fetch_access_token — but where the
    * reference caches forever, this refreshes when the token is within
    * `skewMs` of expiry, like [[Auth.Expiring]]). `fetchToken` returns
    * (access token, expiry epoch millis); the clock is injectable so specs
    * drive expiry deterministically. */
  final class OAuth2(
      fetchToken: () => (String, Long),
      clock: () => Long = () => System.currentTimeMillis(),
      skewMs: Long = 30000,
      val extraHeaders: Map[String, String] = Map.empty) extends HttpAuth {
    private var cached: String = _
    private var expiresAt: Long = Long.MinValue
    @transient private lazy val lock = new Object
    @volatile var refreshCount: Int = 0
    def authHeaders(): Map[String, String] = lock.synchronized {
      if (clock() + skewMs >= expiresAt) {
        val (tok, exp) = fetchToken()
        cached = tok
        expiresAt = exp
        refreshCount += 1
      }
      Map("Authorization" -> s"Bearer $cached")
    }
    override def invalidate(): Unit = lock.synchronized {
      expiresAt = Long.MinValue
    }
  }

  object OAuth2 {
    /** Standard client-credentials grant: form-POST to `tokenUrl`, read
      * `access_token` + `expires_in` (seconds) from the JSON response. */
    def clientCredentials(tokenUrl: String, clientId: String,
        clientSecret: String, scope: Option[String] = None,
        extraHeaders: Map[String, String] = Map.empty,
        clock: () => Long = () => System.currentTimeMillis()): OAuth2 = {
      val form = Seq(
        "grant_type" -> "client_credentials",
        "client_id" -> clientId,
        "client_secret" -> clientSecret) ++ scope.map("scope" -> _)
      new OAuth2(fetchToken = () => {
        val body = Http.post(tokenUrl, Map.empty, Http.formEncode(form),
          "application/x-www-form-urlencoded")
        val node = Http.mapper.readTree(body)
        val tok = node.get("access_token").asText()
        val ttlMs = Option(node.get("expires_in")).map(_.asLong * 1000L)
          .getOrElse(3600000L)
        // expiry through the SAME injectable clock the refresh check
        // reads — a spec-driven clock stays internally consistent
        (tok, clock() + ttlMs)
      }, clock = clock, extraHeaders = extraHeaders)
    }
  }

  /** OAuth 1.0a request signing (RFC 5849; core/auth.py:82-101 leaves
    * OAuth1Auth's headers as an empty placeholder — this is the real
    * construction). Unlike the static schemes, the Authorization header is
    * computed PER REQUEST: the HMAC-SHA1 signature covers the method, the
    * base url, and every query parameter (§3.4.1 signature base string),
    * so it is built on whichever node issues the request via
    * [[signRequest]]. Nonce/timestamp are injectable for deterministic
    * specs; production uses the defaults. */
  final class OAuth1(
      consumerKey: String, consumerSecret: String,
      token: String, tokenSecret: String,
      val extraHeaders: Map[String, String] = Map.empty,
      nonce: () => String = () => java.util.UUID.randomUUID().toString.replace("-", ""),
      timestamp: () => Long = () => System.currentTimeMillis() / 1000) extends HttpAuth {

    def authHeaders(): Map[String, String] = Map.empty

    /** RFC 3986 §2.3 percent-encoding (strict: only unreserved chars kept),
      * the encoding RFC 5849 §3.6 mandates for base strings and keys. */
    private def enc(s: String): String = {
      val sb = new StringBuilder
      s.getBytes(UTF_8).foreach { b =>
        val c = b.toChar
        if (c.isLetterOrDigit && c < 128 || c == '-' || c == '.' || c == '_' || c == '~') sb.append(c)
        else sb.append(f"%%${b & 0xFF}%02X")
      }
      sb.toString
    }

    override def signRequest(method: String, baseUrl: String,
        params: Seq[(String, String)]): Map[String, String] = {
      val oauth = Seq(
        "oauth_consumer_key" -> consumerKey,
        "oauth_nonce" -> nonce(),
        "oauth_signature_method" -> "HMAC-SHA1",
        "oauth_timestamp" -> timestamp().toString,
        "oauth_token" -> token,
        "oauth_version" -> "1.0")
      // §3.4.1.3.2: encode each pair, sort by encoded name then value
      val normalized = (params ++ oauth)
        .map { case (k, v) => enc(k) -> enc(v) }
        .sortBy(identity)
        .map { case (k, v) => s"$k=$v" }.mkString("&")
      val base = s"${method.toUpperCase}&${enc(baseUrl)}&${enc(normalized)}"
      val key = s"${enc(consumerSecret)}&${enc(tokenSecret)}"
      val mac = javax.crypto.Mac.getInstance("HmacSHA1")
      mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes(UTF_8), "HmacSHA1"))
      val sig = java.util.Base64.getEncoder.encodeToString(mac.doFinal(base.getBytes(UTF_8)))
      val header = (oauth :+ ("oauth_signature" -> sig))
        .map { case (k, v) => s"""$k="${enc(v)}"""" }.mkString("OAuth ", ", ", "")
      Map("Authorization" -> header)
    }
  }

  /** Username/password session login: POST credentials once, reuse the
    * returned session token as a bearer (core/auth.py:143-170 LoginAuth). */
  final class Login(loginUrl: String, username: String, password: String,
      val extraHeaders: Map[String, String] = Map.empty) extends HttpAuth {
    @volatile private var session: String = _
    def authHeaders(): Map[String, String] = {
      if (session == null) {
        val body = Http.post(loginUrl, Map.empty,
          s"""{"username":${Http.jsonString(username)},"password":${Http.jsonString(password)}}""",
          "application/json")
        session = Http.mapper.readTree(body).get("session_token").asText()
      }
      Map("Authorization" -> s"Bearer $session")
    }
    override def invalidate(): Unit = session = null
  }
}

/** Thrown for a non-2xx response that survives retries. */
final case class RestHttpError(status: Int, url: String, body: String)
  extends RuntimeException(s"HTTP $status from $url: ${body.take(500)}")

/** Minimal HTTP client over JDK HttpClient — shared by driver-side probes
  * and executor-side page fetches (one static client per JVM). Retries
  * 429/5xx and connection failures with exponential backoff; 4xx fails
  * fast (a bad request never becomes good by retrying). */
private[graft] object Http {
  lazy val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(20)).build()

  def urlEncode(s: String): String = URLEncoder.encode(s, UTF_8)

  def formEncode(params: Seq[(String, String)]): String =
    params.map { case (k, v) => s"${urlEncode(k)}=${urlEncode(v)}" }.mkString("&")

  def withQuery(base: String, params: Seq[(String, String)]): String =
    if (params.isEmpty) base else s"$base?${formEncode(params)}"

  def jsonString(s: String): String = mapper.writeValueAsString(s)

  def get(url: String, headers: Map[String, String], maxAttempts: Int = 4,
      metrics: Option[RequestMetrics] = None): String =
    send(builder(url, headers).GET().build(), url, maxAttempts, metrics)

  def post(url: String, headers: Map[String, String], body: String,
      contentType: String, maxAttempts: Int = 4,
      metrics: Option[RequestMetrics] = None): String =
    send(builder(url, headers).header("Content-Type", contentType)
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      url, maxAttempts, metrics)

  def put(url: String, headers: Map[String, String], body: String,
      contentType: String, maxAttempts: Int = 4,
      metrics: Option[RequestMetrics] = None): String =
    send(builder(url, headers).header("Content-Type", contentType)
      .PUT(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      url, maxAttempts, metrics)

  private def builder(url: String, headers: Map[String, String]) = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(Duration.ofMinutes(2))
    headers.foreach { case (k, v) => b.header(k, v) }
    b
  }

  private def send(req: HttpRequest, url: String, maxAttempts: Int,
      metrics: Option[RequestMetrics] = None): String = {
    var attempt = 0
    var lastError: Throwable = null
    while (attempt < maxAttempts) {
      if (attempt > 0) {
        Thread.sleep(100L << (attempt - 1))
        metrics.foreach(_.retries.add(1))
      }
      attempt += 1
      metrics.foreach(_.requests.add(1))
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
        val code = resp.statusCode()
        if (code / 100 == 2) return resp.body()
        if (code / 100 == 4) metrics.foreach(_.http4xx.add(1))
        else if (code / 100 == 5) metrics.foreach(_.http5xx.add(1))
        val err = RestHttpError(code, url, resp.body())
        if (code != 429 && code / 100 != 5) throw err // 4xx: fail fast
        lastError = err
      } catch {
        case e: java.io.IOException =>
          metrics.foreach(_.ioErrors.add(1))
          lastError = e
      }
    }
    throw lastError
  }
}

/** Compile the Condition/Cursor algebra into HTTP query params — the
  * reference's `build_connector_params` (core/utils.py:604): EQ keeps the
  * raw field name (core/utils.py:291 build_eq_query_params), IN renders
  * `field__in=v1,v2` with the "array" formatter default (core/utils.py:550),
  * CONTAINS renders the search-binding shape `field__contains`
  * (core/utils.py:319), and the cursor window maps to explicit min/max
  * param names plus a sort param (core/utils.py:195
  * build_cursor_query_params). Range/null ops extend the same `field__op`
  * naming pattern the reference's EQ-only builder leaves as TODO. */
object RestParams {

  def render(v: Any): String = v match {
    case null => ""
    case s: String => s
    case other => other.toString
  }

  def condition(c: Condition): (String, String) = c.op match {
    case Op.Eq       => c.field -> render(c.value)
    case Op.Gt       => s"${c.field}__gt" -> render(c.value)
    case Op.Gte      => s"${c.field}__gte" -> render(c.value)
    case Op.Lt       => s"${c.field}__lt" -> render(c.value)
    case Op.Lte      => s"${c.field}__lte" -> render(c.value)
    case Op.Contains => s"${c.field}__contains" -> render(c.value)
    case Op.StartsWith => s"${c.field}__startswith" -> render(c.value)
    case Op.IsNull   => s"${c.field}__isnull" -> "true"
    case Op.NotNull  => s"${c.field}__isnull" -> "false"
    case Op.In =>
      val vs = c.value match {
        case xs: Seq[_]      => xs
        case xs: Array[_]    => xs.toSeq
        case xs: Iterable[_] => xs.toSeq
        case single          => Seq(single)
      }
      require(vs.nonEmpty, s"IN condition on '${c.field}' with no values")
      s"${c.field}__in" -> vs.map(render).mkString(",")
  }

  /** Cursor window + direction. Param names default to `<field>_min` /
    * `<field>_max` (the reference requires explicit names per resource,
    * core/utils.py:237-247 — callers with a nonstandard origin pass their
    * own). Asc/desc maps start/end to min/max exactly like
    * [[graft.cursor.Cursor.slice]]. */
  def cursor(cursorField: String, cur: Cursor,
      minParam: Option[String] = None, maxParam: Option[String] = None,
      sortParam: String = "sort_by"): Seq[(String, String)] = {
    val lo = minParam.getOrElse(s"${cursorField}_min")
    val hi = maxParam.getOrElse(s"${cursorField}_max")
    val (min, max) = if (cur.ascending) (cur.start, cur.end) else (cur.end, cur.start)
    min.map(lo -> _).toSeq ++ max.map(hi -> _).toSeq :+
      (sortParam -> (if (cur.ascending) "asc" else "desc"))
  }
}

/** REST warehouse: resources are paginated JSON collection endpoints under
  * one base url — the reference's native connector family
  * (connectors/hrflow/actions.py:22 `fetch_jobs(params)` over
  * `GET /storing/jobs`, core/connector.py:63 `read_jobs_batch`).
  *
  * Where the reference loops pages one at a time in a single process, the
  * Spark-first read is a DISTRIBUTED page fetch — the HTTP analogue of
  * Spark's partitioned JDBC scan:
  *
  *  1. compile conditions + cursor into query params ([[RestParams]]), so
  *     the ORIGIN filters — a pull ships the slice, never the table;
  *  2. probe page 1 on the driver to learn the filtered total;
  *  3. fan the remaining page ids across executors (`spark.range` →
  *     `mapPartitions`), each task fetching its pages with the same params
  *     and emitting per-record JSON;
  *  4. parse with the caller's schema (one pass, no inference job) or let
  *     `spark.read.json` infer.
  *
  * Responses follow the reference's envelope: `{"data": [...]}` with a
  * `total` count for page fan-out (origins without a total fall back to a
  * sequential driver loop that stops at the first short page).
  */
final case class RestWarehouse(
    name: String,
    baseUrl: String,
    httpAuth: HttpAuth = HttpAuth.NoAuth(),
    pageSize: Int = 1000,
    maxParallelFetch: Int = 32,
    pageParam: String = "page",
    limitParam: String = "limit",
    dataField: String = "data",
    totalField: String = "total",
    writeBatchSize: Int = 500,
    // configuring the id field opts SaveMode.Overwrite pushes into the
    // PUT-update path; unset, every write verbs as POST-create (the
    // reference's create-as-upsert default)
    updateIdField: Option[String] = None,
    // KEYSET pagination: set to the envelope field carrying the origin's
    // continuation token (e.g. "next_cursor") and reads follow the token
    // chain instead of page numbers — the modern-API shape, and the only
    // correct one when the collection shifts under offset pagination.
    // Inherently sequential (each token depends on the previous
    // response), so it runs the driver loop; prefer offset/total mode
    // when the origin offers it (distributed page fan-out).
    nextCursorField: Option[String] = None,
    cursorTokenParam: String = "cursor",
    // safety cap on the keyset token chain: a buggy origin that keeps
    // emitting tokens would otherwise spin the driver forever while the
    // buffered collection grows without bound
    maxKeysetPages: Int = 100000,
    // request-level observability (reference core/actions.py:21-40):
    // attach RequestMetrics(spark) and every request this warehouse
    // issues — driver probes AND executor page fetches — counts into
    // the same accumulators; read via requestStats / RestWriteReport
    metrics: Option[RequestMetrics] = None,
    // PUSH IDEMPOTENCY (the contract the reference's at-least-once
    // retries lack): set to this sync run's id and every write batch
    // carries a DETERMINISTIC `Idempotency-Key` header —
    // `<pushId>-p<partition>-b<ordinal>` (per-record isolation retries
    // append `-r<idx>`) — so a batch replayed after a lost ack (429/5xx
    // AFTER the origin applied it, a retried Spark task, a re-run job
    // with the same id) is origin-side deduplicable instead of
    // double-written. Unset, no header is sent (at-least-once, the
    // reference's behavior). Partition id and batch ordinal are functions
    // of the data layout, not of the attempt — but batch MEMBERSHIP also
    // depends on row order within the partition, which Spark does not
    // guarantee across task attempts after a shuffle. Setting pushId
    // therefore forces a sortWithinPartitions over all columns before
    // batching, making every attempt of a task produce the same batches
    // under the same keys. */
    pushId: Option[String] = None) extends Warehouse {

  require(pageSize > 0 && maxParallelFetch > 0 && writeBatchSize > 0)

  /** Warehouse-trait auth is reader-option based; REST auth is header
    * based and rides [[httpAuth]] instead. */
  def auth: Auth = Auth.None

  /** Cumulative request counters (None when no metrics attached). */
  def requestStats: Option[RequestStats] = metrics.map(_.snapshot)

  private def endpoint(resource: String): String = {
    require(!resource.contains("/") && !resource.contains(".."),
      s"invalid resource name: $resource")
    s"${baseUrl.stripSuffix("/")}/$resource"
  }

  override def read(spark: SparkSession, resource: String): DataFrame =
    readSlice(spark, resource)

  /** Origin-filtered paginated read. `schema` skips the inference pass —
    * at scale, always pass it (inference would re-fetch every page). */
  def readSlice(
      spark: SparkSession,
      resource: String,
      conditions: Seq[Condition] = Nil,
      cursorField: Option[String] = None,
      cursor: Option[Cursor] = None,
      schema: Option[StructType] = None,
      cursorMinParam: Option[String] = None,
      cursorMaxParam: Option[String] = None): DataFrame = {
    val cursorParams = (cursorField, cursor) match {
      case (Some(f), Some(c)) =>
        RestParams.cursor(f, c, cursorMinParam, cursorMaxParam)
      case (None, None) => Nil
      case _ => throw new IllegalArgumentException(
        "cursorField and cursor must be provided together")
    }
    val params = conditions.map(RestParams.condition) ++ cursorParams
    // static material resolves ONCE on the driver (token refresh happens
    // here); request-signing schemes additionally sign each request where
    // it is issued. The auth object rides the task closure so a task that
    // gets 401'd mid-job (token expired/revoked after launch) can
    // invalidate + re-resolve ONCE instead of failing the job
    val auth = httpAuth
    val url = endpoint(resource)
    val mx = metrics // local capture: closures must not drag `this`
    val (limitP, pageP, dataF, totalF, limit) =
      (limitParam, pageParam, dataField, totalField, pageSize)

    def fetchWith(pp: Seq[(String, String)],
        hdrs: Map[String, String]): JsonNode = {
      val node = Http.mapper.readTree(Http.get(Http.withQuery(url, pp),
        hdrs ++ auth.signRequest("GET", url, pp), metrics = mx))
      require(node.get(dataF) != null && node.get(dataF).isArray,
        s"response from $url has no '$dataF' array")
      node
    }
    def fetchPageWith(page: Long, lim: Int,
        hdrs: Map[String, String]): JsonNode =
      fetchWith(params ++ Seq(pageP -> page.toString, limitP -> lim.toString), hdrs)
    // driver-side fetch with one 401-triggered re-resolve: a token cached
    // from a PREVIOUS read may have expired/been revoked since
    var headers = auth.buildHeaders()
    def fetchPage(page: Long, lim: Int): JsonNode =
      try fetchPageWith(page, lim, headers)
      catch {
        case RestHttpError(401, _, _) =>
          auth.invalidate()
          headers = auth.buildHeaders()
          fetchPageWith(page, lim, headers)
      }

    // KEYSET origins: follow the continuation-token chain. Sequential by
    // construction — token N+1 only exists in response N — so this is
    // the driver loop with the same 401-refresh contract; the fetched
    // slice is pinned by the same single-shot rule below.
    val keysetResult: Option[DataFrame] = nextCursorField.map { nextF =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var token: Option[String] = None
      var done = false
      var pages = 0
      while (!done) {
        pages += 1
        if (pages > maxKeysetPages) throw new IllegalStateException(
          s"keyset pagination from $url exceeded maxKeysetPages=" +
            s"$maxKeysetPages without exhausting the token chain")
        val pp = params ++ Seq(limitP -> limit.toString) ++
          token.map(cursorTokenParam -> _).toSeq
        val node =
          try fetchWith(pp, headers)
          catch {
            case RestHttpError(401, _, _) =>
              auth.invalidate()
              headers = auth.buildHeaders()
              fetchWith(pp, headers)
          }
        var pageRows = 0
        val it = node.get(dataF).elements()
        while (it.hasNext) { buf += it.next().toString; pageRows += 1 }
        val nt = Option(node.get(nextF)).filterNot(_.isNull)
          .map(_.asText).filter(_.nonEmpty)
        // a non-progressing origin (echoed token, or a token alongside an
        // empty page) would loop forever — fail loudly instead
        if (nt.isDefined && nt == token) throw new IllegalStateException(
          s"keyset pagination from $url returned the same continuation " +
            s"token twice ('${nt.get}'): origin is not advancing")
        if (nt.isDefined && pageRows == 0) throw new IllegalStateException(
          s"keyset pagination from $url returned an empty page with a " +
            "continuation token: origin is not advancing")
        token = nt
        done = nt.isEmpty
      }
      import spark.implicits._
      val ds = spark.createDataset(buf.toSeq)
      schema match {
        case Some(st) => spark.read.schema(st).json(ds)
        case None     => spark.read.json(ds)
      }
    }
    if (keysetResult.isDefined) return keysetResult.get

    // driver probe: a 1-row request just to read the filtered total — the
    // driver never holds page data, executors fetch every real page.
    // A present-but-null (or non-numeric) total means the origin could
    // not compute one: fall through to the sequential loop rather than
    // reading it as 0 and silently truncating to a single page.
    val probe = fetchPage(1, 1)
    val totalOpt = Option(probe.get(totalF)).filter(_.isNumber).map(_.asLong)

    val json: org.apache.spark.sql.Dataset[String] = totalOpt match {
      case Some(total) =>
        val totalPages = math.max(1L, (total + limit - 1) / limit)
        val slots = math.min(totalPages, maxParallelFetch.toLong).toInt
        val taskHeaders = headers // post-probe snapshot; vals ship cleanly
        import spark.implicits._
        spark.range(1, totalPages + 1)
          .repartition(slots)
          .mapPartitions { pages =>
            // driver-resolved headers first; on a 401 this task
            // invalidates the (task-local deserialized) auth copy and
            // re-resolves once — subsequent pages in the partition reuse
            // the fresh material
            var hdrs = taskHeaders
            def fetch(p: Long): JsonNode =
              try fetchPageWith(p, limit, hdrs)
              catch {
                case RestHttpError(401, _, _) =>
                  auth.invalidate()
                  hdrs = auth.buildHeaders()
                  fetchPageWith(p, limit, hdrs)
              }
            pages.flatMap { p =>
              val it = fetch(p).get(dataF).elements()
              Iterator.continually(it).takeWhile(_.hasNext)
                .map(_.next().toString)
            }
          }
          // materialize the fetch EXACTLY ONCE before anything consumes
          // it: HTTP pagination is not a re-runnable scan — a task retry
          // or a second action re-issuing requests against a live origin
          // can skip/duplicate rows if the collection shifted between
          // fetches (offset-pagination drift). The checkpoint pins the
          // fetched rows as storage blocks; every downstream action —
          // including schema inference's extra pass — reads blocks, never
          // the network. (A retry DURING the checkpoint job itself still
          // refetches that partition's pages — the unavoidable one-shot
          // window.) Cluster equivalent: persist(DISK) or land-to-bronze
          // before transforming; held storage is O(slice), the rows the
          // caller asked for.
          .localCheckpoint()
      case None =>
        // no total in the envelope: sequential driver loop, stop at the
        // first short page (the reference's read-until-exhausted shape,
        // core/connector.py:63)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var page = 1L
        var n = limit
        while (n == limit) {
          val data = fetchPage(page, limit).get(dataF)
          n = data.size()
          val it = data.elements()
          while (it.hasNext) buf += it.next().toString
          page += 1
        }
        import spark.implicits._
        spark.createDataset(buf.toSeq)
    }
    schema match {
      case Some(st) => spark.read.schema(st).json(json)
      case None     => spark.read.json(json)
    }
  }

  /** Distributed BY-ID batch fetch — the events-mode push's resource
    * hydration (reference fetch_jobs_by_ids, connectors/hrflow/actions.py:69,
    * which GETs one id at a time in a driver loop). Spark-first: the
    * (already-distributed) id frame fans out across executors and each
    * task issues ONE `idField__in=<batch>` request per `batchSize` ids —
    * requests scale with distinct-ids/batchSize, not with ids. Ids the
    * origin doesn't have simply don't come back (the reference skips
    * non-200 singles the same way); the push layer counts them as
    * skipped_missing. Fetched rows are pinned exactly once, same
    * single-shot contract as [[readSlice]].
    *
    * `ids`' FIRST column supplies the id values (whatever its name — an
    * events frame's `user_id` column is the common caller); `idField` is
    * the ORIGIN's field name the `__in` filter addresses. */
  def fetchByIds(ids: DataFrame, resource: String, idField: String,
      schema: Option[StructType] = None, batchSize: Int = 200): DataFrame = {
    require(batchSize > 0)
    val spark = ids.sparkSession
    val auth = httpAuth
    val headers0 = httpAuth.buildHeaders()
    val url = endpoint(resource)
    val mx = metrics
    val (limitP, pageP, dataF, bs) = (limitParam, pageParam, dataField, batchSize)
    import spark.implicits._
    val idStrs = ids.select(ids(ids.columns.head).cast("string"))
      .na.drop().distinct().as[String]
    val json = idStrs.mapPartitions { it =>
      var hdrs = headers0
      def fetchPage(batch: Seq[String], page: Long): Seq[String] = {
        val pp = Seq(s"${idField}__in" -> batch.mkString(","),
          pageP -> page.toString, limitP -> bs.toString)
        def go(h: Map[String, String]) = Http.mapper.readTree(
          Http.get(Http.withQuery(url, pp), h ++ auth.signRequest("GET", url, pp),
            metrics = mx))
        val node =
          try go(hdrs)
          catch {
            case RestHttpError(401, _, _) =>
              auth.invalidate()
              hdrs = auth.buildHeaders()
              go(hdrs)
          }
        val data = node.get(dataF)
        require(data != null && data.isArray,
          s"by-id fetch from $url has no '$dataF' array")
        val els = data.elements()
        Iterator.continually(els).takeWhile(_.hasNext)
          .map(_.next().toString).toSeq
      }
      def fetch(batch: Seq[String]): Iterator[String] = {
        // usually ONE request: ids are distinct, so a page of batchSize
        // holds every match — but an origin may keep several records per
        // id (version history), so a full first page reads on until the
        // short page rather than silently truncating
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var page = 1L
        var n = bs
        while (n == bs) {
          val rows = fetchPage(batch, page)
          n = rows.size
          out ++= rows
          page += 1
        }
        out.iterator
      }
      it.grouped(bs).flatMap(fetch)
    }.localCheckpoint()
    schema match {
      case Some(st) => spark.read.schema(st).json(json)
      case None     => spark.read.json(json)
    }
  }

  /** Distributed push — the reference's create_jobs/update_jobs split
    * (connectors/hrflow/actions.py:37/53), batched and parallelized
    * across partitions instead of a per-record driver loop:
    *
    *  - [[create]] POSTs JSON array batches (the reference documents
    *    create as an upsert — it is the default push verb);
    *  - [[update]] PUTs JSON array batches where every element carries
    *    its id field, so the origin addresses each record
    *    (`update_jobs` PUTs the record body with its key the same way).
    *
    * SaveMode routing: `Overwrite` takes the update path when
    * [[updateIdField]] is configured; everything else creates. Both verbs
    * ISOLATE bad records: a batch rejected with 4xx is retried one record
    * at a time so one poison record cannot sink its whole batch — the
    * reference's per-record response collection, without giving up
    * batching on the happy path. `write` throws if any record failed
    * (after isolation, so the good records landed — at-least-once);
    * call [[create]]/[[update]] directly for the tolerant report. */
  override def write(df: DataFrame, resource: String, mode: SaveMode): Unit = {
    val report = (mode, updateIdField) match {
      case (SaveMode.Overwrite, Some(f)) => update(df, resource, f)
      case _                             => create(df, resource)
    }
    if (report.failed > 0) throw new IllegalStateException(
      s"$name/$resource rejected ${report.failed} records " +
        s"(${report.written} written)")
  }

  /** POST-create push (reference create_jobs, actions.py:37). */
  def create(df: DataFrame, resource: String): RestWriteReport =
    writeVerb(df, resource, "POST", idField = None)

  /** PUT-update push (reference update_jobs, actions.py:53): every row
    * must carry a non-null `idField` for the origin to address it. */
  def update(df: DataFrame, resource: String,
      idField: String = "id"): RestWriteReport =
    writeVerb(df, resource, "PUT", idField = Some(idField))

  private def writeVerb(df: DataFrame, resource: String, verb: String,
      idField: Option[String]): RestWriteReport = {
    idField.foreach(f => require(df.columns.contains(f),
      s"update id field '$f' is not in the frame's schema"))
    val headers0 = httpAuth.buildHeaders()
    val auth = httpAuth
    val url = endpoint(resource)
    val mx = metrics
    val before = mx.map(_.snapshot)
    val bs = writeBatchSize
    val pid = pushId
    val spark = df.sparkSession
    import spark.implicits._
    // pushId promises "same batch under the same key on every attempt";
    // partition membership is hash-deterministic, but row ORDER after a
    // shuffle fetch is not — pin it with a per-partition full-row sort so
    // batch boundaries are a pure function of the data (cheap: no shuffle)
    import org.apache.spark.sql.functions.{col => fcol, row_number, struct, to_json}
    val deduped = (idField, pid) match {
      case (Some(f), Some(_)) =>
        // PAGINATION-DRIFT armor for the id-addressed update path: an
        // offset-paginated pull sees one record on TWO pages when the
        // origin shifts mid-read, and pushing both copies re-applies the
        // update under two different batch keys the origin cannot
        // relate. The id IS the record's identity at the origin: one
        // update per id per push, the survivor picked deterministically
        // (ordered by the full row's JSON) so batch layout — and with
        // it every idempotency key — stays a pure function of the data.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(fcol(f))
          .orderBy(to_json(struct(df.columns.toIndexedSeq.map(fcol): _*)))
        df.withColumn("__graft_rn", row_number().over(w))
          .where(fcol("__graft_rn") === 1).drop("__graft_rn")
      case _ => df
    }
    val src =
      if (pid.isDefined)
        deduped.sortWithinPartitions(df.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      else deduped
    val counts = src.toJSON.mapPartitions { rows =>
      var hdrs = headers0
      val part = Option(org.apache.spark.TaskContext.get())
        .map(_.partitionId()).getOrElse(0)
      def send(body: String, key: Option[String] = None): Unit = {
        // JSON bodies are outside the OAuth1 signature by spec (§3.4.1.3
        // covers only query + form params) — sign method/url only, but
        // PER REQUEST: RFC 5849 servers reject replayed (timestamp,
        // nonce) pairs. 401 → invalidate + re-resolve once per task,
        // same contract as the read path.
        def go(h: Map[String, String]): Unit = {
          // the idempotency key rides EVERY attempt of the same batch —
          // Http's internal 429/5xx retries resend it unchanged, which
          // is the whole point: the origin recognizes the replay
          val signed = h ++ auth.signRequest(verb, url, Nil) ++
            key.map("Idempotency-Key" -> _)
          if (verb == "PUT") Http.put(url, signed, body, "application/json",
            metrics = mx)
          else Http.post(url, signed, body, "application/json", metrics = mx)
          ()
        }
        try go(hdrs)
        catch {
          case RestHttpError(401, _, _) =>
            auth.invalidate()
            hdrs = auth.buildHeaders()
            go(hdrs)
        }
      }
      var ok = 0L
      var bad = 0L
      var ordinal = 0
      rows.grouped(bs).foreach { batch =>
        val bkey = pid.map(p => s"$p-p$part-b$ordinal")
        ordinal += 1
        try { send(batch.mkString("[", ",", "]"), bkey); ok += batch.size }
        catch {
          // whole batch rejected: isolate — one record per request, so
          // only the records the origin actually refuses are lost.
          // 429 is EXCLUDED: retry-exhausted throttling is not a verdict
          // on the records, and the origin may already have APPLIED the
          // batch (the lost-ack case pushId exists for). Re-sending each
          // row under a fresh `-r<i>` key the origin never saw would
          // double-apply; rethrowing lets Spark retry the whole task,
          // which resends the SAME batch key the origin can dedupe.
          case RestHttpError(code, _, _)
              if code != 401 && code != 429 && code / 100 == 4 =>
            batch.zipWithIndex.foreach { case (r, i) =>
              try { send(s"[$r]", bkey.map(k => s"$k-r$i")); ok += 1 }
              catch {
                case RestHttpError(c, _, _)
                    if c != 401 && c != 429 && c / 100 == 4 =>
                  bad += 1
              }
            }
        }
      }
      Iterator((ok, bad))
    }.collect()
    // per-run HTTP counters: accumulator delta across the push job (the
    // reference's per-action request/retry counts, core/actions.py:21-40)
    val stats = (before, mx.map(_.snapshot)) match {
      case (Some(b), Some(a)) => a - b
      case _ => RequestStats(0, 0, 0, 0, 0)
    }
    RestWriteReport(counts.map(_._1).sum, counts.map(_._2).sum,
      stats.requests, stats.retries, stats.http4xx, stats.http5xx)
  }
}

/** Outcome of a REST push: `written` records accepted by the origin,
  * `failed` records it rejected (4xx) after per-record isolation; the
  * remaining fields are the run's HTTP counter deltas (zero when the
  * warehouse has no [[RequestMetrics]] attached). */
final case class RestWriteReport(written: Long, failed: Long,
    requests: Long = 0, retries: Long = 0, http4xx: Long = 0,
    http5xx: Long = 0)
