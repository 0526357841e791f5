package graft

import graft.conditions.{Condition, Op}
import graft.cursor.{Cursor, CursorMode}
import graft.sources.{HttpAuth, RestFixture, RestHttpError, RestParams, RestWarehouse}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** RestWarehouse against an in-process paginated JSON origin: param
  * compilation, origin-side filtering, distributed page fan-out, auth
  * header modes (api-key / bearer / OAuth2 refresh / login), and the
  * batched write path. */
class RestWarehouseSpec extends SparkSpecBase {

  private lazy val customer = Tables(spark, sf0001, "customer")
    .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))

  test("RestParams compiles the condition algebra into query params") {
    assert(RestParams.condition(Condition("segment", Op.Eq, "GOLD")) ==
      ("segment" -> "GOLD"))
    assert(RestParams.condition(Condition("score", Op.Gte, 10)) ==
      ("score__gte" -> "10"))
    assert(RestParams.condition(Condition("name", Op.Contains, "smith")) ==
      ("name__contains" -> "smith"))
    assert(RestParams.condition(Condition("tag", Op.In, Seq("a", "b"))) ==
      ("tag__in" -> "a,b"))
    assert(RestParams.condition(Condition("email", Op.IsNull, null)) ==
      ("email__isnull" -> "true"))
    assert(RestParams.cursor("updated", Cursor(CursorMode.UpdatedAt,
      start = Some("2024-01-01"), end = Some("2024-02-01"))) ==
      Seq("updated_min" -> "2024-01-01", "updated_max" -> "2024-02-01",
        "sort_by" -> "asc"))
    // desc swaps start/end into min/max like Cursor.slice
    assert(RestParams.cursor("updated", Cursor(CursorMode.UpdatedAt,
      start = Some("2024-02-01"), end = Some("2024-01-01"), ascending = false)) ==
      Seq("updated_min" -> "2024-01-01", "updated_max" -> "2024-02-01",
        "sort_by" -> "desc"))
  }

  test("readSlice pulls an origin-filtered cursor slice across pages") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey")
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 16)
      val out = wh.readSlice(spark, "customer",
        conditions = Seq(Condition("c_mktsegment", Op.Eq, "BUILDING")),
        cursorField = Some("c_custkey"),
        cursor = Some(Cursor(CursorMode.Uid, start = Some("20"), end = Some("120"))),
        schema = Some(customer.schema)).localCheckpoint()
      val expected = customer
        .where(col("c_mktsegment") === "BUILDING" &&
          col("c_custkey").between(20, 120))
      assert(out.count() == expected.count() && out.count() > 16,
        "slice must span multiple pages")
      assert(out.except(expected).isEmpty && expected.except(out).isEmpty)
      // the ORIGIN filtered: it served exactly the slice plus the 1-row
      // driver probe (pages carried the compiled params), not the table
      assert(fx.servedRows.get() == out.count() + 1)
      assert(fx.requestLog.forall(_.contains("c_mktsegment=BUILDING")))
      assert(fx.requestLog.forall(r =>
        r.contains("c_custkey_min=20") && r.contains("c_custkey_max=120")))
      // fan-out really paginated: probe + ceil(total/16) pages
      val total = expected.count()
      assert(fx.requestLog.size.toLong == 1L + (total + 15) / 16)
    } finally fx.stop()
  }

  test("keyset pagination follows the continuation-token chain to exhaustion") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey", keyset = true)
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 16,
        nextCursorField = Some("next_cursor"))
      val out = wh.readSlice(spark, "customer",
        conditions = Seq(Condition("c_mktsegment", Op.Eq, "BUILDING")),
        schema = Some(customer.schema)).localCheckpoint()
      val expected = customer.where(col("c_mktsegment") === "BUILDING")
      assert(out.count() == expected.count() && out.count() > 16,
        "slice must span multiple token hops")
      assert(out.except(expected).isEmpty && expected.except(out).isEmpty)
      // origin-side filtering in keyset mode too: exactly the slice served
      assert(fx.servedRows.get() == out.count())
      assert(fx.requestLog.forall(_.contains("c_mktsegment=BUILDING")))
      // the chain: ceil(total/16) requests, all but the first carrying a
      // cursor token, none carrying page numbers
      val total = expected.count()
      assert(fx.requestLog.size.toLong == (total + 15) / 16)
      assert(fx.requestLog.count(_.contains("cursor=")) == fx.requestLog.size - 1)
      assert(!fx.requestLog.exists(_.contains("page=")))
    } finally fx.stop()
  }

  test("keyset pagination fails loudly on a non-progressing origin") {
    // a broken origin that re-issues the same continuation token forever
    // must error, not spin the driver / buffer unboundedly
    val fx = RestFixture.serve(customer, "customer", "c_custkey",
      keyset = true, keysetStuck = true)
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 16,
        nextCursorField = Some("next_cursor"))
      val e = intercept[IllegalStateException] {
        wh.readSlice(spark, "customer", schema = Some(customer.schema))
      }
      assert(e.getMessage.contains("same continuation token"), e.getMessage)
      // detected at the echo, not after grinding through a page cap
      assert(fx.requestLog.size <= 3, fx.requestLog.size.toString)
    } finally fx.stop()
  }

  test("keyset pagination enforces the maxKeysetPages cap") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey", keyset = true)
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 4,
        nextCursorField = Some("next_cursor"), maxKeysetPages = 2)
      val e = intercept[IllegalStateException] {
        wh.readSlice(spark, "customer", schema = Some(customer.schema))
      }
      assert(e.getMessage.contains("maxKeysetPages"), e.getMessage)
    } finally fx.stop()
  }

  test("writable origin serves pushed rows back: write → read round-trip") {
    val fx = RestFixture.serve(customer.limit(0), "customer", "c_custkey",
      writable = true)
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 32,
        writeBatchSize = 50)
      val slice = customer.where(col("c_nationkey") < 5)
      wh.write(slice, "customer", SaveMode.Append)
      assert(fx.postedRows.size() == slice.count())
      val back = wh.readSlice(spark, "customer",
        schema = Some(customer.schema)).localCheckpoint()
      assert(back.count() == slice.count())
      assert(back.except(slice).isEmpty && slice.except(back).isEmpty)
      // origin-side filtering works over POSTED records too
      val filtered = wh.readSlice(spark, "customer",
        conditions = Seq(Condition("c_mktsegment", Op.Eq, "BUILDING")),
        schema = Some(customer.schema)).localCheckpoint()
      val expected = slice.where(col("c_mktsegment") === "BUILDING")
      assert(filtered.count() == expected.count())
      assert(filtered.except(expected).isEmpty)
    } finally fx.stop()
  }

  test("lost-ack retries double-write keyless; idempotency keys make the " +
      "replay exactly-once on the origin") {
    val slice = customer.where(col("c_nationkey") < 5)
    val n = slice.count()
    // control: no key — the origin applies, loses the ack, the client's
    // 429 retry re-applies: duplicates (the reference's at-least-once)
    val fx1 = RestFixture.serve(customer.limit(0), "customer", "c_custkey",
      writable = true, lostAck429 = 1)
    try {
      RestWarehouse("fixture", fx1.baseUrl, writeBatchSize = 100000)
        .write(slice.coalesce(1), "customer", SaveMode.Append)
      assert(fx1.postedRows.size() == 2 * n,
        "the lost-ack window must double-write without keys")
    } finally fx1.stop()
    // keyed: the retry replays the SAME Idempotency-Key; the origin
    // serves the recorded response and re-applies nothing
    val fx2 = RestFixture.serve(customer.limit(0), "customer", "c_custkey",
      writable = true, lostAck429 = 2)
    try {
      val wh = RestWarehouse("fixture", fx2.baseUrl, writeBatchSize = 20,
        pushId = Some("run-7"))
      wh.write(slice.coalesce(2), "customer", SaveMode.Append)
      assert(fx2.postedRows.size() == n,
        s"exactly one copy must land (got ${fx2.postedRows.size()} of $n)")
      import scala.jdk.CollectionConverters._
      val posts = fx2.requests.asScala.count(_.startsWith("POST"))
      assert(posts == fx2.postedBatches.get() + 2,
        "both lost-ack retries must have replayed (and only those)")
      val back = wh.readSlice(spark, "customer",
        schema = Some(customer.schema)).localCheckpoint()
      assert(back.count() == n)
      assert(back.except(slice).isEmpty && slice.except(back).isEmpty)
    } finally fx2.stop()
    // PUT path honors keys the same way
    val fx3 = RestFixture.serve(customer.limit(0), "customer", "c_custkey",
      writable = true, lostAck429 = 1)
    try {
      val wh = RestWarehouse("fixture", fx3.baseUrl, writeBatchSize = 50,
        updateIdField = Some("c_custkey"), pushId = Some("run-8"))
      wh.update(slice.coalesce(1), "customer", "c_custkey")
      assert(fx3.putRows.size() == n,
        s"keyed PUT must land exactly once (got ${fx3.putRows.size()})")
    } finally fx3.stop()
  }

  test("pagination drift mid-pull: the record the origin served on TWO " +
      "pages updates exactly once under pushId (keyed by record identity)") {
    val slice = customer.where(col("c_nationkey") < 5).localCheckpoint()
    val n = slice.count()
    val p = math.max(2, (n / 2).toInt)
    // the drifting record sorts FIRST (c_custkey = -1): when it lands,
    // every later offset shifts by one and the page boundary re-serves
    // the last row of the previous page — real offset-pagination drift
    val drifter = slice.limit(1).withColumn("c_custkey", lit(-1L))
      .select(slice.columns.map(col).toIndexedSeq: _*)
    val drow = drifter.collect().head
    val dfields = drifter.columns.zipWithIndex
      .map { case (c, i) => c -> drow.get(i) }.toMap
    val fxSrc = RestFixture.serve(slice, "customer", "c_custkey")
    val pulled = try {
      // GET 1 = the driver's total probe, GET 2 = data page 1; the shift
      // fires before GET 3 (data page 2). maxParallelFetch=1 pins the
      // executor's page order so the window is deterministic.
      fxSrc.armDrift(2, drifter.toJSON.head(), dfields)
      RestWarehouse("fixture", fxSrc.baseUrl, pageSize = p,
        maxParallelFetch = 1)
        .readSlice(spark, "customer", schema = Some(customer.schema))
        .localCheckpoint()
    } finally fxSrc.stop()
    val dupIds = pulled.groupBy(col("c_custkey")).count()
      .where(col("count") > 1).count()
    assert(dupIds >= 1,
      "the shifted origin must re-serve a record across the page boundary")
    val distinctIds = pulled.select("c_custkey").distinct().count()
    // control: keyless update pushes the duplicate too — the drift gap
    // is real, not hypothetical
    val fxC = RestFixture.serve(customer.limit(0), "customer", "c_custkey",
      writable = true)
    try {
      RestWarehouse("fixture", fxC.baseUrl, writeBatchSize = p,
        updateIdField = Some("c_custkey"))
        .update(pulled, "customer", "c_custkey")
      assert(fxC.putRows.size() == pulled.count() &&
        fxC.putRows.size() > distinctIds,
        "without pushId the duplicated record must double-apply (control)")
    } finally fxC.stop()
    // keyed: one update per record IDENTITY — the dedup runs before
    // batching, so no batch key ever covers the second copy at all
    val fxK = RestFixture.serve(customer.limit(0), "customer", "c_custkey",
      writable = true)
    try {
      RestWarehouse("fixture", fxK.baseUrl, writeBatchSize = p,
        updateIdField = Some("c_custkey"), pushId = Some("drift-run-1"))
        .update(pulled, "customer", "c_custkey")
      assert(fxK.putRows.size() == distinctIds,
        s"exactly one update per id (got ${fxK.putRows.size()} of $distinctIds)")
      import scala.jdk.CollectionConverters._
      val ids = fxK.putRows.asScala.toSeq
        .map(j => graft.sources.Http.mapper.readTree(j)
          .get("c_custkey").asLong)
      assert(ids.distinct.size == ids.size,
        "the origin must hold exactly one copy per record identity")
    } finally fxK.stop()
  }

  test("writable origin serves pushed rows through KEYSET pagination too") {
    val fx = RestFixture.serve(customer.limit(0), "customer", "c_custkey",
      keyset = true, writable = true)
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 16,
        writeBatchSize = 50, nextCursorField = Some("next_cursor"))
      val slice = customer.where(col("c_nationkey") < 4)
      wh.write(slice, "customer", SaveMode.Append)
      val back = wh.readSlice(spark, "customer",
        schema = Some(customer.schema)).localCheckpoint()
      assert(back.count() == slice.count() && back.count() > 16,
        "round-trip must span multiple token hops")
      assert(back.except(slice).isEmpty && slice.except(back).isEmpty)
    } finally fx.stop()
  }

  test("read without schema infers and returns the full resource") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey")
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 64)
      val out = wh.read(spark, "customer").localCheckpoint()
      assert(out.count() == customer.count())
      assert(out.columns.sorted.toSeq == customer.columns.sorted.toSeq)
    } finally fx.stop()
  }

  test("an envelope without a total falls back to the sequential loop") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey")
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 40,
        totalField = "no_such_field")
      val out = wh.readSlice(spark, "customer",
        conditions = Seq(Condition("c_nationkey", Op.In, Seq(1, 2, 3))),
        schema = Some(customer.schema)).localCheckpoint()
      val expected = customer.where(col("c_nationkey").isin(1, 2, 3))
      assert(out.count() == expected.count())
      assert(out.except(expected).isEmpty)
    } finally fx.stop()
  }

  test("readSlice materializes once: later actions issue zero new requests") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey")
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 16)
      val out = wh.readSlice(spark, "customer", schema = Some(customer.schema))
      val afterRead = fx.requestLog.size
      // several distinct actions over the returned frame: counts, an agg,
      // a re-count — HTTP pagination is not a re-runnable scan, so every
      // one must read the pinned blocks, never the origin
      assert(out.count() == customer.count())
      assert(out.agg(sum("c_custkey")).head().getLong(0) ==
        customer.agg(sum("c_custkey")).head().getLong(0))
      assert(out.count() == customer.count())
      assert(fx.requestLog.size == afterRead,
        "a second action re-issued HTTP requests — offset-pagination drift risk")
    } finally fx.stop()
  }

  test("session revoked between reads: client re-authenticates once and succeeds") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey",
      issueBearer = true)
    try {
      val auth = new HttpAuth.Login(fx.loginUrl, "user", "hunter2")
      val wh = RestWarehouse("fixture", fx.baseUrl, httpAuth = auth, pageSize = 512)
      assert(wh.read(spark, "customer").count() == customer.count())
      assert(fx.tokensIssued.get() == 1)
      // origin-side revocation the client's cache knows nothing about:
      // the next read's first 401 invalidates the cached session,
      // re-logins, and completes — instead of failing the job fast
      fx.revokeTokens()
      assert(wh.read(spark, "customer").count() == customer.count())
      assert(fx.tokensIssued.get() == 2, "exactly one re-login")
    } finally fx.stop()
  }

  test("api-key auth: wrong key fails fast with 401, right key succeeds") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey",
      requiredHeader = Some("X-API-Key" -> "sesame"))
    try {
      val bad = RestWarehouse("fixture", fx.baseUrl,
        httpAuth = HttpAuth.ApiKey("X-API-Key", "wrong"))
      val err = intercept[RestHttpError] { bad.read(spark, "customer") }
      assert(err.status == 401)
      val good = RestWarehouse("fixture", fx.baseUrl,
        httpAuth = HttpAuth.ApiKey("X-API-Key", "sesame"), pageSize = 512)
      assert(good.read(spark, "customer").localCheckpoint().count() ==
        customer.count())
    } finally fx.stop()
  }

  test("OAuth2 client-credentials fetches a bearer the origin issued") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey",
      issueBearer = true)
    try {
      val auth = HttpAuth.OAuth2.clientCredentials(
        fx.tokenUrl, clientId = "cid", clientSecret = "cs")
      val wh = RestWarehouse("fixture", fx.baseUrl, httpAuth = auth, pageSize = 512)
      assert(wh.read(spark, "customer").localCheckpoint().count() == customer.count())
      assert(fx.tokensIssued.get() == 1)
      // second job reuses the unexpired token — no second grant
      assert(wh.read(spark, "customer").localCheckpoint().count() == customer.count())
      assert(fx.tokensIssued.get() == 1)
    } finally fx.stop()
  }

  test("OAuth2 refreshes when the clock passes expiry") {
    var tokens = 0
    var now = 0L
    val auth = new HttpAuth.OAuth2(
      fetchToken = () => { tokens += 1; (s"t$tokens", now + 1000) },
      clock = () => now, skewMs = 100)
    assert(auth.buildHeaders() == Map("Authorization" -> "Bearer t1"))
    now = 500 // 500 + 100 < 1000: still fresh
    assert(auth.buildHeaders() == Map("Authorization" -> "Bearer t1"))
    now = 950 // 950 + 100 >= 1000: refresh
    assert(auth.buildHeaders() == Map("Authorization" -> "Bearer t2"))
    assert(auth.refreshCount == 2)
  }

  test("OAuth1 signature matches an independently computed RFC 5849 vector") {
    // expected value computed with python hmac/hashlib/urllib (not this
    // implementation): GET http://example.com/api/items?b=2&a=1%20z,
    // ck/csecret, tok/tsecret, nonce=fixednonce, ts=1700000000
    val auth = new HttpAuth.OAuth1("ck", "csecret", "tok", "tsecret",
      nonce = () => "fixednonce", timestamp = () => 1700000000L)
    val h = auth.signRequest("GET", "http://example.com/api/items",
      Seq("b" -> "2", "a" -> "1 z"))
    val header = h("Authorization")
    assert(header.startsWith("OAuth oauth_consumer_key=\"ck\""))
    assert(header.contains("oauth_signature=\"%2FduWtXwdVomIwRLqU%2Bk5KniUVkI%3D\""))
  }

  test("OAuth1-signed paginated read: every page request verifies; bad secret 401s") {
    val secrets = RestFixture.OAuth1Secrets("ck", "csecret", "tok", "tsecret")
    val fx = RestFixture.serve(customer, "customer", "c_custkey", oauth1 = Some(secrets))
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 64,
        httpAuth = new HttpAuth.OAuth1("ck", "csecret", "tok", "tsecret"))
      val out = wh.readSlice(spark, "customer",
        conditions = Seq(Condition("c_mktsegment", Op.Eq, "BUILDING")),
        schema = Some(customer.schema)).localCheckpoint()
      // the fixture verifies each signature against the request it
      // actually received — a pass means every page (driver probe AND
      // executor fetches) was signed over its own url + params
      assert(out.count() == customer.where(col("c_mktsegment") === "BUILDING").count())
      val bad = RestWarehouse("fixture", fx.baseUrl,
        httpAuth = new HttpAuth.OAuth1("ck", "WRONG", "tok", "tsecret"))
      val err = intercept[RestHttpError] { bad.read(spark, "customer") }
      assert(err.status == 401)
    } finally fx.stop()
  }

  test("login auth exchanges credentials for a session bearer once") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey",
      issueBearer = true)
    try {
      val auth = new HttpAuth.Login(fx.loginUrl, "user", "hunter2")
      val wh = RestWarehouse("fixture", fx.baseUrl, httpAuth = auth, pageSize = 512)
      assert(wh.read(spark, "customer").localCheckpoint().count() == customer.count())
      assert(wh.read(spark, "customer").localCheckpoint().count() == customer.count())
      assert(fx.tokensIssued.get() == 1, "session token must be reused")
    } finally fx.stop()
  }

  test("extra headers merge into every request") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey",
      requiredHeader = Some("X-Tenant" -> "t1"))
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl,
        httpAuth = HttpAuth.NoAuth(extraHeaders = Map("X-Tenant" -> "t1")),
        pageSize = 512)
      assert(wh.read(spark, "customer").localCheckpoint().count() == customer.count())
    } finally fx.stop()
  }

  test("write POSTs partition batches the origin can reassemble") {
    val fx = RestFixture.serve(customer.limit(0), "customer_sink", "c_custkey")
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, writeBatchSize = 100)
      val src = customer.repartition(3)
      wh.write(src, "customer_sink")
      assert(fx.postedRows.size() == customer.count())
      assert(fx.postedBatches.get() >= 3, "each partition posts its own batches")
      // round-trip: the posted JSON parses back to the same rows
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      val back = spark.read.schema(customer.schema)
        .json(spark.createDataset(fx.postedRows.asScala.toSeq))
      assert(back.except(customer).isEmpty && customer.except(back).isEmpty)
    } finally fx.stop()
  }

  test("fetchByIds hydrates distinct ids in batched id__in requests") {
    val fx = RestFixture.serve(customer, "customer", "c_custkey")
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl)
      // duplicated, differently-named id column (the events-frame shape)
      val ids = spark.range(1, 301).select((col("id") % 150 + 1).as("user_id"))
      val out = wh.fetchByIds(ids, "customer", "c_custkey",
        Some(customer.schema), batchSize = 40)
      val present = customer.where(col("c_custkey").between(1, 150)).count()
      assert(out.count() == present, "each distinct present id hydrates once")
      assert(fx.servedRows.get() == present, "origin serves each id exactly once")
      // 150 distinct ids at 40/batch = 4 batches; a batch whose matches
      // exactly fill its page issues one (empty) continuation request
      assert(fx.requestLog.size >= 4 && fx.requestLog.size <= 8,
        s"expected 4 batches (+short-page probes), saw ${fx.requestLog.size}")
      assert(fx.requestLog.forall(r =>
        r.contains("c_custkey__in=") && r.contains("limit=40")))
      // missing ids just don't come back
      val sparse = wh.fetchByIds(
        spark.range(0, 5).select((col("id") * 100000 + 1000007).as("user_id")),
        "customer", "c_custkey", Some(customer.schema))
      assert(sparse.count() == 0)
    } finally fx.stop()
  }

  test("update PUTs id-addressed batches; Overwrite routes there via updateIdField") {
    val fx = RestFixture.serve(customer.limit(0), "customer_sink", "c_custkey")
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, writeBatchSize = 100,
        updateIdField = Some("c_custkey"))
      wh.write(customer.repartition(3), "customer_sink", SaveMode.Overwrite)
      assert(fx.putRows.size() == customer.count(), "every record PUT")
      assert(fx.postedRows.size() == 0, "update must not POST")
      assert(fx.requestLog.forall(_.startsWith("PUT ")))
      // id-addressing: every element the origin saw carried its key
      import scala.jdk.CollectionConverters._
      assert(fx.putRows.asScala.forall(_.contains("\"c_custkey\":")))
      // the same warehouse creates (POSTs) under Append
      wh.write(customer.limit(10), "customer_sink", SaveMode.Append)
      assert(fx.postedRows.size() == 10)
    } finally fx.stop()
  }

  test("a poison record is isolated: the rest of its batch still lands") {
    val fx = RestFixture.serve(customer.limit(0), "customer_sink", "c_custkey")
    try {
      val wh = RestWarehouse("fixture", fx.baseUrl, writeBatchSize = 50)
      // one row with a null key: toJSON omits null fields, so its JSON has
      // no c_custkey and the fixture 400s any PUT batch containing it
      val poisoned = customer.limit(120).withColumn("c_custkey",
        when(col("c_custkey") === 5, lit(null)).otherwise(col("c_custkey")))
      val report = wh.update(poisoned.coalesce(1), "customer_sink", "c_custkey")
      assert(report.failed == 1, "exactly the poison record fails")
      assert(report.written == 119, "every other record lands")
      assert(fx.putRows.size() == 119)
      // write() surfaces the loss instead of swallowing it
      val err = intercept[IllegalStateException] {
        RestWarehouse("fixture", fx.baseUrl, writeBatchSize = 50,
          updateIdField = Some("c_custkey"))
          .write(poisoned.coalesce(1), "customer_sink", SaveMode.Overwrite)
      }
      assert(err.getMessage.contains("rejected 1"))
    } finally fx.stop()
  }

  test("resource names cannot escape the endpoint path") {
    val wh = RestWarehouse("w", "http://127.0.0.1:1/api")
    intercept[IllegalArgumentException] { wh.read(spark, "../admin") }
    intercept[IllegalArgumentException] { wh.read(spark, "a/b") }
  }

  test("request/retry counters: exact read counts including a retried 429") {
    import graft.sources.RequestMetrics
    val rows = customer.limit(100)
    // the FIRST data request (the driver probe) gets a 429, then the
    // origin serves normally — the client must retry it and count both
    val fx = RestFixture.serve(rows, "customer", "c_custkey", flaky429 = 1)
    try {
      val mx = RequestMetrics(spark)
      val wh = RestWarehouse("fixture", fx.baseUrl, pageSize = 40,
        metrics = Some(mx))
      val out = wh.readSlice(spark, "customer",
        schema = Some(rows.schema)).localCheckpoint()
      assert(out.count() == 100)
      val s = wh.requestStats.get
      // probe issued twice (429 + retry) + ceil(100/40)=3 page fetches
      assert(s.requests == 5, s"requests: $s")
      assert(s.retries == 1, s"retries: $s")
      assert(s.http4xx == 1, s"the 429 counts as the 4xx class: $s")
      assert(s.http5xx == 0 && s.ioErrors == 0, s.toString)
      // fixture saw 5 HTTP hits too — client and origin agree
      assert(fx.requestLog.size == 5)
    } finally fx.stop()
  }

  test("request/retry counters: write report carries per-run HTTP deltas") {
    import graft.sources.RequestMetrics
    val fx = RestFixture.serve(customer.limit(0), "sink", "c_custkey")
    try {
      val mx = RequestMetrics(spark)
      val wh = RestWarehouse("fixture", fx.baseUrl, writeBatchSize = 50,
        metrics = Some(mx))
      // 120 rows, one poison (null key) → 3 batches; the poison batch is
      // 400-rejected whole, then isolated per record: 49 singles land,
      // 1 single fails. Requests: 3 batch PUTs + 50 singles = 53; 4xx:
      // the rejected batch + the rejected single = 2; no retries (4xx
      // fails fast).
      val poisoned = customer.limit(120).withColumn("c_custkey",
        when(col("c_custkey") === 5, lit(null)).otherwise(col("c_custkey")))
      val report = wh.update(poisoned.coalesce(1), "sink", "c_custkey")
      assert(report.written == 119 && report.failed == 1)
      assert(report.requests == 53, report.toString)
      assert(report.http4xx == 2, report.toString)
      assert(report.retries == 0 && report.http5xx == 0, report.toString)
      // a second run's report is its own delta, not the cumulative total
      val clean = customer.limit(40)
      val r2 = wh.update(clean.coalesce(1), "sink", "c_custkey")
      assert(r2.written == 40 && r2.requests == 1 && r2.http4xx == 0,
        r2.toString)
      assert(wh.requestStats.get.requests == 54, "cumulative keeps counting")
    } finally fx.stop()
  }
}
