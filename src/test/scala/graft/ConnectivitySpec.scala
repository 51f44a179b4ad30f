package graft

import graft.sources.Connectivity._
import graft.sources.{Connectivity, ConnectivityConf, FrameTokenMicroBatchStream, FrameTokenSource, SerializableHadoopConf}
import graft.queries.DecodePack
import org.scalatest.funsuite.AnyFunSuite

/** Connection-policy layer (S5/ST3/ST4): rate limiting, retry-backoff,
  * header rotation, proxy override, session cache — reference semantics
  * pinned against scraper.py:44-246 and cloudflare_bypass.py:15-170,
  * driven by fake clocks/RNG so every branch is deterministic.
  */
class ConnectivitySpec extends AnyFunSuite {

  // ------------------------------------------------------- ST3 pacing

  test("RateLimiter: 4 req/s → 0.25 s min interval (scraper.py:74-76, 147-153)") {
    val l0 = RateLimiter.perSecond(4.0)
    assert(l0.minIntervalSec == 0.25)

    // first request at t=10: no wait; fires at 10
    val (w1, l1) = l0.admit(10.0)
    assert(w1 == 0.0 && l1.lastRequestSec == 10.0)
    // immediate second request: waits the full remainder
    val (w2, l2) = l1.admit(10.1)
    assert(math.abs(w2 - 0.15) < 1e-12)
    assert(math.abs(l2.lastRequestSec - 10.25) < 1e-12)
    // after a long gap: no wait
    val (w3, _) = l2.admit(20.0)
    assert(w3 == 0.0)
  }

  // ------------------------------------------------------ ST4 backoff

  test("backoffDelay: base·2^min(r,8) with ±25% jitter (scraper.py:155-160)") {
    // u = 0.5 → zero jitter → exact exponential ladder
    assert(backoffDelay(1.0, 0, 0.5) == 1.0)
    assert(backoffDelay(1.0, 1, 0.5) == 2.0)
    assert(backoffDelay(1.0, 3, 0.5) == 8.0)
    assert(backoffDelay(2.0, 2, 0.5) == 8.0)
    // exponent caps at 8: retry 10 == retry 8 == 256·base
    assert(backoffDelay(1.0, 10, 0.5) == 256.0)
    assert(backoffDelay(1.0, 8, 0.5) == 256.0)
    // jitter bounds: u=0 → −25%, u→1 → +25%
    assert(backoffDelay(1.0, 0, 0.0) == 0.75)
    assert(math.abs(backoffDelay(1.0, 0, 1.0) - 1.25) < 1e-12)
  }

  test("connectWithRetry: failure trace, post-failure exponent, success reset (scraper.py:177-246)") {
    // start well past 0: a cold limiter's lastRequest=0.0 means "long ago",
    // matching the reference's epoch wall clock (scraper.py:74-75)
    var now = 1000.0
    val clock = () => now
    val sleep = (s: Double) => now += s
    val uniform = () => 0.5 // pin jitter to zero

    // fails twice, succeeds on the third attempt
    val (res, trace, lim) = connectWithRetry(
      RateLimiter.perSecond(4.0), maxRetries = 5, backoffBase = 1.0,
      clock, uniform, sleep)(i => if (i < 2) None else Some(s"ok$i"))

    assert(res.contains("ok2"))
    assert(trace.map(_.attempt) == Vector(0, 1, 2))
    // backoff exponent is the failure count so far: 2^1, 2^2, then success
    assert(trace.map(_.backoffWaitSec) == Vector(2.0, 4.0, 0.0))
    // attempt 0 fires with a cold limiter (no wait); later attempts fall
    // beyond the min interval because backoff sleeps dominate it
    assert(trace.head.rateWaitSec == 0.0)
    assert(trace.forall(_.rateWaitSec == 0.0))
    assert(lim.lastRequestSec == 1006.0) // 1000 + the 2 s and 4 s backoffs

    // exhaustion: maxRetries failures → None; no backoff after the last
    val (res2, trace2, _) = connectWithRetry(
      RateLimiter.perSecond(1000.0), maxRetries = 3, backoffBase = 1.0,
      clock, uniform, sleep)(_ => None)
    assert(res2.isEmpty)
    assert(trace2.size == 3)
    assert(trace2.last.backoffWaitSec == 0.0)
    assert(trace2.init.map(_.backoffWaitSec) == Vector(2.0, 4.0))
  }

  test("connectWithRetry: rate limiter paces back-to-back successful cycles") {
    var now = 100.0
    val clock = () => now
    val sleep = (s: Double) => now += s
    val lim0 = RateLimiter.perSecond(4.0)

    val (_, t1, lim1) = connectWithRetry(lim0, 5, 1.0, clock, () => 0.5, sleep)(_ => Some(1))
    val (_, t2, _) = connectWithRetry(lim1, 5, 1.0, clock, () => 0.5, sleep)(_ => Some(2))
    assert(t1.head.rateWaitSec == 0.0)
    // second cycle fires immediately after the first → waits the interval
    assert(math.abs(t2.head.rateWaitSec - 0.25) < 1e-12)
  }

  // -------------------------------------------------- S5 headers/proxy

  test("rotatedHeaders: UA cycles mac→win→linux, fixed header set (scraper.py:126-146)") {
    val (h0, r1) = rotatedHeaders(0)
    val (h1, r2) = rotatedHeaders(r1)
    val (h2, r3) = rotatedHeaders(r2)
    val (h3, _) = rotatedHeaders(r3)
    assert(h0("User-Agent").contains("Macintosh"))
    assert(h1("User-Agent").contains("Windows NT"))
    assert(h2("User-Agent").contains("X11; Linux"))
    assert(h3 == h0) // wraps around

    assert(h0("Accept") == "*/*")
    assert(h0("Accept-Language") == "en-GB,en;q=0.5")
    assert(h0("Accept-Encoding") == "gzip, deflate, br, zstd")
    assert(h0("Pragma") == "no-cache")
    assert(h0("Cache-Control") == "no-cache")
    assert(h0("Origin") == "https://dexscreener.com")
    assert(h0("Sec-WebSocket-Version") == "13")
    assert(h0.size == 8)

    // Origin travels as the dedicated connect arg (scraper.py:205-207)
    assert(!connectHeaders(h0).contains("Origin"))
    assert(connectHeaders(h0).size == 7)
  }

  test("proxyOverride resolution (scraper.py:162-175)") {
    assert(proxyOverride(None) == UseDefault)
    for (w <- Seq("", "  ", "0", "false", "NONE", "off", "Disable"))
      assert(proxyOverride(Some(w)) == ProxyDisabled, s"'$w'")
    assert(proxyOverride(Some("auto")) == UseDefault)
    assert(proxyOverride(Some("DEFAULT")) == UseDefault)
    assert(proxyOverride(Some(" http://proxy:8080 ")) == ProxyVia("http://proxy:8080"))
  }

  // ------------------------------------------------- S5 session cache

  test("sessionCookies: TTL cache, 403-refresh-retry, v3 rotation (cloudflare_bypass.py:89-138)") {
    val cookies = Map("cf_clearance" -> "tok")

    // within TTL: cached, no fetch
    val fresh = SessionState(cookies, lastUpdateSec = 100.0)
    val (c1, s1) = sessionCookies(fresh, supportsV3 = false, nowSec = 100.0 + 299.0,
      fetch = _ => fail("must not fetch inside TTL"))
    assert(c1 == cookies && s1 == fresh)
    // v3 TTL is tighter: 180 vs 300 (cloudflare_bypass.py:26)
    assert(sessionTtlSec(supportsV3 = true) == 180.0)
    assert(sessionTtlSec(supportsV3 = false) == 300.0)

    // cold start + 200: stored with the fetch time
    val (c2, s2) = sessionCookies(SessionState(), supportsV3 = false, nowSec = 50.0,
      fetch = _ => Some((200, cookies)))
    assert(c2 == cookies && s2.lastUpdateSec == 50.0 && s2.generation == 0)

    // 403 → refresh (generation bump) → retry once → 200 stores
    var fetched = Vector.empty[Int]
    val (c3, s3) = sessionCookies(SessionState(), supportsV3 = false, nowSec = 60.0,
      fetch = g => { fetched :+= g; if (g == 0) Some((403, Map.empty)) else Some((200, cookies)) })
    assert(fetched == Vector(0, 1))
    assert(c3 == cookies && s3.generation == 1)

    // both attempts fail (incl. transport error) → no cookies, rotated
    val (c4, s4) = sessionCookies(SessionState(), supportsV3 = false, nowSec = 70.0,
      fetch = g => if (g == 0) None else Some((503, Map.empty)))
    assert(c4.isEmpty && s4.generation == 1)

    // v3 + stale-but-present jar: refresh BEFORE fetching (:96-97)
    var gens = Vector.empty[Int]
    val stale = SessionState(cookies, lastUpdateSec = 0.0, generation = 3)
    val (c5, s5) = sessionCookies(stale, supportsV3 = true, nowSec = 10_000.0,
      fetch = g => { gens :+= g; Some((200, cookies)) })
    assert(gens == Vector(4) && c5 == cookies && s5.generation == 4)

    assert(cookieHeader(Map("b" -> "2", "a" -> "1")) == "a=1; b=2")
  }

  // ----------------------------------------------------------- wiring

  test("governor wired into the micro-batch stream; options parse with reference defaults") {
    assert(ConnectivityConf.Defaults == ConnectivityConf(4.0, 5, 1.0))
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("rateLimit", "100", "maxRetries", "2", "backoffBase", "0.5"))
    assert(ConnectivityConf.fromOptions(opts) == ConnectivityConf(100.0, 2, 0.5))

    val dir = java.nio.file.Files.createTempDirectory("graft_conn").toString
    (0 until 3).foreach(c =>
      FrameTokenSource.writeFrameFile(dir, c.toLong, 1700000000L, DecodePack.deepFrame(c.toLong)))
    val stream = new FrameTokenMicroBatchStream(dir, partitions = 2,
      FrameTokenSource.DefaultMaxSplitBytes,
      new SerializableHadoopConf(new org.apache.hadoop.conf.Configuration()),
      FrameTokenSource.fullSchema, Array.empty, None, ConnectivityConf(1000.0, 3, 0.001))
    assert(stream.latestOffset().json() == """{"files":3}""")

    // Trigger.AvailableNow pins the end offset at prepare time: files
    // arriving after it belong to the NEXT run, so a backfill is exact
    stream.prepareForTriggerAvailableNow()
    (3 until 5).foreach(c =>
      FrameTokenSource.writeFrameFile(dir, c.toLong, 1700000000L, DecodePack.deepFrame(c.toLong)))
    assert(stream.latestOffset(stream.initialOffset(),
      stream.getDefaultReadLimit).json() == """{"files":3}""")
    assert(stream.reportLatestOffset().json() == """{"files":5}""")

    // flow control: maxFilesPerTrigger bounds each batch's admission,
    // composing with the AvailableNow cap (2 admitted of the pinned 3)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    assert(stream.latestOffset(stream.initialOffset(),
      ReadLimit.maxFiles(2)).json() == """{"files":2}""")
    val conf = ConnectivityConf.fromOptions(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("maxFilesPerTrigger", "7")))
    assert(conf.maxFilesPerTrigger.contains(7))
  }

  test("ConnectionGovernor: per-instance state, headers rotate across connects") {
    var slept = Vector.empty[Double]
    val gov = new Connectivity.ConnectionGovernor(
      rateLimit = 4.0, maxRetries = 3, backoffBase = 1.0,
      clock = () => 0.0, uniform01 = () => 0.5, sleep = s => slept :+= s)

    assert(gov.nextHeaders()("User-Agent").contains("Macintosh"))
    assert(gov.nextHeaders()("User-Agent").contains("Windows NT"))

    var calls = 0
    val res = gov.connect { _ => calls += 1; if (calls < 2) None else Some(42) }
    assert(res.contains(42) && calls == 2)
    assert(gov.trace.map(_.backoffWaitSec) == Vector(2.0, 0.0))
    assert(slept.contains(2.0))

    // a second governor starts cold — nothing shared
    val gov2 = new Connectivity.ConnectionGovernor()
    assert(gov2.trace.isEmpty)
    assert(gov2.nextHeaders()("User-Agent").contains("Macintosh"))
  }
}
