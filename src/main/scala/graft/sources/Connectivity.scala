package graft.sources

/** Connection-policy layer for the frame source (SURVEY §2.1 S5, §2.10
  * ST3/ST4): rate limiting, exponential retry-backoff, header rotation,
  * proxy override, and the TTL'd anti-bot session cache.
  *
  * The reference implements these inline in its asyncio connect loop
  * (scraper.py:74-246, cloudflare_bypass.py:15-170) with wall-clock and
  * RNG calls scattered through. Here every policy is a pure function of
  * (state, now, uniform01) → (decision, state′), so a 1000-executor
  * deployment can run one governor per connection without shared mutable
  * state, and every branch is deterministic under test. Real I/O (the
  * sleep, the site fetch) is injected by the caller.
  */
object Connectivity {

  // ---------------------------------------------------------------- ST3

  /** Min-interval request pacing (scraper.py:74-76, 147-153):
    * `rate_limit` requests/second → wait out the remainder of
    * `1/rate_limit` since the last request. `lastRequest` records the
    * time the request actually fires (after the wait), matching the
    * reference's post-sleep `time.time()`.
    */
  final case class RateLimiter(minIntervalSec: Double, lastRequestSec: Double = 0.0) {
    /** @return (seconds to sleep before firing, state after firing) */
    def admit(nowSec: Double): (Double, RateLimiter) = {
      val since = nowSec - lastRequestSec
      val wait = if (since < minIntervalSec) minIntervalSec - since else 0.0
      (wait, copy(lastRequestSec = nowSec + wait))
    }
  }

  object RateLimiter {
    /** Reference default: 4 req/s (scraper.py:45). */
    def perSecond(rateLimit: Double): RateLimiter = {
      require(rateLimit > 0, s"rateLimit must be positive: $rateLimit")
      RateLimiter(1.0 / rateLimit)
    }
  }

  // ---------------------------------------------------------------- ST4

  /** Exponential backoff with ±25% jitter (scraper.py:155-160):
    * `base · 2^min(retryCount, 8)`, jittered by `delay·0.25·(2u−1)` for
    * uniform u ∈ [0,1). u = 0.5 reproduces the un-jittered delay exactly.
    */
  def backoffDelay(backoffBase: Double, retryCount: Int, uniform01: Double): Double = {
    val delay = backoffBase * math.pow(2.0, math.min(retryCount, 8).toDouble)
    val jitter = delay * 0.25 * (2.0 * uniform01 - 1.0)
    delay + jitter
  }

  /** One observed wait in a connect trace: the rate-limit pause before
    * the attempt, and the backoff pause after it failed (0 when it
    * succeeded or was the last attempt — scraper.py:243-246 only sleeps
    * when retries remain).
    */
  final case class AttemptTrace(attempt: Int, rateWaitSec: Double, backoffWaitSec: Double)

  /** The reference's connect loop (scraper.py:177-246): up to
    * `maxRetries` attempts, each preceded by the rate limiter, each
    * failure followed by a jittered backoff whose exponent is the number
    * of failures so far; success resets the retry count (scraper.py:235).
    *
    * `attempt` receives the 0-based attempt index; `sleep`/`clock`/
    * `uniform01` are injected so tests drive a fake clock and a pinned
    * RNG. Returns the result (None = all attempts failed), the full wait
    * trace, and the limiter state for the next cycle.
    */
  def connectWithRetry[A](
      limiter: RateLimiter,
      maxRetries: Int,
      backoffBase: Double,
      clock: () => Double,
      uniform01: () => Double,
      sleep: Double => Unit)(attempt: Int => Option[A]): (Option[A], Vector[AttemptTrace], RateLimiter) = {
    var lim = limiter
    val trace = Vector.newBuilder[AttemptTrace]
    var i = 0
    while (i < maxRetries) {
      val (rateWait, lim2) = lim.admit(clock())
      lim = lim2
      if (rateWait > 0) sleep(rateWait)
      attempt(i) match {
        case Some(a) =>
          trace += AttemptTrace(i, rateWait, 0.0)
          return (Some(a), trace.result(), lim)
        case None =>
          val retryCount = i + 1
          val backoff =
            if (i < maxRetries - 1) backoffDelay(backoffBase, retryCount, uniform01())
            else 0.0
          trace += AttemptTrace(i, rateWait, backoff)
          if (backoff > 0) sleep(backoff)
      }
      i += 1
    }
    (None, trace.result(), lim)
  }

  // ----------------------------------------------------------------- S5

  /** The three rotated user agents (scraper.py:128-132). */
  val UserAgents: Vector[String] = Vector(
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:142.0) Gecko/20100101 Firefox/142.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:142.0) Gecko/20100101 Firefox/142.0",
    "Mozilla/5.0 (X11; Linux x86_64; rv:142.0) Gecko/20100101 Firefox/142.0")

  /** Rotated header set (scraper.py:126-146): the UA cycles through
    * [[UserAgents]] by an ever-incrementing counter; everything else is
    * fixed. Returns the headers and the advanced counter.
    */
  def rotatedHeaders(rotation: Int): (Map[String, String], Int) = {
    val ua = UserAgents(math.floorMod(rotation, UserAgents.length))
    val headers = Map(
      "User-Agent" -> ua,
      "Accept" -> "*/*",
      "Accept-Language" -> "en-GB,en;q=0.5",
      "Accept-Encoding" -> "gzip, deflate, br, zstd",
      "Pragma" -> "no-cache",
      "Cache-Control" -> "no-cache",
      "Origin" -> "https://dexscreener.com",
      "Sec-WebSocket-Version" -> "13")
    (headers, rotation + 1)
  }

  /** Origin travels as the dedicated connect argument, never a raw
    * header, to avoid duplication (scraper.py:205-207).
    */
  def connectHeaders(headers: Map[String, String]): Map[String, String] =
    headers - "Origin"

  /** Proxy override resolution (scraper.py:162-175): unset → default
    * routing; empty/0/false/none/off/disable → proxy explicitly off;
    * auto/default → default routing; anything else is a proxy URL.
    */
  sealed trait ProxyOverride
  case object UseDefault extends ProxyOverride
  case object ProxyDisabled extends ProxyOverride
  final case class ProxyVia(url: String) extends ProxyOverride

  private val DisableWords = Set("0", "false", "none", "off", "disable")

  def proxyOverride(raw: Option[String]): ProxyOverride = raw match {
    case None => UseDefault
    case Some(rawValue) =>
      val value = rawValue.trim
      if (value.isEmpty || DisableWords.contains(value.toLowerCase)) ProxyDisabled
      else if (value.toLowerCase == "auto" || value.toLowerCase == "default") UseDefault
      else ProxyVia(value)
  }

  /** Anti-bot session cookie cache (cloudflare_bypass.py:15-139).
    *
    * `generation` counts session refreshes — each refresh discards the
    * cookie jar and rotates to a fresh underlying session
    * (`_refresh_session`, cloudflare_bypass.py:66-76); the injected
    * `fetch` receives it so tests (and a real connector) can vary
    * behavior per fresh session.
    */
  final case class SessionState(
      cookies: Map[String, String] = Map.empty,
      lastUpdateSec: Double = 0.0,
      generation: Int = 0)

  /** TTL per cloudscraper capability: 180 s on v3+, 300 s legacy
    * (cloudflare_bypass.py:26).
    */
  def sessionTtlSec(supportsV3: Boolean): Double = if (supportsV3) 180.0 else 300.0

  /** Cookie acquisition (cloudflare_bypass.py:89-138): cached cookies
    * within TTL are returned as-is; on v3 a stale-but-present jar is
    * refreshed before fetching; a 200 stores the fetched cookies; any
    * other status (or fetch failure) refreshes the session and retries
    * exactly once; a second failure yields no cookies (the connect then
    * proceeds cookie-less, as the reference does).
    *
    * @param fetch generation → Some((httpStatus, cookies)) or None on error
    */
  def sessionCookies(
      state: SessionState,
      supportsV3: Boolean,
      nowSec: Double,
      fetch: Int => Option[(Int, Map[String, String])]): (Map[String, String], SessionState) = {
    val ttl = sessionTtlSec(supportsV3)
    if (state.cookies.nonEmpty && nowSec - state.lastUpdateSec < ttl)
      return (state.cookies, state)

    val start =
      if (supportsV3 && state.cookies.nonEmpty)
        SessionState(Map.empty, 0.0, state.generation + 1)
      else state

    def store(cookies: Map[String, String], s: SessionState) =
      (cookies, s.copy(cookies = cookies, lastUpdateSec = nowSec))
    def refresh(s: SessionState) = SessionState(Map.empty, 0.0, s.generation + 1)

    fetch(start.generation) match {
      case Some((200, cookies)) => store(cookies, start)
      case _ =>
        val fresh = refresh(start)
        fetch(fresh.generation) match {
          case Some((200, cookies)) => store(cookies, fresh)
          case _ => (Map.empty, fresh)
        }
    }
  }

  /** Cookie header + session UA for the WebSocket connect
    * (cloudflare_bypass.py:154-170).
    */
  def cookieHeader(cookies: Map[String, String]): String =
    cookies.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("; ")

  /** Mutable binding of the pure [[sessionCookies]] flow for a live
    * connector: one instance per ingest process owns the TTL'd jar and
    * the generation counter. `invalidate()` is the anti-bot feedback
    * edge — a 403 on the WebSocket UPGRADE (not just on the cookie
    * fetch) discards the jar and rotates the generation, so the next
    * governed attempt re-fetches under a fresh session, mirroring
    * `_refresh_session` (cloudflare_bypass.py:66-76).
    *
    * @param fetch generation → Some((httpStatus, cookies)) or None —
    *              the injected site GET (tests pin it; a deployment
    *              wires its HTTP client)
    */
  final class CookieSession(
      fetch: Int => Option[(Int, Map[String, String])],
      supportsV3: Boolean = true,
      clock: () => Double = () => System.nanoTime() / 1e9) {
    private var state = SessionState()

    /** Current jar, fetching/refreshing under the TTL policy. */
    def cookies(): Map[String, String] = synchronized {
      val (c, s2) = sessionCookies(state, supportsV3, clock(), fetch)
      state = s2
      c
    }

    /** Discard the jar and rotate the session (upgrade-403 feedback). */
    def invalidate(): Unit = synchronized {
      state = SessionState(Map.empty, 0.0, state.generation + 1)
    }

    def generation: Int = synchronized(state.generation)
  }

  // ------------------------------------------------------------ wiring

  /** Per-connection governor: owns the limiter + rotation counter and
    * paces an arbitrary poll through the full policy stack. One instance
    * per stream (never shared — the round-2 verdict's lesson about
    * process-wide mutable singletons), used by the micro-batch stream to
    * pace its listing polls the way the reference paces its socket
    * connects. Defaults are the reference's (scraper.py:44-47).
    */
  final class ConnectionGovernor(
      rateLimit: Double = 4.0,
      val maxRetries: Int = 5,
      val backoffBase: Double = 1.0,
      clock: () => Double = () => System.nanoTime() / 1e9,
      uniform01: () => Double = () => scala.util.Random.nextDouble(),
      sleep: Double => Unit = s => Thread.sleep(math.max(0L, (s * 1000).toLong))) {

    private var limiter = RateLimiter.perSecond(rateLimit)
    private var rotation = 0
    private var lastTrace: Vector[AttemptTrace] = Vector.empty

    /** Headers for the next attempt (advances the rotation). */
    def nextHeaders(): Map[String, String] = synchronized {
      val (h, r) = rotatedHeaders(rotation)
      rotation = r
      h
    }

    /** Run `attempt` under rate limiting + retry-backoff; None after
      * `maxRetries` failures.
      */
    def connect[A](attempt: Int => Option[A]): Option[A] = synchronized {
      val (res, trace, lim) =
        connectWithRetry(limiter, maxRetries, backoffBase, clock, uniform01, sleep)(attempt)
      limiter = lim
      lastTrace = trace
      res
    }

    /** Wait trace of the last [[connect]] (observability + tests). */
    def trace: Vector[AttemptTrace] = synchronized(lastTrace)
  }
}
