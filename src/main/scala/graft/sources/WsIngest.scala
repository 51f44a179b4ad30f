package graft.sources

import java.net.Socket

/** Live WebSocket ingest boundary — binds the PURE connection policy
  * ([[Connectivity]]: UA rotation, rate limiting, retry backoff, proxy
  * override, TTL'd anti-bot cookie session) to real socket I/O
  * ([[WsDial]]: direct / CONNECT-tunneled / TLS transport) and spools
  * received binary frames into splittable `.binpack` v3 containers
  * that [[FrameTokenSource]] serves as an ordinary (batch or
  * streaming) DataSource.
  *
  * This is the one deliberately NON-distributed component: a socket
  * feed is not replayable, so the 100 TB shape is ingest-once →
  * durable spool → distributed everything-after. One light ingest
  * process (or a few, sharded by endpoint) lands frames in object
  * storage; executors never hold socket state. The spool is the
  * replay boundary — exactly why [[FrameTokenSource]] reads containers
  * rather than sockets.
  *
  * Reference mapping (scraper.py:183-273): the verifying ALPN-http/1.1
  * SSL context and proxy kwarg live in [[WsDial]]; cookie jar +
  * session UA attach to the upgrade request (cloudflare_bypass.py:
  * 154-170), and a rejected upgrade refreshes the session before the
  * governed retry; connect kwargs → the upgrade request's header lines
  * (rotated UA set, Origin — emitted once from the rotated map, the
  * dedup `connectHeaders` exists for; our client writes headers
  * verbatim so nothing is restricted or rewritten); "first recv is the
  * handshake message" → the first TEXT message is consumed and not
  * spooled; ping → pong keep-alive; server close → clean shutdown.
  */
final class WsIngest(
    host: String,
    port: Int,
    path: String,
    spoolDir: String,
    governor: Connectivity.ConnectionGovernor,
    framesPerPack: Int = 64,
    connectTimeoutMs: Int = 5000,
    clock: () => Long = () => System.currentTimeMillis(),
    key16: () => Array[Byte] = WsIngest.randomBytes(16),
    mask4: () => Array[Byte] = WsIngest.randomBytes(4),
    tls: Boolean = false,
    proxy: Connectivity.ProxyOverride = Connectivity.UseDefault,
    cookies: Option[Connectivity.CookieSession] = None,
    sslContext: Option[javax.net.ssl.SSLContext] = None) {

  // abort() support: the active socket is published so a controller
  // thread can unblock the reader; `aborted` short-circuits retries
  @volatile private var active: Socket = null
  @volatile private var aborted = false

  /** Stop an in-flight [[run]] from another thread: closing the active
    * socket unblocks the blocking read; the aborted flag stops the
    * governor from dialing again. The interrupted run still flushes
    * everything received to the spool (its finally owns that).
    */
  def abort(): Unit = {
    aborted = true
    val s = active
    if (s != null) { try s.close() catch { case _: Throwable => () } }
  }

  /** True once [[abort]] was called (the CLI's stop handle asks). */
  def isAborted: Boolean = aborted

  /** Connect under the governor's policy and drain the feed into the
    * spool. Returns (frames spooled, packs written). Stops at
    * `maxFrames` binary frames, the server's close, or [[abort]],
    * whichever first.
    */
  def run(startFrameId: Long = 0L, maxFrames: Long = Long.MaxValue): (Long, Int) = {
    // register on the spool (and refuse a spool mid-compaction): the
    // compactor must never rewrite the listing under a live appender
    val hconf = new org.apache.hadoop.conf.Configuration()
    val marker = SpoolLocks.acquireReader(spoolDir, "ingest", hconf)
    try runMarked(startFrameId, maxFrames)
    finally SpoolLocks.release(marker, hconf)
  }

  private def runMarked(startFrameId: Long, maxFrames: Long): (Long, Int) = {
    val conn = governor.connect { _ =>
      // rotation advances per ATTEMPT, like the reference's
      // per-connect header refresh (scraper.py:126-146)
      val base = governor.nextHeaders() - "Sec-WebSocket-Version"
      // cookie jar rides the upgrade request (cloudflare_bypass.py:154-170)
      val jar = cookies.map(_.cookies()).getOrElse(Map.empty)
      val headers =
        (if (jar.nonEmpty) base + ("Cookie" -> Connectivity.cookieHeader(jar))
         else base).toSeq
      // short-circuit the retry loop on abort: throwing here exits
      // governor.connect immediately instead of sleeping out the
      // remaining backoff schedule against a feed nobody wants
      if (aborted) throw new IllegalStateException("ingest aborted")
      else
        try {
          val s = WsDial.open(WsDial.Endpoint(host, port, tls), proxy,
            connectTimeoutMs, sslContext)
          active = s
          try {
            val in = new java.io.BufferedInputStream(s.getInputStream)
            val out = new java.io.BufferedOutputStream(s.getOutputStream)
            // offer permessage-deflate like the reference's `websockets`
            // client does on every connect (RFC 7692); the response
            // decides whether this connection inflates
            val respHeaders = Rfc6455.clientHandshake(
              in, out, s"$host:$port", path, headers, key16(), offerDeflate = true)
            Some((s, in, out, Rfc6455.negotiatedInflater(respHeaders)))
          } catch {
            case Rfc6455.HandshakeRejected(status, _) =>
              // anti-bot rejection: refresh the cookie session so the
              // next governed attempt runs under a fresh jar
              // (cloudflare_bypass.py:109-127's 403 branch)
              if (status.contains("403")) cookies.foreach(_.invalidate())
              s.close(); None
            case scala.util.control.NonFatal(_) => s.close(); None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
    }
    val (sock, in, out, inflater) = conn.getOrElse(throw new IllegalStateException(
      if (aborted) "ingest aborted"
      else s"connect failed after ${governor.maxRetries} retries; trace=${governor.trace}"))
    try drain(in, out, startFrameId, maxFrames, inflater)
    finally { active = null; sock.close() }
  }

  private def drain(in: java.io.InputStream, out: java.io.OutputStream,
      startFrameId: Long, maxFrames: Long,
      inflater: Option[Rfc6455.PmdInflater]): (Long, Int) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte])]
    var frameId = startFrameId
    var packs = 0
    var sawHello = false
    def flush(): Unit = if (buf.nonEmpty) {
      FrameTokenSource.writeFramePack(spoolDir,
        f"pack_${startFrameId}%012d_$packs%06d", buf.iterator)
      packs += 1
      buf.clear()
    }
    // pings answer inline (even mid-fragment, §5.5); pongs are ignored
    val onControl: (Int, Array[Byte]) => Unit = (op, p) =>
      if (op == Rfc6455.OpPing) Rfc6455.writeFrame(out, Rfc6455.OpPong, p, Some(mask4()))
    var open = true
    try {
      while (open && frameId - startFrameId < maxFrames) {
        // an abnormal disconnect (RST, protocol garbage) is the same as
        // EOF here: the feed is non-replayable, so everything received
        // MUST still reach the spool — the finally below flushes
        val msg =
          try Rfc6455.readMessage(in, onControl, inflater)
          catch { case scala.util.control.NonFatal(_) => None }
        msg match {
          case None => open = false // EOF/drop without close: spool what we have
          case Some((Rfc6455.OpClose, p)) =>
            // close-ack then stop (RFC 6455 §5.5.1)
            try Rfc6455.writeFrame(out, Rfc6455.OpClose, p, Some(mask4()))
            catch { case scala.util.control.NonFatal(_) => () }
            open = false
          case Some((Rfc6455.OpText, _)) if !sawHello =>
            sawHello = true // first recv = handshake message (scraper.py:257-263)
          case Some((Rfc6455.OpText, _)) => () // non-binary chatter: ignored
          case Some((Rfc6455.OpBinary, p)) =>
            buf += ((frameId, clock(), p))
            frameId += 1
            if (buf.size >= framesPerPack) flush()
          case Some((_, _)) => () // unknown opcode: skip
        }
      }
    } finally flush()
    (frameId - startFrameId, packs)
  }
}

object WsIngest {
  private def randomBytes(n: Int): () => Array[Byte] = () => {
    val b = new Array[Byte](n)
    new java.security.SecureRandom().nextBytes(b)
    b
  }
}
