package graft

import graft.queries.DecodePack
import graft.sources.{Connectivity, FrameTokenSource, Rfc6455, WsIngest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live-ingest boundary, end to end over a real loopback socket: an
  * in-process RFC 6455 server (handshake + text hello + binary frames
  * + close) feeds [[WsIngest]], which spools `.binpack` v3 containers
  * that the `graft-tokens` source must read IDENTICALLY to a
  * directly-written pack of the same payloads. Connection policy
  * (retry on refused attempt, UA rotation across attempts, rate-limit
  * trace) is asserted against what the server actually received —
  * the zero-egress proof that the pure Connectivity components bind
  * to real I/O.
  */
class WsIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fixedKey16 = () => Array.tabulate[Byte](16)(i => (i + 1).toByte)
  private val fixedMask4 = () => Array[Byte](7, 11, 13, 17)

  /** Serve one WebSocket session on loopback: optionally kill the
    * first `rejects` TCP connections before the handshake (retry
    * path), then handshake, send a text hello, the payload frames,
    * a close. Returns (port, request-headers-per-connection).
    */
  private def serve(payloads: Seq[Array[Byte]], rejects: Int = 0):
      (Int, java.util.concurrent.BlockingQueue[Map[String, String]]) = {
    val srv = new java.net.ServerSocket(0, 2,
      java.net.InetAddress.getLoopbackAddress)
    val seen = new java.util.concurrent.LinkedBlockingQueue[Map[String, String]]()
    val t = new Thread(() => {
      try {
        var remainingRejects = rejects
        var served = false
        while (!served) {
          val c = srv.accept()
          if (remainingRejects > 0) { remainingRejects -= 1; c.close() }
          else {
            val in = new java.io.BufferedInputStream(c.getInputStream)
            val out = new java.io.BufferedOutputStream(c.getOutputStream)
            seen.put(Rfc6455.serverHandshake(in, out))
            Rfc6455.writeFrame(out, Rfc6455.OpText,
              """{"type":"handshake"}""".getBytes("UTF-8"))
            Rfc6455.writeFrame(out, Rfc6455.OpPing, Array[Byte](1, 2))
            payloads.foreach(p => Rfc6455.writeFrame(out, Rfc6455.OpBinary, p))
            Rfc6455.writeFrame(out, Rfc6455.OpClose, Array.empty)
            // drain the client's pong + close-ack, then done
            Rfc6455.readMessage(in); Rfc6455.readMessage(in)
            c.close()
            served = true
          }
        }
      } catch { case _: Throwable => () } finally srv.close()
    })
    t.setDaemon(true); t.start()
    (srv.getLocalPort, seen)
  }

  private def governor(rate: Double = 1000.0) = {
    var now = 0.0
    new Connectivity.ConnectionGovernor(rateLimit = rate, maxRetries = 3,
      backoffBase = 1.0, clock = () => { now += 0.25; now },
      uniform01 = () => 0.5, sleep = _ => ())
  }

  test("ws ingest → v3 spool → graft-tokens reads it identically to a written pack") {
    val payloads = (0L until 10L).map(DecodePack.deepFrame)
    val (port, seen) = serve(payloads)
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_spool").toString
    val gov = governor()
    val ws = new WsIngest("127.0.0.1", port, "/ws", spool, gov,
      framesPerPack = 4, clock = () => 777L,
      key16 = fixedKey16, mask4 = fixedMask4)
    val (n, packs) = ws.run(startFrameId = 0L)
    assert(n == 10L && packs == 3) // 4 + 4 + 2
    // policy on the wire: rotated UA + Origin reached the server
    val headers = seen.take()
    assert(headers("user-agent") == Connectivity.UserAgents(0))
    assert(headers("origin") == "https://dexscreener.com")
    assert(headers.contains("sec-websocket-key"))
    // the spool is byte-identical in decode to a directly-written pack
    val direct = java.nio.file.Files.createTempDirectory("graft_ws_direct").toString
    FrameTokenSource.writeFramePack(direct, "pack_000000",
      payloads.zipWithIndex.iterator.map { case (p, i) => (i.toLong, 777L, p) })
    val viaWs = spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    val viaWriter = spark.read.format("graft-tokens").load(direct)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    assert(viaWs.nonEmpty && viaWs == viaWriter)
  }

  test("permessage-deflate: deflating server → inflated spool ≡ written pack (RFC 7692)") {
    val payloads = (0L until 8L).map(DecodePack.deepFrame)
    // deflating loopback server: accepts the client's offer WITH
    // server_no_context_takeover, compresses every data frame (RSV1)
    val srv = new java.net.ServerSocket(0, 2,
      java.net.InetAddress.getLoopbackAddress)
    val seen = new java.util.concurrent.LinkedBlockingQueue[Map[String, String]]()
    val t = new Thread(() => {
      try {
        val c = srv.accept()
        val in = new java.io.BufferedInputStream(c.getInputStream)
        val out = new java.io.BufferedOutputStream(c.getOutputStream)
        seen.put(Rfc6455.serverHandshake(in, out, extraResponseHeaders = Seq(
          "Sec-WebSocket-Extensions" ->
            "permessage-deflate; server_no_context_takeover")))
        val defl = new Rfc6455.PmdDeflater(noContextTakeover = true)
        Rfc6455.writeFrame(out, Rfc6455.OpText,
          defl("""{"type":"handshake"}""".getBytes("UTF-8")), rsv1 = true)
        payloads.foreach(p =>
          Rfc6455.writeFrame(out, Rfc6455.OpBinary, defl(p), rsv1 = true))
        Rfc6455.writeFrame(out, Rfc6455.OpClose, Array.empty)
        Rfc6455.readMessage(in)
        c.close()
      } catch { case _: Throwable => () } finally srv.close()
    })
    t.setDaemon(true); t.start()

    val spool = java.nio.file.Files.createTempDirectory("graft_ws_pmd").toString
    val ws = new WsIngest("127.0.0.1", srv.getLocalPort, "/ws", spool, governor(),
      framesPerPack = 4, clock = () => 777L,
      key16 = fixedKey16, mask4 = fixedMask4)
    val (n, _) = ws.run(startFrameId = 0L)
    assert(n == 8L)
    // the client's offer reached the server
    assert(seen.take()("sec-websocket-extensions") == Rfc6455.DeflateOffer)
    // the spool holds the INFLATED original bytes — identical decode to
    // a directly-written pack of the uncompressed payloads
    val direct = java.nio.file.Files.createTempDirectory("graft_ws_pmd_direct").toString
    FrameTokenSource.writeFramePack(direct, "pack_000000",
      payloads.zipWithIndex.iterator.map { case (p, i) => (i.toLong, 777L, p) })
    val viaWs = spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    val viaWriter = spark.read.format("graft-tokens").load(direct)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    assert(viaWs.nonEmpty && viaWs == viaWriter)
  }

  test("permessage-deflate codec: context takeover, reset semantics, negotiation parse") {
    // context takeover: the second message's back-references reach into
    // the first message's window — only a SHARED inflater context decodes
    // the stream (a fresh-per-message one must fail or mis-decode)
    val m1 = ("the quick brown fox " * 20).getBytes("UTF-8")
    val m2 = ("the quick brown fox jumps once more " * 10).getBytes("UTF-8")
    val defl = new Rfc6455.PmdDeflater(noContextTakeover = false)
    val c1 = defl(m1); val c2 = defl(m2)
    val inf = new Rfc6455.PmdInflater(Rfc6455.PmdParams(serverNoContextTakeover = false))
    assert(inf(c1).toSeq == m1.toSeq && inf(c2).toSeq == m2.toSeq)
    // no-context-takeover on both sides: every message self-contained
    val defl2 = new Rfc6455.PmdDeflater(noContextTakeover = true)
    val infFresh = new Rfc6455.PmdInflater(Rfc6455.PmdParams(serverNoContextTakeover = true))
    assert(infFresh(defl2(m1)).toSeq == m1.toSeq)
    assert(infFresh(defl2(m2)).toSeq == m2.toSeq)
    // negotiation response parsing (RFC 7692 §7.1)
    assert(Rfc6455.parseDeflateResponse("permessage-deflate")
      .contains(Rfc6455.PmdParams(false)))
    assert(Rfc6455.parseDeflateResponse(
      "permessage-deflate; server_no_context_takeover; server_max_window_bits=12")
      .contains(Rfc6455.PmdParams(true)))
    assert(Rfc6455.parseDeflateResponse("permessage-deflate; server_max_window_bits=99").isEmpty)
    assert(Rfc6455.parseDeflateResponse("x-webkit-deflate-frame").isEmpty)
    assert(Rfc6455.parseDeflateResponse("permessage-deflate, foo").isEmpty)
    // RSV1 without negotiation fails loudly instead of surfacing garbage
    val raw = new java.io.ByteArrayOutputStream()
    Rfc6455.writeFrame(raw, Rfc6455.OpBinary, defl2(m1), rsv1 = true)
    val ex = intercept[IllegalStateException] {
      Rfc6455.readMessage(new java.io.ByteArrayInputStream(raw.toByteArray))
    }
    assert(ex.getMessage.contains("RSV1"))
  }

  test("refused connections retry under the governor with rotated headers") {
    val payloads = Seq(DecodePack.deepFrame(0L))
    val (port, seen) = serve(payloads, rejects = 2)
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_retry").toString
    val gov = governor()
    val ws = new WsIngest("127.0.0.1", port, "/ws", spool, gov,
      key16 = fixedKey16, mask4 = fixedMask4)
    val (n, _) = ws.run()
    assert(n == 1L)
    // three attempts: two rejected + one success; backoff trace recorded
    assert(gov.trace.length == 3)
    assert(gov.trace.last.attempt == 2)
    // the successful (third) attempt carries the third rotated UA
    assert(seen.take()("user-agent") == Connectivity.UserAgents(2))
  }

  test("a dropped feed resumes into the same spool; streaming read sees both sessions") {
    val first = (0L until 3L).map(DecodePack.deepFrame)
    val second = (3L until 7L).map(DecodePack.deepFrame)
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_resume").toString
    val gov = governor()
    // session 1 drops (EOF, no close frame) after 3 frames — spool keeps them
    val (p1, _) = serve(first)
    val ws1 = new WsIngest("127.0.0.1", p1, "/ws", spool, gov, framesPerPack = 2,
      clock = () => 777L, key16 = fixedKey16, mask4 = fixedMask4)
    val (n1, _) = ws1.run(startFrameId = 0L)
    assert(n1 == 3L)
    // session 2 resumes with the continuation frame id — pack names and
    // frame ids never collide with session 1's
    val (p2, _) = serve(second)
    val ws2 = new WsIngest("127.0.0.1", p2, "/ws", spool, gov, framesPerPack = 2,
      clock = () => 777L, key16 = fixedKey16, mask4 = fixedMask4)
    val (n2, _) = ws2.run(startFrameId = n1)
    assert(n2 == 4L)
    // batch and AvailableNow streaming reads both see all 7 frames
    val batchIds = spark.read.format("graft-tokens").load(spool)
      .select(col("frame_id")).distinct().collect().map(_.getLong(0)).sorted
    assert(batchIds.toSeq == (0L until 7L))
    val outDir = java.nio.file.Files.createTempDirectory("graft_ws_stream").toString
    val q = spark.readStream.format("graft-tokens").load(spool)
      .writeStream.format("parquet")
      .option("path", s"$outDir/data").option("checkpointLocation", s"$outDir/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(s"$outDir/data")
      .select(col("frame_id")).distinct().collect().map(_.getLong(0)).sorted
    assert(streamed.toSeq == (0L until 7L))
  }

  test("cli --ws --once: live feed to batch output over a real socket") {
    val payloads = (0L until 5L).map(DecodePack.deepFrame)
    val (port, _) = serve(payloads)
    val outs = scala.collection.mutable.ArrayBuffer.empty[String]
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = graft.cli.Main.run(
      Seq("--ws", s"ws://127.0.0.1:$port/ws", "--once", "--limit", "2"),
      outs += _, errs += _, sparkOpt = Some(spark))
    assert(code == 0, s"errs=$errs")
    assert(outs.size == 1 &&
      outs.head.startsWith("""{"type":"enhanced_tokens","""))
    // engine-source rule intact: both or neither is an argv error
    assert(graft.cli.Main.run(Seq("--ws", "nonsense-url", "--once"),
      _ => (), errs += _, sparkOpt = Some(spark)) == 2)
    assert(graft.cli.Main.run(Seq("--once"),
      _ => (), errs += _, sparkOpt = Some(spark)) == 2)
  }

  test("cli --ws live mode: ingest thread + graft-tokens stream serve payloads") {
    val payloads = (0L until 5L).map(DecodePack.deepFrame)
    val (port, _) = serve(payloads)
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_cli_live").toString
    val args = graft.cli.Cli.parseArgs(Seq("--limit", "2")).toOption.get
    val outs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val handle = graft.cli.Main.startWsStream(spark, tls = false, "127.0.0.1",
      port, "/ws", spool, governor(), args, outs.add(_))
    try {
      // session 1 drains; the reconnect loop then exhausts its retries
      // against the closed server and the ingest thread retires
      handle.ingest.join(30000)
      assert(!handle.ingest.isAlive)
      handle.query.processAllAvailable()
      val seen = outs.toArray(Array.empty[String])
      assert(seen.nonEmpty && seen.exists(_.contains(""""type":"enhanced_tokens"""")))
    } finally { handle.query.stop(); handle.stop() }
  }

  test("the stop handle retires a live ingest loop against a still-open feed") {
    // a server that handshakes and then sits silent: without the stop
    // handle the reader blocks forever (the r6 gap — nothing ever set
    // the stopped flag); with it, the thread retires promptly and the
    // frames received before the stop are in the spool
    val srv = new java.net.ServerSocket(0, 2,
      java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        while (true) {
          val c = srv.accept()
          val in = new java.io.BufferedInputStream(c.getInputStream)
          val out = new java.io.BufferedOutputStream(c.getOutputStream)
          Rfc6455.serverHandshake(in, out)
          Rfc6455.writeFrame(out, Rfc6455.OpText,
            """{"type":"handshake"}""".getBytes("UTF-8"))
          (0L until 2L).foreach(i =>
            Rfc6455.writeFrame(out, Rfc6455.OpBinary, DecodePack.deepFrame(i)))
          // then: silence — never closes, never sends more
        }
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_stop").toString
    val args = graft.cli.Cli.parseArgs(Seq("--limit", "2")).toOption.get
    val handle = graft.cli.Main.startWsStream(spark, tls = false, "127.0.0.1",
      srv.getLocalPort, "/ws", spool, governor(), args, _ => ())
    try {
      // give the session time to handshake and receive both frames
      // (they sit in the pack buffer until the abort-triggered flush —
      // the spool is intentionally NOT yet visible here)
      Thread.sleep(1500)
      assert(handle.ingest.isAlive, "ingest should be blocked on the silent feed")
      handle.stop()
      handle.ingest.join(10000)
      assert(!handle.ingest.isAlive, "stop handle must retire the ingest thread")
      // everything received before the stop reached the spool. Under
      // machine load a read timeout can abort the silent session and
      // the loop reconnects (by design — frame ids continue across
      // sessions), re-receiving the server's pre-silence frames — and
      // stop() can land after a reconnected session has re-received
      // only ONE of the two, so the count is >= 2, not a multiple of 2.
      val n = spark.read.format("graft-tokens").load(spool)
        .select(col("frame_id")).distinct().count()
      assert(n >= 2L,
        s"expected at least the 2 pre-stop frames in the spool, got $n")
    } finally { handle.query.stop(); handle.stop(); srv.close() }
  }

  // ---- TLS (wss://), proxy CONNECT, cookie session -----------------

  /** (serverCtx with the key, clientCtx trusting only that cert) from
    * the checked-in self-signed PKCS12 (SAN=IP:127.0.0.1 so HTTPS
    * endpoint identification passes on loopback).
    */
  private lazy val (serverTlsCtx, clientTlsCtx) = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val is = getClass.getResourceAsStream("/graft-test.p12")
    ks.load(is, "graftpass".toCharArray); is.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "graftpass".toCharArray)
    val ts = java.security.KeyStore.getInstance(
      java.security.KeyStore.getDefaultType)
    ts.load(null, null)
    ts.setCertificateEntry("graft-test", ks.getCertificate("graft-test"))
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ts)
    val server = javax.net.ssl.SSLContext.getInstance("TLS")
    server.init(kmf.getKeyManagers, null, null)
    val client = javax.net.ssl.SSLContext.getInstance("TLS")
    client.init(null, tmf.getTrustManagers, null)
    (server, client)
  }

  /** One TLS WebSocket session on loopback; records the ALPN protocol
    * the handshake actually negotiated.
    */
  private def serveTls(payloads: Seq[Array[Byte]]):
      (Int, java.util.concurrent.BlockingQueue[String]) = {
    val srv = serverTlsCtx.getServerSocketFactory
      .createServerSocket(0, 2, java.net.InetAddress.getLoopbackAddress)
    val alpn = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      try {
        val c = srv.accept().asInstanceOf[javax.net.ssl.SSLSocket]
        val sp = c.getSSLParameters
        sp.setApplicationProtocols(Array("http/1.1"))
        c.setSSLParameters(sp)
        val in = new java.io.BufferedInputStream(c.getInputStream)
        val out = new java.io.BufferedOutputStream(c.getOutputStream)
        Rfc6455.serverHandshake(in, out) // first read drives the TLS handshake
        alpn.put(Option(c.getApplicationProtocol).getOrElse("<none>"))
        Rfc6455.writeFrame(out, Rfc6455.OpText,
          """{"type":"handshake"}""".getBytes("UTF-8"))
        payloads.foreach(p => Rfc6455.writeFrame(out, Rfc6455.OpBinary, p))
        Rfc6455.writeFrame(out, Rfc6455.OpClose, Array.empty)
        Rfc6455.readMessage(in)
        c.close()
      } catch { case _: Throwable => () } finally srv.close()
    })
    t.setDaemon(true); t.start()
    (srv.asInstanceOf[java.net.ServerSocket].getLocalPort, alpn)
  }

  /** Read an HTTP request head off a raw stream (test-side twin of the
    * client's handshake writer): (request line, lower-cased headers).
    */
  private def readHead(in: java.io.InputStream): (String, Map[String, String]) = {
    val buf = new java.io.ByteArrayOutputStream()
    var tail = Seq.empty[Int]
    var done = false
    while (!done) {
      val b = in.read()
      require(b >= 0, "EOF in request head")
      buf.write(b)
      tail = (tail :+ b).takeRight(4)
      done = tail == Seq(13, 10, 13, 10)
    }
    val lines = buf.toString("UTF-8").split("\r\n").filter(_.nonEmpty)
    val headers = lines.drop(1).map { l =>
      val i = l.indexOf(':')
      l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
    }.toMap
    (lines.head, headers)
  }

  test("wss: TLS loopback with ALPN http/1.1 — spool parity with the plaintext path") {
    val payloads = (0L until 10L).map(DecodePack.deepFrame)
    val (port, alpn) = serveTls(payloads)
    val spool = java.nio.file.Files.createTempDirectory("graft_wss_spool").toString
    val ws = new WsIngest("127.0.0.1", port, "/ws", spool, governor(),
      framesPerPack = 4, clock = () => 777L,
      key16 = fixedKey16, mask4 = fixedMask4,
      tls = true, sslContext = Some(clientTlsCtx))
    val (n, packs) = ws.run(startFrameId = 0L)
    assert(n == 10L && packs == 3)
    // the client offered ALPN http/1.1 and the handshake selected it —
    // the reference forces exactly this on its SSL context
    // (scraper.py:183-186, curl-parity anti-bot posture)
    assert(alpn.poll(5, java.util.concurrent.TimeUnit.SECONDS) == "http/1.1")
    // decode parity with a directly-written pack of the same payloads
    val direct = java.nio.file.Files.createTempDirectory("graft_wss_direct").toString
    FrameTokenSource.writeFramePack(direct, "pack_000000",
      payloads.zipWithIndex.iterator.map { case (p, i) => (i.toLong, 777L, p) })
    val viaTls = spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    val viaWriter = spark.read.format("graft-tokens").load(direct)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    assert(viaTls.nonEmpty && viaTls == viaWriter)
  }

  test("cli --ws wss://: --once end to end over TLS") {
    val payloads = (0L until 5L).map(DecodePack.deepFrame)
    val (port, _) = serveTls(payloads)
    val outs = scala.collection.mutable.ArrayBuffer.empty[String]
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = graft.cli.Main.run(
      Seq("--ws", s"wss://127.0.0.1:$port/ws", "--once", "--limit", "2"),
      outs += _, errs += _, sparkOpt = Some(spark),
      sslContext = Some(clientTlsCtx))
    assert(code == 0, s"errs=$errs")
    assert(outs.size == 1 &&
      outs.head.startsWith("""{"type":"enhanced_tokens","""))
    // port hardening: a >10-digit port takes the argv error path (exit
    // 2), never a NumberFormatException stack trace
    assert(graft.cli.Main.run(
      Seq("--ws", "ws://127.0.0.1:99999999999999999999/ws", "--once"),
      _ => (), errs += _, sparkOpt = Some(spark)) == 2)
    assert(errs.exists(_.contains("port out of range")))
  }

  test("proxy CONNECT: the upgrade tunnels through the proxy, not a direct dial") {
    val payloads = Seq(DecodePack.deepFrame(0L))
    // the target port is BOUND TO NOTHING — only the tunnel can work
    val ghost = new java.net.ServerSocket(0)
    val targetPort = ghost.getLocalPort
    ghost.close()
    val proxySrv = new java.net.ServerSocket(0, 2,
      java.net.InetAddress.getLoopbackAddress)
    val connectLines = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      try {
        val c = proxySrv.accept()
        val in = new java.io.BufferedInputStream(c.getInputStream)
        val out = new java.io.BufferedOutputStream(c.getOutputStream)
        val (reqLine, _) = readHead(in)
        connectLines.put(reqLine)
        out.write("HTTP/1.1 200 Connection Established\r\n\r\n".getBytes("UTF-8"))
        out.flush()
        // the "tunnel": this proxy IS the origin from here on
        Rfc6455.serverHandshake(in, out)
        Rfc6455.writeFrame(out, Rfc6455.OpText,
          """{"type":"handshake"}""".getBytes("UTF-8"))
        payloads.foreach(p => Rfc6455.writeFrame(out, Rfc6455.OpBinary, p))
        Rfc6455.writeFrame(out, Rfc6455.OpClose, Array.empty)
        Rfc6455.readMessage(in)
        c.close()
      } catch { case _: Throwable => () } finally proxySrv.close()
    })
    t.setDaemon(true); t.start()
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_proxy").toString
    val ws = new WsIngest("127.0.0.1", targetPort, "/ws", spool, governor(),
      clock = () => 777L, key16 = fixedKey16, mask4 = fixedMask4,
      proxy = Connectivity.ProxyVia(s"http://127.0.0.1:${proxySrv.getLocalPort}"))
    val (n, _) = ws.run()
    assert(n == 1L)
    // RFC 9110 §9.3.6 request line names the ORIGIN, not the proxy
    assert(connectLines.poll(5, java.util.concurrent.TimeUnit.SECONDS) ==
      s"CONNECT 127.0.0.1:$targetPort HTTP/1.1")
  }

  test("cookie session rides the upgrade; a 403 upgrade refreshes it on the wire") {
    val payloads = Seq(DecodePack.deepFrame(0L))
    val srv = new java.net.ServerSocket(0, 2,
      java.net.InetAddress.getLoopbackAddress)
    val cookiesSeen = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      try {
        // connection 1: anti-bot wall — read the upgrade, answer 403
        val c1 = srv.accept()
        val in1 = new java.io.BufferedInputStream(c1.getInputStream)
        val (_, h1) = readHead(in1)
        cookiesSeen.put(h1.getOrElse("cookie", "<none>"))
        val out1 = new java.io.BufferedOutputStream(c1.getOutputStream)
        out1.write("HTTP/1.1 403 Forbidden\r\n\r\n".getBytes("UTF-8"))
        out1.flush(); c1.close()
        // connection 2: refreshed session passes
        val c2 = srv.accept()
        val in2 = new java.io.BufferedInputStream(c2.getInputStream)
        val out2 = new java.io.BufferedOutputStream(c2.getOutputStream)
        val h2 = Rfc6455.serverHandshake(in2, out2)
        cookiesSeen.put(h2.getOrElse("cookie", "<none>"))
        Rfc6455.writeFrame(out2, Rfc6455.OpText,
          """{"type":"handshake"}""".getBytes("UTF-8"))
        payloads.foreach(p => Rfc6455.writeFrame(out2, Rfc6455.OpBinary, p))
        Rfc6455.writeFrame(out2, Rfc6455.OpClose, Array.empty)
        Rfc6455.readMessage(in2)
        c2.close()
      } catch { case _: Throwable => () } finally srv.close()
    })
    t.setDaemon(true); t.start()
    // generation-tagged jar: the wire shows which session each attempt ran under
    val session = new Connectivity.CookieSession(
      fetch = g => Some((200, Map("cf_clearance" -> s"g$g"))))
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_cookie").toString
    val ws = new WsIngest("127.0.0.1", srv.getLocalPort, "/ws", spool, governor(),
      clock = () => 777L, key16 = fixedKey16, mask4 = fixedMask4,
      cookies = Some(session))
    val (n, _) = ws.run()
    assert(n == 1L)
    // attempt 1 carried the generation-0 jar; the 403 refreshed the
    // session (cloudflare_bypass.py:109-127) and attempt 2 carried the
    // generation-1 jar — observable on the wire, not just in state
    assert(cookiesSeen.poll(5, java.util.concurrent.TimeUnit.SECONDS) == "cf_clearance=g0")
    assert(cookiesSeen.poll(5, java.util.concurrent.TimeUnit.SECONDS) == "cf_clearance=g1")
    assert(session.generation == 1)
  }

  test("spool compaction: many small packs + singles become one container, rows identical") {
    import graft.sources.{FrameTokenSource, SpoolCompactor}
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_compact").toString
    // a messy spool: two tiny packs (one per "session") + two singles
    FrameTokenSource.writeFramePack(spool, "pack_000000000000_000000",
      (0L until 2L).iterator.map(i => (i, 777L, DecodePack.deepFrame(i))))
    FrameTokenSource.writeFramePack(spool, "pack_000000000002_000000",
      (2L until 5L).iterator.map(i => (i, 777L, DecodePack.deepFrame(i))))
    (5L until 7L).foreach(i =>
      FrameTokenSource.writeFrameFile(spool, i, 777L, DecodePack.deepFrame(i)))
    val before = spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    val (n, packs) = SpoolCompactor.compact(spool, framesPerPack = 100)
    assert(n == 7L && packs == 1)
    val listed = FrameTokenSource.listFrameFiles(spool,
      new org.apache.hadoop.conf.Configuration())
    assert(listed.length == 1 && listed.head.isPack)
    val after = spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    assert(after == before)
    // idempotent re-compaction: new run sequence, rows still identical
    val (n2, p2) = SpoolCompactor.compact(spool, framesPerPack = 100)
    assert(n2 == 7L && p2 == 1)
    assert(spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq == before)
  }

  test("compaction refuses a spool a live stream is tailing; allowed after stop") {
    import graft.sources.{FrameTokenSource, SpoolCompactor}
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_guard").toString
    FrameTokenSource.writeFramePack(spool, "pack_000000000000_000000",
      (0L until 3L).iterator.map(i => (i, 777L, DecodePack.deepFrame(i))))
    val outDir = java.nio.file.Files.createTempDirectory("graft_ws_guard_out").toString
    val q = spark.readStream.format("graft-tokens").load(spool)
      .writeStream.format("parquet")
      .option("path", s"$outDir/data").option("checkpointLocation", s"$outDir/ck")
      .start()
    try {
      q.processAllAvailable() // the stream has polled: its marker is down
      val err = intercept[IllegalStateException](SpoolCompactor.compact(spool))
      assert(err.getMessage.contains("offline-only") &&
        err.getMessage.contains("_reader_stream_"))
    } finally q.stop()
    // stop released the marker; compaction now runs (and the spool
    // still reads identically)
    val (n, packs) = SpoolCompactor.compact(spool, framesPerPack = 100)
    assert(n == 3L && packs == 1)
    assert(spark.read.format("graft-tokens").load(spool).count() == 3L)
  }

  test("ingest refuses a spool mid-compaction (compact lock present)") {
    import graft.sources.SpoolLocks
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_lock").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    SpoolLocks.acquireCompact(spool, conf)
    val ws = new WsIngest("127.0.0.1", 1, "/ws", spool, governor(),
      key16 = fixedKey16, mask4 = fixedMask4)
    val err = intercept[IllegalStateException](ws.run())
    assert(err.getMessage.contains("being compacted"))
    SpoolLocks.releaseCompact(spool, conf)
    // and a reader marker can be taken again once the lock is gone
    val m = SpoolLocks.acquireReader(spool, "ingest", conf)
    assert(SpoolLocks.activeReaders(spool, conf).size == 1)
    SpoolLocks.release(m, conf)
    assert(SpoolLocks.activeReaders(spool, conf).isEmpty)
  }

  test("re-pack after the rename/delete crash window dedups on frame_id") {
    import graft.sources.{FrameTokenSource, SpoolCompactor}
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_crash").toString
    FrameTokenSource.writeFramePack(spool, "pack_000000000000_000000",
      (0L until 5L).iterator.map(i => (i, 777L, DecodePack.deepFrame(i))))
    val before = spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    // simulate a compaction that crashed between rename and delete:
    // the compacted copy landed, the source pack was never removed
    val src = java.nio.file.Paths.get(spool, "pack_000000000000_000000.binpack")
    java.nio.file.Files.copy(src,
      java.nio.file.Paths.get(spool, "compact_000000_000000.binpack"))
    assert(spark.read.format("graft-tokens").load(spool).count() == 10L,
      "crash window visibly duplicates frames (reader has no dedup)")
    // the RERUN converges: duplicates collapse on frame_id
    val (n, packs) = SpoolCompactor.compact(spool, framesPerPack = 100)
    assert(n == 5L && packs == 1)
    val after = spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    assert(after == before)
  }

  test("an abnormal disconnect still spools every received frame") {
    val payloads = (0L until 3L).map(DecodePack.deepFrame)
    val srv = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val c = srv.accept()
        val in = new java.io.BufferedInputStream(c.getInputStream)
        val out = new java.io.BufferedOutputStream(c.getOutputStream)
        Rfc6455.serverHandshake(in, out)
        payloads.foreach(p => Rfc6455.writeFrame(out, Rfc6455.OpBinary, p))
        // then a hostile frame: 64-bit length with the MSB set (§5.2
        // violation) — the reader must fail WITHOUT losing the spool
        out.write(Array[Byte](0x82.toByte, 127.toByte) ++ Array.fill(8)(0xff.toByte))
        out.flush(); c.close()
      } catch { case _: Throwable => () } finally srv.close()
    })
    t.setDaemon(true); t.start()
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_abort").toString
    val ws = new WsIngest("127.0.0.1", srv.getLocalPort, "/ws", spool, governor(),
      framesPerPack = 10, clock = () => 777L, // > frame count: only the final flush saves them
      key16 = fixedKey16, mask4 = fixedMask4)
    val (n, packs) = ws.run()
    assert(n == 3L && packs == 1)
    assert(spark.read.format("graft-tokens").load(spool)
      .select(col("frame_id")).distinct().count() == 3L)
  }

  test("rfc6455 codec: masked round-trip, 16/64-bit lengths, fragment reassembly") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def roundTrip(payload: Array[Byte], mask: Option[Array[Byte]]): (Int, Array[Byte]) = {
      val out = new ByteArrayOutputStream()
      Rfc6455.writeFrame(out, Rfc6455.OpBinary, payload, mask)
      Rfc6455.readMessage(new ByteArrayInputStream(out.toByteArray)).get
    }
    // 7-bit, 16-bit and 64-bit length paths, masked and unmasked
    for (n <- Seq(0, 125, 126, 65535, 65536, 70001); m <- Seq(None, Some(fixedMask4())))
      yield {
        val p = Array.tabulate[Byte](n)(i => (i * 31).toByte)
        val (op, got) = roundTrip(p, m)
        assert(op == Rfc6455.OpBinary && java.util.Arrays.equals(got, p),
          s"round-trip failed at n=$n masked=${m.isDefined}")
      }
    // continuation frames reassemble into one message (FIN only on
    // last), and a ping interleaved MID-FRAGMENT goes to onControl
    // without dropping the accumulated fragments (§5.5)
    val out = new ByteArrayOutputStream()
    out.write(0x02); out.write(3); out.write("abc".getBytes("UTF-8")) // binary, no FIN
    out.write(0x89); out.write(1); out.write(42) // ping, mid-message
    out.write(0x00); out.write(3); out.write("def".getBytes("UTF-8")) // cont, no FIN
    out.write(0x80); out.write(3); out.write("ghi".getBytes("UTF-8")) // cont, FIN
    var pinged = false
    val (op, msg) = Rfc6455.readMessage(
      new java.io.ByteArrayInputStream(out.toByteArray),
      (cop, p) => pinged = cop == Rfc6455.OpPing && p.sameElements(Array[Byte](42))).get
    assert(op == Rfc6455.OpBinary && new String(msg, "UTF-8") == "abcdefghi" && pinged)
    // handshake accept key: RFC 6455 §1.3 worked example
    assert(Rfc6455.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("a server selecting an unoffered extension is refused, not misparsed") {
    // permessage-deflate frames would read as garbage through this
    // codec — the handshake must fail loudly naming the extension
    val srv = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try {
        val c = srv.accept()
        Rfc6455.serverHandshake(
          new java.io.BufferedInputStream(c.getInputStream),
          new java.io.BufferedOutputStream(c.getOutputStream),
          extraResponseHeaders = Seq("Sec-WebSocket-Extensions" -> "permessage-deflate"))
      } catch { case _: Throwable => () } finally srv.close()
    })
    t.setDaemon(true); t.start()
    val s = new java.net.Socket("127.0.0.1", srv.getLocalPort)
    try {
      val ex = intercept[IllegalStateException] {
        Rfc6455.clientHandshake(
          new java.io.BufferedInputStream(s.getInputStream),
          new java.io.BufferedOutputStream(s.getOutputStream),
          s"127.0.0.1:${srv.getLocalPort}", "/ws", Nil, fixedKey16())
      }
      assert(ex.getMessage.contains("permessage-deflate") &&
        ex.getMessage.contains("extension"))
    } finally s.close()
  }

  test("torn-frame soak: mid-frame connection kills across many reconnects never commit a torn container") {
    // the reference behavior under an abnormal drop is "keep what was
    // fully received, reconnect, continue" (scraper.py:252-289's cycle
    // retry); the invariant here is stronger and spool-side: a frame
    // whose bytes were CUT by the kill must never reach a committed
    // v3 container — every spooled pack decodes identically to a
    // directly-written pack of the fully-delivered payloads, across a
    // dozen reconnect cycles with the tear placed at a different byte
    // offset each time (inside the header, one byte in, mid-payload).
    val payloads = (0L until 60L).map(DecodePack.deepFrame)
    val burst = 5 // complete frames per connection before the tear
    val srv = new java.net.ServerSocket(0, 4,
      java.net.InetAddress.getLoopbackAddress)
    val sent = new java.util.concurrent.atomic.AtomicInteger(0)
    val t = new Thread(() => {
      var conn = 0
      try {
        while (sent.get < payloads.length) {
          val c = srv.accept()
          try {
            val in = new java.io.BufferedInputStream(c.getInputStream)
            val out = new java.io.BufferedOutputStream(c.getOutputStream)
            Rfc6455.serverHandshake(in, out)
            Rfc6455.writeFrame(out, Rfc6455.OpText,
              """{"type":"handshake"}""".getBytes("UTF-8"))
            var k = 0
            while (k < burst && sent.get < payloads.length) {
              Rfc6455.writeFrame(out, Rfc6455.OpBinary, payloads(sent.get))
              sent.incrementAndGet(); k += 1
            }
            out.flush()
            if (sent.get < payloads.length) {
              // serialize the NEXT frame fully, deliver a strict prefix,
              // kill the connection — the client must treat the partial
              // bytes as noise, not data (`sent` is NOT advanced: the
              // torn frame is re-sent whole on the next connection)
              val full = new java.io.ByteArrayOutputStream()
              Rfc6455.writeFrame(full, Rfc6455.OpBinary, payloads(sent.get))
              val bytes = full.toByteArray
              val cut = conn % 3 match {
                case 0 => 1 // inside the 2-byte header
                case 1 => math.min(3, bytes.length - 1) // header done, payload not begun
                case _ => bytes.length / 2 // mid-payload
              }
              out.write(bytes, 0, cut); out.flush()
            } else {
              Rfc6455.writeFrame(out, Rfc6455.OpClose, Array.empty)
              Rfc6455.readMessage(in) // close-ack
            }
          } catch { case _: Throwable => () } finally c.close()
          conn += 1
        }
      } catch { case _: Throwable => () } finally srv.close()
    })
    t.setDaemon(true); t.start()

    val spool = java.nio.file.Files.createTempDirectory("graft_ws_torn").toString
    var total = 0L
    var runs = 0
    while (total < payloads.length && runs < 30) {
      val ws = new WsIngest("127.0.0.1", srv.getLocalPort, "/ws", spool,
        governor(), framesPerPack = 4, clock = () => 777L,
        key16 = fixedKey16, mask4 = fixedMask4)
      val (n, _) = ws.run(startFrameId = total)
      total += n
      runs += 1
    }
    assert(total == payloads.length,
      s"reconnect loop recovered $total/${payloads.length} frames in $runs runs")
    assert(runs >= 12, s"expected ~12 torn connections, got $runs") // the soak actually soaked
    // spool ≡ written pack: nothing torn committed, nothing lost,
    // nothing doubled, ids contiguous
    val direct = java.nio.file.Files.createTempDirectory("graft_ws_torn_direct").toString
    FrameTokenSource.writeFramePack(direct, "pack_000000",
      payloads.zipWithIndex.iterator.map { case (p, i) => (i.toLong, 777L, p) })
    val viaWs = spark.read.format("graft-tokens").load(spool)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    val viaWriter = spark.read.format("graft-tokens").load(direct)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    assert(viaWs.nonEmpty && viaWs == viaWriter)
  }

  test("connect gives up after maxRetries and surfaces the trace") {
    // nothing listens on this port (bound then closed)
    val tmp = new java.net.ServerSocket(0); val port = tmp.getLocalPort; tmp.close()
    val gov = governor()
    val ws = new WsIngest("127.0.0.1", port, "/ws", "/tmp/unused", gov,
      connectTimeoutMs = 200, key16 = fixedKey16, mask4 = fixedMask4)
    val ex = intercept[IllegalStateException](ws.run())
    assert(ex.getMessage.contains("trace") && gov.trace.length == 3) // maxRetries attempts
  }
}
