package graft.sources

import java.io.{InputStream, OutputStream}
import java.util.Base64

/** Minimal RFC 6455 WebSocket wire protocol — handshake key math and
  * frame codec, shared by the live ingest client ([[WsIngest]]) and the
  * in-process loopback server the tests stand up (zero-egress: the
  * protocol logic itself is what gets exercised). Features the
  * reference feed uses: text/binary/ping/pong/close opcodes, 7/16/64-bit
  * payload lengths, client-side masking, FIN-fragment reassembly, and
  * the permessage-deflate extension (RFC 7692 — the `websockets`
  * library under scraper.py:231-268 offers it on every connect, so a
  * deflating endpoint is reachable by the reference and must be by us).
  * No subprotocols.
  *
  * Public-spec implementation (RFC 6455 §1.3, §5.2-5.5; RFC 7692 §7).
  */
object Rfc6455 {

  /** RFC 6455 §1.3 handshake GUID. */
  val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  val OpText = 1; val OpBinary = 2; val OpClose = 8; val OpPing = 9; val OpPong = 10

  /** Sec-WebSocket-Accept for a client key: base64(SHA1(key + GUID)). */
  def acceptKey(key: String): String =
    Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1")
        .digest((key + Guid).getBytes("UTF-8")))

  /** Write one frame. Client→server frames MUST carry a mask key;
    * server→client frames must not (§5.1). `rsv1` marks the message as
    * permessage-deflate-compressed (RFC 7692 §6 — only valid once the
    * extension was negotiated, and only on the first frame of a
    * message; this codec never fragments on send).
    */
  def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
      maskKey: Option[Array[Byte]] = None, rsv1: Boolean = false): Unit = {
    // FIN + RSV1 + opcode (no fragmentation on send)
    out.write(0x80 | (if (rsv1) 0x40 else 0x00) | (opcode & 0x0f))
    val maskBit = if (maskKey.isDefined) 0x80 else 0x00
    val n = payload.length
    if (n < 126) out.write(maskBit | n)
    else if (n < (1 << 16)) {
      out.write(maskBit | 126); out.write(n >>> 8); out.write(n & 0xff)
    } else {
      out.write(maskBit | 127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    maskKey match {
      case Some(k) =>
        require(k.length == 4, "mask key must be 4 bytes")
        out.write(k)
        val masked = new Array[Byte](n)
        var i = 0
        while (i < n) { masked(i) = (payload(i) ^ k(i % 4)).toByte; i += 1 }
        out.write(masked)
      case None => out.write(payload)
    }
    out.flush()
  }

  private def readFully(in: InputStream, n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return None
      off += r
    }
    Some(buf)
  }

  /** Read one raw frame: (fin, rsv1, opcode, unmasked payload); None on
    * EOF.
    */
  def readFrame(in: InputStream): Option[(Boolean, Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val fin = (b0 & 0x80) != 0
    val rsv1 = (b0 & 0x40) != 0
    val opcode = b0 & 0x0f
    val b1 = in.read()
    if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    val len7 = b1 & 0x7f
    val lenOpt: Option[Long] =
      if (len7 < 126) Some(len7.toLong)
      else readFully(in, if (len7 == 126) 2 else 8).map(_.foldLeft(0L)((a, b) => (a << 8) | (b & 0xff)))
    lenOpt.flatMap { len =>
      // §5.2: the 64-bit length MSB must be 0 — a negative fold here is
      // a hostile/broken peer, not a big frame
      require(len >= 0 && len <= Int.MaxValue, s"bad frame length: $len")
      val key = if (masked) readFully(in, 4) else Some(Array.empty[Byte])
      key.flatMap { k =>
        readFully(in, len.toInt).map { p =>
          if (masked) {
            var i = 0
            while (i < p.length) { p(i) = (p(i) ^ k(i % 4)).toByte; i += 1 }
          }
          (fin, rsv1, opcode, p)
        }
      }
    }
  }

  /** Read the next DATA message, reassembling continuation fragments
    * (§5.4). Control frames may interleave mid-fragment (§5.5): ping/
    * pong are handed to `onControl` WITHOUT interrupting reassembly;
    * close ends the stream and is returned as `(OpClose, payload)`.
    * None on EOF.
    *
    * A message whose first frame carries RSV1 is permessage-deflate
    * compressed (RFC 7692 §6.2): the reassembled payload inflates
    * through `inflate` — which MUST be present, i.e. the extension must
    * have been negotiated; an un-negotiated RSV1 is a protocol error
    * and fails loudly rather than surfacing deflate bytes as data.
    */
  def readMessage(in: InputStream,
      onControl: (Int, Array[Byte]) => Unit = (_, _) => (),
      inflate: Option[PmdInflater] = None): Option[(Int, Array[Byte])] = {
    var opcode = -1
    var compressed = false
    val acc = new java.io.ByteArrayOutputStream()
    while (true) {
      readFrame(in) match {
        case None => return None
        case Some((fin, rsv1, op, p)) =>
          if (op == OpClose) return Some((OpClose, p))
          else if (op >= OpClose) onControl(op, p) // ping/pong, cannot fragment
          else {
            if (opcode < 0) { opcode = op; compressed = rsv1 } // first fragment
            acc.write(p)
            if (fin) {
              val body =
                if (!compressed) acc.toByteArray
                else inflate.getOrElse(throw new IllegalStateException(
                  "RSV1 set but permessage-deflate was not negotiated " +
                    "(RFC 7692 §6) — refusing to misread deflate bytes as data"))
                  .apply(acc.toByteArray)
              return Some((opcode, body))
            }
          }
      }
    }
    None // unreachable
  }

  // ---------------------------------------------------------------------
  // permessage-deflate (RFC 7692 §7)

  /** The client offer: `client_max_window_bits` without a value signals
    * we can receive any server window (java.util.zip inflates ≤32 KB
    * windows generically) — byte-identical to the `websockets` library's
    * default offer.
    */
  val DeflateOffer = "permessage-deflate; client_max_window_bits"

  /** Server-selected permessage-deflate parameters (the subset that
    * affects a client that only DECOMPRESSES: whether the server resets
    * its compression context per message).
    */
  final case class PmdParams(serverNoContextTakeover: Boolean)

  /** Parse the server's `Sec-WebSocket-Extensions` response value.
    * Returns params iff it selects permessage-deflate with parameters
    * RFC 7692 §7.1 allows in a response; anything else → None (the
    * handshake then rejects — §9.1 forbids selecting what wasn't
    * offered, and a malformed acceptance must not half-enable the
    * transform).
    */
  def parseDeflateResponse(value: String): Option[PmdParams] = {
    if (value.contains(",")) return None // multiple extensions: never offered
    val parts = value.split(";").map(_.trim)
    if (parts.isEmpty || parts.head != "permessage-deflate") return None
    var sncto = false
    val ok = parts.tail.forall { p =>
      val kv = p.split("=", 2).map(_.trim.stripPrefix("\"").stripSuffix("\""))
      kv(0) match {
        case "server_no_context_takeover" => sncto = true; kv.length == 1
        case "client_no_context_takeover" => kv.length == 1 // we send uncompressed
        case "server_max_window_bits" | "client_max_window_bits" =>
          kv.length == 2 && kv(1).forall(_.isDigit) &&
            kv(1).toInt >= 8 && kv(1).toInt <= 15
        case _ => false
      }
    }
    if (ok) Some(PmdParams(sncto)) else None
  }

  /** RFC 7692 §7.2.2 message inflate: append the 0x00 0x00 0xff 0xff
    * tail the compressor stripped, inflate raw-deflate (nowrap). With
    * context takeover (the default) the SAME inflater carries its
    * 32 KB sliding window across messages; `server_no_context_takeover`
    * resets it per message.
    */
  final class PmdInflater(params: PmdParams) {
    private val inf = new java.util.zip.Inflater(true)
    private val Tail = Array[Byte](0x00, 0x00, 0xff.toByte, 0xff.toByte)

    def apply(compressed: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.max(64, compressed.length * 4))
      val buf = new Array[Byte](8192)
      inf.setInput(compressed ++ Tail)
      var n = inf.inflate(buf)
      while (n > 0) { out.write(buf, 0, n); n = inf.inflate(buf) }
      require(inf.getRemaining == 0, "trailing garbage after deflate block")
      if (params.serverNoContextTakeover) inf.reset()
      out.toByteArray
    }
  }

  /** Compressor counterpart (RFC 7692 §7.2.1) — the loopback test
    * server's side, and available for client-side send: raw-deflate
    * with Z_SYNC_FLUSH, strip the trailing 0x00 0x00 0xff 0xff.
    */
  final class PmdDeflater(noContextTakeover: Boolean = false) {
    private val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)

    def apply(payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.max(64, payload.length / 2))
      val buf = new Array[Byte](8192)
      defl.setInput(payload)
      var n = defl.deflate(buf, 0, buf.length, java.util.zip.Deflater.SYNC_FLUSH)
      while (n > 0) {
        out.write(buf, 0, n)
        n = defl.deflate(buf, 0, buf.length, java.util.zip.Deflater.SYNC_FLUSH)
      }
      val b = out.toByteArray
      // JDK quirk (vs zlib): an empty message AFTER a sync-flushed one
      // has nothing pending, so deflate(SYNC_FLUSH) emits ZERO bytes —
      // no sync marker at all (a fresh deflater emits the 5-byte empty
      // stored block; a warm one emits nothing). The RFC 7692 §7.2.1
      // wire form for that case is the stripped empty stored block
      // `00` — the receiver re-appends 00 00 ff ff and inflates the
      // 5-byte block to an empty message. Surfaced by the PropertySpec
      // fragmentation round-trip.
      if (b.isEmpty) {
        if (noContextTakeover) defl.reset()
        Array[Byte](0x00)
      } else {
        require(b.length >= 4 && b(b.length - 4) == 0x00 && b(b.length - 3) == 0x00 &&
          (b(b.length - 2) & 0xff) == 0xff && (b(b.length - 1) & 0xff) == 0xff,
          "sync-flushed deflate must end in 00 00 ff ff")
        if (noContextTakeover) defl.reset()
        java.util.Arrays.copyOf(b, b.length - 4)
      }
    }
  }

  /** Client side of the opening handshake over established streams:
    * writes the Upgrade request (extra headers verbatim — full parity
    * with the reference's connect kwargs), validates the 101 response's
    * Sec-WebSocket-Accept. Returns the server's response headers.
    */
  def clientHandshake(in: InputStream, out: OutputStream, host: String,
      path: String, extraHeaders: Seq[(String, String)],
      key16: Array[Byte], offerDeflate: Boolean = false): Map[String, String] = {
    val key = Base64.getEncoder.encodeToString(key16)
    val sb = new StringBuilder
    sb.append(s"GET $path HTTP/1.1\r\n")
    sb.append(s"Host: $host\r\n")
    sb.append("Upgrade: websocket\r\nConnection: Upgrade\r\n")
    sb.append(s"Sec-WebSocket-Key: $key\r\n")
    sb.append("Sec-WebSocket-Version: 13\r\n")
    if (offerDeflate) sb.append(s"Sec-WebSocket-Extensions: $DeflateOffer\r\n")
    extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append("\r\n")
    out.write(sb.toString.getBytes("UTF-8")); out.flush()
    val (status, headers) = readHttpHead(in)
    if (!status.contains("101")) throw HandshakeRejected(status, headers)
    val expect = acceptKey(key)
    val got = headers.getOrElse("sec-websocket-accept", "")
    require(got == expect, s"bad Sec-WebSocket-Accept: $got != $expect")
    // The server may only select what we offered (RFC 6455 §9.1):
    // permessage-deflate with response-legal params when we offered it,
    // nothing otherwise. Anything else would send transformed frames
    // this codec would misread as garbage — fail loudly instead.
    headers.get("sec-websocket-extensions").foreach { ext =>
      val acceptable = offerDeflate && parseDeflateResponse(ext).isDefined
      if (!acceptable) throw new IllegalStateException(
        s"server selected WebSocket extension '$ext' which this client " +
          "did not offer (RFC 6455 §9.1); refusing to read transformed frames")
    }
    headers
  }

  /** The inflater for a completed client handshake, if the server
    * selected permessage-deflate — feed it to [[readMessage]].
    */
  def negotiatedInflater(responseHeaders: Map[String, String]): Option[PmdInflater] =
    responseHeaders.get("sec-websocket-extensions")
      .flatMap(parseDeflateResponse).map(new PmdInflater(_))

  /** Non-101 upgrade response — carries the status line (e.g. the
    * anti-bot 403 the cookie session refreshes on) and headers so the
    * caller can branch on the rejection kind.
    */
  final case class HandshakeRejected(status: String,
      headers: Map[String, String])
      extends RuntimeException(s"handshake rejected: $status")

  /** Server side of the opening handshake: parses the request head,
    * answers 101 with the computed accept key. Returns the request
    * headers (lower-cased names) for assertion/inspection.
    */
  def serverHandshake(in: InputStream, out: OutputStream,
      extraResponseHeaders: Seq[(String, String)] = Nil): Map[String, String] = {
    val (_, headers) = readHttpHead(in)
    val key = headers.getOrElse("sec-websocket-key",
      throw new IllegalArgumentException("no Sec-WebSocket-Key"))
    val extra = extraResponseHeaders.map { case (k, v) => s"$k: $v\r\n" }.mkString
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n$extra\r\n").getBytes("UTF-8"))
    out.flush()
    headers
  }

  /** Read an HTTP message head (request or status line + headers) up to
    * the blank line; header names lower-cased. Shared with the proxy
    * CONNECT response parse in [[WsDial]].
    */
  private[sources] def readHttpHead(in: InputStream): (String, Map[String, String]) = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.io.ByteArrayOutputStream()
    var prev = -1
    var done = false
    while (!done) {
      val b = in.read()
      require(b >= 0, "EOF during handshake")
      if (prev == '\r' && b == '\n') {
        val line = cur.toString("UTF-8").stripSuffix("\r")
        if (line.isEmpty) done = true else lines += line
        cur.reset()
      } else cur.write(b)
      prev = b
    }
    val headers = lines.drop(1).map { l =>
      val i = l.indexOf(':')
      require(i > 0, s"malformed header line in handshake: '$l'")
      l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
    }.toMap
    (lines.headOption.getOrElse(""), headers)
  }
}
