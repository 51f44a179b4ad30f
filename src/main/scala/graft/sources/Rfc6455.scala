package graft.sources

import java.io.{InputStream, OutputStream}
import java.util.Base64

/** Minimal RFC 6455 WebSocket wire protocol — handshake key math and
  * frame codec, shared by the live ingest client ([[WsIngest]]) and the
  * in-process loopback server the tests stand up (zero-egress: the
  * protocol logic itself is what gets exercised). Only the features the
  * reference feed uses are implemented: text/binary/ping/pong/close
  * opcodes, 7/16/64-bit payload lengths, client-side masking,
  * FIN-fragment reassembly. No extensions, no subprotocols.
  *
  * Public-spec implementation (RFC 6455 §1.3, §5.2-5.5); reference
  * analog: the `websockets` library underneath scraper.py:231-268.
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
    * server→client frames must not (§5.1).
    */
  def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
      maskKey: Option[Array[Byte]] = None): Unit = {
    out.write(0x80 | (opcode & 0x0f)) // FIN + opcode (no fragmentation on send)
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

  /** Read one raw frame: (fin, opcode, unmasked payload); None on EOF. */
  def readFrame(in: InputStream): Option[(Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val fin = (b0 & 0x80) != 0
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
          (fin, opcode, p)
        }
      }
    }
  }

  /** Read the next DATA message, reassembling continuation fragments
    * (§5.4). Control frames may interleave mid-fragment (§5.5): ping/
    * pong are handed to `onControl` WITHOUT interrupting reassembly;
    * close ends the stream and is returned as `(OpClose, payload)`.
    * None on EOF.
    */
  def readMessage(in: InputStream,
      onControl: (Int, Array[Byte]) => Unit = (_, _) => ()): Option[(Int, Array[Byte])] = {
    var opcode = -1
    val acc = new java.io.ByteArrayOutputStream()
    while (true) {
      readFrame(in) match {
        case None => return None
        case Some((fin, op, p)) =>
          if (op == OpClose) return Some((OpClose, p))
          else if (op >= OpClose) onControl(op, p) // ping/pong, cannot fragment
          else {
            if (opcode < 0) opcode = op // first fragment carries the opcode
            acc.write(p)
            if (fin) return Some((opcode, acc.toByteArray))
          }
      }
    }
    None // unreachable
  }

  /** Client side of the opening handshake over established streams:
    * writes the Upgrade request (extra headers verbatim — full parity
    * with the reference's connect kwargs), validates the 101 response's
    * Sec-WebSocket-Accept. Returns the server's response headers.
    */
  def clientHandshake(in: InputStream, out: OutputStream, host: String,
      path: String, extraHeaders: Seq[(String, String)],
      key16: Array[Byte]): Map[String, String] = {
    val key = Base64.getEncoder.encodeToString(key16)
    val sb = new StringBuilder
    sb.append(s"GET $path HTTP/1.1\r\n")
    sb.append(s"Host: $host\r\n")
    sb.append("Upgrade: websocket\r\nConnection: Upgrade\r\n")
    sb.append(s"Sec-WebSocket-Key: $key\r\n")
    sb.append("Sec-WebSocket-Version: 13\r\n")
    extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append("\r\n")
    out.write(sb.toString.getBytes("UTF-8")); out.flush()
    val (status, headers) = readHttpHead(in)
    if (!status.contains("101")) throw HandshakeRejected(status, headers)
    val expect = acceptKey(key)
    val got = headers.getOrElse("sec-websocket-accept", "")
    require(got == expect, s"bad Sec-WebSocket-Accept: $got != $expect")
    // We offer no Sec-WebSocket-Extensions, so the server MUST NOT
    // select one (RFC 6455 §9.1). A server that does (e.g.
    // permessage-deflate) would send transformed frames this codec
    // would misread as garbage — fail loudly instead of misparsing.
    headers.get("sec-websocket-extensions").foreach { ext =>
      throw new IllegalStateException(
        s"server selected WebSocket extension '$ext' which this client " +
          "did not offer and does not implement (RFC 6455 §9.1); " +
          "refusing to read transformed frames")
    }
    headers
  }

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
