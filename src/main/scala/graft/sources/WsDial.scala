package graft.sources

import java.io.{InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import javax.net.ssl.{SNIHostName, SSLContext, SSLSocket}

/** Socket establishment for the live connector: plain TCP, HTTP CONNECT
  * proxy tunneling, and TLS with ALPN — the transport under
  * [[WsIngest]]'s RFC 6455 session, factored out so each layer is
  * testable against an in-process loopback peer.
  *
  * Reference mapping: `ssl.create_default_context()` +
  * `set_alpn_protocols(["http/1.1"])` (scraper.py:183-186 — the ALPN
  * offer matches curl's and is part of the anti-bot posture), and the
  * `proxy` connect kwarg resolved from the override policy
  * (scraper.py:216-230, policy at [[Connectivity.proxyOverride]]).
  */
object WsDial {

  /** A TLS-capable dial target. `tls=true` is the `wss://` scheme. */
  final case class Endpoint(host: String, port: Int, tls: Boolean)

  /** Dial `endpoint`, optionally tunneling through an HTTP CONNECT
    * proxy, optionally wrapping in TLS (ALPN `http/1.1`, SNI, HTTPS
    * endpoint identification — the verifying posture of the
    * reference's default SSL context).
    *
    * @param sslContext override for tests (self-signed loopback trust);
    *                   None = JVM default trust store
    * @return the connected (possibly TLS) socket, handshake complete
    */
  def open(endpoint: Endpoint, proxy: Connectivity.ProxyOverride,
      connectTimeoutMs: Int, sslContext: Option[SSLContext] = None): Socket = {
    val raw = new Socket()
    try {
      proxy match {
        case Connectivity.ProxyVia(url) =>
          val (ph, pp) = parseProxyUrl(url)
          raw.connect(new InetSocketAddress(ph, pp), connectTimeoutMs)
          connectTunnel(raw.getInputStream, raw.getOutputStream,
            endpoint.host, endpoint.port)
        case _ => // UseDefault / ProxyDisabled: direct routing (no JVM
          // proxy selector is consulted here — "default" means direct)
          raw.connect(new InetSocketAddress(endpoint.host, endpoint.port),
            connectTimeoutMs)
      }
      if (endpoint.tls) wrapTls(raw, endpoint.host, endpoint.port, sslContext)
      else raw
    } catch {
      case e: Throwable =>
        try raw.close() catch { case _: Throwable => () }
        throw e
    }
  }

  /** `http://host:port` (scheme optional) → (host, port). The reference
    * hands arbitrary proxy URLs to `websockets`; this client implements
    * the plain HTTP CONNECT flavor.
    */
  private[sources] def parseProxyUrl(url: String): (String, Int) = {
    val Pat = """(?:http://)?([^:/]+):(\d{1,5})/?""".r
    url match {
      case Pat(h, p) =>
        val port = p.toInt
        require(port >= 1 && port <= 65535, s"proxy port out of range: $port")
        (h, port)
      case _ => throw new IllegalArgumentException(
        s"unsupported proxy url (need [http://]host:port): $url")
    }
  }

  /** RFC 9110 §9.3.6 CONNECT: ask the proxy for a raw tunnel to
    * host:port; any non-2xx response is a hard failure (the governor
    * retries around us).
    */
  private def connectTunnel(in: InputStream, out: OutputStream,
      host: String, port: Int): Unit = {
    out.write((s"CONNECT $host:$port HTTP/1.1\r\n" +
      s"Host: $host:$port\r\n\r\n").getBytes("UTF-8"))
    out.flush()
    val (status, _) = Rfc6455.readHttpHead(in)
    val ok = status.split(" ", 3) match {
      case Array(_, code, _*) => code.startsWith("2")
      case _ => false
    }
    if (!ok) throw new java.io.IOException(s"proxy CONNECT refused: $status")
  }

  /** Layer TLS over an established socket (direct or tunneled): SNI for
    * the target host, ALPN `http/1.1`, and HTTPS hostname verification
    * against the context's trust anchors. Blocks for the handshake so a
    * bad certificate fails HERE (one governed attempt), not mid-upgrade.
    */
  private def wrapTls(raw: Socket, host: String, port: Int,
      sslContext: Option[SSLContext]): SSLSocket = {
    val ctx = sslContext.getOrElse(SSLContext.getDefault)
    val ssl = ctx.getSocketFactory
      .createSocket(raw, host, port, true).asInstanceOf[SSLSocket]
    val params = ssl.getSSLParameters
    params.setApplicationProtocols(Array("http/1.1"))
    // SNI carries DNS names only (RFC 6066 §3 forbids IP literals);
    // verification still covers IPs via the SAN iPAddress check below
    if (!host.matches("""\d{1,3}(\.\d{1,3}){3}"""))
      params.setServerNames(java.util.List.of(new SNIHostName(host)))
    params.setEndpointIdentificationAlgorithm("HTTPS")
    ssl.setSSLParameters(params)
    ssl.startHandshake()
    ssl
  }
}
