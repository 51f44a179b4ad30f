package graft.cli

import graft.config.QueryCompiler
import graft.decode.Decode
import graft.model.TokenProfile
import graft.operators.Tokens
import graft.sinks.Sinks
import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** EP1, runnable end-to-end (reference: dexscraper/cli.py:1033-1107):
  * argv → ScrapingConfig → decode pipeline → serialized batch, with the
  * reference's `--once` / `--output` semantics and exit codes. The one
  * engine-specific flag is `--frames <dir>` — where the reference dials a
  * WebSocket, this engine reads frame rows (frame_id, frame, extraction_ts)
  * from parquet, the same source the streaming path replays.
  *
  * The scraping config is applied ENGINE-SIDE via QueryCompiler (S2's
  * backstop: filter → rank → limit); the reference gets the same effect
  * server-side via the URL the identical Filters serialize to.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val code = run(args.toSeq, s => { Console.out.println(s); () },
      s => { Console.err.println(s); () })
    if (code != 0) sys.exit(code)
  }

  /** Engine flags stripped before the reference-parity parse:
    * `--frames <dir>` (parquet frame replay) or `--ws <url>` with
    * `ws://` or `wss://` scheme (LIVE ingest — where the reference
    * dials the WebSocket itself; its real endpoint is `wss://`,
    * config.py:254).
    */
  private[cli] def splitEngineArgs(
      argv: Seq[String]): (Option[String], Option[String], Seq[String]) = {
    val rest = Seq.newBuilder[String]
    var frames: Option[String] = None
    var ws: Option[String] = None
    var i = 0
    while (i < argv.length) {
      if (argv(i) == "--frames" && i + 1 < argv.length) { frames = Some(argv(i + 1)); i += 2 }
      else if (argv(i) == "--ws" && i + 1 < argv.length) { ws = Some(argv(i + 1)); i += 2 }
      else { rest += argv(i); i += 1 }
    }
    (frames, ws, rest.result())
  }

  private val WsUrl = """(wss?)://([^:/]+)(?::(\d+))?(/.*)?""".r

  /** `ws://` / `wss://` URL → (tls, host, port, path). The port is
    * range-checked through the argv-error exit path (a 20-digit "port"
    * must produce exit code 2, not a NumberFormatException stack
    * trace); omitted ports default per scheme (80 / 443).
    */
  private[cli] def parseWsUrl(url: String): Either[String, (Boolean, String, Int, String)] =
    url match {
      case WsUrl(scheme, host, portStr, path) =>
        val tls = scheme == "wss"
        Option(portStr) match {
          case None => Right((tls, host, if (tls) 443 else 80, Option(path).getOrElse("/")))
          case Some(p) =>
            p.toIntOption.filter(x => x >= 1 && x <= 65535) match {
              case Some(port) => Right((tls, host, port, Option(path).getOrElse("/")))
              case None => Left(s"--ws port out of range (1-65535): $p")
            }
        }
      case _ => Left(s"--ws expects ws[s]://host[:port][/path], got: $url")
    }

  /** Exit-code-returning core (no System.exit, no session ownership) —
    * the spec drives this directly.
    */
  /** @param sslContext test seam for `wss://` against a loopback TLS
    *                    server with a self-signed trust anchor; None =
    *                    the JVM default trust store (production)
    */
  def run(argv: Seq[String], out: String => Unit, err: String => Unit,
      sparkOpt: Option[SparkSession] = None,
      sslContext: Option[javax.net.ssl.SSLContext] = None): Int = {
    val (framesDirOpt, wsOpt, rest) = splitEngineArgs(argv)
    Cli.parseArgs(rest) match {
      case Left(e) => err(e); 2
      case Right(args) =>
        (framesDirOpt, wsOpt) match {
          case (None, None) =>
            err("--frames <dir> or --ws <url> is required (engine frame source)"); 2
          case (Some(_), Some(_)) =>
            err("--frames and --ws are mutually exclusive"); 2
          case (Some(framesDir), None) =>
            val spark = sparkOpt.getOrElse(defaultSession())
            try execute(spark, framesDir, args, out, err)
            finally if (sparkOpt.isEmpty) spark.stop()
          case (None, Some(url)) =>
            parseWsUrl(url) match {
              case Left(e) => err(e); 2
              case Right((tls, host, port, path)) =>
                val spark = sparkOpt.getOrElse(defaultSession())
                try executeWs(spark, tls, host, port, path, args, out, err, sslContext)
                finally if (sparkOpt.isEmpty) spark.stop()
            }
        }
    }
  }

  private def defaultSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private def execute(spark: SparkSession, framesDir: String, args: Cli.CliArgs,
      out: String => Unit, err: String => Unit): Int = {
    if (args.once) runOnce(spark, framesDir, args, out, err)
    else if (args.output.isDefined) {
      // cli.py:1077-1079
      err("--output is supported only with --once"); 2
    } else {
      val streamFormat =
        if (args.format == "ohlcv" || args.format == "ohlcvt") {
          // bar formats need a completed batch boundary; streaming emits
          // token payloads — say so instead of silently switching
          err(s"--format ${args.format} is one-shot only; streaming emits json " +
            "(use --once for bar output)")
          "json"
        } else args.format
      val query = Streaming.runTokenPipeline(spark, framesDir,
        (_, payload) => out(payload),
        formatType = streamFormat,
        topK = args.limit,
        trigger = Trigger.ProcessingTime("5 seconds"))
      query.awaitTermination()
      0
    }
  }

  /** The `--ws` modes: one ingest session to server-close for `--once`
    * (the reference's "connect, read the pairs frame, extract"),
    * or a reconnect-looping ingest thread feeding a `graft-tokens`
    * stream over the spool for live mode — ingest-once → durable
    * spool → distributed everything-after, at CLI scale. The proxy
    * override rides the reference's environment contract
    * (DEXSCRAPER_PROXY, scraper.py:162-175).
    */
  private def executeWs(spark: SparkSession, tls: Boolean, host: String,
      port: Int, path: String, args: Cli.CliArgs, out: String => Unit,
      err: String => Unit,
      sslContext: Option[javax.net.ssl.SSLContext]): Int = {
    val spool = java.nio.file.Files.createTempDirectory("graft_ws_cli").toString
    val governor = new graft.sources.Connectivity.ConnectionGovernor()
    val proxy = graft.sources.Connectivity.proxyOverride(
      sys.env.get("DEXSCRAPER_PROXY"))
    if (args.once) {
      new graft.sources.WsIngest(host, port, path, spool, governor,
        tls = tls, proxy = proxy, sslContext = sslContext).run()
      finishOnce(spark, spark.read.format("graft-tokens").load(spool),
        args, out, err)
    } else if (args.output.isDefined) {
      err("--output is supported only with --once"); 2
    } else {
      val handle = startWsStream(spark, tls, host, port, path, spool,
        governor, args, out, proxy, sslContext)
      try { handle.query.awaitTermination(); 0 }
      finally handle.stop()
    }
  }

  /** A running `--ws` live session: the streaming query, the ingest
    * thread, and the stop handle that retires both halves (sets the
    * loop flag AND closes the active socket so a blocked read returns;
    * received frames still flush to the spool).
    */
  private[graft] final case class WsStreamHandle(
      query: org.apache.spark.sql.streaming.StreamingQuery,
      ingest: Thread,
      stop: () => Unit)

  /** Live streaming: a daemon ingest thread loops WebSocket sessions
    * under the governor (resuming frame ids across drops) while the
    * foreground streaming query tails the spool. Package-private so the
    * spec can drive it with an injected fake-clock governor and stop it.
    */
  private[graft] def startWsStream(spark: SparkSession, tls: Boolean,
      host: String, port: Int, path: String, spool: String,
      governor: graft.sources.Connectivity.ConnectionGovernor,
      args: Cli.CliArgs, out: String => Unit,
      proxy: graft.sources.Connectivity.ProxyOverride = graft.sources.Connectivity.UseDefault,
      sslContext: Option[javax.net.ssl.SSLContext] = None): WsStreamHandle = {
    @volatile var stopped = false
    @volatile var current: graft.sources.WsIngest = null
    val ingest = new Thread(() => {
      var next = 0L
      var live = true
      while (!stopped && live) {
        try {
          val ws = new graft.sources.WsIngest(host, port, path, spool,
            governor, tls = tls, proxy = proxy, sslContext = sslContext)
          current = ws
          if (!stopped) {
            val (n, _) = ws.run(startFrameId = next)
            next += n
          }
        } catch {
          // governor exhausted its retries (or abort() closed the
          // socket mid-dial): the feed is gone — stop ingesting; the
          // query keeps serving what was spooled
          case scala.util.control.NonFatal(_) => live = false
        }
      }
    })
    ingest.setDaemon(true)
    ingest.start()
    val query = Streaming.runDecodedPipeline(
      spark.readStream.format("graft-tokens").load(spool),
      (_, payload) => out(payload),
      formatType = if (args.format == "ohlcv" || args.format == "ohlcvt") "json" else args.format,
      topK = args.limit,
      trigger = Trigger.ProcessingTime("5 seconds"))
    WsStreamHandle(query, ingest, () => {
      stopped = true
      val ws = current
      if (ws != null) ws.abort()
    })
  }

  /** `--once`: one batch extraction → serialized output (cli.py:1060-1074).
    * Returns 1 with "Failed to extract token data" when the decode yields
    * nothing, exactly like the reference.
    */
  def runOnce(spark: SparkSession, framesDir: String, args: Cli.CliArgs,
      out: String => Unit, err: String => Unit): Int = {
    import spark.implicits._
    val frames = spark.read.schema(Streaming.frameSchema).parquet(framesDir)
    finishOnce(spark, Decode.tokens(spark, frames.as[Decode.Frame]), args, out, err)
  }

  /** The shared back half of `--once` over an already-decoded token
    * frame (parquet replay decodes engine-side; the `--ws` spool
    * decodes inside the `graft-tokens` reader).
    */
  private def finishOnce(spark: SparkSession, decoded: DataFrame,
      args: Cli.CliArgs, out: String => Unit, err: String => Unit): Int = {
    import spark.implicits._
    val config = Cli.buildConfigFromArgs(args)
    // S2 backstop: the same Filters the URL would carry, applied engine-side.
    val filtered = decoded.filter(QueryCompiler.filterPredicate(config.filters))

    val statsRow = Tokens.batchStats(filtered).collect()(0)
    val (total, highConf) = (statsRow.getLong(0), statsRow.getLong(1))
    val top: Seq[TokenProfile] = filtered
      .orderBy(QueryCompiler.sortColumns(config.rankBy, config.order): _*)
      .limit(args.limit) // planned as TakeOrderedAndProject — no global sort
      .drop("frame_id").as[TokenProfile].collect().toSeq
    if (top.isEmpty) { err("Failed to extract token data"); return 1 }

    val ts = top.flatMap(_.timestamp).headOption.getOrElse(0L)
    val serialized =
      if (args.format == "rich")
        // Reference routes rich to the interactive TUI; one-shot mode
        // renders a single deterministic TUI frame instead.
        graft.sinks.Tui.render(top, total, highConf,
          complete = statsRow.getLong(2), cycle = 1L, sessionSeconds = 5.0,
          clock = graft.sinks.Tui.clockString(ts))
      else Sinks.formatBatchOutput(top, args.format, args.limit, total, highConf, ts)

    args.output match {
      case Some(path) => Sinks.writeBatchFile(path, serialized)
      case None => out(serialized)
    }
    0
  }
}
