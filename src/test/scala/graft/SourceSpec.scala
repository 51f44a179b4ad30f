package graft

import graft.config.{Filters, QueryCompiler}
import graft.decode.Decode
import graft.queries.DecodePack
import graft.sources.{FrameTokenScan, FrameTokenSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 frame source: physical filter/TopN/column pushdown visible in the
  * executed plan, result equivalence against the engine-side backstop
  * (S2), and the micro-batch stream path.
  */
class SourceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val NFrames = 200
  private val Ts = 1700000000L

  private lazy val framesDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    (0 until NFrames).foreach(c =>
      FrameTokenSource.writeFrameFile(dir, c.toLong, Ts, DecodePack.deepFrame(c.toLong)))
    dir
  }

  private def sourceDf: DataFrame =
    spark.read.format("graft-tokens").load(framesDir)

  private def scanOf(df: DataFrame): FrameTokenScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[FrameTokenScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("filters push into the source and the Filter node disappears") {
    val df = sourceDf
      .filter(col("liquidity") >= 35000.0 && col("chain") === "solana")
    val scan = scanOf(df)
    val pushed = scan.description()
    assert(pushed.contains("PushedFilters:") && pushed.contains("liquidity"))
    assert(pushed.contains("chain"))
    // fully-pushed predicates leave NO engine-side Filter behind
    val hasFilter = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FilterExec])
    assert(!hasFilter, "expected no FilterExec for fully-pushed predicates")
    // ... and explain surfaces the pushdown for plan review
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters:"))
  }

  test("unsupported predicates stay engine-side (backstop), supported ones still push") {
    val df = sourceDf
      .filter(col("liquidity") >= 35000.0 && length(col("symbol")) === 4)
    assert(scanOf(df).description().contains("liquidity"))
    val hasFilter = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FilterExec])
    assert(hasFilter, "length() predicate must remain as an engine Filter")
  }

  test("Not over a nullable column keeps SQL three-valued semantics when pushed") {
    // pair_address decodes to null in the deep fixture; SQL says
    // NOT(null = 'x') is UNKNOWN → row dropped. A naive null→false
    // collapse would keep every row here.
    val notEq = sourceDf.filter(!(col("pair_address") === "nope"))
    assert(scanOf(notEq).description().contains("pair_address"),
      "Not predicate should push into the source")
    assert(notEq.count() == 0, "NOT over null must drop rows, not keep them")

    // same answer as SQL semantics computed engine-side on the full scan
    val srcRows = sourceDf.filter(!(col("protocol") === "pumpfun"))
      .select("frame_id").collect().map(_.getLong(0)).toSet
    val engRows = sourceDf.select("frame_id", "protocol").collect()
      .filter(r => !r.isNullAt(1) && r.getString(1) != "pumpfun")
      .map(_.getLong(0)).toSet
    assert(srcRows == engRows)
  }

  test("TopN pushes as bounded per-partition selection; global order intact") {
    val df = sourceDf
      .filter(col("liquidity") >= 35000.0)
      .orderBy(col("liquidity").desc, col("frame_id").asc)
      .limit(20)
    assert(scanOf(df).description().contains("PushedTopN:"))

    // Backstop: same frames through the engine-only path.
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Decode.Frame]
    val frames = (0 until NFrames)
      .map(c => Decode.Frame(c.toLong, DecodePack.deepFrame(c.toLong), Ts)).toDS()
    val backstop = Decode.tokens(spark, frames)
      .filter(QueryCompiler.filterPredicate(Filters(liquidityMin = Some(35000L))))
      .orderBy(col("liquidity").desc, col("frame_id").asc)
      .limit(20)

    val cols = Seq("frame_id", "symbol", "liquidity", "txns_24h", "confidence_score")
    val got = df.select(cols.map(col): _*).collect().map(_.toSeq).toSeq
    val want = backstop.select(cols.map(col): _*).collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.size == 20)
  }

  test("full-scan equivalence: source rows == engine decode rows") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Decode.Frame]
    val frames = (0 until NFrames)
      .map(c => Decode.Frame(c.toLong, DecodePack.deepFrame(c.toLong), Ts)).toDS()
    val backstop = Decode.tokens(spark, frames).orderBy(col("frame_id"))
    val got = sourceDf.orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    val want = backstop.collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("column pruning reaches the reader (ReadSchema)") {
    val df = sourceDf.select(col("frame_id"), col("symbol"))
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq == Seq("frame_id", "symbol"))
    assert(scan.description().contains("ReadSchema: [frame_id,symbol]"))
  }

  test("binpack containers decode identically to per-frame files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_pack").toString
    // first half as singles, second half as one container — mixed listing
    (0 until 50).foreach(c =>
      FrameTokenSource.writeFrameFile(dir, c.toLong, Ts, DecodePack.deepFrame(c.toLong)))
    FrameTokenSource.writeFramePack(dir, "pack_000000",
      (50 until NFrames).iterator.map(c => (c.toLong, Ts, DecodePack.deepFrame(c.toLong))))
    val packed = spark.read.format("graft-tokens").load(dir)
      .orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    val singles = sourceDf.orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
    assert(packed == singles)
  }

  // --- splittable-container coverage: the reader's hardest logic is the
  // mid-file sync resynchronization + slice-boundary ownership, so force
  // MANY slices (maxsplitbytes far below one record) and require output
  // identical to the unsplit read for every container generation -------

  private def packDirOf(write: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_split").toString
    write(dir)
    dir
  }

  private def readPack(dir: String, maxSplitBytes: Option[Long]): Seq[Seq[Any]] = {
    val r = spark.read.format("graft-tokens")
    maxSplitBytes.foreach(b => r.option("maxsplitbytes", b.toString))
    r.load(dir).orderBy(col("frame_id")).collect().map(_.toSeq).toSeq
  }

  test("v3 container under a tiny split size: many slices, identical output") {
    val dir = packDirOf(d => FrameTokenSource.writeFramePack(d, "pack_000000",
      (0 until NFrames).iterator.map(c => (c.toLong, Ts, DecodePack.deepFrame(c.toLong)))))
    // slice boundaries land inside record payloads AND headers
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = FrameTokenSource.listFrameFiles(dir, conf)
    val slices = FrameTokenSource.planSlices(files, 256L)
    assert(slices.length > 50, s"expected many slices, got ${slices.length}")
    val split = readPack(dir, Some(256L))
    val unsplit = readPack(dir, None)
    assert(split == unsplit)
    assert(split.size == sourceDf.count())
  }

  test("v2 container (constant GFRM sync) still reads, split and unsplit") {
    val dir = packDirOf(d => FrameTokenSource.writeFramePackV2(d, "pack_000000",
      (0 until NFrames).iterator.map(c => (c.toLong, Ts, DecodePack.deepFrame(c.toLong)))))
    val split = readPack(dir, Some(256L))
    val unsplit = readPack(dir, None)
    assert(split == unsplit)
    assert(split == sourceDf.orderBy(col("frame_id")).collect().map(_.toSeq).toSeq)
  }

  test("v1 legacy container under a multi-slice plan: head slice reads all") {
    val dir = packDirOf(d => FrameTokenSource.writeFramePackV1(d, "pack_000000",
      (0 until NFrames).iterator.map(c => (c.toLong, Ts, DecodePack.deepFrame(c.toLong)))))
    val conf = new org.apache.hadoop.conf.Configuration()
    val slices = FrameTokenSource.planSlices(
      FrameTokenSource.listFrameFiles(dir, conf), 256L)
    assert(slices.length > 50, "v1 file must still be PLANNED as multiple slices")
    val split = readPack(dir, Some(256L)) // only the head slice emits rows
    val unsplit = readPack(dir, None)
    assert(split == unsplit)
    assert(split == sourceDf.orderBy(col("frame_id")).collect().map(_.toSeq).toSeq)
  }

  test("v3 survives payloads that embed a v2 'GFRM' marker (random sync immune)") {
    // a frame whose payload contains the v2 constant marker + a plausible
    // header — a v2 split reader could resync on it; v3's per-file random
    // sync cannot collide with it
    val poison = ("AAAA".getBytes ++ "GFRM".getBytes ++
      Array.fill[Byte](20)(7) ++ "BBBB".getBytes)
    val frames = (0 until 20).map { c =>
      (c.toLong, Ts, if (c % 3 == 0) poison else DecodePack.deepFrame(c.toLong))
    }
    val dir = packDirOf(d =>
      FrameTokenSource.writeFramePack(d, "pack_000000", frames.iterator))
    // poison frames decode to no tokens; real frames must all survive a
    // split read at slice sizes that start inside the poison payloads
    val split = readPack(dir, Some(64L))
    val unsplit = readPack(dir, None)
    assert(split == unsplit)
    val expected = frames.count(f => f._3.length > 100) // deep frames only
    assert(split.map(_.head.asInstanceOf[Long]).distinct.size >= expected)
  }

  test("truncated v3 container fails as a corrupt chain, not a raw EOF") {
    val dir = packDirOf(d => FrameTokenSource.writeFramePack(d, "pack_000000",
      (0 until 5).iterator.map(c => (c.toLong, Ts, DecodePack.deepFrame(c.toLong)))))
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".binpack")).get
    val raf = new java.io.RandomAccessFile(f, "rw")
    try raf.setLength(f.length() - 10) finally raf.close() // kill the tail record
    // the local FS checksum sidecar no longer matches the shortened file
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".crc"))
      .foreach(_.delete())
    val ex = intercept[Exception] {
      spark.read.format("graft-tokens").load(dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("corrupt container chain")),
      s"expected a corrupt-chain failure, got: ${messages(ex).mkString(" | ")}")
  }

  test("scan reports statistics; a pushed-TopN source side broadcasts without a hint") {
    // raw listing bytes flow into Catalyst
    val stats = scanOf(sourceDf).estimateStatistics()
    val expected = new java.io.File(framesDir).listFiles()
      .filter(f => f.getName.endsWith(".bin") || f.getName.endsWith(".binpack"))
      .map(_.length()).sum // not the .crc sidecars the local FS writes
    assert(stats.sizeInBytes().getAsLong == expected)

    // a pushed TopN caps both rows and bytes → the planner broadcasts
    // this side on its own (no broadcast() hint anywhere); without
    // reported statistics a DSv2 relation defaults to an effectively
    // infinite size and is never broadcast-eligible
    val dim = sourceDf.filter(col("liquidity") >= 35000.0)
      .orderBy(col("liquidity").desc).limit(20)
      .select(col("frame_id"), col("symbol"))
    val fact = spark.range(10000).toDF("frame_id")
    val joined = fact.join(dim, "frame_id")
    assert(joined.count() == 20)
    // a join has exchanges → AQE wraps it; the final plan is inside
    val plan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val hasBroadcast = plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(hasBroadcast, "pushed-TopN source side should broadcast from its stats")
  }

  test("micro-batch stream replays the same rows as the batch read") {
    val q = spark.readStream.format("graft-tokens").load(framesDir)
      .writeStream.format("memory").queryName("src_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_src_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("src_stream")
    assert(streamed.count() == sourceDf.count())
    val s = streamed.select("frame_id", "symbol", "liquidity")
      .orderBy("frame_id").collect().map(_.toSeq).toSeq
    val b = sourceDf.select("frame_id", "symbol", "liquidity")
      .orderBy("frame_id").collect().map(_.toSeq).toSeq
    assert(s == b)
  }
}
