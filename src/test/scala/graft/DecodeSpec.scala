package graft

import graft.decode._
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Decoder goldens mirroring the reference's decode tests
  * (tests/test_decode_pair.py, tests/test_edge_cases.py:25-48) plus
  * end-to-end frame fixtures per FIXTURES.md §A4/§A5.
  */
class DecodeSpec extends AnyFunSuite {

  private def record(ok: Long = 7, qty: Double = 17.0): Wire.WireRecord =
    Wire.WireRecord(
      Seq(s"cNO", s"dex${ok % 10}", s"pairaddr$ok", s"name42", "SYMX", s"addr${ok}x1"),
      Array(qty, 12345.67, 0.05, 0.02, 42.0, 3.0, 1700000000.0, 0.0))

  test("decodePair roundtrips strings and doubles bit-exact") {
    val enc = java.util.Arrays.copyOf(Wire.encodeRecord(record()), 512)
    val p = LegacyDecoder.decodePair(enc).get
    assert(p.chain == "cNO" && p.protocol == "dex7" && p.pair_address == "pairaddr7")
    assert(p.base_token_name == "name42" && p.base_token_symbol == "SYMX")
    assert(p.base_token_address == "addr7x1")
    assert(p.price_data.get.current.contains(17.0))
    assert(p.price_data.get.usd.contains(12345.67))
    assert(p.price_data.get.change_24h.contains(0.05))
    assert(p.liquidity_data.get.usd.contains(0.02))
    assert(p.volume_data.get.h24.contains(42.0))
    assert(p.fdv.contains(3.0))
    assert(p.created_at.contains(1700000000L))
  }

  test("decodePair drops zero metrics (handle_double)") {
    val r = record().copy(metrics = Array(17.0, 12345.67, 0.0, 0.0, 42.0, 3.0, 1700000000.0, 0.0))
    val p = LegacyDecoder.decodePair(java.util.Arrays.copyOf(Wire.encodeRecord(r), 512)).get
    assert(p.price_data.get.change_24h.isEmpty)
    assert(p.liquidity_data.isEmpty)
  }

  test("decodePair is total on malformed input (test_decode_pair.py:26-33)") {
    assert(LegacyDecoder.decodePair(Array[Byte](-1, 0, 1)).isEmpty) // 0xff length
    assert(LegacyDecoder.decodePair("\nhello".getBytes).isEmpty) // short declared len
    assert(LegacyDecoder.decodePair(Array.empty[Byte]).isEmpty)
    assert(LegacyDecoder.decodePair("ping".getBytes).isEmpty)
    val noise = Array.fill[Byte](1024 * 1024)(0x41)
    LegacyDecoder.decodePair(noise) // must not throw
  }

  test("parseMessage requires preamble and pairs marker (protocol.py:381-390)") {
    assert(LegacyDecoder.parseMessage("garbage".getBytes).isEmpty)
    val noPairs = Wire.Preamble ++ Array.fill[Byte](100)(0x01)
    assert(LegacyDecoder.parseMessage(noPairs).isEmpty)
  }

  test("parseMessage decodes a 3-record frame via the 512 chunk scan") {
    val frame = Wire.encodeFrame(Seq(record(1), record(2), record(3)))
    val pairs = LegacyDecoder.parseMessage(frame)
    assert(pairs.length == 3)
    assert(pairs.map(_.pair_address) == Seq("pairaddr1", "pairaddr2", "pairaddr3"))
  }

  test("decodePairFromText classifies words (protocol.py:203-281)") {
    val text = "solana raydium COIN SomeTokenName 4Nd1mYvNmSdLk8T5dGtXhuKZFDRDk5WtyGL26Rqk6K8N extra"
    val p = LegacyDecoder.decodePairFromText(text.getBytes).get
    assert(p.protocol == "raydium")
    assert(p.base_token_symbol == "COIN")
    assert(p.base_token_address == "4Nd1mYvNmSdLk8T5dGtXhuKZFDRDk5WtyGL26Rqk6K8N")
    assert(p.base_token_name == "SomeTokenName")
  }

  test("frame with text markers routes chunks to the text parser") {
    // a 512 chunk containing "solana" must go text-mode inside decodePair
    val chunk = new Array[Byte](512)
    val text = "solana raydium MOON LongTokenName".getBytes
    System.arraycopy(text, 0, chunk, 0, text.length)
    val p = LegacyDecoder.decodePair(chunk)
    assert(p.nonEmpty && p.get.protocol == "raydium")
  }

  test("token extraction end-to-end: record fields + proximity enrichment") {
    // Layout: [pairs+20 header][numeric block][text with $SYMB, metadata]
    val nums = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nums.putDouble(0.004) // price range
    nums.putDouble(250000.0) // volume range (>=1e5)
    nums.putDouble(500.0) // makers range (10..999)
    val text = ("  $MOONY token data pumpfun 24h " +
      "So11111111111111111111111111111111111111112 " +
      "DjDzLNonA1XcWpzTBZhNZUqHCvq6SeLfT3otPYdVSMH " +
      "https://twitter.com/moony https://moony.io/home ").getBytes
    val frame = Wire.Preamble ++ Wire.PairsMarker ++ new Array[Byte](15) ++
      nums.array() ++ text
    val tokens = TokenExtractor.extractTokens(frame, 1700000000L)
    assert(tokens.nonEmpty)
    val t = tokens.find(_.symbol.contains("MOONY")).get
    assert(t.price.contains(0.004)) // offset-0 double, first-match-wins
    assert(t.volume_24h.nonEmpty && t.makers.nonEmpty) // set by the block
    assert(t.field_count >= 3)
    assert(t.confidence_score == math.min(0.7 + t.field_count * 0.05, 0.95))
    assert(t.quote_address.contains("So11111111111111111111111111111111111111112"))
    assert(t.token_address.contains("DjDzLNonA1XcWpzTBZhNZUqHCvq6SeLfT3otPYdVSMH"))
    assert(t.protocol.contains("pumpfun")) // within 220 bytes
    assert(t.age.contains("24h")) // within 180 bytes
    assert(t.twitter.contains("https://twitter.com/moony"))
    assert(t.website.contains("https://moony.io/home"))
    assert(t.timestamp.contains(1700000000L))
  }

  test("extractRealTokenNames: frequency ranking, blacklist, top-20") {
    val printable = "AAA BBB AAA AAA HTTP JSON $CCC ccc Word The And"
    val names = TokenExtractor.extractRealTokenNames(printable, 0)
    val symbols = names.values.toSet
    assert(symbols.contains("AAA")) // most frequent
    assert(!symbols.contains("HTTP") && !symbols.contains("JSON")) // blacklisted
    assert(!symbols.contains("THE") && !symbols.contains("AND")) // english stop-list
    // $CCC (ignorecase family) counts 'CCC' and lowercase 'ccc' together
    assert(symbols.contains("CCC"))
    assert(names.nonEmpty && names.size <= 20)
  }

  test("enhanced cluster scan finds price+volume+count windows (enhanced_protocol.py:78-156)") {
    val buf = java.nio.ByteBuffer.allocate(4096).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(256)
    buf.putDouble(0.0005) // price 0.0001..0.001
    buf.putDouble(50000.0) // volume 1000..1e7
    buf.putDouble(20.0) // count 10..50000
    val data = buf.array()
    val clusters = EnhancedDecoder.findNumericClusters(data)
    assert(clusters.nonEmpty)
    val cd = clusters.head._2
    assert(cd.prices.nonEmpty && cd.volumes.nonEmpty && cd.counts.nonEmpty)
  }

  test("decoders are total on arbitrary bytes") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(bytes)
      LegacyDecoder.parseMessage(bytes)
      LegacyDecoder.decodePair(bytes)
      EnhancedDecoder.parseMessage(bytes)
      TokenExtractor.extractTokens(bytes, 0L)
      ClusterExtractor.extractTokensViaClusters(bytes, 0L)
    }
  }

  test("ByteScan utilities (utils.py:15-108, :214-256)") {
    // validity gate: sentinels and bounds
    assert(!ByteScan.isValidFloat(0.0) && !ByteScan.isValidFloat(1.0) &&
      !ByteScan.isValidFloat(-1.0) && !ByteScan.isValidFloat(Double.NaN))
    assert(!ByteScan.isValidFloat(1e-16) && !ByteScan.isValidFloat(1e16))
    assert(ByteScan.isValidFloat(0.5) && ByteScan.isValidFloat(-42.0))

    val buf = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putDouble(0, 123.25)
    buf.putDouble(16, 0.0078125)
    val doubles = ByteScan.extractDoubles(buf.array())
    assert(doubles.contains(123.25) && doubles.contains(0.0078125))
    assert(ByteScan.extractDoubles(buf.array(), count = 1).length == 1)
    val fbuf = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fbuf.putFloat(0, 2.5f)
    assert(ByteScan.extractFloats(fbuf.array()).contains(2.5))

    // clustering: chained 5% tolerance, singletons dropped, sorted input
    val clusters = ByteScan.clusterNumericValues(Seq(100.0, 104.0, 103.0, 500.0, 501.0, 9999.0))
    assert(clusters == Seq(Seq(100.0, 103.0, 104.0), Seq(500.0, 501.0)))
    assert(ByteScan.clusterNumericValues(Nil).isEmpty)
    assert(ByteScan.clusterNumericValues(Seq(1.0, 50.0)).isEmpty) // singletons only
  }

  // ---- D13/D14 symbol-election goldens (scraper.py:960-1316) ----

  import ClusterExtractor.SymbolHit

  test("D13: family confidences, whitelist/blacklist, frequency scaling") {
    val text = "SOL NOVA NOVA NOVA HTTP $MEME name: pixel Phantom the "
    val hits = ClusterExtractor.extractTokenSymbols(text, 0)
    def hit(sym: String) = hits.find(_.symbol == sym).get
    assert(hit("SOL").symType == "whitelisted" && hit("SOL").confidence == 0.95)
    // crypto_symbol with count 3: min(0.7 + 0.15, 0.9) = 0.85
    assert(hit("NOVA").symType == "crypto_symbol" && hit("NOVA").confidence == 0.85
      && hit("NOVA").frequency == 3)
    assert(!hits.exists(_.symbol == "HTTP")) // blacklisted
    assert(hit("MEME").symType == "dollar_prefixed" && hit("MEME").confidence == 0.9)
    // context family uppercases; mixed-case keeps original casing
    assert(hit("PIXEL").symType == "context_based" && hit("PIXEL").confidence == 0.8)
    assert(hit("Phantom").symType == "mixed_case" && hit("Phantom").confidence == 0.5)
    assert(!hits.exists(_.symbol.equalsIgnoreCase("the"))) // stop-word
    // sorted by confidence desc
    assert(hits.map(_.confidence) == hits.map(_.confidence).sortBy(-(_: Double)))
  }

  test("D14: election prefers whitelisted > dollar > context > crypto (scraper.py:1276-1285)") {
    def h(sym: String, t: String, conf: Double, freq: Int = 1) =
      SymbolHit(sym, 0, t, conf, freq)
    // whitelisted 0.95+0.5 = 1.45 beats dollar 0.9+0.3 = 1.2
    assert(ClusterExtractor.extractBestTokenSymbol(
      Vector(h("MEME", "dollar_prefixed", 0.9), h("SOL", "whitelisted", 0.95)), 0) == "SOL")
    // frequency bonus min(freq*0.02, 0.2): crypto 0.9+0.2+0.1 beats dollar
    // 0.9+0.3 by one ulp — Python's float arithmetic is identical, so the
    // reference elects the same symbol
    assert(ClusterExtractor.extractBestTokenSymbol(
      Vector(h("DLR", "dollar_prefixed", 0.9), h("FRQ", "crypto_symbol", 0.9, 100)), 0) == "FRQ")
    // single letters skipped unless whitelisted; 1-char whitelisted fails
    // the 2-10 length accept and falls through to tokens[0]
    assert(ClusterExtractor.extractBestTokenSymbol(
      Vector(h("X", "crypto_symbol", 0.9), h("AB", "crypto_symbol", 0.7)), 0) == "AB")
    // non-alnum symbols skipped, next candidate elected, uppercased
    assert(ClusterExtractor.extractBestTokenSymbol(
      Vector(h("a!b", "crypto_symbol", 0.9), h("fine", "mixed_case", 0.5)), 0) == "FINE")
    // underscore/dash are stripped before the alnum check
    assert(ClusterExtractor.extractBestTokenSymbol(
      Vector(h("a_b-c", "crypto_symbol", 0.9)), 0) == "A_B-C")
    // empty → UNKNOWN_{i:02d}
    assert(ClusterExtractor.extractBestTokenSymbol(Vector.empty, 3) == "UNKNOWN_03")
    assert(ClusterExtractor.extractBestTokenSymbol(Vector.empty, 12) == "UNKNOWN_12")
  }

  test("cluster classification elif shadows (scraper.py:766-828)") {
    import ClusterExtractor.NumVal
    def one(v: Double, dt: String) =
      ClusterExtractor.classifyNumericValues(Vector(NumVal(0, v, dt)))
    assert(one(0.05, "double").prices.nonEmpty)
    // uint32 in txns range always lands in txns, never makers
    assert(one(300.0, "uint32").txns.nonEmpty && one(300.0, "uint32").makers.isEmpty)
    // floats in [10, 15000] land in makers (txns is uint32-only)
    assert(one(300.0, "float").makers.nonEmpty)
    // volumes (1e5..1e7) shadow the low market-cap range
    assert(one(200000.0, "double").volumes.nonEmpty && one(200000.0, "double").marketCaps.isEmpty)
    assert(one(2.0e7, "double").marketCaps.nonEmpty) // only (1e7, 5e7] reaches mcap
    assert(one(-5.0, "double").percentages.nonEmpty)
    assert(one(0.005, "double").prices.nonEmpty) // price, not percentage
    assert(one(1e11, "double").fieldTypes == 0) // valid but unclassifiable
  }

  test("A5: percentages map to change columns in position order (scraper.py:1427-1436)") {
    import ClusterExtractor._
    val pcts = Vector(NumVal(10, -5.0, "float"), NumVal(20, 7.5, "float"),
      NumVal(30, -2.5, "float"), NumVal(40, 100.0, "float"), NumVal(50, 999.0, "float"))
    val cl = Cluster(0, 500, pcts, Classified(
      Vector(NumVal(1, 0.01, "double")), Vector(NumVal(2, 1500, "uint32")),
      Vector.empty, Vector(NumVal(3, 2e5, "double")), Vector.empty, Vector.empty, pcts))
    val rec = TokenRecord(cl, Vector.empty, Vector.empty, Vector.empty, 0.6)
    val p = ClusterExtractor.buildTokenProfile(rec, 0)
    assert(p.change_5m.contains(-5.0) && p.change_1h.contains(7.5)
      && p.change_6h.contains(-2.5) && p.change_24h.contains(100.0)) // 5th dropped
    assert(p.symbol.contains("UNKNOWN_00"))
    assert(p.record_span.contains(500))
  }

  test("decodePairSlice ≡ decodePair-on-copy at arbitrary offsets (incl. alignment + marker scan)") {
    val rnd = new scala.util.Random(4711)
    // structured chunks (real records), text-marker chunks, and noise —
    // embedded at random offsets in a larger shared buffer
    val chunks: Seq[Array[Byte]] =
      (0 until 30).map(i => java.util.Arrays.copyOf(
        Wire.encodeRecord(record(i.toLong, 5.0 + i)), 512)) ++
      Seq("solana raydium tok%029d TKAB Nmlong".format(7L).getBytes("UTF-8"),
        "PUMP mixed CASE raydium".getBytes("UTF-8"),
        "sol ana pu mp".getBytes("UTF-8")) ++
      (0 until 30).map { _ =>
        val b = new Array[Byte](512); rnd.nextBytes(b); b
      }
    chunks.foreach { chunk =>
      val off = rnd.nextInt(64) * 8 + rnd.nextInt(3) // aligned and misaligned
      val buf = new Array[Byte](off + chunk.length + 17)
      rnd.nextBytes(buf)
      System.arraycopy(chunk, 0, buf, off, chunk.length)
      val sliced = LegacyDecoder.decodePairSlice(buf, off, off + chunk.length)
      val copied = LegacyDecoder.decodePair(
        java.util.Arrays.copyOfRange(buf, off, off + chunk.length))
      assert(sliced == copied, s"slice/copy divergence at off=$off")
    }
  }

  test("D8 slice kernel ≡ reference scan semantics at arbitrary offsets (incl. early exit)") {
    // Test-local oracle: the original Option-based transcription of
    // scraper.py:587-674 — full scans, no early exit, fresh copy. The
    // production kernel (extractValidatedTokenRecordSlice) must be
    // byte-identical on every input, including buffers that bind all six
    // fields early (where its early exit skips reads the oracle makes —
    // first-match-wins means those reads can't change anything).
    def oracle(name: String, rec: Array[Byte], pos: Int) = {
      var price = Option.empty[Double]; var volume = Option.empty[Double]
      var txns = Option.empty[Int]; var makers = Option.empty[Int]
      var liquidity = Option.empty[Double]; var marketCap = Option.empty[Double]
      def classify(v: Double): Unit = {
        if (v >= 0.000001 && v <= 0.1) { if (price.isEmpty) price = Some(v) }
        else if (v >= 1000 && v <= 10000000) {
          if (v >= 1000000 && marketCap.isEmpty) marketCap = Some(v)
          else if (v >= 100000 && volume.isEmpty) volume = Some(v)
          else if (liquidity.isEmpty) liquidity = Some(v)
        } else if (v >= 10 && v <= 50000) {
          if (v >= 1000 && txns.isEmpty) txns = Some(v.toInt)
          else if (makers.isEmpty) makers = Some(v.toInt)
        }
      }
      var off = 0
      while (off < rec.length - 8) { classify(Wire.readDoubleLE(rec, off)); off += 1 }
      off = 0
      while (off < rec.length - 4) { classify(Wire.readFloatLE(rec, off).toDouble); off += 1 }
      off = 0
      while (off < rec.length - 4) {
        val v = Wire.readUInt32LE(rec, off)
        if (v >= 1000 && v <= 50000 && txns.isEmpty) txns = Some(v.toInt)
        else if (v >= 10 && v <= 1000 && makers.isEmpty) makers = Some(v.toInt)
        off += 1
      }
      val fc = Seq(price, volume, txns, makers, liquidity, marketCap).count(_.nonEmpty)
      if (fc >= 3)
        Some(graft.model.TokenProfile(symbol = Some(name), price = price,
          volume_24h = volume, txns_24h = txns, makers = makers,
          liquidity = liquidity, market_cap = marketCap,
          confidence_score = math.min(0.7 + fc * 0.05, 0.95), field_count = fc,
          record_position = Some(pos)))
      else None
    }
    val rnd = new scala.util.Random(20261)
    // dense plants (bind everything early, then more in-range bytes
    // follow: exercises the early exit), sparse plants, and pure noise
    val dense = {
      val b = java.nio.ByteBuffer.allocate(96).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putDouble(0, 0.05); b.putDouble(8, 2000000.0); b.putDouble(16, 200000.0)
      b.putDouble(24, 5000.0); b.putDouble(32, 2000.0); b.putDouble(40, 500.0)
      b.putDouble(48, 0.07); b.putDouble(56, 3000000.0); b.putInt(64, 1500)
      b.putInt(68, 900); b.putFloat(72, 150000f); b.putFloat(76, 0.02f)
      b.array()
    }
    val recs: Seq[Array[Byte]] = Seq(dense, dense.take(40), Array.empty[Byte],
      new Array[Byte](7)) ++
      (0 until 80).map { _ => val b = new Array[Byte](rnd.nextInt(1000)); rnd.nextBytes(b); b }
    recs.foreach { rec =>
      val off = rnd.nextInt(200)
      val buf = new Array[Byte](off + rec.length + 13)
      rnd.nextBytes(buf)
      System.arraycopy(rec, 0, buf, off, rec.length)
      val sliced = TokenExtractor.extractValidatedTokenRecordSlice(
        "TK", buf, off, off + rec.length, 7)
      assert(sliced == oracle("TK", rec, 7),
        s"D8 slice/reference divergence at off=$off len=${rec.length}")
    }
  }

  test("hasTextMarker ≡ printable-projection contains() on random and crafted bytes") {
    val rnd = new scala.util.Random(42)
    def oracle(b: Array[Byte]): Boolean = {
      val p = Wire.printable(b); val l = p.toLowerCase
      p.contains("solana") || l.contains("pump") || l.contains("raydium")
    }
    val crafted = Seq(
      "solana", "SOLANA", "Pump", "pUmP", "RAYDIUM", "raydium", "sol ana",
      "xxpumpxx", "ray dium", "s", "", "RaYdIuM!").map(_.getBytes("UTF-8")) ++
      (0 until 200).map { _ =>
        val b = new Array[Byte](rnd.nextInt(600)); rnd.nextBytes(b); b }
    crafted.foreach { b =>
      assert(Wire.hasTextMarker(b, 0, b.length) == oracle(b),
        s"marker divergence on ${b.take(24).mkString(",")}")
    }
  }

  test("codegen expression decode ≡ typed decode (pairs and tokens)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    implicit val frameEnc: org.apache.spark.sql.Encoder[Decode.Frame] =
      org.apache.spark.sql.Encoders.product[Decode.Frame]
    val frames = (0L until 40L).map { i =>
      Decode.Frame(i, Wire.encodeFrame((0 until 5).map(j =>
        record(i * 10 + j, 1.5 + j))), 1700000000L)
    }
    val ds = spark.createDataset(frames)
    val typed = Decode.pairsLegacyOnly(ds).toDF().orderBy("frame_id", "pair_address")
    val expr = Decode.pairsLegacyOnlyDF(ds).orderBy("frame_id", "pair_address")
    assert(typed.schema == expr.schema)
    assert(typed.collect().toSeq == expr.collect().toSeq)

    val deepFrames = spark.createDataset((1L to 50L).map(c =>
      Decode.Frame(c, graft.queries.DecodePack.deepFrame(c), 1700000000L)))
    // typed reference form of Decode.tokens (pre-promotion), inlined here
    implicit val enc: org.apache.spark.sql.Encoder[(Long, TokenProfile)] =
      org.apache.spark.sql.Encoders.product[(Long, TokenProfile)]
    val typedTokens = deepFrames
      .flatMap(f => TokenExtractor.extractTokens(f.frame, f.extraction_ts)
        .map(t => (f.frame_id, t)))
      .toDF("frame_id", "token")
      .select(org.apache.spark.sql.functions.col("frame_id"),
        org.apache.spark.sql.functions.col("token.*"))
      .orderBy("frame_id")
    val exprTokens = Decode.tokens(spark, deepFrames).orderBy("frame_id")
    assert(typedTokens.schema == exprTokens.schema)
    assert(typedTokens.collect().toSeq == exprTokens.collect().toSeq)
  }

  test("profile folds: txns/volume take max, price/liquidity first (scraper.py:1409-1425)") {
    import ClusterExtractor._
    val cl = Cluster(100, 600, Vector.empty, Classified(
      prices = Vector(NumVal(1, 0.002, "double"), NumVal(2, 0.09, "double")),
      txns = Vector(NumVal(3, 1200, "uint32"), NumVal(4, 9000, "uint32"), NumVal(5, 500, "uint32")),
      makers = Vector(NumVal(6, 700.0, "float")),
      volumes = Vector(NumVal(7, 2e5, "double"), NumVal(8, 9e5, "double"), NumVal(9, 3e5, "double")),
      liquidity = Vector(NumVal(10, 5e4, "double"), NumVal(11, 9e4, "double")),
      marketCaps = Vector.empty, percentages = Vector.empty))
    val p = ClusterExtractor.buildTokenProfile(
      TokenRecord(cl, Vector.empty, Vector.empty, Vector.empty, 0.7), 1)
    assert(p.price.contains(0.002)) // first by position
    assert(p.txns_24h.contains(9000)) // max
    assert(p.volume_24h.contains(9e5)) // max
    assert(p.liquidity.contains(5e4)) // first
    assert(p.makers.contains(700))
    assert(p.field_count == 5) // price+volume+txns+makers+liquidity
    assert(p.confidence_score == 0.7)
  }
}
