package graft

import graft.decode.{ByteScan, ClusterExtractor, LegacyDecoder, TokenExtractor}
import graft.functions.{ScoredId, TopKAgg}
import graft.sinks.PyFormat
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.3), driven by seeded generators
  * so failures reproduce: decoders total on arbitrary bytes, top-k
  * aggregate ≡ sort-take under any merge tree, float repr round-trips,
  * clustering partition laws, classifier bucket exclusivity.
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)

  test("decoders never throw on arbitrary bytes (total functions)") {
    (1 to 100).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(bytes)
      LegacyDecoder.parseMessage(bytes)
      LegacyDecoder.decodePair(bytes)
      LegacyDecoder.parseVariableLength(bytes)
      TokenExtractor.extractTokens(bytes, 0L)
      ClusterExtractor.extractTokensViaClusters(bytes, 0L)
      ByteScan.extractDoubles(bytes)
      ByteScan.extractFloats(bytes)
    }
  }

  test("TopKAgg ≡ sort-take for any input order and any merge split") {
    (1 to 200).foreach { _ =>
      val rows = List.fill(rnd.nextInt(40))(
        ScoredId(rnd.nextInt(50).toLong, math.rint(rnd.nextDouble() * 20) / 20.0))
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKAgg(k)
      val expected = rows.sortBy(s => (-s.score, s.id)).take(k)
      val sequential = rows.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(sequential) == expected, s"k=$k rows=$rows")
      val (l, r) = rows.splitAt(if (rows.isEmpty) 0 else rnd.nextInt(rows.length + 1))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == expected, s"merge split k=$k rows=$rows")
    }
  }

  test("media codecs roundtrip arbitrary content and never throw on arbitrary bytes") {
    import graft.ext.{AudioCodec, ImageCodec, VideoCodec}
    (1 to 60).foreach { _ =>
      // WAV: random PCM16 mono at a random rate
      val samples = Array.fill(rnd.nextInt(500) + 1)(rnd.nextInt().toShort)
      val rate = rnd.nextInt(96000) + 1
      val audio = AudioCodec.decodeWav(AudioCodec.encodeWav(rate, samples))
      assert(audio.exists(a => a.sampleRate == rate && a.samples.toSeq == samples.toSeq))

      // Y4M: random luma planes and geometry
      val (w, h) = (rnd.nextInt(20) + 1, rnd.nextInt(20) + 1)
      val nf = rnd.nextInt(4) + 1
      val planes = Array.fill(nf, w * h)(rnd.nextInt(256))
      val video = VideoCodec.decodeY4m(VideoCodec.encodeY4m(w, h, 25, 1,
        (0 until nf).map(f => (x: Int, y: Int) => planes(f)(y * w + x))))
      assert(video.exists(v => v.width == w && v.height == h &&
        v.frames.zip(planes).forall { case (a, b) => a.toSeq == b.toSeq }))

      // all three decoders are total on garbage
      val junk = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(junk)
      AudioCodec.decodeWav(junk)
      VideoCodec.decodeY4m(junk)
      ImageCodec.decode(junk)
    }
  }

  test("int8Quantize: range bound, max-magnitude hits ±127, zero vector, exact-int agreement") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextInt(4001) - 2000L))
    } :+ (200L, Seq.fill(16)(0L))
    val got = vecs.toDF("id", "v")
      .select(col("id"), col("v"), graft.ext.VectorOps.int8Quantize(col("v")).as("q8"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Long](1)
      val q = r.getSeq[Long](2)
      assert(q.forall(x => x >= -127 && x <= 127), s"out of int8 range: $q")
      val m = v.map(math.abs).max
      if (m == 0) assert(q.forall(_ == 0L))
      else {
        // the engine's floor(double) must equal exact integer arithmetic
        val want = v.map(x =>
          if (x < 0) -((-x * 254 + m) / (2 * m)) else (x * 254 + m) / (2 * m))
        assert(q == want, s"v=$v m=$m")
        assert(q.map(math.abs).max == 127, "max-magnitude dim must quantize to ±127")
      }
    }
  }

  test("pyFloatRepr round-trips doubles across magnitudes") {
    val edge = Seq(0.0, -0.0, 1e-320, 123456.789, 0.1, 2e16, 1e16 - 2.0,
      9.999999999999999e15, 1e-4, 9.5e-5, Double.MinPositiveValue)
    val randoms = (1 to 500).map(_ =>
      java.lang.Double.longBitsToDouble(rnd.nextLong())).filterNot(d => d.isNaN || d.isInfinite)
    (edge ++ randoms).foreach { v =>
      val s = PyFormat.pyFloatRepr(v)
      assert(java.lang.Double.parseDouble(s) == v,
        s"repr $s of ${java.lang.Double.toHexString(v)}")
    }
  }

  test("value clustering: ascending chains within tolerance, disjoint sub-multiset") {
    (1 to 100).foreach { _ =>
      val values = List.fill(rnd.nextInt(60))(math.pow(10, rnd.nextDouble() * 9 - 3))
      val clusters = ByteScan.clusterNumericValues(values)
      clusters.foreach { c =>
        assert(c.length >= 2)
        c.sliding(2).foreach {
          case Seq(a, b) => assert(b >= a && (b - a) / math.abs(a) <= 0.05 + 1e-12)
          case _ =>
        }
      }
      val flat = clusters.flatten
      val counts = values.groupBy(identity).view.mapValues(_.length).toMap
      flat.groupBy(identity).foreach { case (v, occ) =>
        assert(occ.length <= counts(v))
      }
    }
  }

  test("classifier assigns at most one bucket per value (elif exclusivity)") {
    val dtypes = Seq("double", "float", "uint32")
    (1 to 2000).foreach { _ =>
      val v = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1300 - 200
        case 1 => rnd.nextDouble() * 6e7
        case 2 => math.pow(10, rnd.nextDouble() * 14 - 7)
        case _ => -math.pow(10, rnd.nextDouble() * 6 - 3)
      }
      val dt = dtypes(rnd.nextInt(3))
      val cl = ClusterExtractor.classifyNumericValues(
        Vector(ClusterExtractor.NumVal(0, v, dt)))
      assert(cl.buckets.map(_.length).sum <= 1, s"v=$v dt=$dt")
    }
  }

  test("span dedup ≡ brute-force reference on random corpora with planted sharing") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val W = 8
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj")
    // brute force: dup shingles by string equality, per-doc island merge
    def bruteSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
      val occ = docs.flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        (0 to t.length - W).map(p => (id, p, t.slice(p, p + W).mkString(" ")))
      }
      val dup = occ.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      occ.filter(o => dup(o._3)).groupBy(_._1).flatMap { case (id, os) =>
        val ps = os.map(_._2).distinct.sorted
        val islands = ps.foldLeft(List.empty[List[Int]]) {
          case (Nil, p)                                  => List(List(p))
          case (cur :: done, p) if p <= cur.head + W     => (p :: cur) :: done
          case (done, p)                                 => List(p) :: done
        }
        islands.map { isl =>
          val s = isl.min.toLong; val e = isl.max.toLong + (W - 1)
          (id, s, e, e - s + 1)
        }
      }.toSet
    }
    (1 to 8).foreach { trial =>
      val nDocs = 6 + rnd.nextInt(8)
      val docs = (0 until nDocs).foldLeft(Vector.empty[(Long, String)]) { (acc, i) =>
        val own = Vector.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        // planted sharing: sometimes splice a slice of an earlier doc in
        val toks =
          if (acc.nonEmpty && rnd.nextBoolean()) {
            val src = acc(rnd.nextInt(acc.size))._2.split(" ", -1).toVector
            val from = rnd.nextInt(math.max(1, src.length - W))
            val len = W + rnd.nextInt(6)
            val cut = rnd.nextInt(own.length + 1)
            own.take(cut) ++ src.slice(from, math.min(src.length, from + len)) ++ own.drop(cut)
          } else own
        acc :+ (i.toLong -> toks.mkString(" "))
      }
      Caches.scoped {
        val df = docs.toDF("doc_id", "text")
        val occ = graft.queries.CurationPack.spanOccurrences(df)
        val dup = occ.groupBy($"sh")
          .agg(org.apache.spark.sql.functions.min($"doc_id").as("mn"),
            org.apache.spark.sql.functions.max($"doc_id").as("mx"))
          .filter($"mn" =!= $"mx").select($"sh")
        val got = graft.queries.CurationPack
          .spansFromHits(occ.join(dup, "sh").select($"doc_id", $"pos"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(got == bruteSpans(docs), s"trial=$trial docs=$docs")
      }
    }
  }

  // ---- permessage-deflate codec (RFC 7692) -------------------------

  import graft.sources.Rfc6455

  /** One raw server→client frame (unmasked), with explicit FIN —
    * [[Rfc6455.writeFrame]] never fragments on send, so the
    * fragmentation properties hand-roll the wire form here.
    */
  private def rawFrame(fin: Boolean, rsv1: Boolean, opcode: Int,
      payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write((if (fin) 0x80 else 0x00) | (if (rsv1) 0x40 else 0x00) | (opcode & 0x0f))
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n < (1 << 16)) { out.write(126); out.write(n >>> 8); out.write(n & 0xff) }
    else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    out.write(payload)
    out.toByteArray
  }

  private def deflatePayload(trial: Int): Array[Byte] = (trial % 5) match {
    case 0 => Array.empty[Byte]
    case 1 => Array.fill(1 + rnd.nextInt(64))('a'.toByte)
    case 2 => // repetitive text — exercises cross-message window back-references
      ("the quick brown fox " * (1 + rnd.nextInt(200))).getBytes("UTF-8")
    case 3 => { val b = new Array[Byte](rnd.nextInt(4096)); rnd.nextBytes(b); b }
    case _ => { val b = new Array[Byte](66000); rnd.nextBytes(b); b } // 64-bit length form
  }

  test("permessage-deflate round-trips under random fragmentation, both takeover modes") {
    for (noTakeover <- Seq(false, true)) {
      val defl = new Rfc6455.PmdDeflater(noTakeover)
      val inflater = new Rfc6455.PmdInflater(Rfc6455.PmdParams(noTakeover))
      val payloads = (0 until 40).map(deflatePayload)
      // one shared stream: context takeover (the default) carries the
      // 32 KB window ACROSS messages, so order and completeness matter
      val wire = new java.io.ByteArrayOutputStream()
      payloads.foreach { p =>
        val comp = defl(p)
        // split the compressed body into 1..4 fragments at random cuts;
        // rsv1 only on the first frame; sometimes a ping interleaves
        // mid-fragment (§5.5 — control frames may)
        val nFrag = 1 + rnd.nextInt(4)
        val cuts = (Seq(0, comp.length) ++
          Seq.fill(nFrag - 1)(if (comp.length == 0) 0 else rnd.nextInt(comp.length + 1)))
          .sorted.distinct
        val frags0 = cuts.zip(cuts.tail).map { case (a, b) => comp.slice(a, b) }
        val frags = if (frags0.isEmpty) Seq(Array.empty[Byte]) else frags0
        frags.zipWithIndex.foreach { case (f, i) =>
          if (i > 0 && rnd.nextBoolean())
            wire.write(rawFrame(fin = true, rsv1 = false, Rfc6455.OpPing, Array[Byte](7)))
          wire.write(rawFrame(fin = i == frags.length - 1, rsv1 = i == 0,
            if (i == 0) Rfc6455.OpBinary else 0x0, f))
        }
      }
      val in = new java.io.ByteArrayInputStream(wire.toByteArray)
      var pings = 0
      payloads.foreach { want =>
        val got = Rfc6455.readMessage(in,
          onControl = (op, _) => if (op == Rfc6455.OpPing) pings += 1,
          inflate = Some(inflater))
        assert(got.isDefined && got.get._1 == Rfc6455.OpBinary)
        assert(java.util.Arrays.equals(got.get._2, want),
          s"deflate roundtrip diverged (noTakeover=$noTakeover, len=${want.length})")
      }
      assert(Rfc6455.readMessage(in, inflate = Some(inflater)).isEmpty) // clean EOF
    }
  }

  test("permessage-deflate adversarial frames: trailing garbage, un-negotiated RSV1") {
    val defl = new Rfc6455.PmdDeflater()
    val inflater = new Rfc6455.PmdInflater(Rfc6455.PmdParams(false))
    // bytes AFTER a complete deflate block must fail loudly, not be
    // silently dropped (they would desynchronize the shared window)
    val garbage = defl("hello".getBytes("UTF-8")) ++ Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    // depending on where the junk lands in the bit stream, the inflater
    // either rejects it as a corrupt block (DataFormatException) or
    // stops at the sync point with input remaining (the require) — both
    // are LOUD failures; silence is the bug being guarded against
    val e = intercept[Exception] { inflater(garbage) }
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[java.util.zip.DataFormatException], e.toString)
    // RSV1 without a negotiated inflater is a protocol error, never data
    val wire = rawFrame(fin = true, rsv1 = true, Rfc6455.OpBinary,
      new Rfc6455.PmdDeflater()("x".getBytes("UTF-8")))
    intercept[IllegalStateException] {
      Rfc6455.readMessage(new java.io.ByteArrayInputStream(wire), inflate = None)
    }
  }

  test("inflater accepts a real small-window (wbits=9) peer stream with context takeover") {
    // The JDK deflater always writes a 32 KB window, so a SMALL-window
    // peer can't be produced in-process — these bytes are a checked-in
    // zlib stream (compressobj(6, DEFLATED, -9), two messages, sync-
    // flushed, tails stripped) as a server that negotiated
    // server_max_window_bits=9 would send. Message 2 is 21 bytes for
    // 1764 plaintext bytes — almost entirely back-references into
    // message 1's window, so this also proves cross-message context
    // takeover against a foreign compressor.
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val b1 = unhex("2ac94855282ccd4cce56482aca2fcf5348cbaf50c82acd2d2856c82f4b2d5228014ae72456552aa4e4a78339a36a47d58eaa1d553baa7654ed50500b00")
    val b2 = unhex("1a553baa7654eda8da51b5a36a87a5dac4cc1c0000")
    val m1 = ("the quick brown fox jumps over the lazy dog " * 40).getBytes("UTF-8")
    val m2 = (("the quick brown fox jumps over the lazy dog " * 40) + "tail").getBytes("UTF-8")
    val inflater = new Rfc6455.PmdInflater(Rfc6455.PmdParams(serverNoContextTakeover = false))
    assert(java.util.Arrays.equals(inflater(b1), m1))
    assert(java.util.Arrays.equals(inflater(b2), m2))
  }

  test("deflate golden interop: Python-zlib streams at wbits 9..15, empty-after-sync-flush both directions") {
    // The corpus is generated and cross-verified by
    // tools/gen_deflate_golden.py against CPython's zlib (a second real
    // RFC 1951 implementation driven independently of the JDK):
    //   wb=N msg=i  — compressobj(6, DEFLATED, -N) WITH context
    //                 takeover over the fixed message sequence, sync-
    //                 flushed and tail-stripped per RFC 7692 §7.2.1;
    //   ours msg=i  — our PmdDeflater's exact bytes for the same
    //                 sequence, verified by zlib.decompressobj(-15) at
    //                 generation time (`verify-ours` mode).
    // Messages 1 and 3 are EMPTY: zlib emits only the sync marker
    // there, which strips to zero bytes, so the wire form is the 0x00
    // empty stored block — the seam the r10 send-path bug lived in —
    // and message 2 back-references across that empty message, proving
    // the shared window survives it in both implementations.
    // Message 5 (round-13): 36 KB filler + 64-byte copies at back
    // distances 700..24000, one per (2^k, 2^(k+1)] band — without it
    // every back-reference sat inside 512 B and the seven wb streams
    // were byte-identical, so the wb dimension wasn't really exercised.
    // Sequence is shared with the regeneration main (and mirrored in
    // tools/gen_deflate_golden.py).
    val messages = graft.tools.GenDeflateOurs.messages()
    val lines = scala.io.Source.fromResource("deflate_golden.txt")
      .getLines().filter(_.nonEmpty).map(_.split(" ")).toSeq
    def unhex(s: String): Array[Byte] =
      if (s == "empty") Array.empty
      else s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // direction A: a foreign compressor at EVERY legal server window
    // size (the JDK can't produce wbits<15 streams itself) must inflate
    // through our PmdInflater with context takeover
    for (wb <- 9 to 15) {
      val inflater = new Rfc6455.PmdInflater(Rfc6455.PmdParams(serverNoContextTakeover = false))
      val bodies = lines.filter(_(0) == s"wb=$wb").sortBy(_(1))
      assert(bodies.size == messages.size, s"corpus incomplete at wb=$wb")
      bodies.zip(messages).foreach { case (parts, want) =>
        assert(java.util.Arrays.equals(inflater(unhex(parts(2))), want),
          s"wb=$wb ${parts(1)} diverged")
      }
    }
    // the far-reference message must differ at EVERY window size — a
    // regenerated corpus whose matches all fit in 512 B would silently
    // stop exercising the wb dimension (the round-12 degeneracy)
    val lastMsg = s"msg=${messages.size - 1}"
    val farStreams = lines.filter(p => p(0).startsWith("wb=") && p(1) == lastMsg)
      .map(_(2)).toSet
    assert(farStreams.size == 7,
      s"far-ref corpus degenerate: ${farStreams.size} distinct streams of 7")
    // direction B: our PmdDeflater must keep producing the exact bytes
    // Python zlib verified — if a JDK change ever shifts its deflate
    // output, this fails loudly and the tool re-verifies fresh bytes
    val defl = new Rfc6455.PmdDeflater()
    val ours = lines.filter(_(0) == "ours").sortBy(_(1))
    assert(ours.size == messages.size, "ours corpus incomplete")
    ours.zip(messages).foreach { case (parts, m) =>
      val got = defl(m)
      assert(got.map("%02x".format(_)).mkString == parts(2).replace("empty", ""),
        s"PmdDeflater bytes drifted at ${parts(1)} — run tools/gen_deflate_golden.py verify-ours")
    }
  }

  test("deflate response parser: window-bits 8..15 accepted, malformed params rejected") {
    for (wb <- 8 to 15; key <- Seq("server_max_window_bits", "client_max_window_bits")) {
      assert(Rfc6455.parseDeflateResponse(s"permessage-deflate; $key=$wb").isDefined, s"$key=$wb")
      assert(Rfc6455.parseDeflateResponse(s"""permessage-deflate; $key="$wb"""").isDefined)
    }
    val bad = Seq(
      "permessage-deflate; server_max_window_bits=7",   // below RFC 7692 range
      "permessage-deflate; server_max_window_bits=16",  // above
      "permessage-deflate; client_max_window_bits=abc", // non-numeric
      "permessage-deflate; server_no_context_takeover=1", // valueless param given a value
      "permessage-deflate; unknown_param",
      "x-webkit-deflate-frame",                          // never offered
      "permessage-deflate, x-other")                     // multiple extensions
    bad.foreach(v => assert(Rfc6455.parseDeflateResponse(v).isEmpty, v))
    assert(Rfc6455.parseDeflateResponse(
      "permessage-deflate; server_no_context_takeover")
      .contains(Rfc6455.PmdParams(serverNoContextTakeover = true)))
  }

  test("thresholdPairs kernel ≡ the id1<id2 join it replaced: dup ids, null ids/vecs, ragged lengths, boundary hit") {
    import graft.ext.VectorOps
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    import spark.implicits._
    (1 to 20).foreach { trial =>
      // dup-heavy small id space, occasional null ids and null vectors,
      // ragged vector lengths (the DotLong min-length contract), zero
      // vectors (NaN cosine must drop in both forms)
      val n = 2 + rnd.nextInt(16)
      val rows: Seq[(java.lang.Long, Seq[Long])] = (0 until n).map { _ =>
        val id: java.lang.Long =
          if (rnd.nextInt(10) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(7).toLong)
        val vec: Seq[Long] =
          if (rnd.nextInt(12) == 0) null
          else Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(7).toLong - 3)
        (id, vec)
      }
      val df = rows.toDF("vec_id", "qvec")
      def kernel(th: Double): Seq[(Long, Long, Double)] = Caches.scoped {
        VectorOps.thresholdPairs(df, th, maxRows = 1000L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq.sorted
      }
      def joinForm(th: Double): Seq[(Long, Long, Double)] = {
        val wn = df.withColumn("nrm", VectorOps.normInt(col("qvec")))
        wn.select(col("vec_id").as("id1"), col("qvec").as("v1"), col("nrm").as("n1"))
          .join(wn.select(col("vec_id").as("id2"), col("qvec").as("v2"),
            col("nrm").as("n2")), col("id1") < col("id2"))
          // zero-norm guard: under ANSI (Spark 4 default) a bare divide
          // THROWS on zero vectors, and Spark SQL's `>=` sorts NaN above
          // everything (so NaN would PASS any threshold) — the kernel's
          // JVM 0.0/0.0 gives NaN and its `>=` drops it. The NaN-drop is
          // the pinned behavior (a zero vector has no cosine direction),
          // made explicit here with the isnan filter.
          .withColumn("cosine",
            when(col("n1") * col("n2") === 0.0, lit(Double.NaN))
              .otherwise(VectorOps.dotInt(col("v1"), col("v2")).cast("double") /
                (col("n1") * col("n2"))))
          .filter(!isnan(col("cosine")) && col("cosine") >= th)
          .select(col("id1"), col("id2"), col("cosine"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq.sorted
      }
      val th = Seq(-2.0, 0.3)(rnd.nextInt(2))
      val (got, want) = (kernel(th), joinForm(th))
      // MULTISET equality with bit-exact cosines (duplicate ids emit one
      // row per row-pair in both forms)
      assert(got == want, s"trial=$trial th=$th rows=$rows")
      // threshold boundary: rerun with th == an emitted cosine; the >=
      // must keep that exact pair in both forms
      want.headOption.foreach { case (_, _, c) =>
        if (!c.isNaN) assert(kernel(c) == joinForm(c), s"boundary th=$c rows=$rows")
      }
    }
  }

  test("thresholdPairs enforces an integral id column and preserves the input id type") {
    import graft.ext.VectorOps
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    import spark.implicits._
    val bad = Seq(("a", Seq(1L, 2L)), ("b", Seq(2L, 1L))).toDF("vec_id", "qvec")
    val err = intercept[IllegalArgumentException] {
      VectorOps.thresholdPairs(bad, 0.0)
    }
    assert(err.getMessage.contains("integral"))
    val ints = Seq((1, Seq(1L, 0L)), (2, Seq(2L, 0L))).toDF("vec_id", "qvec")
    val out = Caches.scoped { VectorOps.thresholdPairs(ints, 0.5) }
    assert(out.schema("id1").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.schema("id2").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 2)))
  }
}
