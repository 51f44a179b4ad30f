package graft.queries

import graft.ext.MultimodalOps
import graft.ext.MultimodalOps.{MediaCell, MediaMeta}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal query pack, hash-gated: synthetic media cells whose payload
  * is the md5-hex of the row key repeated 8×, so every byte-level result
  * (header fields, frame samples, byte sums, char counts) is closed-form
  * in SQL. Exercises the real plumbing — header encode/parse, binary
  * frame slicing as column expressions, and the typed mapPartitions batch
  * pass — with a payload the DuckDB oracle can reproduce exactly.
  */
object MediaPack {

  private val Blocks = 8 // payload = md5hex × 8 = 256 bytes
  private val FrameSize = 32
  private val Step = 2

  private[graft] def mediaCell(c: Long): MediaCell = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"media-$c".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val header = MultimodalOps.encodeHeader(
      MediaMeta("image", (8 + c % 16).toInt, (4 + c % 8).toInt, 3))
    MediaCell(c, header ++ (hex * Blocks).getBytes("UTF-8"))
  }

  def multimodalStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val enc: Encoder[MediaCell] = Encoders.product[MediaCell]
    // Range-partition the bare keys BEFORE the CPU-bound media synthesis
    // (the q12/q25 discipline): the final order is c_custkey, so range
    // boundaries sampled on the cheap 8-byte key scan let the query end
    // in sortWithinPartitions — a trailing global orderBy would feed its
    // boundary sampler the whole synthesis+stats kernel, running it (and
    // the 280-byte media rows) twice.
    val cells = graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("c_custkey"))
      .map(mediaCell _)
    // Single pass: the typed mapPartitions stats kernel carries the raw
    // bytes through, and the frame sampling (column-expression path:
    // every 2nd 32-byte frame; first sampled frame decodes back to the
    // md5 string) runs on the SAME row. Until round 13 this was
    // `stats.join(frames, "key")` — a self-join that assumed key
    // uniqueness the oracle's row-wise projection never did (duplicate
    // keys squared: the r12 10x-fixture 150018-vs-150000 failure) and
    // shuffled the media bytes twice at scale for no semantic reason.
    MultimodalOps.mediaStatsWithMedia(cells).toDF()
      .withColumn("frames",
        MultimodalOps.frameSamples(col("media"), MultimodalOps.HeaderLen + Blocks * 32,
          FrameSize, Step))
      .withColumn("n_frames", size(col("frames")).cast("long"))
      .withColumn("first_frame", element_at(col("frames"), 1).cast("string"))
      .select(col("key").as("c_custkey"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"),
        col("n_bytes").cast("long").as("n_bytes"),
        col("n_frames"), col("first_frame"),
        col("byte_sum"), col("count_a"))
      // total order = range partitioning on c_custkey + in-partition sort
      .sortWithinPartitions(col("c_custkey"))
  }

  // ---- q37: real BMP decode + perceptual-hash near-dup ----------------

  private val ImgW = 15 // odd width exercises BMP 4-byte row padding
  private val ImgH = 10
  private val HashBands = 4
  private val HashBandBits = 16
  private val MaxHamming = 8

  /** Deterministic RGB test card: three gradients whose base AND slopes
    * derive from the pair id c/2 — consecutive even/odd keys render the
    * same image except one perturbed pixel on the odd key (the planted
    * near-duplicates), while unrelated images get different slopes, so
    * aHash (shift-invariant by construction) doesn't collide across
    * pairs. Distinct channel coefficients make the luma weights — and
    * therefore any BGR-order or row-padding decode bug — observable.
    */
  private[graft] def imagePixel(c: Long, x: Int, y: Int): (Int, Int, Int) = {
    val p = c / 2
    val base = p * 37 % 256
    var r = ((base + (x * 73 + y * 151 + x * y * 31) * (1 + p % 17)) % 256).toInt
    if (c % 2 == 1 && x == 1 && y == 1) r = (r + 96) % 256
    val g = ((base + (x * 97 + y * 59 + x * y * 13) * (1 + p % 19)) % 256).toInt
    val b = ((base + (x * 41 + y * 83) * (1 + p % 23)) % 256).toInt
    (r, g, b)
  }

  /** Encode → REAL BMP decode → aHash per key, then the q32-style banded
    * hamming self-join: near-duplicate image pairs via a shuffle join on
    * 16-bit hash bands, never all-pairs. The encode/decode roundtrip is
    * inside the gated path — a single misread byte (padding, BGR order,
    * bottom-up rows, luma weights) shifts the hash and fails the oracle.
    */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashes = graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
      .mapPartitions(_.map { c =>
        val bmp = graft.ext.ImageCodec.encodeBmp(ImgW, ImgH, (x, y) => imagePixel(c, x, y))
        val img = graft.ext.ImageCodec.decode(bmp)
          .getOrElse(sys.error(s"BMP decode failed for key $c"))
        (c, graft.ext.ImageCodec.aHash(img))
      })
      .toDF("img_id", "ahash")
    val cached = graft.Caches.persisted(hashes)
    val bandKeys = array((0 until HashBands).map(b =>
      shiftright(col("ahash"), b * HashBandBits)
        .bitwiseAND(lit((1L << HashBandBits) - 1))): _*)
    val banded = cached.select(col("img_id"), col("ahash"),
      posexplode(bandKeys).as(Seq("band", "key")))
    val a = banded.select(col("img_id").as("id1"), col("ahash").as("h1"),
      col("band"), col("key"))
    val b = banded.select(col("img_id").as("id2"), col("ahash").as("h2"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= MaxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  // ---- q40: real WAV decode + windowed audio features -----------------

  private val NSamples = 256
  private val WinLen = 64
  private val NWins = NSamples / WinLen

  /** Deterministic PCM16 test tone: a signed waveform closed-form in
    * (clip id, sample index), with sign changes (zero crossings) and a
    * clip-dependent envelope so every feature value is key-specific.
    */
  private[graft] def audioSample(c: Long, i: Int): Short =
    ((c * 31 + i.toLong * i * 7 + i * 13) % 4096 - 2048).toShort

  /** Encode → REAL RIFF/WAVE decode → windowed features, all inside the
    * gated path: per 64-sample window, exact integer energy (Σx²),
    * zero-crossing count (sign flips between adjacent samples within the
    * window), and peak |x|. The codec roundtrip is the identity the
    * query proves — a misparsed chunk or byte-order slip shifts samples
    * and fails the oracle. Decode AND the per-sample reductions run in
    * one typed batch pass (the documented posture for byte-level tensor
    * work — interpreted HOFs over 256-element arrays cost ~3× the whole
    * query): the sample arrays never materialize as rows, only the 4
    * feature tuples per clip do. No shuffle until the final sort.
    */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
      .mapPartitions(_.flatMap { c =>
        val wav = graft.ext.AudioCodec.encodeWav(8000,
          Array.tabulate(NSamples)(i => audioSample(c, i)))
        val audio = graft.ext.AudioCodec.decodeWav(wav)
          .getOrElse(sys.error(s"WAV decode failed for clip $c"))
        val s = audio.samples
        (0 until NWins).iterator.map { w =>
          val off = w * WinLen
          var sumSq = 0L
          var zcr = 0L
          var peak = 0L
          var i = 0
          while (i < WinLen) {
            val x = s(off + i).toLong
            sumSq += x * x
            if (i > 0 && ((x < 0) != (s(off + i - 1) < 0))) zcr += 1
            val a = math.abs(x)
            if (a > peak) peak = a
            i += 1
          }
          (c, w.toLong, sumSq, zcr, peak)
        }
      })
      .toDF("c_custkey", "win", "sum_sq", "zero_crossings", "peak")
      .orderBy(col("c_custkey"), col("win"))
  }

  // ---- q100: audio fingerprint near-dup (the audio leg of q37) --------

  private val FpWins = 64
  private val FpWinLen = NSamples / FpWins
  private val AudioMaxHamming = 8

  /** Deterministic PCM16 tone with PLANTED near-dup pairs, the audio
    * analog of [[imagePixel]]'s pair scheme: consecutive even/odd keys
    * share the pair id c/2 (same waveform except ONE perturbed sample
    * on the odd key), unrelated clips get a pair-dependent slope so
    * their energy envelopes — and fingerprints — differ. The dividend
    * is non-negative before the −2048 shift so Scala % and DuckDB %
    * agree (the q40 convention).
    */
  private[graft] def audioPairSample(c: Long, i: Int): Short = {
    val p = c / 2
    val base = (p * 31 + i.toLong * i * (7 + p % 13) +
      i.toLong * 13 * (1 + p % 11)) % 4096 - 2048
    val v = if (c % 2 == 1 && i == 5) base + 160 else base
    v.toShort
  }

  /** Encode → REAL RIFF/WAVE decode → 64-bit energy fingerprint (bit w
    * set iff window w's exact integer energy exceeds the clip's mean
    * window energy — the aHash thresholding applied to audio), then the
    * q37-style banded hamming self-join: near-duplicate clip pairs via
    * a shuffle join on 16-bit hash bands, never all-pairs. A one-sample
    * perturbation moves one window's energy, so planted pairs sit at
    * hamming ≤ ~2 while unrelated clips scatter — and the codec
    * roundtrip stays inside the gated path (a byte-order or chunk-parse
    * slip shifts every energy and fails the oracle).
    */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashes = graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
      .mapPartitions(_.map { c =>
        val wav = graft.ext.AudioCodec.encodeWav(8000,
          Array.tabulate(NSamples)(i => audioPairSample(c, i)))
        val audio = graft.ext.AudioCodec.decodeWav(wav)
          .getOrElse(sys.error(s"WAV decode failed for clip $c"))
        val s = audio.samples
        val energies = Array.tabulate(FpWins) { w =>
          var e = 0L
          var i = 0
          while (i < FpWinLen) {
            val x = s(w * FpWinLen + i).toLong
            e += x * x
            i += 1
          }
          e
        }
        val mean = energies.sum / FpWins
        var h = 0L
        var w = 0
        while (w < FpWins) {
          if (energies(w) > mean) h |= (1L << w)
          w += 1
        }
        (c, h)
      })
      .toDF("clip_id", "fp")
    val cached = graft.Caches.persisted(hashes)
    val bandKeys = array((0 until HashBands).map(b =>
      shiftright(col("fp"), b * HashBandBits)
        .bitwiseAND(lit((1L << HashBandBits) - 1))): _*)
    val banded = cached.select(col("clip_id"), col("fp"),
      posexplode(bandKeys).as(Seq("band", "key")))
    val a = banded.select(col("clip_id").as("id1"), col("fp").as("h1"),
      col("band"), col("key"))
    val b = banded.select(col("clip_id").as("id2"), col("fp").as("h2"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= AudioMaxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  // ---- q41: real Y4M decode + scene-change detection ------------------

  private val VidW = 16
  private val VidH = 8
  private val NFrames = 8
  private val SceneSad = 6000L

  /** Deterministic luma generator with a planted scene cut: frames
    * before the clip-dependent cut index follow one gradient family,
    * frames at/after it follow another (offset +128) — so consecutive-
    * frame SAD is small within a scene and large across the cut.
    */
  private[graft] def videoPixel(c: Long, f: Int, x: Int, y: Int): Int =
    if (f >= 2 + (c % 5)) ((c * 13 + x * 9 + y * 2 + f * 17 + 128) % 256).toInt
    else ((c * 7 + x * 3 + y * 5 + f * 11) % 256).toInt

  /** Encode → REAL Y4M decode → temporal features, all inside the gated
    * path: per consecutive-frame pair, exact integer SAD (Σ|Δluma|),
    * the frame's mean luma, and a scene-change flag (SAD > threshold).
    * Decode and the per-pixel reductions share one typed batch pass
    * (same posture as q40): the plane arrays never leave the pass, only
    * 7 feature tuples per clip do. No shuffle until the final sort.
    */
  def videoScenes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
      .mapPartitions(_.flatMap { c =>
        val y4m = graft.ext.VideoCodec.encodeY4m(VidW, VidH, 25, 1,
          (0 until NFrames).map(f => (x: Int, y: Int) => videoPixel(c, f, x, y)))
        val video = graft.ext.VideoCodec.decodeY4m(y4m)
          .getOrElse(sys.error(s"Y4M decode failed for clip $c"))
        val planes = video.frames
        (1 until NFrames).iterator.map { f =>
          val cur = planes(f)
          val prev = planes(f - 1)
          var sad = 0L
          var sum = 0L
          var i = 0
          while (i < cur.length) {
            sad += math.abs(cur(i) - prev(i))
            sum += cur(i)
            i += 1
          }
          // plane is 16×8 = 128 px: integer mean is an exact shift
          (c, f.toLong, sad, sum >> 7, sad > SceneSad)
        }
      })
      .toDF("c_custkey", "frame", "sad", "mean_luma", "scene_change")
      .orderBy(col("c_custkey"), col("frame"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_stats" -> multimodalStats _,
    "q37_image_neardup" -> imageNearDup _,
    "q40_audio_features" -> audioFeatures _,
    "q41_video_scenes" -> videoScenes _,
    "q100_audio_neardup" -> audioNearDup _)

  // byte_sum over the payload = 8 × Σ over the md5-hex string of the
  // char's ASCII code — expressible as count(char)·code sums in SQL.
  private val hexChars = "0123456789abcdef"
  private val byteSumSql = hexChars.map(ch =>
    s"(len(h) - len(replace(h, '$ch', ''))) * ${ch.toInt}").mkString(" + ")

  // q37 oracle: recompute the sampled 8×8 luma plane closed-form (the
  // BMP roundtrip is the identity the query must prove), then the same
  // mean/threshold/band/hamming pipeline in SQL. bit_or avoids DuckDB's
  // sum()->HUGEINT promotion when bit 63 is set.
  private val q37Sql = {
    val base = "(c // 2 * 37)"
    val rBody = s"$base + (sx*73 + sy*151 + sx*sy*31) * (1 + (c // 2) % 17)"
    val rExpr = s"CASE WHEN c % 2 = 1 AND sx = 1 AND sy = 1 " +
      s"THEN (($rBody) + 96) % 256 ELSE ($rBody) % 256 END"
    val gExpr = s"($base + (sx*97 + sy*59 + sx*sy*13) * (1 + (c // 2) % 19)) % 256"
    val bExpr = s"($base + (sx*41 + sy*83) * (1 + (c // 2) % 23)) % 256"
    s"""WITH px AS (
       |  SELECT c_custkey AS c, y.y AS y, x.x AS x,
       |    (x.x * $ImgW) // 8 AS sx, (y.y * $ImgH) // 8 AS sy
       |  FROM customer, range(8) y(y), range(8) x(x)),
       |g AS (
       |  SELECT c, y, x,
       |    (299 * ($rExpr) + 587 * ($gExpr) + 114 * ($bExpr)) // 1000 AS v
       |  FROM px),
       |m AS (SELECT c, sum(v) // 64 AS mean FROM g GROUP BY c),
       |h AS (
       |  -- bit 63 is the sign bit: DuckDB rejects 1::bigint << 63, so it
       |  -- gets its literal two's-complement value
       |  SELECT g.c, bit_or(CASE WHEN v <= mean THEN 0::bigint
       |    WHEN y*8 + x = 63 THEN (-9223372036854775807 - 1)::bigint
       |    ELSE (1::bigint << (y*8 + x)) END) AS ahash
       |  FROM g JOIN m ON g.c = m.c GROUP BY g.c),
       |banded AS (
       |  SELECT c, ahash, b,
       |    (ahash >> (b * $HashBandBits)) & ${(1L << HashBandBits) - 1} AS key
       |  FROM h CROSS JOIN (SELECT unnest(range($HashBands)) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.c AS id1, b2.c AS id2,
       |    cast(bit_count(xor(a.ahash, b2.ahash)) AS bigint) AS hamming
       |  FROM banded a JOIN banded b2
       |    ON a.b = b2.b AND a.key = b2.key AND a.c < b2.c)
       |SELECT id1, id2, hamming FROM cand WHERE hamming <= $MaxHamming
       |ORDER BY id1, id2""".stripMargin
  }

  // q40 oracle: recompute the closed-form samples (the WAV roundtrip is
  // the identity the query must prove), then the same windowed integer
  // features in SQL. DuckDB % matches Scala % here: the dividend is
  // non-negative before the -2048 shift.
  private val q40Sql =
    s"""WITH s AS (
       |  SELECT c_custkey AS c, i.i AS i,
       |    (c_custkey * 31 + i.i * i.i * 7 + i.i * 13) % 4096 - 2048 AS v
       |  FROM customer, range($NSamples) i(i)),
       |w AS (
       |  SELECT c, i // $WinLen AS win, i, v,
       |    lag(v) OVER (PARTITION BY c, i // $WinLen ORDER BY i) AS prev
       |  FROM s)
       |SELECT c AS c_custkey, win,
       |  sum(v * v)::bigint AS sum_sq,
       |  sum(CASE WHEN prev IS NOT NULL AND (v < 0) <> (prev < 0)
       |      THEN 1 ELSE 0 END)::bigint AS zero_crossings,
       |  max(abs(v))::bigint AS peak
       |FROM w GROUP BY c, win
       |ORDER BY c_custkey, win""".stripMargin

  // q41 oracle: recompute the closed-form luma planes (the Y4M roundtrip
  // is the identity the query must prove), then identical SAD / mean /
  // flag arithmetic in SQL.
  private val q41Sql =
    s"""WITH px AS (
       |  SELECT c_custkey AS c, f.f AS f, x.x AS x, y.y AS y,
       |    CASE WHEN f.f >= 2 + c_custkey % 5
       |      THEN (c_custkey*13 + x.x*9 + y.y*2 + f.f*17 + 128) % 256
       |      ELSE (c_custkey*7 + x.x*3 + y.y*5 + f.f*11) % 256 END AS p
       |  FROM customer, range($NFrames) f(f), range($VidW) x(x), range($VidH) y(y)),
       |fr AS (SELECT c, f, sum(p) AS sum_luma FROM px GROUP BY c, f),
       |sad AS (
       |  SELECT a.c, a.f, sum(abs(a.p - b.p)) AS sad
       |  FROM px a JOIN px b ON a.c = b.c AND a.x = b.x AND a.y = b.y AND b.f = a.f - 1
       |  GROUP BY a.c, a.f)
       |SELECT s.c AS c_custkey, s.f::bigint AS frame, s.sad::bigint AS sad,
       |  (fr.sum_luma // ${VidW * VidH})::bigint AS mean_luma,
       |  s.sad > $SceneSad AS scene_change
       |FROM sad s JOIN fr ON fr.c = s.c AND fr.f = s.f
       |ORDER BY c_custkey, frame""".stripMargin

  // q100 oracle: recompute the closed-form samples (WAV roundtrip is
  // the identity the query proves), window energies, mean-threshold
  // fingerprint, then the same band/hamming pipeline as q37's.
  private val q100Sql =
    s"""WITH smp AS (
       |  SELECT c_custkey AS c, w.w AS w,
       |    ((c_custkey // 2 * 31
       |      + (w.w*$FpWinLen+k.k)*(w.w*$FpWinLen+k.k)*(7 + (c_custkey // 2) % 13)
       |      + (w.w*$FpWinLen+k.k)*13*(1 + (c_custkey // 2) % 11)) % 4096 - 2048
       |     + CASE WHEN c_custkey % 2 = 1 AND w.w*$FpWinLen+k.k = 5
       |            THEN 160 ELSE 0 END) AS x
       |  FROM customer, range($FpWins) w(w), range($FpWinLen) k(k)),
       |e AS (SELECT c, w, sum(x * x)::bigint AS e FROM smp GROUP BY 1, 2),
       |m AS (SELECT c, sum(e) // $FpWins AS mean FROM e GROUP BY 1),
       |h AS (
       |  SELECT e.c, bit_or(CASE WHEN e <= mean THEN 0::bigint
       |    WHEN w = 63 THEN (-9223372036854775807 - 1)::bigint
       |    ELSE (1::bigint << w) END) AS fp
       |  FROM e JOIN m ON e.c = m.c GROUP BY e.c),
       |banded AS (
       |  SELECT c, fp, b,
       |    (fp >> (b * $HashBandBits)) & ${(1L << HashBandBits) - 1} AS key
       |  FROM h CROSS JOIN (SELECT unnest(range($HashBands)) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.c AS id1, b2.c AS id2,
       |    cast(bit_count(xor(a.fp, b2.fp)) AS bigint) AS hamming
       |  FROM banded a JOIN banded b2
       |    ON a.b = b2.b AND a.key = b2.key AND a.c < b2.c)
       |SELECT id1, id2, hamming FROM cand WHERE hamming <= $AudioMaxHamming
       |ORDER BY id1, id2""".stripMargin

  val oracles: Map[String, String] = Map(
    "q37_image_neardup" -> q37Sql,
    "q40_audio_features" -> q40Sql,
    "q41_video_scenes" -> q41Sql,
    "q100_audio_neardup" -> q100Sql,
    "q29_multimodal_stats" ->
      s"""WITH m AS (SELECT c_custkey, md5('media-' || c_custkey) AS h FROM customer)
         |SELECT c_custkey,
         |  'image' AS kind,
         |  cast(8 + c_custkey % 16 AS bigint) AS width,
         |  cast(4 + c_custkey % 8 AS bigint) AS height,
         |  cast(3 AS bigint) AS channels,
         |  cast(${MultimodalOps.HeaderLen + Blocks * 32} AS bigint) AS n_bytes,
         |  cast(${(Blocks + Step - 1) / Step} AS bigint) AS n_frames,
         |  h AS first_frame,
         |  cast($Blocks * ($byteSumSql) AS bigint) AS byte_sum,
         |  cast($Blocks * (len(h) - len(replace(h, 'a', ''))) AS bigint) AS count_a
         |FROM m ORDER BY c_custkey""".stripMargin)
}
