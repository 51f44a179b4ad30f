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
    val cells = graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
      .map(mediaCell _)
    val stats = MultimodalOps.mediaStats(cells).toDF()
    // Frame sampling on the raw cells (column-expression path): every 2nd
    // 32-byte frame; first sampled frame decodes back to the md5 string.
    val frames = cells.toDF("key", "media")
      .select(col("key"),
        MultimodalOps.frameSamples(col("media"), MultimodalOps.HeaderLen + Blocks * 32,
          FrameSize, Step).as("frames"))
      .select(col("key"), size(col("frames")).cast("long").as("n_frames"),
        element_at(col("frames"), 1).cast("string").as("first_frame"))
    stats.join(frames, "key")
      .select(col("key").as("c_custkey"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"),
        col("n_bytes").cast("long").as("n_bytes"),
        col("n_frames"), col("first_frame"),
        col("byte_sum"), col("count_a"))
      .orderBy(col("c_custkey"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_stats" -> multimodalStats _,
    "q37_image_neardup" -> imageNearDup _)

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

  val oracles: Map[String, String] = Map(
    "q37_image_neardup" -> q37Sql,
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
