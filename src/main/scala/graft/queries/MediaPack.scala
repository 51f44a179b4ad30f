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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_stats" -> multimodalStats _)

  // byte_sum over the payload = 8 × Σ over the md5-hex string of the
  // char's ASCII code — expressible as count(char)·code sums in SQL.
  private val hexChars = "0123456789abcdef"
  private val byteSumSql = hexChars.map(ch =>
    s"(len(h) - len(replace(h, '$ch', ''))) * ${ch.toInt}").mkString(" + ")

  val oracles: Map[String, String] = Map(
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
