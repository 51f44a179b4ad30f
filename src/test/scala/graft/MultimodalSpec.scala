package graft

import graft.ext.MultimodalOps
import graft.ext.MultimodalOps.{MediaCell, MediaMeta}
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the multimodal operators' non-oracle surface:
  * header roundtrip + total parse, the deterministic decode stub,
  * nearest-neighbor resize arithmetic, and the histogram batch pass.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("header encode/parse roundtrip, total on garbage") {
    val meta = MediaMeta("audio", 44100 & 0xffff, 2, 1)
    val header = MultimodalOps.encodeHeader(meta)
    assert(header.length == MultimodalOps.HeaderLen)
    assert(MultimodalOps.parseHeader(header ++ Array[Byte](1, 2, 3)).contains(meta))
    assert(MultimodalOps.parseHeader(Array[Byte](1, 2)).isEmpty) // short
    assert(MultimodalOps.parseHeader("XXXX0123456789ab".getBytes).isEmpty) // bad magic
    val badKind = header.clone(); badKind(5) = 9
    assert(MultimodalOps.parseHeader(badKind).isEmpty)
    assert(MultimodalOps.parseHeader(null).isEmpty)
  }

  test("decode stub is identity over payload bytes; resize maps nearest indices") {
    val media = MultimodalOps.encodeHeader(MediaMeta("image", 4, 2, 1)) ++
      Array.tabulate[Byte](8)(i => (i * 10).toByte)
    val px = MultimodalOps.decodePixelsStub(media)
    assert(px.toSeq == Seq(0, 10, 20, 30, 40, 50, 60, 70))
    // 4x2 -> 2x1: picks (0,0) and (0,2)
    assert(MultimodalOps.resizeNearest(px, 4, 2, 2, 1).toSeq == Seq(0, 20))
    // upscale 2x1 -> 4x2 replicates
    assert(MultimodalOps.resizeNearest(Array(1, 2), 2, 1, 4, 2).toSeq ==
      Seq(1, 1, 2, 2, 1, 1, 2, 2))
    assert(MultimodalOps.resizeNearest(px, 0, 2, 2, 2).isEmpty)
  }

  test("histogram + stats batch pass produce exact counts") {
    import spark.implicits._
    val payload = "aabbc".getBytes("UTF-8")
    val media = MultimodalOps.encodeHeader(MediaMeta("video", 1, 1, 1)) ++ payload
    val cells = spark.createDataset(Seq(MediaCell(7L, media)))
    val stats = MultimodalOps.mediaStats(cells).collect().head
    assert(stats.kind == "video" && stats.n_bytes == media.length)
    assert(stats.byte_sum == payload.map(_.toLong).sum && stats.count_a == 2)
    val (key, bins) = MultimodalOps.byteHistogram(cells).collect().head
    assert(key == 7L && bins('a'.toInt) == 2 && bins('b'.toInt) == 2 &&
      bins('c'.toInt) == 1 && bins.sum == 5)
  }

  test("frame sampling slices the payload via column expressions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cell = graft.queries.MediaPack.mediaCell(3L)
    val df = spark.createDataset(Seq(cell)).toDF("key", "media")
    val frames = df.select(MultimodalOps.frameSamples(col("media"),
      cell.media.length, 32, 2).as("f"))
      .select(size(col("f")), element_at(col("f"), 1).cast("string"))
      .as[(Int, String)].collect().head
    assert(frames._1 == 4)
    assert(frames._2.matches("[0-9a-f]{32}"))
  }

  test("stats-with-media pass is row-wise: duplicate keys do not multiply") {
    // The round-12 divergence class: a key self-join squares duplicate
    // keys (2 copies -> 4 rows) while a row-wise oracle projects 1:1.
    // mediaStatsWithMedia must emit exactly one row per input row even
    // when keys repeat, and each row's stats must agree with mediaStats.
    import spark.implicits._
    val cells = spark.createDataset(
      Seq(3L, 3L, 7L).map(graft.queries.MediaPack.mediaCell))
    val out = MultimodalOps.mediaStatsWithMedia(cells).collect()
    assert(out.length == 3, s"row-wise contract broken: ${out.length} rows")
    assert(out.count(_.key == 3L) == 2)
    val byKey = MultimodalOps.mediaStats(cells).collect()
      .map(s => s.key -> s).toMap
    out.foreach { r =>
      val s = byKey(r.key)
      assert((r.byte_sum, r.count_a, r.n_bytes, r.kind) ==
        ((s.byte_sum, s.count_a, s.n_bytes, s.kind)))
      assert(r.media.length == r.n_bytes)
    }
  }
}
