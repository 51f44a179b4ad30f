package graft.queries

import graft.sources.FrameTokenSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle gate for the DSv2 frame source (S1/S2 full shape): the q12
  * deep-extraction fixture frames are written as raw `.bin` files, read
  * back through `graft-tokens` — so the filter, rank and limit execute
  * INSIDE the source reader (physical pushdown, SourceSpec asserts the
  * plan) — and the surviving rows hash-compare against DuckDB computing
  * the same closed-form filter/top-N over the customer keys.
  */
object SourcePack {

  private val Ts = 1700000000L
  private val MinLiquidity = 35000.0
  private val TopN = 200

  /** Harness fixture writer: one `.binpack` CONTAINER per input
    * partition (the scale shape — bounded-size containers, never a file
    * per frame), written straight to the shared directory (local-mode
    * harness; a cluster deployment would stage to shared storage).
    *
    * Written ONCE per (JVM, sf dir) and reused — repeated Verify/Bench/
    * test invocations neither leak temp directories nor fold fixture
    * I/O into each query's measured time — and deleted on JVM exit.
    */
  private val frameDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def writeFrames(spark: SparkSession, dir: String): String =
    frameDirs.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      // plain String into the task closure — Path is not serializable
      val out: String = java.nio.file.Files.createTempDirectory("graft_q36_frames").toString
      graft.Tables.customer(spark, dir).select(col("c_custkey")).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            FrameTokenSource.writeFramePack(out, f"pack_$pid%06d",
              it.map(c => (c, Ts, DecodePack.deepFrame(c))))
          }
        }
      sys.addShutdownHook {
        val d = new java.io.File(out)
        Option(d.listFiles()).foreach(_.foreach(_.delete()))
        d.delete()
        ()
      }
      out
    })

  /** Filter + rank + limit, all pushed into the source scan: liquidity
    * floor and chain equality run inside the reader; (liquidity desc,
    * frame_id asc, LIMIT 200) runs as a bounded per-partition top-N with
    * Spark's TakeOrdered completing it globally.
    */
  def pushdownSource(spark: SparkSession, dir: String): DataFrame = {
    val framesDir = writeFrames(spark, dir)
    val top = spark.read.format("graft-tokens").load(framesDir)
      .filter(col("liquidity") >= MinLiquidity && col("chain") === "solana")
      .orderBy(col("liquidity").desc, col("frame_id").asc)
      .limit(TopN)
    top.select(col("frame_id").as("c_custkey"), col("symbol"),
      col("price"), col("liquidity"), col("volume_24h"),
      col("txns_24h").cast("long").as("txns_24h"),
      col("market_cap"), col("confidence_score"))
      .orderBy(col("c_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_pushdown_source" -> pushdownSource _)

  val oracles: Map[String, String] = Map(
    "q36_pushdown_source" ->
      s"""WITH t AS (
         |  SELECT c_custkey,
         |    'TK' || chr(cast(66 + c_custkey % 25 AS int))
         |         || chr(cast(66 + (c_custkey // 25) % 25 AS int)) AS symbol,
         |    (128 + c_custkey % 32) / 2048.0 AS price,
         |    (128 + c_custkey % 32) * 256.0 AS liquidity,
         |    (128 + c_custkey % 32) * 1024.0 AS volume_24h,
         |    cast(1000 + c_custkey % 1500 AS bigint) AS txns_24h,
         |    (128 + c_custkey % 32) * 16384.0 AS market_cap,
         |    0.95 AS confidence_score
         |  FROM customer),
         |top AS (
         |  SELECT * FROM t WHERE liquidity >= $MinLiquidity
         |  ORDER BY liquidity DESC, c_custkey ASC LIMIT $TopN)
         |SELECT c_custkey, symbol, price, liquidity, volume_24h, txns_24h,
         |  market_cap, confidence_score
         |FROM top ORDER BY c_custkey""".stripMargin)
}
