package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for q11_decode_roundtrip (VERDICT r12-#6);
  * not part of the driver contract. `runMain graft.tools.ProfileQ11
  * [sfDir]` — attributes q11's wall across its three phases: the
  * ENCODE harness (lineitem scan + wire-format frame build), the
  * legacy chunk DECODE, and the final checkpoint + global sort the
  * oracle's deterministic compare requires. Each phase is min-of-3 on
  * a warm JVM; phases nest (decode includes encode, full includes
  * all), so the per-phase cost is the delta between rows.
  */
object ProfileQ11 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def best(name: String)(f: => Unit): Unit = {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      println(f"TIMER $name ${walls.min}%.3f s (runs ${walls.map(w => f"$w%.2f").mkString("/")})")
    }
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // warm codegen + parquet footers
    graft.Caches.scoped(
      run(graft.SparkEntry.queries("q11_decode_roundtrip")(spark, dir)))

    best("scan_lineitem")(run(graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"))))
    best("encode_frames")(run(
      graft.queries.DecodePack.lineitemFrames(spark, dir).toDF()))
    best("encode+decode")(run(
      graft.decode.Decode.pairsLegacyOnly(
        graft.queries.DecodePack.lineitemFrames(spark, dir)).toDF()))
    best("full_q11_ckpt+sort")(graft.Caches.scoped(run(
      graft.SparkEntry.queries("q11_decode_roundtrip")(spark, dir))))
    spark.stop()
  }
}
