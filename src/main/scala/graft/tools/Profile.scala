package graft.tools

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for local perf work; not part of the
  * driver contract. `runMain graft.tools.Profile <sfDir>` — attributes
  * q12's wall time across its Spark-side stages.
  */
object Profile {
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
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"TIMER $name ${(System.nanoTime - t0) / 1e9}%.3f s"); r
    }
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    implicit val frameEnc: Encoder[graft.decode.Decode.Frame] =
      Encoders.product[graft.decode.Decode.Frame]
    def frames = graft.Tables.customer(spark, dir)
      .select(col("c_custkey")).as[Long]
      .map(c => graft.decode.Decode.Frame(c, graft.queries.DecodePack.deepFrame(c), 1700000000L))

    // warm: parquet reader + codegen
    (1 to 2).foreach { _ =>
      graft.Caches.scoped(run(graft.SparkEntry.queries("q12_token_pipeline")(spark, dir)))
    }
    (1 to 3).foreach { i =>
      time(s"customer_scan_$i")(run(graft.Tables.customer(spark, dir).select(col("c_custkey"))))
      time(s"frames_only_$i")(run(frames.toDF()))
      time(s"decode_no_sort_$i")(run(graft.decode.Decode.tokens(spark, frames)))
      time(s"q12_full_$i")(
        graft.Caches.scoped(run(graft.SparkEntry.queries("q12_token_pipeline")(spark, dir))))
    }
    spark.stop()
  }
}
