package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-A/B of the md5-prefix hash forms: composed
  * conv(substring(md5,1,n),16,10) vs the Md5PrefixLong codegen
  * expression, same session, same synthetic strings, xor-agg action so
  * nothing is pruned. Local tuning aid.
  */
object BenchHash {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n).select(
      concat(lit("shingle token text "), col("id").cast("string")).as("s"))
    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = df.select(c.as("h")).agg(sum(col("h"))).head.getLong(0)
        println(f"  $label run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs sum=$r")
      }
    }
    time("composed")(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
    time("codegen ")(graft.functions.Md5PrefixLong(col("s"), 8))
    spark.stop()
  }
}
