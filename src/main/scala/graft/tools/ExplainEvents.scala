package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the events scan plan with a ts range predicate — pushdown
  * sanity check for the fixture's timestamp column. */
object ExplainEvents {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.events(spark, dir)
    println("ts type: " + ev.schema("ts").dataType)
    ev.filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp"))
      .select("event_id", "ts").explain("formatted")
    spark.stop()
  }
}
