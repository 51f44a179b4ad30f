package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Plan-shape audit for any registered query: executes it at the given
  * SF dir and prints the Window / shuffle / broadcast / cartesian node
  * counts plus the formatted plan — the manual half of what
  * PlanContractSpec pins permanently.
  *
  * Usage: runMain graft.tools.ExplainQuery <queryName> [sfDir]
  */
object ExplainQuery extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ExplainQuery <query> [sfDir]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val wins = collect(plan) { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    val shuf = collect(plan) { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    val bcast = collect(plan) { case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike => e }
    val cart = collect(plan) { case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c }
    println(s"PLANSHAPE windows=${wins.size} shuffles=${shuf.size} broadcasts=${bcast.size} cartesians=${cart.size}")
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
