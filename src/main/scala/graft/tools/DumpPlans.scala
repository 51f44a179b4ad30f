package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `plans/<outDir>/<query>_<suffix>.txt` — the executed
  * `.explain("formatted")` plan — for a comma-separated list of
  * registered queries, one SparkSession for the whole batch (bench-like
  * conf: local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus). The
  * round's optimization evidence trail: run with suffix `before` at the
  * old tree and `after` at the new one.
  *
  *   sbt "runMain graft.tools.DumpPlans before q130_percentile_ranks,q69_mixture_draw [sfDir]"
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r19")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      graft.Caches.scopedBlocking {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        // execute so AQE's final plan (the shape that actually ran) is
        // what gets recorded, not the isFinalPlan=false initial guess
        df.queryExecution.toRdd.count()
        val full = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // driver-paced loop queries (coreset, BPE, Lloyd) unroll to
        // plans of 10^5+ lines; cap the artifact — the shape evidence
        // lives in the head, and a 46 MB dump is repo bloat
        val lines = full.linesIterator.toSeq
        val cap = 4000
        val txt =
          if (lines.length <= cap) full
          else (lines.take(cap) :+
            s"... [truncated: ${lines.length - cap} more lines]").mkString("\n")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt + "\n")
        println(s"[plans] wrote $outDir/${name}_$suffix.txt")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
