package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Job-level profiler for a single SparkEntry query: prints every Spark
  * job's wall time and call site, then a summary grouped by call site.
  * Local tuning aid for queries whose cost is many small actions rather
  * than one big one (e.g. the streaming harnesses).
  *
  *   sbt "runMain graft.tools.ProfileQuery q72_stream_reconcile /root/testdata/sf0.1"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("callSite.short")).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          rows += ((j.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
    })

    // warm up at sf0.001 like Bench so JIT/codegen init doesn't pollute
    graft.Caches.scopedBlocking {
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
    }
    spark.sharedState.cacheManager.clearCache()
    rows.clear()

    val t0 = System.nanoTime()
    graft.Caches.scopedBlocking {
      graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    }
    val total = (System.nanoTime() - t0) / 1e9
    // listener events are async; give the bus a moment to drain
    Thread.sleep(500)

    println(f"== $name total ${total}%.2fs, ${rows.size} jobs")
    rows.sortBy(-_._2).take(25).foreach { case (id, s, site) =>
      println(f"  job $id%4d ${s}%7.3fs  $site")
    }
    println("== by call site")
    rows.groupBy(_._3).map { case (site, rs) =>
      (site, rs.map(_._2).sum, rs.size)
    }.toSeq.sortBy(-_._2).foreach { case (site, s, n) =>
      println(f"  ${s}%7.3fs  $n%4d jobs  $site")
    }
    spark.stop()
  }
}
