package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Execution-level profiler for a single SparkEntry query: groups Spark
  * jobs by their SQL execution id (one per action — each localCheckpoint,
  * collect, head, or AQE stage materialization batch belongs to one
  * execution) and prints per-execution wall, job count, and the job-id
  * range, in execution order. Local tuning aid for multi-action queries
  * (streaming harnesses, driver-paced loops) where ProfileQuery's flat
  * job list cannot attribute cost to a phase.
  *
  *   sbt "runMain graft.tools.ProfileExec q154_stream_reconcile_novelty /root/testdata/sf0.1"
  */
object ProfileExec {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" layers candidate confs
    // over the bench-identical session for controlled experiments
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // jobId -> (t0, execId); execId -> (firstJob, lastJob, nJobs, totalSec)
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    // execId -> physical plan description (captured at execution start;
    // lets the report name what each multi-job execution actually ran)
    val plans = mutable.Map[String, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.sql.execution.id")).getOrElse("-"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, exec) =>
          rows += ((j.jobId, (System.nanoTime() - t0) / 1e9, exec))
        }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            plans(s.executionId.toString) = s.physicalPlanDescription
          case _ =>
        }
    })

    graft.Caches.scopedBlocking {
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
    }
    spark.sharedState.cacheManager.clearCache()
    rows.clear()

    // min-of-N like Bench so the headline is contention-robust; the
    // per-execution table reflects the LAST repeat (rows cleared between)
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "1").toInt.max(1)
    var best = Double.MaxValue
    var total = 0.0
    (0 until repeats).foreach { _ =>
      rows.clear()
      val t0 = System.nanoTime()
      graft.Caches.scopedBlocking {
        graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      }
      spark.sharedState.cacheManager.clearCache()
      total = (System.nanoTime() - t0) / 1e9
      best = best.min(total)
    }
    Thread.sleep(500)

    println(f"== $name last ${total}%.2fs min-of-$repeats ${best}%.2fs, ${rows.size} jobs")
    // per-execution rollup in first-job order
    val byExec = rows.groupBy(_._3).map { case (exec, rs) =>
      (rs.map(_._1).min, rs.map(_._1).max, exec, rs.map(_._2).sum, rs.size)
    }.toSeq.sortBy(_._1)
    byExec.foreach { case (j0, j1, exec, s, n) =>
      val head = plans.get(exec).map(_.linesIterator.take(1).mkString).getOrElse("")
      println(f"  exec $exec%-6s jobs $j0%4d..$j1%-4d n=$n%3d  ${s}%7.3fs  ${head.take(80)}")
    }
    println(f"== sum of job walls ${rows.map(_._2).sum}%.2fs (jobs can overlap)")
    // dump the full plan of the heaviest execution for shape inspection
    byExec.sortBy(-_._4).headOption.foreach { case (_, _, exec, s, n) =>
      val out = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PLAN_OUT",
        s"/tmp/profile_exec_${name}_heaviest.txt")
      plans.get(exec).foreach { p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
          f"execution $exec ($n jobs, ${s}%.3fs summed)\n$p\n")
        println(s"== heaviest execution plan written to $out")
      }
    }
    // SPARK_GRAFT_PROFILE_PLAN_DIR: dump EVERY execution's plan
    sys.env.get("SPARK_GRAFT_PROFILE_PLAN_DIR").foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      plans.foreach { case (exec, p) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"exec_$exec.txt"), p + "\n")
      }
      println(s"== all execution plans written to $d")
    }
    spark.stop()
  }
}
