package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Diameter/volume decoupling for the connected-components operators
  * (VERDICT r10-#7): planted-chain graphs with a CONSTANT edge count
  * and varying chain length, so the only thing that moves between runs
  * is the graph diameter. Prints wall + Spark-job count for
  * [[graft.ext.GraphOps.connectedComponents]] (label propagation with
  * the path-halving shortcut; fallback disabled so the measurement is
  * pure) and [[graft.ext.GraphOps.starComponents]] (large/small-star
  * contraction) at each diameter. Results recorded in SCALE.md.
  *
  *   sbt "runMain graft.tools.ProfileCC"        # 100k edges, L=10..10000
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit = { jobs.incrementAndGet(); () }
    })

    val totalEdges = args.headOption.map(_.toLong).getOrElse(100000L)

    /** `nChains` chains of `len` edges each: node ids are dense per
      * chain with a stride that keeps chains disjoint; every edge is
      * (id, id+1). Diameter == len; rows == totalEdges always.
      */
    def chainEdges(len: Long): DataFrame = {
      // a trailing partial chain would break the exact component-count
      // asserts below — require clean division up front
      require(totalEdges % len == 0,
        s"totalEdges=$totalEdges must be divisible by every swept chain length ($len)")
      spark.range(totalEdges)
        .select(((col("id") / len).cast("long") * (len + 1) + col("id") % len).as("src"))
        .select(col("src"), (col("src") + 1).as("dst"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager = true)
    }

    def time(label: String)(body: => Long): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val comps = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-22s $dt%7.2fs  ${jobs.get() - j0}%4d jobs  $comps%8d comps")
    }

    // warm-up so codegen/JIT doesn't pollute the first measurement
    graft.Caches.scopedBlocking {
      graft.ext.GraphOps.connectedComponents(chainEdges(10), "src", "dst").count()
      graft.ext.GraphOps.starComponents(chainEdges(10), "src", "dst").count()
    }

    for (len <- Seq(10L, 100L, 1000L, 10000L)) {
      val expected = totalEdges / len
      println(s"diameter=$len (chains=$expected, edges=$totalEdges)")
      graft.Caches.scopedBlocking {
        val e = chainEdges(len)
        time("label-prop+shortcut") {
          val c = graft.ext.GraphOps.connectedComponents(
              e, "src", "dst", maxIters = 64, fallbackToStar = false)
            .select(col("comp")).distinct().count()
          assert(c == expected, s"label-prop: $c components, want $expected")
          c
        }
        time("star-contraction") {
          val c = graft.ext.GraphOps.starComponents(e, "src", "dst")
            .select(col("comp")).distinct().count()
          assert(c == expected, s"star: $c components, want $expected")
          c
        }
      }
    }
    spark.stop()
  }
}
