package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Phase-level breakdown of q72 (streaming corpus build): times the LM
  * snapshot, each of the three ingests, and the reconcile separately,
  * with per-phase job counts. Local tuning aid only.
  */
object ProfileQ72 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE decouples shuffle fan-out from core count
      // for the micro-batch posture experiments (AQE off needs few
      // partitions to avoid 32 near-empty tasks per stage)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit = { jobs.incrementAndGet(); () }
    })

    // warm-up
    graft.Caches.scopedBlocking {
      graft.SparkEntry.queries("q72_stream_reconcile")(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
    }
    spark.sharedState.cacheManager.clearCache()

    def phase[A](name: String)(f: => A): A = {
      Thread.sleep(200); val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9 // before the settle sleep
      Thread.sleep(200)
      println(f"  $name%-18s $dt%6.2fs  ${jobs.get() - j0}%4d jobs")
      r
    }

    graft.Caches.scopedBlocking {
      import graft.queries.CurationPack
      val docs = graft.Caches.persisted(graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text")))
      val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val (uni, bi) = phase("lmStats") {
        val (u0, b0) = CurationPack.lmStats(t, CurationPack.bigramRows(docs))
        (graft.Caches.persisted(u0), graft.Caches.persisted(b0))
      }
      val benchSh = graft.ext.TextOps.shingleRows(
          docs.filter(col("doc_id") % 101 === 0), "doc_id", "text", 8)
        .select(col("_s").as("sh"))
      // SPARK_GRAFT_NOVELTY=1 profiles the q154 shape (fifth gate on)
      val floor = sys.env.get("SPARK_GRAFT_NOVELTY")
        .map(_ => graft.queries.CurationPack.NoveltyFloorPpm)
      val cs = new graft.streaming.CurationStream(spark, uni, bi, benchSh,
        noveltyFloorPpm = floor)
      val mx = phase("max-id")(docs.agg(max(col("doc_id"))).head.getLong(0))
      phase("ingest-0")(cs.ingest(docs.filter(col("doc_id") <= mx / 3), 0L))
      phase("ingest-1")(cs.ingest(docs.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3), 1L))
      phase("ingest-2")(cs.ingest(docs.filter(col("doc_id") > 2 * mx / 3), 2L))
      phase("reconcile")(cs.reconcile().queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
