package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-size amortization measurement for the streaming corpus build
  * (q72's CurationStream): same TOTAL volume, varying micro-batch
  * count, sec-per-ingested-doc per configuration. Answers "do the
  * per-micro-batch scheduler constants amortize at production batch
  * sizes?" with a table instead of an extrapolation: the per-batch
  * residual q72 carries at bench scale (~1.3-1.9 s/ingest, flat across
  * batch SIZE) divides out as batches grow — at 100 TB a micro-batch
  * is minutes of data, not 3 rows. Local tuning aid only.
  *
  *   SPARK_GRAFT_CPUS=16 java ... graft.tools.ProfileQ72Batches \
  *     target/sf10x 100,30,10,3,1
  */
object ProfileQ72Batches {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10x"
    val batchCounts = (if (args.length > 1) args(1) else "100,30,10,3,1")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.CurationPack

    graft.Caches.scopedBlocking {
      val docs = graft.Caches.persisted(graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text")))
      val nDocs = docs.count()
      val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val (u0, b0) = CurationPack.lmStats(t, CurationPack.bigramRows(docs))
      val (uni, bi) = (graft.Caches.persisted(u0), graft.Caches.persisted(b0))
      uni.count(); bi.count()
      val benchSh = graft.ext.TextOps.shingleRows(
          docs.filter(col("doc_id") % 101 === 0), "doc_id", "text", 8)
        .select(col("_s").as("sh"))
      val ids = docs.select(col("doc_id")).orderBy(col("doc_id"))
        .collect().map(_.getLong(0))

      // warm-up: one full tiny-batch pass at sf0.001 shapes
      graft.Caches.scopedBlocking {
        val w = new graft.streaming.CurationStream(spark, uni, bi, benchSh)
        w.ingest(docs.filter(col("doc_id") <= ids(ids.length / 50)), 0L).count()
      }

      println(f"${"batches"}%8s ${"docs/batch"}%11s ${"ingest-total"}%13s ${"s/batch"}%8s ${"ms/doc"}%7s")
      batchCounts.foreach { n =>
        graft.Caches.scopedBlocking {
          val cs = new graft.streaming.CurationStream(spark, uni, bi, benchSh)
          val bounds = (0 until n).map(i => ids(i * ids.length / n)) :+ (ids.last + 1)
          val t0 = System.nanoTime()
          (0 until n).foreach { i =>
            cs.ingest(docs.filter(col("doc_id") >= bounds(i) &&
              col("doc_id") < bounds(i + 1)), i.toLong).count()
          }
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"$n%8d ${nDocs / n}%11d $dt%12.1fs ${dt / n}%7.2fs ${dt * 1000.0 / nDocs}%6.2f")
        }
      }
    }
    spark.stop()
  }
}
