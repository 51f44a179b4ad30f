package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for local perf work; not part of the
  * driver contract. `runMain graft.tools.Profile <sfDir>`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"TIMER $name ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }

    time("warm_docs_count")(graft.Tables.documents(spark, dir).count())
    time("q55_full")(graft.Caches.scoped(
      graft.SparkEntry.queries("q55_dedup_components")(spark, dir).collect().length))
    time("q55_again")(graft.Caches.scoped(
      graft.SparkEntry.queries("q55_dedup_components")(spark, dir).collect().length))

    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 25 === 0,
        lit("planted duplicate cluster alpha beta gamma delta epsilon zeta eta"))
        .otherwise(col("text")).as("text"))
    graft.Caches.scoped {
      val n = time("lsh_pairs_only")(
        graft.queries.TextPack.lshCandidatePairsFrom(docs).count())
      println(s"npairs=$n")
    }
    graft.Caches.scoped {
      val edges = graft.queries.TextPack.lshCandidatePairsFrom(docs)
        .select(col("doc1").as("src"), col("doc2").as("dst"))
        .localCheckpoint(eager = true)
      time("cc_only")(
        graft.ext.GraphOps.connectedComponents(edges, "src", "dst").count())
    }
    time("q68_full")(graft.Caches.scoped(
      graft.SparkEntry.queries("q68_corpus_build")(spark, dir).collect().length))
    // q68 stage breakdown (mirrors corpusBuild's subtrees)
    graft.Caches.scoped {
      val d = graft.Caches.persisted(graft.Tables.documents(spark, dir))
      time("q68_exact_keep")(d.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id")).count())
      time("q68_lsh_cc") {
        val comps = graft.ext.GraphOps.connectedComponents(
          graft.queries.TextPack.lshCandidatePairsFrom(d)
            .select(col("doc1").as("src"), col("doc2").as("dst")), "src", "dst")
        comps.count()
      }
      time("q68_rep_gate")(graft.queries.CurationPack.repetitionFilterFrom(d).count())
      time("q68_lm_gate")(graft.queries.CurationPack.bigramLikelihoodFrom(d).count())
      time("q68_bench_overlap") {
        val shingled = d.select(col("doc_id"),
          explode(graft.ext.TextOps.wordShingles(col("text"), 8)).as("sh"))
        val bench = shingled.filter(col("doc_id") % 101 === 0).select(col("sh")).distinct()
        shingled.filter(col("doc_id") % 101 =!= 0).join(bench, "sh").count()
      }
      time("q68_shingle_gen_only")(d.select(col("doc_id"),
        explode(graft.ext.TextOps.wordShingles(col("text"), 8)).as("sh")).count())
      time("q68_shingle_gen_rows")(graft.ext.TextOps
        .shingleRows(d, "doc_id", "text", 8).count())
    }
    time("q70_full")(graft.Caches.scoped(
      graft.SparkEntry.queries("q70_star_components")(spark, dir).collect().length))
    // star round trace on the q70 graph
    graft.Caches.scoped {
      val docs = graft.Tables.documents(spark, dir).select(col("doc_id"),
        when(col("doc_id") % 25 === 0,
          lit("planted duplicate cluster alpha beta gamma delta epsilon zeta eta"))
          .otherwise(col("text")).as("text"))
      val lshEdges = graft.queries.TextPack.lshCandidatePairsFrom(docs)
        .select(col("doc1").as("src"), col("doc2").as("dst"))
      val ids = docs.select(col("doc_id"))
      val deep = ids
        .filter(col("doc_id") % 10 === 7 && expr("(doc_id div 10) % 64") =!= 63)
        .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst"))
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val edges = lshEdges.union(deep).localCheckpoint(true)
      time("q70_star_only")(graft.ext.GraphOps.starComponents(edges, "src", "dst",
        trace = (r, d, s) => println(f"STAR round=$r diff=$d ${s}%.2f s")).count())
      time("q70_cc_shortcut_only")(graft.ext.GraphOps.connectedComponents(
        edges, "src", "dst", maxIters = 30).count())
    }
    spark.stop()
  }
}
