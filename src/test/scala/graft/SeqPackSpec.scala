package graft

import graft.ext.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed sequence-packing proofs: the two-pass prefix sum must
  * equal the single-partition global-window formulation exactly, stay
  * multi-partition (the whole point), and be independent of the input's
  * physical layout.
  */
class SeqPackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    // token counts incl. zeros (empty docs) and a fat outlier
    val rows = (0L until 500L).map(i => (i, i % 7 match {
      case 0 => 0L
      case 3 => 1900L // spans multiple 512-token bins
      case m => m * 13L
    }))
    rows.toDF("doc_id", "n_tokens")
  }

  private def naive = {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    corpus.select(col("doc_id"), col("n_tokens"),
      coalesce(sum("n_tokens").over(w), lit(0L)).as("start_offset"))
  }

  test("packOffsets equals the global-window prefix sum") {
    val got = Caches.scoped {
      TextOps.packOffsets(corpus, "doc_id", "n_tokens", 8)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    val want = naive.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("packOffsets keeps multi-partition parallelism (no global-window collapse)") {
    Caches.scoped {
      val packed = TextOps.packOffsets(corpus.repartition(16), "doc_id", "n_tokens", 8)
      assert(packed.rdd.getNumPartitions > 1,
        "prefix sum must not collapse to one partition")
      // the naive window DOES collapse — this is the plan we refuse to run
      assert(naive.rdd.getNumPartitions == 1)
    }
  }

  test("packOffsets is independent of input partitioning and order") {
    def run(df: org.apache.spark.sql.DataFrame, parts: Int) = Caches.scoped {
      TextOps.packOffsets(df, "doc_id", "n_tokens", parts)
        .orderBy("id").collect().map(_.toSeq).toSeq
    }
    val base = run(corpus, 8)
    assert(run(corpus.orderBy(rand(42)), 3) == base)
    assert(run(corpus.repartition(32), 13) == base)
    assert(run(corpus.coalesce(1), 1) == base)
  }

  test("bins follow arithmetically: offsets partition the token stream") {
    Caches.scoped {
      val rows = TextOps.packOffsets(corpus, "doc_id", "n_tokens", 4)
        .orderBy("id").collect()
      val total = rows.map(_.getLong(1)).sum
      // consecutive docs tile the stream with no gaps or overlaps
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) + a.getLong(1) == b.getLong(2))
        case _ =>
      }
      assert(rows.last.getLong(2) + rows.last.getLong(1) == total)
    }
  }
}
