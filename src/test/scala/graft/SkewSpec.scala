package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting equivalence proofs on a deliberately skewed dataset: one hot
  * key carrying most rows. Results must equal the naive forms exactly;
  * the salted first phase must actually spread the hot key.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def skewed = {
    import spark.implicits._
    // key "hot" gets 5000 rows, 20 cold keys get 10 each
    val rows = (1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 20).flatMap(k => (1 to 10).map(i => (s"cold$k", (k * 100 + i).toLong)))
    rows.toDF("k", "v")
  }

  test("saltedAgg equals direct aggregation for sum/count/min/max") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"), min("v").as("min_v"), max("v").as("max_v"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(skewed, Seq("k"), salts = 16,
      ("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max"))
      .withColumnRenamed("sum_v", "sum_v").orderBy("k")
      .select(col("k"), col("sum_v"), col("count_v").as("n"), col("min_v"), col("max_v"))
      .collect().toSeq
    assert(salted == direct)
  }

  test("saltedAgg first phase spreads the hot key over many salt groups") {
    val phase1Groups = skewed
      .withColumn("_salt", Skew.saltOf(skewed.columns.map(col).toSeq, 16))
      .filter(col("k") === "hot")
      .select("_salt").distinct().count()
    assert(phase1Groups > 8, s"hot key only reached $phase1Groups salt groups")
  }

  test("banded near-dup joins: salting leaves results identical and bounds reducer input") {
    import spark.implicits._
    import graft.queries.TextPack
    // Hot fixture: a 120-doc exact-duplicate cluster (every band key
    // collides) + 80 unique docs. This is the adversarial corpus the
    // round-2 verdict flagged for q18/q32.
    val hot = "the quick brown fox jumps over the lazy dog and keeps jumping forever more"
    val docs = ((0 until 120).map(i => (i.toLong, hot)) ++
      (120 until 200).map(i =>
        (i.toLong, s"unique document number $i carrying enough distinct words to shingle $i")))
      .toDF("doc_id", "text")

    val plainLsh = TextPack.lshCandidatePairsFrom(docs).collect().toSeq
    val saltedLsh = TextPack.lshCandidatePairsFrom(docs, salts = 8).collect().toSeq
    assert(saltedLsh == plainLsh)
    assert(plainLsh.count(_.getLong(2) == 4) >= 120 * 119 / 2) // the hot clique is all there

    val plainSim = TextPack.simhashNearDupFrom(docs).collect().toSeq
    val saltedSim = TextPack.simhashNearDupFrom(docs, salts = 8).collect().toSeq
    assert(saltedSim == plainSim)

    // Reducer-input bound: exact duplicates share every band key, so the
    // hot cluster's probe side is 120 rows on ONE key; salting spreads
    // them over the salt space and the max (key, salt) group shrinks
    // ~salts× — which is exactly the reducer-input bound saltedJoin buys.
    val hotRows = (0 until 120).map(i => (i.toLong, "0:hotkey")).toDF("doc_id", "band_key")
    val plainMax = hotRows.groupBy("band_key").count().agg(max("count")).head.getLong(0)
    val saltedMax = hotRows
      .withColumn("_salt", Skew.saltOf(hotRows.columns.map(col).toSeq, 8))
      .groupBy(col("band_key"), col("_salt")).count()
      .agg(max("count")).head.getLong(0)
    assert(plainMax == 120)
    assert(saltedMax <= 40, s"hot key still concentrated: max salted group $saltedMax")
  }

  test("autoSalts: measures the hot key, adaptive join is result-identical") {
    import spark.implicits._
    import graft.queries.TextPack
    Caches.scoped {
      val hot = "the quick brown fox jumps over the lazy dog and keeps jumping forever more"
      val docs = ((0 until 120).map(i => (i.toLong, hot)) ++
        (120 until 200).map(i =>
          (i.toLong, s"unique document number $i carrying enough distinct words to shingle $i")))
        .toDF("doc_id", "text")
      // the 120-dup cluster puts 120 rows on each of its band keys:
      // target 50/reducer → ceil(120/50) = 3 salts; uniform data → 1
      val banded = (0 until 120).map(i => (i.toLong, "0:hotkey")).toDF("doc_id", "band_key")
      assert(Skew.autoSalts(banded, Seq("band_key"), targetPerKey = 50) == 3)
      assert(Skew.autoSalts(banded, Seq("band_key"), targetPerKey = 50, maxSalts = 2) == 2)
      val uniform = (0 until 120).map(i => (i.toLong, s"k$i")).toDF("doc_id", "band_key")
      assert(Skew.autoSalts(uniform, Seq("band_key"), targetPerKey = 50) == 1)
      assert(Skew.autoSalts(uniform.limit(0), Seq("band_key")) == 1) // empty input

      val plain = TextPack.lshCandidatePairsFrom(docs).collect().toSeq
      val adaptive = TextPack.lshCandidatePairsAdaptive(docs, targetPerKey = 50)
        .collect().toSeq
      assert(adaptive == plain)
    }
  }

  test("embedding near-dup dedup: salting leaves survivors identical on a hot bucket") {
    import spark.implicits._
    import graft.ext.VectorOps
    // Hot fixture: 60 identical embeddings (one SRP bucket holds all of
    // them, and they are exact cosine-1 duplicates) + 40 distinct ones.
    val base = Array.tabulate(64)(d => (d * 17 % 23 + 1).toLong)
    val vecs = ((0 until 60).map(i => (i.toLong, base.toSeq)) ++
      (60 until 100).map(i =>
        (i.toLong, Array.tabulate(64)(d => ((d * 31 + i * 7) % 41 - 20).toLong).toSeq)))
      .toDF("vec_id", "qvec")

    val plain = VectorOps.nearDupSurvivors(vecs, 0.95, 64, planes = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    val salted = VectorOps.nearDupSurvivors(vecs, 0.95, 64, planes = 4, salts = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(salted == plain)
    // the duplicate cluster collapses to its smallest id
    assert(plain.contains(0L) && !plain.exists(id => id > 0 && id < 60))
  }

  test("saltedJoin equals plain join on a skewed probe") {
    import spark.implicits._
    val build = (Seq("hot") ++ (1 to 20).map(k => s"cold$k"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "dim")
    val probe = skewed
    val plain = probe.join(build, Seq("k"))
      .select("k", "v", "dim").orderBy("k", "v").collect().toSeq
    val salted = Skew.saltedJoin(probe, build, Seq("k"), salts = 8)
      .select("k", "v", "dim").orderBy("k", "v").collect().toSeq
    assert(salted == plain)
  }
}
