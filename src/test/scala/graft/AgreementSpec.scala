package graft

import graft.decode.ClusterExtractor
import graft.decode.ClusterExtractor.NumVal
import graft.streaming.DataBuffer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation agreement + DataBuffer semantics.
  *
  * The value classifier exists twice by design — as a Catalyst CASE
  * column (`Functions.classifyValue`, for relational pipelines) and as
  * JVM code inside the cluster extractor — both transcribing
  * scraper.py:766-828. The property test here proves they agree on a
  * dense sweep of (value, dtype) pairs including every range boundary,
  * so the two paths can never silently diverge.
  */
class AgreementSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stratifiedSample: partition-invariant membership, quota + Bernoulli bind") {
    import graft.ext.TextOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(TextOps.stratifiedSample(docs, Seq("lang", "source"), 60, 5))
    // membership is a pure function of the data — any partitioning,
    // same sample (the reproducibility df.sample() cannot give)
    val b = ids(TextOps.stratifiedSample(
      docs.repartition(13, col("text")), Seq("lang", "source"), 60, 5))
    assert(a == b && a.nonEmpty)
    // pct=100 + unbounded quota keeps everything (no off-by-one at the gate)
    assert(TextOps.stratifiedSample(docs, Seq("lang", "source"), 100,
      Int.MaxValue).count() == docs.count())
    // no stratum ever exceeds its quota, and at least one hits it
    val perStratum = TextOps.stratifiedSample(docs, Seq("lang", "source"), 60, 5)
      .groupBy("lang", "source").count()
    assert(perStratum.filter(col("count") > 5).count() == 0)
    assert(perStratum.filter(col("count") === 5).count() > 0)
    // scale claim, plan-asserted: the sampler never reads `text` — the
    // parquet scan's ReadSchema carries only the id + strata columns
    val explained = graft.queries.TextPack.stratifiedSample(
      spark, "/root/testdata/sf0.01").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = explained.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty && readSchemas.forall(!_.contains("text")),
      s"sampler must not scan text:\n${readSchemas.mkString("\n")}")
  }

  test("column classifyValue agrees with ClusterExtractor on dense sweep + boundaries") {
    import spark.implicits._
    val boundaries = Seq(
      1e-7, 0.000001, 0.05, 0.1, 0.100001, 9.99, 10.0, 15000.0, 15000.5,
      20000.0, 50000.0, 50000.5, 99999.0, 100000.0, 999999.0, 1000000.0,
      9999999.0, 10000000.0, 10000001.0, 50000000.0, 50000001.0,
      -100.0, -100.5, -0.01, -0.02, 0.009, 0.011, 1000.0, 999.99, 0.0, 1e11, 1e13)
    val rnd = new scala.util.Random(7)
    val randoms = Seq.fill(300)(math.pow(10, rnd.nextDouble() * 14 - 7) *
      (if (rnd.nextBoolean()) 1 else -1))
    val dtypes = Seq("double", "float", "uint32")
    val cases = for (v <- boundaries ++ randoms; dt <- dtypes) yield (v, dt)

    val colResults = cases.toDF("v", "dt")
      .select(graft.functions.Functions.classifyValue(col("v"), col("dt")))
      .as[Option[String]].collect()

    cases.zip(colResults).foreach { case ((v, dt), colRes) =>
      val cl = ClusterExtractor.classifyNumericValues(Vector(NumVal(0, v, dt)))
      val jvmRes =
        if (cl.prices.nonEmpty) Some("prices")
        else if (cl.txns.nonEmpty) Some("txns")
        else if (cl.makers.nonEmpty) Some("makers")
        else if (cl.volumes.nonEmpty) Some("volumes")
        else if (cl.liquidity.nonEmpty) Some("liquidity")
        else if (cl.marketCaps.nonEmpty) Some("market_caps")
        else if (cl.percentages.nonEmpty) Some("percentages")
        else None
      assert(jvmRes == colRes, s"classify($v, $dt): jvm=$jvmRes col=$colRes")
    }
  }

  test("thresholdPairs refuses corpora above its quadratic bound") {
    import spark.implicits._
    val vecs = (1 to 20).map(i => (i.toLong, Seq(i.toLong, 1L)))
      .toDF("vec_id", "qvec")
    val err = intercept[IllegalArgumentException] {
      graft.ext.VectorOps.thresholdPairs(vecs, 0.5, maxRows = 10)
    }
    assert(err.getMessage.contains("lshTopK"))
    // under the bound it plans fine
    assert(graft.ext.VectorOps.thresholdPairs(vecs, -1.0, maxRows = 100).count() == 190)
  }

  test("bruteForceTopK refuses query sides above its broadcast bound") {
    import spark.implicits._
    val vecs = (1 to 20).map(i => (i.toLong, Seq(i.toLong, 1L)))
    val queries = vecs.toDF("q_id", "q_vec")
    val corpus = vecs.toDF("c_id", "c_vec")
    val err = intercept[IllegalArgumentException] {
      graft.ext.VectorOps.bruteForceTopK(queries, corpus, 3, maxQueryRows = 10)
    }
    assert(err.getMessage.contains("lshTopK"))
    // under the bound: every query gets k neighbors (self excluded)
    Caches.scoped {
      assert(graft.ext.VectorOps.bruteForceTopK(
        queries, corpus, 3, maxQueryRows = 100).count() == 20 * 3)
    }
  }

  test("hardNegatives: positives bound the semi-hard band, no same-label leakage") {
    import spark.implicits._
    // planted 2-D geometry: anchor 1 (label 0) has a same-label neighbor
    // (id 2, cos≈0.995) and a DIFFERENT-label vector even closer (id 3,
    // cos≈0.99995 → harder than the positive → semi_hard = 0); anchor 5
    // (label 2) has no same-label neighbor at all → pos_cosine = −2.0.
    val vecs = Seq(
      (1L, 0, Seq(1000L, 0L)),
      (2L, 0, Seq(990L, 100L)),
      (3L, 1, Seq(1000L, 10L)),
      (4L, 1, Seq(0L, 1000L)),
      (5L, 2, Seq(0L, 1000L))).toDF("vec_id", "label", "qvec")
    val anchors = vecs.filter(col("vec_id").isin(1L, 5L))
      .select(col("vec_id").as("q_id"), col("label").as("q_label"), col("qvec").as("q_vec"))
    val corpus = vecs.select(col("vec_id").as("c_id"),
      col("label").as("c_label"), col("qvec").as("c_vec"))
    val rows = Caches.scoped {
      graft.ext.VectorOps.hardNegatives(anchors, corpus, 2)
        .orderBy(col("q_id"), col("rank"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5)))
    }
    // anchor 1: rank 1 = id 3 (too hard, flag 0), rank 2 = id 4 at cos 0
    // (tie with id 5 on cosine broken by id asc; below pos → flag 1)
    val a1 = rows.filter(_._1 == 1L)
    assert(a1.map(t => (t._2, t._3, t._6)).toSeq == Seq((1, 3L, 0L), (2, 4L, 1L)))
    assert(a1.forall(t => t._5 > 0.99 && t._5 < 1.0)) // pos = cos(1,2)
    // anchor 5: no same-label neighbor → pos_cosine −2.0, nothing semi-hard
    val a5 = rows.filter(_._1 == 5L)
    assert(a5.map(t => (t._2, t._3, t._6)).toSeq == Seq((1, 4L, 0L), (2, 2L, 0L)))
    assert(a5.forall(_._5 == -2.0))
  }

  test("kCenterCoreset: farthest-first covers one pick per cluster, ties to min id") {
    import spark.implicits._
    // three planted 2-D clusters; seed = min id (cluster A), then the
    // two farthest picks must land one in each remaining cluster, with
    // the round-2 tie (id 4 vs id 6, both at d2 = 1020100) broken to
    // the smaller id
    val vecs = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(10L, 0L)), // cluster A
      (3L, Seq(1000L, 0L)), (4L, Seq(1010L, 0L)), // cluster B
      (5L, Seq(0L, 1000L)), (6L, Seq(0L, 1010L))) // cluster C
      .toDF("vec_id", "qvec")
    val rounds = Caches.scoped {
      graft.ext.VectorOps.kCenterCoreset(vecs, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    assert(rounds == Seq((1L, 1L, 0L), (2L, 4L, 1020100L), (3L, 6L, 1020100L)))
  }

  test("dist2_long yields NULL on length-mismatched vectors (no silent truncation)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(1L, 2L, 4L)), // equal dims: (3-4)^2 = 1
      (2L, Seq(1L, 2L, 3L), Seq(1L, 2L)) // ragged: must surface as null
    ).toDF("id", "a", "b")
      .withColumn("d2", graft.functions.Dist2Long(col("a"), col("b"), 1L))
    val got = df.orderBy(col("id")).select(col("d2")).collect()
    assert(got(0).getLong(0) == 1L)
    assert(got(1).isNullAt(0), "ragged vectors must score null, not a prefix distance")
  }

  test("planesForCorpus keeps expected bucket occupancy roughly constant") {
    import graft.ext.VectorOps.planesForCorpus
    assert(planesForCorpus(1000) == 4) // min floor
    assert(planesForCorpus(1L << 30) == 20) // 2^20 buckets for 2^30 vectors
    assert(planesForCorpus(Long.MaxValue / 2) == 24) // capped
    // doubling the corpus adds ~one plane
    assert(planesForCorpus(2000000) == planesForCorpus(1000000) + 1)
  }

  test("q23 derives its SRP plane count from the corpus, not a constant") {
    import graft.queries.VectorPack
    val dir = "/root/testdata/sf0.001"
    val n = Tables.embeddings(spark, dir).count()
    val expected = graft.ext.VectorOps.planesForCorpus(n, VectorPack.TargetBucket)
    assert(VectorPack.lshPlanes(spark, dir) == expected)
    // The shipped query's plan carries exactly `expected` hyperplanes: the
    // SRP bucket key embeds one 'srp-<plane>-<dim>' literal per (plane, dim).
    val plan = VectorPack.queries("q23_lsh_ann")(spark, dir)
      .queryExecution.analyzed.toString
    assert((0 until expected).forall(p => plan.contains(s"srp-$p-0")))
    assert(!plan.contains(s"srp-$expected-0"))
    // The oracle derives the same count from the same rule in SQL.
    val oracle = VectorPack.oracles("q23_lsh_ann")
    assert(oracle.contains(s"* ${VectorPack.TargetBucket} >= (SELECT count(*) FROM embeddings)"))
  }

  test("nearDupSurvivors: drops are sound (subset of exact pairwise drops), keep-first by id") {
    import graft.ext.VectorOps
    val dir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qvec"))
    val n = vecs.count()

    val survivors = VectorOps.nearDupSurvivors(vecs, 0.35, 64, planes = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val droppedBucketed = vecs.select("vec_id").collect().map(_.getLong(0)).toSet -- survivors

    // exact pairwise ground truth: any id with a smaller-id near-dup
    val droppedExact = VectorOps.thresholdPairs(vecs, 0.35)
      .select("id2").collect().map(_.getLong(0)).toSet

    assert(droppedBucketed.nonEmpty, "fixture should contain near-dups")
    assert(droppedBucketed.subsetOf(droppedExact),
      "bucketed candidates must be a subset of the exact pair set")
    assert(survivors.size + droppedBucketed.size == n)
    // keep-first rule: the smallest id always survives
    assert(survivors.contains(0L) || !droppedExact.contains(0L))
  }

  test("q82 semanticDedup: groups are within-cell, min-id kept, labels consistent") {
    Caches.scoped {
      val rows = graft.queries.VectorPack.semanticDedup(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.nonEmpty)
      val byGroup = rows.groupBy(_._3)
      assert(byGroup.exists(_._2.length > 1), "fixture should contain semantic dups")
      byGroup.foreach { case (g, members) =>
        // the group label IS its smallest member, and only that member keeps
        assert(members.map(_._1).min == g)
        assert(members.filter(_._4 == 1L).map(_._1).toSeq == Seq(g))
        // SemDeDup contract: pairs only form within a k-means cell, so a
        // multi-member group can never span cells
        assert(members.map(_._2).distinct.length == 1)
      }
      // exhaustive: every vector labeled exactly once
      assert(rows.map(_._1).distinct.length == rows.length)
    }
  }

  test("kmeansCodebook: offset/sparse id domains still seed a full codebook") {
    import graft.ext.VectorOps
    val dir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, dir)
      .select((col("vec_id") + 1000000L).as("vec_id"), // offset, non-0-based
        VectorOps.quantize(col("embedding")).as("qvec"))
    val cb = VectorOps.kmeansCodebook(vecs, 8, 1)
    val n = cb.count()
    assert(n == 8, s"expected 8 seeded cells on a contiguous offset domain, got $n")
    val assigned = VectorOps.assignToCodebook(vecs, cb)
    assert(assigned.count() == vecs.count())
  }

  test("kmeansCodebook: deterministic, k cells max, SSE non-increasing (Lloyd)") {
    import graft.ext.VectorOps
    val dir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qvec"))

    def sse(iters: Int): Long = {
      val cb = VectorOps.kmeansCodebook(vecs, 8, iters)
      VectorOps.assignToCodebook(vecs, cb)
        .agg(sum(col("dist2"))).head.getLong(0)
    }
    val trajectory = (0 to 2).map(sse)
    // each Lloyd round can only improve (or hold) the quantization error
    assert(trajectory.sliding(2).forall { case Seq(a, b) => b <= a })
    assert(trajectory.last < trajectory.head, s"no improvement: $trajectory")

    val cb2 = VectorOps.kmeansCodebook(vecs, 8, 2)
    assert(cb2.count() <= 8)
    // bit-identical across runs (no RNG anywhere)
    val a = cb2.orderBy("cell").collect().map(_.toSeq).toSeq
    val b = VectorOps.kmeansCodebook(vecs, 8, 2).orderBy("cell").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("kmeansCodebook memo: same input hits (identical rows), different inputs never alias") {
    import spark.implicits._
    import graft.ext.VectorOps
    // the memo keys on the canonicalized plan via sameResult — LOCAL
    // relations compare by data, so two frames with the same schema but
    // different rows MUST train separately (a hash-keyed memo could
    // alias them; sameResult cannot)
    def frame(shift: Long) = (0L until 40L)
      .map(i => (i, Seq(i * 3 + shift, 100L - i, shift + 7)))
      .toDF("vec_id", "qvec")
    Caches.scoped {
      val a1 = VectorOps.kmeansCodebook(frame(0), 4, 2).orderBy("cell")
        .collect().map(_.toSeq).toSeq
      val a2 = VectorOps.kmeansCodebook(frame(0), 4, 2).orderBy("cell")
        .collect().map(_.toSeq).toSeq // memo hit
      val b = VectorOps.kmeansCodebook(frame(500), 4, 2).orderBy("cell")
        .collect().map(_.toSeq).toSeq // different data, same shape
      val c = VectorOps.kmeansCodebook(frame(0), 3, 2).orderBy("cell")
        .collect().map(_.toSeq).toSeq // same data, different k
      assert(a1 == a2, "memo hit must return the identical codebook")
      assert(a1 != b, "different input data must not alias in the memo")
      assert(c.size <= 3 && a1 != c, "different k must not alias in the memo")
    }
  }

  test("kmeansCodebook memo: rewrite-in-place (same path, same file count) retrains") {
    import graft.ext.VectorOps
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // The hard staleness case: the parquet under the SAME path is
    // rewritten with the SAME file count — only bytes/length/mtime
    // change. The memo's content snapshot (path:len:mtime per file)
    // must evict the plan-equal entry instead of serving the stale
    // codebook trained on the old bytes. Five gated queries consume
    // this memo silently; a miss here would corrupt all of them.
    import spark.implicits._
    val dir = Files.createTempDirectory("memo_rewrite").toString
    def writeRows(shift: Long): Unit = {
      val stage = Files.createTempDirectory("memo_stage").toString
      (0L until 40L).map(i => (i, Seq(i * 3 + shift, 100L - i, shift + 7)))
        .toDF("vec_id", "qvec").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      // fixed destination name — the rewrite really is in-place
      Files.move(part.toPath, Paths.get(dir, "data.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def train(): Seq[Seq[Any]] = Caches.scoped {
      VectorOps.kmeansCodebook(spark.read.parquet(s"$dir/data.parquet"), 4, 2)
        .orderBy("cell").collect().map(_.toSeq).toSeq
    }
    def trainLocal(shift: Long): Seq[Seq[Any]] = Caches.scoped {
      // LocalRelation plan — never plan-equal to the parquet scan, so
      // this is an independent ground truth for the same rows
      VectorOps.kmeansCodebook(
        (0L until 40L).map(i => (i, Seq(i * 3 + shift, 100L - i, shift + 7)))
          .toDF("vec_id", "qvec"), 4, 2)
        .orderBy("cell").collect().map(_.toSeq).toSeq
    }
    writeRows(0)
    val before = train()
    assert(before == trainLocal(0))
    writeRows(500)
    // a sleep can't guarantee an mtime step on coarse-granularity
    // filesystems (and the two writes may compress to the same length):
    // set the rewritten file's mtime explicitly 2 s past the original's
    val data = Paths.get(dir, "data.parquet")
    Files.setLastModifiedTime(data, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() + 2000))
    val after = train()
    assert(after == trainLocal(500),
      "rewrite-in-place must retrain from the new bytes, not hit the stale memo")
    assert(after != before)
  }

  test("kmeansCodebook memo: concurrent callers on one path agree and stay correct") {
    import graft.ext.VectorOps
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // Two sessions/threads racing on the same input: whichever order the
    // synchronized memo resolves them in (both train, or one hits the
    // other's fresh entry), every caller must get the codebook of the
    // CURRENT bytes. This pins the lock discipline around the
    // check-train-insert window.
    val dir = "/root/testdata/sf0.001"
    def vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qvec"))
    val expected = Caches.scoped {
      VectorOps.kmeansCodebook(vecs, 8, 2).orderBy("cell").collect().map(_.toSeq).toSeq
    }
    val racers = (1 to 4).map(_ => Future {
      Caches.scoped {
        VectorOps.kmeansCodebook(vecs, 8, 2).orderBy("cell").collect().map(_.toSeq).toSeq
      }
    })
    Await.result(Future.sequence(racers), 120.seconds).foreach { got =>
      assert(got == expected, "a concurrent caller saw a wrong/corrupt codebook")
    }
  }

  test("kmeansCodebook: iters=8 runs via per-round localCheckpoint, SSE still monotone") {
    import graft.ext.VectorOps
    val dir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qvec"))
    // iters>2 takes the lineage-truncated path: without it, 8 unrolled
    // rounds nest the full prior plan under each broadcast and the
    // analyzer cost explodes. This must both finish promptly and keep
    // Lloyd's guarantee.
    def sse(iters: Int): Long = {
      val cb = VectorOps.kmeansCodebook(vecs, 8, iters)
      VectorOps.assignToCodebook(vecs, cb).agg(sum(col("dist2"))).head.getLong(0)
    }
    assert(sse(8) <= sse(2), "more Lloyd rounds must not worsen quantization error")
    // determinism holds across the checkpointed path too
    val a = VectorOps.kmeansCodebook(vecs, 8, 8).orderBy("cell").collect().map(_.toSeq).toSeq
    val b = VectorOps.kmeansCodebook(vecs, 8, 8).orderBy("cell").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("DataBuffer ring matches utils.py:472-507 semantics") {
    val buf = new DataBuffer[Int](maxSize = 5)
    (1 to 3).foreach(buf.append)
    assert(buf.getRecent(10) == Seq(1, 2, 3)) // under capacity: whole buffer
    (4 to 5).foreach(buf.append)
    assert(buf.size == 5 && buf.getRecent(3) == Seq(3, 4, 5)) // index==0 path
    buf.append(6) // overwrites slot 0, index -> 1
    assert(buf.getRecent(1) == Seq(6))
    // wraparound assembly: recent = buffer[max(0, 1-3):1] = [6],
    // remaining 2 from the tail = [4, 5] -> [4, 5, 6]
    assert(buf.getRecent(3) == Seq(4, 5, 6))
    buf.append(7) // slot 1, index -> 2
    assert(buf.getRecent(3) == Seq(5, 6, 7))
    buf.clear()
    assert(buf.size == 0 && buf.getRecent(3).isEmpty)
  }

  test("q76 embedding outliers: planted scales land on the right fence side") {
    Caches.scoped {
      val rows = graft.queries.VectorPack.embeddingOutliers(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows.nonEmpty)
      // ×3-planted (%97, incl. vec 0) must read high; ×0.25 (%89 alone) low
      val hi = rows.collect { case (id, _, s) if id % 97 == 0 => s }
      val lo = rows.collect { case (id, _, s) if id % 89 == 0 && id % 97 != 0 => s }
      assert(hi.nonEmpty && hi.forall(_ == "high"))
      assert(lo.nonEmpty && lo.forall(_ == "low"))
      assert(rows.exists(_._1 == 0L) && rows.exists(_._1 == 89L))
      // flagged norms really breach the planted ±~9×/16× band: every high
      // norm dwarfs every low norm (no interleaving = fence is two-sided)
      val hn = rows.collect { case (_, n, "high") => n }
      val ln = rows.collect { case (_, n, "low") => n }
      assert(ln.isEmpty || hn.isEmpty || ln.max < hn.min)
    }
  }

  test("q108 split leakage: planted cross-split dups surface, invariants hold") {
    Caches.scoped {
      val dir = "/root/testdata/sf0.001"
      val rows = graft.queries.TextPack.queries("q108_split_leakage")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      assert(rows.nonEmpty, "no leakage found — the planted cluster must straddle splits")
      // every reported pair really straddles splits with the near-dup gate met
      rows.foreach { case (d1, d2, s1, s2, n) =>
        assert(d1 < d2 && s1 != s2 && n >= 2)
      }
      // the planted cluster (every 43rd doc, identical text) contributes
      // at least one cross-split pair — the audit's guaranteed positive
      assert(rows.exists { case (d1, d2, _, _, _) => d1 % 43 == 0 && d2 % 43 == 0 })
    }
  }

  test("q104 pcaPower: exact scatter diagonal + invariants on the fixture corpus") {
    Caches.scoped {
      val dir = "/root/testdata/sf0.001"
      val got = graft.queries.VectorPack.queries("q104_pca_power")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == 64 && got.map(_._1).toSeq == (0L until 64L))
      // the last normalization pins max|v| to exactly the fixed-point scale
      assert(got.map(t => math.abs(t._3)).max == 1000L)
      // scatter diagonal is n^2 * variance — never negative
      assert(got.forall(_._2 >= 0L))
      // exact diagonal agreement with a driver-side recomputation on the
      // same quantized vectors (doubles stay below 2^53 at this SF)
      val vecs = Tables.embeddings(spark, dir)
        .select(graft.ext.VectorOps.quantize(col("embedding")).as("q"))
        .collect().map(_.getSeq[Long](0).toArray)
      val d = 64; val n = vecs.length
      val s = Array.ofDim[Double](d)
      vecs.foreach(v => (0 until d).foreach(i => s(i) += v(i)))
      val diag = Array.ofDim[Double](d)
      vecs.foreach(v => (0 until d).foreach(i => diag(i) += v(i).toDouble * v(i)))
      got.foreach { case (i, g, _) =>
        assert(g.toDouble == n * diag(i.toInt) - s(i.toInt) * s(i.toInt)) }
    }
  }

  test("q104 pcaPower: recovers a planted dominant direction exactly") {
    // the fixture embeddings are near-isotropic (lambda2/lambda1 ~ 0.98),
    // so top-eigenvector recovery is only testable on a corpus with a
    // real spectral gap — plant one: x_k = a_k*u + small deterministic
    // noise, with u a fixed unit direction. 32 fixed-point rounds must
    // align with u to better than 1 degree.
    import spark.implicits._
    val d = 16
    val u = (0 until d).map(i => math.sin(i * 2.17 + 0.5)).toArray
    val un = math.sqrt(u.map(x => x * x).sum)
    val rows = (0 until 200).map { k =>
      val a = (k % 41).toDouble - 20.0 // spread along u
      val vec = (0 until d).map { i =>
        math.round(1000.0 * (a * u(i) / un) + ((k * 31 + i * 7) % 11) - 5).toLong
      }
      (k.toLong, vec)
    }
    val df = rows.toDF("vec_id", "qvec")
    Caches.scoped {
      val got = graft.ext.VectorOps.pcaPowerDirection(df, rounds = 32, vs = 1000L)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val v = Array.ofDim[Double](d)
      got.foreach { case (i, x) => v(i.toInt) = x.toDouble }
      val cos = math.abs((0 until d).map(i => v(i) * u(i)).sum) /
        (math.sqrt(v.map(x => x * x).sum) * un)
      assert(cos > 0.9998, s"planted direction not recovered: cosine $cos")
    }
  }
  test("scatterState refuses corpora above its int64 envelope") {
    import spark.implicits._
    // 2 rows at |v| = 3e9: 2·n²·vmax² = 7.2e19 > 2⁶³−1 — the guard must
    // trip BEFORE the d² explode, loudly, instead of a silent wrap
    // corrupting the scatter (and every downstream hash) at scale.
    val over = Seq((0L, Seq(3000000000L, 1L)), (1L, Seq(-3000000000L, 2L)))
      .toDF("vec_id", "qvec")
    Caches.scoped {
      val err = intercept[IllegalArgumentException] {
        graft.ext.VectorOps.scatterState(over)
      }
      assert(err.getMessage.contains("int64 envelope"))
    }
    // the same shape inside the envelope plans and computes fine
    // (d² moments + d sums + n row + carried vmax row)
    val under = Seq((0L, Seq(1000L, 1L)), (1L, Seq(-1000L, 2L)))
      .toDF("vec_id", "qvec")
    Caches.scoped {
      assert(graft.ext.VectorOps.scatterState(under).count() == 2L * 2 + 2 + 2)
    }
  }

  test("scatterState: empty corpus still emits the n=0 row; merged envelope re-checked") {
    import spark.implicits._
    // empty corpus: the state must carry (ord=0, n=0) so a downstream
    // merge/finish sees an explicit zero, not a missing row — and
    // pcaFromState must finish to an empty direction, not throw
    val empty = Seq.empty[(Long, Seq[Long])].toDF("vec_id", "qvec")
    Caches.scoped {
      val st = graft.ext.VectorOps.scatterState(empty).collect()
        .map(r => (r.getLong(0), r.getLong(3)))
      assert(st.contains((0L, 0L)), s"missing (ord=0, n=0) row: ${st.toSeq}")
      assert(graft.ext.VectorOps.pcaFromState(
        graft.ext.VectorOps.scatterState(empty), 2, 1000L).count() == 0L)
    }
    // merged envelope: three batches that EACH pass their own per-call
    // 2·n²·vmax² check must still trip the guard once their summed n
    // exceeds the bound (the k²-amplification hole) — vmax rides in
    // the state (ord=3, merged by max) to make the re-check possible
    val vmax = 1500000000L // per batch: 2·1²·vmax² ≈ 4.5e18 < 2⁶³−1
    val batches = (0 until 3).map(b =>
      Seq((b.toLong, Seq(vmax, 0L))).toDF("vec_id", "qvec"))
    Caches.scoped {
      val states = batches.map(graft.ext.VectorOps.scatterState(_))
      val merged = graft.ext.VectorOps.mergeScatterStates(states)
      val err = intercept[IllegalArgumentException] {
        graft.ext.VectorOps.pcaFromState(merged, 2, 1000L)
      }
      assert(err.getMessage.contains("merged state"))
    }
  }

  test("scatterState rejects a null ELEMENT inside a vector loudly") {
    import spark.implicits._
    val rows = Seq((0L, Seq[java.lang.Long](1L, null, 3L)))
      .toDF("vec_id", "qvec")
    Caches.scoped {
      val err = intercept[org.apache.spark.SparkException] {
        graft.ext.VectorOps.scatterState(rows).collect()
      }
      // the kernel's require surfaces inside the task failure — the
      // message must say WHAT is corrupt, not be a bare NPE
      assert(err.getMessage.contains("null element")
        || Option(err.getCause).exists(_.getMessage.contains("null element")))
    }
  }

  test("scatterState kernel: partition-invariant, null vectors count but don't accumulate") {
    import spark.implicits._
    val rnd = new scala.util.Random(20263)
    val rows = (0L until 137L).map(i =>
      (i, Seq.fill(6)((rnd.nextInt(2001) - 1000).toLong)))
    val base = rows.toDF("vec_id", "qvec")
    def stateOf(df: org.apache.spark.sql.DataFrame) = Caches.scoped {
      graft.ext.VectorOps.scatterState(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    }
    // the per-partition Gramian accumulator must be invariant to how
    // rows land on partitions (integer sums commute; the groupBy-sum
    // merge recomposes the same state from any split)
    val want = stateOf(base.repartition(1))
    for (k <- Seq(3, 7, 32))
      assert(stateOf(base.repartition(k)) == want, s"split-variant at k=$k")
    // a null vector row counts toward n (as count(1) did in the explode
    // form) but contributes nothing to the moments
    val withNull = base.unionByName(
      Seq((999L, Option.empty[Seq[Long]])).toDF("vec_id", "qvec"))
    val got = stateOf(withNull.repartition(5))
    assert(got.find(t => t._1 == 0L).get._4 == 138L, "null row must count")
    assert(got.filter(_._1 != 0L) == want.filter(_._1 != 0L),
      "null row must not perturb the moments")
  }

  test("q110 zonemap: zones cover the table exactly and pruning flags are sound") {
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      val zones = graft.queries.Relational.zonemapStats(spark, dir).collect()
      val total = Tables.events(spark, dir).count()
      // exhaustive + disjoint: zone row counts sum to the table
      assert(zones.map(_.getAs[Long]("n_rows")).sum == total)
      val gmax = zones.map(_.getAs[Long]("max_ts_us")).max
      zones.foreach { z =>
        // a zone flagged skippable for `value > hi` must contain zero
        // matching rows (the self-audit column carries ground truth)
        if (z.getAs[Long]("prune_value_hi") == 1L)
          assert(z.getAs[Long]("n_match_hi") == 0L)
        // min/max sane per zone
        assert(z.getAs[Long]("min_ts_us") <= z.getAs[Long]("max_ts_us"))
        assert(z.getAs[Double]("min_value") <= z.getAs[Double]("max_value"))
        // stale flag is exactly the "closed a day before global max" rule
        val stale = z.getAs[Long]("max_ts_us") < gmax - 86400L * 1000000L
        assert((z.getAs[Long]("prune_stale") == 1L) == stale)
      }
    }
  }
  test("q111 PMI: planted collocation wins with the exact closed-form score") {
    import spark.implicits._
    // 8 docs; "alpha beta" always adjacent, fillers alternate.
    // counts: alpha=8 beta=8 filler0=4 filler1=4, N=24;
    // bigrams: "alpha beta" x8, "beta filler0" x4, "beta filler1" x4 -
    // only "alpha beta" survives min-count 6, and
    // pmi_fp = (8-5)*24*1e6 div (8*8) = 1125000.
    val docs = (0 until 8)
      .map(i => (i.toLong, s"alpha beta filler${i % 2}"))
      .toDF("doc_id", "text")
    Caches.scoped {
      val rows = graft.queries.CurationPack.pmiCollocationsFrom(docs).collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("bg") == "alpha beta")
      assert(rows.head.getAs[Long]("cb") == 8L)
      assert(rows.head.getAs[Long]("n_uni") == 24L)
      assert(rows.head.getAs[Long]("pmi_fp") == 1125000L)
    }
  }
  test("q112 fertility: group sums equal the per-doc q33 counters, ratios exact") {
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      val fert = graft.queries.TextPack.tokenizerFertility(spark, dir).collect()
      // brute-force one group from the per-doc q33 counters + raw docs
      val docs = Tables.documents(spark, dir)
        .join(graft.queries.TextPack.bpeTokenCounts(spark, dir), "doc_id")
        .select("lang", "source", "n_chars", "n_ws_tokens", "n_bpe_tokens")
        .collect()
      val g = fert.head
      val (lang, source) = (g.getAs[String]("lang"), g.getAs[String]("source"))
      val sel = docs.filter(r => r.getAs[String]("lang") == lang &&
        r.getAs[String]("source") == source)
      val (sc, sw, sb) = (sel.map(_.getAs[Long]("n_chars")).sum,
        sel.map(_.getAs[Long]("n_ws_tokens")).sum,
        sel.map(_.getAs[Long]("n_bpe_tokens")).sum)
      assert(g.getAs[Long]("n_docs") == sel.length.toLong)
      assert(g.getAs[Long]("sum_chars") == sc)
      assert(g.getAs[Long]("sum_ws_tokens") == sw)
      assert(g.getAs[Long]("sum_bpe_tokens") == sb)
      assert(g.getAs[Long]("bpe_per_ws_fp") == 1000000L * sb / sw)
      assert(g.getAs[Long]("chars_per_bpe_fp") == 1000000L * sc / sb)
    }
  }
  test("q113 KMV merge: batch-split invariant, equals one-shot sketch") {
    import graft.ext.SketchOps
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      val ev = Tables.events(spark, dir)
        .select(col("event_type"), col("user_id"), col("event_id"))
      def key(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[String]("event_type"),
          r.getAs[Long]("n_kept"), r.getAs[Long]("kth_hash"),
          r.getAs[Long]("est_distinct"))).toSet
      val batch = key(SketchOps.kmvDistinct(ev, Seq("event_type"), "user_id"))
      // pathological split: one batch holds everything, four are empty
      val skewed = key(SketchOps.kmvFinalizeKept(
        (ev +: Seq.fill(4)(ev.limit(0)))
          .map(SketchOps.kmvKeptHashes(_, Seq("event_type"), "user_id"))
          .reduce(_ unionByName _), Seq("event_type")))
      // five even slices by user hash (uncorrelated with event order)
      val even = key(SketchOps.kmvFinalizeKept(
        (0 until 5).map(i => SketchOps.kmvKeptHashes(
            ev.filter(pmod(col("user_id"), lit(5)) === i),
            Seq("event_type"), "user_id"))
          .reduce(_ unionByName _), Seq("event_type")))
      assert(batch == skewed && batch == even && batch.nonEmpty)
    }
  }
  test("q114 MAD: exact closed-form on a planted skewed metric") {
    import spark.implicits._
    // one type, values (cents): 100 x9 and one wild 10000.
    // median = 100 (rank (10-1) div 2 + 1 = 5), deviations = 0 x9, 9900;
    // MAD = 0 -> every nonzero deviation is an outlier: n_outliers = 1.
    val ev = ((1 to 9).map(i => ("a", i.toLong, 1.00)) :+ ("a", 10L, 100.00))
      .toDF("event_type", "event_id", "value")
    Caches.scoped {
      // exercise the same arithmetic through a temp-dir events fixture
      val tmp = java.nio.file.Files.createTempDirectory("graft-q114-").toString
      ev.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(col("event_id")))
        .withColumn("user_id", col("event_id"))
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val rows = graft.queries.Relational.madOutliers(spark, tmp).collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[Long]("med") == 100L)
      assert(r.getAs[Long]("mad") == 0L)
      assert(r.getAs[Long]("n") == 10L)
      assert(r.getAs[Long]("n_outliers") == 1L)
      assert(r.getAs[Long]("outlier_ppm") == 100000L)
    }
  }

  test("q115 systematic sample: stride-exact, partition-invariant, heavy doc kept once") {
    import spark.implicits._
    // weights sum to 1000; S=200 -> stride 5. doc 3 weighs 600 (120
    // strides) but must appear exactly once.
    val docs = Seq((1L, 100L), (2L, 100L), (3L, 600L), (4L, 100L), (5L, 100L))
      .map { case (id, w) => (id, "x", w) }.toDF("doc_id", "text", "n_chars")
    Caches.scoped {
      val got = graft.queries.CurationPack.systematicSampleFrom(docs)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stride")))
      // brute force the same rule locally
      var cum = 0L
      val exp = Seq((1L, 100L), (2L, 100L), (3L, 600L), (4L, 100L), (5L, 100L))
        .flatMap { case (id, w) =>
          val lo = cum; cum += w
          if (cum * 200 / 1000 > lo * 200 / 1000) Some((id, cum * 200 / 1000)) else None
        }
      assert(got.toSeq.sortBy(_._1) == exp)
      assert(got.count(_._1 == 3L) == 1)
      val rep = graft.queries.CurationPack.systematicSampleFrom(
        docs.repartition(7, col("text"))).collect().map(_.getAs[Long]("doc_id")).toSet
      assert(rep == got.map(_._1).toSet)
    }
  }
  test("q116 quantile merge: count-table union equals one-shot, any split") {
    val dir = "/root/testdata/sf0.001"
    import graft.ext.StatOps
    Caches.scoped {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
      def key(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = key(StatOps.exactQuantiles(li, "l_extendedprice", Seq(1, 25, 50, 75, 99)))
      // five hash slices, one of them empty-ish: merge must be split-blind
      val merged = (0 until 5).map(i =>
          li.filter(pmod(col("l_orderkey"), lit(5)) === i)
            .groupBy(col("l_extendedprice").as("v")).agg(count(lit(1)).as("c")))
        .reduce(_ unionByName _)
        .groupBy(col("v")).agg(sum(col("c")).as("c"))
      val inc = key(StatOps.exactQuantilesFromCounts(merged, Seq(1, 25, 50, 75, 99)))
      assert(batch == inc && batch.nonEmpty)
    }
  }
  test("q120 rolling active: trailing-7 membership exact on a planted grid") {
    import spark.implicits._
    // user 1 active day 0 only; user 2 active days 0 and 3 (counted once
    // per window); user 3 active day 9. Data days: 0, 3, 9.
    val us = 86400L * 1000000L
    val ev = Seq((1L, 0L), (2L, 0L), (2L, 3L), (3L, 9L)).zipWithIndex
      .map { case ((u, d), i) => (i.toLong, u, d * us, "view", 1.0, "{}") }
      .toDF("event_id", "user_id", "ts_us", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    Caches.scoped {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q120-").toString
      ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val got = graft.queries.Relational.rollingActive(spark, tmp)
        .collect().map(r => (r.getAs[String]("day"), r.getAs[Long]("n_active_7d")))
        .toMap
      // anchors restricted to data days {0,3,9}:
      // day 0: {1,2}; day 3: window [-3,3] -> {1,2}; day 9: [3,9] -> {2,3}
      assert(got == Map("1970-01-01" -> 2L, "1970-01-04" -> 2L, "1970-01-10" -> 2L))
    }
  }
  test("q122 grouped quantiles: closed-form on a planted two-type metric") {
    import spark.implicits._
    // type a: cents 1..10 (n=10): p25 tr=(9*25)div100+1=3 -> 3;
    //   p50 tr=5 -> 5; p75 tr=7 -> 7.
    // type b: cents 100 x4 (n=4): all quantiles land on 100.
    val ev = ((1 to 10).map(i => ("a", i.toLong)) ++
      Seq.fill(4)(("b", 100L))).zipWithIndex
      .map { case ((t, cents), i) =>
        (i.toLong, i.toLong, t, cents.toDouble / 100.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("event_id")))
    Caches.scoped {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q122-").toString
      ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val got = graft.queries.Relational.groupedQuantiles(spark, tmp)
        .collect()
        .map(r => ((r.getAs[String]("event_type"), r.getAs[Long]("p")),
          (r.getAs[Long]("target_rank"), r.getAs[Long]("value")))).toMap
      assert(got == Map(
        ("a", 25L) -> ((3L, 3L)), ("a", 50L) -> ((5L, 5L)),
        ("a", 75L) -> ((7L, 7L)),
        ("b", 25L) -> ((1L, 100L)), ("b", 50L) -> ((2L, 100L)),
        ("b", 75L) -> ((3L, 100L))))
    }
  }
  test("q124 volume anomaly: integer 3-sigma flags exactly the planted spike") {
    import spark.implicits._
    // type a: 10 days at 10 events + 1 day at 40.
    // mean=160/11, var=(11*2500-160^2)/121=(27500-25600)/121 ~ 15.70,
    // sigma~3.96: day at 40 deviates 25.45 > 3 sigma -> flagged;
    // days at 10 deviate 4.55 < 11.9 -> not flagged.
    val us = 86400L * 1000000L
    val rows = (0 until 10).flatMap(d => Seq.fill(10)(d.toLong)) ++
      Seq.fill(40)(10L)
    val ev = rows.zipWithIndex.map { case (d, i) =>
      (i.toLong, i.toLong, "a", 1.0, "{}", d * us) }
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    Caches.scoped {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q124-").toString
      ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val got = graft.queries.Relational.volumeAnomaly(spark, tmp)
        .collect().map(r => (r.getAs[String]("day"),
          r.getAs[Long]("n_events"), r.getAs[Long]("is_anomaly")))
      assert(got.length == 11)
      assert(got.filter(_._3 == 1L).map(_._2).toSeq == Seq(40L))
      assert(got.count(_._3 == 0L) == 10)
    }
  }
  test("q117/q119/q123: brute-force local recomputation matches on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    Caches.scoped {
      // q117 winsorized stats vs driver-side recomputation
      val xs = Tables.lineitem(spark, dir)
        .select(col("l_extendedprice")).collect().map(_.getDouble(0))
      val sortedXs = xs.sorted
      def qd(p: Int): Double = sortedXs((xs.length - 1) * p / 100)
      val (lo, hi) = (qd(1), qd(99))
      val w = xs.map(x => math.min(math.max(x, lo), hi))
      val r = graft.queries.Relational.winsorizedStats(spark, dir).collect().head
      assert(r.getAs[Double]("lo") == lo && r.getAs[Double]("hi") == hi)
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(r.getAs[Long]("n_clip_lo") == xs.count(_ < lo).toLong)
      assert(r.getAs[Long]("n_clip_hi") == xs.count(_ > hi).toLong)
      assert(r.getAs[Double]("sum_w") ==
        w.map(x => math.round(x * 100.0)).sum.toDouble / 100.0)

      // q119 dup inflation vs local grouping
      val docs = Tables.documents(spark, dir)
        .select("source", "text").collect()
        .map(r2 => (r2.getString(0), r2.getString(1)))
      val bySource = docs.groupBy(_._1)
      val got = graft.queries.TextPack.dupInflation(spark, dir).collect()
      assert(got.length == bySource.size)
      got.foreach { g =>
        val ds = bySource(g.getAs[String]("source"))
        val distinct = ds.map(_._2).distinct.length.toLong
        assert(g.getAs[Long]("n_docs") == ds.length.toLong)
        assert(g.getAs[Long]("n_distinct_fp") == distinct)
        assert(g.getAs[Long]("n_dup_docs") == ds.length - distinct)
        assert(g.getAs[Long]("inflation_ppm") == 1000000L * ds.length / distinct)
      }

      // q123 skew census vs local top-20
      val users = Tables.events(spark, dir)
        .select("user_id").collect().map(_.getLong(0))
      val counts = users.groupBy(identity).map { case (u, a) => (u, a.length.toLong) }
      val top = counts.toSeq.sortBy { case (u, c) => (-c, u) }.take(20)
      val census = graft.queries.Relational.keySkewCensus(spark, dir).collect()
        .map(r2 => (r2.getAs[Long]("user_id"), r2.getAs[Long]("n_rows")))
      assert(census.toSeq == top)
    }
  }

  test("kmvPairOverlap: maxGroups contract trips loudly, lifts explicitly") {
    // The operator is group-count-quadratic by contract (pair frame =
    // groups²/2). The guard must fail BEFORE any pair frame is built —
    // a caller passing a near-unique key must get the contract named,
    // not a 10¹⁰-row job (same precedent as the PCA int64 envelope).
    import spark.implicits._
    import graft.ext.SketchOps
    Caches.scoped {
      val kept = (0L until 6L).flatMap(g => (0L until 4L).map(h => (s"g$g", g * 100 + h)))
        .toDF("source", "h")
      val e = intercept[IllegalArgumentException] {
        SketchOps.kmvPairOverlap(kept, "source", maxGroups = 4)
      }
      assert(e.getMessage.contains("group-count-quadratic") &&
        e.getMessage.contains("maxGroups=4"),
        s"guard must name the contract: ${e.getMessage}")
      // lifting the bound explicitly restores the documented behavior:
      // C(6,2) = 15 ordered pairs, all with k_used > 0
      val ok = SketchOps.kmvPairOverlap(kept, "source", maxGroups = 6)
      assert(ok.count() == 15L)
    }
  }

  test("q149 containment ⊇ q47 jaccard: every verified pair survives with containments ≥ jaccard") {
    Caches.scoped {
      val dir = "/root/testdata/sf0.001"
      val j = graft.queries.TextPack.lshJaccardVerify(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val c = graft.queries.TextPack.lshContainmentVerify(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
      assert(j.nonEmpty, "fixture must produce verified jaccard pairs")
      // jaccard >= 0.5 ⇒ both containments >= 0.5 ⇒ pair is in q149
      j.foreach { case (pair, jac) =>
        val (c1, c2) = c.getOrElse(pair, fail(s"q47 pair $pair missing from q149"))
        assert(c1 >= jac - 1e-12 && c2 >= jac - 1e-12,
          s"containment below jaccard for $pair: ($c1, $c2) < $jac")
      }
      // asymmetry sanity: containments are per-side set fractions in [0,1]
      c.values.foreach { case (c1, c2) =>
        assert(c1 > 0.0 && c1 <= 1.0 && c2 > 0.0 && c2 <= 1.0)
      }
    }
  }

  test("q149 containment catches a doc-in-doc near-superset that jaccard misses") {
    import spark.implicits._
    Caches.scoped {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q149-").toString
      // doc 2 = doc 1 plus 4x padding: jaccard(1,2) ≈ |A|/|B| ≈ 0.2 (below
      // the 0.5 verify bar) but containment1 = 1.0 — the asymmetric case.
      val base = (1 to 12).map(i => s"w$i").mkString(" ")
      val pad = (13 to 60).map(i => s"w$i").mkString(" ")
      Seq((1L, base), (2L, s"$base $pad"))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val jac = graft.queries.TextPack.lshJaccardVerify(spark, tmp).collect()
      assert(jac.isEmpty, s"jaccard verify should reject the embedded doc: ${jac.toSeq}")
      val con = graft.queries.TextPack.lshContainmentVerify(spark, tmp).collect()
      assert(con.length == 1, s"containment verify must keep the embedded doc: ${con.toSeq}")
      val r = con.head
      assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
      assert(r.getDouble(2) == 1.0, s"containment1 must be exactly 1.0: ${r.getDouble(2)}")
      assert(r.getDouble(3) < 0.5, s"containment2 must stay small: ${r.getDouble(3)}")
    }
  }

  test("q150 source TV distance: hand-computed exact ppm, bounds, and self-consistency") {
    import spark.implicits._
    Caches.scoped {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q150-").toString
      // A = {a:2, b:1}, B = {a:1, b:2}: TV = 1 − Σ min(p,q) = 1 − (1/3 + 1/3)
      // = 1/3; smin = min(2·3,1·3) + min(1·3,2·3) = 6; ppm = 10⁶ − ⌊6·10⁶/9⌋
      // = 10⁶ − 666666 = 333334. C = {c:1} shares nothing with A or B:
      // TV = 1 exactly, n_shared_terms = 0 (the LEFT-join branch).
      Seq((1L, "a a b", "A"), (2L, "a b b", "B"), (3L, "c", "C"))
        .toDF("doc_id", "text", "source")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = graft.queries.TextPack.sourceTvDistance(spark, tmp).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(rows.size == 3)
      assert(rows(("A", "B")) == (2L, 333334L), s"AB: ${rows(("A", "B"))}")
      assert(rows(("A", "C")) == (0L, 1000000L))
      assert(rows(("B", "C")) == (0L, 1000000L))
      // real fixture: every pair in [0, 10⁶], every source present
      val real = graft.queries.TextPack.sourceTvDistance(spark, "/root/testdata/sf0.001")
        .collect()
      assert(real.nonEmpty)
      real.foreach { r =>
        val tv = r.getLong(3)
        assert(tv >= 0L && tv <= 1000000L, s"tv_ppm out of range: $r")
      }
    }
  }

  test("q150 TV distance is a metric on the real fixture: triangle inequality over all source triples") {
    Caches.scoped {
      // TV is a true metric; the ppm rows floor the exact rational, so
      // each side carries <1 ppm of downward error — the inequality must
      // hold within 2 ppm of slack. An arithmetic slip (wrong total,
      // swapped min operands, off-by-one division) breaks this across
      // many of the 1 140 triples at once.
      val tv = graft.queries.TextPack
        .sourceTvDistance(spark, "/root/testdata/sf0.001").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
      def d(a: String, b: String): Long = {
        val (lo, hi) = if (a < b) (a, b) else (b, a)
        if (a == b) 0L else tv.getOrElse((lo, hi), fail(s"missing pair ($a,$b)"))
      }
      val sources = tv.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
      assert(sources.size >= 3, "fixture must have at least 3 sources")
      for (a <- sources; b <- sources if a < b; c <- sources if b < c) {
        assert(d(a, c) <= d(a, b) + d(b, c) + 2L, s"triangle violated: $a,$b,$c")
        assert(d(a, b) <= d(a, c) + d(b, c) + 2L, s"triangle violated: $b,$a,$c")
        assert(d(b, c) <= d(a, b) + d(a, c) + 2L, s"triangle violated: $a,$c,$b")
      }
    }
  }

  test("q151 shingle novelty: first doc fully novel, exact duplicate fully stale, ppm exact") {
    import spark.implicits._
    Caches.scoped {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q151-").toString
      val t1 = "w1 w2 w3 w4" // shingles {w1w2w3, w2w3w4}
      val t3 = "w3 w4 w5"    // shingle {w3w4w5} — novel despite shared words
      Seq((1L, t1), (2L, t1), (3L, t3))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = graft.queries.TextPack.shingleNovelty(spark, tmp).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(rows(1L) == (2L, 2L, 1000000L), s"doc1: ${rows(1L)}")
      assert(rows(2L) == (2L, 0L, 0L), s"exact dup must be 0-novel: ${rows(2L)}")
      assert(rows(3L) == (1L, 1L, 1000000L), s"doc3: ${rows(3L)}")
      // real fixture invariants: the lowest doc_id is fully novel; counts
      // and ppm stay in range everywhere
      val real = graft.queries.TextPack.shingleNovelty(spark, "/root/testdata/sf0.001")
        .collect()
      assert(real.nonEmpty)
      val first = real.minBy(_.getLong(0))
      assert(first.getLong(3) == 1000000L, s"first doc must be fully novel: $first")
      real.foreach { r =>
        assert(r.getLong(2) <= r.getLong(1), s"n_novel > n_shingles: $r")
        assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L, s"ppm out of range: $r")
      }
    }
  }
}
