package graft

import graft.ext.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the curation pack's building blocks — the oracle
  * gates (q55–q59) prove end-to-end parity; these pin the component
  * contracts on adversarial micro-graphs the fixture corpus can't
  * plant.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def components(edges: Seq[(Long, Long)], maxIters: Int = 20,
      fallback: Boolean = false): Map[Long, Long] = {
    import spark.implicits._
    Caches.scoped {
      GraphOps.connectedComponents(edges.toDF("src", "dst"), "src", "dst", maxIters,
          fallbackToStar = fallback)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
  }

  test("connectedComponents: clique, chain, isolated pair, self-loop") {
    val clique = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val chain = Seq((20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L))
    val pair = Seq((30L, 31L))
    val loop = Seq((40L, 40L))
    val got = components(clique ++ chain ++ pair ++ loop)
    assert((10L to 13L).forall(got(_) == 10L))
    assert((20L to 24L).forall(got(_) == 20L))
    assert(got(30L) == 30L && got(31L) == 30L)
    assert(got(40L) == 40L)
    assert(got.size == 12)
  }

  test("connectedComponents: min label flows AGAINST edge direction too") {
    // edges only point high→low reachable via symmetric closure; a
    // directed implementation would leave 5 labeled 5
    val got = components(Seq((5L, 9L), (9L, 1L)))
    assert(got == Map(5L -> 1L, 9L -> 1L, 1L -> 1L))
  }

  test("connectedComponents: duplicate + reversed edges collapse to one graph") {
    val got = components(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents: diameter beyond maxIters fails loudly, not wrongly") {
    val path = (0L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](components(path, maxIters = 3))
    assert(e.getMessage.contains("did not converge"))
    assert(components(path).forall(_._2 == 0L)) // default bound converges
  }

  test("connectedComponents: deep chain auto-falls-back to starComponents") {
    // 120-hop path, 3-round budget: label propagation cannot close it,
    // and with the default fallback the caller still gets correct labels
    // (the contraction path) without intervening. A correct shallow
    // graph in the same call proves the fast path is unaffected.
    val path = (0L until 120L).map(i => (i, i + 1))
    val pair = Seq((500L, 501L))
    val got = components(path ++ pair, maxIters = 3, fallback = true)
    assert(got.size == 123)
    assert((0L to 120L).forall(n => got(n) == 0L))
    assert(got(500L) == 500L && got(501L) == 500L)
  }

  private def starComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Caches.scoped {
      GraphOps.starComponents(edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
  }

  test("starComponents ≡ label propagation on cliques, paths, stars, random graphs") {
    val clique = for (i <- 0L to 9L; j <- (i + 1) to 9L) yield (i, j)
    val path = (100L until 140L).map(i => (i + 1, i)) // deep chain, reversed edges
    val star = (200L to 220L).map(i => (210L, i)) // includes a self-loop
    // deterministic pseudo-random multigraph with dups + self-loops
    val rand = (0 until 300).map { i =>
      val h = i * 2654435761L
      (300L + math.floorMod(h, 97), 300L + math.floorMod(h >> 7, 97))
    }
    for (g <- Seq(clique, path, star, rand, clique ++ path ++ star ++ rand)) {
      assert(starComponents(g) == components(g, maxIters = 60),
        s"divergence on graph with ${g.size} edges")
    }
  }

  test("starComponents: a 40-hop path converges well inside the round bound") {
    // label propagation needs 40 rounds here; the contraction's round
    // budget of 12 only closes if neighborhoods rewire super-linearly
    val path = (0L until 40L).map(i => (i, i + 1))
    import spark.implicits._
    val got = Caches.scoped {
      GraphOps.starComponents(path.toDF("src", "dst"), "src", "dst", maxIters = 12)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }

  test("repetition filter: top-bigram tie-break is (count desc, bigram asc)") {
    // "b c" and "a b" both occur twice — the reported top bigram must be
    // the lexicographically smaller one, in any partitioning
    import spark.implicits._
    val doc = Seq((1L, "a b c a b c x")).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val bg = doc.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2))))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("n")).as("neg"), col("bg"))).as("m"))
      .select(col("m.bg"), (-col("m.neg")).as("n")).head()
    assert(bg.getString(0) == "a b" && bg.getLong(1) == 2L)
  }

  test("exactQuantiles: equals sort-and-index truth, partition-invariant") {
    import spark.implicits._
    import graft.ext.StatOps
    // duplicates + negative values + a scrambled insertion order
    val vals: Seq[Double] = (0 until 500).map(i => ((i * 7919) % 100 - 50).toDouble)
    val ps = Seq(0, 1, 37, 50, 99, 100)
    val sortedVals = vals.sorted
    val expect = ps.map { p =>
      val rank = (vals.size - 1).toLong * p / 100 + 1
      (p.toLong, rank, sortedVals((rank - 1).toInt))
    }.toSet
    def got(numParts: Int) = Caches.scoped {
      StatOps.exactQuantiles(vals.toDF("x").repartition(numParts), "x", ps)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(got(1) == expect)
    assert(got(13) == expect) // partitioning must not change the answer
  }

  test("connectedComponents: non-convergence reports per-round deltas") {
    import spark.implicits._
    // a 3000-hop path cannot converge in 3 shortcutted rounds; the
    // failure message must carry the convergence trace (one label-mass
    // delta per round) so a 100 TB operator can see progress, not just
    // the bound
    val path = (0L until 3000L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Caches.scoped {
        GraphOps.connectedComponents(path.toDF("src", "dst"), "src", "dst",
          maxIters = 3, fallbackToStar = false).collect()
      }
    }
    assert(ex.getMessage.contains("label-mass delta per round"))
    assert("""\d+, \d+, \d+""".r.findFirstIn(ex.getMessage).isDefined,
      s"expected three per-round deltas in: ${ex.getMessage}")
  }

  test("groupedRunningAgg: equals the per-group window, numParts-invariant on skew") {
    import spark.implicits._
    import graft.ext.PrefixOps
    import org.apache.spark.sql.expressions.Window
    // skewed fixture: one dominant group holds ~90% of rows (the shape
    // that serializes a per-group window onto one task at scale), with
    // hash-collision ties broken by id — the operator's order contract
    val rows = (1L to 1000L).map { i =>
      val g = if (i % 10 == 0) s"src${i % 3}" else "web"
      (i, g, i * 2654435761L % 97, i % 7 + 1)
    }
    val df = rows.toDF("id", "g", "h", "n")
    val w = Window.partitionBy(col("g")).orderBy(col("h"), col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("running_sum", sum(col("n")).over(w))
      .select(col("id"), col("rank"), col("running_sum"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (parts <- Seq(1, 3, 17)) Caches.scoped {
      val out = PrefixOps.groupedRunningAgg(df.repartition(5), Seq("g"), Seq("h", "id"),
        sumCol = Some("n"), numParts = parts)
      val got = out.select(col("id"), col("rank"), col("running_sum"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want, s"numParts=$parts must reproduce the window result")
      // parallelism stays numParts end to end — a per-group window
      // would collapse the dominant group to ONE task regardless
      assert(out.rdd.getNumPartitions == parts,
        s"output parallelism must be $parts, got ${out.rdd.getNumPartitions}")
    }
  }

  test("runningMaxExclusive: equals the unpartitioned window, numParts-invariant, null head") {
    import spark.implicits._
    import graft.ext.PrefixOps
    import org.apache.spark.sql.expressions.Window
    // non-monotone values so the running max is not just the previous
    // row; exercised shape = q129 (zones ordered, max over prior rows)
    val rows = (1L to 500L).map(i => (i, (i * 2654435761L) % 1000))
    val df = rows.toDF("zone", "v")
    val w = Window.orderBy(col("zone")).rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("pm", max(col("v")).over(w))
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    for (parts <- Seq(1, 3, 17)) Caches.scoped {
      val out = PrefixOps.runningMaxExclusive(
        df.repartition(5), Seq("zone"), "v", numParts = parts, maxName = "pm")
      val got = out.collect()
        .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
      assert(got == want, s"numParts=$parts must reproduce the window result")
      assert(got(1L).isEmpty, "globally first row has no predecessor -> NULL")
      assert(out.rdd.getNumPartitions == parts)
    }
    // empty frame: no rows, no driver crash
    Caches.scoped {
      assert(PrefixOps.runningMaxExclusive(
        df.filter(col("zone") < 0), Seq("zone"), "v").count() == 0L)
    }
  }

  test("groupedRunningAgg refuses near-unique group keys (slice-count contract)") {
    import spark.implicits._
    import graft.ext.PrefixOps
    // a per-document key: one slice per row — exactly the misuse the
    // O(numParts + #groups) driver-traffic contract must refuse
    val df = (1L to 500L).map(i => (i, i % 7 + 1)).toDF("doc_id", "n")
    val err = intercept[IllegalArgumentException] {
      Caches.scoped {
        PrefixOps.groupedRunningAgg(df, Seq("doc_id"), Seq("doc_id"),
          sumCol = Some("n"), maxCollectedSlices = 100)
      }
    }
    assert(err.getMessage.contains("O(numParts + #groups)") &&
      err.getMessage.contains("doc_id"))
  }

  test("interval join: inclusive bounds, bucket straddling, misses drop") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    // bucketWidth 10: interval [5, 27] covers buckets 0,1,2
    val iv = Seq((1L, 5L, 27L), (2L, 40L, 41L)).toDF("k", "s", "e")
    val pts = Seq(
      (1L, 5L, "start-edge"), (1L, 27L, "end-edge"), (1L, 15L, "mid"),
      (1L, 28L, "past-end"), (1L, 4L, "before"), (2L, 15L, "wrong-key"),
      (2L, 40L, "k2-in")).toDF("k", "t", "tag")
    val got = Caches.scoped {
      IntervalJoin.pointInInterval(pts, iv, "t", "s", "e", Seq("k"), 10L)
        .select("tag").collect().map(_.getString(0)).toSet
    }
    assert(got == Set("start-edge", "end-edge", "mid", "k2-in"))
  }

  test("hll sketch: estimate lands within 2 sigma across cardinality decades") {
    import spark.implicits._
    import graft.ext.SketchOps
    for (n <- Seq(500, 5000, 50000)) {
      val df = (0 until n).map(i => (1, i * 31L + 7)).toDF("g", "v")
      val est = Caches.scoped {
        SketchOps.hllDistinct(df, Seq("g"), "v").head().getAs[Long]("estimate")
      }
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.26, s"n=$n estimate=$est err=$err") // 2 * 1.04/sqrt(64)
    }
  }

  test("weightedPageRank: matches a sequential integer reference, hub outranks leaves") {
    import spark.implicits._
    import graft.ext.GraphOps
    // undirected star a-{b,c,d} plus a b-c side edge, as symmetric
    // directed input (the TextRank shape)
    val und = Seq(("a", "b", 3L), ("a", "c", 1L), ("a", "d", 1L), ("b", "c", 2L))
    val sym = und ++ und.map { case (s, d, w) => (d, s, w) }
    val iters = 3
    val got = Caches.scoped {
      GraphOps.weightedPageRank(sym.toDF("src", "dst", "w"), iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // sequential reference: same integer fixed-point update
    val scale = 1000000000000L
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val base = scale / nodes.length
    val wout = sym.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var rank = nodes.map(_ -> base).toMap
    (0 until iters).foreach { _ =>
      val sums = sym.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => rank(e._1) * e._3 / wout(e._1)).sum
      }
      rank = nodes.map(n => n -> (base * 15 + 85 * sums.getOrElse(n, 0L)) / 100).toMap
    }
    assert(got == rank)
    // the hub holds the most mass; total mass stays within truncation loss
    assert(got("a") == got.values.max)
    val mass = got.values.sum
    assert(mass <= scale && mass > scale - 1000L)
  }

  test("hll registers: split-merge equals the one-shot sketch exactly") {
    import spark.implicits._
    import graft.ext.SketchOps
    val df = (0 until 5000).map(i => (i % 3, i * 17L + 3)).toDF("g", "v")
    val whole = Caches.scoped {
      SketchOps.hllDistinct(df, Seq("g"), "v")
        .collect().map(_.toSeq).toSet
    }
    // overlapping halves (2/3 each) — max-merge must collapse the overlap
    val merged = Caches.scoped {
      val a = SketchOps.hllRegisters(df.filter(col("v") % 3 =!= 0), Seq("g"), "v")
      val b = SketchOps.hllRegisters(df.filter(col("v") % 3 =!= 1), Seq("g"), "v")
      SketchOps.hllFinalize(
          SketchOps.hllMergeRegisters(Seq(a, b), Seq("g")), Seq("g"))
        .collect().map(_.toSeq).toSet
    }
    assert(merged == whole)
  }

  test("kmv sketch: exact below k, duplicate-blind, within 2/sqrt(k) above k") {
    import spark.implicits._
    import graft.ext.SketchOps
    // below k: the sketch IS the distinct set — estimate exact, even
    // with every value duplicated
    val small = (0 until 40).flatMap(i => Seq((1, i.toLong), (1, i.toLong)))
      .toDF("g", "v")
    val sRow = SketchOps.kmvDistinct(small, Seq("g"), "v").head()
    assert(sRow.getAs[Long]("n_kept") == 40L)
    assert(sRow.getAs[Long]("est_distinct") == 40L)
    // above k: estimate within ~2/sqrt(k) relative error across decades
    for (n <- Seq(2000, 20000)) {
      val df = (0 until n).map(i => (1, i * 31L + 7)).toDF("g", "v")
      val row = Caches.scoped {
        SketchOps.kmvDistinct(df, Seq("g"), "v").head()
      }
      assert(row.getAs[Long]("n_kept") == SketchOps.KmvK.toLong)
      val est = row.getAs[Long]("est_distinct")
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.25, s"n=$n estimate=$est err=$err") // 2/sqrt(64)
      // the estimator is the pure integer division of the kept state
      val kth = row.getAs[Long]("kth_hash")
      assert(est == (SketchOps.KmvK - 1).toLong * SketchOps.KmvRange / kth)
    }
  }

  test("count-min: never underestimates, and split-merge equals one-shot") {
    import spark.implicits._
    import graft.ext.SketchOps
    val vals = (0 until 2000).map(i => s"v${i % 97}")
    val df = vals.toDF("v")
    Caches.scoped {
      val exact = vals.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      val items = exact.keys.toSeq.toDF("v")
      val est = SketchOps.cmsEstimate(SketchOps.cmsCounters(df, "v"), items, "v")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(exact.forall { case (k, n) => est(k) >= n }) // CMS guarantee
      // mergeability: counters from two halves, summed, == one-shot
      val (a, b) = vals.splitAt(900)
      val merged = SketchOps.cmsCounters(a.toDF("v"), "v")
        .union(SketchOps.cmsCounters(b.toDF("v"), "v"))
        .groupBy("i", "j").agg(sum("c").as("c"))
      val whole = SketchOps.cmsCounters(df, "v")
      assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
      // unseen item probing empty cells: estimate must be 0, and the
      // row must not drop out of the result
      val sparse = SketchOps.cmsCounters(Seq("only").toDF("v"), "v")
      val unseen = SketchOps.cmsEstimate(sparse, Seq("never-inserted").toDF("v"), "v")
        .collect()
      assert(unseen.length == 1 && unseen.head.getLong(1) == 0L)
    }
  }

  test("repetition/LM gates survive 0- and 1-token documents") {
    import spark.implicits._
    import graft.queries.CurationPack
    val docs = Seq((1L, "single"), (2L, ""), (3L, "two words here")).toDF("doc_id", "text")
    Caches.scoped {
      // no bigrams → dropped from both gates, NOT a slice() crash
      assert(CurationPack.repetitionFilterFrom(docs)
        .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(3L))
      assert(CurationPack.bigramLikelihoodFrom(docs)
        .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    }
  }

  test("q75 span dedup: maximal islands, wrapped docs split, planted tail spans") {
    Caches.scoped {
      val rows = graft.queries.CurationPack.spanDedup(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.nonEmpty)
      // span_tokens is the inclusive token width
      assert(rows.forall { case (_, s, e, n) => n == e - s + 1 })
      // islands are maximal: within a doc, consecutive spans have a real
      // gap (next start > prev end + 1), else they would have merged
      rows.groupBy(_._1).values.foreach { sp =>
        sp.sortBy(_._2).sliding(2).foreach {
          case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1)
          case _                                   => ()
        }
      }
      // a head+tail-wrapped doc (%41) with a unique middle → two islands
      assert(rows.groupBy(_._1).exists { case (id, sp) => id % 41 == 0 && sp.length >= 2 })
      // a tail-only planted doc (%37, not %41) has a span away from 0
      assert(rows.exists { case (id, s, _, _) => id % 37 == 0 && id % 41 != 0 && s > 0 })
    }
  }

  test("q78 span removal: min doc owns everything it contains, full removal collapses to ''") {
    Caches.scoped {
      val rows = graft.queries.CurationPack.spanRemoval(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(rows.nonEmpty)
      // the globally smallest doc_id is the canonical owner of every
      // shingle it contains — it can never lose a token
      assert(!rows.exists(_._1 == 0L))
      assert(rows.forall(_._2 > 0))
      // whole-doc non-owner duplicates collapse to the empty string
      val emptyFp = "d41d8cd98f00b204e9800998ecf8427e"
      assert(rows.exists(_._3 == emptyFp), "full-removal path never fired")
      // a planted %37 doc loses exactly the 10-token tail phrase when
      // its body is unique (tail = 10 tokens, all covered)
      assert(rows.exists { case (id, n, fp) =>
        id % 37 == 0 && id % 41 != 0 && n == 10 && fp != emptyFp })
    }
  }

  test("q80 corpus split: exhaustive, disjoint, and stable under corpus growth") {
    Caches.scoped {
      import graft.queries.CurationPack
      val dir = "/root/testdata/sf0.001"
      val manifest = CurationPack.corpusSplit(spark, dir).collect()
      val splits = manifest.map(_.getString(0)).toSet
      assert(splits.subsetOf(Set("train", "val", "test")))
      // exhaustive: manifest doc counts sum to the corpus size
      val total = manifest.map(_.getLong(2)).sum
      assert(total == Tables.documents(spark, dir).count())
      // train dominates (96% of buckets)
      val byS = manifest.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
      assert(byS("train") > byS.getOrElse("val", 0L) &&
        byS("train") > byS.getOrElse("test", 0L))
      // STABILITY: the split of a doc is a pure function of doc_id, so
      // restricting the corpus to any subset must reproduce the full
      // run's per-(split,source) hash checksums for the surviving docs —
      // ingesting more data never reassigns history
      val half = CurationPack.corpusSplit(spark, dir) // recompute = same
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
      val again = manifest.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
      assert(half == again)
    }
  }

  test("q81 importance scoring: weights bounded by the smoothed ratio, target docs favored") {
    Caches.scoped {
      import graft.queries.CurationPack
      val dir = "/root/testdata/sf0.001"
      val top = CurationPack.importanceResample(spark, dir).collect()
      assert(top.length > 0 && top.length <= 100)
      // ordering contract: score desc, doc_id asc tiebreak
      top.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(1) > b.getLong(1) ||
            (a.getLong(1) == b.getLong(1) && a.getLong(0) < b.getLong(0)))
        case _ => ()
      }
      // target ⊆ raw ⇒ every bucket weight ≤ SCALE (ratio ≤ 1), so a
      // doc's score can never exceed SCALE × its bigram count
      assert(top.forall(r => r.getLong(1) <= 10000L * r.getLong(2)))
      // the selected set should over-represent the target language vs
      // the corpus base rate — the entire point of importance weighting
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val base = docs.values.count(_ == "en").toDouble / docs.size
      val sel = top.map(r => docs(r.getLong(0)))
      assert(sel.count(_ == "en").toDouble / sel.length > base)
    }
  }

  test("q57 fixed-point BM25 scalar: exact closed-form on known inputs") {
    // one term, df=2, N=4, sum_dl=40, dl=10, tf=3:
    //   idf_fp   = floor(1e6 * (2*4-2*2+1) / (2*2+1)) = 1_000_000
    //   norm_fp  = 250 + floor(750*10*4/40)            = 1000
    //   denom_fp = 3*1000 + floor(1200*1000/1000)      = 4200
    //   score    = floor(1e6 * 3 * 2200 / 4200)        = 1_571_428
    import spark.implicits._
    val row = Seq((3L, 2L, 10L, 4L, 40L)).toDF("tf", "df", "dl", "n_docs", "sum_dl")
    val idfFp = floor(lit(1000000L) * (lit(2L) * col("n_docs") - lit(2L) * col("df") + 1L)
      / (lit(2L) * col("df") + 1L)).cast("long")
    val normFp = lit(250L) + floor(lit(750L) * col("dl") * col("n_docs") / col("sum_dl")).cast("long")
    val denomFp = col("tf") * 1000L + floor(lit(1200L) * normFp / lit(1000L)).cast("long")
    val s = row.select(floor(idfFp * col("tf") * lit(2200L) / denomFp).cast("long")).head().getLong(0)
    assert(s == 1571428L)
  }

  test("q103 bpe encode: counts consistent with raw corpus and trained merges") {
    Caches.scoped {
      import graft.queries.CurationPack
      val dir = "/root/testdata/sf0.001"
      val enc = CurationPack.bpeEncode(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(enc.nonEmpty)
      // exhaustive: one row per document
      assert(enc.length == Tables.documents(spark, dir).count())
      // n_words is the raw whitespace unit count — the wrap-marker
      // counting trick must agree with splitting the original text
      val raw = Tables.documents(spark, dir)
        .select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      enc.foreach { case (id, w, _, _, _) => assert(w == raw(id), s"doc $id") }
      // arithmetic invariants: 1 <= n_tokens <= n_words, merges = diff,
      // ppm exact-integer
      enc.foreach { case (_, w, t, m, ppm) =>
        assert(t >= 1 && t <= w && m == w - t && ppm == m * 1000000L / w)
      }
      // the trained merges actually fired somewhere in the corpus
      assert(enc.map(_._4).sum > 0, "no merge ever applied")
    }
  }

  test("q107 bloom gate: admits every exact q67 contamination (no false negatives)") {
    Caches.scoped {
      import graft.queries.CurationPack
      val dir = "/root/testdata/sf0.001"
      val bloom = CurationPack.bloomDecontaminate(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val exactDocs = CurationPack.decontaminate(spark, dir).collect()
        .map(_.getLong(0)).toSet
      // every doc q67 flags must survive the Bloom gate with n_exact > 0
      val bloomExact = bloom.filter(_._3 > 0).map(_._1).toSet
      assert(bloomExact == exactDocs,
        s"missed ${exactDocs -- bloomExact}, phantom ${bloomExact -- exactDocs}")
      // flag consistency and bloom superset per doc
      bloom.foreach { case (_, nb, ne, fp) =>
        assert(nb >= ne && fp == (if (ne == 0) 1L else 0L))
      }
      // the gate actually prunes: false positives exist but are a strict
      // subset of the probe stream (sanity that the filter isn't saturated)
      assert(bloom.count(_._4 == 1L) < bloom.length)
    }
  }
}
