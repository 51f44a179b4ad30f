package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts for the curation-pack operators: the scale
  * claims in SCALE.md asserted against `executedPlan`, so a regression
  * that silently degrades a broadcast to a shuffle or an equi-join to a
  * nested loop fails CI, not a 100 TB run. (Same technique as
  * BucketingSpec's zero-shuffle assertion.)
  */
class PlanContractSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def executed(q: String) = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect() // AQE finalizes the plan only after execution
    df.queryExecution.executedPlan
  }

  test("q57 BM25: bounded stats broadcast, top-k runs as WindowGroupLimit") {
    Caches.scoped {
      val df = SparkEntry.queries("q57_bm25_topk")(spark, dir)
      // the corpus-proportional query set must carry NO broadcast hint
      // (a hint there pins a 100 TB OOM into the plan; AQE broadcasting
      // at runtime when the size fits is fine and indistinguishable
      // physically, so the contract is on the analyzed plan's hints)
      val hintedOnQueries = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.output.exists(_.name == "q_id") => h
      }
      assert(hintedOnQueries.isEmpty,
        s"query side must not carry a broadcast hint:\n${df.queryExecution.analyzed}")
      df.collect()
      val plan = df.queryExecution.executedPlan
      // the 1-row corpus stats is the only side that MUST broadcast
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"corpus stats side must broadcast:\n$plan")
      assert(collect(plan) { case w: WindowGroupLimitExec => w }.nonEmpty,
        s"rank <= k must push down as WindowGroupLimit:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian product allowed:\n$plan")
    }
  }

  test("q29: single row-wise pass, no self-join anywhere in the plan") {
    // Round 12's 10x-fixture audit caught `stats.join(frames, "key")`
    // squaring duplicate keys (150018 vs 150000 rows) — the join assumed
    // a key-uniqueness contract the row-wise oracle never had, and at
    // scale shuffled the media bytes on both sides. The operator is now
    // one mapPartitions pass with the frame columns computed in place;
    // pin that shape: no join of ANY kind, no shuffle exchange.
    Caches.scoped {
      val plan = executed("q29_multimodal_stats")
      val joins = collect(plan) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.isEmpty, s"q29 must be join-free (row-wise pass):\n$plan")
      val shuffles = collect(plan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      // the only allowed exchange is the UPSTREAM repartitionByRange of
      // the bare keys (customerKeys) — there is no global orderBy any
      // more; total order comes from sortWithinPartitions over the
      // range-partitioned keys
      assert(shuffles.size <= 1,
        s"q29 must shuffle at most once (upstream key range-partition):\n$plan")
    }
  }

  test("q129/q141: zone prefix passes are window-free (PrefixOps, not WindowExec)") {
    // These were the engine's last two UNPARTITIONED windows (running
    // max / running sum over the zones frame — single-task WindowExec,
    // "No Partition Defined" in every bench log). Both now run through
    // PrefixOps' two-pass range-partitioned prefix scheme; pin the
    // window-free shape so a refactor can't silently reintroduce the
    // single-task sort.
    for (q <- Seq("q129_ingest_disorder", "q141_compaction_plan")) Caches.scoped {
      val plan = executed(q)
      val wins = collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not contain a WindowExec:\n$plan")
    }
  }

  test("q12/q25: synthetic decode spreads across cores before the generate map") {
    // the customer parquet is one split; without an explicit key
    // repartition the CPU-bound frame-generate+decode chain (and the
    // range-sort's sampling re-execution of it) runs on ONE task —
    // round-10 measured 1.70 → 0.50 s from this exchange. Pin the
    // round-robin shuffle so a refactor can't silently serialize the
    // decode again.
    for (q <- Seq("q12_token_pipeline", "q25_cluster_pipeline")) Caches.scoped {
      val plan = executed(q)
      val spread = collect(plan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] ||
            // AQE may wrap/replace; accept any shuffle whose child is the
            // bare key scan (one narrow column), which is the repartition
            e.child.output.map(_.name) == Seq("c_custkey") ||
            e.child.output.map(_.name) == Seq("value") => e
      }
      assert(spread.nonEmpty,
        s"$q must repartition the key column before the generate map:\n$plan")
    }
  }

  test("q58/q69 domain cap + mixture draw: no per-group Window anywhere") {
    // the sqrt cap and mixture draw rank/sum via PrefixOps' range-
    // partitioned prefix pass — a Window.partitionBy(source) here would
    // reintroduce the dominant-source single-task serialization
    for (q <- Seq("q58_domain_rebalance", "q69_mixture_draw")) Caches.scoped {
      val plan = executed(q)
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"$q must not plan a per-group Window:\n$plan")
    }
  }

  test("q71 envelope: ranks via the prefix pass — no window at all in the plan") {
    Caches.scoped {
      val plan = executed("q71_json_envelope")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"q71 must not plan a window (global rank = one task):\n$plan")
    }
  }

  test("q63 interval join: pure equi-join — no nested loop, no cartesian") {
    Caches.scoped {
      val plan = executed("q63_interval_join")
      assert(collect(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"bucketized interval join must not plan a nested loop:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian product allowed:\n$plan")
    }
  }

  test("shingleRows: per-row codegen — no exchange, no window, in the whole-stage span") {
    Caches.scoped {
      val df = graft.ext.TextOps.shingleRows(
        Tables.documents(spark, dir), "doc_id", "text", 3)
      df.collect()
      val plan = df.queryExecution.executedPlan
      assert(collect(plan) {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e }.isEmpty,
        s"shingling is per-row; any exchange is a regression:\n$plan")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
        s"the window-lead formulation is the shuffle we removed:\n$plan")
      assert(collect(plan) {
        case c: org.apache.spark.sql.execution.WholeStageCodegenExec => c }.nonEmpty,
        s"expected the Generate pipeline inside a whole-stage span:\n$plan")
    }
  }

  test("q62 HLL: the only broadcast is the 64-bucket frame") {
    Caches.scoped {
      val plan = executed("q62_hll_distinct")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"register frame must broadcast, not cross-join:\n$plan")
    }
  }

  test("q75 span dedup: shingle equi-join, islands window keyed per-doc") {
    Caches.scoped {
      val plan = executed("q75_span_dedup")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian anywhere in span dedup:\n$plan")
      assert(collect(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"dup-shingle join must stay an equi-join on the hash:\n$plan")
      val wins = collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"islands window must partition by doc_id, never run global:\n$plan")
    }
  }

  test("q78 span removal: coverage leaves via an equi anti-join, never an NLJ") {
    Caches.scoped {
      val plan = executed("q78_span_removal")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian in span removal:\n$plan")
      assert(collect(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"the (doc_id, position) anti-join must stay equi-keyed:\n$plan")
    }
  }

  test("q76 outliers: the 1-row fence frame broadcasts back to the corpus") {
    Caches.scoped {
      val plan = executed("q76_embedding_outliers")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"fence join must be a broadcast, not a cartesian:\n$plan")
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"fence frame must broadcast:\n$plan")
    }
  }

  test("q79 cross-modal: verdicts meet in equi-joins; only the fence broadcasts NLJ-wise") {
    Caches.scoped {
      val plan = executed("q79_crossmodal_gate")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian in the cross-modal join:\n$plan")
      // the only nested loops are the two bounded broadcasts inside the
      // fence machinery (1-row fences; 2-row quantile targets against
      // banded counts) — the text×embedding verdict join itself must be
      // hash-equi on doc_id, never an NLJ
      val nljs = collect(plan) { case j: BroadcastNestedLoopJoinExec => j }
      assert(nljs.size <= 2, s"unexpected nested-loop join:\n$plan")
      val hashJoins = collect(plan) {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "doc_id")) => j
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "doc_id")) => j
      }
      assert(hashJoins.nonEmpty,
        s"text×embedding verdicts must meet in a doc_id equi-join:\n$plan")
    }
  }

  test("q80 corpus split: map-side assignment — one aggregate, no join, no window") {
    Caches.scoped {
      val plan = executed("q80_corpus_split")
      // split assignment is a pure per-row function; anything join- or
      // window-shaped means the corpus got shuffled to decide membership
      assert(collect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
        case c: CartesianProductExec => c
      }.isEmpty, s"q80 must not join:\n$plan")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"q80 must not window:\n$plan")
    }
  }

  test("q81 importance scoring: weights broadcast, selection is TakeOrdered, no global sort") {
    Caches.scoped {
      val plan = executed("q81_importance_resample")
      // the 1024-bucket weight table must reach the bigram stream as a
      // broadcast — a shuffled join here re-partitions the corpus by
      // bucket for a KB-sized build side
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"weight table must broadcast:\n$plan")
      assert(collect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.isEmpty, s"no shuffle join for the weight lookup:\n$plan")
      // top-K must be TakeOrderedAndProject (per-partition top-K + driver
      // merge), never a global SortExec under the limit
      assert(collect(plan) {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, s"selection must plan as TakeOrderedAndProject:\n$plan")
    }
  }

  test("q86 hard negatives: anchor side broadcasts, corpus never cartesians") {
    Caches.scoped {
      val plan = executed("q86_hard_negatives")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"anchor scoring must broadcast, never cartesian:\n$plan")
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"the bounded anchor side must broadcast:\n$plan")
    }
  }

  test("q88 transitions: the lag window is per-user, totals join broadcast") {
    Caches.scoped {
      val plan = executed("q88_event_transitions")
      val wins = collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"the lag window must partition by user_id, never run global:\n$plan")
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"the |types|-sized row-total frame must broadcast:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian in the transition matrix:\n$plan")
    }
  }

  test("q91 inverted index: pure term-keyed aggregation — no window anywhere") {
    Caches.scoped {
      val plan = executed("q91_inverted_index")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"the champion doc is a min-struct fold, never a window:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian in the index build:\n$plan")
    }
  }

  test("q92 decayed trend: the 1-row bounds frame broadcasts, no shuffle join") {
    Caches.scoped {
      val plan = executed("q92_decayed_trend")
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"the (max, horizon) frame must broadcast:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian in the decayed aggregate:\n$plan")
      assert(collect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.isEmpty, s"nothing in q92 may shuffle-join:\n$plan")
    }
  }

  test("q94 PQ: ADC tables meet the codes in broadcast equi-joins, never a cartesian") {
    Caches.scoped {
      val plan = executed("q94_pq_ann")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian anywhere in the PQ path:\n$plan")
      // the per-subspace distance tables are (#queries * ks) rows and
      // must reach the encoded corpus as broadcast HASH joins on the
      // code columns (an NLJ is only acceptable for the codebook argmin)
      val cellJoins = collect(plan) {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.leftKeys.exists(_.references.exists(_.name.startsWith("cell_"))) => j
      }
      assert(cellJoins.nonEmpty,
        s"ADC lookups must be broadcast hash joins on the codes:\n$plan")
    }
  }

  test("q82 semantic dedup: codebook broadcast-assigns, pair join is a cell equi-join") {
    Caches.scoped {
      val plan = executed("q82_semantic_dedup")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian anywhere in SemDeDup:\n$plan")
      // the only nested loop allowed is the broadcast codebook argmin
      // (k rows against the corpus); the candidate join itself must be
      // an equi-join on cell
      val nlj = collect(plan) { case j: BroadcastNestedLoopJoinExec => j }
      assert(nlj.forall(_.right.output.exists(_.name == "cvec")) ||
        nlj.forall(_.left.output.exists(_.name == "cvec")),
        s"the only NLJ may be the broadcast codebook:\n$plan")
      // the pair stage runs eagerly inside component propagation, so its
      // shape is pinned on the exposed sub-frame, not the final plan
      val pairsDf = graft.queries.VectorPack.semanticPairs(
        graft.queries.VectorPack.semanticAssigned(spark, dir))
      pairsDf.collect()
      val pairsPlan = pairsDf.queryExecution.executedPlan
      assert(collect(pairsPlan) { case c: CartesianProductExec => c }.isEmpty,
        s"candidate generation must never go quadratic across cells:\n$pairsPlan")
      val cellJoins = collect(pairsPlan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "cell")) => j
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "cell")) => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "cell")) => j
      }
      assert(cellJoins.nonEmpty,
        s"candidate pairs must come from a cell equi-join:\n$pairsPlan")
    }
  }

  test("q104 PCA: scatter is a narrow partition kernel (no corpus self-join), matvecs broadcast") {
    Caches.scoped {
      // the d^2 accumulation must come from the per-partition Gramian
      // kernel — never a self-join of the exploded corpus, and never an
      // explode materializing n·d² rows — pin it on the scatter
      // sub-frame (the full query truncates its lineage per power round,
      // so the final plan can't show it)
      val sc = graft.ext.VectorOps.scatterState(
        graft.Tables.embeddings(spark, dir)
          .select(org.apache.spark.sql.functions.col("vec_id"),
            graft.ext.VectorOps.quantize(
              org.apache.spark.sql.functions.col("embedding")).as("qvec")))
      sc.collect()
      val scPlan = sc.queryExecution.executedPlan
      assert(collect(scPlan) { case g: org.apache.spark.sql.execution.GenerateExec => g }.isEmpty,
        s"scatter must not explode n·d² rows (partition kernel instead):\n$scPlan")
      assert(collect(scPlan) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty, s"the scatter state is kernel+agg only — no joins at all:\n$scPlan")
      // and the full query never goes quadratic or shuffle-joins either
      val plan = executed("q104_pca_power")
      assert(collect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.isEmpty, s"q104 must not shuffle-join anywhere:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"no cartesian in q104:\n$plan")
    }
  }
  test("q110 zonemap: one agg pass, 1-row bounds broadcast, no window") {
    Caches.scoped {
      val plan = executed("q110_zonemap_stats")
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"global bound must broadcast into the flag projection:\n$plan")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"zonemap must not plan a Window:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    }
  }

  test("q112 fertility: text never shuffles — counters reduce before the exchange") {
    Caches.scoped {
      val plan = executed("q112_tokenizer_fertility")
      // every shuffle in the plan must carry only the group key + the
      // four int64 partials, never the text column
      val shuffles = collect(plan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
      assert(shuffles.nonEmpty)
      shuffles.foreach { e =>
        assert(!e.child.output.exists(_.name == "text"),
          s"text must be consumed map-side:\n$plan")
      }
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty)
    }
  }

  test("q111 PMI: count-table joins only — the corpus explode never joins") {
    Caches.scoped {
      val plan = executed("q111_pmi_collocations")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
      // the only nested-loop join allowed is the broadcast of the 1-row
      // global-N frame; the vocab-count joins themselves must be equi
      val bnlj = collect(plan) { case n: BroadcastNestedLoopJoinExec => n }
      assert(bnlj.size <= 1 &&
        bnlj.forall(_.right.output.map(_.name) == Seq("n_uni")),
        s"only the 1-row n_uni frame may nested-loop:\n$plan")
      // top-50 must be a TakeOrdered, not a global sort
      assert(collect(plan) {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, s"top-k must plan as TakeOrderedAndProject:\n$plan")
    }
  }
  test("q114/q121 MAD: windows rank only collapsed count frames, census joins broadcast") {
    for (q <- Seq("q114_mad_outliers", "q121_stream_mad")) Caches.scoped {
      val plan = executed(q)
      // the rank-selection windows must consume the (type, v/d, c)
      // count frames — their child carries the count column, never the
      // raw event columns (value/event_id)
      val wins = collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.nonEmpty)
      wins.foreach { w =>
        val names = w.child.output.map(_.name)
        assert(names.contains("c") && !names.contains("value") &&
          !names.contains("event_id"),
          s"$q window must rank the collapsed count frame, got $names:\n$plan")
      }
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"$q median/MAD tables must broadcast:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    }
  }

  test("q115 systematic sample: no window, no cartesian — prefix pass + 1-row broadcast") {
    Caches.scoped {
      val plan = executed("q115_systematic_sample")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"q115 must use the prefix pass, not a global window:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"total weight must broadcast:\n$plan")
    }
  }

  test("q120 rolling active: no window over raw events, no cartesian") {
    Caches.scoped {
      val plan = executed("q120_rolling_active")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"q120 must not plan a window:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
      assert(collect(plan) { case n: BroadcastNestedLoopJoinExec => n }.isEmpty)
    }
  }
  test("q116/q118/q121 incremental merges: no cartesian, merge frames equi-keyed") {
    for (q <- Seq("q116_stream_quantiles", "q118_stream_zonemap",
        "q121_stream_mad")) Caches.scoped {
      val plan = executed(q)
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"$q must not cartesian:\n$plan")
    }
  }

  test("q122 grouped quantiles: window ranks the collapsed count frame only") {
    Caches.scoped {
      val plan = executed("q122_grouped_quantiles")
      val wins = collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.nonEmpty)
      wins.foreach { w =>
        val names = w.child.output.map(_.name)
        assert(names.contains("c") && !names.contains("value"),
          s"window must consume the (type, v, c) frame, got $names:\n$plan")
      }
    }
  }

  test("q123 skew census: top-20 is TakeOrdered, totals broadcast") {
    Caches.scoped {
      val plan = executed("q123_key_skew_census")
      assert(collect(plan) {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, s"hot-key top-k must plan as TakeOrderedAndProject:\n$plan")
      assert(collect(plan) { case b: BroadcastExchangeLike => b }.nonEmpty)
    }
  }

  test("q124/q126: day/bucket-grain panels — no window, no cartesian") {
    for (q <- Seq("q124_volume_anomaly", "q126_length_histogram")) Caches.scoped {
      val plan = executed(q)
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"$q must not plan a window:\n$plan")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    }
  }

  test("q149 containment: both candidate generators are equi-joins — no NLJ, no cartesian, no window") {
    Caches.scoped {
      val plan = executed("q149_containment_verify")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"candidates must never go all-pairs:\n$plan")
      assert(collect(plan) { case n: BroadcastNestedLoopJoinExec => n }.isEmpty,
        s"band and rare-shingle joins must stay equi-joins:\n$plan")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"q149 must not plan a window:\n$plan")
    }
  }

  test("q150 TV distance: the only NLJ is the |sources|² pair cross — counts join equi, no window") {
    Caches.scoped {
      val plan = executed("q150_source_tv_distance")
      // the deliberate tiny cross over per-source totals plans as a
      // broadcast NLJ; the vocab-sized count join must NOT
      val nljs = collect(plan) { case n: BroadcastNestedLoopJoinExec => n }
      assert(nljs.nonEmpty, s"pair universe should broadcast-cross:\n$plan")
      nljs.foreach { n =>
        assert(!n.output.exists(_.name == "tok"),
          s"the token-keyed count join must stay an equi-join:\n$plan")
      }
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"q150 must not plan a window:\n$plan")
    }
  }

  test("q151 novelty: hash-keyed equi-join + aggregates — no NLJ, no cartesian, no window") {
    Caches.scoped {
      val plan = executed("q151_shingle_novelty")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
      assert(collect(plan) { case n: BroadcastNestedLoopJoinExec => n }.isEmpty,
        s"first-occurrence join must stay an equi-join:\n$plan")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"q151 must not plan a window:\n$plan")
    }
  }
}
