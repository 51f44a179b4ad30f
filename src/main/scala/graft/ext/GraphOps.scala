package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * missing last stage of every near-dup pipeline: LSH/banded joins emit
  * PAIRS (q18/q32/q37/q39), but a training-data dedup has to collapse
  * pairs into GROUPS (a 500-way duplicate cluster is 124 750 pairs but
  * one component) and elect one canonical representative per group.
  * Reference analog: dexscraper dedups per-frame by position overlap
  * only (`/root/reference/dexscraper/protocol.py` cluster overlap
  * checks); corpus-level grouping has no analog there — this is the
  * 100 TB generalization.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node takes the min label over
  * itself and its neighbors; converged when no label changes. Each
  * round is ONE shuffle join (edges ⋈ labels on src) plus ONE groupBy
  * min — both partition by node id, so AQE coalesces and the join keys
  * stay stable across rounds. Rounds needed = graph diameter. Near-dup
  * components are band-join cliques (diameter 1–2) or short link
  * chains, so the loop exits after 2–4 rounds in practice; `maxIters`
  * bounds adversarial chains. For graphs whose diameter genuinely
  * scales (social graphs, not dedup graphs) swap in the
  * large-star/small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") — same per-round shuffle shape,
  * O(log² n) rounds; dedup workloads never need it and the simple loop
  * has no per-round re-bucketing cost.
  *
  * Scale notes: `labels` is localCheckpoint()ed every round — the loop
  * is driver-paced like [[VectorOps.kmeansCodebook]]'s Lloyd rounds, and
  * without truncation each round's plan would nest the previous one.
  * The convergence probe (`changed == 0`) is a count() on the round's
  * checkpointed result, not an extra recompute. Edge storage is the
  * symmetric closure (2·|E| rows) partitioned by src.
  */
object GraphOps {

  /** Release a prior round's localCheckpoint blocks: the checkpoint
    * lives as a persisted internal RDD behind a `LogicalRDD` leaf, and
    * `Dataset.unpersist` does not reach it — without this, block-manager
    * storage grows linearly with rounds (harmless at dedup diameters,
    * wasteful on the deep graphs starComponents is advertised for).
    */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** @param edges two integral columns `srcCol`/`dstCol`, undirected
    *              (one direction suffices; the symmetric closure is
    *              built internally), self-loops and duplicates fine
    * @return (node, component) — component = min node id reachable;
    *         every node that appears in any edge gets a row
    *
    * Round structure: propagate (min over self + neighbor labels) THEN
    * shortcut (relabel to the label's own label — path halving, as in
    * HashToMin/pointer-jumping CC). Propagation alone needs
    * diameter-many rounds; with the shortcut the distance-to-minimum
    * better-than-doubles per round, so a depth-d chain closes in
    * O(log d) rounds — and at 100 TB every round is a full-data
    * shuffle, so round count IS the cost. The shortcut join keys on
    * `comp`, which concentrates as components converge (every member of
    * a cluster carries the same comp); the build side is key-UNIQUE
    * (one row per node), so AQE's skew-join split of the probe side
    * applies when a 10⁸-member component makes the key hot.
    *
    * Convergence probe: labels are monotonically non-increasing (every
    * round takes a min that includes the current label), so the label
    * SUM is strictly decreasing until the fixpoint and equal exactly at
    * it — one tiny aggregate per round instead of a node-keyed
    * prev/next join. Summed as decimal(38,0): exact for any node-id
    * range (an int64 sum could wrap at 10¹² 2⁶³-scale ids and alias a
    * non-converged round onto a converged-looking sum).
    */
  /** @param fallbackToStar when the round budget runs out (graph
    *        diameter too deep for label propagation even with the
    *        shortcut), hand the ORIGINAL edges to [[starComponents]] —
    *        the O(log² n)-round contraction — instead of failing. The
    *        converged fast path is untouched; only the would-have-failed
    *        path pays the restart. `false` restores the loud failure for
    *        callers that budget rounds deliberately.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20, fallbackToStar: Boolean = true): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // Symmetric closure once, distinct to kill duplicate pairs from
    // multi-band candidates; persisted — every round re-reads it.
    val sym = graft.Caches.persisted(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct())

    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint(eager = true)
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var converged = false
    // per-round label-mass deltas: convergence observability for a
    // 100 TB run (and the evidence in the failure message below)
    val deltaPerRound = scala.collection.mutable.ArrayBuffer.empty[java.math.BigDecimal]
    while (iter < maxIters && !converged) {
      // propagate: edge (src,dst) contributes label(src) to dst
      val nbr = sym.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("comp"))
      val prop = nbr.union(labels)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
      // shortcut: comp := labels(comp), read from the PREVIOUS round's
      // checkpoint — not from `prop` itself, which would plan the whole
      // propagate subtree twice (one per join input; the two exchanges
      // key on different columns, so ReuseExchange cannot merge them).
      // labels(comp) <= comp always (comp is a node id and every label
      // is <= its node id), so the relabel IS the min and the
      // monotone-sum invariant below is preserved; the one-round-stale
      // lookup still composes to distance-doubling per round.
      // (Round 19 tried applying the lookup TWICE per round to jump two
      // pointer hops — label-identical on CurationSpec's property
      // graphs, but per-round wall EXPLODED ~3x per round on the q82
      // chain graph (1s -> 47s by round 5): the second self-join of the
      // checkpointed labels forces a plan-clone + re-shuffle cascade
      // that AQE re-plans from scratch each round. Reverted; round
      // count is not the local bottleneck, and at scale the extra
      // full-data join per round costs exactly what it saves.)
      val next = prop.join(
          labels.select(col("node").as("comp"), col("comp").as("comp2")), "comp")
        .select(col("node"), col("comp2").as("comp"))
        .localCheckpoint(eager = false)
      // the round's ONE action: materializes the lazy checkpoint AND
      // computes the convergence sum in the same job
      val sumRaw = next.agg(org.apache.spark.sql.functions.sum(
          col("comp").cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)
      val sum = if (sumRaw == null) java.math.BigDecimal.ZERO else sumRaw // empty graph
      deltaPerRound += (if (prevSum == null) sum else prevSum.subtract(sum))
      converged = prevSum != null && prevSum.compareTo(sum) == 0
      prevSum = sum
      unpersistCheckpoint(labels) // next is materialized; free the old round
      labels = next
      iter += 1
    }
    if (!converged && fallbackToStar) {
      // the labels computed so far are NOT reusable as a contraction
      // seed (starComponents starts from edges), so free them and rerun
      // on the original edge set; the convergence trace still surfaces
      // so a 100 TB operator sees why the restart happened
      System.err.println(s"[graft] connectedComponents hit the $maxIters-round " +
        s"budget (label-mass delta per round: ${deltaPerRound.mkString(", ")}) — " +
        "falling back to starComponents, the large-star/small-star contraction")
      unpersistCheckpoint(labels)
      return starComponents(edges, srcCol, dstCol)
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds " +
      s"(label-mass delta per round: ${deltaPerRound.mkString(", ")} — " +
      "graph diameter exceeds the bound; raise maxIters or switch to " +
      "starComponents, the large-star/small-star contraction)")
    labels
  }

  /** The deep-diameter scale path: alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", 2014). Where [[connectedComponents]] needs
    * diameter-many rounds (a 10⁶-node path = 10⁶ rounds), this
    * converges in O(log² n) rounds on ANY graph, because each round
    * rewires whole neighborhoods at their minimum instead of moving
    * labels one hop:
    *
    *   - large-star(u): every neighbor v > u re-attaches to
    *     m = min(Γ(u) ∪ {u});
    *   - small-star(u): every neighbor v ≤ u (they're all smaller once
    *     edges are oriented big→small) re-attaches to the minimum
    *     smaller neighbor, and u attaches there too.
    *
    * Each half-round is one groupBy-min plus one equi-join on node id —
    * the same shuffle shape as a label-propagation round, so the win is
    * purely in ROUND COUNT. At fixpoint the edge set is a star forest:
    * every edge points (node → component minimum) directly.
    *
    * Both phases and the fixpoint test are driver-paced with
    * localCheckpoint truncation like the Lloyd loop in
    * [[VectorOps.kmeansCodebook]]; the fixpoint test compares the
    * canonical (big, small) edge set across rounds with two anti-joins
    * (empty ⇒ stable), which costs another pair of node-id shuffles —
    * worth it only when diameter is genuinely unknown; dedup-shaped
    * graphs should stay on [[connectedComponents]].
    * CurationSpec proves the two algorithms label-identical on cliques,
    * deep paths, stars, forests and pseudo-random graphs.
    */
  /** @param trace per-round observability hook `(round, edgesChanged,
    *               seconds)` — a 100 TB run wires this to its metrics
    *               sink; defaults to no-op
    */
  def starComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50,
      trace: (Int, Long, Double) => Unit = (_, _, _) => ()): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    // isolated self-loop nodes drop out of the contraction (no real
    // edge); remember every node so the final labeling covers them
    val nodes = graft.Caches.persisted(
      e0.select(col("u").as("node"))
        .union(e0.select(col("v").as("node"))).distinct())

    def canonical(e: DataFrame): DataFrame =
      e.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()

    def largeStar(e: DataFrame): DataFrame = {
      // `e` is always canonical here (distinct, v < u, no self-loops) —
      // the forward and reversed halves are disjoint and individually
      // distinct, so the symmetric closure needs NO dedup shuffle
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val o = canonical(e) // (u, v) with v < u: v is a smaller neighbor
      val mins = o.groupBy(col("u")).agg(min(col("v")).as("m"))
      o.join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
    }

    var cur = canonical(e0).localCheckpoint(eager = true)
    // edge COUNT per round: |next| != |cur| PROVES the round changed the
    // edge set (both are canonical/distinct), so the exact symmetric-
    // difference join only runs on the equal-count rounds — typically
    // just the final one. One cheap count on the already-materialized
    // checkpoint replaces a (u,v)-keyed full-outer join on every
    // shrinking round (round 19; the join is 3 exchanges + 2 sorts over
    // both full edge sets, pure overhead while the contraction is still
    // visibly making progress).
    var curCount = cur.count()
    var iter = 0
    var stable = false
    while (iter < maxIters && !stable) {
      val t0 = System.nanoTime
      // lazy checkpoint: the count probe below is the round's ONE
      // action — it materializes the checkpoint and counts it in the
      // same job (an eager checkpoint would pay a second full pass)
      val next = canonical(smallStar(largeStar(cur))).localCheckpoint(eager = false)
      val nextCount = next.count()
      // equal counts are necessary but not sufficient — confirm with the
      // exact symmetric difference (empty ⇒ stable), one full-outer join
      val diff =
        if (nextCount != curCount) math.abs(nextCount - curCount)
        else next.select(col("u"), col("v"), lit(1).as("_n"))
          .join(cur.select(col("u"), col("v"), lit(1).as("_c")),
            Seq("u", "v"), "full_outer")
          .filter(col("_n").isNull || col("_c").isNull)
          .count()
      stable = diff == 0
      unpersistCheckpoint(cur) // fixpoint test done; free the old round
      cur = next
      curCount = nextCount
      iter += 1
      // edgesChanged: exact symmetric-difference size on probed rounds,
      // the |count delta| lower bound on count-gated rounds
      trace(iter, diff, (System.nanoTime - t0) / 1e9)
    }
    require(stable, s"starComponents did not converge in $maxIters rounds")
    // star forest: (u, v) = (node, component min); minima + isolated
    // nodes label themselves. The groupBy-min is defensive: at a true
    // fixpoint each leaf has exactly one parent, and collapsing keeps
    // the left join from ever fanning out a row if that invariant is
    // violated by a future edit.
    val parents = cur.groupBy(col("u").as("node")).agg(min(col("v")).as("c"))
    nodes.join(parents, Seq("node"), "left")
      .select(col("node"), coalesce(col("c"), col("node")).as("comp"))
  }

  /** Weighted PageRank (Brin & Page 1998; damped power iteration) in
    * EXACT integer fixed point, so any SQL engine reproduces every
    * iterate bit-for-bit: ranks live at `scale` (default 10¹²), the
    * per-edge contribution is `(rank · w) div w_out` (truncating), and
    * the damped update is `(base·(100−d) + d·Σcontrib) div 100` with
    * integer damping percent d — no floating point anywhere. Truncation
    * loses ≤1 ulp of mass per edge per round: deterministic, identical
    * in both engines, and irrelevant at rank scale 10¹².
    *
    * @param edges (srcCol, dstCol, wCol) — DIRECTED weighted edges; for
    *              an undirected graph (TextRank) pass the symmetric
    *              closure. Nodes are whatever appears in src/dst (any
    *              type); every such node must have out-edges when it
    *              should emit rank (isolated-dst nodes just receive).
    * @param iters full power-iteration rounds, unrolled; each round's
    *              rank frame is node-sized and localCheckpoint'ed so
    *              plan depth stays constant and prior rounds' blocks
    *              are released ([[unpersistCheckpoint]]).
    *
    * Scale shape: one groupBy for out-weights, then per round ONE
    * equi-join of the node-sized rank frame against the edge list and
    * ONE groupBy-sum on dst — the Pregel message-passing shape; edges
    * never replicate and the only per-round driver traffic is the
    * checkpoint bookkeeping. The single up-front `count()` (node total,
    * needed for the teleport term) is one metadata-light job.
    */
  def weightedPageRank(edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst", wCol: String = "w",
      scale: Long = 1000000000000L, dampingPct: Int = 85): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100,
      "iters must be >= 0 and dampingPct in [0, 100]")
    val e = graft.Caches.persisted(edges.select(
      col(srcCol).as("src"), col(dstCol).as("dst"), col(wCol).as("w")))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    require(n > 0, "weightedPageRank needs a non-empty edge list")
    val base = scale / n // truncating — matches the oracle's integer //
    val wout = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val ew = e.join(wout, "src")
    var ranks = nodes.withColumn("rank", lit(base))
    (0 until iters).foreach { _ =>
      val contribs = ew.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("(rank * w) div wout").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("sumc"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr(s"(${base}L * ${100 - dampingPct} + $dampingPct * coalesce(sumc, 0L)) div 100")
            .as("rank"))
        .localCheckpoint(true)
      unpersistCheckpoint(ranks)
      ranks = next
    }
    ranks
  }
}
