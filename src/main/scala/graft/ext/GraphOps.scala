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

  /** @param edges two integral columns `srcCol`/`dstCol`, undirected
    *              (one direction suffices; the symmetric closure is
    *              built internally), self-loops and duplicates fine
    * @return (node, component) — component = min node id reachable;
    *         every node that appears in any edge gets a row
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // Symmetric closure once, distinct to kill duplicate pairs from
    // multi-band candidates; persisted — every round re-reads it.
    val sym = graft.Caches.persisted(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct())

    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint(eager = true)
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // neighbor labels: edge (src,dst) contributes label(src) to dst
      val nbr = sym.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("comp"))
      val next = nbr.union(labels)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(eager = true)
      val changed = next.join(labels.withColumnRenamed("comp", "prev"), "node")
        .filter(col("comp") =!= col("prev")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds " +
      "(graph diameter exceeds the bound — raise maxIters or switch to " +
      "the large-star/small-star contraction)")
    labels
  }
}
