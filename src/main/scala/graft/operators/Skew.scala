package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping/join keys (AQE's skew-join split
  * handles sort-merge joins at runtime; these are the declarative tools
  * for the cases AQE doesn't cover — hash aggregations over hot keys and
  * broadcast-averse skewed equi-joins).
  *
  * Both transformations are result-identical to their naive forms (the
  * spec proves equivalence); they only change the shuffle layout:
  * a hot key's rows spread over `salts` partitions instead of one.
  */
object Skew {

  /** Two-phase salted aggregation: partially aggregate on
    * (key, salt(hash(row) % salts)), then merge partials per key. For
    * algebraic aggregates (sum/count/min/max) the result is exactly the
    * direct aggregate; the first shuffle's hottest partition shrinks by
    * ~`salts`×.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int,
      aggs: (String, String)*): DataFrame = {
    require(aggs.nonEmpty && aggs.forall { case (_, f) =>
      Seq("sum", "count", "min", "max").contains(f) }, "algebraic aggregates only")
    val salt = pmod(hash(df.columns.map(col): _*), lit(salts)).as("_salt")
    val partials = aggs.zipWithIndex.map { case ((c, f), i) =>
      expr(s"$f($c)").as(s"_p$i")
    }
    val merges = aggs.zipWithIndex.map { case ((c, f), i) =>
      val merge = if (f == "count") "sum" else f
      expr(s"$merge(_p$i)").as(s"${f}_$c")
    }
    df.withColumn("_salt", salt)
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join for a skewed probe side against a non-broadcastable
    * build side: the probe gets a deterministic per-row salt, the build
    * side is replicated `salts`× (one copy per salt value), and the join
    * keys gain the salt column — a hot key's probe rows now hash to
    * `salts` different reducers. Build-side cost: `salts`× replication,
    * so size the salt count to the observed skew ratio, not higher.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    val saltedProbe = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(salts)))
    val replicatedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(replicatedBuild, keys :+ "_salt").drop("_salt")
  }

  /** Deterministic salt column for custom pipelines. */
  def saltOf(cols: Seq[Column], salts: Int): Column = pmod(hash(cols: _*), lit(salts))

  /** Derive the salt factor from the DATA instead of guessing: one
    * cheap count aggregation finds the hottest key's multiplicity m,
    * and the self-join fan-in on that key is m rows through one
    * reducer — salt it down to ~`targetPerKey` rows per reducer,
    * capped at `maxSalts` (build-side replication is `salts`×, so an
    * adversarial key must not explode the build side). Returns 1 when
    * nothing is hot — the adaptive path then IS the plain join. The
    * extra pass reads only the key column (column-pruned scan /
    * map-side-combined count), which is what makes "measure, then
    * plan" affordable at 100 TB; SkewSpec proves the adaptive join
    * result-identical on hot and uniform fixtures.
    */
  def autoSalts(df: DataFrame, keys: Seq[String],
      targetPerKey: Long = 100000L, maxSalts: Int = 32): Int = {
    require(targetPerKey > 0 && maxSalts >= 1)
    val top = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(max(col("_n")).as("_m"))
      .head
    val hottest = if (top.isNullAt(0)) 0L else top.getLong(0) // empty input
    val salts = ((hottest + targetPerKey - 1) / targetPerKey).toInt
    math.min(math.max(salts, 1), maxSalts)
  }
}
