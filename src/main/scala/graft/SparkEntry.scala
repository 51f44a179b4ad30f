package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's query pack; each key
  * with an entry in `oracleSql` is hash-checked against DuckDB by the
  * driver at sf0.01; keys without an oracle get a rows-only check.
  */
object SparkEntry {

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (_root_.graft.queries.Relational.queries, _root_.graft.queries.Relational.oracles),
      (_root_.graft.queries.DecodePack.queries, _root_.graft.queries.DecodePack.oracles),
      (_root_.graft.queries.TextPack.queries, _root_.graft.queries.TextPack.oracles),
      (_root_.graft.queries.VectorPack.queries, _root_.graft.queries.VectorPack.oracles),
      (_root_.graft.queries.MediaPack.queries, _root_.graft.queries.MediaPack.oracles),
      (_root_.graft.queries.SinkPack.queries, _root_.graft.queries.SinkPack.oracles),
      (_root_.graft.queries.CurationPack.queries, _root_.graft.queries.CurationPack.oracles),
      (_root_.graft.queries.SourcePack.queries, _root_.graft.queries.SourcePack.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _)
}
