package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational
import graft.operators.{CorpusPipeline, Dedup, Similarity, TextAnalysis}
import graft.streaming.EventStreams
import graft.multimodal.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2.2 inventory) to functions of
  * (session, scale-factor dir) → DataFrame; `oracleSql` carries the DuckDB
  * equivalent for the driver's hash compare. Implementations live under
  * [[graft.queries]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ EventStreams.queries ++ Multimodal.queries ++
      CorpusPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextAnalysis.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ EventStreams.oracle ++ Multimodal.oracle ++
      CorpusPipeline.oracle
}
