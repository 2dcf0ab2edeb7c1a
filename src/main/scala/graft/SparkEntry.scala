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

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Merged with a DUPLICATE-KEY check, not bare `++`: a name collision
    * across modules would silently shadow one implementation — and
    * because queries and oracleSql merge independently, it could pair
    * module A's DataFrame with module B's SQL, failing (or worse,
    * coincidentally passing) the correctness gate for code that was
    * never wrong. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergedUnique("queries", Seq(
      Relational.queries, TextAnalysis.queries, Dedup.queries,
      Similarity.queries, EventStreams.queries, Multimodal.queries,
      CorpusPipeline.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. Every
    * oracle key must name a query (checked): an orphan oracle is a
    * misspelled entry the driver would silently never run. */
  def oracleSql: Map[String, String] = {
    val o = mergedUnique("oracleSql", Seq(
      Relational.oracle, TextAnalysis.oracle, Dedup.oracle,
      Similarity.oracle, EventStreams.oracle, Multimodal.oracle,
      CorpusPipeline.oracle))
    val orphans = o.keySet -- queries.keySet
    require(orphans.isEmpty,
      s"oracleSql keys without a matching query: ${orphans.toSeq.sorted.mkString(", ")}")
    o
  }

  private def mergedUnique[V](what: String, maps: Seq[Map[String, V]]): Map[String, V] = {
    val merged = maps.reduce(_ ++ _)
    if (merged.size != maps.map(_.size).sum) {
      val dups = maps.flatMap(_.keys).groupBy(identity).collect {
        case (k, ks) if ks.size > 1 => k
      }
      throw new IllegalStateException(
        s"$what: operator name(s) registered by more than one module: " +
          s"${dups.toSeq.sorted.mkString(", ")}")
    }
    merged
  }
}
