package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Relational query inventory (SURVEY.md §2.2): scans, filters, joins of
  * every flavor, aggregations (incl. cube/rollup/grouping sets), window
  * functions, top-k, set ops, and scalar-function coverage (JSON, dates,
  * strings, CASE).
  *
  * Conventions shared with the DuckDB oracle (see [[graft.SparkEntry.oracleSql]]):
  *   - every computed column is aliased identically on both sides (the
  *     driver's compare sorts columns BY NAME before hashing);
  *   - double-typed aggregates are rounded to 2 decimals on both sides so
  *     summation-order differences between engines can't flip the hash;
  *   - every query ends in a deterministic ORDER BY on its key columns.
  *
  * Scale notes (100 TB design bar) are given per query; the general rules:
  * filters/projections stay declarative so Catalyst pushes them into the
  * parquet scan, dimension tables are explicitly `broadcast()`, and no
  * query collects to the driver.
  */
object Relational {

  /** Round a double aggregate for engine-stable comparison. */
  private def r2(c: org.apache.spark.sql.Column) = round(c, 2)

  /** q1_agg — TPC-H Q1 shape: scan-filter-aggregate over lineitem.
    * At scale: single shuffle on the (tiny-cardinality) group keys with
    * map-side partial aggregation; the shipdate filter is pushed to parquet
    * (row-group stats skip). */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        r2(avg(col("l_quantity"))).as("avg_qty"),
        r2(avg(col("l_extendedprice"))).as("avg_price"),
        r2(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
         round(avg(l_quantity), 2) AS avg_qty,
         round(avg(l_extendedprice), 2) AS avg_price,
         round(avg(l_discount), 2) AS avg_disc,
         count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1997-09-01'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
  )
}
