package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor directory. Schemas are
  * documented in FIXTURES.md; we read them schema-on-read (parquet footers)
  * rather than pinning StructTypes, so the same code runs at any SF and, at
  * production scale, over partitioned multi-file datasets on
  * `abfss://` — the path string is the only thing that changes
  * (cf. reference `client.py:528-546` ranged reads: Spark's vectorized
  * parquet reader issues the same ranged GETs per column chunk).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-normalizing accessor — routes through the SAME per-table
    * treatment as the typed accessors (events' ns→µs ts fix; documents/
    * embeddings' [[balanced]] rebalance), so the SQL temp-view catalog
    * path (GraftSession.registerTables) and the typed path see identical
    * frames. Dispatching to raw load here previously gave SQL queries
    * over documents/embeddings the 1-split scan balanced() exists to
    * fix — two access paths, silently different parallelism. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events"     => events(spark, dir)
      case "documents"  => documents(spark, dir)
      case "embeddings" => embeddings(spark, dir)
      case _            => load(spark, dir, name)
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet (TESTDATA/FIXTURES.md),
    * which Spark 4's TimestampType (µs) rejects outright. Read nanos as
    * long via the legacy conf, then truncate to µs — the same truncation
    * DuckDB's TIMESTAMP cast applies, so comparisons agree.
    *
    * The ns annotation is `isAdjustedToUTC=false`, i.e. NTZ semantics: the
    * stored long IS the wall-clock micros×1000, so normalize to
    * TimestampNTZType — the type the regenerated µs fixtures read natively —
    * by adding the micros to the NTZ epoch with exact decimal interval
    * arithmetic. A `timestamp_micros`/TimestampType intermediate would
    * reinterpret the wall-clock value as an instant and shift it by the
    * session timezone. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_ntz'1970-01-01 00:00:00' + " +
          "make_dt_interval(0, 0, 0, cast(ts div 1000 as decimal(26,0)) / 1000000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = balanced(load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = balanced(load(s, d, "embeddings"))

  /** Rebalance a scan that yields fewer splits than the cluster has slots.
    *
    * The LLM-ops tables (documents, embeddings) feed CPU-heavy per-row
    * pipelines — shingling, MinHash/LSH signatures, pair enumeration —
    * that run BEFORE the first shuffle, i.e. at the scan's parallelism. A
    * tiny corpus in one parquet file is one split, so without this the
    * whole kernel runs in a single task (measured: ss5's candidate stage
    * was 1 task / 5.7 s of a 7.8 s query on a 32-core box). A production
    * corpus arrives in thousands of splits, `parts >= slots` holds, and
    * this is a no-op — no shuffle is ever added at scale. Partition count
    * comes from the planned scan (file index), not a data job. */
  private def balanced(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }
}
