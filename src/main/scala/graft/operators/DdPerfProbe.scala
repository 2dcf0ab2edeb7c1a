package graft.operators

import org.apache.spark.sql.functions._

/** Perf probe (round-11): phase-resolved dd4/dd3 wall time on the scale
  * smoke's replica corpus, isolating where the dd3 stage's 100×-smoke
  * minutes actually go (the thread dumps implicated the object-hash
  * aggregates — TopKByScore / collect_list, which fall back to sort-based
  * aggregation after `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` distinct keys, default 128 — and Round's per-row
  * BigDecimal in the candidate filter).
  *
  * Usage: runMain graft.operators.DdPerfProbe [sfDir] [replicas] [fallbackThreshold]
  *
  * Phases share no state (each count plans from the persisted corpus),
  * so phase times overlap dd3's internal reuse — the per-phase lines
  * bound each subtree's cost; the dd3 total line is the real number.
  */
object DdPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val fallback = args.lift(2).map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession
      .builder("dd-perf-probe", s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    fallback.foreach(t => spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t.toString))

    val r = explode(sequence(lit(0), lit(replicas - 1)))
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .withColumn("r", r)
      .select((col("doc_id") * replicas + col("r")).as("doc_id"),
        concat(col("text"), lit(" replicatoken"), col("r")).as("text"))
      .persist()
    val nDocs = docs.count()
    println(s"dd-perf-probe: $nDocs docs (x$replicas), " +
      s"objectAgg fallbackThreshold=${fallback.getOrElse(128)}")

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $rows%10d rows")
    }

    val dfCap = Dedup.shingleDfCap(nDocs)
    val shingled = Dedup.withShingles(docs).select(col("doc_id"), col("shingles"))
    timed("phase: kept (topk objectAgg)") {
      Dedup.keptShingles(shingled, dfCap).count()
    }
    timed("phase: keptSets (collect_list)") {
      Dedup.keptShingles(shingled, dfCap)
        .groupBy(col("doc_id")).agg(collect_list(col("sh")).as("shingles"))
        .count()
    }
    timed("phase: minhash sigs") {
      Dedup.minhashSigs(shingled).count()
    }
    timed("dd4 total") {
      Dedup.dd4From(docs, nDocs).count()
    }
    timed("dd3 total") {
      Dedup.dd3From(docs, nDocs).count()
    }
    spark.stop()
  }
}
