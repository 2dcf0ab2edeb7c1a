package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: run the heavy LLM-pipeline operators at ~20× the
  * largest fixture (100k documents, 40k embeddings) to show the plans
  * survive a scale-up the per-round bench never exercises — bounded
  * candidate fan-out (df cutoff, bucket caps, adaptive LSH tiers),
  * convergent clustering, no driver materialization. Replicas perturb
  * the text (replica-suffix token) so near-dup structure is realistic
  * 20-cliques, not pure exact duplicates.
  *
  * Usage: runMain graft.ScaleSmoke [sfDir] [replicas]
  * Prints one timing line per operator; exits nonzero on any failure.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // one source of session truth: same AQE/UTC/extensions/legacy-ts
    // config as the engine proper (hand-rolled conf here diverged)
    val spark = graft.core.GraftSession
      .builder("scale-smoke", s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val r = explode(sequence(lit(0), lit(replicas - 1)))
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .withColumn("r", r)
      .select((col("doc_id") * replicas + col("r")).as("doc_id"),
        concat(col("text"), lit(" replicatoken"), col("r")).as("text"))
      .persist()
    val embs = graft.tables.Tables.embeddings(spark, sfDir)
      .withColumn("r", r)
      .select((col("vec_id") * replicas + col("r")).as("vec_id"), col("embedding"))
      .persist()
    val nDocs = docs.count()
    val nVecs = embs.count()
    println(s"scale-smoke: $nDocs docs, $nVecs vectors (x$replicas)")

    var failed = false
    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      try {
        val rows = body
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  $rows%10d rows")
      } catch {
        case e: Throwable =>
          failed = true
          println(s"$name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }

    timed("dd2_hash (exact)") {
      graft.operators.Dedup.dd2From(docs).count()
    }
    timed("dd4_ngram_jaccard (exact)") {
      graft.operators.Dedup.dd4From(docs).count()
    }
    timed("dd3_minhash_lsh") {
      graft.operators.Dedup.dd3From(docs).count()
    }
    timed("dd6_cluster (CC over dd4)") {
      graft.operators.Dedup.dd6ClusterFrom(
        docs.select(col("doc_id")),
        graft.operators.Dedup.dd4From(docs).select(col("doc_a"), col("doc_b"))).count()
    }
    timed("ss5_knn_join (adaptive LSH)") {
      graft.operators.Similarity.knnJoin(embs).count()
    }
    timed("dd5_simhash (capped bands)") {
      graft.operators.Dedup.dd5From(docs).count()
    }
    timed("ss2/lshNeardupPairs (tiered)") {
      graft.operators.Similarity.lshNeardupPairs(embs, 0.4).count()
    }
    timed("ss4_ann_ivf (tiered cells)") {
      graft.operators.Similarity.ss4From(embs).count()
    }
    timed("dd8_decontaminate (bcast bench)") {
      graft.operators.Dedup.decontaminateFrom(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0)).count()
    }
    timed("dd7_cluster (CC over LSH edges)") {
      // the forced-LSH edge source semanticEdges picks above the exact-
      // scan byte cap — exercised explicitly so the smoke demonstrates
      // the large-corpus dd7 path regardless of in-memory stats
      graft.operators.Dedup.dd6ClusterFrom(
        embs.select(col("vec_id").as("doc_id")),
        graft.operators.Similarity.lshNeardupPairs(embs, 0.45)
          .select(col("vec_a"), col("vec_b"))).count()
    }

    spark.stop()
    if (failed) sys.exit(1)
  }
}
