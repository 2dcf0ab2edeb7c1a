package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic main (round-11): sweep the [[graft.operators.Similarity]]
  * kNN route boundary. ss5/knnJoin route by estimated corpus rows —
  * below the home tier (16k) the 16×4 hyperplane-LSH join, above it the
  * IVF route — and the 16k boundary was set from two data points (the
  * fixture's .896 LSH recall and the 8×8/4×16 rank-recall collapse).
  * This sweep measures BOTH routes' wall time and rank-recall@5 across
  * the boundary region (8k..48k vectors, replica-perturbed from the
  * fixture embeddings) so the crossover is pinned by numbers: LSH cost
  * grows ~n² (16 fixed 4-bit buckets per table ⇒ bucket population ∝ n),
  * IVF cost grows ~n·nProbe/cells. Ground truth = exact top-5 for a
  * 1/37 query sample (same 3-decimal rounding + lower-id ties as the
  * kernels).
  *
  * Usage: runMain graft.KnnTierSweep [sfDir]
  * One line per (n × route): fit seconds (fitted route only), wall
  * seconds, rank-recall@5. Results land in NOTES round-11.
  */
object KnnTierSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.ProbeHarness.session("knn-tier-sweep")
    graft.functions.VectorFunctions.ensureRegistered(spark)

    val base = graft.tables.Tables.embeddings(spark, sfDir)
    val nBase = base.count()

    for (n <- Seq(8000L, 12000L, 16000L, 24000L, 32000L, 48000L)) {
      val reps = ((n + nBase - 1) / nBase).toInt
      // replica-PERTURBED corpus (replicas are near- but not exact
      // duplicates — exact copies would let any geometry score ~1.0)
      val corpus = base
        .withColumn("r", explode(sequence(lit(0), lit(reps - 1))))
        .withColumn("emb2", expr(
          "transform(embedding, (x, j) -> CAST(x + 0.03 * r * sin(CAST(vec_id * 67 + j AS DOUBLE)) AS FLOAT))"))
        .select((col("vec_id") * reps + col("r")).as("vec_id"),
          col("emb2").as("embedding"))
        .where(col("vec_id") < n)
        .persist()
      assert(corpus.count() == n)

      val qs = corpus.where(col("vec_id") % 37 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      val exact = corpus.crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), round(
          graft.functions.VectorFunctions.vecCosine(col("embedding"), col("qemb")),
          3).as("cos"))
        .groupBy(col("qid"))
        .agg(graft.functions.VectorFunctions
          .topkByScore(col("cos"), col("vec_id"), 5).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.id").as("nbr_id"))
        .persist()
      val truth = exact.count()

      def measure(name: String, fitSec: Double)(route: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val out = route.persist()
        out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val hits = out.where(col("vec_id") % 37 === 0)
          .select(col("vec_id").as("qid"), col("nbr_id"))
          .join(exact, Seq("qid", "nbr_id"), "left_semi").count()
        val rec = if (truth == 0) 1.0 else hits.toDouble / truth
        out.unpersist()
        println(f"n=$n%6d $name%-12s fit $fitSec%6.1f s  wall $sec%7.1f s  recall@5 $rec%.3f")
      }

      measure("lsh16x4", 0.0) {
        graft.operators.Similarity.knnJoinGeom(corpus, 5, 64, Some((16, 4)))
      }
      measure("ivf-seeded", 0.0) {
        graft.operators.Similarity.knnJoinIvf(corpus, 5, 64)
      }
      // the IvfCellTiers ladder inline: <16k -> 8 cells, <128k -> 64
      val cells = if (n < 16000) 8 else 64
      val tf0 = System.nanoTime()
      val model = graft.operators.KMeans.fit(
        corpus.select(col("vec_id"), col("embedding")), k = cells, maxIters = 5)
      val fitSec = (System.nanoTime() - tf0) / 1e9
      measure("ivf-fitted", fitSec) {
        graft.operators.Similarity.knnJoinIvf(corpus, 5, 64, Some(model.centroids))
      }
      exact.unpersist(); corpus.unpersist()
    }
    spark.stop()
  }
}
