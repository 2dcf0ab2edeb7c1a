package graft

import org.apache.spark.sql.functions._

/** Recall-vs-cosine curve for ss2/lshNeardupPairs at a replica-corpus
  * tier (round 12): the first 20× run of the new ss2 smoke bar read
  * 0.425 at threshold .4 against a flat .75 bar — this probe resolves
  * whether that is a tier regression or corpus-mix physics by printing
  * recall PER COSINE BAND against the 1/7-sample exact ground truth
  * (the smoke's own methodology). Random-hyperplane collision
  * probability at b bits, T tables is 1-(1-(1-θ/π)^b)^T — at the 4×12
  * tier that is ~2 % for cos .4 pairs and ~100 % for exact-duplicate
  * replicas, so a threshold-.4 aggregate mixes two regimes; the bands
  * separate them and pick the contract band the smoke can bar hard.
  *
  * Usage: runMain graft.BandRecallProbe [sfDir] [replicas] [threshold]
  */
object BandRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.4)
    val spark = ProbeHarness.session("band-recall-probe")

    val embs = ProbeHarness.replicaEmbeddings(spark, sfDir, replicas)
    val sample = embs.where(col("vec_id") % 7 === 0)
    val exact = graft.operators.Similarity.exactNeardupPairs(sample, threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .persist()
    val approx = graft.operators.Similarity.lshNeardupPairs(embs, threshold)
      .where(col("vec_a") % 7 === 0 && col("vec_b") % 7 === 0)
      .select(col("vec_a"), col("vec_b"))
    val hitFlagged = exact.join(
        approx.withColumn("hit", lit(1)), Seq("vec_a", "vec_b"), "left_outer")
      .select(col("cos"), coalesce(col("hit"), lit(0)).as("hit"))
      .persist()

    val edges = Seq(0.4, 0.45, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99)
    println(f"${"band"}%-14s ${"truth"}%8s ${"hits"}%8s  recall")
    (edges :+ 1.01).sliding(2).foreach { case Seq(lo, hi) =>
      val row = hitFlagged.where(col("cos") >= lo && col("cos") < hi)
        .agg(count(lit(1)).as("n"), sum(col("hit")).as("h"))
        .collect()(0)
      val n = row.getLong(0); val h = if (row.isNullAt(1)) 0L else row.getLong(1)
      // an empty band is "no truth mass", not a measured perfect score
      // (ADVICE r12: n==0 -> 1.000 read as a real recall in the table)
      if (n == 0) println(f"[$lo%.2f,$hi%.2f)  $n%8d $h%8d  n/a (no truth mass)")
      else println(f"[$lo%.2f,$hi%.2f)  $n%8d $h%8d  ${h.toDouble / n}%.3f")
    }
    for (core <- Seq(0.9, 0.95, 0.99)) {
      val row = hitFlagged.where(col("cos") >= core)
        .agg(count(lit(1)).as("n"), sum(col("hit")).as("h")).collect()(0)
      val n = row.getLong(0); val h = if (row.isNullAt(1)) 0L else row.getLong(1)
      if (n == 0) println(f">= $core%.2f        $n%8d $h%8d  n/a (no truth mass)")
      else println(f">= $core%.2f        $n%8d $h%8d  ${h.toDouble / n}%.3f")
    }
    spark.stop()
  }
}
