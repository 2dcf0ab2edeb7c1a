package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic (round-11): where do the dd4 pairs that dd3 misses
  * at the 20× smoke die? For each missed pair: full-shingle Jaccard
  * (context), number of matching MinHash bands (rebuilt, like dd3's
  * kernel, over the KEPT df-cutoff sets — minhashSigsKept's scheme; a
  * full-set rebuild here would misattribute every loss), and whether any
  * matching band's bucket survived the cap. Classifies the loss as
  * banding (0 matching bands), cap (matched only over-cap buckets),
  * veto/bug (matched a surviving band yet not emitted), or verification.
  */
object DdDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.ProbeHarness.session("dd-debug")
    graft.functions.VectorFunctions.ensureRegistered(spark)

    val docs = graft.ProbeHarness.replicaDocs(spark, sfDir, replicas)
    val nDocs = docs.count()
    println(s"corpus: $nDocs docs")

    val dd4 = graft.operators.Dedup.dd4From(docs, nDocs)
      .select(col("doc_a"), col("doc_b")).persist()
    val dd3 = graft.operators.Dedup.dd3From(docs, nDocs)
      .select(col("doc_a"), col("doc_b")).persist()
    println(s"dd4 ${dd4.count()}  dd3 ${dd3.count()}")
    val missed = dd4.join(dd3, Seq("doc_a", "doc_b"), "left_anti").persist()
    println(s"missed ${missed.count()}")

    // kept shingle sets + minhash signatures, rebuilt with dd3's exact
    // kernel shapes (sigs over the KEPT sets, the round-11 scheme; the
    // anti-join kept form is set-identical to the operators' bounded
    // collect). The cutoff is the SAME corpus-scaled one the operators
    // under diagnosis used — a literal here would silently diverge once
    // nDocs > 100k engages the relative term, misclassifying every loss.
    val shingled = docs.withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"), col("shingles"))
    val keptEx = shingled.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val hot = keptEx.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") > graft.operators.Dedup.shingleDfCap(nDocs)).select(col("sh"))
    val kept = keptEx.join(hot, Seq("sh"), "left_anti")
    val exploded = kept.select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val mins = (0 until 64).map(i => min(xxhash64(lit(i), col("h"))).as(s"sig_$i"))
    val sigs = exploded.groupBy(col("doc_id")).agg(count(lit(1)).as("ksz"), mins: _*)
      .where(col("ksz") >= graft.operators.Dedup.MinJaccardShingles)
    val bands = array((0 until 16).map { b =>
      xxhash64((lit(b) +: (0 until 4).map(rr => col(s"sig_${b * 4 + rr}"))): _*)
    }: _*)
    val banded = sigs.select(col("doc_id"), bands.as("bands")).persist()
    // bucket sizes per (band, bucket) for cap classification
    val bsz = banded.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n")).persist()

    val fullSets = shingled.select(col("doc_id"), col("shingles"))
    val m2 = missed
      .join(fullSets.select(col("doc_id").as("doc_a"), col("shingles").as("fa")), "doc_a")
      .join(fullSets.select(col("doc_id").as("doc_b"), col("shingles").as("fb")), "doc_b")
      .withColumn("jfull", size(array_intersect(col("fa"), col("fb"))) /
        size(array_union(col("fa"), col("fb"))))
      .join(banded.select(col("doc_id").as("doc_a"), col("bands").as("ba")), "doc_a")
      .join(banded.select(col("doc_id").as("doc_b"), col("bands").as("bb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jfull"),
        posexplode(col("ba")).as(Seq("band", "bucket")),
        element_at(col("bb"), col("band") + 1).as("bktb"))
      .withColumn("collide", col("bucket") === col("bktb"))
      .join(bsz, Seq("band", "bucket"), "left_outer")
      .groupBy(col("doc_a"), col("doc_b"), col("jfull"))
      .agg(sum(when(col("collide"), 1).otherwise(0)).as("nCollide"),
        sum(when(col("collide") && col("n") <= graft.operators.Dedup.MaxBucketSize, 1)
          .otherwise(0)).as("nSurvive"))
    val cls = m2.select(
      when(col("nCollide") === 0, "banding")
        .when(col("nSurvive") === 0, "cap-only")
        .otherwise("VETO/BUG").as("cls"),
      col("jfull"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("pairs"), round(avg(col("jfull")), 3).as("avg_jfull"),
        round(min(col("jfull")), 3).as("min_jfull"), round(max(col("jfull")), 3).as("max_jfull"))
    cls.show(10, false)

    // kept-set sizes + common count, for missed vs found pairs: how do
    // the coincidence pairs separate from real near-dups? (`kept` is the
    // shared frame the signature rebuild above also used.)
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val ksz = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).persist()
    def pairStats(pairsDf: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val keptSets = kept.groupBy(col("doc_id")).agg(collect_set(col("sh")).as("ks"))
      val st = pairsDf
        .join(keptSets.select(col("doc_id").as("doc_a"), col("ks").as("ka")), "doc_a")
        .join(keptSets.select(col("doc_id").as("doc_b"), col("ks").as("kb")), "doc_b")
        .select(size(array_intersect(col("ka"), col("kb"))).as("common"),
          least(size(col("ka")), size(col("kb"))).as("minsz"))
      st.select(lit(label).as("set"),
          count(lit(1)).as("pairs"),
          round(avg(col("common")), 1).as("avg_common"),
          expr("percentile(common, array(0.1, 0.5, 0.9))").as("common_p10_50_90"),
          expr("percentile(minsz, array(0.1, 0.5, 0.9))").as("minsz_p10_50_90"))
        .show(5, false)
    }
    pairStats(missed, "missed-by-dd3")
    pairStats(dd3, "found-by-dd3")
    spark.stop()
  }
}
