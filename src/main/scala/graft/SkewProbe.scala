package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic main (round-11): one-JVM A/B of the dedup hot-key
  * COUNTING forms — the pre-round-11 window shapes (`count over
  * (partition by sh)` df filter; per-hash `row_number`) against the
  * shipped agg+join forms — at fixture scale and on the adversarial
  * skew corpus. Exists because the round-3 NOTES recorded "groupBy +
  * semi-join 15 % slower than the window" for the df cutoff, and the
  * round-10 VERDICT asked for that negative to be re-measured under the
  * round-11 anti-join form before it ships unconditionally (if the
  * window still won at fixture scale, the cutoff would have to route by
  * estimated rows like every other tiered decision).
  *
  * Usage: runMain graft.SkewProbe [sfDir]
  * Prints one line per (form × workload): wall seconds + result rows;
  * results must match between forms (asserted).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.ProbeHarness.session("skew-probe")

    def shingled(docs: DataFrame): DataFrame = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"), explode(col("shingles")).as("sh"))

    // dd4 pipeline over a kept-shingle frame (the shared downstream)
    def dd4Over(kept: DataFrame): DataFrame = {
      val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      kept.as("x").join(kept.as("y"),
          col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("common"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .where(round(col("common") / (col("na") + col("nb") - col("common")), 4) >= 0.8 &&
          col("common") >= graft.operators.Dedup.MinJaccardShingles)
        .select(col("doc_a"), col("doc_b"))
    }

    def keptWindow(ex: DataFrame, cap: Long): DataFrame = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .where(col("df") <= cap)
      .select(col("doc_id"), col("sh"))
    def keptAggJoin(ex: DataFrame, cap: Long): DataFrame = {
      val hot = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .where(col("df") > cap).select(col("sh"))
      ex.join(hot, Seq("sh"), "left_anti").select(col("doc_id"), col("sh"))
    }

    // candidate 3: SINGLE-scan bounded-collect — count + k-bounded id
    // list in one map-side-combined aggregation (TopKByScore with a
    // constant score; buffer ≤ cap+1 entries, so a stop-shingle never
    // materializes its population anywhere), then explode the ids of
    // under-cap shingles. One scan, no hot-key row shuffle, and the
    // output is partitioned on sh like the window form (the dd4
    // self-join's exchange-reuse position).
    def keptBounded(ex: DataFrame, cap: Long): DataFrame = ex
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("df"),
        graft.functions.VectorFunctions
          .topkByScore(lit(0.0), col("doc_id"), (cap + 1).toInt).as("ids"))
      .where(col("df") <= cap)
      .select(explode(col("ids")).as("t"), col("sh"))
      .select(col("t.id").as("doc_id"), col("sh"))

    def dd2Window(docs: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
      docs.withColumn("content_hash", sha2(col("text"), 256))
        .withColumn("keep", row_number().over(w) === 1)
        .where(col("keep")).select(col("doc_id"))
    }
    def dd2AggJoin(docs: DataFrame): DataFrame =
      graft.operators.Dedup.dd2From(docs).where(col("keep")).select(col("doc_id"))
    // candidate 3: join only the DUPLICATED groups back — hashes with one
    // member (the vast majority of any corpus) need no information at all
    // (keep = true); the dup-min frame is corpus-dedup-rate-sized and
    // usually broadcastable, so the corpus itself never shuffles.
    def dd2DupJoin(docs: DataFrame): DataFrame = {
      val hashed = docs.withColumn("content_hash", sha2(col("text"), 256))
      val dupMins = hashed.groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("m"), count(lit(1)).as("c"))
        .where(col("c") > 1).select(col("content_hash"), col("m"))
      hashed.join(dupMins, Seq("content_hash"), "left_outer")
        .withColumn("keep", col("m").isNull || col("doc_id") === col("m"))
        .where(col("keep")).select(col("doc_id"))
    }

    def timed(name: String)(body: => Long): Long = {
      // warm + 2 samples; min reported (JIT/IO warmup in the discard)
      body
      val t = (0 until 2).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-34s ${t.map(_._1).min}%8.2f s  ${t.head._2}%10d rows")
      t.head._2
    }

    // --- fixture scale (the round-3 battleground) ---
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val n1 = timed("fixture dd4 via WINDOW df") {
      dd4Over(keptWindow(shingled(docs), 100)).count()
    }
    val n2 = timed("fixture dd4 via AGG+JOIN df") {
      dd4Over(keptAggJoin(shingled(docs), 100)).count()
    }
    val n3 = timed("fixture dd4 via BOUNDED-COLLECT") {
      dd4Over(keptBounded(shingled(docs), 100)).count()
    }
    assert(n1 == n2 && n1 == n3, s"forms disagree at fixture scale: $n1 / $n2 / $n3")

    // --- adversarial skew (the 100 TB failure shape, scaled down) ---
    val nAdv = graft.SkewCorpus.DefaultRows
    val adv = graft.SkewCorpus.adversarial(spark, nAdv)
    val cap = graft.operators.Dedup.shingleDfCap(nAdv)
    val k1 = timed("skew keptShingles WINDOW") {
      keptWindow(shingled(adv), cap).count()
    }
    val k2 = timed("skew keptShingles AGG+JOIN") {
      keptAggJoin(shingled(adv), cap).count()
    }
    val k3 = timed("skew keptShingles BOUNDED") {
      keptBounded(shingled(adv), cap).count()
    }
    assert(k1 == k2 && k1 == k3, s"kept forms disagree under skew: $k1 / $k2 / $k3")
    val m1 = timed("skew dd2 WINDOW") { dd2Window(adv).count() }
    val m2 = timed("skew dd2 AGG+JOIN") { dd2AggJoin(adv).count() }
    val m3 = timed("skew dd2 DUP-JOIN") { dd2DupJoin(adv).count() }
    assert(m1 == m2 && m1 == m3, s"dd2 forms disagree under skew: $m1 / $m2 / $m3")
    spark.stop()
  }
}
