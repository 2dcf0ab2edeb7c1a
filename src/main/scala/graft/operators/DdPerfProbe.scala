package graft.operators

import org.apache.spark.sql.Column
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
    val spark = graft.ProbeHarness.session("dd-perf-probe")
    fallback.foreach(t => spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t.toString))

    val docs = graft.ProbeHarness.replicaDocs(spark, sfDir, replicas)
    val nDocs = docs.count()
    println(s"dd-perf-probe: $nDocs docs (x$replicas), " +
      s"objectAgg fallbackThreshold=${fallback.getOrElse(128)}")

    def timed(name: String)(body: => Long): Unit = {
      graft.ProbeHarness.timed(name)(body); ()
    }

    val dfCap = Dedup.shingleDfCap(nDocs)
    val shingled = Dedup.withShingles(docs).select(col("doc_id"), col("shingles"))
    timed("phase: kept (topk objectAgg)") {
      Dedup.keptShingles(shingled, dfCap).count()
    }
    timed("phase: keptSets (collect_list)") {
      Dedup.keptShingles(shingled, dfCap)
        .groupBy(col("doc_id"))
        .agg(collect_list(xxhash64(col("sh"))).as("shingles"))
        .count()
    }
    timed("phase: minhash sigs (kept)") {
      Dedup.minhashSigsKept(Dedup.keptShingles(shingled, dfCap)).count()
    }
    timed("dd4 total") {
      Dedup.dd4From(docs, nDocs).count()
    }
    timed("dd3 total") {
      Dedup.dd3From(docs, nDocs).count()
    }

    // dd3 interior phases, mirroring dd3FromParts (Dedup.scala) shape
    // for shape so each subtree can be costed; counts are cumulative
    // (each phase recomputes its ancestors — subtract to attribute).
    locally {
      import org.apache.spark.sql.expressions.Window
      val maxBucket = Dedup.MaxBucketSize
      val packs = (0 until 4).map { i =>
        (0 until 4).map { g =>
          shiftleft(element_at(col("bands"), i * 4 + g + 1).bitwiseAND(0xFFFFL), 16 * g)
        }.reduce((x, y) => x.bitwiseOR(y)).as(s"p_$i")
      }
      val bandCol = array((0 until 16).map { b =>
        xxhash64((lit(b) +: (0 until 4).map(rr => col(s"sig_${b * 4 + rr}"))): _*)
      }: _*)
      val preBand = Dedup.minhashSigsKept(Dedup.keptShingles(shingled, dfCap))
        .withColumn("bands", bandCol)
        .select((col("doc_id") +: col("ksz") +: packs) :+
          posexplode(col("bands")).as(Seq("band", "bucket")): _*)
      val overBuckets = preBand.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("bsz"))
        .where(col("bsz") > maxBucket)
      val banded0 = preBand
        .join(overBuckets, Seq("band", "bucket"), "left_outer")
        .withColumn("over", col("bsz").isNotNull)
        .withColumn("bmask",
          sum(when(!col("over"),
            expr("shiftleft(CAST(1 AS BIGINT), band)")).otherwise(0L))
            .over(Window.partitionBy(col("doc_id"))))
      timed("phase: banded0 (join+bmask)") { banded0.count() }
      def sizeFeasible(ka: Column, kb: Column): Column =
        least(ka, kb) * 20000L >= greatest(ka, kb) * 15999L
      val banded = banded0.where(!col("over"))
      val a = banded.select((col("doc_id").as("doc_a") +: col("band") +: col("bucket") +:
        col("bmask").as("bmask_a") +: col("ksz").as("ksz_a") +:
        (0 until 4).map(i => col(s"p_$i").as(s"pa_$i"))): _*)
      val b = banded.select((col("doc_id").as("doc_b") +: col("band") +: col("bucket") +:
        col("ksz").as("ksz_b") +: (0 until 4).map(i => col(s"p_$i").as(s"pb_$i"))): _*)
      def differsMask(pa: String, pb: String): Column = (0 until 4).map { i =>
        val xor = col(s"$pa$i").bitwiseXOR(col(s"$pb$i"))
        (0 until 4).map { g =>
          when(shiftright(xor, 16 * g).bitwiseAND(0xFFFFL) =!= 0,
            lit(1L << (4 * i + g))).otherwise(0L)
        }.reduce((x, y) => x.bitwiseOR(y))
      }.reduce((x, y) => x.bitwiseOR(y))
      val earlierMask = expr("shiftleft(CAST(1 AS BIGINT), band)") - 1
      timed("phase: joinedA (pre-filter)") {
        a.join(b, Seq("band", "bucket")).where(col("doc_a") < col("doc_b")).count()
      }
      val candA = a.join(b, Seq("band", "bucket"))
        .where(col("doc_a") < col("doc_b"))
        .where(sizeFeasible(col("ksz_a"), col("ksz_b")))
        .where(differsMask("pa_", "pb_").bitwiseOR(bitwise_not(col("bmask_a")))
          .bitwiseAND(earlierMask) === earlierMask)
        .select(col("doc_a"), col("doc_b"))
      timed("phase: candA") { candA.count() }
      val nseg = greatest(lit(1L), ceil(col("bsz") / lit(Dedup.ChainSegmentRows.toDouble)).cast("long"))
      val wChain = Window.partitionBy(col("band"), col("bucket"), col("seg"))
        .orderBy(xxhash64(col("band"), col("doc_id")), col("doc_id"))
      val lagged = (0 until 4).foldLeft(
        banded0.where(col("over"))
          .withColumn("seg", pmod(xxhash64(lit(0x5e9), col("band"), col("doc_id")), nseg))
          .withColumn("doc_p", lag(col("doc_id"), 1).over(wChain))
          .withColumn("ksz_p", lag(col("ksz"), 1).over(wChain))) {
        (df, i) => df.withColumn(s"pp_$i", lag(col(s"p_$i"), 1).over(wChain))
      }.where(col("doc_p").isNotNull)
      val candB = lagged
        .where(sizeFeasible(col("ksz"), col("ksz_p")))
        .where(differsMask("p_", "pp_").bitwiseOR(bitwise_not(col("bmask")))
          .bitwiseAND(lit(0xFFFFL)) === lit(0xFFFFL))
        .select(least(col("doc_id"), col("doc_p")).as("doc_a"),
          greatest(col("doc_id"), col("doc_p")).as("doc_b"))
      timed("phase: candB (chain, raw)") { candB.count() }
      timed("phase: cand total (dedup)") {
        candA.unionByName(candB).dropDuplicates("doc_a", "doc_b").count()
      }
    }
    spark.stop()
  }
}
