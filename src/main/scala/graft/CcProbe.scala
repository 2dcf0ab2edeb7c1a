package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** CC-path probe (round 12 — VERDICT r11 #2): wall cost of clustering
  * dd5's sketch-pair graph — the high-diameter composition that first
  * exceeded min-label's round budget at the 100× smoke — under each
  * [[graft.operators.Dedup.dd6ClusterFrom]] trigger path:
  *
  *   - `star-hint`: the edge-provenance hint, straight to star
  *     contraction (what the smoke's dd5-connectivity stage now uses);
  *   - `star-early:N`: the default entry — min-label probe rounds until
  *     the convergence trend stalls (expected N=3), then star.
  *
  * The delta between the two, divided by the probe-round count, prices
  * ONE full-edge-set min-label round — which also prices the retired
  * round-11 behavior (always 8 probe rounds before the fallback)
  * without resurrecting it: retired ≈ hint + 8 × round. Label identity
  * across the paths is asserted exactly (join, zero mismatches) so the
  * timing comparison is between equal answers.
  *
  * Usage: runMain graft.CcProbe [sfDir] [replicas]   (default 100×;
  * 100× wants SPARK_DRIVER_MEM=96g like the 100× smoke)
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = ProbeHarness.session("cc-probe")

    val docs = ProbeHarness.replicaDocs(spark, sfDir, replicas)
    val ids = docs.select(col("doc_id"))
    val pairs = graft.operators.Dedup.dd5From(docs)
      .select(col("doc_a"), col("doc_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ProbeHarness.timed(s"dd5 pairs x$replicas")(pairs.count())

    def cluster(hint: Boolean) = {
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup
        .dd6ClusterFrom(ids, pairs, highDiameterHint = hint)
        .persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"dd6 over dd5 (hint=$hint%-5s)       $secs%8.1f s  " +
        s"path=${graft.operators.Dedup.ccPath.get}")
      (out, secs, graft.operators.Dedup.ccPath.get)
    }
    val (hinted, tHint, _) = cluster(hint = true)
    val (trend, tTrend, trendPath) = cluster(hint = false)

    val mismatch = hinted.as("h").join(trend.as("t"), "doc_id")
      .where(col("h.cluster_rep") =!= col("t.cluster_rep")).count()
    val comps = hinted.where(col("keep")).count()
    println(s"components: $comps; label mismatches hint vs trend: $mismatch (must be 0)")

    // the per-round pricing is only meaningful when the no-hint run
    // actually SWITCHED to star after N min-label probe rounds — on a
    // smaller/denser corpus the trend run can converge on the fast
    // min-label path ('fast:N'), where N counts rounds of a DIFFERENT
    // algorithm and the extrapolation below would be noise (ADVICE r12)
    val probeRounds = trendPath.split(":").lift(1).map(_.toInt).getOrElse(0)
    if ((trendPath.startsWith("star-early") || trendPath.startsWith("star-budget"))
        && probeRounds > 0) {
      val perRound = (tTrend - tHint) / probeRounds
      println(f"probe-round cost ~$perRound%.1f s/round over these edges; " +
        f"retired 8-round prelude implies ~${tHint + 8 * perRound}%.1f s " +
        f"(hint $tHint%.1f s, trend $tTrend%.1f s @ $probeRounds rounds)")
    } else {
      println(s"no probe-round pricing: trend path '$trendPath' never switched " +
        "to star, so no min-label probe rounds were priced against the hint")
    }
    spark.stop()
    if (mismatch != 0) sys.exit(1)
  }
}
