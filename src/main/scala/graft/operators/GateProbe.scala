package graft.operators

import org.apache.spark.sql.functions._

/** Perf probe (round-11): dd3 wall time with the kept-set SIZE GATE
  * (Dedup.scala `sizeFeasible` + the pre-band eligibility join) on the
  * two corpora whose numbers NOTES records for the pre-gate form —
  *   - the 2M-doc adversarial skew corpus (recorded 75-132 s): the
  *     mega group and near-empty docs are gate-ineligible, so banding
  *     and the chain machinery should never see them;
  *   - the ×20 replica corpus (recorded 40-61 s post-union-fix): all
  *     docs are eligible and clique members share sizes, so the gate
  *     should be ~free — this line guards against the gate's extra
  *     join costing more than it saves on non-adversarial shapes.
  *
  * Usage: runMain graft.operators.GateProbe [sfDir] [replicas] [ops]
  * `ops` = comma list of {skew, dd3, dd4, dd5} (default "skew,dd3") —
  * dd4/dd5 exist to time untouched ops in isolation when a smoke
  * reading looks off (run-heat vs regression attribution).
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.ProbeHarness.session("gate-probe")
    def timed(name: String)(body: => Long): Unit = {
      graft.ProbeHarness.timed(name)(body); ()
    }

    val ops = args.lift(2).getOrElse("skew,dd3").split(",").toSet

    if (ops("skew")) {
      val nAdv = graft.SkewCorpus.DefaultRows
      val adv = graft.SkewCorpus.adversarial(spark, nAdv)
      val advShingled = Dedup.withShingles(adv).select(col("doc_id"), col("shingles"))
      val advCap = Dedup.shingleDfCap(nAdv)
      timed("skew phase: kept") {
        Dedup.keptShingles(advShingled, advCap).count()
      }
      timed("skew phase: sigs (kept)") {
        Dedup.minhashSigsKept(Dedup.keptShingles(advShingled, advCap)).count()
      }
      timed("skew dd3 (gated)") { Dedup.dd3From(adv, nAdv).count() }
    }

    val docs = graft.ProbeHarness.replicaDocs(spark, sfDir, replicas)
    val nDocs = docs.count()
    if (ops("dd3"))
      timed(s"replica x$replicas dd3 (gated)") { Dedup.dd3From(docs, nDocs).count() }
    if (ops("dd4"))
      timed(s"replica x$replicas dd4") { Dedup.dd4From(docs, nDocs).count() }
    if (ops("dd5"))
      timed(s"replica x$replicas dd5") { Dedup.dd5From(docs).count() }
    spark.stop()
  }
}
