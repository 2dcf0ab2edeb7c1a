package graft

import org.apache.spark.sql.functions._

/** ss5 HOME-TIER (hyperplane-LSH route) phase attribution at fixture
  * scale (round 17 — VERDICT r16 #3): the IVF-route probe
  * ([[Ss5PerfProbe]]) covers the smoke tier, but the driver benches ss5
  * at sf0.1 where it routes to knnJoinGeom (16×4 LSH) — and that route
  * never had a phase table. Counts the candidate cascade (banded rows →
  * bucket-joined rows → first-collision survivors → top-k output) and
  * times each leg as an independent job, so the 3 s fixture wall is
  * attributable to a phase instead of a guess.
  *
  * Usage: runMain graft.Ss5LshProbe [sfDir]
  */
object Ss5LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = ProbeHarness.session("ss5-lsh-probe")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val e = graft.tables.Tables.embeddings(spark, sfDir)
    val dim = 64; val tables = 16; val bits = 4; val stride = bits

    val e0 = e.where(col("embedding").isNotNull)
      .where(graft.functions.VectorFunctions.vecDot(col("embedding"), col("embedding")) > 0)
    val rnd = new scala.util.Random(42)
    val planes: Seq[Seq[Seq[Double]]] = Seq.fill(tables, bits, dim)(rnd.nextGaussian())
    val bucketCols = planes.map { tbl =>
      tbl.zipWithIndex.map { case (plane, b) =>
        val proj = graft.functions.VectorFunctions.vecDot(
          col("embedding"), typedLit(plane.map(_.toFloat)))
        when(proj >= 0, lit(1L << b)).otherwise(0L)
      }.reduce(_ + _)
    }
    val packedSig = bucketCols.zipWithIndex
      .map { case (b, t) => shiftleft(b, stride * t) }
      .reduce((x, y) => x.bitwiseOR(y))
    val bucketMask = (1L << bits) - 1
    val banded = e0
      .select(col("vec_id"), col("embedding"), packedSig.as("sig"),
        sqrt(graft.functions.VectorFunctions.vecDot(col("embedding"), col("embedding"))).as("nrm"))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("sig"),
        posexplode(array((0 until tables).map(t =>
          shiftright(col("sig"), stride * t).bitwiseAND(lit(bucketMask))): _*))
          .as(Seq("table", "bucket")))
    ProbeHarness.timed("phase banded (sig+explode)") { banded.count() }
    val joined = banded.as("a").join(broadcast(banded.as("b")), Seq("table", "bucket"))
      .where(col("a.vec_id") =!= col("b.vec_id"))
    ProbeHarness.timed("phase bucket-join (raw pairs)") { joined.count() }
    val groupBits = lit {
      var m = 0L; var i = 0
      while (i < 64) { m |= 1L << i; i += stride }
      m
    }
    val xorSig = col("a.sig").bitwiseXOR(col("b.sig"))
    val collapsed = Iterator.iterate(1)(_ * 2).takeWhile(_ < stride)
      .foldLeft(xorSig)((acc, sh) => acc.bitwiseOR(shiftright(acc, sh)))
      .bitwiseAND(groupBits)
    val earlierMask = groupBits.bitwiseAND(
      expr(s"shiftleft(CAST(1 AS BIGINT), table * $stride)") - 1)
    val deduped = joined.where(collapsed.bitwiseAND(earlierMask) === earlierMask)
    ProbeHarness.timed("phase first-collision survivors") { deduped.count() }
    val scored = deduped.select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"),
      graft.functions.VectorFunctions.round3(
        try_divide(graft.functions.VectorFunctions.vecDot(col("a.embedding"), col("b.embedding")),
          col("a.nrm") * col("b.nrm"))).as("cos"))
    ProbeHarness.timed("phase +cosine") { scored.count() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nbr_id"))
    ProbeHarness.timed("phase +topk window") {
      scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 5).count()
    }
    ProbeHarness.timed("whole ss5 (for reference)") {
      graft.operators.Similarity.ss5KnnJoin(spark, sfDir).count()
    }
    spark.stop()
  }
}
