package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Microbenchmark for the hyperplane-signature projection (round 17):
  * ss2/ss5's banded stages burn ~2-8 ms of task CPU per INPUT ROW at
  * sf0.1 — ~60 µs per 64-dim dot against a literal plane, 100× the
  * fused-loop cost. This isolates which element of the packedSig
  * expression (the dots, the when-cases, the add/shift fold) is slow.
  *
  * Usage: runMain graft.SigMicroProbe [sfDir] [reps]
  */
object SigMicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = ProbeHarness.session("sig-micro-probe")
    VectorFunctions.ensureRegistered(spark)
    val e = graft.tables.Tables.embeddings(spark, sfDir)
      .where(col("embedding").isNotNull).localCheckpoint()
    println(s"rows=${e.count()}")

    val rnd = new scala.util.Random(42)
    val planes: Seq[Seq[Seq[Double]]] = Seq.fill(16, 4, 64)(rnd.nextGaussian())
    val flat = planes.flatten

    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val cpu0 = processCpuS
        e.select(c.as("x")).agg(sum(col("x").cast("double"))).head()
        println(f"$name rep$r: wall=${(System.nanoTime() - t0) / 1e9}%.3f cpu=${processCpuS - cpu0}%.2f")
      }
    }
    def processCpuS: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
        case _ => -1.0
      }

    if (args.length > 2) {
      // dump the generated code of the 4-dot projection and exit
      val small = (0 until 4).map(i => VectorFunctions.vecDot(col("embedding"),
        typedLit(flat(i).map(_.toFloat)))).reduce(_ + _)
      e.select(small.as("x")).queryExecution.debug.codegen()
      spark.stop(); return
    }

    // 1: one dot against one literal plane
    time("one-dot")(VectorFunctions.vecDot(col("embedding"),
      typedLit(flat.head.map(_.toFloat))))
    // 2: sum of 64 dots (no when/case)
    time("64-dots-sum")(flat.map(p =>
      VectorFunctions.vecDot(col("embedding"), typedLit(p.map(_.toFloat))))
      .reduce(_ + _))
    // 3: the real packedSig (when-cases + shift-fold)
    val bucketCols = planes.map { tbl =>
      tbl.zipWithIndex.map { case (plane, b) =>
        val proj = VectorFunctions.vecDot(col("embedding"), typedLit(plane.map(_.toFloat)))
        when(proj >= 0, lit(1L << b)).otherwise(0L)
      }.reduce(_ + _)
    }
    val packedSig = bucketCols.zipWithIndex
      .map { case (b, t) => shiftleft(b, 4 * t) }
      .reduce((x, y) => x.bitwiseOR(y))
    time("packedSig")(packedSig)
    spark.stop()
  }
}
