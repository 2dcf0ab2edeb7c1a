package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Diagnostic main: per-STAGE wall/shuffle attribution for one or more
  * SparkEntry queries at a given SF — the measurement the optimization
  * guide (§1) starts from when the UI is unavailable (spark.ui.enabled
  * is off in GraftSession). Runs each query once cold and once warm,
  * with a listener recording every completed stage's duration, task
  * count, input/shuffle bytes and rows; prints the warm run's stages
  * sorted by duration so the expensive exchange/agg/join legs are
  * attributable from the console alone.
  *
  * Usage: runMain graft.StageProbe <query[,query...]> [sfDir] [warmRuns]
  */
object StageProbe {
  private case class St(name: String, ms: Long, tasks: Int,
                        inB: Long, srB: Long, swB: Long, outRows: Long,
                        runMs: Long, cpuMs: Long)

  /** Whole-JVM CPU seconds — wall is useless on this co-tenanted box for
    * sub-second A/Bs (r17: dd3 cold swung 13→53 s between two runs
    * minutes apart); process CPU is stolen-core-resistant, so per-run
    * deltas adjudicate code changes the wall cannot. */
  private def processCpuS: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  /** Cumulative GC wall seconds across all collectors (GC *CPU* is not
    * exposed; wall × parallel GC threads bounds the CPU eaten). */
  private def gcS: Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum / 1e3
  }

  /** Per-thread CPU, grouped by name prefix (digits stripped) — JVM CPU
    * that is neither task nor GC has to be SOME thread's; this names it.
    * Note: getAllThreadIds misses threads that die between samples, and
    * JIT compiler threads are not Java threads — an unexplained residue
    * vs processCpuS points at the JIT. */
  private def threadCpuByGroup(): Map[String, Double] = {
    val tm = java.lang.management.ManagementFactory.getThreadMXBean
    val info = tm.getThreadInfo(tm.getAllThreadIds, 0)
    info.filter(_ != null).groupBy(ti =>
      ti.getThreadName.replaceAll("[0-9]+", "#")).view.mapValues(
      _.map(ti => math.max(tm.getThreadCpuTime(ti.getThreadId), 0L) / 1e9).sum
    ).toMap
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("dd3_minhash_lsh").split(",").map(_.trim)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val warmRuns = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = ProbeHarness.session("stage-probe")
    sys.env.get("SPARK_GRAFT_EXCLUDE_RULES").foreach { r =>
      spark.conf.set("spark.sql.optimizer.excludedRules", r)
      println(s"excludedRules=$r")
    }

    val stages = ArrayBuffer[St]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val ms = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.name.takeWhile(_ != '\n'), ms,
            si.numTasks, m.inputMetrics.bytesRead, m.shuffleReadMetrics.remoteBytesRead
              + m.shuffleReadMetrics.localBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.outputMetrics.recordsWritten,
            m.executorRunTime, m.executorCpuTime / 1000000L)
        }
      }
    }

    // SPARK_GRAFT_REUSE_DF=1: build each query's DataFrame ONCE and
    // count() it repeatedly — isolates per-run plan/codegen construction
    // cost from execution cost (the bench always rebuilds, honestly; this
    // mode exists to attribute the difference)
    val reuseDf = sys.env.get("SPARK_GRAFT_REUSE_DF").contains("1")

    for (name <- names) {
      val fn0 = SparkEntry.queries(name)
      val fn: (org.apache.spark.sql.SparkSession, String) =>
          org.apache.spark.sql.DataFrame =
        if (!reuseDf) fn0
        else { val df = fn0(spark, sfDir); (_, _) => df }
      spark.sparkContext.setJobDescription(s"$name cold")
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"$name cold: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      var best = Double.MaxValue
      var bestStages: Seq[St] = Nil
      for (r <- 1 to warmRuns) {
        stages.synchronized(stages.clear())
        spark.sparkContext.addSparkListener(listener)
        spark.sparkContext.setJobDescription(s"$name warm$r")
        val cpu0 = processCpuS
        val gc0 = gcS
        val tg0 = threadCpuByGroup()
        val jit0 = java.lang.management.ManagementFactory
          .getCompilationMXBean.getTotalCompilationTime
        val janino0 = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getCount
        val t1 = System.nanoTime()
        fn(spark, sfDir).count()
        val w = (System.nanoTime() - t1) / 1e9
        val jvmCpu = processCpuS - cpu0
        val gcD = gcS - gc0
        // listener bus is async; drain BEFORE removing the listener —
        // events still queued at removal never reach a removed listener
        // (r16 ADVICE: the old remove-then-sleep order undercounted)
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
        val (runS, cpuS) = stages.synchronized(
          (stages.map(_.runMs).sum / 1e3, stages.map(_.cpuMs).sum / 1e3))
        println(f"$name warm$r: $w%.3f s (${stages.size} stages) " +
          f"jvmCpu=$jvmCpu%.2f taskRun=$runS%.2f taskCpu=$cpuS%.2f " +
          f"nonTaskCpu~${jvmCpu - cpuS}%.2f gcWall=$gcD%.2f " +
          f"jitMs=${java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime - jit0} " +
          f"janinoCompiles=${org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount - janino0}")
        val tg1 = threadCpuByGroup()
        val deltas = tg1.map { case (k, v) => k -> (v - tg0.getOrElse(k, 0.0)) }
          .filter(_._2 > 0.05).toSeq.sortBy(-_._2)
        val accounted = deltas.map(_._2).sum
        println(f"  thread-cpu (sum $accounted%.2f of $jvmCpu%.2f; gap=JIT/dead threads): " +
          deltas.take(8).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
        if (w < best) { best = w; bestStages = stages.synchronized(stages.toSeq) }
      }
      val tot = bestStages.map(_.ms).sum
      println(f"$name best warm: $best%.3f s; sum of stage walls ${tot / 1e3}%.3f s " +
        "(stages overlap — attribution, not decomposition)")
      bestStages.sortBy(-_.ms).take(25).foreach { s =>
        println(f"  ${s.ms}%6d ms  tasks=${s.tasks}%-4d in=${s.inB / 1024}%7d KiB " +
          f"sr=${s.srB / 1024}%7d KiB sw=${s.swB / 1024}%7d KiB run=${s.runMs}%6d cpu=${s.cpuMs}%6d  ${s.name}")
      }
    }
    spark.stop()
  }
}
