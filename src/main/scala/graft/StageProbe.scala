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
                        inB: Long, srB: Long, swB: Long, outRows: Long)

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
            m.shuffleWriteMetrics.bytesWritten, m.outputMetrics.recordsWritten)
        }
      }
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
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
        val t1 = System.nanoTime()
        fn(spark, sfDir).count()
        val w = (System.nanoTime() - t1) / 1e9
        // listener bus is async; drain BEFORE removing the listener —
        // events still queued at removal never reach a removed listener
        // (r16 ADVICE: the old remove-then-sleep order undercounted)
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
        println(f"$name warm$r: $w%.3f s (${stages.size} stages)")
        if (w < best) { best = w; bestStages = stages.synchronized(stages.toSeq) }
      }
      val tot = bestStages.map(_.ms).sum
      println(f"$name best warm: $best%.3f s; sum of stage walls ${tot / 1e3}%.3f s " +
        "(stages overlap — attribution, not decomposition)")
      bestStages.sortBy(-_.ms).take(25).foreach { s =>
        println(f"  ${s.ms}%6d ms  tasks=${s.tasks}%-4d in=${s.inB / 1024}%7d KiB " +
          f"sr=${s.srB / 1024}%7d KiB sw=${s.swB / 1024}%7d KiB  ${s.name}")
      }
    }
    spark.stop()
  }
}
