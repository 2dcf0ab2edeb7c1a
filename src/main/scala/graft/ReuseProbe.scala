package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: does exchange reuse fire for a self-join over an
  * aggregation (the dd3 shape), with and without an InMemoryRelation
  * source and with and without a window between the agg and the join?
  * Prints the executed plan's stage/reuse markers for each variant. */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession
      .builder("reuse-probe", "local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = (1 to 100000).map(i => (i % 977, i)).toDF("k", "v")
    val cached = base.persist()
    cached.count()

    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val shuffleW = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleW.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }

    def shape(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      stages.set(0); shuffleW.set(0L)
      spark.sparkContext.addSparkListener(listener)
      df.collect()
      // drain the async bus BEFORE removal (r16 ADVICE), or queued
      // stage-completion events never reach the listener
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      print(s"[stages=${stages.get()} shuffleWriteKiB=${shuffleW.get() / 1024}] ")
      val p = df.queryExecution.executedPlan.toString
      if (sys.env.contains("REUSE_PROBE_PLANS")) println("\n" + p)
      def c(s: String): Int = {
        var n = 0; var i = p.indexOf(s)
        while (i >= 0) { n += 1; i = p.indexOf(s, i + s.length) }
        n
      }
      println(s"$name: HashAggregate=${c("HashAggregate")} reusedExch=${c("ReusedExchange")} " +
        s"reusedStage=${c("ReusedQueryStage")} shuffleStages=${c("ShuffleQueryStage")} " +
        s"exchanges=${c("Exchange") - c("ReusedExchange") - c("BroadcastExchange")}")
    }

    println("exchange.reuse=" + spark.sessionState.conf.exchangeReuseEnabled +
      " aqe=" + spark.conf.get("spark.sql.adaptive.enabled"))

    // 0: AQE off A/B of the same self-join
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val agg0 = base.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    shape("AQE-OFF uncached agg self-join") {
      agg0.as("a").join(agg0.as("b"), $"a.s" === $"b.s" && $"a.k" < $"b.k")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // 1: plain agg self-join, uncached source
    val agg1 = base.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    shape("uncached agg self-join") {
      agg1.as("a").join(agg1.as("b"), $"a.s" === $"b.s" && $"a.k" < $"b.k")
    }
    locally {
      val j = agg1.as("a").join(agg1.as("b"), $"a.s" === $"b.s" && $"a.k" < $"b.k")
      val sp = j.queryExecution.executedPlan // pre-execution adaptive root
      val inner = sp match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
        case other => other
      }
      val exchanges = inner.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      println(s"initialPlan shuffle exchanges: ${exchanges.size}; " +
        s"distinct canonicalized: ${exchanges.map(_.canonicalized).distinct.size}")
      exchanges.map(_.canonicalized.toString).distinct.zipWithIndex.foreach { case (s, i) =>
        println(s"---- canonical exchange $i ----\n${s.linesIterator.take(12).mkString("\n")}")
      }
    }
    // 2: same over the cached source
    val agg2 = cached.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    shape("cached agg self-join") {
      agg2.as("a").join(agg2.as("b"), $"a.s" === $"b.s" && $"a.k" < $"b.k")
    }
    // 2b: self-join over a localCheckpoint'd source (LogicalRDD leaf)
    val ckpt = base.localCheckpoint()
    val agg2b = ckpt.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    shape("checkpointed agg self-join") {
      agg2b.as("a").join(agg2b.as("b"), $"a.s" === $"b.s" && $"a.k" < $"b.k")
    }

    // 3: dd3 shape: agg -> posexplode -> join count-agg back -> window -> self-join
    val sig = cached.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    val pre = sig.select($"k", $"n", posexplode(array($"s" % 7, $"s" % 11)).as(Seq("band", "bucket")))
    val over = pre.groupBy($"band", $"bucket").agg(count(lit(1)).as("bsz")).where($"bsz" > 1000)
    val banded0 = pre.join(over, Seq("band", "bucket"), "left_outer")
      .withColumn("over", $"bsz".isNotNull)
      .withColumn("bmask", sum(when(!$"over", 1L).otherwise(0L))
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"k")))
    val banded = banded0.where(!$"over")
    val a = banded.select($"k".as("ka"), $"band", $"bucket", $"bmask".as("ma"), $"n".as("na"))
    val b = banded.select($"k".as("kb"), $"band", $"bucket", $"n".as("nb"))
    shape("dd3-shaped (window+selfjoin)") {
      a.join(b, Seq("band", "bucket")).where($"ka" < $"kb")
    }
    spark.stop()
  }
}
