package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Diagnostic main: write every SparkEntry query's `explain("formatted")`
  * output to one file per query — the optimization-round evidence format
  * (plans/r16/<query>_<tag>.txt). Two plans per file: the pre-execution
  * plan (AdaptiveSparkPlan isFinalPlan=false, the shape the optimizer
  * chose from statistics) and, after running the query to completion,
  * the AQE-final executed plan — join-strategy rewrites and coalesced
  * reads only exist in the latter. Session config comes from
  * GraftSession.builder so the dumped plans are the engine's real plans.
  *
  * Usage: runMain graft.PlanDump [sfDir] [outDir] [tag]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r16")
    val tag = args.lift(2).getOrElse("before")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = graft.core.GraftSession
      .builder("graft-plan-dump", "local[8]", 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.collect() // finalize AQE so the executed plan is the real one
        val finalPlan = df.queryExecution.executedPlan.toString
        val body =
          s"== explain(formatted), pre-execution ==\n$formatted\n" +
            s"== AQE-final executed plan ==\n$finalPlan\n"
        Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
          body.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"dumped $name")
      }
    spark.stop()
  }
}
