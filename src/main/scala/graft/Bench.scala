package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the scale factor in
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Honesty rules (round-2): each query runs twice and the reported
  * `queries`/`value` figures are the WARM (second) run — cold-JIT noise
  * stops polluting round-over-round comparisons; the cold times are kept
  * in `queries_cold`. A query that throws is NOT silently scored: its
  * time is -1 and the error lands in `errors`.
  *
  * SPARK_GRAFT_ONLY=dd3,dd4 restricts to a comma-separated subset (local
  * iteration; the driver never sets it). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    val results = selected.map { case (name, fn) =>
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      }
      val cold = once()
      val warm = if (cold.isLeft) cold else once()
      name -> ((cold, warm))
    }
    def timesJson(pick: ((Either[String, Double], Either[String, Double])) => Either[String, Double]) =
      results.map { case (k, v) =>
        s"${jstr(k)}:${pick(v).fold(_ => "-1", t => t.toString)}"
      }.mkString("{", ",", "}")
    val errors = results.collect { case (k, (_, Left(msg))) => s"${jstr(k)}:${jstr(msg)}" }
      .mkString("{", ",", "}")
    val total = results.values.map(_._2.getOrElse(0.0)).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${timesJson(_._2)},""" +
      s""""queries_cold":${timesJson(_._1)},"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
    if (results.values.exists(_._2.isLeft)) sys.exit(1)
  }
}
