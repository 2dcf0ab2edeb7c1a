package graft

import org.apache.spark.sql.SparkSession

/** Fixed-workload calibration probes + artifact persistence, shared by
  * [[Bench]] and [[ScaleSmoke]] (round 12 — previously Bench-private,
  * which left the smoke's stage readings un-normalizable: its 100×
  * records swung up to 4× with co-tenancy and every adjudication needed
  * a manual isolated rerun).
  *
  * The probes are FIXED workloads so readings are comparable across
  * runs and artifacts: [[calCpu]] is a pinned single-core integer hash
  * loop (pure CPU + scheduler pressure), [[calSpark]] a tiny fixed
  * 32-partition Spark job (adds JVM/task-dispatch state). To compare
  * two artifacts recorded on different box states, scale totals by the
  * ratio of their calibration readings; [[RefCpuSec]] records the
  * settled quiet-box value (NOTES round-11) that wall bars normalize
  * against. */
object Calibration {

  /** Settled quiet-box [[calCpu]] reading (NOTES round-11): readings
    * materially above this mean the box is loaded or slower, and
    * absolute wall bars should be scaled by `reading / RefCpuSec`. */
  val RefCpuSec = 0.78

  /** Pinned single-core integer hash loop, seconds. */
  def calCpu(): Double = {
    val t0 = System.nanoTime()
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 400000000) { h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL + i; i += 1 }
    val s = (System.nanoTime() - t0) / 1e9
    if (h == 42) print("") // keep the loop live under JIT
    s
  }

  /** Fixed 32-partition Spark job, seconds. The mod keeps the ANSI sum
    * far from long overflow (50M × ±512). */
  def calSpark(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0, 50000000L, 1, 32).selectExpr("sum(xxhash64(id) % 1024)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Min of 3 samples — JIT warmup lives in the discarded samples. */
  def cal3(f: () => Double): Double = Seq(f(), f(), f()).min

  /** 1-minute HOST load average (whole box, not container-scoped): the
    * round-12 isolated-dd4 adjudication showed the single-core [[calCpu]]
    * probe understates the penalty a 32-thread job pays against ~24
    * co-runnable threads (cal read 0.978 while host load was ~24/32) —
    * the two readings together describe the box state; either alone can
    * mislead. -1.0 if the platform exposes neither source. */
  def hostLoad(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    } catch { case scala.util.control.NonFatal(_) =>
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
    }

  /** One-sample box-state stamp for per-stage lines: cpu probe + host
    * load, the pair every cross-state adjudication needs (VERDICT r12
    * #6 — the load reading existed only as a manual CalProbe run). */
  def stamp(): String = f"cal=${calCpu()}%.2f load=${hostLoad()}%.1f"

  /** JSON string literal (same escaping Bench has always used). */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Persist an artifact to a repo-side file (atomic rename so a
    * concurrent reader never sees a torn write). Exists because two
    * rounds running, the driver's output-tail capture truncated
    * BENCH_rN.json and lost per-query numbers — the official artifact
    * must be corroborable from the repo file alone. */
  def persist(path: String, content: String): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val tmp = new java.io.File(f.getParentFile, f.getName + ".tmp")
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try w.print(content) finally w.close()
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
