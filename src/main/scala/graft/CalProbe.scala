package graft

/** Print the box-state calibration readings on demand (round 12): the
  * shared-host co-tenant comes and goes, and any isolated probe number
  * is only adjudicable next to a same-moment [[Calibration]] reading —
  * Bench and ScaleSmoke embed theirs, the small probe mains don't.
  * Run this immediately before/after a probe to stamp its box state.
  */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeHarness.session("cal-probe")
    println(f"cal: cpu=${Calibration.cal3(Calibration.calCpu _)}%.3f " +
      f"mt=${Calibration.cal3(() => Calibration.calCpuMt())}%.3f " +
      f"mem=${Calibration.cal3(() => Calibration.calMemMt())}%.3f " +
      f"spark=${Calibration.cal3(() => Calibration.calSpark(spark))}%.3f " +
      f"load=${Calibration.hostLoad()}%.1f " +
      f"(quiet-box ref cpu ${Calibration.RefCpuSec}%.2f)")
    spark.stop()
  }
}
