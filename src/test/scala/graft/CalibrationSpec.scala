package graft

import org.scalatest.funsuite.AnyFunSuite

/** The calibration probes are measurement INSTRUMENTS — their contract
  * is "fixed workload, finite positive wall, comparable across runs",
  * not a performance bar (a spec asserting speed would flake under the
  * very co-tenancy the probes exist to detect). */
class CalibrationSpec extends AnyFunSuite {

  test("calCpuMt runs one loop per core and returns a finite positive wall") {
    // small iteration count: the spec exercises the thread fan-out /
    // join plumbing, not the pinned artifact workload
    val s = Calibration.calCpuMt(iters = 1000000)
    assert(s > 0.0 && java.lang.Double.isFinite(s))
  }

  test("calMemMt sweeps private per-thread arrays and returns a finite positive wall") {
    // tiny arrays: exercises allocation/fan-out/join + the sum contract,
    // not DRAM (32 threads x 2 MiB stays heap-friendly in the test JVM)
    val s = Calibration.calMemMt(mb = 2, sweeps = 2)
    assert(s > 0.0 && java.lang.Double.isFinite(s))
  }

  test("full-width wall is bounded below by one thread's share of the work") {
    // width threads each do `iters` work; even with perfect scaling the
    // wall cannot beat a single thread running iters/width — a trivially
    // fast reading would mean the loops were dead-code-eliminated
    val iters = 20000000
    val width = Runtime.getRuntime.availableProcessors().max(1)
    val t0 = System.nanoTime()
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < iters / width) { h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL + i; i += 1 }
    val share = (System.nanoTime() - t0) / 1e9
    if (h == 42) print("")
    val mt = Calibration.calCpuMt(iters = iters)
    // generous 4x headroom under JIT warmup asymmetry: the guard only
    // has to catch elimination (orders of magnitude, not fractions)
    assert(mt > share / 4.0,
      s"full-width wall $mt s impossibly fast vs single-thread share $share s")
  }
}
