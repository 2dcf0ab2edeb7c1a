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

  test("memBurstMb clamps by heap without Int wrap and honors explicit small sizes") {
    // unbounded JVM: maxMemory() = Long.MaxValue — an early toInt wrapped
    // (possibly negative) and silently shrank the pinned 32 MiB burst to
    // the 4 MiB floor, making the reading non-comparable with no note
    assert(Calibration.memBurstMb(32, 32, Long.MaxValue) === 32)
    // small heap: clamp engages, floor holds
    assert(Calibration.memBurstMb(32, 32, 512L * 1024 * 1024) === 4)
    // 96 GiB bench heap at width 32 (cap 768 MiB/thread): never clamps
    assert(Calibration.memBurstMb(32, 32, 96L * 1024 * 1024 * 1024) === 32)
    // a spec's explicit tiny burst is honored, not floored up to 4
    assert(Calibration.memBurstMb(2, 32, Long.MaxValue) === 2)
  }

  test("full-width wall is bounded below by the single-thread wall for the same per-thread work") {
    // calCpuMt gives EVERY thread the full `iters`, so even under
    // perfect scaling the wall cannot materially beat one thread
    // running `iters` alone. The bound must be the FULL single-thread
    // wall, not iters/width: on a 32-core box a per-share bound sits
    // below calCpuMt's thread spawn/join overhead (several ms), which
    // would let fully-eliminated loops pass the very guard that exists
    // to catch elimination. 200M iterations ≈ 100 ms single-thread
    // JIT'd, so the /4 bar (~25 ms) is far above thread overhead.
    def st(iters: Int): Double = {
      val t0 = System.nanoTime()
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < iters) { h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL + i; i += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      if (h == 42) print("")
      s
    }
    st(20000000) // JIT warmup
    Calibration.calCpuMt(iters = 1000000)
    val iters = 200000000
    val single = st(iters)
    val mt = Calibration.calCpuMt(iters = iters)
    // 4x headroom absorbs turbo/scheduling asymmetry; elimination is
    // orders of magnitude, not fractions
    assert(mt > single / 4.0,
      s"full-width wall $mt s impossibly fast vs single-thread wall $single s")
  }
}
