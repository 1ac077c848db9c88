package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-harness contamination defenses (round-7 lesson: a sustained
  * co-tenant spike covered all five repeats and the driver artifact recorded
  * a 10-25x phantom regression that only a judge re-run caught). The harness
  * must flag itself. */
class BenchSpec extends AnyFunSuite {

  test("load-suspect flag trips on a sustained spike, stays quiet when steady") {
    // healthy: min/median of five warmed runs track within tens of percent
    assert(!Bench.isLoadSuspect(0.100, 0.130))
    // sustained spike: even the best-of-five sits >2x under the median
    assert(Bench.isLoadSuspect(0.100, 0.350))
    // micro-timing jitter below the 10 ms absolute floor never flags
    assert(!Bench.isLoadSuspect(0.001, 0.004))
    // codec-grid units (ns/el): the actual round-7 contaminated value flags
    assert(Bench.isLoadSuspect(1.75, 47.4, floor = 0.5))
    // sub-floor ns/el jitter does not
    assert(!Bench.isLoadSuspect(0.10, 0.30, floor = 0.5))
  }

  test("timeWarmStats surfaces min vs median divergence under synthetic load") {
    // deterministic synthetic load: warmup + first two timed repeats spin
    // 2 ms, the last three spin 40 ms — a sustained mid-run spike. Median
    // lands on the slow side, min keeps the fast truth, and the flag trips.
    var calls = 0
    val (med, mn, _) = Bench.timeWarmStats {
      calls += 1
      val spinMs = if (calls <= 3) 2L else 40L
      val t0 = System.nanoTime()
      while (System.nanoTime() - t0 < spinMs * 1000000L) {}
    }
    assert(calls == 6) // 1 warmup + 5 timed
    assert(mn < med, s"min $mn median $med")
    assert(Bench.isLoadSuspect(mn, med), s"synthetic spike not flagged: min $mn median $med")
  }

  test("previous-round codec ratios parse from the committed BENCH artifact") {
    val ratios = Bench.previousBenchRatios(".")
    assert(ratios.contains("codec_random_ratio"), s"parsed keys: ${ratios.keys}")
    assert(ratios("codec_constant_ratio") > 0 && ratios("codec_constant_ratio") < 0.1)
    // unreadable dir -> empty, never throws
    assert(Bench.previousBenchRatios("/nonexistent").isEmpty)
  }
}
