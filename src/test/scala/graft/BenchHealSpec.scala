package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's min-of-runs self-healing: SCALING.md documents the write
  * path as ambiently bimodal up to ~5x on identical code (q177
  * measured 15.9/20.4/45.6/87.5 s across idle-labeled runs), so a
  * >2.5x-of-idle-reference first timing re-runs and the MIN is the
  * reported cost. These tests drive the decision logic with synthetic
  * contention — an outlier row self-corrects, a nominal row never
  * re-runs, the rerun budget is honored. */
class BenchHealSpec extends AnyFunSuite {

  private def runs(ts: Double*): () => Double = {
    val it = ts.iterator
    () => { assert(it.hasNext, "healed() ran more times than allowed")
      it.next() }
  }

  test("synthetic contention: an outlier first timing self-corrects " +
      "to the idle mode and reports one rerun") {
    // the measured q177 shape: idle reference ~15.9, contended first
    // run 45.6, the re-run lands back in the idle mode
    val (best, n) = Bench.healed(45.6, Some(15.9))(runs(16.2))
    assert(best == 16.2 && n == 1)
  }

  test("a nominal timing never re-runs") {
    val (best, n) = Bench.healed(17.0, Some(15.9))(runs())
    assert(best == 17.0 && n == 0)
  }

  test("no reference, no healing — and sub-second firsts never re-run") {
    assert(Bench.healed(99.0, None)(runs()) == ((99.0, 0)))
    // a 0.9 s timing 10x its 0.09 s reference is timer noise at this
    // absolute scale, not write-path bimodality
    assert(Bench.healed(0.9, Some(0.09))(runs()) == ((0.9, 0)))
  }

  test("rerun budget is honored and the min of all runs wins") {
    // persistently slow: two reruns allowed, then report the min seen
    val (best, n) = Bench.healed(80.0, Some(10.0))(runs(70.0, 60.0))
    assert(best == 60.0 && n == 2)
    // a rerun that lands UNDER the threshold stops the loop early
    val (best2, n2) = Bench.healed(80.0, Some(10.0))(runs(12.0))
    assert(best2 == 12.0 && n2 == 1)
    // the 2.5x threshold catches BOTH measured q177 outlier modes
    // (45.6 and 87.5 vs idle 15.9) while ambient <=1.4x never trips
    assert(Bench.healed(87.5, Some(15.9))(runs(16.0)) == ((16.0, 1)))
    assert(Bench.healed(15.9 * 1.4, Some(15.9))(runs())._2 == 0)
  }

  test("loadReference parses the committed file and gates on sf") {
    val (sf, ref) = Bench.loadReference("bench/idle_reference.json")
    assert(sf == "sf0.1")
    assert(ref.size > 150 && ref.contains("q177_materialized_view"))
    assert(ref.values.forall(_ > 0))
    // missing file → healing off, not a crash
    assert(Bench.loadReference("/nonexistent.json") == (("", Map.empty)))
  }
}
