package graft

import org.scalatest.funsuite.AnyFunSuite

/** The pass-folding contract behind every bench number (Bench.foldPasses):
  * a query's reported time is the MIN over successful passes, and a query
  * is an error only when EVERY pass failed — a transient single-pass
  * failure must neither report a fast-fail duration as the query's time
  * nor mark a succeeded query as an error (the round-4 advice race).
  */
class BenchFoldSpec extends AnyFunSuite {

  test("all passes succeed: min wins") {
    assert(Bench.foldPasses(Seq(Right(2.5), Right(1.5))) == Right(1.5))
  }

  test("one pass fails transiently: the surviving time wins, no error") {
    assert(Bench.foldPasses(Seq(Left("gc pause"), Right(3.0))) == Right(3.0))
    assert(Bench.foldPasses(Seq(Right(3.0), Left("oom"))) == Right(3.0))
  }

  test("every pass fails: the FIRST error is reported") {
    assert(Bench.foldPasses(Seq(Left("first"), Left("second"))) == Left("first"))
  }

  test("a fast failure never masquerades as a fast time") {
    // a pass that dies in 0.01s contributes no duration at all
    val folded = Bench.foldPasses(Seq(Left("died at 0.01s"), Right(4.0)))
    assert(folded == Right(4.0))
  }

  test("noise sentinel: factor is measured/norm, noisy strictly above 2×") {
    val (fIdle, noisyIdle) = Bench.noiseVerdict(Bench.CalibrationNormSec)
    assert(math.abs(fIdle - 1.0) < 1e-9 && !noisyIdle)
    // exactly at the threshold is NOT noisy (> not >=): the flag marks
    // pollution, not the norm's own tail
    val (fAt, noisyAt) = Bench.noiseVerdict(Bench.CalibrationNormSec * Bench.NoisyFactor)
    assert(math.abs(fAt - Bench.NoisyFactor) < 1e-9 && !noisyAt)
    val (fHot, noisyHot) = Bench.noiseVerdict(Bench.CalibrationNormSec * 5.0)
    assert(fHot > Bench.NoisyFactor && noisyHot)
  }

  test("slowest decile: ceil(n/10) names, slowest-first, deterministic ties") {
    val timed = (1 to 20).map(i => f"q$i%02d" -> i.toDouble)
    // 20 queries -> decile of 2: the two largest times
    assert(Bench.slowestDecile(timed) == Set("q19", "q20"))
    // always at least one, even for a tiny registry
    assert(Bench.slowestDecile(Seq("a" -> 1.0)) == Set("a"))
    assert(Bench.slowestDecile(Seq("a" -> 1.0, "b" -> 2.0)) == Set("b"))
    // ties broken by name so the refined set is identical across JVMs
    assert(Bench.slowestDecile(
      (1 to 20).map(i => f"q$i%02d" -> 5.0)) == Set("q01", "q02"))
  }
}
