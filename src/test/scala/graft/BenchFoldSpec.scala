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
}
