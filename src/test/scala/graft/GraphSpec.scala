package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.engine.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // undirected path 1—2—3, both directions materialized
  private def pathEdges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)
  ).toDF("src", "dst")

  test("pagerankFixedPoint matches the hand-computed integer recurrence") {
    // r0 = 1_000_000 each; teleport = 150_000; damping 85/100, all `div`
    // round 1: r(2) = 150_000 + 85·(1e6 + 1e6) div 100 = 1_850_000
    //          r(1) = r(3) = 150_000 + 85·(1e6 div 2) div 100 = 575_000
    // round 2: r(2) = 150_000 + 85·(575_000·2) div 100 = 1_127_500
    //          r(1) = r(3) = 150_000 + 85·(1_850_000 div 2) div 100 = 936_250
    val got = Graph.pagerankFixedPoint(pathEdges, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("rank mass only leaks downward (integer-division remainders), never grows") {
    val total0 = 3L * 1000000L
    val after = Graph.pagerankFixedPoint(pathEdges, iterations = 5)
      .agg(org.apache.spark.sql.functions.sum(col("rank"))).head.getLong(0)
    assert(after <= total0, s"mass grew: $after > $total0")
    // teleport floor: every node holds at least the teleport share
    assert(after >= 3L * 150000L)
  }

  test("fixed-point ranks are bit-identical across partitionings") {
    val a = Graph.pagerankFixedPoint(pathEdges.repartition(7), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pagerankFixedPoint(pathEdges.coalesce(1), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("hub outranks leaves on a star graph") {
    val star = Seq((1L, 9L), (9L, 1L), (2L, 9L), (9L, 2L), (3L, 9L), (9L, 3L))
      .toDF("src", "dst")
    val got = Graph.pagerankFixedPoint(star, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(9L) > got(1L) && got(1L) === got(2L) && got(2L) === got(3L))
  }
}
