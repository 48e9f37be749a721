package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.KmvSketch

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KMV is exact below k") {
    val est = (1 to 100).toDF("v")
      .agg(KmvSketch.approxDistinct(xxhash64(col("v")), k = 256).as("d"))
      .as[Long].collect()(0)
    assert(est == 100L)
  }

  test("KMV estimates large cardinalities within ~3 standard errors") {
    val n = 20000
    val est = (1 to n).toDF("v")
      .agg(KmvSketch.approxDistinct(xxhash64(col("v")), k = 256).as("d"))
      .as[Long].collect()(0)
    val se = 1.0 / math.sqrt(254)
    assert(math.abs(est - n).toDouble / n < 3 * se,
      s"estimate $est too far from $n")
  }

  test("KMV merges across groups and partitions") {
    val df = (1 to 5000).map(i => (i % 7, i)).toDF("g", "v").repartition(8)
    val out = df.groupBy("g")
      .agg(KmvSketch.approxDistinct(xxhash64(col("v")), k = 512).as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // each group has ~714 distinct values, below k=512? no: 5000/7 ≈ 714 > 512,
    // so estimates kick in; exact per-group distinct is 714 or 715
    out.foreach { case (g, est) =>
      val exact = (1 to 5000).count(_ % 7 == g)
      assert(math.abs(est - exact).toDouble / exact < 0.25, s"g=$g est=$est exact=$exact")
    }
  }
}
