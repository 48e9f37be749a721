package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.engine.PipelineQueries

/** x04 (approx_percentile, bounded-memory sketch) vs o35 (exact
  * interpolated percentile): same groups, and the approximation error is
  * bounded. approx_percentile guarantees a RANK error of at most
  * 1/accuracy; with accuracy=10000 on sf0.001 (~6k lineitem rows split in
  * 3 return-flag groups) the sketch holds every value, so the answer must
  * land on an actual data point adjacent to the exact interpolated
  * quantile — within one inter-value gap, bounded here by a loose
  * relative tolerance.
  */
class PercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def byFlag(name: String): Map[String, (Double, Double)] =
    PipelineQueries.queries(name)(spark, sf).collect().map {
      case Row(f: String, med: Double, p90: Double) => f -> (med, p90)
    }.toMap

  test("distributed selection == built-in percentile, bit for bit") {
    import org.apache.spark.sql.functions._
    val builtin = graft.engine.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"))
      .select(col("l_returnflag"),
        col("ps").getItem(0).as("median_price"),
        col("ps").getItem(1).as("p90_price"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ours = byFlag("o35_percentiles")
    assert(ours == builtin,
      s"distributed selection must equal the built-in exactly: $ours vs $builtin")
  }

  test("distributed selection handles tiny and single-value groups") {
    import spark.implicits._
    val df = (Seq(("a", 1.0)) ++ (1 to 4).map(i => ("b", i.toDouble)) ++
      Seq(("c", 7.0), ("c", 7.0))).toDF("k", "x")
    val out = graft.engine.Percentiles
      .exactByKey(df, "k", "x", Seq(0.5), Seq("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 1.0, "b" -> 2.5, "c" -> 7.0))
  }

  test("distributed selection is invariant to the shuffle partition count") {
    import org.apache.spark.sql.functions.col
    val df = graft.engine.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
    def run(): Map[String, (Double, Double)] =
      graft.engine.Percentiles
        .exactByKey(df, "l_returnflag", "l_extendedprice",
          Seq(0.5, 0.9), Seq("med", "p90"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val base = run()
    try {
      Seq("1", "3", "17").foreach { n =>
        spark.conf.set(key, n)
        assert(run() == base, s"result changed at $n shuffle partitions")
      }
    } finally spark.conf.set(key, prev)
  }

  test("approx percentiles track the exact ones per group") {
    val exact = byFlag("o35_percentiles")
    val approx = byFlag("x04_approx_percentiles")
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (medE, p90E)) =>
      val (medA, p90A) = approx(flag)
      assert(math.abs(medA - medE) / medE < 0.02,
        s"$flag median: approx $medA vs exact $medE")
      assert(math.abs(p90A - p90E) / p90E < 0.02,
        s"$flag p90: approx $p90A vs exact $p90E")
    }
  }
}
