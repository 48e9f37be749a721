package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Skew

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot key (9000 rows of "hot") + a long tail
  private def skewed = (1 to 10000).map { i =>
    if (i <= 9000) ("hot", 1.0) else (s"k$i", 2.0)
  }.toDF("key", "v")

  test("saltedSum equals plain grouped sum") {
    val salted = Skew.saltedSum(skewed, "key", "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted("hot") == 9000.0)
    assert(salted("k9001") == 2.0)
    assert(salted.size == 1001)
  }

  test("saltedSum equals plain grouped sum on random skewed decimal data") {
    import org.apache.spark.sql.functions.{col, sum}
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(500)((s"k${rnd.nextInt(5)}", rnd.nextInt(100000) / 100.0)) ++
        Seq.fill(500)(("hot", 1.5)) // hot key
      val df = rows.toDF("key", "v")
        .withColumn("v", col("v").cast("decimal(18,4)"))
      val plain = df.groupBy("key").agg(sum(col("v")).as("s"))
        .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
      val salted = Skew.saltedSum(df, "key", "v", salts = 7)
        .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
      assert(salted.keySet == plain.keySet, s"seed=$seed")
      salted.foreach { case (k, v) =>
        assert(v.compareTo(plain(k)) == 0, s"seed=$seed key=$k $v != ${plain(k)}")
      }
    }
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("k9001", "A"), ("k9500", "B")).toDF("key", "name")
    val plain = skewed.join(dim, "key").groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "key", salts = 8)
      .groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 9000L)
  }
}
