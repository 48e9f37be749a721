package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Bucketing

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucket-aligned fact ⋈ dim joins without any shuffle Exchange") {
    val (factT, dimT) = Bucketing.bucketedStar(spark, "/root/testdata/sf0.001", buckets = 4)
    // force the shuffle-join path (disable broadcast) to expose bucketing;
    // restore the PRIOR value (not a hardcoded default) because the
    // session is shared across suites
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(factT).join(spark.table(dimT), "customer_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free, got plan:\n$plan")
      // and it still computes the right thing
      val viaBuckets = joined.count()
      val viaPlain = graft.engine.Gold.fact(spark, "/root/testdata/sf0.001")
        .join(graft.engine.Gold.dimCustomer(spark, "/root/testdata/sf0.001")
          .withColumnRenamed("c_custkey", "customer_id"), "customer_id")
        .count()
      assert(viaBuckets == viaPlain)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
  }
}
