package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.engine.{Incremental, Landing}

class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write a tiny sfDir-shaped source: 4 orders across 2 years + items. */
  private def writeSource(dir: String, extraOrder: Boolean = false): Unit = {
    val baseOrders = Seq(
      (1L, 10L, "F", 100.0, ts("1995-03-01 00:00:00"), "1-URGENT"),
      (2L, 11L, "O", 200.0, ts("1995-07-01 00:00:00"), "2-HIGH"),
      (3L, 10L, "F", 300.0, ts("1996-01-01 00:00:00"), "3-MEDIUM"),
      (4L, 12L, "P", 400.0, ts("1996-06-01 00:00:00"), "1-URGENT"))
    val orders = if (extraOrder)
      baseOrders :+ (5L, 11L, "F", 500.0, ts("1996-09-01 00:00:00"), "2-HIGH")
    else baseOrders
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 1, 100L, 10.0), (1L, 2, 101L, 20.0),
      (2L, 1, 100L, 30.0), (3L, 1, 102L, 40.0),
      (4L, 1, 100L, 50.0), (5L, 1, 101L, 60.0)) // item for order 5 pre-exists
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, "A"), (11L, "B"), (12L, "C")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((100L, "p1"), (101L, "p2"), (102L, "p3")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
  }

  test("incremental runs: exactly-once, idempotent, fingerprint-skipped, dim-replaced") {
    val src = TestSpark.tmpDir("inc-src")
    val root = TestSpark.tmpDir("inc-root")
    writeSource(src)
    Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy")

    // run 1: everything inserted exactly once
    val run1 = Incremental.run(spark, s"$root/landing", s"$root/bronze")
    val r1 = run1.map(e => e.file_name -> e).toMap
    assert(r1("orders_1995").status == "OK" && r1("orders_1995").rows_orders == 2)
    assert(r1("orders_1996").rows_orders == 2 && r1("orders_1996").rows_items == 2)
    assert(r1("orders_1995").rows_items == 3)
    assert(r1("customer_full").status == "OK" && r1("customer_full").rows_orders == 3)

    // item of order 5 must NOT be loaded: order 5 doesn't exist yet (J7)
    val items1 = spark.read.parquet(s"$root/bronze/lineitem")
    assert(items1.count() == 5)
    assert(items1.filter("l_orderkey = 5").count() == 0)

    // run 2: pure no-op — every file fingerprint-skipped
    val run2 = Incremental.run(spark, s"$root/landing", s"$root/bronze")
    assert(run2.forall(e => e.status == "SKIP" && e.rows_orders == 0 && e.rows_items == 0))
    assert(spark.read.parquet(s"$root/bronze/orders").count() == 4)
    assert(items1.count() == 5)

    // no duplicate keys anywhere
    val orders = spark.read.parquet(s"$root/bronze/orders")
    assert(orders.select("o_orderkey").distinct().count() == orders.count())
    val items = spark.read.parquet(s"$root/bronze/lineitem")
    assert(items.select("l_orderkey", "l_linenumber").distinct().count() == items.count())

    // changed data: add order 5 (1996) → only the 1996 file reprocesses,
    // only the delta appends, and order 5's item arrives with it
    writeSource(src, extraOrder = true)
    Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy")
    val run3 = Incremental.run(spark, s"$root/landing", s"$root/bronze")
    val r3 = run3.map(e => e.file_name -> e).toMap
    assert(r3("orders_1995").status == "SKIP", "unchanged 1995 file must be skipped")
    assert(r3("orders_1996").status == "OK" && r3("orders_1996").rows_orders == 1)
    assert(r3("orders_1996").rows_items == 1)
    assert(spark.read.parquet(s"$root/bronze/orders").count() == 5)
    assert(spark.read.parquet(s"$root/bronze/lineitem").count() == 6)

    // tech log: upserted per file; note repair (S11) rewrites SKIP notes
    Incremental.normalizeTechLog(spark, s"$root/bronze")
    val log = Incremental.readTechLog(spark, s"$root/bronze").map(e => e.file_name -> e).toMap
    assert(log("orders_1995").note == "unchanged")
    assert(log("orders_1996").note.startsWith("OK:"))
  }

  test("monthly-grain landing produces the same bronze as yearly-grain") {
    val src = TestSpark.tmpDir("inc-month-src")
    val root = TestSpark.tmpDir("inc-month-root")
    writeSource(src)
    Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy-MM")
    val run1 = Incremental.run(spark, s"$root/landing", s"$root/bronze")
    assert(run1.count(_.file_name.startsWith("orders_")) == 4) // 4 distinct months
    assert(run1.filter(_.file_name.startsWith("orders_")).map(_.rows_orders).sum == 4)
    assert(spark.read.parquet(s"$root/bronze/orders").count() == 4)
    assert(spark.read.parquet(s"$root/bronze/lineitem").count() == 5)
    val run2 = Incremental.run(spark, s"$root/landing", s"$root/bronze")
    assert(run2.forall(_.status == "SKIP"))

    // mid-stream NEW MONTH: order 5 lands in 1996-09, a period file that
    // didn't exist before — every prior month must fingerprint-SKIP, the
    // new month alone appends, and order 5's pre-existing item (J7-held
    // until now) arrives with it
    writeSource(src, extraOrder = true)
    Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy-MM")
    val run3 = Incremental.run(spark, s"$root/landing", s"$root/bronze")
    val r3 = run3.map(e => e.file_name -> e).toMap
    assert(r3.contains("orders_1996-09"), "new month must appear in the manifest")
    assert(r3("orders_1996-09").status == "OK" &&
      r3("orders_1996-09").rows_orders == 1 && r3("orders_1996-09").rows_items == 1)
    assert(run3.filter(e => e.file_name.startsWith("orders_") &&
      e.file_name != "orders_1996-09").forall(_.status == "SKIP"),
      "all pre-existing months must be fingerprint-skipped")
    assert(spark.read.parquet(s"$root/bronze/orders").count() == 5)
    assert(spark.read.parquet(s"$root/bronze/lineitem").count() == 6)
  }

  test("rerun converges after a crash between the item and order appends") {
    val src = TestSpark.tmpDir("inc-crash-src")
    val root = TestSpark.tmpDir("inc-crash-root")
    writeSource(src)
    Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy")
    // simulate the crash window: orders_1995's items already appended,
    // its orders not, and no log entry written
    spark.read.parquet(s"$root/landing/lineitem")
      .filter("period = '1995'")
      .write.mode("append").partitionBy("period")
      .parquet(s"$root/bronze/lineitem")
    val run1 = Incremental.run(spark, s"$root/landing", s"$root/bronze")
    val r1 = run1.map(e => e.file_name -> e).toMap
    assert(r1("orders_1995").rows_orders == 2)
    assert(r1("orders_1995").rows_items == 0, "pre-appended items must dedup, not duplicate")
    val orders = spark.read.parquet(s"$root/bronze/orders")
    val items = spark.read.parquet(s"$root/bronze/lineitem")
    assert(orders.count() == 4)
    assert(items.count() == 5)
    assert(items.select("l_orderkey", "l_linenumber").distinct().count() == 5)
  }

  test("payload-only change re-fingerprints and reprocesses, but stays insert-only") {
    val src = TestSpark.tmpDir("inc-upd-src")
    val root = TestSpark.tmpDir("inc-upd-root")
    writeSource(src)
    Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy")
    Incremental.run(spark, s"$root/landing", s"$root/bronze")

    // correct order 1's o_totalprice — same keys, same row count, so the
    // old id-only fingerprint would collide and silently SKIP the file
    Seq(
      (1L, 10L, "F", 999.0, ts("1995-03-01 00:00:00"), "1-URGENT"),
      (2L, 11L, "O", 200.0, ts("1995-07-01 00:00:00"), "2-HIGH"),
      (3L, 10L, "F", 300.0, ts("1996-01-01 00:00:00"), "3-MEDIUM"),
      (4L, 12L, "P", 400.0, ts("1996-06-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$src/orders.parquet")
    Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy")
    val run2 = Incremental.run(spark, s"$root/landing", s"$root/bronze")
    val r2 = run2.map(e => e.file_name -> e).toMap
    assert(r2("orders_1995").status == "OK",
      "content change must invalidate the fingerprint skip")
    assert(r2("orders_1995").rows_orders == 0,
      "insert-only: no new keys, nothing appended")
    assert(r2("orders_1996").status == "SKIP", "untouched file stays skipped")
    val price = spark.read.parquet(s"$root/bronze/orders")
      .filter("o_orderkey = 1").select("o_totalprice").as[Double].head()
    assert(price == 100.0,
      "insert-only contract: existing row's payload is NOT updated in place")
  }

  test("quality gate aborts the file on bad input before any write") {
    val src = TestSpark.tmpDir("inc-bad-src")
    val root = TestSpark.tmpDir("inc-bad-root")
    Seq((Option.empty[Long], Some(10L), "F", 1.0, ts("1995-01-01 00:00:00"), "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$src/orders.parquet")
    Seq((1L, 1, 100L, 10.0))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$src/lineitem.parquet")
    Seq((10L, "A")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$src/customer.parquet")
    Seq((100L, "p1")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$src/part.parquet")
    Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy")
    intercept[graft.engine.Quality.QualityGateException] {
      Incremental.run(spark, s"$root/landing", s"$root/bronze")
    }
    assert(!new java.io.File(s"$root/bronze/orders").exists(),
      "fail-fast: nothing may be written for a gated file")
  }

  test("explode fails loudly on an EMPTY orders table (no 0-anchored grain)") {
    // On empty input min/max(year) are null, and getAs[Int] unboxes
    // null to 0 silently — without the NonEmpty gate explode would
    // proceed with a year-0-anchored bucket grain instead of failing
    // at the landing boundary like a null date does (r18 advice).
    val src = TestSpark.tmpDir("inc-empty-src")
    val root = TestSpark.tmpDir("inc-empty-root")
    Seq.empty[(Long, Long, String, Double, Timestamp, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$src/orders.parquet")
    val e = intercept[graft.engine.Quality.QualityGateException] {
      Landing.explode(spark, src, s"$root/landing", periodFmt = "yyyy")
    }
    assert(e.getMessage.contains("non_empty") || e.getMessage.toLowerCase.contains("empty"),
      s"gate must name the NonEmpty violation, got: ${e.getMessage}")
    assert(!new java.io.File(s"$root/landing").exists(),
      "fail-fast: an empty ingest must write no landing files")
  }
}
