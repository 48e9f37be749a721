package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized medallion layers (the reference's CTAS persistence —
  * `etl/tasks/silver.py:29-62`, `etl/tasks/gold.py:12-65` — SURVEY §2.1
  * S5/S6): silver + gold are written to parquet ONCE per (JVM, sfDir) and
  * every analytics/SQL query reads the written layer back instead of
  * re-deriving it from base scans.
  *
  * Scale posture: this is the single biggest 100 TB lever in the repo —
  * the orders⋈lineitem fact shuffle happens once per pipeline run, not
  * once per query. The fact is partitioned by `order_month`
  * (reference landing zone `scripts/esplosione_dati.py:135-154`), so any
  * query filtering on month gets partition pruning; `repartition` by the
  * partition column + a bounded hash salt before the write keeps file
  * count at ≤[[writeFanout]] per month (instead of tasks × months) while
  * still writing each month from multiple tasks in parallel.
  */
object Gold {

  /** Write-side fan-out CAP per hive partition: each partition value
    * lands in up to this many tasks/files. Sized small here (local[32],
    * sf≤0.1); on a real cluster size it to executor-count /
    * distinct-partitions so the hottest partition saturates the cluster
    * without file explosion.
    */
  val writeFanout = 4

  /** Rows above which a hive partition earns a second writer task. The
    * fan-out exists to parallelize HOT partitions; a partition below
    * this floor is one comfortably-sized file, and salting it anyway
    * just multiplies tiny files (round 17: the time-shifted rehearsal
    * has factor× more, proportionally smaller months — 790 at sf1 —
    * and a fixed 4-way salt turned them into 3 160 files, visible as
    * +2 s on every fact-reading query and 8× slower layer setup).
    */
  val fanoutRowFloor = 250000L

  /** Fan-out for a table of `rows` spread over ~`partitions` hive
    * partitions: 1 until the average partition clears
    * [[fanoutRowFloor]], then one extra writer per floor-multiple, capped
    * at [[writeFanout]]. At 100 TB (billions of rows per month) this
    * saturates the cap; on a small-or-long-history corpus it collapses
    * to one right-sized file per partition.
    */
  def adaptiveFanout(rows: Long, partitions: Long): Int =
    math.max(1L, math.min(writeFanout.toLong,
      rows / math.max(1L, partitions) / fanoutRowFloor + 1)).toInt

  /** The one salted partitioned-write shape (used by the gold fact and
    * both landing splits, asserted in GoldSpec): pure
    * `repartition(partCol)` serializes each hive partition through ONE
    * task — at 100 TB a hot partition is a write bottleneck. Hash-salting
    * on the row key fans every partition across up to `fanout`
    * tasks while keeping file count bounded at fanout-per-partition
    * (vs tasks x partitions unsalted).
    */
  def saltedPartitionedWrite(df: DataFrame, partCol: String,
                             saltKey: Column, dir: String,
                             fanout: Int = writeFanout): Unit = {
    val repart =
      if (fanout <= 1) df.repartition(col(partCol))
      else df.repartition(col(partCol), pmod(hash(saltKey), lit(fanout)))
    repart.write.mode("overwrite").partitionBy(partCol).parquet(dir)
  }

  /** Write silver + gold parquet for sfDir if this JVM hasn't yet; returns
    * the layer root (under the build dir, never the read-only testdata).
    * Thread-safe; runs at most once per (JVM, sfDir).
    */
  def ensure(spark: SparkSession, sfDir: String): String =
    Workdirs.materializeOnce("graft-layers", sfDir) { dir =>
      import scala.concurrent.Future
      import scala.concurrent.ExecutionContext.Implicits.global
      // fail-fast quality gate between bronze and silver (§2.11): one
      // aggregation pass per table; a violation aborts the whole
      // materialization before anything is written. The gated silvers
      // are cached — each feeds its own write AND the fact build.
      val so = Quality.gate(
        Medallion.silverOrders(Tables.orders(spark, sfDir)), Quality.orderChecks)
        .persist()
      val sl = Quality.gate(
        Medallion.silverLineitem(Tables.lineitem(spark, sfDir)), Quality.lineitemChecks)
        .persist()
      // the gold fact's money columns are DECIMAL(18,4) ON DISK (round
      // 16): exactness becomes a property of the schema instead of a
      // per-query cast convention — every downstream money aggregate is
      // association-order-free by construction, and a new consumer
      // cannot reintroduce the SUM(double) drift class by forgetting a
      // cast. Values are unchanged: price carries ≤2 decimals (exact in
      // DECIMAL(18,4) both ways), and freight's double product is
      // canonicalized to its exact ≤4-decimal value (the t01 disc_price
      // argument; the oracle factSql applies the same canonicalization).
      val fact = Medallion.factSales(so, sl)
        .withColumn("price",
          col("price").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .withColumn("freight_value",
          col("freight_value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .withColumn("order_month",
          date_format(col("order_purchase_timestamp"), "yyyy-MM"))
      // size the fact's per-month fan-out from the data (one cheap agg
      // pass over the CACHED silvers, which warms them for the writes
      // below): lineitem count over distinct order months upper-bounds
      // rows-per-month, so hot months fan out and tiny months don't
      // shatter into salt-files
      val factFanout = adaptiveFanout(
        sl.count(),
        math.max(1L, so.agg(countDistinct(
          date_format(col("o_orderdate"), "yyyy-MM"))).head.getLong(0)))
      // the six layer writes are independent of each other — submit them
      // as concurrent Spark jobs (FIFO-scheduled over the same executor
      // pool) instead of serially leaving the cluster idle between
      // write barriers; driver threads are a standard way to overlap
      // independent jobs in one session
      val writes = Seq(
        Future(so.write.mode("overwrite").parquet(s"$dir/silver_orders")),
        Future(sl.write.mode("overwrite").parquet(s"$dir/silver_lineitem")),
        Future(saltedPartitionedWrite(fact, "order_month", col("order_id"),
          s"$dir/fact_sales", factFanout)),
        Future(Medallion.dimCustomer(
            Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
            Tables.region(spark, sfDir))
          .write.mode("overwrite").parquet(s"$dir/dim_customers")),
        Future(Medallion.dimPart(Tables.part(spark, sfDir))
          .write.mode("overwrite").parquet(s"$dir/dim_products")),
        Future(Medallion.dimDate(Tables.orders(spark, sfDir))
          .write.mode("overwrite").parquet(s"$dir/dim_time")))
      // settle ALL futures before propagating a failure: rethrowing on
      // the first error while sibling writes are still running would let
      // a retry start a second overwrite of the same paths concurrently
      // with the stragglers of the failed attempt
      try Workdirs.settleAll(writes)
      finally { so.unpersist(); sl.unpersist() }
    }

  def silverOrders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/silver_orders")

  def silverLineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/silver_lineitem")

  /** Gold fact in the canonical column order of [[Medallion.factSales]]
    * (the `order_month` partition column stays available for pruning but
    * is projected away here so downstream schemas are unchanged).
    *
    * Money columns read back as DOUBLE for the legacy consumer surface:
    * the on-disk schema is DECIMAL(18,4) (see [[ensure]]) and the
    * decimal→double conversion is exact for ≤4-decimal money values, so
    * every pre-round-16 consumer sees bit-identical doubles. Consumers
    * that aggregate money should prefer [[factDecimal]] and skip the
    * double detour entirely.
    */
  def fact(spark: SparkSession, sfDir: String): DataFrame =
    factDecimal(spark, sfDir)
      .withColumn("price", col("price").cast("double"))
      .withColumn("freight_value", col("freight_value").cast("double"))

  /** Gold fact with its NATIVE decimal money schema (price and
    * freight_value as DECIMAL(18,4)) — the end-to-end exact-money
    * surface: silver → gold → aggregate without any floating-point
    * representation in between.
    */
  def factDecimal(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/fact_sales")
      .select("order_id", "line_id", "customer_id", "product_id", "price",
        "freight_value", "order_purchase_timestamp", "delivery_time_days")

  def dimCustomer(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/dim_customers")

  def dimPart(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/dim_products")

  def dimDate(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/dim_time")
}
