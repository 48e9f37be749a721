package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H-shape analytical queries over the testdata star —
  * beyond the reference's 7 dashboard queries, these are the canonical
  * OLAP shapes any user of an analytics engine reaches for: the Q1
  * pricing summary (wide multi-aggregate scan), Q6 predicate-heavy
  * single-pass revenue delta, and Q3 segment-filtered join + top-k.
  * All scan-dominant: filters push to parquet, aggregates are one
  * partial+final shuffle, top-k plans as TakeOrderedAndProject.
  */
object TpchQueries {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1: pricing summary report
    "t01_pricing_summary" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q6: forecast revenue change (predicate-heavy single pass)
    "t02_revenue_delta" -> ((s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1996-01-01")) &&
            col("l_discount").between(0.03, 0.05) &&
            col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))),

    // Q3: shipping-priority top-10 orders for one market segment
    "t03_shipping_priority" -> ((s, d) =>
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01")))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10))
  )

  def oracles: Map[String, String] = Map(
    "t01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       ROUND(AVG(l_quantity), 2) AS avg_qty,
        |       ROUND(AVG(l_discount), 4) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "t02_revenue_delta" ->
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1995-01-01'
        |  AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.05
        |  AND l_quantity < 24""".stripMargin,

    "t03_shipping_priority" ->
      """SELECT l.l_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
        |       o.o_orderpriority,
        |       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND CAST(o.o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-01-01'
        |  AND CAST(l.l_shipdate AS TIMESTAMP) > TIMESTAMP '1997-01-01'
        |GROUP BY l.l_orderkey, CAST(o.o_orderdate AS TIMESTAMP), o.o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  )
}
