package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract registry for graph operators ([[Graph]]).
  * The dedup-cluster graph op (connected components) is registered with
  * its consumer in [[DedupQueries]] (o54); here live the standalone
  * graph analytics.
  */
object GraphQueries {
  import Tables._

  /** Undirected part↔supplier bipartite edges from lineitem, encoded in
    * one long node space (part = 2·partkey, supplier = 2·suppkey + 1).
    * DISTINCT first: the raw fact table repeats a (part, supplier) lane
    * per order line, and edge multiplicity would both skew the rank and
    * blow the join — the distinct is the map-side-combined dedup any
    * 100 TB edge extraction starts with.
    */
  private def partSupplierEdges(s: SparkSession, d: String): DataFrame = {
    val e0 = lineitem(s, d)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    e0.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 5-round fixed-point PageRank on the part↔supplier graph: which
    // parts/suppliers sit at the densest sourcing crossroads. Longs in
    // millionths end-to-end (see Graph.pagerankFixedPoint's determinism
    // contract) — the oracle unrolls the same 5 integer-exact rounds in
    // SQL and must match hash-exactly. Top-100 via TakeOrderedAndProject.
    "o70_pagerank" -> ((s, d) =>
      Graph.pagerankFixedPoint(partSupplierEdges(s, d), iterations = 5)
        .select(
          when(pmod(col("node"), lit(2)) === 0, "part").otherwise("supplier").as("kind"),
          expr("node div 2").cast("long").as("key"),
          col("rank"), col("node"))
        .orderBy(col("rank").desc, col("kind"), col("key"))
        .limit(100)
        .select(col("kind"), col("key"), col("rank")))
  )

  def oracles: Map[String, String] = {
    // one synchronous integer-exact round, parameterized on the previous
    // round's CTE name — unrolled because recursive CTEs (Postgres rule,
    // DuckDB same) disallow aggregation in the recursive term.
    // Every CTE is AS MATERIALIZED: DuckDB inlines single-use CTEs, so
    // the un-hinted 5-round chain plans as one 5-deep join pipeline
    // whose working set at sf10 exhausted 37 GB of spill temp (the r15
    // sweep's one undecidable row). Materialized-only was still not
    // enough at sf10 (r16's 552 s decayed past even a 2400 s solo
    // budget after the r17 layout change + host slowdown), so each
    // round now mirrors the Spark side's shape exactly (round 20):
    // a |V|-row contribution frame c_i = rank // deg is materialized
    // FIRST via the small node⋈node join, so the |E|-row pass is a
    // single join+agg instead of a 3-way join — and every rank is
    // CAST back to BIGINT per round, because DuckDB widens
    // SUM(BIGINT) to HUGEINT and the un-cast chain dragged 16-byte
    // ranks through all five |E|-row aggregations. Exact: total rank
    // mass is |V|·1.5e6 ≲ 2^42, ×85 still ≪ 2^63, so the BIGINT
    // round-trip loses nothing (same longs the Spark side carries).
    def round(prev: String, cur: String): String =
      s"""c$cur AS MATERIALIZED (
         |  SELECT deg.src AS src, CAST($prev.rank // deg.deg AS BIGINT) AS c
         |  FROM deg JOIN $prev ON $prev.node = deg.src),
         |$cur AS MATERIALIZED (
         |  SELECT ed.dst AS node,
         |         CAST(150000 + (85 * CAST(SUM(c) AS BIGINT)) // 100 AS BIGINT) AS rank
         |  FROM ed JOIN c$cur USING (src)
         |  GROUP BY ed.dst)""".stripMargin
    Map(
      "o70_pagerank" ->
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b FROM lineitem),
           |ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0),
           |deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM ed GROUP BY src),
           |r0 AS MATERIALIZED (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
           |${round("r0", "r1")},
           |${round("r1", "r2")},
           |${round("r2", "r3")},
           |${round("r3", "r4")},
           |${round("r4", "r5")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
           |       CAST(node // 2 AS BIGINT) AS key, CAST(rank AS BIGINT) AS rank
           |FROM r5
           |ORDER BY rank DESC, kind, key LIMIT 100""".stripMargin
    )
  }
}
