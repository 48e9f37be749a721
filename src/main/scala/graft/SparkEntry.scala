package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{AnalyticsQueries, DedupQueries, GraphQueries, Medallion,
  MedallionQueries, OperatorQueries, PipelineQueries, SimilarityQueries, Tables,
  TextQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from per-area registries; each
  * query is a deterministic DataFrame whose DuckDB oracle (same column
  * names, same ORDER BY, same value types/rounding) the driver
  * hash-compares at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's semantic heart: silver casts → gold fact build
    * (join + status gate + datediff) → order-grain-then-global KPI rollup
    * (reference `dashboard/queries.py:15-35`).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    graft.engine.Analytics.kpis(
      Medallion.factSales(
        Medallion.silverOrders(Tables.orders(spark, d)),
        Medallion.silverLineitem(Tables.lineitem(spark, d))),
      Medallion.dimCustomer(
        Tables.customer(spark, d), Tables.nation(spark, d), Tables.region(spark, d)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MedallionQueries.queries ++
      AnalyticsQueries.queries ++
      OperatorQueries.queries ++
      DedupQueries.queries ++
      TextQueries.queries ++
      SimilarityQueries.queries ++
      PipelineQueries.queries ++
      TpchQueries.queries ++
      GraphQueries.queries ++
      graft.streaming.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Two registry entries are INTENTIONALLY absent here and land in
    * CORRECTNESS as `no_oracle` — approximate sketches whose answers
    * depend on engine-internal state (Greenwald-Khanna summaries; merge-
    * order-dependent Misra-Gries evictions), each with an oracle-checked
    * EXACT-REGIME twin that pins the same code path:
    *   - x04_approx_percentiles (GK quantile sketch) → twin o35_percentiles
    *   - x05_heavy_hitters     (Misra-Gries)        → twin o44_heavyhitters_exact
    * Their error bounds vs the exact answers are property-tested in
    * PercentileSpec / SketchSpec. `no_oracle` here means "checked by a
    * stronger pairing than row hashes", not "unchecked". (x03's KMV
    * estimate used to be in this list, but the estimate is a
    * deterministic function of the bottom-k portable hashes, so since
    * round 10 the oracle recomputes it exactly — see
    * PipelineQueries.oracles.)
    */
  def oracleSql: Map[String, String] =
    MedallionQueries.oracles ++
      AnalyticsQueries.oracles ++
      OperatorQueries.oracles ++
      DedupQueries.oracles ++
      TextQueries.oracles ++
      SimilarityQueries.oracles ++
      PipelineQueries.oracles ++
      TpchQueries.oracles ++
      GraphQueries.oracles ++
      graft.streaming.StreamingQueries.oracles
}
