package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** Shared parallelism probe for compute-bound per-row stages (hashing,
  * regex tokenization, vector folds): a small parquet corpus arrives as
  * ONE split, which would serialize the hot loop onto one core — but an
  * unconditional `repartition` is a full shuffle of every byte, which at
  * 100 TB is pure waste on an input that is already many splits. So the
  * spread is GATED: shuffle only when the input is planned below the
  * cluster's parallelism.
  */
object Spread {

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Round-robin `df` across `defaultParallelism` partitions IFF it is
    * not already at least that parallel. The probe reads the PLANNED
    * physical partitioning, not file counts — a few huge parquet files
    * are split into many partitions by the scan planner (a file-count
    * probe would full-shuffle them for nothing), and a coalesced
    * file-backed frame really is serialized however many files back it
    * (a file-count probe would wave it through).
    *
    *  - plan contains a shuffle Exchange → its partition count is the
    *    session's `spark.sql.shuffle.partitions`, which this engine
    *    sizes to the cluster: already parallel, identity. (This also
    *    keeps the probe from materializing query stages: `df.rdd` on a
    *    shuffle-bearing adaptive plan would EXECUTE the shuffle.)
    *  - shuffle-free plan → `df.rdd.getNumPartitions` is exact (file
    *    splits, coalesce, local relations all accounted) and runs no
    *    job: with no exchange there is no query stage to materialize,
    *    only plan-to-RDD conversion.
    */
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val plan = unwrap(df.queryExecution.executedPlan)
    val hasExchange = plan.exists(_.isInstanceOf[Exchange])
    val enough = hasExchange || df.rdd.getNumPartitions >= p
    if (enough) df else df.repartition(p)
  }
}
