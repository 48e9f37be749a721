package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

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

  /** SHUFFLE exchanges only. `Exchange` would also match
    * `BroadcastExchangeExec` — and a broadcast hash join preserves the
    * streamed side's partitioning, so a single-split corpus
    * broadcast-joined to a dim would carry an Exchange yet still execute
    * at one partition. `ShuffleQueryStageExec` covers plans AQE has
    * already begun compiling into stages.
    */
  private def hasShuffle(plan: SparkPlan): Boolean = plan.exists {
    case _: ShuffleExchangeLike | _: ShuffleQueryStageExec => true
    case _                                                 => false
  }

  /** Partition count the rows ABOVE the last exchange are planned to run
    * at, read without executing anything. `outputPartitioning` propagates
    * bottom-up (a Filter/Project above a shuffle reports the shuffle's
    * partitioning; a `coalesce` above it reports the coalesced count; an
    * AQE shuffle-read that has already coalesced at runtime reports the
    * REAL post-coalesce count), so the root's number is the honest
    * answer wherever it is defined. File scans report
    * `UnknownPartitioning(0)` — then fall back to the topmost shuffle's
    * target count (`collectFirst` is pre-order ⇒ topmost).
    */
  private def plannedOutputPartitions(plan: SparkPlan): Int = {
    val atRoot = plan.outputPartitioning.numPartitions
    if (atRoot > 0) atRoot
    else plan.collectFirst { case s: ShuffleExchangeLike => s.numPartitions }.getOrElse(0)
  }

  /** Round-robin `df` across `defaultParallelism` partitions IFF it is
    * not already at least that parallel. The probe reads the PLANNED
    * physical partitioning, not file counts — a few huge parquet files
    * are split into many partitions by the scan planner (a file-count
    * probe would full-shuffle them for nothing), and a coalesced
    * file-backed frame really is serialized however many files back it
    * (a file-count probe would wave it through).
    *
    *  - plan contains a shuffle Exchange → accept iff its planned output
    *    partition count reaches parallelism. This engine sizes
    *    `spark.sql.shuffle.partitions` to the cluster, so the normal
    *    answer is yes — and reading the plan (not `df.rdd`) keeps the
    *    probe from materializing query stages: `df.rdd` on a
    *    shuffle-bearing adaptive plan would EXECUTE the shuffle.
    *    Residual blind spot, accepted and documented: AQE partition
    *    coalescing (`parallelismFirst=true` by default) can fold a
    *    byte-tiny stage below parallelism at runtime — but only when the
    *    stage carries under `parallelism × minPartitionSize` (~1 MiB per
    *    slot) of shuffle bytes, and for a shuffle that small the
    *    re-spread this gate would buy costs more than it saves. Call
    *    sites feed raw scans, so this branch is a conservative guard,
    *    not the primary path.
    *  - shuffle-free plan (including broadcast-bearing ones) →
    *    `df.rdd.getNumPartitions` is exact (file splits, coalesce, local
    *    relations all accounted). With no shuffle there is no expensive
    *    stage to materialize; a broadcast-bearing plan may build its
    *    broadcast side here, which is bounded-small by this engine's own
    *    plan audit (PlanAuditSpec's nested-loop/broadcast invariants).
    */
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val plan = unwrap(df.queryExecution.executedPlan)
    val enough =
      if (hasShuffle(plan)) plannedOutputPartitions(plan) >= p
      else df.rdd.getNumPartitions >= p
    if (enough) df else df.repartition(p)
  }
}
