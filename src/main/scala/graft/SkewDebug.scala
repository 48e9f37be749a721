package org.apache.spark.sql.execution.adaptive

import org.apache.spark.MapOutputTrackerMaster
import org.apache.spark.SparkEnv

/** Debug-only bridge into Spark's package-private skew-split machinery,
  * used by [[graft.SkewProbe]] under SKEW_DEBUG to print WHY
  * OptimizeSkewedJoin did or didn't split a partition (per-mapper block
  * sizes are otherwise invisible outside this package).
  */
object SkewDebugBridge {

  def mapSizesForReduceId(shuffleId: Int, reduceId: Int): Array[Long] = {
    val tracker = SparkEnv.get.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    tracker.shuffleStatuses(shuffleId).withMapStatuses(
      _.map(s => if (s == null) -1L else s.getSizeForBlock(reduceId)))
  }

  def split(sizes: Array[Long], target: Long, smallFactor: Double = 0.2): Array[Int] =
    ShufflePartitionsUtil.splitSizeListByTargetSize(sizes, target, smallFactor)

  def shuffleIds(): Seq[Int] = {
    val tracker = SparkEnv.get.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    tracker.shuffleStatuses.keys.toSeq.sorted
  }
}
