package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi-key — `point ∈ [start, end]` —
  * composed scale-safely by BINNING the time axis: each interval is
  * exploded onto the fixed-width bins it covers, each point lands in
  * exactly ONE bin, and the join becomes an equi-join on the bin id
  * followed by the exact range predicate. Because a point has a unique
  * bin, no dedup pass is needed.
  *
  * Scale posture: turns the nested-loop/cartesian a naive range join
  * plans into one shuffle on bin id; bin width trades replication of
  * intervals (ceil(len/width)+1 copies) against bucket density. This is
  * the standard trick interval-join engines bake in.
  */
object RangeJoin {

  /** Join `points` to `intervals` where
    * `points.tsCol BETWEEN intervals.startCol AND intervals.endCol`
    * (inclusive both ends). Output: point columns + interval columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      binWidthDays: Int = 7): DataFrame = {
    val width = binWidthDays * 86400L
    def bin(c: Column): Column = floor(unix_timestamp(c) / width)
    val binnedIntervals = intervals
      .withColumn("__bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val binnedPoints = points.withColumn("__bin", bin(col(tsCol)))
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
