package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Per-stage metrics probe for scale attribution:
  * `runMain graft.StageProbe <sfDir> <query ...>`.
  *
  * The sf1→sf10 bench ratio alone cannot distinguish the two readings of
  * a superlinear row — fixed per-query overhead amortizing away (benign:
  * the ratio flattens at the next decade) versus a shuffle or sort whose
  * cost genuinely grows faster than the data (compounds at the next
  * decade). The executed evidence lives in stage metrics: this runs each
  * named registry query with a listener and prints, per stage, executor
  * run time, input/shuffle-read/shuffle-write bytes and records, and
  * memory/disk spill. Run it at two scales and compare column-by-column:
  * linear bytes + superlinear time = sort/spill pressure; superlinear
  * bytes = a join or grouping whose key structure densifies with scale
  * (fix the keying); flat everything + big wall gap = driver/plan
  * overhead (benign).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProbe <sfDir> <query ...>")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, name: String, tasks: Int, runMs: Long,
                  inB: Long, inRec: Long, srB: Long, srRec: Long,
                  swB: Long, swRec: Long, memSpill: Long, diskSpill: Long)
    val stages = ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.numTasks, m.executorRunTime,
            m.inputMetrics.bytesRead, m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten,
            m.memoryBytesSpilled, m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.drop(1).foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"$n: unknown query")
        case Some(fn) =>
          stages.synchronized(stages.clear())
          val t0 = System.nanoTime()
          // drain through the noop v2 sink, EXACTLY like Bench: .count()
          // over a query ending in a global aggregate lets Catalyst prune
          // the aggregate's inputs (1 row regardless), deleting the very
          // windows/shuffles this probe exists to measure (observed on
          // o74: count() measured a bare scan, noop the real funnel)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          val rows = -1L // noop reports no count; row counts live in Verify
          // listener events are posted asynchronously, and after a LARGE
          // job the bus can lag well past any fixed beat — exactly where
          // this probe matters most. Poll until the buffer is stable
          // across two consecutive reads (bounded at 30 s so a wedged bus
          // can't hang the probe; a one-shot 500 ms sleep under-counted
          // stages on big queries).
          var seen = -1
          var stable = stages.synchronized(stages.size)
          val deadline = System.nanoTime() + 30L * 1000000000L
          while (seen != stable && System.nanoTime() < deadline) {
            seen = stable
            Thread.sleep(250)
            stable = stages.synchronized(stages.size)
          }
          println(f"\n==== $n: $rows rows in $sec%.2f s ($sfDir) ====")
          println(f"${"stage"}%-7s${"tasks"}%6s${"run_s"}%9s${"in_MB"}%9s" +
            f"${"in_rec"}%12s${"sr_MB"}%9s${"sr_rec"}%12s${"sw_MB"}%9s" +
            f"${"sw_rec"}%12s${"spill_MB"}%10s  name")
          val snap = stages.synchronized(stages.sortBy(_.id).toVector)
          snap.foreach { s =>
            println(f"${s.id}%-7d${s.tasks}%6d${s.runMs / 1e3}%9.2f" +
              f"${s.inB / 1e6}%9.1f${s.inRec}%12d${s.srB / 1e6}%9.1f" +
              f"${s.srRec}%12d${s.swB / 1e6}%9.1f${s.swRec}%12d" +
              f"${(s.memSpill + s.diskSpill) / 1e6}%10.1f  ${s.name}")
          }
          val tot = snap.foldLeft((0L, 0L, 0L, 0L)) { case ((r, sr, sw, sp), s) =>
            (r + s.runMs, sr + s.srB, sw + s.swB, sp + s.memSpill + s.diskSpill)
          }
          println(f"TOTAL   run=${tot._1 / 1e3}%.2f s  shuffle_read=${tot._2 / 1e6}%.1f MB" +
            f"  shuffle_write=${tot._3 / 1e6}%.1f MB  spill=${tot._4 / 1e6}%.1f MB")
      }
    }
    spark.stop()
  }
}
