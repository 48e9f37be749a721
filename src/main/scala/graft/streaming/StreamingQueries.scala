package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registry for the streaming surface. s01 runs a REAL
  * Structured Streaming query (file source → watermark → windowed agg →
  * memory sink, `Trigger.AvailableNow`) to completion; in Complete mode
  * the sink equals the batch computation, so the entry is exactly
  * oracle-checkable (same SQL as the batch twin o17).
  */
object StreamingQueries {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_streaming_hourly" -> ((s, d) => {
      val sink = s"graft_s01_sink_${counter.incrementAndGet()}"
      Streaming.runAvailableNow(
        Streaming.hourlyAgg(Streaming.eventsStream(s, d)), sink)
        .orderBy("hour")
    })
  )

  def oracles: Map[String, String] = Map(
    "s01_streaming_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin
  )
}
