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
    }),

    // streaming exact dedup: the same source unioned with itself doubles
    // every event; keyed dropDuplicates state collapses them back, so the
    // downstream aggregate equals the BATCH aggregate over the original
    // table — which is exactly what the oracle checks. Sums run in
    // DECIMAL(18,4) for order-free cross-engine exactness.
    "s02_streaming_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = Streaming.eventsStream(s, d)
      val sink = s"graft_s02_sink_${counter.incrementAndGet()}"
      Streaming.runAvailableNow(
        ev.unionByName(ev)
          .dropDuplicates("event_id")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value").cast("decimal(18,4)")), 2).cast("double")
              .as("total_value")),
        sink)
        .orderBy("event_type")
    }),

    // streaming file-source ingest of the landing zone (the incremental
    // pipeline's streaming twin): explode → readStream over the period
    // files (2 files per micro-batch) → foreachBatch anti-join append →
    // bronze; a second AvailableNow run over the same checkpoint is a
    // no-op. The resulting bronze must equal the source orders exactly —
    // the same oracle as the batch pipeline's p02.
    "s03_streaming_ingest" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val root = graft.engine.Workdirs
        .materializeOnce("graft-streaming-ingest", d) { root =>
          graft.engine.Workdirs.delete(s, root)
          graft.engine.Landing.explode(s, d, s"$root/landing", periodFmt = "yyyy")
          Streaming.ingestOrders(
            s, s"$root/landing/orders", s"$root/bronze_orders", s"$root/ckpt")
          // rerun over the same checkpoint: nothing new to discover
          Streaming.ingestOrders(
            s, s"$root/landing/orders", s"$root/bronze_orders", s"$root/ckpt")
        }
      val cols = graft.engine.Tables.orders(s, d).columns.map(col).toIndexedSeq
      s.read.parquet(s"$root/bronze_orders").select(cols: _*).orderBy("o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "s01_streaming_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,

    "s02_streaming_dedup" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |         AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "s03_streaming_ingest" ->
      """SELECT * FROM orders ORDER BY o_orderkey"""
  )
}
