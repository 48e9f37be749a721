package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.streaming.Streaming
import graft.streaming.Streaming.{ClosedSession, Event}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("state-store WARN silencer is scoped: package level restored on exit and on throw") {
    // r18 advice: a package-wide ERROR baked in by a library method
    // would swallow every future genuine state-store WARN JVM-wide.
    // The bracket must silence only while the wrapped run executes.
    import org.apache.logging.log4j.{Level, LogManager}
    val pkg = "org.apache.spark.sql.execution.streaming.state"
    val before = LogManager.getLogger(pkg).getLevel
    val inside = Streaming.withStateStoreRestoreWarnSilenced {
      LogManager.getLogger(pkg).getLevel
    }
    assert(inside == Level.ERROR, "level must be ERROR inside the bracket")
    assert(LogManager.getLogger(pkg).getLevel == before,
      "package level must be restored after the bracket")
    intercept[RuntimeException](Streaming.withStateStoreRestoreWarnSilenced[Unit] {
      throw new RuntimeException("boom")
    })
    assert(LogManager.getLogger(pkg).getLevel == before,
      "package level must be restored even when the run throws")
  }

  test("AvailableNow windowed agg equals the batch computation") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = Streaming.runAvailableNow(
      Streaming.hourlyAgg(Streaming.eventsStream(spark, sfDir)), "streaming_spec_hourly")
      .orderBy("hour").collect()
    val batch = graft.engine.Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")).as("hour"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("value").cast("decimal(18,4)")),
          2).cast("double").as("total_value"))
      .orderBy("hour").collect()
    assert(streamed.length == batch.length)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("s06: every first-hour straggler is evicted by the watermark, and only those") {
    val sfDir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val ev = graft.engine.Tables.events(spark, sfDir)
      .select(col("ts").cast("timestamp").as("ts"))
    val minTs = ev.agg(min(col("ts"))).head.getTimestamp(0).toInstant
    val late = ev.filter(
      col("ts") < java.sql.Timestamp.from(minTs.plusSeconds(3600L)))
    assert(late.count() > 0, "fixture must contain first-hour stragglers")
    // the state store sees late rows AFTER map-side partial aggregation,
    // so same-window stragglers combine into one dropped row; the staged
    // straggler file is single-partition (coalesce(1)), so the dropped
    // count is exactly the number of distinct straggler windows
    val nLateWindows = late
      .select(date_trunc("hour", col("ts"))).distinct().count()
    // invoking the registry lambda RUNS the stream (runAvailableNow is
    // eager) and records the metric before returning the drained frame;
    // the ledger is keyed per run, so diff against a pre-run snapshot —
    // immune to any other stream's entries
    val before = Streaming.watermarkDropLedger.keySet
    val out = graft.SparkEntry.queries("s06_late_data_audit")(spark, sfDir)
      .collect()
    val dropped = (Streaming.watermarkDropLedger -- before).values.sum
    assert(dropped == nLateWindows,
      s"expected the $nLateWindows straggler window group(s) dropped, " +
        s"got $dropped")
    // and the drop is visible in the DATA: the first-hour window is gone
    val firstHour = java.sql.Timestamp.from(
      minTs.truncatedTo(java.time.temporal.ChronoUnit.HOURS))
    assert(!out.exists(_.getTimestamp(0) == firstHour),
      "the straggler-only first-hour window must not be emitted")
  }

  test("streaming ingest: exactly-once, rerun no-op, crash replay converges") {
    import org.apache.spark.sql.functions.col
    val root = TestSpark.tmpDir("stream-ingest")
    val landing = s"$root/landing/orders"
    (1 to 8).map(i => (i.toLong, s"p${1 + (i - 1) / 4}"))
      .toDF("o_orderkey", "period")
      .write.partitionBy("period").parquet(landing)

    // crash window: period p1's rows already appended to bronze but the
    // stream's offsets were never committed (no checkpoint yet)
    spark.read.option("basePath", landing).parquet(landing)
      .filter(col("period") === "p1")
      .write.parquet(s"$root/bronze")
    Streaming.ingestOrders(spark, landing, s"$root/bronze", s"$root/ckpt",
      maxFilesPerTrigger = 1)
    val after1 = spark.read.parquet(s"$root/bronze")
    assert(after1.count() == 8, "every order ingested exactly once")
    assert(after1.select("o_orderkey").distinct().count() == 8,
      "crash-replayed rows must dedup, not duplicate")

    // rerun over the same checkpoint: no new files, bronze unchanged
    Streaming.ingestOrders(spark, landing, s"$root/bronze", s"$root/ckpt")
    assert(spark.read.parquet(s"$root/bronze").count() == 8)
  }

  test("streaming dedup: dropDuplicates keeps one row per event id") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    source.addData((1L, "a"), (1L, "a"), (2L, "b"), (3L, "c"), (2L, "b"))
    val out = Streaming.runAvailableNow(
      source.toDS().toDF("event_id", "payload").dropDuplicates("event_id"),
      "streaming_spec_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-stream join keeps in-range pairs and drops out-of-range ones") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new Timestamp(3600000L * 24 + min * 60000L)
    val views =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    val buys =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Timestamp)]
    // user 1: purchase 20 min after the view (in range); user 2: 40 min
    // (out of range); user 9: never purchases. Added as separate blocks
    // so the drained run exercises the stateful join path end-to-end.
    views.addData((1L, ts(0)), (2L, ts(10)))
    buys.addData((9L, ts(0)))
    buys.addData((1L, ts(20)), (2L, ts(50)))
    val left = views.toDS().toDF("user_id", "view_ts")
      .withWatermark("view_ts", "1 hour")
    val right = buys.toDS().toDF("b_user", "buy_ts")
      .withWatermark("buy_ts", "1 hour")
    val joined = left.join(right,
      col("user_id") === col("b_user") &&
        col("buy_ts") > col("view_ts") &&
        col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
    val out = Streaming.runAvailableNow(
      joined.select(col("user_id")),
      "streaming_spec_ss_join",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L),
      s"only user 1 pairs within 30 minutes, got $out")
  }

  test("runAvailableNow never lands the result on the driver, even unaggregated") {
    // a RAW (non-aggregated) stream of many rows through runAvailableNow:
    // with the old memory sink every row materialized in driver heap; the
    // parquet foreachBatch sink keeps them on executors/disk. Proof: the
    // returned frame's plan is a FILE SCAN, not a driver-local relation,
    // and the rows round-trip intact.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val n = 50000
    source.addData(1L to n: _*)
    val out = Streaming.runAvailableNow(
      source.toDS().toDF("id"),
      "streaming_spec_raw_passthrough",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation"),
      s"result must be file-backed, not a driver-local relation:\n$plan")
    assert(out.inputFiles.nonEmpty, "result must read back from sink files")
    // Append-mode batches land in batchId-named subdirs (each one
    // OVERWRITTEN on a micro-batch replay — foreachBatch is
    // at-least-once, so an append-to-root sink would duplicate rows on
    // retry; the subdir overwrite makes the replay idempotent)
    assert(out.inputFiles.forall(_.contains("/batch-")),
      s"append batches must write to batch-<id> subdirs, got ${out.inputFiles.head}")
    assert(out.count() == n)
    assert(out.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == n.toLong * (n + 1) / 2)
  }

  test("runAvailableNow rejects Update mode instead of mis-folding partial emissions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    source.addData(1L, 2L)
    // the rejection happens BEFORE any temp dir is created — a rejected
    // call must not leak checkpoint/out dirs (one per call adds up over
    // a long session). Compare before/after: /tmp may hold unrelated
    // residue from other sessions.
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def dirs(): Set[String] = Option(tmp.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.contains("streaming_spec_update_reject")).toSet
    val before = dirs()
    intercept[IllegalArgumentException] {
      Streaming.runAvailableNow(
        source.toDS().toDF("id").groupBy("id").count(),
        "streaming_spec_update_reject",
        org.apache.spark.sql.streaming.OutputMode.Update())
    }
    val leaked = dirs() -- before
    assert(leaked.isEmpty,
      s"rejected call leaked temp dirs: ${leaked.mkString(", ")}")
  }

  test("advanceSession folds late within-watermark events without moving bounds backwards") {
    import graft.streaming.Streaming.{SessionState, advanceSession}
    val gap = 30L * 60 * 1000000
    // open session [600, 600]; a late event at 0 (10 min earlier) joins
    // it and extends the START, not the end
    val (closed, s1) = advanceSession(Some(SessionState(600L, 600L, 1)), 0L, gap)
    assert(closed.isEmpty && s1 == SessionState(0L, 600L, 2))
    // a later event far beyond the gap closes with end >= start
    val (c2, s2) = advanceSession(Some(s1), 600L + gap + 1, gap)
    assert(c2.exists(c => c.start_us == 0L && c.end_us == 600L && c.n_events == 2))
    assert(s2.n == 1)
  }

  test("flatMapGroupsWithState sessionization closes sessions on event-time gaps") {
    def ev(u: Long, minute: Int) =
      Event(u, java.time.Instant.ofEpochMilli(3600_000L * 24 + minute * 60_000L))
    // user 1: two sessions (gap 45 min > 30); user 2: one session.
    // A far-future sentinel per user advances the watermark so every real
    // session times out and flushes (finite-stream drain).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    source.addData(
      ev(1, 0), ev(1, 10), ev(1, 55), ev(1, 60),
      ev(2, 5),
      ev(1, 24 * 60), ev(2, 24 * 60))
    val out = Streaming.runAvailableNow(
      Streaming.sessionize(source.toDS(), gapMinutes = 30).toDF(),
      "streaming_spec_sessions",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[ClosedSession].collect()
    val byUser = out.groupBy(_.user_id)
    assert(byUser(1L).length == 2, s"user 1 must close 2 sessions, got ${out.mkString(",")}")
    assert(byUser(1L).map(_.n_events).sorted.toSeq == Seq(2, 2))
    assert(byUser(2L).length == 1)
    assert(byUser(2L).head.n_events == 1)
  }
}
