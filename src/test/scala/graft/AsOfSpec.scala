package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.engine.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = Seq( // (sym, qts, px)
    ("A", ts("2020-01-01 09:00:00"), 10L),
    ("A", ts("2020-01-01 10:00:00"), 11L),
    ("A", ts("2020-01-01 11:00:00"), 12L),
    ("B", ts("2020-01-01 09:30:00"), 20L)
  ).toDF("sym", "qts", "px")

  private def trades = Seq( // (trade_id, sym, tts)
    (1L, "A", ts("2020-01-01 09:30:00")), // between quotes -> px 10
    (2L, "A", ts("2020-01-01 10:00:00")), // exact tie -> inclusive, px 11
    (3L, "A", ts("2020-01-01 23:00:00")), // after all -> latest, px 12
    (4L, "B", ts("2020-01-01 09:00:00")), // before any quote -> dropped
    (5L, "C", ts("2020-01-01 12:00:00"))  // no key match -> dropped
  ).toDF("trade_id", "sym", "tts")

  test("as-of join matches latest right row at-or-before each left ts") {
    val out = AsOf.join(trades, quotes, ("sym", "sym"), ("tts", "qts"), "px")
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 10L, 2L -> 11L, 3L -> 12L))
  }

  test("left rows with no eligible right row are dropped (inner as-of)") {
    val ids = AsOf.join(trades, quotes, ("sym", "sym"), ("tts", "qts"), "px")
      .select("trade_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(4L) && !ids.contains(5L))
  }

  test("rejects left frames whose columns collide with internal or payload names") {
    intercept[IllegalArgumentException] {
      AsOf.join(trades.withColumnRenamed("trade_id", "__side"), quotes,
        ("sym", "sym"), ("tts", "qts"), "px")
    }
    intercept[IllegalArgumentException] {
      AsOf.join(trades.withColumnRenamed("trade_id", "px"), quotes,
        ("sym", "sym"), ("tts", "qts"), "px")
    }
  }
}
