package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.engine.Sources
import java.nio.file.{Files, Paths}

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("BOM + padded headers are trimmed (S2/F12)") {
    val dir = TestSpark.tmpDir("csv-bom")
    Files.writeString(Paths.get(s"$dir/data.csv"),
      "﻿id , name \n1,alpha\n2,beta\n")
    val df = Sources.csvInferred(spark, s"$dir/data.csv")
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 2)
  }

  test("explicit schema + PERMISSIVE: malformed timestamp coerces to null (P10/F10)") {
    val dir = TestSpark.tmpDir("csv-coerce")
    Files.writeString(Paths.get(s"$dir/data.csv"),
      "id,ts\n1,2020-01-02T03:04:05.000Z\n2,not-a-timestamp\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType)))
    val rows = Sources.csv(spark, s"$dir/data.csv", schema)
      .orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getTimestamp(1) != null)
    assert(rows(1).isNullAt(1), "unparseable timestamp must coerce to null, not fail the scan")
  }

  test("write -> read round trip preserves values") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("csv-rt")
    val in = Seq((1L, "a,b \"quoted\"", 1.5), (2L, "plain", -0.25))
      .toDF("k", "s", "v")
    Sources.writeCsv(in, s"$dir/out")
    val back = Sources.csv(spark, s"$dir/out", in.schema).orderBy("k").collect()
    assert(back(0).getString(1) == "a,b \"quoted\"")
    assert(back(0).getDouble(2) == 1.5)
    assert(back(1).getDouble(2) == -0.25)
  }
}
