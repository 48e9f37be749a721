package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion — the reference's front door (`etl/tasks/bronze.py:26-31`
  * Polars read_csv; `scripts/esplosione_dati.py:122-124` pandas utf-8-sig
  * with header strip). SURVEY §2.1 S1/S2 + §2.2 P10 + §2.8 F10/F12.
  */
object Sources {

  /** Schema-inferred CSV scan (S1) — bronze-style schema-on-read. */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    trimHeaders(spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path))

  /** Explicit-schema CSV scan (the hardened silver-boundary read):
    * PERMISSIVE mode ⇒ unparseable cells become null — the
    * `pd.to_datetime(errors="coerce")` tolerant-parse semantics (P10/F10)
    * — and a malformed row never kills the scan.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    trimHeaders(spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path))

  /** Header hygiene (S2/F12): strip whitespace (and any BOM remnant —
    * Spark's CSV reader already consumes a UTF-8 BOM) from column names.
    */
  def trimHeaders(df: DataFrame): DataFrame = {
    val trimmed = df.columns.map(_.trim.stripPrefix("﻿"))
    if (trimmed.sameElements(df.columns)) df else df.toDF(trimmed.toIndexedSeq: _*)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
