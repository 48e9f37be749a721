package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's fail-fast data-quality gate (SURVEY §2.11): Pandera
  * schemas + SQL DQC checks (`etl/tasks/silver.py:7-19,42,58`,
  * `scripts/bronze_incremental.py:68-106`) re-expressed as a reusable
  * `Seq[Check] → Either[Violations, DataFrame]` module.
  *
  * Scale posture: ALL checks are evaluated in ONE distributed aggregation
  * pass (a single `agg` of conditional counters — the A2 shape), never by
  * pulling data to the driver the way the reference hands silver tables
  * to pandas/Pandera (`etl/tasks/silver.py:42`) — that copy is the one
  * reference behavior that must not survive at 100 TB.
  */
object Quality {

  sealed trait Check {
    def name: String
    /** 1 for a violating row, 0 otherwise (NonEmpty handled separately). */
    def violation: Column
  }
  /** Not-null key check (`silver.py:18`). */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
    def violation: Column = when(col(column).isNull, 1).otherwise(0)
  }
  /** Non-negative measure check (`silver.py:15-17`). */
  final case class NonNegative(column: String) extends Check {
    val name = s"non_negative($column)"
    def violation: Column = when(col(column) < 0, 1).otherwise(0)
  }
  /** Domain check (`silver.py:8-12` order_status ∈ {...}). */
  final case class InSet(column: String, allowed: Seq[String]) extends Check {
    val name = s"in_set($column)"
    def violation: Column =
      when(col(column).isNotNull && !col(column).isin(allowed: _*), 1).otherwise(0)
  }
  /** Non-empty input check (`bronze_incremental.py:69-71`). */
  case object NonEmpty extends Check {
    val name = "non_empty"
    def violation: Column = lit(0)
  }

  final case class Violation(check: String, count: Long)
  final class QualityGateException(val violations: Seq[Violation])
    extends RuntimeException(
      "quality gate failed: " +
        violations.map(v => s"${v.check}=${v.count}").mkString(", "))

  /** Evaluate all checks in one aggregation pass. Left = violations
    * (fail-fast input for [[gate]]), Right = the validated frame.
    */
  def validate(df: DataFrame, checks: Seq[Check]): Either[Seq[Violation], DataFrame] =
    validateWith(df, checks, Nil).map(_._1)

  /** [[validate]] with caller-supplied aggregate columns folded into the
    * SAME single pass, returned as the extras Row (access by the alias
    * the caller gave each column). For callers that need a cheap
    * whole-table statistic alongside the gate — Landing.explode's year
    * span — so gating + stats cost ONE table scan per ingest, not two
    * (at 100 TB a second full pass over bronze is a real job, and at
    * sf0.1 the split pass was the only code change on p01's r17 path).
    */
  def validateWith(df: DataFrame, checks: Seq[Check], extras: Seq[Column])
      : Either[Seq[Violation], (DataFrame, org.apache.spark.sql.Row)] = {
    val vchecks = checks.filter(_ != NonEmpty)
    val counters = count(lit(1)).as("__rows") +:
      (vchecks.map(c => sum(c.violation).cast("long").as(c.name)) ++ extras)
    val row = df.agg(counters.head, counters.tail: _*).collect()(0)
    val rows = row.getLong(0)
    val violations =
      vchecks.map(c => Violation(c.name, row.getAs[Long](c.name))).filter(_.count > 0) ++
        (if (checks.contains(NonEmpty) && rows == 0) Seq(Violation(NonEmpty.name, 1)) else Nil)
    if (violations.nonEmpty) Left(violations) else Right((df, row))
  }

  /** Blocking gate: throw on any violation so downstream stages never run
    * (the reference's pipeline-abort semantics, `README_FASE1.md:61-62`).
    */
  def gate(df: DataFrame, checks: Seq[Check]): DataFrame =
    validate(df, checks).fold(v => throw new QualityGateException(v), identity)

  /** Blocking [[validateWith]]: the gated frame plus the extras Row. */
  def gateWith(df: DataFrame, checks: Seq[Check], extras: Seq[Column])
      : (DataFrame, org.apache.spark.sql.Row) =
    validateWith(df, checks, extras)
      .fold(v => throw new QualityGateException(v), identity)

  /** The silver-orders contract (`silver.py:8-18` analog). */
  val orderChecks: Seq[Check] = Seq(
    NonEmpty, NotNull("o_orderkey"), NotNull("o_custkey"),
    InSet("o_orderstatus", Seq("F", "P", "O")))

  /** The silver-lineitem contract (`silver.py:15-18` analog). */
  val lineitemChecks: Seq[Check] = Seq(
    NonEmpty, NotNull("l_orderkey"), NotNull("l_partkey"),
    NonNegative("l_extendedprice"))
}
