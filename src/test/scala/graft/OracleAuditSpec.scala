package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** CI tripwire for the round-14 oracle failure class: the driver's
  * correctness hash is TYPE-SENSITIVE, and DuckDB widens `SUM(BIGINT)` /
  * `//`-over-HUGEINT to HUGEINT (int128) — a type Spark cannot emit, so an
  * uncast aggregate in an oracle is a guaranteed red row even when every
  * value matches (exactly how o74/o79 went red in CORRECTNESS_r14 while the
  * Spark results were correct). `DESCRIBE (<oracle>)` resolves declared
  * output types without executing, so the whole 139-oracle registry audits
  * in well under a second.
  *
  * The audit runs via `dev/oracle_types.py` (duckdb is a driver-side python
  * library, not a JVM dependency); the suite CANCELS — not fails — when
  * python3+duckdb or the testdata tables are absent, so the library test
  * suite stays self-contained in environments without the driver toolchain.
  *
  * DECIMAL oracle columns are allowed only where the Spark query's own
  * schema is DecimalType with the same precision/scale (a few oracles use
  * exact decimal sums on both engines deliberately); that cross-check runs
  * here too, building only those queries' frames.
  */
class OracleAuditSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def toolingPresent: Boolean =
    new java.io.File(sfDir, "lineitem.parquet").exists() &&
      (try Seq("python3", "-c", "import duckdb").! == 0
       catch { case _: java.io.IOException => false })

  test("no oracle declares a type Spark cannot produce (HUGEINT audit)") {
    assume(toolingPresent, "python3+duckdb / testdata unavailable; audit runs driver-side")
    val oracleJson = Files.createTempFile("oracle_sql", ".json")
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Json.quote(k)}: ${Json.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(oracleJson, json)

    val out = new StringBuilder
    val rc = Seq("python3", "dev/oracle_types.py", sfDir, oracleJson.toString)
      .run(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
      .exitValue()
    Files.deleteIfExists(oracleJson)
    val report = out.toString
    assert(rc == 0, s"oracle type audit failed (uncast SUM / '//' reintroduced?):\n$report")

    // DECIMAL columns reported by the audit must match the Spark side's
    // DecimalType(precision, scale) exactly — parse the tool's JSON report
    // (shape: {"decimal_columns": {query: {col: "DECIMAL(p,s)"}}}).
    val DecimalRe = """DECIMAL\((\d+),(\d+)\)""".r
    val EntryRe = """"([a-z0-9_]+)":\s*\{([^}]*)\}""".r
    val ColRe = """"([A-Za-z0-9_]+)":\s*"(DECIMAL\(\d+,\d+\))"""".r
    val decimalSection = report.split("\"decimal_columns\":", 2) match {
      case Array(_, rest) => rest
      case _              => ""
    }
    val spark = TestSpark.spark
    // (regex-over-json kept simple: one nesting level, tool-controlled shape)
    EntryRe.findAllMatchIn(decimalSection).foreach { em =>
      val query = em.group(1)
      SparkEntry.queries.get(query).foreach { fn =>
        val schema = fn(spark, sfDir).schema
        ColRe.findAllMatchIn(em.group(2)).foreach { cm =>
          val (colName, duckType) = (cm.group(1), cm.group(2))
          val DecimalRe(p, s) = duckType
          val field = schema.fields.find(_.name == colName)
          assert(field.isDefined, s"$query: oracle DECIMAL column $colName missing from Spark schema")
          assert(field.get.dataType ==
            org.apache.spark.sql.types.DecimalType(p.toInt, s.toInt),
            s"$query.$colName: oracle $duckType vs Spark ${field.get.dataType}")
        }
      }
    }
  }
}
