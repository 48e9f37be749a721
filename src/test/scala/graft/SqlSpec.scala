package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Sql

class SqlSpec extends AnyFunSuite {

  test("sanitize strips markdown fences") {
    assert(Sql.sanitize("```sql\nSELECT 1\n```") == Some("SELECT 1"))
    assert(Sql.sanitize("```SQL\nSELECT 1\n```") == Some("SELECT 1"))
    assert(Sql.sanitize("```\nSELECT 1\n```") == Some("SELECT 1"))
  }

  test("sanitize trims to the first WITH/SELECT and drops trailing semicolon") {
    assert(Sql.sanitize("Here is your query: SELECT a FROM t;") == Some("SELECT a FROM t"))
    assert(Sql.sanitize("Sure! WITH x AS (SELECT 1) SELECT * FROM x;\n")
      == Some("WITH x AS (SELECT 1) SELECT * FROM x"))
  }

  test("sanitize returns None when no SELECT/WITH present") {
    assert(Sql.sanitize("DROP TABLE users").isEmpty)
    assert(Sql.sanitize("no query here at all").isEmpty)
    assert(Sql.sanitize("").isEmpty)
  }

  test("runSelect executes sanitized SQL") {
    val spark = TestSpark.spark
    val out = Sql.runSelect(spark, "```sql\nSELECT 1 AS one;\n```").get.collect()
    assert(out.length == 1 && out(0).getInt(0) == 1)
  }
}
