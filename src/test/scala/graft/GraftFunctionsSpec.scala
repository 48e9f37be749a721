package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{GraftFunctions, PortableHash, TextHash}

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kernel functions are callable from SQL and match the JVM kernels") {
    GraftFunctions.register(spark)
    val text = "spark shuffles data by key across the cluster"
    val row = spark.sql(
      s"""SELECT simhash64('$text') AS s,
         |       simhash_portable64('$text') AS p,
         |       minhash('$text', 8, 3) AS m,
         |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
         |       sorted_intersect_size(array('a','b','d'), array('b','c','d')) AS si,
         |       sorted_intersect_size_long(array(1L, 5L, 9L), array(5L, 9L, 40L)) AS sl
         |""".stripMargin).collect()(0)
    assert(row.getAs[Long]("s") == TextHash.simhash64(UTF8String.fromString(text)))
    assert(row.getAs[Long]("p") == PortableHash.simhash64(UTF8String.fromString(text)))
    assert(row.getSeq[Long](2).length == 8)
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Long]("si") == 2L)
    assert(row.getAs[Long]("sl") == 2L)
  }

  test("GraftSparkExtensions injects every kernel into a fresh extensions set") {
    // the spark.sql.extensions entry point shares its builder list with
    // the live-session register(), so a builder smoke plus a successful
    // injectFunction pass covers the wiring; end-to-end SQL behavior of
    // the kernels themselves is asserted above
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftSparkExtensions().apply(ext) // must not throw
    assert(GraftFunctions.injections.map(_._1).sorted == Seq(
      "doc_fingerprint", "dot_product", "minhash", "simhash64",
      "simhash_portable64", "sorted_intersect_size", "sorted_intersect_size_long"))
    // each builder constructs a well-typed expression from dummy args
    import org.apache.spark.sql.catalyst.expressions.Literal
    val textArg = Literal(UTF8String.fromString("abc"),
      org.apache.spark.sql.types.StringType)
    val arrArg = Literal.create(Array(1.0, 2.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    GraftFunctions.injections.foreach { case (name, builder) =>
      val strArrArg = Literal.create(Array("a", "b"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
      val longArrArg = Literal.create(Array(1L, 2L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
      val e = name match {
        case "dot_product"                => builder(Seq(arrArg, arrArg))
        case "sorted_intersect_size"      => builder(Seq(strArrArg, strArrArg))
        case "sorted_intersect_size_long" => builder(Seq(longArrArg, longArrArg))
        case _                            => builder(Seq(textArg))
      }
      assert(e.resolved, s"$name builder must yield a resolved expression")
    }
  }

  test("dot_product widens float arrays via implicit cast instead of mis-reading them") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("graft_fn_spec_vecs")
    val d = spark.sql("SELECT dot_product(a, b) AS d FROM graft_fn_spec_vecs")
      .collect()(0).getDouble(0)
    assert(d == 13.0)
  }

  test("non-literal k argument is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash('a b c', CAST(rand()*4 AS INT), 3)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
