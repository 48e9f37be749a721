package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface registration of the custom kernels, so text-to-SQL users
  * (SURVEY §2.12) can call them from plain SELECTs over the gold views:
  *
  * {{{
  *   SELECT doc_id, simhash64(text)          FROM documents_view
  *   SELECT minhash(text, 32, 3)             FROM documents_view
  *   SELECT dot_product(a, b)                ...
  * }}}
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "simhash64",
      args => SimHash64Expr(args.head))
    Bridge.registerFunction(spark, "simhash_portable64",
      args => SimHashPortable64Expr(args.head))
    Bridge.registerFunction(spark, "minhash",
      args => MinHashExpr(args.head,
        if (args.length > 1) intArg(args(1), "k") else 32,
        if (args.length > 2) intArg(args(2), "shingleWidth") else 3))
    Bridge.registerFunction(spark, "doc_fingerprint",
      args => BottomKFingerprintExpr(args.head,
        if (args.length > 1) intArg(args(1), "k") else 8,
        if (args.length > 2) intArg(args(2), "shingleWidth") else 3))
    Bridge.registerFunction(spark, "dot_product",
      args => DotProductExpr(args(0), args(1)))
  }
}
