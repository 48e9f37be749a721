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

  /** Name → expression builder for every kernel function, shared by the
    * live-session path ([[register]]) and the `spark.sql.extensions`
    * path ([[GraftSparkExtensions]]).
    */
  val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> ((args: Seq[Expression]) => SimHash64Expr(args.head)),
    "simhash_portable64" -> ((args: Seq[Expression]) => SimHashPortable64Expr(args.head)),
    "minhash" -> ((args: Seq[Expression]) => MinHashExpr(args.head,
      if (args.length > 1) intArg(args(1), "k") else 32,
      if (args.length > 2) intArg(args(2), "shingleWidth") else 3)),
    "doc_fingerprint" -> ((args: Seq[Expression]) => BottomKFingerprintExpr(args.head,
      if (args.length > 1) intArg(args(1), "k") else 8,
      if (args.length > 2) intArg(args(2), "shingleWidth") else 3)),
    "dot_product" -> ((args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
    "sorted_intersect_size" ->
      ((args: Seq[Expression]) => SortedIntersectSizeExpr(args(0), args(1))),
    "sorted_intersect_size_long" ->
      ((args: Seq[Expression]) => SortedLongIntersectSizeExpr(args(0), args(1))))

  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}
