package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup suite. Native expressions
  * (not UDFs) with `doGenCode` emitting a static call into
  * [[TextHash]], so they participate in whole-stage codegen — the
  * preference order from SURVEY §7.4: compose built-ins where possible,
  * a codegen'd `Expression` where a single-pass kernel beats a tree of
  * higher-order functions (SimHash needs 64 bit-counters per row;
  * MinHash needs k min-folds over shingles — both are one tight JVM loop
  * here instead of k separate `aggregate()` expressions).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class MinHashExpr(child: Expression, k: Int, shingleWidth: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[UTF8String], k, shingleWidth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $k, $shingleWidth)")
  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

case class NormalizeAlnumExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextHash.normalizeAlnum(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.normalizeAlnum($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeAlnumExpr =
    copy(child = newChild)
}

case class BottomKFingerprintExpr(child: Expression, k: Int, shingleWidth: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.bottomK(input.asInstanceOf[UTF8String], k, shingleWidth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.bottomK($c, $k, $shingleWidth)")
  override protected def withNewChildInternal(newChild: Expression): BottomKFingerprintExpr =
    copy(child = newChild)
}

/** Column-level API (Spark 4 unified Column ↔ catalyst Expression via the
  * classic bridge `org.apache.spark.sql.classic.ExpressionUtils`).
  */
object TextHashFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def simhash64(c: Column): Column = column(SimHash64Expr(expression(c)))
  def minhash(c: Column, k: Int = 32, shingleWidth: Int = 3): Column =
    column(MinHashExpr(expression(c), k, shingleWidth))
  def fingerprint(c: Column, k: Int = 8, shingleWidth: Int = 3): Column =
    column(BottomKFingerprintExpr(expression(c), k, shingleWidth))
  def normalizeAlnum(c: Column): Column = column(NormalizeAlnumExpr(expression(c)))
}
