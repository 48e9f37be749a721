package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Catalyst expression for the portable (md5-based) SimHash —
  * same expression pattern as [[SimHash64Expr]], different token hash so
  * the result is reproducible in the DuckDB oracle (see [[PortableHash]]).
  */
case class SimHashPortable64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    PortableHash.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashPortable64Expr =
    copy(child = newChild)
}

/** Codegen'd portable 64-bit hash of a string: digest bytes 8..15 of
  * md5(s) big-endian, as a signed long carrying the unsigned bit
  * pattern — in SQL
  * `CAST(('0x' || substr(md5(s), 17, 16)) AS UBIGINT)` (DuckDB) holds
  * the same 64 bits. Feeds sketches whose answers must be reproducible
  * by the oracle (e.g. the KMV distinct estimate of x03).
  */
case class Md5Hash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    PortableHash.md5Hash64(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.md5Hash64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): Md5Hash64Expr =
    copy(child = newChild)
}

object PortableHashFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def simhashPortable64(c: Column): Column = column(SimHashPortable64Expr(expression(c)))
  def md5Hash64(c: Column): Column = column(Md5Hash64Expr(expression(c)))
}
