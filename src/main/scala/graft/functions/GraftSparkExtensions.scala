package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions` entry point — installs every graft kernel
  * function at session build time, the deployment-grade alternative to
  * calling [[GraftFunctions.register]] on a live session:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
  *     .getOrCreate()
  * }}}
  *
  * Injected functions land in the session's base function registry (not
  * the temp-function namespace), so they survive `newSession()` clones —
  * the behavior a cluster-wide library install needs.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injections.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftSparkExtensions].getName, name),
        builder))
    }
}
