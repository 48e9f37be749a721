package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic operator Spark's built-ins don't name,
  * composed per SURVEY §7.4 preference (a): existing ops express the
  * semantics, so no custom plan node is needed. For each left row, match
  * the LATEST right row with the same key and right.ts <= left.ts
  * (inclusive).
  *
  * Shape: tag both sides, union, then one `last(payload, ignoreNulls)`
  * over a (key)-partitioned, (ts, side)-ordered running window — right
  * rows sort before left rows at equal ts, so an exact-tie right row is
  * visible to its left row.
  *
  * Scale posture: ONE shuffle on the key + one sort — the canonical
  * distributed as-of (range-join engines do the same partition-then-sweep
  * under the hood). No point lookups, no per-row subqueries, no
  * broadcast requirement on either side.
  *
  * Caller contract: the right side must be unique per (key, ts) —
  * pre-aggregate ties (e.g. keep MAX of the payload) or the matched
  * value is engine-dependent.
  */
object AsOf {

  /** @param left        probe side (events)
    * @param right       reference side (must be unique per key+ts)
    * @param keyCols     (leftKey, rightKey) equi-key column names
    * @param tsCols      (leftTs, rightTs) event-time column names
    * @param payloadCol  right-side column to carry to matched left rows
    */
  def join(left: DataFrame, right: DataFrame,
           keyCols: (String, String), tsCols: (String, String),
           payloadCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // withColumn would silently OVERWRITE a same-named left column, and
    // the final select aliases __match to payloadCol — either collision
    // corrupts output, so reject both up front
    val reserved = Seq("__k", "__t", "__side", "__p", "__match")
    val clashes = leftCols.filter(c => reserved.contains(c) || c == payloadCol)
    require(clashes.isEmpty,
      s"AsOf.join: left columns ${clashes.mkString(", ")} collide with " +
        s"internal names ($reserved) or the payload column '$payloadCol'")
    val l = left
      .withColumn("__k", col(keyCols._1))
      .withColumn("__t", col(tsCols._1))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right
      .select(
        col(keyCols._2).as("__k"),
        col(tsCols._2).as("__t"),
        lit(0).as("__side"),
        col(payloadCol).as("__p"))
    val unioned = l.select(
      (leftCols.map(col) :+ col("__k") :+ col("__t") :+ col("__side") :+ col("__p")): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select((leftCols.map(col) :+ col("__match").as(payloadCol)): _*)
  }
}
