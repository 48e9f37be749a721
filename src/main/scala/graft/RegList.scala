package graft

/** Prints the registry inventory (no Spark needed) — dev tool. */
object RegList {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("no-oracle: " + (q -- o).toSeq.sorted.mkString(","))
    println("orphan-oracle: " + (o -- q).toSeq.sorted.mkString(","))
    println(q.toSeq.sorted.mkString(" "))
  }
}
