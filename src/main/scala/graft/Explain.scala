package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: `runMain graft.Explain [sfDir [query ...]]`
  * prints `explain("formatted")` for the named registry queries (all of
  * them by default) — the iterate-on-the-plan loop (check PushedFilters,
  * WholeStageCodegen spans, Exchange counts, broadcast choices) without
  * writing a spec first. Pipeline-running entries (p01/p02, streaming)
  * still execute their setup; pass explicit names to skip them.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries.get(n) match {
        case None => println(s"(unknown query: $n)")
        case Some(fn) =>
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable => println(s"(failed to plan: ${e.getMessage})") }
      }
    }
    spark.stop()
  }
}
