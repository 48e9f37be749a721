package graft
import org.apache.spark.sql.SparkSession

/** Single-query timing tool: `runMain graft.RunOne <sfDir> <query ...>`
  * materializes each named registry query (count after a codegen warm-up
  * of nothing — cold first run, like the bench's per-query cost) and
  * prints rows + wall seconds. The profile-one-query loop that Bench
  * (whole registry) and Explain (plan only) don't cover.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunOne <sfDir> <query ...>")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"$n: unknown query")
        case Some(fn) =>
          val t0 = System.nanoTime()
          val rows = fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"$n: $rows rows in $sec%.2f s")
      }
    }
    spark.stop()
  }
}
