package graft

import org.apache.spark.sql.SparkSession

/** PQ recall-dial measurement: `runMain graft.RecallCurve <sfDir> [c ...]`
  * (default c ∈ {50, 100, 200, 400}) measures x10's rerank-candidate dial
  * against exact kNN ground truth on the sfDir corpus — recall@5 over the
  * 10 registry queries plus wall seconds per setting. One JSON line per c,
  * recorded in SCALE.md so the dial has numbers the way the flat-vs-two-
  * level k-means table already does.
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallCurve <sfDir> [c ...]")
    val sfDir = args.head
    val cs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
             else Seq(50, 100, 200, 400)
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
    val emb = engine.Tables.embeddings(spark, sfDir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(engine.Similarity.knnCosine(emb, nQueries = 10, k = 5))
    cs.foreach { c =>
      val t0 = System.nanoTime()
      val pq = pairs(engine.Similarity.pqTopK(emb, nQueries = 10, k = 5, c = c))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (exact intersect pq).size.toDouble / exact.size
      println(f"""{"sf_dir":"$sfDir","c":$c,"recall_at_5":$recall%.3f,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
