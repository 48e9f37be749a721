package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only microbench of the o53 text pass. */
object O53Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warmup count")(docs0.count())
    t("count again")(docs0.count())
    t("md5 only")(docs0.select(md5(col("text"))).agg(count(lit(1))).collect()(0))
    val toks = graft.engine.TextOps.tokens(col("text"))
    t("tokens size")(docs0.select(size(toks).as("n")).agg(sum("n")).collect()(0))
    t("shingles(2)")(docs0.select(size(graft.engine.TextOps.shingles(toks, 2)).as("n"))
      .agg(sum("n")).collect()(0))
    t("shingleSet(2)")(docs0.select(size(graft.engine.TextOps.shingleSet(col("text"), 2)).as("n"))
      .agg(sum("n")).collect()(0))
    t("shingleSet(2) again")(docs0.select(size(graft.engine.TextOps.shingleSet(col("text"), 2)).as("n"))
      .agg(sum("n")).collect()(0))
    // alternative: materialize tokens first so the lambda slices a bound
    // array attribute instead of re-evaluating split per element
    val alt = docs0.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), array_distinct(
        when(size(col("toks")) <= 2, array(concat_ws(" ", col("toks"))))
          .otherwise(transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", slice(col("toks"), i, lit(2)))))).as("sset"))
    t("alt two-step shingleSet")(alt.select(size(col("sset")).as("n")).agg(sum("n")).collect()(0))
    t("alt again")(alt.select(size(col("sset")).as("n")).agg(sum("n")).collect()(0))
    spark.stop()
  }
}
