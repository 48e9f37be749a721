package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage profiler for o53 (mirrors Dedup.ngramJaccardNearDup). */
object O53Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    val threshold = 0.6; val w = 2; val eps = 1e-9
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val keyed = docs0.select(col("doc_id"), md5(col("text")).as("gkey"),
        graft.engine.TextOps.shingleSet(col("text"), w).as("sset"))
      .repartition(col("doc_id"))
    val reps = keyed.groupBy(col("gkey"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("gn"),
        first(col("sset")).as("sset"))
    val ss = reps.select(col("doc_id"), col("sset"), size(col("sset")).as("n"))
      .repartition(col("doc_id"))
      .cache()
    t("ss(one-pass shingle sets)")(ss.count())
    val posts = ss.select(col("doc_id"), col("n"), explode(col("sset")).as("sh"))
    t("posts")(posts.count())
    val B = 1 << 20
    val sids = posts.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .withColumn("bkt", pmod(xxhash64(col("sh")), lit(B.toLong)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("sh"))))
      .select(col("sh"), col("df"),
        (col("rn").cast("long") * B + col("bkt")).as("sid"))
    t("sids(vocab)")(sids.count())
    val postsSid = posts.join(sids, "sh")
      .select(col("doc_id"), col("n"), col("df"), col("sid"))
      .repartition(col("doc_id"))
      .cache()
    t("postsSid")(postsSid.count())
    val prefixLen = col("n") - ceil(lit(threshold) * col("n") - lit(eps)) + 1
    val ranked = postsSid
      .withColumn("r", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sid"))))
      .filter(col("r") <= prefixLen)
      .select(col("sid"), col("doc_id"), col("n"), col("r"))
      .cache()
    t("ranked(prefix postings)")(ranked.count())
    val isets = postsSid.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sid"))).as("iset"), first(col("n")).as("n"))
      .cache()
    t("isets")(isets.count())
    val A = ranked.alias("A"); val Bs = ranked.alias("B")
    val alpha = ceil(lit(threshold / (1.0 + threshold)) *
      (col("A.n") + col("B.n")) - lit(eps))
    val joined = A.join(Bs,
      col("A.sid") === col("B.sid") && col("A.doc_id") < col("B.doc_id") &&
        least(col("A.n"), col("B.n")) >=
          lit(threshold) * greatest(col("A.n"), col("B.n")) - lit(eps) &&
        col("A.r") <= col("A.n") - alpha + 1 &&
        col("B.r") <= col("B.n") - alpha + 1)
      .select(col("A.doc_id").as("a"), col("B.doc_id").as("b"),
        col("A.n").as("pna"), col("B.n").as("pnb"),
        col("A.r").as("ra"), col("B.r").as("rb"))
    t("join output rows")(joined.count())
    val cand = joined.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("op"), max(col("ra")).as("mra"),
        max(col("rb")).as("mrb"),
        first(col("pna")).as("pna"), first(col("pnb")).as("pnb"))
      .filter(col("op") +
        least(col("pna") - col("mra"), col("pnb") - col("mrb")) >=
        ceil(lit(threshold / (1.0 + threshold)) *
          (col("pna") + col("pnb")) - lit(eps)))
      .select(col("a"), col("b")).cache()
    t("cand pairs (accumulated cut)")(cand.count())
    val inter = graft.functions.SetKernelFunctions
      .sortedIntersectSizeLong(col("sa"), col("sb")).cast("double")
    val verified = cand
      .join(isets.select(col("doc_id").as("a"), col("iset").as("sa"), col("n").as("na")), "a")
      .join(isets.select(col("doc_id").as("b"), col("iset").as("sb"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (inter / (col("na") + col("nb") - inter).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    t("verified pairs")(verified.count())
    spark.stop()
  }
}
