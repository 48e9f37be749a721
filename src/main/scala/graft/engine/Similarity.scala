package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Similarity search over an `embeddings(vec_id, embedding, label)` table.
  *
  *  - [[knnCosine]] — exact top-k: broadcast the (small) query set, one
  *    narrow pass over the corpus, per-query top-k via ranking. This is
  *    the 100 TB-correct EXACT shape: the corpus is never self-joined;
  *    cost is O(|corpus| · |queries|) with the queries in memory.
  *  - [[ivfTopK]] — IVF-style ANN: the `label` column is the coarse
  *    quantizer's cluster assignment; per-cluster centroids are computed
  *    distributively, each query probes its `nprobe` nearest centroids and
  *    scans only those clusters' members. At scale the cluster id becomes
  *    the partition key of the embedding table, so a probe is a partition-
  *    pruned scan. Approximate ⇒ registered as a rows-only query (recall
  *    is asserted against brute force in the test suite instead).
  */
object Similarity {

  /** Exact top-k cosine neighbors for query vectors `vec_id < nQueries`
    * (self excluded). Cosine is [[VectorOps.cosine]] — codegen'd
    * fold, bit-identical to DuckDB `list_cosine_similarity` on DOUBLE.
    */
  def knnCosine(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        VectorOps.cosine(col("qv"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Embedding-cosine near-duplicate pairs over a deterministic corpus
    * sample (`vec_id % sampleMod == 0`): exact pairwise cosine ≥
    * threshold. Exact all-pairs is inherently O(n²) — the sample bound
    * keeps it a broadcast nested-loop here; at 100 TB the exact variant
    * runs as a blocked self-join per coarse cluster (see [[ivfTopK]]'s
    * label pruning) and the sampled variant is the audit query.
    */
  def cosineNearDup(emb: DataFrame, threshold: Double, sampleMod: Int = 10): DataFrame = {
    val e = emb.filter(pmod(col("vec_id"), lit(sampleMod)) === 0)
    val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(broadcast(b), col("a") < col("b"))
      .select(col("a"), col("b"), VectorOps.cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Per-label centroids of the embedding column, computed by position
    * explode + grouped average (distributed; no vectors on the driver).
    */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("v"))
      .groupBy(col("label"))
      .agg(collect_list(struct(col("pos"), col("v"))).as("pv"))
      .select(col("label"),
        transform(array_sort(col("pv")), x => x.getField("v")).as("centroid"))

  /** IVF ANN: probe the `nprobe` clusters whose centroids are most
    * cosine-similar to the query, then exact top-k within the probed
    * clusters only.
    */
  def ivfTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("label"))
    val probed = q.crossJoin(broadcast(centroids(emb)))
      .select(col("query_id"), col("qv"), col("label"),
        VectorOps.cosine(col("qv"), col("centroid")).as("ccos"))
      .withColumn("rn", row_number().over(cw))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    emb.join(broadcast(probed), Seq("label")) // cluster-pruned scan
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        VectorOps.cosine(col("qv"), col("embedding")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }
}
