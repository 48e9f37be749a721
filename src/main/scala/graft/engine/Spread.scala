package graft.engine

import org.apache.spark.sql.DataFrame

/** Shared parallelism probe for compute-bound per-row stages (hashing,
  * regex tokenization, vector folds): a small parquet corpus arrives as
  * ONE split, which would serialize the hot loop onto one core — but an
  * unconditional `repartition` is a full shuffle of every byte, which at
  * 100 TB is pure waste on an input that is already many splits. So the
  * spread is GATED: shuffle only when the input has fewer splits than
  * the cluster has cores.
  */
object Spread {

  /** Round-robin `df` across `defaultParallelism` partitions IFF it is
    * not already at least that parallel. The probe is metadata-only for
    * file-backed frames: `inputFiles` comes from the logical plan (no
    * RDD plan conversion); a corpus arriving as >= parallelism file
    * splits is already spread. Non-file-backed frames (cached /
    * in-memory, where `inputFiles` is empty) fall back to the RDD
    * partition-count probe instead of an unconditional shuffle.
    */
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    val enough = if (files > 0) files >= p else df.rdd.getNumPartitions >= p
    if (enough) df else df.repartition(p)
  }
}
