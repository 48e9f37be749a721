package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "spark shuffles partition data by key across the cluster " +
    "while catalyst prunes columns and pushes filters into the parquet scan layer"

  private def corpus = Seq(
    (0L, base),
    (1L, base.replace("layer", "stage")),       // near-dup of 0
    (2L, base),                                 // exact dup of 0
    (3L, "entirely different text about cooking pasta with tomatoes basil and olive oil in a large pot"),
    (4L, "yet another unrelated document discussing mountain hiking trails weather gear and maps")
  ).toDF("doc_id", "text")

  test("simhashNearDup finds exact + near dups, not unrelated docs") {
    val pairs = Dedup.simhashNearDup(corpus, t = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)), "exact dup must be found (hamming 0)")
    assert(!pairs.exists(p => p._2 == 3L || p._2 == 4L || p._1 == 3L || p._1 == 4L),
      "unrelated docs must not pair")
  }

  test("minhashLshJaccard finds high-jaccard pairs with exact scores") {
    val out = Dedup.minhashLshJaccard(corpus, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.get((0L, 2L)).contains(1.0), "exact dup has jaccard 1.0")
    assert(out.contains((0L, 1L)), "near-dup above threshold found")
    assert(!out.keySet.exists(p => Set(p._1, p._2).intersect(Set(3L, 4L)).nonEmpty))
  }

  test("LSH candidates are complete vs the exact pair set on the shipped corpus") {
    // the o22 DuckDB oracle enumerates ALL pairs with jaccard >= 0.8;
    // LSH candidate generation is probabilistic, so completeness on the
    // corpus the driver actually checks must be ASSERTED, not assumed.
    // The exact side uses an inverted-index self-join on shingles —
    // complete by construction (jaccard >= 0.8 > 0 implies a shared
    // shingle) and still no all-pairs cartesian.
    import org.apache.spark.sql.functions._
    import graft.engine.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    val ssets = docs.select(col("doc_id"), TextOps.shingleSet(col("text"), 3).as("sset"))
    val inv = ssets.select(col("doc_id"), explode(col("sset")).as("sh"))
    val exact = inv.select(col("doc_id").as("a"), col("sh"))
      .join(inv.select(col("doc_id").as("b"), col("sh")), "sh")
      .filter(col("a") < col("b")).select("a", "b").distinct()
      .join(ssets.select(col("doc_id").as("a"), col("sset").as("sa")), "a")
      .join(ssets.select(col("doc_id").as("b"), col("sset").as("sb")), "b")
      .select(col("a"), col("b"), TextOps.jaccard(col("sa"), col("sb")).as("j"))
      .filter(col("j") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.minhashLshJaccard(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty, "corpus must contain at least one qualifying pair")
    assert(lsh == exact,
      s"LSH missed ${(exact.keySet -- lsh.keySet).mkString(", ")}; " +
        s"spurious ${(lsh.keySet -- exact.keySet).mkString(", ")}")
  }

  test("exactDedup groups by content hash and keeps the min id") {
    val groups = Dedup.exactDedup(corpus).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap // keep_id -> size
    assert(groups(0L) == 2, "docs 0 and 2 collapse into one group kept at id 0")
    assert(groups(1L) == 1 && groups(3L) == 1 && groups(4L) == 1)
  }

  test("simhashNearDup refuses a threshold the banding cannot guarantee") {
    intercept[IllegalArgumentException] { Dedup.simhashNearDup(corpus, t = 4) }
  }
}
