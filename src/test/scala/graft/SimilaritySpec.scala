package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 well-separated clusters around orthogonal axes, tiny deterministic
    * jitter per member — IVF with nprobe=1 must equal exact kNN here.
    */
  private def clustered = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 8
    } yield {
      val v = Array.fill(6)(0.01f * (i + 1))
      v(c) = 1.0f
      ((c * 8 + i).toLong, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("knnCosine: nearest neighbors of a cluster member are its cluster-mates") {
    val out = Similarity.knnCosine(clustered, nQueries = 3, k = 3).collect()
    assert(out.length == 9)
    val q0 = out.filter(_.getLong(0) == 0L).map(_.getLong(1)).toSet
    assert(q0.subsetOf((1L to 7L).toSet), s"neighbors of vec 0 must be cluster 0, got $q0")
    out.foreach(r => assert(r.getDouble(2) > 0.9))
  }

  test("knnCosine excludes self and returns exactly k per query") {
    val out = Similarity.knnCosine(clustered, nQueries = 3, k = 5).collect()
    assert(out.groupBy(_.getLong(0)).forall(_._2.length == 5))
    assert(!out.exists(r => r.getLong(0) == r.getLong(1)))
  }

  test("ivfTopK with nprobe=1 matches exact kNN on separated clusters") {
    val exact = Similarity.knnCosine(clustered, nQueries = 3, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(clustered, nQueries = 3, k = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == exact, "IVF recall must be 1.0 on separated clusters")
  }

  test("clusteredNearDup = all-pairs near-dups restricted to same-label pairs") {
    val full = Similarity.cosineNearDup(clustered, threshold = 0.9, sampleMod = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.clusteredNearDup(clustered, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val label = (id: Long) => id / 8 // construction of `clustered`
    assert(blocked == full.filter { case (a, b) => label(a) == label(b) },
      "blocked join must find exactly the same-cluster near-dup pairs")
    assert(blocked.nonEmpty)
  }

  test("centroids: one per label, correct dimensionality") {
    val cs = Similarity.centroids(clustered).collect()
    assert(cs.length == 3)
    assert(cs.forall(_.getSeq[Double](1).length == 6))
  }
}
