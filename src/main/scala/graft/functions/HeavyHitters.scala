package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * frequent-items companion to [[KmvSketch]]: a fixed-size mergeable
  * summary (≤ k counters), so finding the hot terms of a 100 TB token
  * stream shuffles k (term, count) pairs per group instead of the full
  * term dictionary — the classic scale path for "top n-grams over a
  * corpus" in a training-data pipeline.
  *
  * Guarantees (Misra–Gries, and Agarwal et al.'s mergeable-summaries
  * result for the merge): with true frequency f(x) over n items,
  * `f(x) - n/(k+1) <= est(x) <= f(x)`, and every x with
  * `f(x) > n/(k+1)` is retained. Below k distinct values the sketch is
  * EXACT — that regime is what the oracle-checked registry entry pins;
  * the approximate regime is property-tested in SketchSpec.
  *
  * Not SQL-deterministic across runs in the approximate regime (counter
  * evictions depend on partial-agg order), hence rows-only registration
  * there — same policy as the KMV sketch (x03).
  */
object HeavyHitters {

  /** Mergeable buffer AND output: parallel (key, count) arrays. As the
    * output it is sorted by (count desc, key) for determinism; explode
    * with `arrays_zip` downstream.
    */
  final case class Buf(keys: Array[String], counts: Array[Long])

  private def sorted(b: Buf): Buf = {
    val idx = b.keys.indices.sortBy(i => (-b.counts(i), b.keys(i)))
    Buf(idx.map(i => b.keys(i)).toArray, idx.map(i => b.counts(i)).toArray)
  }

  def aggregator(k: Int = 64): Aggregator[String, Buf, Buf] =
    new Aggregator[String, Buf, Buf] {
      def zero: Buf = Buf(Array.empty, Array.empty)

      def reduce(b: Buf, x: String): Buf = {
        val i = b.keys.indexOf(x)
        if (i >= 0) { b.counts(i) += 1; b }
        else if (b.keys.length < k)
          Buf(b.keys :+ x, b.counts :+ 1L)
        else {
          // classic MG: a miss on a full buffer decrements every counter
          // (charging the new item and k incumbents one occurrence each)
          var j = 0
          while (j < b.counts.length) { b.counts(j) -= 1; j += 1 }
          val keep = b.counts.indices.filter(b.counts(_) > 0)
          if (keep.length == b.keys.length) b
          else Buf(keep.map(i => b.keys(i)).toArray,
            keep.map(i => b.counts(i)).toArray)
        }
      }

      def merge(a: Buf, b: Buf): Buf = {
        val m = scala.collection.mutable.LinkedHashMap[String, Long]()
        a.keys.indices.foreach(i => m(a.keys(i)) = m.getOrElse(a.keys(i), 0L) + a.counts(i))
        b.keys.indices.foreach(i => m(b.keys(i)) = m.getOrElse(b.keys(i), 0L) + b.counts(i))
        if (m.size <= k) Buf(m.keys.toArray, m.values.toArray)
        else {
          // mergeable-summaries step: subtract the (k+1)th-largest count
          // from every counter and drop the non-positive ones — at most k
          // survive and the per-item undercount bound is preserved
          val cut = m.values.toArray.sortBy(-_).apply(k)
          val kept = m.iterator.map { case (key, c) => key -> (c - cut) }
            .filter(_._2 > 0).toArray
          Buf(kept.map(_._1), kept.map(_._2))
        }
      }

      def finish(b: Buf): Buf = sorted(b)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
    }

  /** Untyped-column form: MG sketch over a string column; output is a
    * struct<keys: array<string>, counts: array<bigint>> sorted by
    * (count desc, key).
    */
  def topTerms(col: Column, k: Int = 64): Column =
    udaf(aggregator(k), Encoders.STRING)(col)
}
