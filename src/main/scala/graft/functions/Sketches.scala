package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (bottom-k minimum values) distinct-count sketch as a typed
  * [[Aggregator]] — the custom-aggregate path of SURVEY §7.4: a
  * fixed-size mergeable summary, so the shuffle carries k longs per
  * group instead of the value set. Feed it 64-bit hashes (e.g.
  * `xxhash64(col)`).
  *
  * Estimator: with fewer than k distinct hashes the buffer IS the
  * distinct set (exact); otherwise the kth-smallest hash as a uniform
  * unit-interval fraction gives `estimate = (k-1) / kth` — standard KMV
  * with relative error ≈ 1/sqrt(k-2).
  */
object KmvSketch {

  /** Mergeable buffer: bottom-k distinct hashes in unsigned order. */
  final case class Buf(hashes: Array[Long])

  private def bottomK(merged: Array[Long], k: Int): Array[Long] =
    merged.distinct.sortBy(_ ^ Long.MinValue).take(k) // unsigned order

  /** Unsigned-uniform fraction of a 64-bit hash in [0, 1). */
  private def fraction(h: Long): Double =
    (h ^ Long.MinValue).toDouble / 1.8446744073709552e19 + 0.5

  def aggregator(k: Int = 256): Aggregator[Long, Buf, Long] =
    new Aggregator[Long, Buf, Long] {
      def zero: Buf = Buf(Array.empty)
      def reduce(b: Buf, h: Long): Buf = Buf(bottomK(b.hashes :+ h, k))
      def merge(a: Buf, b: Buf): Buf = Buf(bottomK(a.hashes ++ b.hashes, k))
      def finish(b: Buf): Long = {
        val n = b.hashes.length
        if (n < k) n.toLong
        else math.round((k - 1) / b.hashes.map(fraction).max)
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Untyped-column form: approximate COUNT(DISTINCT) over a 64-bit
    * hash column.
    */
  def approxDistinct(hashCol: Column, k: Int = 256): Column =
    udaf(aggregator(k), Encoders.scalaLong)(hashCol)
}
