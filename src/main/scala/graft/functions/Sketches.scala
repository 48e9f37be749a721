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
  *
  * The buffer stores sign-FLIPPED hashes (`h ^ Long.MinValue`) sorted
  * ascending, so signed order == unsigned order of the originals; the
  * hot reduce path is an O(log k) search with an early exit once the
  * buffer is saturated and the hash exceeds its max.
  */
object KmvSketch {

  /** Mergeable buffer: bottom-k distinct flipped hashes, ascending. */
  final case class Buf(hashes: Array[Long])

  /** Uniform unit-interval fraction of a flipped hash. */
  private def fraction(x: Long): Double =
    x.toDouble / 1.8446744073709552e19 + 0.5

  private def insert(hs: Array[Long], x: Long, k: Int): Array[Long] = {
    if (hs.length >= k && x >= hs(hs.length - 1)) return hs
    val i = java.util.Arrays.binarySearch(hs, x)
    if (i >= 0) return hs // already present
    val pos = -i - 1
    val outLen = math.min(hs.length + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(hs, 0, out, 0, pos)
    out(pos) = x
    System.arraycopy(hs, pos, out, pos + 1, outLen - pos - 1)
    out
  }

  def aggregator(k: Int = 256): Aggregator[Long, Buf, Long] =
    new Aggregator[Long, Buf, Long] {
      def zero: Buf = Buf(Array.empty)
      def reduce(b: Buf, h: Long): Buf = {
        val out = insert(b.hashes, h ^ Long.MinValue, k)
        if (out eq b.hashes) b else Buf(out)
      }
      def merge(a: Buf, b: Buf): Buf = {
        // merge two sorted arrays, dedup, take k
        val (x, y) = (a.hashes, b.hashes)
        val out = new Array[Long](math.min(x.length + y.length, k))
        var i = 0; var j = 0; var n = 0
        var last = 0L; var any = false
        while (n < out.length && (i < x.length || j < y.length)) {
          val v =
            if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
            else { val v = y(j); j += 1; v }
          if (!any || v != last) { out(n) = v; n += 1; last = v; any = true }
        }
        Buf(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
      }
      def finish(b: Buf): Long = {
        val n = b.hashes.length
        if (n < k) n.toLong
        else math.round((k - 1) / fraction(b.hashes(n - 1)))
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
