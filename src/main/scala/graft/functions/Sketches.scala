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

/** Bottom-k-by-hash SAMPLING sketch (min-wise / bottom-k sampling): a
  * fixed-size mergeable uniform sample of a group — the k rows whose
  * (sign-flipped row hash, value) pair is lexicographically smallest.
  * Because membership is decided by the ROW's own hash, the sample is a
  * DETERMINISTIC function of the data (merge-order-free, partitioning-
  * free, retry-stable), unlike reservoir sampling — which is what makes
  * estimates computed from it exactly reproducible by the DuckDB oracle
  * (`ROW_NUMBER() OVER (ORDER BY u, v) <= k` selects the identical
  * sample) while still being a uniform sample of the group.
  *
  * [[percentiles]] finishes the sample into interpolated quantile
  * estimates using the same two-sided weighted arithmetic as
  * [[graft.engine.Percentiles]] / Spark `percentile` / DuckDB
  * `quantile_cont` (`(c−t)·vf + (t−f)·vc`, `t = p·(n−1)`), so below k
  * group rows the answer is EXACT and above it the answer is the exact
  * quantile of a fixed uniform sample — error O(1/sqrt(k)) in rank.
  *
  * Scale posture: the shuffle carries ≤ k (hash, value) pairs per group
  * (map-side partial aggregation bounds every buffer), the same contract
  * as approx_percentile's GK summary but with a reproducible answer.
  */
object BottomKSample {

  /** Parallel arrays sorted by (hash, value) lexicographically; hashes
    * are sign-flipped so signed order == unsigned order of the original.
    */
  final case class Buf(hashes: Array[Long], values: Array[Double])

  private def lessEq(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    h1 < h2 || (h1 == h2 && v1 <= v2)

  def aggregator(k: Int, ps: Seq[Double]): Aggregator[(Long, Double), Buf, Seq[Double]] =
    new Aggregator[(Long, Double), Buf, Seq[Double]] {
      def zero: Buf = Buf(Array.empty, Array.empty)

      def reduce(b: Buf, in: (Long, Double)): Buf = {
        val h = in._1 ^ Long.MinValue
        val v = in._2
        val n = b.hashes.length
        if (n >= k && lessEq(b.hashes(n - 1), b.values(n - 1), h, v)) return b
        // insertion position: first index with (bh, bv) > (h, v)
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (lessEq(b.hashes(mid), b.values(mid), h, v)) lo = mid + 1 else hi = mid
        }
        val outLen = math.min(n + 1, k)
        val oh = new Array[Long](outLen); val ov = new Array[Double](outLen)
        System.arraycopy(b.hashes, 0, oh, 0, lo)
        System.arraycopy(b.values, 0, ov, 0, lo)
        oh(lo) = h; ov(lo) = v
        System.arraycopy(b.hashes, lo, oh, lo + 1, outLen - lo - 1)
        System.arraycopy(b.values, lo, ov, lo + 1, outLen - lo - 1)
        Buf(oh, ov)
      }

      def merge(a: Buf, b: Buf): Buf = {
        val (xh, xv, yh, yv) = (a.hashes, a.values, b.hashes, b.values)
        val outLen = math.min(xh.length + yh.length, k)
        val oh = new Array[Long](outLen); val ov = new Array[Double](outLen)
        var i = 0; var j = 0; var n = 0
        while (n < outLen) {
          val takeX = j >= yh.length ||
            (i < xh.length && lessEq(xh(i), xv(i), yh(j), yv(j)))
          if (takeX) { oh(n) = xh(i); ov(n) = xv(i); i += 1 }
          else       { oh(n) = yh(j); ov(n) = yv(j); j += 1 }
          n += 1
        }
        Buf(oh, ov)
      }

      def finish(b: Buf): Seq[Double] = {
        val sv = b.values.clone()
        java.util.Arrays.sort(sv)
        val n = sv.length
        if (n == 0) ps.map(_ => Double.NaN)
        else ps.map { p =>
          val t = p * (n - 1)
          val f = math.floor(t)
          val c = math.ceil(t)
          if (c == f) sv(f.toInt)
          else (c - t) * sv(f.toInt) + (t - f) * sv(c.toInt)
        }
      }

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Untyped-column form: interpolated percentile estimates of
    * `valueCol` from the bottom-k sample keyed by `hashCol` (a 64-bit
    * row hash — use the portable md5 hash for oracle parity).
    */
  def percentiles(hashCol: Column, valueCol: Column,
                  k: Int, ps: Seq[Double]): Column =
    udaf(aggregator(k, ps),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))(hashCol, valueCol)
}
