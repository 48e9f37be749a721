package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit text hashing kernels used by the dedup suite's
  * custom Catalyst expressions ([[SimHash64Expr]], [[MinHashExpr]]).
  *
  * Top-level object ⇒ Scala emits static forwarders, so generated Java
  * (whole-stage codegen) can call `graft.functions.TextHash.simhash64(s)`
  * directly. Hashing is Spark's own XXH64 (xxHash, the hash behind
  * `F.xxhash64`), applied to whitespace tokens / 3-token shingles.
  */
object TextHash {

  private val Seed = 42L

  private def hashToken(s: String, seed: Long): Long = {
    val utf8 = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(utf8.getBaseObject, utf8.getBaseOffset, utf8.numBytes, seed)
  }

  def tokens(text: UTF8String): Array[String] =
    text.toString.trim.split("\\s+").filter(_.nonEmpty)

  /** w-token shingles; a document shorter than w tokens is one shingle. */
  def shingles(toks: Array[String], w: Int): Array[String] =
    if (toks.length <= w) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - w + 1)(i => toks.slice(i, i + w).mkString(" "))

  /** 64-bit SimHash over whitespace tokens: per bit, majority vote of
    * token-hash bits (Charikar's scheme). Near-duplicate texts differ in
    * few bits ⇒ hamming distance ≤ t via `bit_count(a ^ b)`.
    */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hashToken(toks(i), Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** k independent MinHash signatures over w-token shingles
    * (seed = signature index). Jaccard(a, b) ≈ fraction of equal
    * signature positions.
    */
  def minhash(text: UTF8String, k: Int, w: Int): ArrayData = {
    val sh = shingles(tokens(text), w)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      var min = Long.MaxValue
      var j = 0
      while (j < sh.length) {
        val h = hashToken(sh(j), i.toLong)
        if (h < min) min = h
        j += 1
      }
      sig(i) = min
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Winnowing-style bottom-k document fingerprint: the k smallest
    * distinct shingle hashes (reference's MD5 file fingerprint idea —
    * `scripts/esplosione_dati.py:50-103` — made content-local and
    * distributable).
    */
  def bottomK(text: UTF8String, k: Int, w: Int): ArrayData = {
    val sh = shingles(tokens(text), w)
    val hs = sh.map(hashToken(_, Seed)).distinct.sorted
    new GenericArrayData(hs.take(k))
  }

  /** One-pass exact equivalent of the CCNet-style normalization chain
    * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
    * " +", " "))` — one allocation and one byte scan instead of a lower
    * pass plus two global-regex passes (each of which allocates and
    * re-walks the string).
    *
    * Exactness for ANY input, not just ASCII: lowercasing goes through
    * `UTF8String.toLowerCase` — the same kernel Spark's `Lower`
    * expression calls, so case mapping is bit-identical — and the scan
    * is byte-level, which is exact because (a) every KEPT byte
    * ([a-z0-9]) is a single-byte UTF-8 codepoint, and (b) any dropped
    * codepoint — however many bytes — contributes only to a pending
    * space run, indistinguishable after collapse from the regex's
    * one-space-per-codepoint replacement followed by `" +"` collapse
    * and trim. (A literal space is also just a dropped byte here: the
    * regex KEEPS spaces then collapses runs — same pending-space
    * outcome.)
    */
  def normalizeAlnum(text: UTF8String): UTF8String = {
    val b = text.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        out(n) = c
        n += 1
        pendingSpace = false
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }
}
