package graft.functions

import java.security.MessageDigest
import org.apache.spark.unsafe.types.UTF8String

/** MD5-based "portable" hashing kernels: bit-identical to what ANSI SQL
  * can reproduce (`md5()` + hex-substring), so queries built on them are
  * exactly checkable against the DuckDB oracle — unlike the XXH64 kernels
  * in [[TextHash]], which are the faster production path but exist only
  * on the JVM.
  *
  * The portable 64-bit token hash is hex chars 17..32 of `md5(token)`
  * (digest bytes 8..15) read big-endian — in SQL:
  * `CAST('0x' || substr(md5(tok), 17, 16) AS UBIGINT)`.
  */
object PortableHash {

  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Digest bytes 8..15 of md5(s) as a big-endian 64-bit value. */
  def md5Hash64(s: String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var out = 0L
    var i = 8
    while (i < 16) {
      out = (out << 8) | (d(i) & 0xffL)
      i += 1
    }
    out
  }

  /** 64-bit SimHash over whitespace tokens with the portable token hash:
    * per bit, majority vote of token-hash bits (Charikar's scheme, same
    * shape as [[TextHash.simhash64]]). Tokenization parity with the SQL
    * side: `trim` + split on `\s+` + drop empties ==
    * `list_filter(string_split_regex(trim(text), '\s+'), t -> t != '')`.
    */
  def simhash64(text: UTF8String): Long = {
    val toks = TextHash.tokens(text)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = md5Hash64(toks(i))
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
}
