package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared Column builders for the text-analysis / dedup suite. All are
  * composed from codegen'd built-ins and keep exact parity with the
  * DuckDB oracle SQL (noted per function), so every query built on them
  * is hash-checkable.
  */
object TextOps {

  /** Whitespace tokens, empty-free.
    * Oracle: `list_filter(string_split_regex(trim(text),'\s+'), t -> t != '')`.
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** w-token shingles as strings; a doc with ≤ w tokens is one shingle
    * (mirrors [[graft.functions.TextHash.shingles]]).
    * Oracle: `CASE WHEN len(t) <= w THEN [array_to_string(t,' ')]
    * ELSE [array_to_string(list_slice(t,i,i+w-1),' ') FOR i IN range(1, len(t)-w+2)] END`.
    *
    * The `transform(array(toks), ts => …)` wrapper is a Column-level
    * LET BINDING, not decoration: higher-order functions run interpreted
    * (CodegenFallback), and an unbound `toks` expression referenced from
    * inside the per-index lambda — `slice(toks, i, w)` — is RE-EVALUATED
    * on every index, turning an O(T) shingling into O(T²) split+filter
    * work per document (measured 7× on the o53 text pass: 3.4 s → 0.5 s
    * at sf0.1). Binding `toks` to a lambda variable evaluates it once
    * per row; the inner lambdas then read the bound array by reference.
    */
  def shingles(toks: Column, w: Int = 3): Column =
    flatten(transform(array(toks), ts =>
      when(size(ts) <= w, array(concat_ws(" ", ts)))
        .otherwise(transform(
          sequence(lit(1), size(ts) - (w - 1)),
          i => concat_ws(" ", slice(ts, i, lit(w)))))))

  /** Distinct shingle set (string identity — exact, no hash collisions). */
  def shingleSet(text: Column, w: Int = 3): Column =
    array_distinct(shingles(tokens(text), w))

  /** Portable 32-bit hash of a string column: last 8 hex chars of md5 as
    * an unsigned int in a long.
    * Oracle: `CAST('0x' || substr(md5(x), 25, 8) AS BIGINT)`.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 25, 8), 16, 10).cast("long")

  /** Winnowing-style content fingerprint: the bottom-4 portable hashes
    * of a doc's distinct 3-shingles, dash-joined — the o27 kernel,
    * shared with the o59 incremental dedup.
    * Oracle: `array_to_string(list_slice(list_sort(list_distinct(
    * [CAST('0x'||substr(md5(x),25,8) AS BIGINT) FOR x IN s])), 1, 4), '-')`.
    */
  def fingerprint(text: Column): Column =
    array_join(
      slice(array_sort(array_distinct(
        transform(shingles(tokens(text)), hash32(_)))), 1, 4), "-")

  /** Exact Jaccard similarity of two pre-distinct string arrays, as the
    * double `|A∩B| / (|A|+|B|-|A∩B|)` — the operand order the oracle
    * uses, so the division is bit-identical.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }
}
