package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{PortableHashFunctions, TextHashFunctions}

/** Near-duplicate detection pipelines over a `documents(doc_id, text)`
  * table — the brief's training-data dedup suite, built LSH-first so no
  * stage is ever all-pairs:
  *
  *  - [[simhashNearDup]]: SimHash → hamming-band bucketing → verify.
  *    Recall is DETERMINISTIC, not probabilistic: with 4 bands of 16 bits,
  *    a pair at hamming ≤ 3 can dirty at most 3 bands (pigeonhole), so it
  *    always shares ≥ 1 clean band and is always found.
  *  - [[minhashLshJaccard]]: MinHash signatures → banded LSH candidates →
  *    EXACT shingle-set Jaccard verify. False positives are eliminated by
  *    the verify; recall at threshold j with b bands of r rows is
  *    1-(1-j^r)^b (b=16, r=2 ⇒ per-pair miss ≈ 8e-8 at the j=0.8
  *    boundary, vanishing fast above it — probabilistic, unlike
  *    [[simhashNearDup]]'s pigeonhole guarantee).
  *
  * Scale posture — the two ways a web-scale corpus degenerates a banded
  * pipeline, and the defense for each:
  *
  *  1. IDENTICAL boilerplate (millions of byte-equal docs — the single
  *     most common real condition in training corpora). No band-key
  *     salting can split these: equal text ⇒ equal signature ⇒ equal
  *     salt. Both pipelines therefore COLLAPSE identical texts to one
  *     representative per distinct text before banding and re-expand at
  *     the end. Identical-text pairs need no verify at all — equal
  *     shingle sets have Jaccard exactly 1.0 and equal SimHash exactly
  *     hamming 0 — so the quadratic part of the OUTPUT (inherent in the
  *     pair contract, not an artifact) is emitted as trivial id pairs
  *     through a salted self-join ([[EmitSalts]]-way, so one
  *     giant group's emission spreads across tasks instead of one
  *     straggler), never through the candidate/verify machinery.
  *  2. Degenerate BAND BUCKETS of distinct texts (near-boilerplate that
  *     agrees on one band). Buckets whose representative count exceeds
  *     `maxBucket` get their band key SALTED with a signature-derived
  *     sub-band, splitting the bucket by content the colliding band
  *     does not see. SimHash: the 48 complement bits split into 4×12-bit
  *     sub-bands — a pair at hamming ≤ 3 has ≤ 3 dirty complement bits,
  *     so by the same pigeonhole it shares ≥ 1 clean sub-band and recall
  *     stays COMPLETE for t ≤ 3. MinHash: the salt is the hash of one of
  *     the 15 other bands — a true pair in a hot bucket is found iff it
  *     also agrees on some other band, adding ≤ (1-j²)^15 ≈ 2.4e-7 miss
  *     probability at j = 0.8 (on top of the curve's own 8e-8); buckets
  *     under the bound are untouched, so at testdata scales the output
  *     is bit-identical to the unsalted pipeline.
  *
  * Execution shape (round-12, hardened round-20): text is heavy and
  * hashing it is the dominant compute, so each pipeline makes exactly
  * ONE pass over the corpus text computing the group key (md5) and the
  * signature together, materialized once (eager localCheckpoint — see
  * [[projected]] for why the previous reuse-an-Exchange shape silently
  * re-ran the pass under column pruning) and read by every consumer —
  * the rep aggregation, the hot-bucket census, both band-join sides,
  * membership expansion. Text bytes are never shuffled: only 32-char
  * keys, fixed-size signatures and ids move. The one other text pass is
  * the MinHash verify's shingling, and it is candidate-pruned
  * (broadcast semi-join, plan-audited).
  *
  * Bucket skew is thereby bounded: ≤ 65k buckets per SimHash band index
  * with hot ones split 4×4096-way; MinHash hot buckets split by 15
  * independent band hashes. Docs agreeing on MANY bands remain mutual
  * candidates by design — that is the LSH recall curve speaking, and
  * pruning them would silently change the operator's contract.
  */
object Dedup {

  /** Representative-count bound above which a band bucket's key gets
    * salted. 2000² candidate pairs per bucket is the order of one
    * shuffle partition's comfortable join work; testdata corpora never
    * reach it, adversarial corpora (DedupSpec) do.
    */
  val DefaultMaxBucket = 2000

  /** Fan-out of the identical-group pair emission self-join: group
    * members are hashed into this many sub-streams on the build side
    * and replicated on the probe side, so a single million-member
    * group emits its (inherently quadratic) output across EmitSalts
    * tasks instead of one.
    */
  val EmitSalts = 16

  // single-split corpora are spread via the shared gated probe
  // ([[Spread]]) before the compute-bound hash pass
  private def spread(docs: DataFrame): DataFrame = Spread(docs)

  /** The single corpus-text pass: (doc_id, gkey = md5(text), sig),
    * MATERIALIZED once (eager localCheckpoint) so every downstream
    * consumer — the rep aggregation, the hot-bucket census, both
    * band-join sides, the membership/expansion frames — reads the same
    * computed blocks. Round 20: this was previously a repartition
    * Exchange relying on reuse, but column pruning CLONES such an
    * exchange per projection width (the members consumer needs no sig,
    * so Catalyst planned a narrower copy whose map side re-ran the
    * text pass — the o22 sf0.1 plan carried 10+ planned instances of
    * `minhashexpr(text)`, ≥2 of them executed). The checkpoint is a
    * hard materialization barrier no optimizer rule can split, so the
    * signature pass runs EXACTLY once by construction. Signatures of
    * duplicate members are computed (not just reps') — that trade buys
    * never shuffling text: the blocks carry ~300 bytes/doc (id +
    * 32-char key + fixed-size signature), ~0.3% of the corpus bytes.
    * Block residue: the checkpoint frame is the returned pipeline's
    * lineage root, so the callee cannot release it; the ≈300 B/doc
    * blocks are freed by the caller's terminal action + periodic GC —
    * the same bounded trade as lloydCentroids' final codebook, and
    * strictly smaller than the shuffle files the cloned exchanges
    * wrote.
    */
  private def projected(docs0: DataFrame, sig: Column, sigName: String): DataFrame =
    spread(docs0)
      .select(col("doc_id"), md5(col("text")).as("gkey"), sig.as(sigName))
      .localCheckpoint(true)

  /** All intra-group pairs (a < b) of multi-member identical-text
    * groups, via the EmitSalts-way salted self-join: the a-side keeps
    * one salt per member, the b-side is replicated to every salt, so
    * each unordered pair joins exactly once (at the a-member's salt)
    * and a giant group's quadratic emission is spread across tasks.
    */
  private def withinGroupPairs(members: DataFrame, multi: DataFrame): DataFrame = {
    val mm = members.join(multi, Seq("gkey"), "left_semi")
    val a = mm.select(col("gkey"), col("doc_id").as("a"))
      .withColumn("es", pmod(hash(col("a")), lit(EmitSalts)))
    val b = mm.select(col("gkey"), col("doc_id").as("b"),
      explode(sequence(lit(0), lit(EmitSalts - 1))).as("es"))
    a.join(b, Seq("gkey", "es"))
      .filter(col("a") < col("b"))
      .select("a", "b")
  }

  /** Representative-level pairs expanded to member-level pairs: every
    * member of group ga pairs with every member of gb, carrying the
    * representatives' similarity value (identical texts ⇒ identical
    * signatures and shingle sets, so the value is exact for every
    * expanded pair). Most groups are singletons, so AQE broadcasts the
    * (small) pair side and the expansion is ~a rename; only genuinely
    * quadratic outputs expand quadratically.
    */
  private def expandGroups(repPairs: DataFrame, members: DataFrame, valueCol: String): DataFrame =
    repPairs
      .join(members.select(col("gkey").as("ga"), col("doc_id").as("xa")), "ga")
      .join(members.select(col("gkey").as("gb"), col("doc_id").as("xb")), "gb")
      .select(least(col("xa"), col("xb")).as("a"),
        greatest(col("xa"), col("xb")).as("b"), col(valueCol))

  /** Band-bucket occupancy marker: the (tiny, broadcast) set of band
    * buckets holding more than maxBucket representatives. Map-side
    * partial aggregation keeps the count pass skew-proof.
    */
  private def hotBuckets(banded: DataFrame, maxBucket: Int): DataFrame =
    broadcast(banded.groupBy("j", "band").count()
      .filter(col("count") > maxBucket)
      .select(col("j"), col("band"), lit(true).as("hot")))

  /** Pairs of docs with SimHash hamming distance ≤ t, found via
    * 4×16-bit band bucketing (complete for t ≤ 3 by pigeonhole), with
    * identical-text collapse and hot-bucket sub-band salting (see the
    * object doc for why recall stays complete under both). Uses the
    * portable (md5-token) SimHash so the result is oracle-checkable; the
    * XXH64 kernel [[graft.functions.TextHash.simhash64]] is the drop-in
    * production hash (same pipeline, ~3× faster signature pass).
    */
  def simhashNearDup(docs0: DataFrame, t: Int = 3,
                     maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(t <= 3, s"4-band/16-bit bucketing guarantees recall only for t <= 3, got $t")
    val proj = projected(docs0,
      PortableHashFunctions.simhashPortable64(col("text")), "s")
    val members = proj.select(col("gkey"), col("doc_id"))
    val reps = proj.groupBy(col("gkey"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("s")).as("s"),
        count(lit(1)).as("gn"))
    val multi = reps.filter(col("gn") > 1).select("gkey")
    val banded = reps
      .withColumn("j", explode(sequence(lit(0), lit(3))))
      .withColumn("band", expr("(s >> (j * 16)) & 65535"))
    // hot buckets split by 4×12-bit sub-bands of the 48 complement
    // bits (the signature minus the colliding band): ≤ 3 diffs dirty
    // ≤ 3 of 4 sub-bands, so a qualifying pair shares a clean one
    val salted = banded
      .join(hotBuckets(banded, maxBucket), Seq("j", "band"), "left")
      .withColumn("m", explode(
        when(col("hot"), sequence(lit(0), lit(3))).otherwise(array(lit(-1)))))
      .withColumn("salt", when(col("m") >= 0, expr(
        "shiftrightunsigned(" +
          "(s & (shiftleft(cast(1 as bigint), j*16) - 1)) | " +
          "shiftleft(if(j = 3, cast(0 as bigint), shiftrightunsigned(s, (j+1)*16)), j*16)" +
          ", m*12) & 4095")).otherwise(lit(0L)))
    // alias self-join (NOT two renamed projections): both sides are the
    // identical plan, so their shuffles dedup via exchange reuse
    val A = salted.alias("A")
    val B = salted.alias("B")
    val repPairs = A.join(B,
        col("A.j") === col("B.j") && col("A.band") === col("B.band") &&
          col("A.m") === col("B.m") && col("A.salt") === col("B.salt") &&
          col("A.doc_id") < col("B.doc_id"))
      .select(col("A.doc_id").as("a"), col("B.doc_id").as("b"),
        col("A.gkey").as("ga"), col("B.gkey").as("gb"),
        bit_count(col("A.s").bitwiseXOR(col("B.s"))).cast("long").as("hamming"))
      .filter(col("hamming") <= t)
      .distinct() // a pair can match in multiple (sub-)bands
    expandGroups(repPairs, members, "hamming")
      .unionByName(withinGroupPairs(members, multi)
        .withColumn("hamming", lit(0L)))
  }

  /** Rep-level LSH candidate pairs (a, b, ga, gb) plus the collapse
    * frames: banded MinHash with identical-text collapse and hot-bucket
    * other-band salting. Exposed at package level so the adversarial
    * spec can assert the candidate set stays bounded where the unsalted
    * join would go quadratic.
    */
  private[graft] def minhashRepCandidates(docs0: DataFrame, k: Int = 32,
                                          bandRows: Int = 2, w: Int = 3,
                                          maxBucket: Int = DefaultMaxBucket)
  : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(k % bandRows == 0, "k must be divisible by bandRows")
    val nBands = k / bandRows
    val proj = projected(docs0, TextHashFunctions.minhash(col("text"), k, w), "sig")
    val members = proj.select(col("gkey"), col("doc_id"))
    val reps = proj.groupBy(col("gkey"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("sig")).as("sig"),
        count(lit(1)).as("gn"))
    val multi = reps.filter(col("gn") > 1).select("gkey")
    val banded = reps
      .withColumn("j", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("band", expr(
        (0 until bandRows).map(r => s"sig[j * $bandRows + $r]").mkString("struct(", ", ", ")")))
    // hot buckets split by the hash of one of the OTHER bands: a true
    // pair colliding in a hot bucket is re-found iff it also agrees on
    // some other band — ≤ (1-j²)^(nBands-1) added miss probability,
    // zero effect on buckets under the bound
    val salted = banded
      .join(hotBuckets(banded, maxBucket), Seq("j", "band"), "left")
      .withColumn("m", explode(
        when(col("hot"), filter(sequence(lit(0), lit(nBands - 1)), x => x =!= col("j")))
          .otherwise(array(lit(-1)))))
      .withColumn("salt", when(col("m") >= 0, expr(
        (0 until bandRows).map(r => s"sig[m * $bandRows + $r]")
          .mkString("xxhash64(", ", ", ")"))).otherwise(lit(0L)))
      .select(col("doc_id"), col("gkey"), col("j"), col("band"), col("m"), col("salt"))
    // alias self-join: identical child plans, one deduped exchange
    val A = salted.alias("A")
    val B = salted.alias("B")
    val cand = A.join(B,
        col("A.j") === col("B.j") && col("A.band") === col("B.band") &&
          col("A.m") === col("B.m") && col("A.salt") === col("B.salt") &&
          col("A.doc_id") < col("B.doc_id"))
      .select(col("A.doc_id").as("a"), col("B.doc_id").as("b"),
        col("A.gkey").as("ga"), col("B.gkey").as("gb"))
      .distinct()
    (cand, members, reps, multi)
  }

  /** Pairs of docs with exact w-shingle Jaccard ≥ threshold, candidate-
    * generated by banded MinHash LSH (k signatures, bands of `bandRows`)
    * and verified on exact distinct-shingle STRING sets (no hash in the
    * verify ⇒ zero collision risk; the MinHash signatures only gate which
    * pairs get verified). Identical-text pairs bypass the verify with
    * Jaccard exactly 1.0 (equal sets), matching what the verify would
    * compute.
    */
  def minhashLshJaccard(docs0: DataFrame, threshold: Double = 0.8,
                        k: Int = 32, bandRows: Int = 2, w: Int = 3,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (repPairs, members, multi) =
      minhashVerifiedRepPairs(docs0, threshold, k, bandRows, w, maxBucket)
    expandGroups(repPairs, members, "jaccard")
      .unionByName(withinGroupPairs(members, multi)
        .withColumn("jaccard", lit(1.0))
        .filter(lit(1.0) >= threshold))
  }

  /** Verified rep-level LSH pairs plus the collapse frames — the shared
    * core of [[minhashLshJaccard]] (which expands them to the full
    * member-level pair contract) and [[minhashLshClusterEdges]] (which
    * only needs their CONNECTIVITY).
    */
  private def minhashVerifiedRepPairs(docs0: DataFrame, threshold: Double,
                                      k: Int, bandRows: Int, w: Int,
                                      maxBucket: Int)
  : (DataFrame, DataFrame, DataFrame) = {
    val (cand, members, _, multi) =
      minhashRepCandidates(docs0, k, bandRows, w, maxBucket)
    // Shingle only the CANDIDATE reps: the exact-Jaccard verify needs
    // shingle sets for reps that appear in a candidate pair — a small
    // fraction of the corpus by LSH design — but Catalyst will not move
    // a selective join below an expensive projection on its own, so a
    // naive `docs.select(shingleSet)` re-shingles the whole corpus and
    // ships the (heavy, array-of-string) sets into both verify joins.
    // candIds is bounded by the LSH collision rate, so the semi-join is
    // pinned to a broadcast (plan-audited in PlanAuditSpec), keeping
    // the corpus side shuffle-free.
    val candIds = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id")))
      .distinct()
    // the LENGTH filter (|A∩B|/|A∪B| ≥ τ ⇒ min(na,nb) ≥ τ·max(na,nb))
    // prunes pairs on two already-joined ints before any set is touched —
    // LSH collisions between very differently-sized docs never pay the
    // intersect. The 1e-9 epsilon errs toward verifying MORE pairs, never
    // fewer (τ·n in doubles can land an ulp above the exact boundary).
    // Deliberately NOT the sorted-long-merge verify o53 uses: LSH keeps
    // the candidate count small enough that array_intersect is off the
    // critical path, and A/B timing showed the per-doc array_sort +
    // kernel bundle costing ~2× here (sf0.1 warm 7.0 s vs 3.7 s).
    val eps = 1e-9
    val ssets = spread(docs0).join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), TextOps.shingleSet(col("text"), w).as("sset"))
      .withColumn("n", size(col("sset")))
    val repPairs = cand
      .join(ssets.select(col("doc_id").as("a"), col("sset").as("sa"), col("n").as("na")), "a")
      .join(ssets.select(col("doc_id").as("b"), col("sset").as("sb"), col("n").as("nb")), "b")
      .filter(least(col("na"), col("nb")) >=
        lit(threshold) * greatest(col("na"), col("nb")) - lit(eps))
      .select(col("a"), col("b"), col("ga"), col("gb"),
        TextOps.jaccard(col("sa"), col("sb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (repPairs, members, multi)
  }

  /** A LINEAR-size edge set with the same CONNECTIVITY as
    * [[minhashLshJaccard]]'s member-level pair output — the right input
    * for connected components (o54), where the full pair contract's
    * quadratic identical-group cliques and cross-group expansions buy
    * nothing: a clique and a star connect the same vertex set.
    *
    * Edges: (1) verified rep-level pairs (a, b) — both endpoints are
    * group minima, exactly the pairs [[expandGroups]] would fan out to
    * every member combination; (2) intra-group STARS (rep → member) for
    * multi-member groups — the [[withinGroupPairs]] clique collapsed to
    * gn − 1 edges per group. Equivalence, both directions: every star /
    * rep edge appears in the full pair set (rep = min member, so
    * (rep, member) ∈ withinGroupPairs and (repA, repB) ∈ the expansion);
    * every full-set pair (xa ∈ ga, xb ∈ gb) is a path
    * xa — rep(ga) — rep(gb) — xb over these edges. Components, and so
    * o54's (doc_id, comp, is_kept) output, are hash-identical — while
    * the edge build drops the two expansion joins, the salted
    * within-group self-join, AND the downstream distinct over a
    * worst-case quadratic pair list (a million-doc boilerplate group is
    * 10¹² pairs but 10⁶ − 1 star edges).
    */
  def minhashLshClusterEdges(docs0: DataFrame, threshold: Double = 0.8,
                             k: Int = 32, bandRows: Int = 2, w: Int = 3,
                             maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (repPairs, members, multi) =
      minhashVerifiedRepPairs(docs0, threshold, k, bandRows, w, maxBucket)
    val reps = members.groupBy(col("gkey")).agg(min(col("doc_id")).as("rep"))
    val stars = members.join(multi, Seq("gkey"), "left_semi")
      .join(reps, "gkey")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a"), col("doc_id").as("b"))
      .filter(lit(1.0) >= threshold) // withinGroupPairs' threshold gate
    repPairs.select(col("a"), col("b")).unionByName(stars)
  }

  /** o54's composed form — [[connectedComponents]] over
    * [[minhashLshJaccard]]'s pair graph, computed WITHOUT ever feeding
    * members through the label loop: the iteration runs on the verified
    * REP-level pairs only, and group members attach with one post-loop
    * join. Equivalence with CC over the member-level graph (skeleton or
    * full clique expansion — all three have the same connectivity, see
    * [[minhashLshClusterEdges]]):
    *
    *  - a member m of group g reaches other nodes only through rep(g)
    *    (identical-text membership plus rep-level pairs are the only
    *    connectivity sources), so comp(m) = comp(rep(g));
    *  - rep labels over the rep-pair graph are exactly [[ccLabels]]'s
    *    output, with unpaired reps labelling themselves — and since
    *    rep(g) = min(g) ≤ m, the component minimum over member-level
    *    reachability equals the minimum over rep-level reachability;
    *  - every doc has a gkey, so `members ⋈ reps` covers the corpus the
    *    way connectedComponents' docs-join does.
    *
    * What this buys at scale: the loop's per-round frames shrink from
    * O(|dup members| + |pairs|) to O(|pairs|) rows — a boilerplate-heavy
    * corpus (millions of identical-text members, the documented worst
    * case) pays for its duplicates exactly once, in the final attach
    * join, instead of once per CC round — and the skeleton's star-edge
    * build (semi-join + reps join + union into the loop's distinct)
    * drops out of the plan entirely. The degenerate threshold > 1 gate
    * ([[withinGroupPairs]]' emission filter) is preserved: there the
    * pair set is empty AND stars never existed, so every doc is its own
    * component.
    */
  def minhashLshComponents(docs0: DataFrame, threshold: Double = 0.8,
                           k: Int = 32, bandRows: Int = 2, w: Int = 3,
                           maxBucket: Int = DefaultMaxBucket,
                           maxIter: Int = 30): DataFrame = {
    val (repPairs, members, _) =
      minhashVerifiedRepPairs(docs0, threshold, k, bandRows, w, maxBucket)
    val labels = ccLabels(repPairs.select(col("a"), col("b")), maxIter)
      .withColumnRenamed("id", "rep")
    val reps = members.groupBy(col("gkey")).agg(min(col("doc_id")).as("rep"))
    // threshold > 1 severs the member→rep attachment exactly as it
    // suppressed the skeleton's star edges (and empties repPairs, since
    // jaccard ≤ 1): every doc then labels itself.
    val anchor = if (threshold <= 1.0) col("rep") else col("doc_id")
    members.join(reps, "gkey")
      .join(labels, Seq("rep"), "left")
      .select(col("doc_id"), coalesce(col("comp"), anchor).as("comp"))
      .withColumn("is_kept", col("doc_id") === col("comp"))
  }

  /** Exact duplicate groups by full-text hash — the scale-safe exact
    * dedup (shuffle buckets by md5, never compares texts pairwise).
    * Same shape as query o03; here returning one row per KEPT doc with
    * its group size, the "drop duplicates, keep first" contract.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("group_size"))

  /** EXACT n-gram Jaccard near-dup — all pairs with w-shingle Jaccard ≥
    * threshold, with ZERO recall loss (the complement of
    * [[minhashLshJaccard]]: that one trades a vanishing miss probability
    * for never materializing corpus-sized postings; this one pays the
    * postings shuffle for a recall GUARANTEE). Candidate generation is
    * the public AllPairs/PPJoin prefix-filtering scheme (Bayardo et al.,
    * WWW'07; Xiao et al., WWW'08):
    *
    *  - order all shingles globally by (document frequency, shingle)
    *    ascending — rarest first;
    *  - a doc with n distinct shingles indexes only its PREFIX, the
    *    first `n - ⌈τ·n⌉ + 1` shingles under that order. If
    *    J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉, and the globally
    *    smallest common shingle must sit inside BOTH prefixes
    *    (pigeonhole: fewer than ⌈τ·n⌉ non-common shingles fit after
    *    it), so the postings self-join on prefix shingles finds every
    *    qualifying pair — a superset, trimmed by the exact verify;
    *  - the length filter drops (a, b) with τ·max(na, nb) > min(na, nb)
    *    before the verify — such pairs cannot reach τ even if one set
    *    contains the other;
    *  - the POSITIONAL filter (PPJoin's second idea) prunes per PAIR:
    *    both docs' shingle lists are sorted by the same global (df,
    *    shingle) key, so the matched shingle at min rank on the a side
    *    is the one at min rank on the b side — the pair's globally
    *    first common shingle s* (no common shingle can precede it:
    *    it would sit inside both prefixes, a join match with a smaller
    *    rank). Every other common shingle sits after s* on both sides,
    *    so |A∩B| ≤ 1 + min(na − ra, nb − rb) at s*'s ranks; pairs where
    *    that bound can't reach α = ⌈τ/(1+τ)·(na+nb)⌉ (the J ≥ τ overlap
    *    requirement) are dropped before any set is touched;
    *  - the pair-dedup groupBy then ACCUMULATES the positional bound
    *    over all of a pair's prefix matches (PPJoin's running ubound,
    *    batch-shaped): a pair matching on op prefix shingles with last
    *    match at ranks (ra*, rb*) satisfies |A∩B| ≤ op + min(na − ra*,
    *    nb − rb*) — any common shingle ordered before the last match
    *    would sit inside both prefixes (ranks are co-monotone with the
    *    one global order) and so would itself be a join match, and the
    *    rest come after (ra*, rb*) on BOTH sides. The groupBy replaces
    *    the DISTINCT the pair-dedup needs anyway, so the tighter cut is
    *    free — same shuffle, fewer pairs reaching the verify.
    *
    * Degenerate inputs: identical texts collapse to one representative
    * per distinct text FIRST (md5 group key, ids-only aggregation), so
    * boilerplate floods neither the postings index nor the candidate
    * join; pair output is re-expanded at the end exactly as
    * [[minhashLshJaccard]] does. Near-identical boilerplate is what the
    * df-ascending order defends against: a shingle shared by millions of
    * reps has huge df, so it enters a doc's prefix only when ALL the
    * doc's shingles are that common — the posting lists that drive the
    * join stay rare-shingle-sided.
    *
    * Scale posture, stated honestly: the corpus TEXT is scanned exactly
    * once; the pinned exchange carries per-doc shingle sets (~w× the
    * text bytes) and the postings derived from them are corpus-sized,
    * so this operator still shuffles O(corpus) (df count is map-side
    * combined; the per-doc prefix rank sorts each doc's shingles
    * locally). That is the inherent price of exactness — at 100 TB the
    * LSH pipeline is the default and this is the audit/contract tool,
    * the same division of labor as o30 (sampled exact) vs o42
    * (clustered) for embeddings.
    *
    * FP hygiene: ⌈τ·n⌉ is computed as `ceil(τ·n − 1e-9)` and the length
    * filter as `min ≥ τ·max − 1e-9`: τ·n in doubles can land an ulp
    * ABOVE the exact integer (0.6·5 = 3.0000000000000004), which would
    * silently shorten the prefix / drop a boundary pair — recall loss.
    * The epsilon errs toward MORE candidates, never fewer, and the
    * exact verify keeps the output unchanged.
    */
  def ngramJaccardNearDup(docs0: DataFrame, threshold: Double,
                          w: Int = 2): DataFrame = {
    val eps = 1e-9
    // ONE text pass (the projected() pattern): (doc_id, gkey, sset)
    // behind a single pinned Exchange feeding every consumer — the rep
    // aggregation, the membership/expansion frames, AND the shingle
    // pipeline. Shingling duplicate members too is the trade projected()
    // documents: the exchange carries the w-shingle sets (~w× the text
    // bytes) so the corpus text is scanned once and never re-read. The
    // previous shape shingled reps only, but paid a SECOND full text
    // scan plus a rep semi-join for it — more bytes read than the
    // member shingles cost to carry whenever the dup rate is moderate,
    // and a third more stages for the scheduler to launch (the dominant
    // per-query cost on a loaded cluster).
    val keyed = projected(docs0, TextOps.shingleSet(col("text"), w), "sset")
    val members = keyed.select(col("gkey"), col("doc_id"))
    val reps = keyed.groupBy(col("gkey"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("gn"),
        first(col("sset")).as("sset"))
    val multi = reps.filter(col("gn") > 1).select("gkey")
    // reps' shingle sets, re-pinned on doc_id: the postings explode is
    // read by both the vocabulary pass and the sid join below.
    val ss = reps
      .select(col("doc_id"), col("sset"), size(col("sset")).as("n"))
      .repartition(col("doc_id"))
    val posts = ss.select(col("doc_id"), col("n"), explode(col("sset")).as("sh"))
    // unique LONG id per distinct shingle, fully declaratively: bucket
    // by hash, rank within bucket, sid = rn·B + bucket — injective by
    // construction (collision-FREE, unlike hashing the shingle), no
    // global sort, no single-partition window; the per-bucket window is
    // a vocabulary-sized shuffle, the same cost class as the df count.
    // Everything downstream — prefix join key, positional ranks, verify
    // sets — runs on longs: the per-pair merge then reads primitives
    // out of unsafe arrays with zero allocation, where string sets cost
    // an object per element access (~1e9 allocations at sf0.1's 2.4M
    // candidate pairs — the old verify's actual bottleneck).
    val B = 1 << 20
    val sids = posts.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .withColumn("bkt", pmod(xxhash64(col("sh")), lit(B.toLong)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("sh"))))
      .select(col("sh"), col("df"),
        (col("rn").cast("long") * B + col("bkt")).as("sid"))
    val postsSid = posts.join(sids, "sh")
      .select(col("doc_id"), col("n"), col("df"), col("sid"))
      .repartition(col("doc_id"))
    val prefixLen = col("n") - ceil(lit(threshold) * col("n") - lit(eps)) + 1
    val ranked = postsSid
      .withColumn("r", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sid"))))
      .filter(col("r") <= prefixLen)
      .select(col("sid"), col("doc_id"), col("n"), col("r"))
    // per-doc sorted-long shingle sets for the verify merge
    val isets = postsSid.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sid"))).as("iset"), first(col("n")).as("n"))
    // alias self-join on the prefix postings (both sides read the one
    // pinned postsSid exchange below the shared rank window). The length
    // filter AND the positional filter are both inside the JOIN
    // CONDITION, pruning rows before they are ever
    // emitted: 1+min(na−ra, nb−rb) ≥ α ⟺ ra ≤ na−α+1 ∧ rb ≤ nb−α+1,
    // and since a pair's matches have co-monotone ranks on both sides
    // (one shared global order), a qualifying pair's FIRST match always
    // passes while every match of a positionally-hopeless pair fails —
    // row-level filtering equals pair-level filtering, at join-output
    // size instead of after a groupBy over it.
    // ASYMMETRIC prefixes (Xiao et al.'s index-prefix refinement): order
    // pairs by (n, doc_id) instead of doc_id, so the structurally
    // SMALLER doc S of every pair is known at plan time — and S only
    // needs the short 2τ/(1+τ) index prefix: its partners all have
    // n ≥ S.n, so α = ⌈τ/(1+τ)(nS+nL)⌉ ≥ ⌈2τ/(1+τ)·nS⌉, and the pair's
    // globally-first common shingle s* sits within S's first nS − α + 1
    // ≤ short-prefix positions (and within L's τ-prefix, via the length
    // filter's nS ≥ τ·nL). Honest accounting, probe-measured: the JOIN
    // OUTPUT is unchanged — the per-pair positional condition below
    // (r ≤ n − α + 1) already implies the short-prefix bound row-wise —
    // but that condition only fires join-side, AFTER the exchange. This
    // standalone filter commutes below it: at τ = 0.6 the index side
    // ships 0.25n instead of 0.4n postings into the join's shuffle and
    // sort (−36% measured at sf0.1), zero recall loss.
    val shortLen = col("n") -
      ceil(lit(2.0 * threshold / (1.0 + threshold)) * col("n") - lit(eps)) + 1
    val A = ranked.filter(col("r") <= shortLen).alias("A")
    val Bs = ranked.alias("B")
    val alpha = ceil(lit(threshold / (1.0 + threshold)) *
      (col("A.n") + col("B.n")) - lit(eps))
    // Pair dedup doubles as the ACCUMULATED positional cut (see the
    // scheme note above): op prefix matches with last match at ranks
    // (mra, mrb) bound |A∩B| by op + min(na − mra, nb − mrb); pairs
    // whose bound can't reach α die here, before any set is joined.
    // max/first aggregate with partial (map-side) combine, so this is
    // the same shuffle DISTINCT would have paid. (a, b) is orientation-
    // normalized downstream by expandGroups' least/greatest.
    val cand = A.join(Bs,
        col("A.sid") === col("B.sid") &&
          (col("A.n") < col("B.n") ||
            (col("A.n") === col("B.n") && col("A.doc_id") < col("B.doc_id"))) &&
          col("A.n") >= lit(threshold) * col("B.n") - lit(eps) &&
          col("A.r") <= col("A.n") - alpha + 1 &&
          col("B.r") <= col("B.n") - alpha + 1)
      .select(col("A.doc_id").as("a"), col("B.doc_id").as("b"),
        col("A.n").as("pna"), col("B.n").as("pnb"),
        col("A.r").as("ra"), col("B.r").as("rb"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("op"), max(col("ra")).as("mra"),
        max(col("rb")).as("mrb"),
        first(col("pna")).as("pna"), first(col("pnb")).as("pnb"))
      .filter(col("op") +
        least(col("pna") - col("mra"), col("pnb") - col("mrb")) >=
        ceil(lit(threshold / (1.0 + threshold)) *
          (col("pna") + col("pnb")) - lit(eps)))
      .select(col("a"), col("b"))
    val inter = graft.functions.SetKernelFunctions
      .sortedIntersectSizeLong(col("sa"), col("sb")).cast("double")
    val repPairs = cand
      .join(isets.select(col("doc_id").as("a"), col("iset").as("sa"), col("n").as("na")), "a")
      .join(isets.select(col("doc_id").as("b"), col("iset").as("sb"), col("n").as("nb")), "b")
      .join(members.select(col("gkey").as("ga"), col("doc_id").as("a")), "a")
      .join(members.select(col("gkey").as("gb"), col("doc_id").as("b")), "b")
      .select(col("a"), col("b"), col("ga"), col("gb"),
        (inter / (col("na") + col("nb") - inter).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    expandGroups(repPairs, members, "jaccard")
      .unionByName(withinGroupPairs(members, multi)
        .withColumn("jaccard", lit(1.0))
        .filter(lit(1.0) >= threshold))
  }

  /** Incremental dedup of a NEW ingest batch against an already-ingested
    * HISTORY corpus, keyed on the winnowing content fingerprint
    * ([[TextOps.fingerprint]], the o27 kernel) — the content-level
    * generalization of the reference's file-level MD5 manifest skip
    * (`scripts/bronze_incremental.py:125-133`): a batch doc is dropped
    * iff some history doc carries the same fingerprint.
    *
    * The naive plan is a fingerprint anti-join — which re-shuffles the
    * ENTIRE history corpus on every nightly batch, the single worst
    * recurring cost a 100 TB ingest pipeline can sign up for. Here the
    * anti-join is demoted to a residual verify behind a Bloom prefilter:
    *
    *  1. a Bloom filter over history fingerprints is built with one
    *     map-side-combined aggregate pass (`stat.bloomFilter` runs a
    *     treeAggregate of partial filters — history rows never shuffle)
    *     and broadcast to the batch side;
    *  2. Bloom-NEGATIVE batch docs — the overwhelming majority of a
    *     fresh crawl — are definitely-new (a Bloom has no false
    *     negatives) and flow straight to the output, shuffle-free;
    *  3. only Bloom-POSITIVE docs (true dups + the fpp sliver) enter the
    *     verify: their fingerprints broadcast-semi-prune history map-side
    *     first, so the residual anti-join is candidate-sized on BOTH
    *     sides no matter how large history grows.
    *
    * The output is EXACT — identical to the plain anti-join for every
    * possible Bloom outcome — so the DuckDB oracle is a clean NOT
    * EXISTS; fpp only moves work between paths 2 and 3. Production note:
    * Bloom filters are mergeable, so a real pipeline persists the
    * history filter in the ingest manifest (the analog of the
    * reference's `tech.tech_processed_files`) and unions in each batch's
    * partial filter instead of re-scanning history — step 1 here stands
    * in for that lookup. The scalar `mightContainString` probe is a
    * (deterministic) Scala UDF: Spark exposes no public Bloom
    * expression, and the probe sits on the map-only prefilter path, not
    * in any result-defining compute.
    */
  def incrementalFingerprintDedup(batch0: DataFrame, history0: DataFrame,
                                  expectedHistoryItems: Long = 1L << 20,
                                  fpp: Double = 0.01): DataFrame = {
    def fp(df: DataFrame): DataFrame =
      spread(df).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint"))
    val hist = fp(history0)
    // the batch fingerprints have THREE consumers (Bloom-negative
    // filter, Bloom-positive filter, candidate-fingerprint distinct) —
    // MATERIALIZED once (eager localCheckpoint, the projected() barrier,
    // round 20). The previous repartition pin was double-defeated by the
    // optimizer: column pruning cloned the exchange per consumer (three
    // separate scan→fingerprint stages), and because the Bloom-probe UDF
    // is deterministic, Catalyst pushed the filter BELOW the fingerprint
    // projection — re-deriving the whole winnowing chain inside the
    // Filter condition to feed the UDF, then computing it AGAIN in the
    // Project (guide §4.4's duplicated-evaluation shape): ~6 fingerprint
    // passes over the batch text for one logical pass. The checkpoint is
    // a barrier no rule can split or push through, so the batch text is
    // read and fingerprinted exactly once. History gets no such pin on
    // purpose: its two map-only passes (Bloom build, semi-prune) stand
    // in for a persisted fingerprint manifest and history rows never
    // enter an exchange.
    val batch = fp(batch0).localCheckpoint(true)
    val bloom = hist.stat.bloomFilter("fingerprint", expectedHistoryItems, fpp)
    val bloomB = batch0.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((f: String) => bloomB.value.mightContainString(f))
    val freshByBloom = batch.filter(!mightContain(col("fingerprint")))
    val maybeDup = batch.filter(mightContain(col("fingerprint")))
    val prunedHist = hist.join(
      broadcast(maybeDup.select("fingerprint").distinct()),
      Seq("fingerprint"), "left_semi")
    val verified = maybeDup.join(prunedHist, Seq("fingerprint"), "left_anti")
    freshByBloom.select("doc_id", "fingerprint")
      .unionByName(verified.select("doc_id", "fingerprint"))
  }

  /** Normalization-equivalence dedup (the CCNet/RefinedWeb "fuzzy exact"
    * tier between raw-hash exact dedup and the probabilistic near-dup
    * family): docs whose texts agree after lowercasing, mapping every
    * non-alphanumeric to a space, collapsing runs of spaces, and
    * trimming are one group; the minimum doc_id is kept and every doc
    * gets a `(doc_id, norm_md5, is_kept, n_dups)` ledger row.
    *
    * Scale shape: the normalization chain and md5 are MAP-SIDE builtins,
    * so the only shuffle carries (doc_id, 32-byte key) pairs — corpus
    * text never enters the Exchange; group stats ride one norm_md5
    * window. The regex class is RE2-compatible and the md5 is the
    * portable cross-engine convention used by every other hash here.
    */
  def normalizedDedup(docs: DataFrame): DataFrame = {
    // one-pass codegen'd kernel, proven byte-identical to the builtin
    // trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
    // " +", " ")) chain in TextHashSpec — one scan + one allocation
    // instead of a lower pass and two global-regex passes
    val norm = graft.functions.TextHashFunctions.normalizeAlnum(col("text"))
    val keyed = Spread(docs).select(col("doc_id"), md5(norm).as("norm_md5"))
    val w = Window.partitionBy(col("norm_md5"))
    keyed
      .withColumn("n_dups", count(lit(1)).over(w))
      .withColumn("is_kept", col("doc_id") === min(col("doc_id")).over(w))
      .select(col("doc_id"), col("norm_md5"), col("is_kept"), col("n_dups"))
  }

  /** Connected components over a near-dup PAIR graph — the step that
    * turns pairwise dedup output into actionable CLUSTERS with a
    * keep-one policy: every doc gets `(doc_id, comp, is_kept)` where
    * `comp` is the minimum doc_id reachable through the pair graph
    * (singletons map to themselves) and `is_kept` marks the canonical
    * survivor. A training pipeline drops `!is_kept` rows.
    *
    * Algorithm: distributed min-label propagation PLUS path halving,
    * the two-rule iteration of the public alternating-algorithm family
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): each round every node takes the min label over itself
    * and its neighbors (one edge join), then jumps to its label's label
    * (one self-join — halves pointer chains). Propagation alone needs
    * O(diameter) rounds and a pathological 100 TB chain would not
    * converge in any fixed budget; the halving rule compresses chains
    * geometrically, giving O(log n) rounds on any topology. Each round
    * is a handful of narrow shuffles on (id, comp) longs — corpus-text
    * never enters the loop.
    *
    * The loop is DRIVER-side control over fully distributed steps (the
    * one legitimate use of an action inside an operator): convergence
    * is an exact emptiness check on changed labels, and each round's
    * frame is truncated with an eager `localCheckpoint` so the logical
    * plan does not grow with the iteration count (executor-local
    * blocks; on a cluster prefer a reliable checkpoint dir for
    * fault-tolerance of very long runs). Labels only ever decrease, so
    * reaching maxIter without convergence is a correctness failure,
    * not a degradation — the operator throws rather than returning
    * silently-wrong clusters; at the default 30 rounds the halving rule
    * would need a component with > 2^30 nodes to be mid-flight.
    */
  def connectedComponents(pairs: DataFrame, docs: DataFrame,
                          maxIter: Int = 30): DataFrame =
    docs.select(col("doc_id"))
      .join(ccLabels(pairs, maxIter).withColumnRenamed("id", "doc_id"),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("comp"))
      .withColumn("is_kept", col("doc_id") === col("comp"))

  /** The label loop of [[connectedComponents]], exposed over the edge
    * list alone: (id, comp = min reachable id) for every node that
    * appears in `pairs`. Callers own the fill-in for isolated nodes
    * (connectedComponents' docs-join, [[minhashLshComponents]]' rep
    * attach).
    */
  private[graft] def ccLabels(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val fwd = pairs.select(col("a").as("src"), col("b").as("dst"))
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var comp = edges.groupBy(col("src"))
      .agg(min(least(col("src"), col("dst"))).as("comp"))
      .withColumnRenamed("src", "id")
      .localCheckpoint(true)
    // Convergence via the MONOTONE label sum: labels only ever decrease,
    // so Σcomp strictly decreases iff any node changed — one map-side-
    // combined aggregate over the just-checkpointed blocks replaces the
    // per-round m2⋈comp shuffle join the old change check paid. decimal
    // sum: 1e12 ids × 1e12 max label overflows a long's 9.2e18.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).first().getDecimal(0)
    // one action, not two (round 20): the seed labels' sum is null iff
    // comp is empty iff the edge list is empty — the separate
    // edges.isEmpty probe job folds into the sum the loop needs anyway
    // (comp's checkpoint above already materialized edges into the
    // persisted blocks).
    var iter = 0
    var prevSum = labelSum(comp)
    var converged = prevSum == null
    while (!converged && iter < maxIter) {
      // rule 1: min over self + neighbors
      val viaNeighbor = edges
        .join(comp.select(col("id").as("dst"), col("comp")), "dst")
        .select(col("src").as("id"), col("comp"))
      val m1 = comp.unionByName(viaNeighbor)
        .groupBy("id").agg(min("comp").as("comp"))
      // rule 2: path halving — follow the label's own label
      val m2 = m1
        .join(m1.select(col("id").as("comp"), col("comp").as("cc")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("cc"), col("comp")).as("comp"))
        .localCheckpoint(true)
      val newSum = labelSum(m2)
      // m2 is materialized (labelSum ran on the checkpointed blocks);
      // the superseded round's checkpoint is dead — free it eagerly so a
      // long query stream doesn't carry every round's blocks to GC time
      comp.unpersist()
      comp = m2
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    comp
  }
}
