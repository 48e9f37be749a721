package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.TextQueries

/** Registry-level locks for the round-14 corpus-statistics additions.
  * Both tests recompute the answer through a DIFFERENT plan than the
  * registry query uses, so a bug in the distributed shape (the pinned
  * shingling exchange in o62, the salted two-level rank in o63) cannot
  * hide behind itself; the DuckDB oracle then re-checks the same
  * contract cross-engine at the driver gate.
  */
class TextQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("o62 dup-ngram ledger matches a driver-side naive recomputation") {
    val out = TextQueries.queries("o62_dup_ngram_stats")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // naive recomputation: shingle in plain Scala from collected texts
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Seq[String] = {
      val ws = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (ws.length <= 4) Seq(ws.mkString(" "))
      else ws.sliding(4).map(_.mkString(" ")).toSeq
    }
    val perDoc = texts.map { case (id, t) => id -> grams(t) }
    val docsPerGram = perDoc.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expected = perDoc.map { case (id, gs) =>
      id -> ((gs.size.toLong, gs.count(g => docsPerGram(g) >= 2).toLong))
    }
    assert(out === expected)
    assert(out.values.exists(_._2 > 0), "corpus must exercise the dup path")
  }

  test("o64 fate ledger covers every doc and every stage fires on the shipped corpus") {
    val fates = TextQueries.queries("o64_curation_pipeline")(spark, "/root/testdata/sf0.01")
      .groupBy("fate").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one fate per doc, all docs accounted for
    assert(fates.values.sum === 500L)
    // testdata drift that silences a stage (e.g. no fingerprint dups
    // left) must fail loudly here, not quietly weaken the oracle check
    Seq("lang", "quality", "duplicate", "sampled_out", "kept").foreach { f =>
      assert(fates.getOrElse(f, 0L) > 0L, s"stage '$f' never fired")
    }
  }

  test("o65 surprisal matches a driver-side naive unigram LM") {
    val got = TextQueries.queries("o65_unigram_surprisal")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSeq)
    val cnt = texts.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble }
    val n = texts.map(_._2.size).sum.toDouble
    texts.foreach { case (id, ts) =>
      val exp = ts.map(t => -math.log(cnt(t) / n) / math.log(2.0)).sum / ts.size
      assert(got(id)._1 === ts.size.toLong)
      assert(math.abs(got(id)._2 - exp) < 0.005 + 1e-9, s"doc $id")
    }
    // the LM must discriminate: not all docs score identically
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("o66 split is leak-free by construction: equal text => equal split") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    val split = TextQueries.queries("o66_hash_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(split.size === docs.length)
    split.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 100)
      assert(s === (if (b < 80) "train" else if (b < 90) "val" else "test"))
    }
    docs.groupBy(_._2).values.filter(_.length > 1).foreach { grp =>
      val splits = grp.map(d => split(d._1)._2).distinct
      assert(splits.length === 1, "identical texts straddle splits")
    }
    assert(split.values.map(_._2).toSet === Set("train", "val", "test"))
  }

  test("o67 redaction ledger matches Java-regex recomputation") {
    val got = TextQueries.queries("o67_redaction_ledger")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getString(4), r.getLong(5)))).toMap
    val brand = "\\bspark\\b".r
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) =>
      val nBrand = brand.findAllIn(t).size.toLong
      val red = t.replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[MASKED]")
        .replaceAll("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[MASKED]")
        .replaceAll("\\bspark\\b", "[MASKED]")
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(red.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(id)._1 === nBrand, s"doc $id brand count")
      assert(got(id)._2 === md5hex, s"doc $id redacted md5")
      assert(got(id)._3 === red.length.toLong, s"doc $id redacted len")
    }
    // the corpus must actually exercise the masking path
    assert(got.values.exists(_._1 > 0))
  }

  test("o63 salted distributed rank yields the naive global-window fit") {
    val got = TextQueries.queries("o63_zipf_fit")(spark, sf).collect().head

    // the plan o63 deliberately avoids: one global window over the vocab
    val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
    val tf = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val naive = tf
      .withColumn("r", row_number().over(
        Window.orderBy(col("freq").desc, col("term"))))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("freq")).cast("long").as("total_tokens"),
        round(regr_slope(log(col("freq")), log(col("r"))), 4).as("slope"),
        round(regr_intercept(log(col("freq")), log(col("r"))), 4).as("intercept"),
        round(regr_r2(log(col("freq")), log(col("r"))), 4).as("r2"))
      .collect().head
    assert(got.getLong(0) === naive.getLong(0))
    assert(got.getLong(1) === naive.getLong(1))
    // rank assignment within a frequency tie class differs between the
    // two plans; the fit is a multiset invariant, so the rounded values
    // must agree exactly
    assert(got.getDouble(2) === naive.getDouble(2), "slope")
    assert(got.getDouble(3) === naive.getDouble(3), "intercept")
    assert(got.getDouble(4) === naive.getDouble(4), "r2")
    assert(got.getDouble(2) < 0.0, "zipf slope must be negative")
  }
}
