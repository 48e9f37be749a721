package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Landing zone: period-split order files + full dimension dumps + a
  * fingerprint manifest — the reference's `scripts/esplosione_dati.py`
  * (month split :135-154, manifest :22-44,160-165, fingerprints :50-103).
  *
  * Fingerprints are computed DISTRIBUTIVELY as one aggregation per
  * file-group — md5 over (row count, min key, max key, order-free crc32
  * sum of keys, order-free crc32 sum of full-row digests) — never by
  * sorting/collecting ids to the driver the way the reference does in
  * pandas (`esplosione_dati.py:50-103`). The full-row term goes beyond
  * the reference's id-only fingerprint: a file whose keys are unchanged
  * but whose payload was corrected re-fingerprints and is reprocessed
  * instead of silently SKIPped. Note the ingest itself stays insert-only
  * (see Incremental.run) — reprocessing picks up NEW keys in the changed
  * file; corrections to already-ingested rows are dim-style full-replace
  * territory, not order-append territory.
  */
object Landing {

  /** One landing file-group: logical name + content fingerprint + rows. */
  final case class LandingFile(file: String, fingerprint: String, rows: Long)

  // null-safe key stringify (F13): a null key must hash as a stable
  // empty token, not vanish from the fingerprint (concat_ws drops nulls)
  private def keyStr(keyCol: String) =
    coalesce(col(keyCol).cast("string"), lit(""))

  // order-free digest of the FULL row (every column, null-safe, with a
  // non-printable separator so "a|b","c" vs "a","b|c" can't collide):
  // a file whose keys are unchanged but whose payload columns were
  // corrected must NOT fingerprint identical, or Incremental.run would
  // silently SKIP the correction
  private def rowDigest(cols: Seq[String]) =
    crc32(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
      .cast("binary"))

  private def fingerprintAgg(keyCol: String, allCols: Seq[String]) =
    md5(concat_ws("|",
      count(lit(1)),
      coalesce(min(col(keyCol)).cast("string"), lit("")),
      coalesce(max(col(keyCol)).cast("string"), lit("")),
      sum(crc32(keyStr(keyCol).cast("binary"))).cast("string"),
      sum(rowDigest(allCols)).cast("string")))

  /** Split orders into period files (partitioned parquet — `period=YYYY`
    * dirs play the reference's `orders_YYYY-MM.parquet` files), dump
    * dims + lineitem in full, and write the manifest. Returns the
    * manifest entries.
    *
    * `periodFmt` "yyyy" keeps the file count manageable at test scale;
    * "yyyy-MM" reproduces the reference's monthly grain — the pipeline is
    * identical either way.
    */
  /** Landing-file count cap: the incremental contract is per-FILE
    * (quality gate + anti-join + append + journal per landing file), so
    * file count is a JOB count — and the journal is rewritten after
    * every file, so it is also quadratic in files. A fixed year grain on
    * the long-history rehearsal meant ~660 years at sf10 = 1,320
    * sequential ingest jobs (found wedged mid-sweep, round 17). Real
    * landing zones deliver bounded batch counts; beyond the cap,
    * consecutive years are bucketed into equal-width batches.
    */
  val maxLandingFiles = 16

  /** Data-sized year-bucket width for the default landing grain:
    * ceil(span / [[maxLandingFiles]]), floored at 1 (width-1 = the plain
    * year, byte-identical to the pre-r17 layout). ONE SOURCE OF TRUTH
    * with the p01 oracle: PipelineQueries interpolates
    * [[maxLandingFiles]] into the same ceil/floor formula in SQL, so the
    * cap constant cannot drift between the engine and its oracle — a
    * change HERE to the formula's shape (not just the cap) must be
    * mirrored in that oracle's `yb` CTE.
    */
  def yearBucketWidth(minYear: Int, maxYear: Int): Long =
    math.max(1L, math.ceil((maxYear - minYear + 1).toDouble / maxLandingFiles).toLong)

  def explode(spark: SparkSession, sfDir: String, landingRoot: String,
              periodFmt: String = "yyyy"): Seq[LandingFile] = {
    // a null order date cannot be period-split (its rows would land in
    // the hive default partition while the manifest says 'orders_null')
    // — fail fast at the landing boundary instead. The year-span stats
    // the default grain needs ride the SAME aggregation pass as the gate
    // (Quality.gateWith): one scan per ingest, not two — min/max(year)
    // skip nulls by SQL semantics, and a null date throws anyway, so
    // pre-gate stats equal post-gate stats. NonEmpty rides the same
    // pass too (gateWith's count(*)): on an EMPTY orders table
    // min/max(year) are null and getAs[Int] would silently unbox them
    // to 0, anchoring the default grain at year 0 — an empty ingest
    // must fail at the boundary exactly like a null date does.
    val (gated, stats) = Quality.gateWith(
      Tables.orders(spark, sfDir),
      Seq(Quality.NonEmpty, Quality.NotNull("o_orderdate")),
      if (periodFmt != "yyyy") Nil
      else Seq(min(year(col("o_orderdate"))).as("__min_year"),
        max(year(col("o_orderdate"))).as("__max_year")))
    // data-sized batch width for the default year grain: width-1 until
    // the year span blows past the cap, then ceil(span/cap)-year buckets
    // anchored at the min year ([[yearBucketWidth]] — the p01 oracle
    // computes the same width from the same table in SQL).
    val periodCol =
      if (periodFmt != "yyyy") date_format(col("o_orderdate"), periodFmt)
      else {
        val minY = stats.getAs[Int]("__min_year")
        val width = yearBucketWidth(minY, stats.getAs[Int]("__max_year"))
        if (width == 1L) date_format(col("o_orderdate"), "yyyy")
        else (floor((year(col("o_orderdate")) - lit(minY)) / lit(width))
          * lit(width) + lit(minY.toLong)).cast("long").cast("string")
      }
    val orders = gated.withColumn("period", periodCol)
    // period + bounded hash salt (Gold.saltedPartitionedWrite): every
    // period is written by up to `writeFanout` parallel tasks instead of
    // one, with file count still bounded per period
    Gold.saltedPartitionedWrite(orders, "period", col("o_orderkey"),
      s"$landingRoot/orders")
    // items carry their ORDER's period and are partitioned by it, so the
    // incremental per-file item pass is a partition-pruned scan instead
    // of a full re-scan per file; an item whose order is absent gets a
    // null period (hive default partition) and is never ingested —
    // matching the semi-join-on-new-orders semantics
    Gold.saltedPartitionedWrite(
      Tables.lineitem(spark, sfDir)
        .join(orders.select(col("o_orderkey").as("__ok"), col("period")),
          col("l_orderkey") === col("__ok"), "left")
        .drop("__ok"),
      "period", col("l_orderkey"), s"$landingRoot/lineitem")
    Tables.customer(spark, sfDir).write.mode("overwrite")
      .parquet(s"$landingRoot/customer")
    Tables.part(spark, sfDir).write.mode("overwrite")
      .parquet(s"$landingRoot/part")

    val orderCols = orders.columns.filterNot(_ == "period").toSeq
    val orderFps = orders.groupBy(col("period"))
      .agg(fingerprintAgg("o_orderkey", orderCols).as("fp"), count(lit(1)).as("rows"))
      .collect()
      .map(r => LandingFile(s"orders_${r.getString(0)}", r.getString(1), r.getLong(2)))
    val dimFps = Seq("customer" -> "c_custkey", "part" -> "p_partkey").map {
      case (name, key) =>
        val dim = spark.read.parquet(s"$landingRoot/$name")
        val r = dim
          .agg(fingerprintAgg(key, dim.columns.toSeq).as("fp"), count(lit(1)).as("rows"))
          .collect()(0)
        LandingFile(s"${name}_full", r.getString(0), r.getLong(1))
    }
    val manifest = (orderFps.toSeq ++ dimFps).sortBy(_.file)
    writeManifest(spark, landingRoot, manifest)
    manifest
  }

  /** Manifest as a JSON dataset (S12): one `{"file","fingerprint","rows"}`
    * object per line, written/read with Spark's JSON source.
    */
  def writeManifest(spark: SparkSession, landingRoot: String,
                    entries: Seq[LandingFile]): Unit = {
    import spark.implicits._
    entries.toDF().coalesce(1).write.mode("overwrite")
      .json(s"$landingRoot/_manifest")
  }

  def readManifest(spark: SparkSession, landingRoot: String): Seq[LandingFile] = {
    import spark.implicits._
    spark.read.json(s"$landingRoot/_manifest")
      .select(col("file"), col("fingerprint"), col("rows").cast("long"))
      .as[LandingFile].collect().toSeq.sortBy(_.file)
  }
}
