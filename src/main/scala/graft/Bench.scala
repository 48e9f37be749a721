package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: every registry query against SPARK_GRAFT_SF_DIR,
  * one JSON line to stdout + bench_out.json.
  *
  * Measurement honesty (round-1 verdict items):
  *  - results are materialized through the `noop` v2 sink, not `.count()`
  *    — count lets Catalyst delete final sorts (EliminateSorts) and prune
  *    most projections, under-measuring what Verify actually runs;
  *  - one untimed warm-up pass absorbs JVM/codegen/session start, so
  *    per-query numbers are plan costs, not first-query artifacts;
  *  - each query is timed twice and the MIN reported, so a GC pause or
  *    JIT recompile isn't attributed to whichever query it lands on;
  *  - queries run in sorted-name order (deterministic across JVMs);
  *  - layer materialization (Gold.ensure) is timed separately as
  *    `setup_sec` — it is a run-once pipeline cost, amortized across all
  *    queries, exactly like the reference's nightly CTAS rebuild.
  *
  * Round-6 bisect of the round-5 "common-subset regression" (r4 43.8 s →
  * r5 47.4 s driver-measured, with o26 0.42→1.66 and o34 0.59→1.13):
  * NOT reproducible. The same binary and data, same machine class, run
  * twice back-to-back — full 92-query registry vs the exact 73-query
  * r4 list (`SPARK_GRAFT_BENCH_ONLY`) — gives 36.90 s vs 36.64 s on the
  * common subset (0.7% apart) with o26 at 0.23-0.25 s in BOTH, and the
  * o26/o34/t08 sources are untouched since round 4 (git-verified), so
  * the plans are identical. Registry growth costs nothing; the r5
  * driver numbers reflect sustained co-located load during that bench
  * window (both timed passes were slow, so min-of-two couldn't mask
  * it), not a plan regression.
  */
object Bench {

  /** Fold a query's timed passes into one verdict: the MIN over
    * successful passes, or — only when EVERY pass failed — the first
    * error. A transient single-pass failure must not report a fast-fail
    * duration as the query's time, nor mark a succeeded query as an
    * error (the round-4 advice race; unit-locked in BenchFoldSpec).
    */
  def foldPasses(passes: Seq[Either[String, Double]]): Either[String, Double] = {
    val ok = passes.collect { case Right(t) => t }
    if (ok.isEmpty) Left(passes.head.left.getOrElse("unknown"))
    else Right(ok.min)
  }

  /** The ~10% slowest queries by current time — the set that gets a
    * third timed pass. Always at least one query; ties broken by name
    * so the set is deterministic across JVMs.
    */
  def slowestDecile(timed: Seq[(String, Double)]): Set[String] = {
    val n = math.max(1, math.ceil(timed.size / 10.0).toInt)
    timed.sortBy { case (name, t) => (-t, name) }.take(n).map(_._1).toSet
  }

  /** Idle-box norm for the calibration probe below, committed as the
    * MEASURED SPREAD, not just a midpoint, so the threshold can be
    * tightened (or re-baselined) against real endpoints. On this
    * machine class (local[32], 128 GiB), five idle-box runs of the 4B
    * probe spanned 0.74-1.08 s (the spread is the resident session
    * tooling, which is the realistic baseline condition); the probe
    * scales linearly with row count above ~1B (0.15 s @ 256M, 0.37 s
    * @ 2B — a fixed ~0.1 s plan/dispatch overhead dominates below).
    * Re-baseline procedure when resident tooling drifts: on an idle
    * box run `runMain graft.BenchCalibrate` (5 probe samples, JSON to
    * stdout) and commit the new endpoints + norm here, keeping
    * NoisyFactor ≥ hi/norm.
    *
    * Under the co-resident Spark JVMs that polluted BENCH_r10.json
    * (recorded 240 s vs 72 s clean) the probe degrades with the
    * contention because it is pure CPU work with no I/O to hide
    * behind. Chosen over a setup_sec comparison as the primary
    * sentinel because Gold.ensure legitimately changes across rounds;
    * the probe is binary- and data-independent.
    *
    * Round-12 rework (the round-11 sentinel MISSED a 2.75×-polluted
    * run, stamping it noisy:false at factor 1.25):
    *  - NoisyFactor 2.0 → 1.3: the idle spread tops at 1.08/0.85 =
    *    1.27, so 1.3 flags anything outside the probe's own observed
    *    tail. The old 2.0 was far laxer than the damage curve — a
    *    1.25-factor CPU reading coexisted with 2.75× query inflation
    *    because queries also contend on shuffle I/O and page cache.
    *  - probes run MID-BENCH (every ProbeEveryQueries queries), not
    *    only at the endpoints, and the verdict takes the max over all
    *    samples: load that rises after the first probe and falls
    *    before the last is no longer invisible.
    *  - a second, independent signal: the median per-query ratio vs
    *    the last committed clean bench (BENCH_CLEAN.json; self-
    *    history). The CPU probe under-reads I/O contention; history
    *    sees exactly what the queries experienced. Either signal
    *    alone marks the run noisy.
    *  - the probe uses the bench's actual core count as its split
    *    count and scales the norm by 32/cpus, so a 16- or 64-core
    *    host gets a correct yardstick instead of a systematic 2×
    *    false positive / under-detection.
    * `noisy:false` is NOT a cleanliness certificate — it means no
    * signal exceeded its threshold; both JSONs carry that note.
    *
    * Round-19 re-baseline: the host generation changed around r17 —
    * a same-binary A/B (the r16 tree rebuilt and benched back-to-back
    * with the r19 tree on one idle box, SCALE.md) put the ~1.45×
    * cross-round bench drift entirely on the environment, and 24 idle
    * probe samples (three BenchCalibrate runs + the in-bench probes of
    * an idle-box run) measured the NEW host's idle spread at
    * 0.80-1.59 s, median ≈1.03 — the old 0.74-1.08/0.85 envelope was
    * the OLD host's. Norm moves to the measured median; NoisyFactor
    * moves 1.3 → 1.6 because this host's own idle tail reaches
    * 1.59/1.03 ≈ 1.54 (hypervisor steal variance, not load we can
    * see) — anything tighter false-positives on an empty box. The
    * history signal (threshold 1.5) stays the finer instrument here;
    * it sees what queries experienced, not what the CPU probe can.
    */
  val CalibrationIdleLoSec = 0.80
  val CalibrationIdleHiSec = 1.59
  val CalibrationNormSec = 1.03
  val NoisyFactor = 1.6
  /** Self-history signal: median per-query ratio vs the committed
    * clean bench above this ⇒ noisy. Queries with baseline time below
    * HistoryMinBaselineSec are excluded (timer noise dominates their
    * ratios); the signal abstains entirely (None) below
    * HistoryMinQueries common queries or on an sf mismatch.
    */
  val HistoryNoisyFactor = 1.5
  val HistoryMinBaselineSec = 0.15
  val HistoryMinQueries = 10
  val ProbeEveryQueries = 20
  /** Probe work: total rows hashed, fixed regardless of core count
    * (splits = cores ⇒ idle time ≈ norm × 32/cpus).
    */
  val ProbeRows = 4000000000L

  /** (deviation factor, polluted?) for a measured calibration time
    * against an effective norm (already scaled for core count).
    */
  def noiseVerdict(calibrationSec: Double, normSec: Double = CalibrationNormSec): (Double, Boolean) = {
    val f = calibrationSec / normSec
    (f, f > NoisyFactor)
  }

  /** One CPU-bound calibration probe pass: xxhash64 over a constant
    * range, one split per core the bench assumes it owns.
    */
  def calibrateOnce(spark: SparkSession, splits: Int, rows: Long = ProbeRows): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, rows, 1, splits)
      .selectExpr("bit_xor(xxhash64(id)) as h") // bit_xor: no ANSI long overflow
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Endpoint probe: min of two passes (first absorbs codegen), like
    * the queries. Mid-run probes start as single passes — the max-over-
    * samples verdict wants sensitivity there, and the plan is already
    * codegen-warm after the first endpoint probe — but a sample over
    * the threshold is CONFIRMED with one more pass (min of the two):
    * the pollution that matters is sustained across a query's own two
    * passes, so a probe must distinguish sustained contention (both
    * readings high) from a one-off GC blip landing on the probe (the
    * first sf0.01 shakedown of this sentinel produced exactly that —
    * one 1.23 s mid-run sample between 0.56-0.70 s neighbours).
    */
  def calibrate(spark: SparkSession, splits: Int, rows: Long = ProbeRows): Double =
    math.min(calibrateOnce(spark, splits, rows), calibrateOnce(spark, splits, rows))

  def calibrateConfirmed(spark: SparkSession, splits: Int, threshold: Double): Double = {
    val first = calibrateOnce(spark, splits)
    if (first <= threshold) first
    else math.min(first, calibrateOnce(spark, splits))
  }

  /** Extract the per-query map (and the sf basename, if recorded) from
    * a committed bench JSON (bench_out.json format). Hand-rolled on
    * purpose: values are flat numbers, so the queries object ends at
    * the first '}' after its opening brace; no JSON library in the
    * dependency budget.
    */
  def parseBaseline(json: String): (Map[String, Double], Option[String]) = {
    val qKey = "\"queries\":{"
    val qStart = json.indexOf(qKey)
    val queries: Map[String, Double] =
      if (qStart < 0) Map.empty
      else {
        val body = json.substring(qStart + qKey.length, json.indexOf('}', qStart + qKey.length).max(qStart + qKey.length))
        val entry = "\"([^\"]+)\":([-+0-9.eE]+)".r
        entry.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    val sf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(json).map(_.group(1).split('/').last)
    (queries, sf)
  }

  /** The self-history sentinel's full reading: the median ratio (None =
    * abstained), HOW MANY queries it was computed over, and which short
    * ids were dropped as ambiguous. `matched` goes into the bench JSON
    * as `history_n` so a silent-coverage collapse — the r16-r18 bug's
    * shape, where a baseline-format drift emptied the intersection and
    * `history_factor:null` went unnoticed for two rounds — is visible
    * in one artifact field instead of requiring forensics.
    */
  final case class HistorySignal(factor: Option[Double], matched: Int,
                                 droppedIds: Seq[String])

  /** Median per-query ratio current/baseline over queries present in
    * both with baseline ≥ HistoryMinBaselineSec; factor None (signal
    * abstains) with fewer than HistoryMinQueries such queries. Median,
    * not mean: one legitimately-changed plan must not flag the run.
    *
    * Names are compared by SHORT id (the prefix before the first '_',
    * dropped when ambiguous on either side): the committed BENCH_CLEAN
    * baselines are the stdout format, whose query keys are short ids,
    * while `timed` carries full registry names — an exact-name match
    * therefore intersected EMPTY and the sentinel silently abstained
    * on every run since the short-id stdout format landed
    * (history_factor:null in r16/r17 artifacts; found round 18).
    * Normalizing both sides accepts either format as baseline. Dropped
    * ambiguous ids are REPORTED, not swallowed (r18 advice): a future
    * prefix collision, or a baseline mixing short and full keys for
    * the same query, shrinks coverage — possibly below
    * HistoryMinQueries, re-creating silent abstention — and that loss
    * must be visible (main stderr-logs droppedIds; matched lands in
    * the JSON as history_n).
    */
  def historySignal(current: Seq[(String, Double)],
                    baseline: Map[String, Double]): HistorySignal = {
    def shorten(m: Iterable[(String, Double)]): (Map[String, Double], Seq[String]) = {
      val grouped = m.groupBy { case (n, _) => n.takeWhile(_ != '_') }
      (grouped.collect { case (id, vs) if vs.size == 1 => id -> vs.head._2 },
        grouped.collect { case (id, vs) if vs.size > 1 => id }.toSeq)
    }
    val (base, baseDropped) = shorten(baseline)
    val (cur, curDropped) = shorten(current)
    val ratios = cur.collect {
      case (n, t) if base.get(n).exists(_ >= HistoryMinBaselineSec) => t / base(n)
    }.toSeq.sorted
    val factor =
      if (ratios.size < HistoryMinQueries) None
      else Some(
        if (ratios.size % 2 == 1) ratios(ratios.size / 2)
        else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2.0)
    // baseline-side ambiguous ids only matter when this run actually has
    // that id — a stale baseline entry for a since-deleted query never
    // affected this run's coverage and would be noise in the warning
    val curIds = current.map { case (n, _) => n.takeWhile(_ != '_') }.toSet
    HistorySignal(factor, ratios.size,
      (baseDropped.filter(curIds.contains) ++ curDropped).distinct.sorted)
  }

  def medianRatio(current: Seq[(String, Double)], baseline: Map[String, Double]): Option[Double] =
    historySignal(current, baseline).factor

  /** Landing pad for the full-precision bench JSON. Cwd-relative
    * `bench_out.json` is the driver's contract path and stays the
    * default, but it is also a TRAP on a shared box: two benches (a
    * manual sf10 run + the driver's sf0.1 run) clobber each other —
    * exactly how round 19's sf10 artifact was lost even though the run
    * could have completed. SPARK_GRAFT_BENCH_OUT overrides it so a
    * manual run lands somewhere collision-free.
    */
  def outPath(env: Map[String, String]): String =
    env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")

  /** o31's glob scan makes FileStreamSink.hasMetadata probe the glob as
    * a LITERAL path; when the data dir is cwd-relative the caught
    * FileNotFoundException is WARN-logged with a full stack trace —
    * several times per bench (min-of-two reruns) — and reads as an o31
    * failure to anyone triaging the log, though the read itself
    * proceeds. Pin that one logger to ERROR after setLogLevel (which
    * (re)sets the root level) so run logs carry zero fake traces.
    */
  def silenceGlobProbeWarn(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink", Level.ERROR)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val cpusN = cpus.toInt
    // effective norm for this host: the committed norm was measured at
    // 32-way parallelism over fixed total work, so time ∝ 32/cpus
    val probeNorm = CalibrationNormSec * 32.0 / cpusN
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ephemeral checkpoints (deleted in finally): checksum sidecar files
      // add nothing and their absence floods WARN "No checksum file found"
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      // long query stream in one JVM: ContextCleaner only frees
      // broadcast/shuffle/checkpoint blocks after a driver GC notices
      // they're unreachable, and its safety-net GC fires every 30 MIN by
      // default — a 130-query bench accumulates every prior query's
      // blocks and the big late joins pay for the squeezed execution
      // memory in spills (measured: o57 45 s solo vs 106 s in-stream).
      // 2 min mirrors what any production long-session deployment sets.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "2min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    silenceGlobProbeWarn()

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val setup0 = System.nanoTime()
    graft.engine.Gold.ensure(spark, sfDir)
    val setupSec = (System.nanoTime() - setup0) / 1e9
    // noise sentinel, CPU-probe signal: endpoint probes (min-of-two)
    // before and after the timed queries PLUS a single-pass probe every
    // ProbeEveryQueries timed queries; the factor is the max over all
    // samples, so load confined to any window of ~20 queries is seen.
    val probeSamples = scala.collection.mutable.ArrayBuffer[Double]()
    probeSamples += calibrate(spark, cpusN)

    // optional subset run (comma-separated full names or short-id
    // prefixes) — the bisect lever for attributing cross-round drift to
    // registry growth vs plan changes: run the CURRENT binary on an
    // OLD round's query list and diff per-query times.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(s => s.contains(n) || s.contains(n.takeWhile(_ != '_'))))
    names.foreach { n =>  // warm-up, untimed
      try materialize(n) catch { case _: Throwable => () }
    }
    // a failing query is REPORTED, never silently recorded as a fast
    // near-zero time — a bench that hides failures isn't a measurement
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timeOne(n: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try { materialize(n); Right((System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    // min of two timed passes per query: a single pass attributes GC
    // pauses and JIT recompiles to whichever query they land on (observed
    // as 4× spikes on queries whose identical-shape siblings run in 1 s);
    // the min is the plan cost. The min is taken over SUCCESSFUL passes
    // only, and a query is an error only when BOTH passes fail — a
    // transient single-pass failure must not report a fast-fail duration
    // as the query's time, nor a succeeded query as an error.
    val results: Seq[(String, Option[Double])] = names.zipWithIndex.map { case (n, i) =>
      if (i > 0 && i % ProbeEveryQueries == 0)
        probeSamples += calibrateConfirmed(spark, cpusN, NoisyFactor * probeNorm)
      foldPasses(Seq(timeOne(n), timeOne(n))) match {
        case Left(err) => errors(n) = err; n -> None
        case Right(t)  => n -> Some(t)
      }
    }
    // The driver keeps only the last ~2000 chars of sbt output, so the
    // stdout JSON line must fit that window in full: per-query times at
    // 2 decimals, totals at 3, error detail only in bench_out.json
    // (n_errors inline). Budget at 99 short-id queries × ~12 chars ≈
    // 1190, fixed fields ≈ 120, noise block (calibration + both factors
    // + note) ≈ 200 ⇒ ~1510 of 1985 — headroom for ~35 more queries at
    // 2 decimals. If the registry grows past the budget, per-query
    // precision degrades to 1 decimal AUTOMATICALLY rather than
    // silently clipping the JSON head out of the window — full
    // precision always lives in bench_out.json.
    def rnd(v: Double, s: Int): String =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toString
    def r3(v: Double): String = rnd(v, 3)
    // third timed pass on the slowest decile: min-of-two still lets a
    // sustained co-located-load window inflate a query when BOTH its
    // passes land inside it — and the slowest queries dominate the
    // total, so that is exactly where same-binary cross-round drift up
    // to 2× was observed (r7→r8, o37 0.97↔2.07 s). One extra pass on
    // the top ~10% bounds per-query noise there to the min of THREE
    // independent windows (empirically ≤15% same-binary drift on the
    // decile, vs 2× before) at ~6% added bench wall-clock; the cheap
    // 90% keep min-of-two, whose absolute noise is bounded by their
    // own small magnitudes.
    val firstTimed = results.collect { case (n, Some(t)) => n -> t }
    val slowest = slowestDecile(firstTimed)
    val timed = firstTimed.map {
      case (n, t) if slowest(n) =>
        // a failed third pass must not erase two good ones: fold keeps
        // the min over SUCCESSFUL passes (Right(t) is always present)
        n -> foldPasses(Seq(Right(t), timeOne(n))).getOrElse(t)
      case other => other
    }
    val errJson = errors.map { case (k, v) => Json.quote(k) + ":" + Json.quote(v) }
      .mkString("{", ",", "}")
    val total = timed.map(_._2).sum
    // noise sentinel verdict: CPU-probe factor (max over samples) OR
    // self-history factor — either over its threshold stamps
    // "noisy":true into BOTH JSONs: a reader comparing this bench
    // against history must see the flag next to the headline number,
    // not have to dig the calibration times out of the sidecar.
    probeSamples += calibrate(spark, cpusN)
    val calibrationSec = probeSamples.max
    val (cpuFactor, cpuNoisy) = noiseVerdict(calibrationSec, probeNorm)
    val sfShort = sfDir.split('/').last
    // self-history: per-query ratios vs the last committed clean bench
    // (bench_out.json format). Applied only when the baseline was
    // recorded at the SAME sf — cross-sf ratios measure data growth,
    // not pollution.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "BENCH_CLEAN.json")
    val (baseQueries, baseSf) = (try {
      val p = Paths.get(baselinePath)
      if (Files.exists(p)) parseBaseline(Files.readString(p))
      else (Map.empty[String, Double], None)
    } catch { case _: Throwable => (Map.empty[String, Double], None) })
    val histSignal =
      if (baseSf.contains(sfShort)) historySignal(timed, baseQueries)
      else HistorySignal(None, 0, Nil)
    // parallel to the ABSTAINED message below: when the sentinel is off
    // because the baseline was recorded at a different sf, say so — a
    // noisy:false on such a run is probe-only, and the reader must not
    // mistake history_n:0 for a coverage bug
    if (baseQueries.nonEmpty && !baseSf.contains(sfShort))
      System.err.println(s"[bench] history sentinel OFF: baseline sf ${baseSf.getOrElse("unknown")} != run sf $sfShort — noisy verdict is CPU-probe-only")
    val histFactorOpt = histSignal.factor
    if (histSignal.droppedIds.nonEmpty)
      System.err.println(s"[bench] history sentinel dropped ${histSignal.droppedIds.size} ambiguous short ids: ${histSignal.droppedIds.mkString(", ")}")
    if (baseSf.contains(sfShort) && histFactorOpt.isEmpty)
      System.err.println(s"[bench] history sentinel ABSTAINED: only ${histSignal.matched} baseline-matched queries (need $HistoryMinQueries)")
    val histNoisy = histFactorOpt.exists(_ > HistoryNoisyFactor)
    val noisy = cpuNoisy || histNoisy
    val histJson = histFactorOpt.map(h => rnd(h, 2)).getOrElse("null")
    // noisy:false means "no signal exceeded its threshold", NOT a
    // cleanliness certificate — both JSONs say so explicitly, because
    // round 11 proved a clean-looking factor can sit beside polluted
    // query times the probes never sampled.
    val noiseNote = "noisy:false is no cleanliness certificate"
    val noiseJson =
      s""","calibration_sec":${rnd(calibrationSec, 2)},"noise_factor":${rnd(cpuFactor, 2)},"history_factor":$histJson,"history_n":${histSignal.matched},"noisy":$noisy,"noise_note":${Json.quote(noiseNote)}"""
    // stdout trims every char it can spare (bench_out.json keeps full
    // names and full precision): per-query keys are the registry's UNIQUE
    // short ids ("o22" for o22_minhash_lsh_jaccard — the prefix before
    // the first underscore, the same id CORRECTNESS entries start with),
    // sf as BASENAME, setup at 2 decimals, n_errors only when non-zero.
    def prefix(name: String): String = name.takeWhile(_ != '_')
    // short ids only when unique — a future prefix collision falls back
    // to full names (which the adaptive precision below absorbs) instead
    // of failing a bench that already ran to completion
    val useShort = names.map(prefix).distinct.size == names.size
    def shortId(name: String): String = if (useShort) prefix(name) else name
    def stdoutJson(qDecimals: Int): String = {
      val qs = timed.map { case (k, v) => Json.quote(shortId(k)) + ":" + rnd(v, qDecimals) }
        .mkString("{", ",", "}")
      val errField = if (errors.isEmpty) "" else s""","n_errors":${errors.size}"""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"setup_sec":${rnd(setupSec, 2)}$errField$noiseJson,"sf":${Json.quote(sfShort)}}"""
    }
    // budget: the 2000-char window minus the trailing newline and slack;
    // the JSON is the very last thing printed, so nothing else competes.
    // Terminal fallback drops the per-query map entirely (full detail is
    // in bench_out.json) — the headline metric must NEVER be clipped out
    // of the consumer's tail window, whatever the registry grows to.
    val noQueries =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{},"setup_sec":${rnd(setupSec, 2)},"n_errors":${errors.size}$noiseJson,"sf":${Json.quote(sfShort)}}"""
    val json = Iterator(2, 1, 0)
      .map(stdoutJson).find(_.length <= 1985).getOrElse(noQueries)
    Files.writeString(Paths.get(outPath(sys.env)),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${timed.map { case (k, v) => Json.quote(k) + ":" + v }.mkString("{", ",", "}")},"setup_sec":$setupSec,"n_errors":${errors.size},"errors":$errJson,"cpus":$cpusN,"probe_samples":${probeSamples.mkString("[", ",", "]")},"calibration_sec":$calibrationSec,"calibration_norm_sec":$probeNorm,"noise_factor":$cpuFactor,"history_factor":$histJson,"history_n":${histSignal.matched},"history_dropped_ids":${histSignal.droppedIds.map(Json.quote).mkString("[", ",", "]")},"history_baseline_sf":${baseSf.map(Json.quote).getOrElse("null")},"noisy":$noisy,"noise_note":${Json.quote(noiseNote)},"sf":${Json.quote(sfDir)}}""")
    if (noisy)
      System.err.println(f"[bench] NOISY run: probe max $calibrationSec%.2f s vs norm $probeNorm%.2f s (factor $cpuFactor%.2f), history factor ${histJson} — treat totals as polluted")
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
    // printed last (after stop) so no Spark shutdown line can push the
    // JSON out of the driver's tail window
    println(json)
  }
}

/** Re-baseline helper for the calibration norm: five idle-box probe
  * samples (after one untimed codegen warm-up), printed as JSON. Run on
  * an idle box, then commit the observed endpoints and a norm near the
  * median into Bench.CalibrationIdle{Lo,Hi}Sec / CalibrationNormSec,
  * keeping NoisyFactor ≥ hi/norm.
  */
object BenchCalibrate {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.calibrateOnce(spark, cpus.toInt) // untimed codegen warm-up
    val samples = (1 to 5).map(_ => Bench.calibrateOnce(spark, cpus.toInt))
    spark.stop()
    println(s"""{"cpus":$cpus,"probe_rows":${Bench.ProbeRows},"samples":${samples.map(s => f"$s%.3f").mkString("[", ",", "]")}}""")
  }
}
