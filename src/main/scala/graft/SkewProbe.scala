package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Skew rehearsal: `runMain graft.SkewProbe [sfDir]` — the sf1 rehearsal
  * (SCALE.md) ran on deliberately UNIFORM replicas, so AQE's skew-join
  * split never had a reason to fire and the salting path was only
  * correctness-tested (SkewSpec). This main manufactures the missing
  * regime from the same tables: a lineitem where one hot order key owns
  * ~1/3 of all rows (the "one celebrity user / one default value" shape
  * every 100 TB corpus has), then runs the lineitem⋈orders join three
  * ways and prints executed-plan evidence plus wall time:
  *
  *   1. `skew=off`  — AQE skew split disabled: the hot key's entire row
  *      block lands on ONE reducer; the straggler bounds the stage.
  *   2. `skew=aqe`  — AQE split enabled: the executed SMJ must report
  *      `isSkewJoin=true` and the hot side's AQEShuffleRead must carry
  *      PartialReducerPartitionSpec slices (the hot partition re-read as
  *      several map-output ranges, each joined against a re-read of the
  *      other side's matching partition).
  *   3. `skew=salt` — [[graft.engine.Skew.saltedJoin]]: the split is
  *      decided at PLAN time (key, salt) instead of at runtime; works on
  *      engines/joins AQE cannot split and is the shape to reach for when
  *      the hot key is known ahead of time. Its cost is replicating the
  *      other side `salts`×, which GROWS with that side — measured here
  *      (and 3.5× worse than AQE at sf1), so for plain equi-joins prefer
  *      the runtime split; salting earns its keep on aggregations
  *      (below) and operators AQE cannot reach.
  *
  * The broadcast threshold is disabled and the AQE skew thresholds are
  * scaled down (256 MB advisory → 256 KB, 256 MB skew floor → 256 KB) so
  * the ~2 MB hot partition of the rehearsal stands in for the multi-GB
  * hot partition of a 100 TB join — the DECISION LOGIC exercised
  * (partition > max(floor, factor × median) → split to advisory size) is
  * scale-free; only the constants are rehearsal-sized.
  *
  * A second probe does the same for hot-key AGGREGATION (where AQE has no
  * split: a reducer must see all rows of a group): plain groupBy puts the
  * hot key's rows on one reducer, [[graft.engine.Skew.saltedSum]] bounds
  * every reducer group to ~rows/salts, shown by the max group size before
  * and after the salt level.
  */
object SkewProbe {

  private def flat(p: SparkPlan): Seq[SparkPlan] = PlanDiff.flatten(p)

  /** (isSkewJoin SMJ count, partial-reducer spec count over AQE shuffle
    * reads) of the executed plan — the split leaves both marks: the SMJ
    * is flagged, and the skewed side's shuffle read carries one
    * PartialReducerPartitionSpec per slice of the hot partition (each a
    * map-output range re-read by its own task).
    */
  private def skewMarks(df: DataFrame): (Int, Int) = {
    val nodes = flat(df.queryExecution.executedPlan)
    val skewJoins = nodes.count { case j: SortMergeJoinExec => j.isSkewJoin; case _ => false }
    val partialSpecs = nodes.collect { case r: AQEShuffleReadExec =>
      r.partitionSpecs.count(_.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec])
    }.sum
    (skewJoins, partialSpecs)
  }

  /** Executes THIS df's own QueryExecution (collect, not a noop write —
    * a write command plans a fresh QueryExecution, leaving this df's
    * adaptive plan un-executed and its runtime skew marks unset).
    * Returns (seconds, result rows).
    */
  private def timeRun(df: DataFrame): (Double, Seq[org.apache.spark.sql.Row]) = {
    val t0 = System.nanoTime()
    val rows = df.collect().toSeq
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Rehearsal-sized constants (values scaled, logic untouched): a 100 TB
    // join has thousands of map tasks and multi-GB partitions; here the
    // skew floor is scaled to 256 KB so the same decision path (partition
    // > max(floor, factor × median) → split along MAPPER boundaries to
    // advisory size) runs on MBs.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    if (sys.env.contains("SKEW_DEBUG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive", org.apache.logging.log4j.Level.DEBUG)

    val orders = graft.engine.Tables.orders(spark, sfDir)
    val hotKey = orders.agg(min("o_orderkey")).head.getLong(0)
    // ~1/3 of lineitem remapped onto one existing order key: FK-valid,
    // content-derived (deterministic under stage retry, like Skew's salt).
    // The skewed table is STAGED to a multi-file parquet dir before the
    // probe joins it: AQE splits a skewed reduce partition along
    // MAP-OUTPUT boundaries only, and the driver's sf0.1 lineitem is one
    // single-row-group file — one real mapper, so the hot partition is
    // one indivisible block and the split silently cannot happen (found
    // the hard way: OptimizeSkewedJoin logged `max size: 2153182` yet
    // `skewed partitions: 0`; the per-mapper dump showed
    // `mapperBlocks=0,0,2153182,0,0,0`). A 100 TB table is always
    // many-file/many-row-group; a rehearsal must be too.
    val skewDir = graft.engine.Workdirs.materializeOnce("graft-skew", sfDir) { root =>
      graft.engine.Tables.lineitem(spark, sfDir)
        .withColumn("l_orderkey",
          when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(3)) === 0,
            lit(hotKey)).otherwise(col("l_orderkey")))
        .repartition(24) // round-robin: hot rows spread over all files
        .write.mode("overwrite").parquet(s"$root/lineitem_skewed")
    } + "/lineitem_skewed"
    val lineitem = spark.read.parquet(skewDir)

    val total = lineitem.count()
    val hotRows = lineitem.filter(col("l_orderkey") === hotKey).count()
    println(f"[skew] corpus: $total rows, hot key $hotKey holds $hotRows (${100.0 * hotRows / total}%.1f%%), " +
      s"scan tasks=${lineitem.rdd.getNumPartitions}")

    def joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_extendedprice").as("revenue"))
      .orderBy("o_orderpriority")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val off = joined
    val (offSec, a) = timeRun(off)
    val (offSkew, offSpecs) = skewMarks(off)
    println(f"[skew] off : $offSec%6.2f s  skewJoins=$offSkew partialReducerSpecs=$offSpecs")
    require(offSkew == 0 && offSpecs == 0, "control run unexpectedly skew-optimized")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqe = joined
    val (aqeSec, b) = timeRun(aqe)
    val (aqeSkew, aqeSpecs) = skewMarks(aqe)
    println(f"[skew] aqe : $aqeSec%6.2f s  skewJoins=$aqeSkew partialReducerSpecs=$aqeSpecs")
    if (sys.env.contains("SKEW_DEBUG")) {
      println(aqe.queryExecution.executedPlan.toString)
      import org.apache.spark.sql.execution.adaptive.SkewDebugBridge
      SkewDebugBridge.shuffleIds().foreach { sid =>
        try {
          val perReduce = (0 until cpus.toInt).map(r =>
            SkewDebugBridge.mapSizesForReduceId(sid, r).sum)
          val hot = perReduce.zipWithIndex.maxBy(_._1)
          val mappers = SkewDebugBridge.mapSizesForReduceId(sid, hot._2)
          println(s"[skewdbg] shuffle=$sid hotReduce=${hot._2} bytes=${hot._1} " +
            s"mapperBlocks=${mappers.mkString(",")} " +
            s"splitAt256k=${SkewDebugBridge.split(mappers, 256 * 1024).mkString(",")}")
        } catch { case e: Exception => println(s"[skewdbg] shuffle=$sid skipped: $e") }
      }
    }
    require(aqeSkew > 0, "AQE did not mark the join skewed — thresholds no longer engage")
    require(aqeSpecs > 1,
      s"hot partition was not split into partial-reducer slices (specs=$aqeSpecs)")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val salted = graft.engine.Skew
      .saltedJoin(lineitem, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", salts = 16)
      .groupBy("o_orderpriority")
      .agg(sum("l_extendedprice").as("revenue"))
      .orderBy("o_orderpriority")
    val (saltSec, c) = timeRun(salted)
    println(f"[skew] salt: $saltSec%6.2f s  (plan-time split, 16 salts)")

    // double sums associate differently under different partitionings —
    // compare keys exactly, values to relative 1e-9
    def toMap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (ma, mb, mc) = (toMap(a), toMap(b), toMap(c))
    require(ma.keySet == mb.keySet && mb.keySet == mc.keySet,
      "skew regimes disagree on group keys")
    ma.foreach { case (k, v) =>
      require(math.abs(mb(k) - v) <= 1e-9 * math.abs(v) &&
              math.abs(mc(k) - v) <= 1e-9 * math.abs(v),
        s"skew regimes disagree on $k: $v vs ${mb(k)} vs ${mc(k)}")
    }
    println("[skew] all three regimes agree on the join result")

    // aggregation probe: AQE cannot split a grouped reducer; salting can
    val plainMax = lineitem.groupBy("l_orderkey").count()
      .agg(max("count")).head.getLong(0)
    val saltedMax = lineitem
      .withColumn("__salt", pmod(hash(col("l_orderkey"), col("l_extendedprice")), lit(16)))
      .groupBy("l_orderkey", "__salt").count()
      .agg(max("count")).head.getLong(0)
    println(s"[skew] agg reducer group: plain max=$plainMax, salted(16) max=$saltedMax " +
      f"(${plainMax.toDouble / saltedMax}%.1f× smaller)")
    spark.stop()
  }
}
