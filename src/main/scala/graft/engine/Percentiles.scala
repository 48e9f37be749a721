package graft.engine

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** EXACT interpolated percentiles per key, computed as distributed
  * order-statistics SELECTION instead of the built-in `percentile`'s
  * per-group value buffer (which holds and sorts every group value in
  * one task — executor OOM + single-task serialization once a group
  * outgrows memory; the round-4 audit's one scale-killer plan).
  *
  * Algorithm (every phase bounded):
  *  1. value histogram: `groupBy(key, value).count` — the ONLY pass over
  *     raw rows, fully map-side-combinable;
  *  2. range-repartition the (key, value) histogram and sort within
  *     partitions — a global sort of DISTINCT values, each partition
  *     holding a bounded slice of one or more keys' value ranges;
  *  3. per-(partition, key) count totals → driver (bounded metadata:
  *     partitions × keys rows, NEVER values) → cumulative start offsets
  *     per partition, broadcast back;
  *  4. each partition walks its sorted slice with its start offset and
  *     emits the value covering each target position — ≤ keys × 2×|ps|
  *     rows — then the driver interpolates.
  *
  * Interpolation is the built-in's exact arithmetic (the two-sided
  * weighted form `(c−t)·vf + (t−f)·vc` with `t = p·(n−1)`), so results
  * are bit-identical to both Spark `percentile` and DuckDB
  * `quantile_cont` (selection + two multiplies and an add — no
  * order-dependent accumulation anywhere: histogram counts are exact
  * integers, offsets are exact sums of longs).
  *
  * Contract difference from `groupBy(key).agg(percentile(...))`: NULL
  * keys and all-NULL-value groups are DROPPED (no output row), where the
  * built-in would emit a (key, null) row. Callers that need null groups
  * must union them back.
  */
object Percentiles {

  def exactByKey(df: DataFrame, keyCol: String, valueCol: String,
                 ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length)
    val spark = df.sparkSession
    import spark.implicits._

    // 1-2: histogram, then a global (key, value) sort split across the
    // cluster — `percentile` ignores nulls, so match it
    val counts = df
      .filter(col(valueCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .repartitionByRange(col("k"), col("v"))
      .sortWithinPartitions("k", "v")
      .as[(String, Double, Long)]
      .persist()

    // 3: bounded metadata — total count per (partition, key)
    val partTotals: Array[(Int, String, Long)] = counts.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      it.foreach { case (k, _, c) => m.update(k, m.getOrElse(k, 0L) + c) }
      m.iterator.map { case (k, t) => (pid, k, t) }
    }.collect()
    val nByKey: Map[String, Long] =
      partTotals.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val offsets: Map[(Int, String), Long] =
      partTotals.groupBy(_._2).flatMap { case (k, arr) =>
        var acc = 0L
        arr.sortBy(_._1).map { case (pid, _, t) =>
          val entry = ((pid, k), acc); acc += t; entry
        }
      }
    // target 0-based positions per key: floor and ceil of t = p*(n-1)
    val targets: Map[String, Seq[(Int, Long)]] = nByKey.map { case (k, n) =>
      k -> ps.indices.flatMap { i =>
        val t = ps(i) * (n - 1)
        Seq((i * 2, math.floor(t).toLong), (i * 2 + 1, math.ceil(t).toLong))
      }
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTargets = spark.sparkContext.broadcast(targets)

    // 4: position lookup — each sorted slice walks once from its offset
    val hits: Array[(String, Int, Double)] = counts.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val at = scala.collection.mutable.HashMap[String, Long]()
      it.flatMap { case (k, v, c) =>
        val start = at.getOrElse(k, bcOff.value.getOrElse((pid, k), 0L))
        val end = start + c // this value covers positions [start, end)
        at.update(k, end)
        bcTargets.value.getOrElse(k, Nil).collect {
          case (slot, pos) if pos >= start && pos < end => (k, slot, v)
        }
      }
    }.collect()
    counts.unpersist()

    // 5: interpolate (keys × |ps| values — aggregate-small by construction)
    val bySlot = hits.groupBy(_._1).view
      .mapValues(_.map(h => h._2 -> h._3).toMap).toMap
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      nByKey.keys.toSeq.sorted.map { k =>
        val n = nByKey(k)
        val sv = bySlot(k)
        val qs = ps.indices.map { i =>
          val t = ps(i) * (n - 1)
          val f = math.floor(t)
          val c = math.ceil(t)
          val vf = sv(i * 2)
          val vc = sv(i * 2 + 1)
          // the built-in's exact arithmetic (two-sided weighted form,
          // not vf + (vc-vf)*frac — they differ in the last ulp)
          if (c == f) vf else (c - t) * vf + (t - f) * vc
        }
        Row.fromSeq(k +: qs)
      }: _*)
    val schema = StructType(StructField(keyCol, StringType) +:
      outNames.map(StructField(_, DoubleType)))
    spark.createDataFrame(rows, schema)
  }
}
