package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys: salt the skewed (large) side into
  * `salts` sub-keys and explode the small side across all salt values,
  * so one hot key's rows spread over `salts` reducers instead of one.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most
  * cases at runtime; explicit salting remains the tool for aggregations
  * over a hot GROUP BY key and for engines/joins AQE can't split. The
  * two-level salted aggregation below is the canonical shape:
  * partial-agg on (key, salt) → final agg on key — same result, bounded
  * reducer size.
  */
object Skew {

  /** Two-level salted aggregation: `sum(valueCol)` grouped by `key`,
    * computed skew-safely. (sum/count/min/max compose over the salt
    * level; avg must be derived as sum/count.)
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int = 16): DataFrame =
    df
      // salt derived from ROW CONTENT, never from nondeterministic ids:
      // a stage retry must re-hash every row to the same salt group, or
      // reducers double-count/drop rows (the monotonically_increasing_id
      // -in-a-shuffle class of bug). Degenerates only if the hot key's
      // rows are fully identical.
      .withColumn("__salt", pmod(hash(col(key), col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Salted equi-join: big side gets a random-ish salt in [0, salts),
    * small side is replicated across every salt value; joining on
    * (key, salt) splits each hot key across `salts` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", // content-derived: retry-safe
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
