package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Explicit hot-key salting (SURVEY.md §2.D7; north rule: "explicit salting
  * of hot cells (cities, coastlines)").
  *
  * AQE's skew-join split only rescues sort-merge stages; the north rule
  * wants the skew handled structurally: the top-k heaviest probe keys are
  * detected with one cheap count aggregation, the (small) index side is
  * replicated ×S for those keys, and each probe row picks a deterministic
  * salt from its row id — so a hot cell's rows fan out over S reducers
  * instead of one.
  */
object Skew {

  /** Top-k probe keys with count >= threshold (E5 hot-cell stats). The
    * result is collected (k is small by construction) and re-broadcast as a
    * literal set. At 10^12-row scale the count agg runs on a sample or an
    * approx sketch; the contract (small exact hot set) is unchanged. */
  def hotKeys(probe: DataFrame, key: String, k: Int, threshold: Long): Array[Long] =
    probe.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(k)
      .collect().map(_.getLong(0))

  /** [[hotKeys]] for non-long key types (e.g. the 32-byte line-hash keys
    * of the C4 line scrub): same contract, values returned as Any. */
  def hotKeysAny(probe: DataFrame, key: String, k: Int, threshold: Long): Array[Any] =
    probe.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(k)
      .collect().map(_.get(0))

  /** Salted equi-join `probe ⋈ index ON key`, with hot keys spread over
    * `s` salts. Cold keys keep salt 0 on both sides (no replication cost).
    * `probeId` must be a deterministic per-row column (salt choice is then
    * reproducible — required for the exact-match correctness gate). */
  def saltedJoin(probe: DataFrame, index: DataFrame, key: String,
                 probeId: String, hot: Array[Long], s: Int): DataFrame =
    saltedJoinAny(probe, index, key, probeId, hot.map(Long.box), s)

  /** [[saltedJoin]] over keys of any type (the `isin` hot-set literal and
    * the salt mechanics are type-agnostic). */
  def saltedJoinAny(probe: DataFrame, index: DataFrame, key: String,
                    probeId: String, hot: Array[Any], s: Int): DataFrame = {
    if (hot.isEmpty) return probe.join(index, key)
    val hotCol: Column = col(key).isin(hot: _*)
    val salts = array((0 until s).map(i => lit(i)): _*)
    val indexSalted = index
      .withColumn("_salt", explode(when(hotCol, salts).otherwise(array(lit(0)))))
    val probeSalted = probe
      .withColumn("_salt", when(hotCol, pmod(xxhash64(col(probeId)), lit(s)).cast("int"))
        .otherwise(lit(0)))
    probeSalted.join(indexSalted, Seq(key, "_salt")).drop("_salt")
  }
}
