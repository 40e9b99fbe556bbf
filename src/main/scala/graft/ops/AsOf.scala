package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of join: each probe row picks up the LATEST state version
  * with `state.ts <= probe.ts` on the same key — "which index epoch was
  * live for this page's crawl timestamp", the lookup every snapshot-
  * versioned table (TableIO) implies once probes carry timestamps.
  *
  * Implementation is the union trick, not a range join: probes and state
  * versions become ONE keyed event stream, sorted within key by
  * (ts, state-before-probe), and each probe reads the running
  * last-non-null state payload from a rows-unbounded-preceding window.
  * One shuffle on the key, linear within partitions — a theta join
  * (`s.ts <= p.ts`) materializes probes×versions rows per key before its
  * top-1, which at 10^12 probes × per-epoch versions is the difference
  * between a pass and an explosion. Ties: a state version AT the probe
  * timestamp is visible (state sorts first at equal ts).
  */
object AsOf {

  /** Point-in-interval join: every (probe, window) pair with
    * `w.s <= probe.t < w.e`, WITHOUT a theta join. Time is cut into
    * fixed-width bins; each window explodes into the bins it covers
    * (bounded: len/bin + 1 rows) and each probe carries its single bin,
    * so the match is an EQUI-join on the bin plus an in-row containment
    * filter. A probe can match a window in only one bin — its own — so
    * no post-join dedup is needed. This is the banded range join that
    * stays hash-partitioned at any scale; the nested-loop form Catalyst
    * would pick for the raw range predicate is probes×windows. */
  def intervalJoin(probe: DataFrame, windows: DataFrame, t: String,
                   s: String, e: String, binSec: Long): DataFrame = {
    val wb = windows.withColumn("__bin",
      explode(sequence(expr(s"$s div $binSec"), expr(s"($e - 1) div $binSec"))))
    probe.withColumn("__bin", expr(s"$t div $binSec"))
      .join(wb, "__bin")
      .filter(col(s) <= col(t) && col(t) < col(e))
      .drop("__bin")
  }

  /** `probe` and `state` must both carry `key` and `ts` columns; `state`
    * additionally carries `valCols` (one row per (key, ts) version).
    * Output: every probe row + the as-of `valCols` (null when no version
    * precedes the probe). */
  def asOfJoin(probe: DataFrame, state: DataFrame, key: String, ts: String,
               valCols: Seq[String]): DataFrame = {
    val probeOnly = probe.columns.toSeq.filterNot(c => c == key || c == ts)
    val pTag = probe.select(
      Seq(col(key), col(ts), lit(1).as("__p")) ++
        probeOnly.map(col) ++
        valCols.map(v => lit(null).cast(state.schema(v).dataType).as(v)): _*)
    val sTag = state.select(
      Seq(col(key), col(ts), lit(0).as("__p")) ++
        probeOnly.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
        valCols.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pTag.unionByName(sTag)
      .select(Seq(col(key), col(ts)) ++ Seq(col("__p")) ++ probeOnly.map(col) ++
        valCols.map(v => last(col(v), ignoreNulls = true).over(w).as(v)): _*)
      .filter(col("__p") === 1)
      .drop("__p")
  }
}
