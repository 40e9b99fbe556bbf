package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.Exprs

/** Catalyst optimizer surface of the engine (SURVEY.md §4 / §2.K).
  *
  * [[RectPipToRange]]: `pip_wkb(rect_wkb(w,s,e,n), lon, lat)` is, by the
  * engine's frozen half-open rectangle semantics (`[w,e) × [s,n)` — the
  * same contract the DuckDB oracles mirror), exactly
  * `lon >= w AND lon < e AND lat >= s AND lat < n`. The rewrite replaces a
  * CodegenFallback geometry call with four codegen'd comparisons, which
  *  - keeps the surrounding whole-stage-codegen span intact, and
  *  - exposes the predicate to further Catalyst pushdown (a literal-rect
  *    filter over a parquet column reaches the scan as a PushedFilter
  *    instead of a black-box function).
  * Axis-aligned rectangles are the dominant filter geometry (bbox queries,
  * tile bounds); arbitrary polygons keep the ray-cast expression.
  *
  * Null semantics note: the rewrite is applied ONLY inside Filter and Join
  * conditions, where NULL and FALSE are equivalent, so it is row-identical
  * there. In a projection `pip_wkb(rect, NULL, lat)` evaluates to NULL
  * (null-intolerant) while the four-comparison conjunction can evaluate to
  * FALSE (NULL AND FALSE = FALSE) — so projected occurrences (reachable via
  * the SQL surface, spark.sql.extensions) are deliberately left alone.
  *
  * Wire-up: `spark.sql.extensions=graft.plans.GraftExtensions` at session
  * build, or [[GraftExtensions.install]] on a live session (registers via
  * `spark.experimental.extraOptimizations`).
  */
object RectPipToRange extends Rule[LogicalPlan] {
  import org.apache.spark.sql.types.{BinaryType, DoubleType}

  /** A literal WKB that is a single closed axis-aligned rectangle ring
    * (the exact shape `rect_wkb` emits — ConstantFolding turns literal-arg
    * `rect_wkb` calls into such binary literals before this rule runs). */
  private def literalRect(bytes: Array[Byte]): Option[(Double, Double, Double, Double)] =
    try {
      val g = graft.core.Geo.parseWkb(bytes)
      if (!g.isPoly || g.rings.length != 1) None
      else {
        val r = g.rings(0)
        if (r.length == 10 &&
            r(0) == r(6) && r(0) == r(8) && // w
            r(2) == r(4) &&                 // e
            r(1) == r(3) && r(1) == r(9) && // s
            r(5) == r(7) &&                 // n
            r(2) > r(0) && r(5) > r(1))
          Some((r(0), r(1), r(2), r(5)))
        else None
      }
    } catch { case _: Exception => None }

  private def range(lon: Expression, lat: Expression,
                    w: Expression, s: Expression,
                    e: Expression, n: Expression): Expression =
    And(
      And(GreaterThanOrEqual(lon, w), LessThan(lon, e)),
      And(GreaterThanOrEqual(lat, s), LessThan(lat, n)))

  private def rewrite(cond: Expression): Expression = cond.transform {
    case Exprs.PipWkb(Exprs.RectWkb(w, s, e, n), lon, lat) =>
      range(lon, lat, w, s, e, n)
    case Exprs.PipWkb(Literal(bytes: Array[Byte], BinaryType), lon, lat)
        if literalRect(bytes).isDefined =>
      val (w, s, e, n) = literalRect(bytes).get
      range(lon, lat, Literal(w, DoubleType), Literal(s, DoubleType),
        Literal(e, DoubleType), Literal(n, DoubleType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ logical.Filter(cond, _) => f.copy(condition = rewrite(cond))
    case j: logical.Join if j.condition.isDefined =>
      j.copy(condition = j.condition.map(rewrite))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RectPipToRange)
}

object GraftExtensions {
  /** Register the engine's optimizer rules on an already-built session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RectPipToRange))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RectPipToRange
}
