package graft.spark

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.plans.{GraftExtensions, RectPipToRange}
import graft.synth.Synth

/** Catalyst optimizer rule: rect-PIP → codegen'd range predicate. */
class ExtensionsSpec extends SparkTestBase {

  private def rectPipDf = {
    val pts = Synth.eventPoints(spark, "/root/testdata/sf0.001")
    pts.filter(F.pipWkb(
      F.rectWkb(lit(-30.0), lit(-20.0), lit(40.0), lit(35.0)),
      col("elon"), col("elat")))
  }

  test("RectPipToRange rewrites the fused pattern out of the optimized plan") {
    val expected = rectPipDf.count() // without the rule
    GraftExtensions.install(spark)
    try {
      val df = rectPipDf
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("pip_wkb"), s"pip_wkb survived:\n${opt.take(500)}")
      assert(opt.contains(">=") && opt.contains("<"), "range predicate expected")
      assert(df.count() == expected, "rewrite must be row-identical")
      // equivalence against the explicit range filter
      val pts = Synth.eventPoints(spark, "/root/testdata/sf0.001")
      val manual = pts.filter(col("elon") >= -30.0 && col("elon") < 40.0 &&
        col("elat") >= -20.0 && col("elat") < 35.0).count()
      assert(df.count() == manual)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RectPipToRange)
    }
  }

  test("non-rect-shaped rect_wkb still rewrites (column bounds)") {
    GraftExtensions.install(spark)
    try {
      val feats = Synth.custFeatures(spark, "/root/testdata/sf0.001")
      val df = feats.filter(F.pipWkb(col("geom_wkb"), col("flon"), col("flat")))
      // geom_wkb IS rect_wkb(west, south, east, north) → rewritten ranges
      assert(!df.queryExecution.optimizedPlan.toString.contains("pip_wkb"))
      assert(df.count() == feats.count()) // every center inside its own rect
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RectPipToRange)
    }
  }

  test("non-rect geometry is left to the ray-cast expression") {
    GraftExtensions.install(spark)
    try {
      // pentagon: not an axis-aligned rect — must keep pip_wkb
      val penta = graft.core.Geo.writeWkbPolygon(Array(Array(
        0.0, 0.0, 4.0, 0.0, 5.0, 3.0, 2.0, 5.0, -1.0, 3.0, 0.0, 0.0)))
      val pts = Synth.eventPoints(spark, "/root/testdata/sf0.001")
      val df = pts.filter(F.pipWkb(lit(penta), col("elon"), col("elat")))
      assert(df.queryExecution.optimizedPlan.toString.contains("pip_wkb"))
      df.count() // evaluates the untouched expression
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RectPipToRange)
    }
  }
}
