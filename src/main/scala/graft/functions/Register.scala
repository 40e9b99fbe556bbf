package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration: exposes the engine's Catalyst expressions to
  * `spark.sql(...)` users (cell math, geometry, text, sketches) under their
  * prettyName. Idempotent per session. */
object Register {

  def all(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def f1(name: String, b: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { args => require(args.length == 1, s"$name(x)"); b(args.head) }, "scala_udf")
    def f2(name: String, b: (Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { args => require(args.length == 2, s"$name(x,y)"); b(args(0), args(1)) }, "scala_udf")
    def f3(name: String, b: (Expression, Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { args => require(args.length == 3, s"$name(x,y,z)"); b(args(0), args(1), args(2)) }, "scala_udf")
    def f4(name: String, b: (Expression, Expression, Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, { args => require(args.length == 4, s"$name(a,b,c,d)"); b(args(0), args(1), args(2), args(3)) }, "scala_udf")

    f3("cell_at", Exprs.CellAt.apply)
    f2("parent_cell", Exprs.ParentCell.apply)
    f1("hilbert_cell", Exprs.HilbertOfCell.apply)
    f2("ring_cells", Exprs.RingCells.apply)
    f2("disk_cells", Exprs.DiskCells.apply)
    f3("pip_wkb", Exprs.PipWkb.apply)
    f2("tile_cover", Exprs.TileCoverExpr.apply)
    f2("clip_to_cell", Exprs.ClipToCellWkb.apply)
    f4("rect_wkb", Exprs.RectWkb.apply)
    f1("extract_text", Exprs.ExtractText.apply)
    f1("tokenize", Exprs.TokenizeExpr.apply)
    f1("phrase_form", Exprs.PhraseFormExpr.apply)
    f1("doc_fingerprint", Exprs.DocFingerprint.apply)
    f1("simhash64", Exprs.SimHash.apply)
    f3("minhash_sig", Exprs.MinHashSig.apply)
    f2("lsh_bands", Exprs.LshBandsFromSig.apply)
  }
}
