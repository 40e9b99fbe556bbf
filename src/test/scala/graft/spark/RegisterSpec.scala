package graft.spark

import graft.core.{CellMath, Text}
import graft.functions.Register

/** spark.sql surface: registered functions evaluate identically to core. */
class RegisterSpec extends SparkTestBase {

  test("registered SQL functions round-trip against core") {
    Register.all(spark)
    val r = spark.sql(
      """SELECT cell_at(14, 2.3522d, 48.8566d) AS c,
        |       parent_cell(cell_at(14, 2.3522d, 48.8566d), 8) AS p,
        |       hilbert_cell(cell_at(8, 2.3522d, 48.8566d)) AS h,
        |       tokenize('Hash JOIN, fast!') AS t,
        |       phrase_form('North Street') AS pf,
        |       simhash64('the quick brown fox') AS sh,
        |       pip_wkb(rect_wkb(0.0d, 0.0d, 10.0d, 10.0d), 5.0d, 5.0d) AS inside,
        |       size(tile_cover(rect_wkb(8.3d, 47.2d, 11.7d, 49.9d), 8)) AS ncover,
        |       annulus_cells(cell_at(8, 2.3522d, 48.8566d), 1, 3) AS ann
        |""".stripMargin).head()
    val c = CellMath.lonLatToCell(14, 2.3522, 48.8566)
    assert(r.getLong(0) == c)
    assert(r.getLong(1) == CellMath.parentCell(c, 8))
    assert(r.getLong(2) == CellMath.hilbertOfCell(CellMath.lonLatToCell(8, 2.3522, 48.8566)))
    assert(r.getSeq[String](3) == Text.tokenize("Hash JOIN, fast!").toSeq)
    assert(r.getString(4) == Text.phraseForm("North Street"))
    assert(r.getBoolean(6))
    assert(r.getInt(7) > 0)
    assert(r.getSeq[Long](8) ==
      CellMath.annulusCells(CellMath.lonLatToCell(8, 2.3522, 48.8566), 1, 3).toSeq)
  }

  test("arguments are coerced to the expected input types") {
    Register.all(spark)
    val c = CellMath.lonLatToCell(14, 2.3522, 48.8566)
    // BIGINT zoom literal, INT lon/lat, string-typed number: all must Cast
    // instead of ClassCastException-ing at eval time
    val r = spark.sql(
      s"""SELECT parent_cell(${c}L, 8L) AS p,
         |       cell_at(14, 2, 48) AS ci,
         |       pip_wkb(rect_wkb(0, 0, 10, 10), '5', 5) AS inside
         |""".stripMargin).head()
    assert(r.getLong(0) == CellMath.parentCell(c, 8))
    assert(r.getLong(1) == CellMath.lonLatToCell(14, 2.0, 48.0))
    assert(r.getBoolean(2))
  }

  test("registration is idempotent") {
    Register.all(spark)
    Register.all(spark)
    assert(spark.sql("SELECT hilbert_cell(cell_at(4, 0.0d, 0.0d))").head().getLong(0) >= 0)
  }
}
