package graft.spark

import org.apache.spark.sql.functions._
import graft.core.{CellMath, Geo, Text}
import graft.functions.F

/** Catalyst expressions agree with the pure core (eval + codegen paths). */
class ExprsSpec extends SparkTestBase {

  test("cell_at / parent_cell / hilbert expressions match core") {
    import spark.implicits._
    val pts = Seq((2.3522, 48.8566), (-74.006, 40.7128), (151.2, -33.86), (0.0, 0.0))
    val df = pts.toDF("lon", "lat")
      .withColumn("c14", F.cellAt(lit(14), col("lon"), col("lat")))
      .withColumn("p8", F.parentCell(col("c14"), lit(8)))
      .withColumn("h", F.hilbertCell(col("c14")))
      .collect()
    pts.zip(df).foreach { case ((lon, lat), row) =>
      val c = CellMath.lonLatToCell(14, lon, lat)
      assert(row.getLong(2) == c)
      assert(row.getLong(3) == CellMath.parentCell(c, 8))
      assert(row.getLong(4) == CellMath.hilbertOfCell(c))
    }
    // known-good spot check: Paris z14
    val paris = CellMath.lonLatToCell(14, 2.3522, 48.8566)
    assert(CellMath.xOf(paris) == 8299 && CellMath.yOf(paris) == 5636)
  }

  test("ring/disk cells expressions match core") {
    import spark.implicits._
    val c = CellMath.lonLatToCell(8, 10.0, 50.0)
    val r = Seq(c).toDF("cell")
      .select(F.ringCells(col("cell"), lit(2)).as("ring"),
        F.diskCells(col("cell"), lit(2)).as("disk"))
      .head()
    assert(r.getSeq[Long](0).toArray.sorted.sameElements(CellMath.ringCells(c, 2).sorted))
    assert(r.getSeq[Long](1).length == 25)
  }

  test("rect_wkb + pip_wkb: half-open [w,e) x [s,n) semantics") {
    import spark.implicits._
    val df = Seq((0.0, 0.0, 10.0, 10.0)).toDF("w", "s", "e", "n")
      .withColumn("g", F.rectWkb(col("w"), col("s"), col("e"), col("n")))
    val cases = Seq(
      (5.0, 5.0, true), (0.0, 5.0, true), (10.0, 5.0, false),
      (5.0, 0.0, true), (5.0, 10.0, false), (0.0, 0.0, true),
      (-1.0, 5.0, false), (11.0, 5.0, false))
    cases.foreach { case (lon, lat, want) =>
      val got = df.select(F.pipWkb(col("g"), lit(lon), lit(lat))).head().getBoolean(0)
      assert(got == want, s"pip($lon,$lat) want=$want got=$got")
    }
  }

  test("tile_cover of a rect equals the tile-range cross product") {
    import spark.implicits._
    val (w, s, e, n) = (8.3, 47.2, 11.7, 49.9)
    val cover = Seq(1).toDF("i")
      .select(F.tileCover(F.rectWkb(lit(w), lit(s), lit(e), lit(n)), lit(8)).as("c"))
      .head().getSeq[Long](0).toSet
    val xs = CellMath.lonToX(8, w) to CellMath.lonToX(8, e)
    val ys = CellMath.latToY(8, n) to CellMath.latToY(8, s)
    val expect = (for { x <- xs; y <- ys } yield CellMath.pack(8, x, y)).toSet
    assert(cover == expect)
  }

  test("tokenize / extract_text expressions match core") {
    import spark.implicits._
    val html = "<html><title>T&amp;t</title><body><p>Hello  <b>World</b></p><script>no()</script></body></html>"
    val r = Seq((html.getBytes("UTF-8"), "Hash JOIN, fast!")).toDF("h", "t")
      .select(F.extractText(col("h")).as("x"), F.tokenize(col("t")).as("k"),
        F.phraseForm(col("t")).as("p"))
      .head()
    assert(r.getString(0) == Text.extractText(html.getBytes("UTF-8")))
    assert(r.getSeq[String](1) == Text.tokenize("Hash JOIN, fast!").toSeq)
    assert(r.getString(2) == Text.phraseForm("Hash JOIN, fast!"))
  }

  test("mention_windows generator equals the array-HOF window derivation") {
    import spark.implicits._
    val docs = Seq("the hash join data pipeline", "one", "a a a b").toDF("text")
    val viaGen = docs.select(col("text"), F.mentionWindows(col("text")).as("phrase"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaHof = docs
      .withColumn("toks", F.tokenize(col("text")))
      .select(col("text"), explode(array_distinct(concat(
        col("toks"),
        zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))))).as("phrase"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaGen == viaHof)
  }

  test("del_keys equals the HOF deletion-neighborhood derivation") {
    import spark.implicits._
    val toks = Seq("paris", "a", "", "tokyo", "aa").toDF("tok")
    val viaNative = toks.select(col("tok"), F.delKeys(col("tok")).as("dk"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    val viaHof = toks.select(col("tok"),
        expr("array_distinct(transform(sequence(0, length(tok)), i -> concat(left(tok, i), substr(tok, i+2))))").as("dk"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    // same SET of keys suffices for blocking; the HOF emits the identity
    // key at i=length, the native form appends it last — orders align too
    assert(viaNative.view.mapValues(_.toSet).toMap == viaHof.view.mapValues(_.toSet).toMap)
  }

  test("sorted_inter_count equals size(array_intersect) on sorted distinct longs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { _ =>
      (Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted,
       Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted)
    }
    val got = rows.toDF("a", "b")
      .select(F.sortedInterCount(col("a"), col("b")).as("n"),
        size(array_intersect(col("a"), col("b"))).as("m"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("window_strings equals per-length slicing with per-doc dedup") {
    import spark.implicits._
    val docs = Seq("the hash join data pipeline", "one", "a a a b", "").toDF("text")
    val lengths = Seq(2, 3)
    val viaNative = docs.select(col("text"),
        explode(F.windowStrings(col("text"), lengths)).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaSlices = docs
      .withColumn("toks", F.tokenize(col("text")))
      .select(col("text"), explode(flatten(transform(
        array(lengths.map(lit): _*), l =>
          when(size(col("toks")) >= l,
            transform(sequence(lit(1), size(col("toks")) - l + lit(1)),
              i => array_join(slice(col("toks"), i, l), " ")))
            .otherwise(array().cast("array<string>"))))).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaNative == viaSlices)
  }

  test("haversine column mirrors core within 1e-9 (London-Paris ~343.5km)") {
    import spark.implicits._
    val d = Seq((-0.1276, 51.5072, 2.3522, 48.8566)).toDF("a", "b", "c", "d")
      .select(F.haversineKm(col("a"), col("b"), col("c"), col("d"))).head().getDouble(0)
    assert(math.abs(d - Geo.haversineKm(-0.1276, 51.5072, 2.3522, 48.8566)) < 1e-9)
    assert(math.abs(d - 343.5) < 1.0)
  }
}
