package graft.spark

import org.apache.spark.sql.functions._
import graft.queries.Queries
import graft.ops.TextOps

/** Host link graph + KMV distinct sketch: structural invariants and a
  * from-scratch JVM re-derivation of the k-th minimum hash. */
class LinkKmvSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("link_graph: 3 outlinks per page survive extraction; hosts are well-formed") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val g = Queries.linkGraph(spark, sf)
    val rows = g.collect()
    assert(rows.map(_.getLong(2)).sum == 3 * n)
    val hostPat = "^h\\d{1,2}\\.example\\.org$".r
    rows.foreach { r =>
      assert(hostPat.findFirstIn(r.getString(0)).isDefined, r.getString(0))
      assert(hostPat.findFirstIn(r.getString(1)).isDefined, r.getString(1))
    }
    // spot-check one page's edge endpoints (doc 0 -> hosts 17,34,51 from h0)
    val from0 = rows.filter(_.getString(0) == "h0.example.org").map(_.getString(1)).toSet
    assert(Set("h17.example.org", "h34.example.org", "h51.example.org").subsetOf(from0))
  }

  test("term_burst: deviations sum to zero per term; dense 8 bins per term; z sign tracks dev") {
    val out = TextOps.termBurst(spark.read.parquet(s"$sf/documents.parquet")).collect()
    val byTok = out.groupBy(_.getString(0))
    byTok.foreach { case (tok, rows) =>
      assert(rows.length == 8, s"$tok bins")
      assert(rows.map(_.getLong(3)).sum == 0L, s"$tok dev sum")
      rows.foreach(r => assert(r.getLong(3).signum == math.signum(r.getDouble(4)).toInt ||
        r.getDouble(4) == 0.0))
    }
  }

  test("kmv_distinct: kth hash matches a from-scratch FNV-1a fold; estimate within 3x of exact") {
    def fnv(s: String): Long = {
      var h = -3750763034362895579L // 14695981039346656037 as signed
      s.foreach { ch => h = (h ^ ch.toLong) * 1099511628211L }
      h
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val brute = docs.select(col("lang"), col("text")).collect()
      .flatMap { r =>
        val t = r.getString(1).split(' ')
        t.sliding(2).filter(_.length == 2).map(w => (r.getString(0), w.mkString(" ")))
      }.distinct.groupBy(_._1)
    val out = TextOps.kmvDistinct(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lang, nExact, kth, est) = (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val bgs = brute(lang).map(_._2)
      assert(nExact == bgs.length)
      val uxs = bgs.map(b => fnv(b) ^ Long.MinValue).sorted
      assert(kth == uxs(15), s"lang $lang kth")
      assert(est > nExact / 3.0 && est < nExact * 3.0, s"lang $lang est=$est exact=$nExact")
    }
  }
}
