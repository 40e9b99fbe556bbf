package graft.spark

import org.apache.spark.sql.functions._
import graft.queries.Queries
import graft.synth.Synth

/** Page geotagging + context-coherence toponym disambiguation: brute-force
  * re-derivations of both operators from the raw mention join at sf0.001.
  * (Cross-engine bit-identity is the driver oracle's job; these pin the
  * SEMANTICS — argmax, centroid bounds, nearest-anchor choice.) */
class GeotagSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def bruteMentions(gaz: Vector[Synth.GazFeature]) = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), " " + r.getString(1) + " "))
    for {
      (did, padded) <- docs
      g <- gaz
      if padded.contains(" " + g.name + " ")
    } yield (did, g)
  }

  test("page_geotag: one row per mentioned doc; top_gid is the (score, gid) argmax; centroid inside the mention bbox") {
    val out = Queries.pageGeotag(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val brute = bruteMentions(Synth.gazetteer).groupBy(_._1)
    assert(out.keySet == brute.keySet)
    brute.foreach { case (did, ms) =>
      val (n, top, clon, clat) = out(did)
      assert(n == ms.map(_._2.id).distinct.size)
      val best = ms.map(_._2).distinct.maxBy(g => (g.score, -g.id))
      assert(top == best.id, s"doc $did top")
      val lons = ms.map(_._2.lon); val lats = ms.map(_._2.lat)
      assert(clon >= lons.min - 1e-6 && clon <= lons.max + 1e-6)
      assert(clat >= lats.min - 1e-6 && clat <= lats.max + 1e-6)
    }
  }

  test("toponym_resolve: every ambiguous (doc, name) resolved to the candidate nearest the anchor centroid (or proximity point)") {
    val out = Queries.toponymResolve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val brute = bruteMentions(Synth.ambGaz).groupBy(_._1)
    val nCand = Synth.ambGaz.groupBy(_.name).map { case (n, gs) => n -> gs.size }
    var ambPairs = 0
    brute.foreach { case (did, ms) =>
      val gs = ms.map(_._2).distinct
      val anchors = gs.filter(g => nCand(g.name) == 1)
      val (rlon, rlat) =
        if (anchors.nonEmpty)
          (anchors.map(g => math.round(g.lon * 1e6)).sum.toDouble / (anchors.size * 1e6),
            anchors.map(g => math.round(g.lat * 1e6)).sum.toDouble / (anchors.size * 1e6))
        else // the proximity point, re-derived exactly as Synth does
          (((did * 7919) % 360000) / 1000.0 - 180.0, ((did * 104729) % 140000) / 1000.0 - 70.0)
      gs.filter(g => nCand(g.name) > 1).groupBy(_.name).foreach { case (nm, cands) =>
        ambPairs += 1
        def hav(g: Synth.GazFeature): Double = {
          val p = math.Pi / 180.0
          2.0 * 6371.0088 * math.asin(math.min(1.0, math.sqrt(
            math.pow(math.sin((g.lat - rlat) * p / 2), 2) +
              math.cos(rlat * p) * math.cos(g.lat * p) *
                math.pow(math.sin((g.lon - rlon) * p / 2), 2))))
        }
        val want = cands.minBy(g => (hav(g), g.id)).id
        assert(out((did, nm)) == want, s"doc $did name $nm")
      }
    }
    assert(out.size == ambPairs)
    // the fixture exercises both branches: docs with and without anchors
    val withAnchor = Queries.toponymResolve(spark, sf).filter(col("n_anchors") > 0).count()
    assert(withAnchor > 0 && withAnchor < out.size)
  }
}
