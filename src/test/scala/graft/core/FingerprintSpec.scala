package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class FingerprintSpec extends AnyFunSuite {
  import Fingerprint._

  test("fnv1a64 known vectors") {
    assert(fnv1a64("") == 0xcbf29ce484222325L)
    assert(fnv1a64("a") == 0xaf63dc4c8601ec8cL)
    assert(fnv1a64("foobar") == 0x85944171f73967e8L)
  }

  test("mix64 is deterministic and spreads") {
    assert(mix64(0L) == mix64(0L))
    assert(mix64(1L) != mix64(2L))
    val outs = (0L until 1000L).map(mix64).toSet
    assert(outs.size == 1000)
  }

  test("docFingerprint is order-sensitive") {
    assert(docFingerprint("ab") != docFingerprint("ba"))
    assert(docFingerprint("same text") == docFingerprint("same text"))
  }

  test("shingles: k-grams and short-text fallback") {
    val s = shingles(Array("a", "b", "c", "d"), 3)
    assert(s.length == 2)
    assert(s(0) == fnv1a64("a b c") && s(1) == fnv1a64("b c d"))
    val short = shingles(Array("a"), 3)
    assert(short.length == 1 && short(0) == fnv1a64("a"))
    assert(shingles(Array.empty[String], 3).isEmpty)
  }

  test("minhash estimates jaccard within tolerance") {
    val r = new Random(11)
    val nH = 128
    for (_ <- 1 to 30) {
      val base = Array.fill(200)(r.nextLong())
      val keep = 0.3 + r.nextDouble() * 0.6
      val b = base.filter(_ => r.nextDouble() < keep) ++ Array.fill(30)(r.nextLong())
      val trueJ = jaccard(base, b)
      val sigA = minhash(base, nH)
      val sigB = minhash(b, nH)
      val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / nH
      assert(math.abs(est - trueJ) < 0.18, s"est=$est true=$trueJ")
    }
  }

  test("lshBands: identical signatures share all bands; near-dups share some") {
    val r = new Random(5)
    val base = Array.fill(300)(r.nextLong())
    val near = base.take(285) ++ Array.fill(15)(r.nextLong()) // J ≈ 0.905
    val far = Array.fill(300)(r.nextLong())
    val nH = 128; val rows = 4
    val bA = lshBands(minhash(base, nH), rows)
    val bNear = lshBands(minhash(near, nH), rows)
    val bFar = lshBands(minhash(far, nH), rows)
    assert(bA.sameElements(lshBands(minhash(base, nH), rows)))
    assert(bA.intersect(bNear).nonEmpty, "near-duplicate should share at least one LSH band")
    assert(bA.intersect(bFar).isEmpty)
  }

  test("simhash: similar docs have small hamming distance") {
    val doc = "the quick brown fox jumps over the lazy dog again and again".split(' ')
    val similar = "the quick brown fox jumps over the lazy cat again and again".split(' ')
    val different = "completely unrelated words about spark shuffles and parquet row groups".split(' ')
    val h1 = simhash64(doc); val h2 = simhash64(similar); val h3 = simhash64(different)
    assert(hamming64(h1, h2) < hamming64(h1, h3))
    assert(hamming64(h1, h1) == 0)
  }

  test("jaccard edge cases") {
    assert(jaccard(Array.empty, Array.empty) == 1.0)
    assert(jaccard(Array(1L, 2L), Array(1L, 2L)) == 1.0)
    assert(jaccard(Array(1L), Array(2L)) == 0.0)
  }
}
