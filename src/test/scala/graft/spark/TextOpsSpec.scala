package graft.spark

import org.apache.spark.sql.functions._
import graft.ops.{TextOps, Ann}
import graft.core.{Fingerprint, Text}

/** Dedup family + ANN contracts on planted near-duplicates. */
class TextOpsSpec extends SparkTestBase {

  private def docsDf = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again tonight"
    Seq(
      (0L, base, "en", "s", base.length.toLong),
      (1L, base + " extra", "en", "s", (base.length + 6).toLong), // near-dup of 0
      (2L, "completely different words about spark window functions and joins", "en", "s", 64L),
      (3L, base, "en", "s", base.length.toLong) // exact dup of 0
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("dedup_exact keeps lowest id per text group") {
    val out = TextOps.dedupExact(docsDf).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L) == 2) // group of {0, 3}
  }

  test("minhash LSH finds planted near-dups and exact dups") {
    val pairs = TextOps.dedupMinHash(docsDf, threshold = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("simhash blocking finds exact dup, rejects unrelated") {
    val pairs = TextOps.dedupSimHash(docsDf, maxHamming = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhash estimated jaccard tracks exact jaccard on shingle sets") {
    val a = Fingerprint.shingles(Text.tokenize("a b c d e f g h i j k l m n"), 3)
    val b = Fingerprint.shingles(Text.tokenize("a b c d e f g h i j k l x y"), 3)
    val exact = Fingerprint.jaccard(a, b)
    val sa = Fingerprint.minhash(a, 256)
    val sb = Fingerprint.minhash(b, 256)
    val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - exact) < 0.15)
  }

  test("LSH ANN recall vs brute force is substantial") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Ann.bruteForceTopK(emb, 20, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(emb, 20, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall > 0.1, s"recall=$recall") // bucketing trades recall for joinability
    assert(lsh.nonEmpty)
  }

  test("mm_decode plumbing: schema and determinism") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.ops.Multimodal.decodeMeta(spark, docs)
    assert(out.columns.toSeq ==
      Seq("doc_id", "byte_len", "width", "height", "channels", "est_frames"))
    val r = out.filter(col("doc_id") === 0).head()
    val n = docs.filter(col("doc_id") === 0).head().getAs[String]("text").getBytes("UTF-8").length
    assert(r.getLong(1) == n && r.getLong(2) == n % 640 + 16)
  }
}
