package graft.spark

import graft.queries.Queries

/** Physical-plan regression guards: the properties that make the pipelines
  * scale must survive refactors (SURVEY.md §4; BENCH.md "known plan
  * properties"). */
class PlanSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("fwd_geocode: stack join shuffles, gazetteer broadcasts, top-k pushed") {
    val p = plan(Queries.fwdGeocode(spark, "/root/testdata/sf0.001"))
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      "per-doc stack join must not be a broadcast")
    assert(p.contains("BroadcastHashJoin"), "gazetteer join should broadcast")
    assert(p.contains("WindowGroupLimit"), "top-k should use WindowGroupLimit pushdown")
  }

  test("reverse_pip: single probe pass, broadcast cover index, no extra exchange") {
    val p = plan(Queries.reversePip(spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // events scanned exactly once
    assert("events\\.parquet".r.findAllIn(p).size == 1, "probe table scanned more than once")
  }

  test("documents scan prunes to the referenced columns only") {
    val p = plan(Queries.freqIndex(spark, "/root/testdata/sf0.001"))
    assert(p.contains("ReadSchema: struct<text:string>"),
      s"expected pruned ReadSchema, got:\n${p.take(600)}")
  }

  test("fwd_geocode_indexed: gazetteer is NEVER a name-broadcast — every join shuffles") {
    val p = plan(Queries.fwdGeocodeIndexed(spark, "/root/testdata/sf0.001"))
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      "indexed forward path must not broadcast the gazetteer/index in any form")
    assert(p.contains("ShuffledHashJoin"), "phrase_id/verify joins should shuffle-hash")
  }

  test("fuzzy joins are deletion-blocked equi-joins, not nested loops") {
    val pm = plan(Queries.fuzzyMatch(spark, "/root/testdata/sf0.001"))
    val pn = plan(Queries.fuzzyMentions(spark, "/root/testdata/sf0.001"))
    for (p <- Seq(pm, pn)) {
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "fuzzy match must stay an equi-join on deletion keys")
      assert(p.contains("BroadcastHashJoin"), "deletion-key dictionary join should hash")
    }
  }

  test("lang_fallback is an equi-join on (lang, phrase), not a θ-contains join") {
    val p = plan(Queries.langFallback(spark, "/root/testdata/sf0.001"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("fwd_geocode_idf: idf sums are in-row (broadcast TermStats), not freq joins") {
    val df = Queries.fwdGeocodeIdf(spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assert(p.contains("term_weight_sum"), "broadcast freq-cache expression expected")
    // the only joins are the broadcast gazetteer join and the stack join —
    // no shuffle round-trips for per-term idf lookups
    assert(!p.contains("SortMergeJoin"))
    assert("ShuffledHashJoin".r.findAllIn(p).size == 1, "only the stack join may shuffle")
  }

  test("fwd_geocode_multi: chain pool joins shuffle on doc_id, never broadcast; top-k pushed") {
    val p = plan(Queries.fwdGeocodeMulti(spark, "/root/testdata/sf0.001"))
    assert(p.contains("ShuffledHashJoin"), "pool joins must shuffle-hash")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "N-level coalesce must stay an equi-join on doc_id with residual cell predicates")
    assert(p.contains("WindowGroupLimit"), "final top-k should push WindowGroupLimit")
  }

  test("fwd_autocomplete_fuzzy stays deletion-key blocked (no nested loop)") {
    val p = plan(Queries.fwdAutocompleteFuzzy(spark, "/root/testdata/sf0.001"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), "prefix deletion-key dictionary join should hash")
  }

  test("fwd_geocode_indexed prunes windows with the broadcast phrase-id set pre-shuffle") {
    val p = plan(Queries.fwdGeocodeIndexed(spark, "/root/testdata/sf0.001"))
    assert(p.contains("long_set_contains"),
      "semi-join reduction filter must run before the grid shuffle")
  }

  test("ngram_jaccard candidates come from the prefix-token equi-join") {
    import graft.ops.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = plan(TextOps.ngramJaccard(TextOps.withMutatedCopies(docs)))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }
}
