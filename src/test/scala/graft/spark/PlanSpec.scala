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
}
