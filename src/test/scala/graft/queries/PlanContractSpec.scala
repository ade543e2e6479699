package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan contracts: the scale properties the headline queries were tuned
  * for, pinned as assertions on the physical plan so a regression (a
  * forced broadcast, a lost pushdown, an extra shuffle) fails a test
  * instead of only showing up in a bench delta at 100×.
  */
class PlanContractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1_pricing reads only the needed lineitem columns") {
    val p = plan("q1_pricing")
    p should include ("l_returnflag")
    // a scan that drags the wide/unused columns along is a 100 TB bug
    p should not include "l_comment"
    p should not include "l_orderkey"
  }

  test("q3_top_orders pushes every filter into its scan; no forced broadcasts") {
    val p = plan("q3_top_orders")
    // predicate pushdown reaches all three scans
    p should include ("(c_mktsegment")
    p should include ("(l_shipdate")
    p should include ("(o_orderdate")
    // joins are AQE/size-chosen (broadcast at this sf is fine — the
    // contract is that the SCALING side carries no hint forcing it)
    p should not include "joinHint"
  }

  test("q_window_top_parts shares ONE suppkey exchange between aggregate and window") {
    val p = plan("q_window_top_parts")
    val hashExchanges = p.split("Exchange hashpartitioning").length - 1
    hashExchanges shouldBe 1 // agg + window cluster on the same key
    // Spark's rank-limit pushdown must stay effective (top-k per group
    // prunes before the final window sort)
    p should include ("WindowGroupLimit")
  }

  test("shingleRows is scan -> kernel -> explode with NO shuffle") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.Dedup.shingleRows(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    p should not include "Exchange"
  }
}
