package graft

import graft.tools.PlanAudit

/** The scale-shape audit as a GATE, not a report: every registered
  * query's physical plan is swept for the three smells that become
  * 100 TB incidents (un-partitioned window, cartesian/broadcast-NL
  * join, interpreted-HOF quadratic generator — [[PlanAudit.flagsOf]],
  * the single shared definition), and the result must equal the
  * EXPLICIT allowlist below flag-for-flag. The 19 allowed rows were
  * hand-adjudicated across rounds 6-9 (each entry carries its bounding
  * reason); this spec exists so the list can never silently grow — a
  * NEW flag, a flag-count change, or a builder error fails `sbt test`
  * with the offending query named, and REMOVING a smell shows up as an
  * obsolete allowlist row to delete.
  */
class PlanAuditSpec extends SparkSpec {

  /** query -> (unpartWindow, cartesian, quadGen, bounding reason). */
  private val Allow: Map[String, (Int, Int, Int, String)] = Map(
    // exact all-pairs baselines feeding thresholded recall/agreement
    // oracles — each has a bucketed/probed scale tier that IS the
    // production path; the exact tier exists to MEASURE that tier
    "sim_topk" -> ((0, 1, 0, "exact recall baseline; sim_topk_{lsh,ivf,ivf_rerank} are the scale tiers")),
    "knn_classify" -> ((0, 1, 0, "exact classifier baseline; knn_classify_ivf is the scale tier")),
    "hard_negatives" -> ((0, 1, 0, "exact miner baseline; hard_negatives_ivf is the scale tier")),
    "emb_neardup" -> ((0, 1, 0, "exact pair baseline; emb_neardup_srp{,_auto} are the scale tiers")),
    "edit_dist_join" -> ((0, 1, 0, "exact baseline on a constant id slice; banded tier is the scale path")),
    "fuzzy_link" -> ((0, 2, 0, "two-sided exact link baseline on constant slices; blocked tier scales")),
    // 1-row threshold/constant attaches: a cross join against a
    // single-row aggregate is a broadcast of one row, not a quadratic
    "dsir_resample" -> ((0, 1, 0, "1-row normalization-constant attach")),
    "mix_temperature" -> ((0, 1, 0, "1-row temperature-denominator attach")),
    "token_budget" -> ((1, 1, 0, "1-row budget attach; cumulative window over #strata rows")),
    "mixture_select" -> ((0, 2, 0, "two 1-row share-denominator attaches")),
    "mixture_select_tokens" -> ((0, 2, 0, "two 1-row share-denominator attaches")),
    "group_quantiles" -> ((0, 1, 0, "1-row corpus-count attach")),
    "profile_hist" -> ((0, 1, 0, "1-row corpus-count attach for bin shares")),
    "text_tfidf" -> ((0, 1, 0, "1-row corpus doc-count attach for idf")),
    "text_bm25" -> ((0, 1, 0, "1-row avgdl/doc-count attach")),
    // bounded-frame windows: ranking runs AFTER a limit()/aggregation
    // that pins the frame to a constant or #strata/#bins row count
    "rag_ingest" -> ((1, 0, 0, "window ranks a post-limit(20) frame")),
    "profile_skew" -> ((1, 0, 0, "window over the #columns skew-summary frame")),
    "eval_metrics" -> ((1, 1, 0, "PR-curve window over threshold grid; 1-row total attach")),
    "quality_gate" -> ((2, 1, 0, "quantile windows over #bins frames; 1-row cutoff attach")))

  test("every registry plan matches the documented flag allowlist exactly") {
    val sfDir = "/root/testdata/sf0.001"
    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val got =
        try PlanAudit.flagsOf(
          PlanAudit.unwrap(fn(spark, sfDir).queryExecution.executedPlan))
        catch {
          case e: Throwable =>
            diffs += s"$name: builder ERROR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(80)}"
            (0, 0, 0)
        }
      val want = Allow.get(name).map(a => (a._1, a._2, a._3)).getOrElse((0, 0, 0))
      if (got != want)
        diffs += s"$name: flags $got != allowlisted $want" +
          (if (!Allow.contains(name)) " (NOT on the allowlist — justify or fix)" else "")
    }
    // an allowlist row whose query vanished is stale — delete it
    val gone = Allow.keySet -- SparkEntry.queries.keySet
    gone.foreach(q => diffs += s"$q: allowlisted but not registered (stale row)")
    withClue(diffs.mkString("\n")) { diffs shouldBe empty }
  }
}
