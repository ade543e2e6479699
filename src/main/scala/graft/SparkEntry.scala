package graft

import graft.orchestrator.SparkExpectations
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    DqQueries.all ++ AnalyticsQueries.all ++ TextQueries.all ++
      EngineExtQueries.all ++ PipelineExtQueries.all

  /** Flagship: the full five-stage DQ pipeline on sf0.001 lineitem —
    * row rules (incl. a window uniqueness rule), agg rules, drop
    * enforcement — returning the surviving rows.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li  = Tables.load(spark, dir, "lineitem")
    val se  = new SparkExpectations("graft", "lineitem",
      DqQueries.rowRules ++ DqQueries.aggRules)
    se.run(li).finalDf
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
