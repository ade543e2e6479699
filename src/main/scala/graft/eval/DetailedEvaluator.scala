package graft.eval

import graft.model.Rule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Detailed agg/query evaluation: splits an expectation into
  * (aggregate-expression, comparator, bound[s]), computes the actual
  * aggregate value with Spark, and re-checks the comparison driver-side.
  *
  * Reference: utils/actions.py:122-301 with the regexes from
  * config/user_config.py:105-115. The reference re-evaluates the
  * comparator with a second Spark job; here the comparison happens on the
  * driver (same result, one job saved).
  */
object DetailedAggEvaluator {

  /** `<agg expr> between <lo> and <hi>` (case-insensitive). */
  private val BetweenRe =
    """(?is)^\s*(.+?)\s+between\s+(.+?)\s+and\s+(.+?)\s*$""".r

  /** `<agg expr> <cmp> <bound>` where cmp ∈ {>=, <=, >, <, =, ==, !=, <>}. */
  private val CmpRe =
    """(?s)^\s*(.+?)\s*(>=|<=|!=|<>|==|=|>|<)\s*(.+?)\s*$""".r

  final case class Detail(
      rule: Rule,
      actualValue: Any,
      expectedDescription: String,
      status: String
  )

  def parse(expectation: String): Option[(String, String, Seq[String])] =
    expectation match {
      case BetweenRe(agg, lo, hi) => Some((agg, "between", Seq(lo, hi)))
      case CmpRe(agg, cmp, bound) => Some((agg, cmp, Seq(bound)))
      case _                      => None
    }

  private def toD(a: Any): Option[Double] = a match {
    case null                 => None
    case n: java.lang.Number  => Some(n.doubleValue())
    case d: java.math.BigDecimal => Some(d.doubleValue())
    case s: String            => scala.util.Try(s.trim.toDouble).toOption
    case other                => scala.util.Try(other.toString.toDouble).toOption
  }

  private def compare(actual: Any, cmp: String, bounds: Seq[Double]): Boolean =
    toD(actual) match {
      case None => false
      case Some(a) => cmp match {
        case "between" => a >= bounds(0) && a <= bounds(1)
        case ">"  => a > bounds(0)
        case ">=" => a >= bounds(0)
        case "<"  => a < bounds(0)
        case "<=" => a <= bounds(0)
        case "=" | "==" => a == bounds(0)
        case "!=" | "<>" => a != bounds(0)
        case _ => false
      }
    }

  /** One `df.agg(...)` per distinct rule (the aggregate expressions can be
    * batched into a single job when several rules share a stage).
    */
  def run(df: DataFrame, rules: Seq[Rule]): Seq[Detail] = {
    val parsed = rules.map(r => r -> parse(r.expectation))
    val evaluable = parsed.collect { case (r, Some(p)) => (r, p) }
    if (evaluable.isEmpty) return Seq.empty
    // batch every rule's aggregate into ONE global aggregation job
    val aggCols = evaluable.zipWithIndex.map { case ((_, (agg, _, _)), i) =>
      expr(agg).cast("string").alias(s"a_$i")
    }
    val row = df.select(aggCols: _*).head()
    evaluable.zipWithIndex.map { case ((r, (_, cmp, boundStrs)), i) =>
      val actual = row.get(i)
      val bounds = boundStrs.map(b => scala.util.Try(b.trim.toDouble).getOrElse(Double.NaN))
      val ok     = compare(actual, cmp, bounds)
      Detail(r, actual, s"$cmp ${boundStrs.mkString(" and ")}",
        if (ok) "pass" else "fail")
    }
  }
}

/** Detailed query evaluation + custom query output.
  *
  * For a composite query_dq expectation the sub-queries have already been
  * split by [[graft.rules.CompositeQuerySplitter]]; each named sub-query is
  * executed via `spark.sql` and its rows captured for the query-output
  * table; the final expectation is evaluated as
  * `SELECT (<expectation>) AS output` (reference: utils/actions.py:302-424).
  */
object DetailedQueryEvaluator {

  final case class QueryDetail(
      rule: Rule,
      status: String,
      subQueryOutputs: Map[String, String]
  )

  def evalBoolean(spark: SparkSession, expectation: String): Boolean = {
    val row = spark.sql(s"SELECT ($expectation) AS output").head()
    !row.isNullAt(0) && row.getBoolean(0)
  }

  def run(spark: SparkSession, rules: Seq[Rule],
          subQueries: Map[String, Map[String, String]]): Seq[QueryDetail] =
    rules.map { r =>
      val subs = subQueries.getOrElse(r.rule, Map.empty)
      val outputs = subs.map { case (alias, sql) =>
        val rows = spark.sql(sql).collect()
        alias -> rows.map(_.toSeq.mkString("[", ",", "]")).mkString(";")
      }
      val ok = scala.util.Try(evalBoolean(spark, r.expectation)).getOrElse(false)
      QueryDetail(r, if (ok) "pass" else "fail", outputs)
    }
}
