package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** The SQL-function registration path: kernels callable from
  * `spark.sql` like built-ins via the standard
  * `spark.sql.extensions` injection point.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtendedSession[A](body: SparkSession => A): A = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions (not the spark.sql.extensions conf): the conf is a
    // STATIC setting read only when the SparkContext is created, so it
    // is silently ignored when a context already exists — as it does
    // under the full test suite
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try body(s2)
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("vec_dot / vec_cosine / distinct_shingles are SQL-callable") {
    withExtendedSession { s2 =>
      val dot = s2.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
      dot shouldBe 11.0

      val cos = s2.sql(
        "SELECT vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head().getDouble(0)
      cos shouldBe 1.0 +- 1e-12

      val sh = s2.sql(
        "SELECT distinct_shingles('a b c d', 3) AS s").head().getSeq[String](0)
      sh shouldBe Seq("a b c", "b c d")

      // generator composition works like any built-in array function
      val n = s2.sql(
        "SELECT explode(distinct_shingles('a b a b a b', 2)) AS s").count()
      n shouldBe 2 // 'a b' and 'b a', deduped
    }
  }

  test("non-literal shingle size is rejected with a clear error") {
    withExtendedSession { s2 =>
      val ex = intercept[Exception] {
        s2.sql("SELECT distinct_shingles('a b c', 1 + 2)").collect()
      }
      ex.getMessage should include ("integer literal")
    }
  }
}
