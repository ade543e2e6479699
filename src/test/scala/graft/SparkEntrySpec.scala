package graft

/** The driver contract itself: `entry` is the flagship smoke the round
  * driver runs first (rows > 0 at sf0.001), and every `queries` entry
  * must pair column names with its `oracleSql` so the driver's
  * sort-columns-by-name hash compare can't mismatch on aliases.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on the sf0.001 flagship") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every query has a name and every oracle key has a query") {
    SparkEntry.queries.keySet should contain allElementsOf SparkEntry.oracleSql.keySet
    SparkEntry.queries.size should be >= 59
  }
}
