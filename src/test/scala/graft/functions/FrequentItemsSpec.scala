package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], capacity: Int, parts: Int = 4): Map[String, Long] =
    items.toDF("x").repartition(parts)
      .agg(FrequentItems.frequentItems(col("x"), capacity).as("fi"))
      .head().getAs[Map[String, Long]]("fi")

  test("exact mode: capacity above distinct count gives exact frequencies") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val got = sketch(scala.util.Random.shuffle(items), capacity = 10)
    got shouldBe Map("a" -> 50L, "b" -> 30L, "c" -> 20L)
  }

  test("exact mode is partition-count invariant") {
    val items = (0 until 1000).map(i => s"w${i % 37}")
    sketch(items, 64, parts = 1) shouldBe sketch(items, 64, parts = 13)
  }

  test("sketch mode: the guaranteed heavy hitter survives with bounded undercount") {
    // N = 1000, capacity = 9 → any item with freq > N/10 = 100 must
    // survive, undercounted by at most 100
    val heavy = Seq.fill(400)("HH")
    val noise = (0 until 600).map(i => s"n$i") // all-distinct tail
    val got = sketch(scala.util.Random.shuffle(heavy ++ noise), capacity = 9)
    got.keySet should contain ("HH")
    got("HH") should be >= 300L
    got("HH") should be <= 400L
    got.size should be <= 9
  }

  test("merge undercount stays within the additive bound across partitions") {
    val items = Seq.fill(300)("a") ++ Seq.fill(200)("b") ++
      (0 until 500).map(i => s"n${i % 250}")
    val exact = Map("a" -> 300L, "b" -> 200L)
    val got = sketch(scala.util.Random.shuffle(items), capacity = 19, parts = 8)
    // eps = N/(cap+1) = 50 per sketch; merged error adds but stays
    // below 2*eps here
    exact.foreach { case (k, v) =>
      got.keySet should contain (k)
      got(k) should be >= (v - 100)
      got(k) should be <= v
    }
  }
}
