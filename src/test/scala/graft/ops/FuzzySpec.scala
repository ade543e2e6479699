package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PassJoin edit-distance join: blocked candidates + bounded verify
  * must equal the brute-force levenshtein join exactly — the blocking
  * is lossless by the pigeonhole argument, so any divergence is a bug.
  */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(docs: org.apache.spark.sql.DataFrame, e: Int) =
    docs.select(col("doc_id").as("id_a"), col("text").as("ta"))
      .crossJoin(docs.select(col("doc_id").as("id_b"), col("text").as("tb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
      .filter(col("dist") <= e)
      .select("id_a", "id_b", "dist")

  private def pairs(df: org.apache.spark.sql.DataFrame, e: Int) =
    Fuzzy.editDistancePairs(df, "doc_id", "text", e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("finds planted edits at their exact distances and nothing below threshold") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),  // subst x3 = 3
      (3L, "the quick brown fox jumps over the lazy dog"),  // exact = 0
      (4L, "the quick brown fox jumped over the lazy dog"), // s->e + d = 2
      (5L, "a completely different sentence with other words entirely"))
      .toDF("doc_id", "text")
    val got = pairs(docs, 3)
    got should contain((1L, 3L, 0L))
    got should contain((1L, 4L, 2L))
    got should contain((3L, 4L, 2L))
    got should contain((1L, 2L, 3L))
    got.map(p => (p._1, p._2)) should not contain ((1L, 5L))
    // full agreement with brute force
    got shouldBe bruteForce(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("equals brute force on a randomized corpus (edits at every distance)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    def randStr(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(4))).mkString
    // base strings + mutated variants (subst/insert/delete) so true
    // pairs exist at distances 0..4 across different lengths
    val bases = (0 until 12).map(_ => randStr(12 + rnd.nextInt(20)))
    val docs = bases.zipWithIndex.flatMap { case (b, i) =>
      val mut = new StringBuilder(b)
      val nEdits = rnd.nextInt(5)
      (0 until nEdits).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 if mut.nonEmpty => mut.setCharAt(rnd.nextInt(mut.length), alphabet(rnd.nextInt(4)))
          case 1 => mut.insert(rnd.nextInt(mut.length + 1), alphabet(rnd.nextInt(4)))
          case _ if mut.nonEmpty => mut.deleteCharAt(rnd.nextInt(mut.length))
          case _ =>
        }
      }
      Seq((i * 2L, b), (i * 2L + 1L, mut.toString))
    }.toDF("doc_id", "text")
    (0 to 4).foreach { e =>
      val expect = bruteForce(docs, e).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      pairs(docs, e) shouldBe expect
    }
  }

  test("short strings (under maxDist+1 chars) route through the bounded residue") {
    val docs = Seq(
      (1L, ""), (2L, "a"), (3L, "ab"), (4L, "abc"),
      (5L, "abcdefgh"), (6L, "abcdefghx"))
      .toDF("doc_id", "text")
    val e = 3
    val expect = bruteForce(docs, e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    pairs(docs, e) shouldBe expect
    // the residue must include short-vs-short and short-vs-midlength pairs
    expect.map(p => (p._1, p._2)) should contain((1L, 2L))
    expect.map(p => (p._1, p._2)) should contain((2L, 4L))
  }

  test("a planted flood of duplicate short strings keeps a bounded (distinct-text) build side") {
    // 300 copies each of three sub-(e+1)-char strings: the residue's
    // broadcast must carry the 4 DISTINCT texts, not the 900+ rows —
    // a row-built broadcast would OOM on a billion-cell corpus where
    // this content-bounded one stays tiny
    val flood = ((1L to 300L).map(i => (i, "a")) ++
      (301L to 600L).map(i => (i, "b")) ++
      (601L to 900L).map(i => (i, "ab")) ++
      Seq((901L, "abcdefgh"))).toDF("doc_id", "text")
    val e = 2
    val out = Fuzzy.editDistancePairs(flood, "doc_id", "text", e)
    // plan: the broadcast build side sits on a distinct-aggregate of
    // the short texts
    val p = out.queryExecution.executedPlan.toString
    p should include ("BroadcastExchange")
    p should include ("HashAggregate(keys=[ts")
    // spot-parity (full brute force on 900 rows is 400k pairs — check
    // structure instead): every cross-text pairing within distance
    // exists, and a same-text group pairs all-with-all at dist 0
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.count { case (a, b, d) => a <= 300 && b <= 300 && d == 0 } shouldBe
      (300 * 299) / 2
    // "a" vs "b" at dist 1, "a" vs "ab" at dist 1, "ab" vs "abcdefgh" beyond e
    got.count { case (a, b, d) => a <= 300 && b > 300 && b <= 600 && d == 1 } shouldBe
      300 * 300
    got.exists { case (_, b, _) => b == 901L } shouldBe false
  }

  test("maxDist=0 degenerates to exact duplicate pairs") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    pairs(docs, 0) shouldBe Set((1L, 2L, 0L))
  }

  test("editDistanceJoin equals brute-force cross levenshtein in both length directions") {
    val canon = Seq(
      (1L, "acme corporation limited"),
      (2L, "zenith systems incorporated"),
      (3L, "ab"))
      .toDF("rid", "rname")
    val noisy = Seq(
      (10L, "acme corporatio limited"),    // 1 deletion vs 1
      (11L, "acme corporation limited x"), // 2 insertions vs 1
      (12L, "zenith systems incorporated"),// exact vs 2
      (13L, "completely unrelated entry"),
      (14L, "abc"))                        // short residue vs 3
      .toDF("nid", "nname")
    val got = Fuzzy.editDistanceJoin(noisy, canon,
        "nid", "nname", "rid", "rname", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = noisy.select(col("nid"), col("nname"))
      .crossJoin(canon.select(col("rid"), col("rname")))
      .withColumn("dist", levenshtein(col("nname"), col("rname")).cast("long"))
      .filter(col("dist") <= 2)
      .select("nid", "rid", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe expect
    got should contain((10L, 1L, 1L))
    got should contain((11L, 1L, 2L))
    got should contain((12L, 2L, 0L))
    got should contain((14L, 3L, 1L))
    got.map(_._1) should not contain 13L
    // no intra-table pairs can appear by construction (output schema is
    // left x right only) — and randomized check across length skews
    val rnd = new scala.util.Random(11)
    def randDocs(n: Int, off: Long) = (0 until n).map { i =>
      (off + i, (0 until 6 + rnd.nextInt(12)).map(_ => "abcd"(rnd.nextInt(4))).mkString)
    }
    val l = randDocs(25, 0L).toDF("nid", "nname")
    val r = randDocs(25, 100L).toDF("rid", "rname")
    val got2 = Fuzzy.editDistanceJoin(l, r, "nid", "nname", "rid", "rname", maxDist = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val exp2 = l.crossJoin(r)
      .withColumn("dist", levenshtein(col("nname"), col("rname")).cast("long"))
      .filter(col("dist") <= 3)
      .select("nid", "rid", "dist")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    got2 shouldBe exp2
  }

  test("plan: no corpus-scale cartesian product; candidate join keys on the hash") {
    val docs = (0L until 50L).map(i => (i, s"document body number $i with shared structure"))
      .toDF("doc_id", "text")
    val p = Fuzzy.editDistancePairs(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    // text never rides a candidate-join exchange (only ids + 8-byte
    // hashes shuffle; verify re-attaches text by id)
    p.linesIterator.filter(_.contains("Exchange")).foreach { line =>
      line should not include ", t#"
    }
  }
}
