package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusLayoutWriterSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs = (0L until 3000L).map { i =>
    val lang = if (i % 10 < 7) "en" else if (i % 10 < 9) "de" else "fr"
    (i, lang, (i * 2654435761L % 1000L).toDouble / 1000.0)
  }.toDF("doc_id", "lang", "quality")

  test("partition dirs + range-clustered files; scans prune on both") {
    val path = java.nio.file.Files.createTempDirectory("layout").toString + "/corpus"
    CorpusLayoutWriter.write(mkDocs, path,
      partitionCols = Seq("lang"), orderCol = "quality",
      maxRecordsPerFile = 300L)
    val root = new java.io.File(path)
    root.listFiles().map(_.getName).filter(_.startsWith("lang=")).toSet shouldBe
      Set("lang=en", "lang=de", "lang=fr")

    // nothing lost, nothing duplicated
    val back = spark.read.parquet(path)
    back.count() shouldBe 3000L
    back.select(sum(col("doc_id"))).head().getLong(0) shouldBe (0L until 3000L).sum

    // directory pruning: the lang predicate lands in PartitionFilters,
    // and the file scan only touches the matching directory
    val scan = back.filter(col("lang") === "en" && col("quality") >= 0.9)
    val formatted = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted should include("PartitionFilters")
    formatted.linesIterator.find(_.contains("PartitionFilters")).get should
      include("lang")
    // row-group skipping: the quality predicate is pushed to parquet
    formatted.linesIterator.find(_.contains("PushedFilters")).get should
      include("quality")

    // range clustering: the hot partition (en, 2100 rows) splits into
    // multiple bounded files whose [min,max] quality bands don't overlap
    // beyond boundaries — that's what makes min/max stats selective
    val enFiles = new java.io.File(s"$path/lang=en").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    enFiles.length should be > 1
    val bands = enFiles.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("quality")), max(col("quality"))).head()
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    bands.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => lo2 should be >= hi
      case _ =>
    }
  }

  test("hot partition values spread across range tasks, not one writer") {
    // repartition(partitionCols) would funnel all of lang=en into one
    // task; repartitionByRange on (lang, quality) must use several
    // explicit task count (AQE coalesces a 3000-row test shuffle to one
    // partition; at real scale its advisory sizing keeps many)
    val docs = mkDocs
    val parts = docs.repartitionByRange(4, col("lang"), col("quality"))
      .withColumn("pid", spark_partition_id())
      .filter(col("lang") === "en")
      .select("pid").distinct().count()
    parts should be > 1L
  }
}
