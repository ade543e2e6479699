package graft.tools
import graft.ops.{Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object ProfV6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    (1 to 2).foreach { rep =>
      println(s"-- rep $rep"); spark.catalog.clearCache()
      val ix = Dedup.shingleFpRows(docs, "doc_id", "text", 3).persist(StorageLevel.MEMORY_AND_DISK)
      t("index") { ix.count() }
      val pairs = Dedup.ngramJaccardPairsFromIndex(ix, 0.8).select(col("id_a"), col("id_b")).persist(StorageLevel.MEMORY_AND_DISK)
      t("pairs") { pairs.count(); ix.unpersist() }
      val st = Curation.pipelineV6Stages(docs)
      t("full v6 rest incl rebuild") { st.summary.collect() }
      st.release()
    }
    spark.stop()
  }
}
