package graft
// THROWAWAY measurement main (r18): decompose q_text_bm25_deleted.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextAnalysis => TA}

object ProbeDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[decomp] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val prefix = "graft_bm25_takedown"
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      Retrieval.indexTableNames(prefix).foreach(t =>
        graft.sources.BucketedTables.dropTableAndDir(spark, t))
      tm("create") {
        Retrieval.createPostingsIndexTable(
          docs, "doc_id", TA.tokens(col("text")), prefix, buckets = 8)
      }
      tm("delete") {
        Retrieval.deleteFromPostingsIndexTable(
          spark, docs.filter(col("doc_id") % 7 === 0).select("doc_id"),
          "doc_id", prefix, buckets = 8, batchId = Some(0L))
      }
      val ix = tm("load")(Retrieval.loadPostingsIndex(spark, prefix))
      val bounds = Retrieval.loadPruneBounds(spark, prefix)
      val qs = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      val qsig = tm("qsig-build") {
        qs.select(col("query_id").as("query"),
          array_sort(array_distinct(slice(TA.tokens(col("text")), 1, 3)))
            .as("__sig"))
      }
      val split = tm("essentialSplit+ckpt") {
        Retrieval.essentialSplit(ix,
          qsig.select(col("query"), col("__sig")), 10, 1.2, 0.75, 1000,
          Some(bounds)).localCheckpoint(true)
      }
      tm("isEmpty-noness")(split.filter(!col("__ess")).isEmpty)
      if (rep == 1) {
        val splitLazy = Retrieval.essentialSplit(ix,
          qsig.select(col("query"), col("__sig")), 10, 1.2, 0.75, 1000,
          Some(bounds))
        java.nio.file.Files.write(
          java.nio.file.Paths.get("/tmp/split_plan.txt"),
          splitLazy.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            .getBytes("UTF-8"))
      }
      tm("full-probe") {
        Retrieval.bm25TopKPrunedWith(ix, qs, "query_id",
          slice(TA.tokens(col("text")), 1, 3), k = 10,
          maxDfPermille = 1000, bounds = Some(bounds)).count()
      }
    }
    spark.stop()
  }
}
