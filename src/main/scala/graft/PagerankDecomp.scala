package graft
// THROWAWAY measurement main (r18): pagerank superstep cadence A/B.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PagerankDecomp {
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
    val suppOffset = 10000000L
    def edges = {
      val li = Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_suppkey")
      val ord = Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey")
      val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + suppOffset).as("supp"))
      pairs.select(explode(array(
        struct(col("cust").as("src"), col("supp").as("dst")),
        struct(col("supp").as("src"), col("cust").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }
    def tm(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[pgdecomp] $name%-24s ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
    }
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      Seq(1, 5).foreach { ce =>
        tm(s"pagerank ckptEvery=$ce") {
          graft.operators.Graph.pagerank(edges, "src", "dst",
            iterations = 5, checkpointEvery = ce).count()
        }
      }
    }
    spark.stop()
  }
}
