// Dump .explain("formatted") for a set of queries into
// plans/r18/<query>_<tag>.txt — the optimization round's before/after
// evidence files. Usage:
//   PLANS_QUERIES=q_text_bm25,q_graph_pagerank PLANS_TAG=before \
//     spark-shell --jars target/scala-2.13/*.jar -I tools/plans_r18.scala
// PLANS_SF overrides the data dir (default sf0.1 — the bench rung).
import java.io.PrintWriter
val sf = sys.env.getOrElse("PLANS_SF", "/root/testdata/sf0.1")
val tag = sys.env.getOrElse("PLANS_TAG", "before")
val qs = (sys.env.getOrElse("PLANS_QUERIES", "").split(",")
  .map(_.trim).filter(_.nonEmpty))
require(qs.nonEmpty, "set PLANS_QUERIES")
new java.io.File("/root/repo/plans/r18").mkdirs()
spark.conf.set("spark.sql.session.timeZone", "UTC")
val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnlyQueries
for (n <- qs) {
  val df = all(n)(spark, sf)
  val out = new PrintWriter(s"/root/repo/plans/r18/${n}_$tag.txt")
  out.println(df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode))
  out.close()
  println(s"WROTE plans/r18/${n}_$tag.txt")
}
sys.exit(0)
