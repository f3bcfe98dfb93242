package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump `explain("formatted")` for SparkEntry queries to one file per query:
  * `runMain graft.tools.PlanDump <outDir> [suffix] [q…]` (default: all
  * queries, suffix "after") — the plans/r06 evidence artifacts. Iterative
  * operators (q36/q38/q44) return a materialized frame whose plan is the
  * final cached scan; for those the per-round plan story lives in the
  * operator source and OPTIMIZATION notes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r06"
    val suffix = if (args.length > 1) args(1) else "after"
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), txt)
        println(s"[plandump] wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
