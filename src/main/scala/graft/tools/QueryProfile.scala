package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Job/stage-level profile of SparkEntry queries:
  * `runMain graft.tools.QueryProfile <sfDir> <q…>` — each query runs twice
  * (JIT warm), the second run's jobs/stages dump with wall, task time, GC.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timer = new HierProfile.JobTimer
    spark.sparkContext.addSparkListener(timer)
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      def run(): (Double, Double, Double) = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      run()
      Thread.sleep(200) // drain listener bus
      timer.reset()
      val (tBuild, tPlan, tExec) = run()
      Thread.sleep(500)
      println(f"[qprof] $n: build $tBuild%.2f + plan $tPlan%.2f + exec $tExec%.2f s")
      timer.dump(n)
    }
    spark.stop()
  }
}
