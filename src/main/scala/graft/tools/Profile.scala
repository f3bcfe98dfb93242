package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Bench, SparkEntry}
import graft.synth.SynthWorld
import graft.web.{Flagship, Geocode}
import graft.spatial.{BoundaryCellIndex, PointCellIndex}

/** Ad-hoc profiling harness for the flagship stages. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val pages = if (args.length > 1) args(1).toLong else 4000000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Bench.benchCfg(pages)

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val fast = args.length > 2 && args(2) == "fast"
    if (!fast) time("boundary index build (driver)") {
      BoundaryCellIndex.build(Flagship.boundaries(cfg), Flagship.CoverLevel)
    }
    if (!fast) {
      time("building index build (driver)") {
        PointCellIndex.build(SynthWorld.buildings(cfg).map(b => (b.id, b.lat, b.lon)), Flagship.SnapLevel)
      }
      time("generate only") {
        SynthWorld.pages(spark, cfg).toDF().agg(count(col("url"))).collect()
      }
      time("generate+geoparse") {
        Geocode.geoparse(SynthWorld.pages(spark, cfg).toDF())
          .agg(count(col("lat"))).collect()
      }
      time("full geocode") { Bench.consume(Flagship.geocode(spark, cfg)) }
      time("full geocode (2nd)") { Bench.consume(Flagship.geocode(spark, cfg)) }
    }
    time("warmup small") { Bench.consume(Flagship.geocode(spark, Bench.benchCfg(20000L))) }
    var dir: String = null
    time("materialize pages parquet") { dir = Flagship.materializePages(spark, cfg) }
    for (i <- 1 to 6) time(s"geocode from parquet #$i") {
      Bench.consume(Flagship.geocodePages(spark, spark.read.parquet(dir), cfg))
    }
    spark.stop()
  }
}
