package graft

import org.apache.spark.sql.SparkSession
import graft.hier.PlacePipeline

/** CLI mirroring the reference binary's build+stats surface
  * (bin/botw.ml:171-203): `runMain graft.BotwCli <level> <relId> <name>
  * [dataDir]` builds the place hierarchy from per-boundary OSM extracts and
  * prints the S8 stats block (hierarchy.ml:236-286). */
object BotwCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BotwCli <level> <relId> <name> [dataDir]")
    val (level, relId, name) = (args(0).toInt, args(1).toLong, args(2))
    val dataDir = if (args.length > 3) args(3) else "/root/reference/data"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("botw")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (metas, tables) = PlacePipeline.fromOsmDir(spark, dataDir, level, relId, name)
    val s = PlacePipeline.stats(tables)
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"Number of nodes: ${s.nNodes}")
    println(s"Number of edges: ${s.nEdges}")
    println(s"Number of outer names:${s.nOpenNames}")
    println(s"Number of boundaries: ${s.nBoundaries}")
    println(s"Number of streets: ${s.nStreets}")
    println(s"Number of buildings: ${s.nBuildings}")
    println(s"Number of junctions: ${s.nJunctions}")
    println(f"[botw] built ${metas.size} boundary extracts in $dt%.2f s")
    spark.stop()
  }
}
