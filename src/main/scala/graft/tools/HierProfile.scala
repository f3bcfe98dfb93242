package graft.tools

import org.apache.spark.sql.SparkSession
import graft.hier.{Hierarchy, PlacePipeline}
import graft.synth.SynthWorld

/** Stage-by-stage timing of the hierarchy build. */
object HierProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = SynthWorld.Config(seed = 42L, gridP = 8, gridC = 4,
      streetsPerCity = 10, buildingsPerStreet = 8)
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hier] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    var bounds: Seq[graft.hier.Boundary] = null
    var elems: org.apache.spark.sql.Dataset[graft.hier.BoundaryElem] = null
    time("generate extracts (driver)") {
      val be = SynthWorld.boundaryExtracts(spark, cfg); bounds = be._1; elems = be._2; bounds.size
    }
    val metas = Hierarchy.metadata(bounds)
    val cached = elems.repartition(64).cache()
    time("materialize input")(cached.count())
    val t = PlacePipeline.build(spark, cached, metas)
    time("boundaries")(t.boundaries.count())
    time("buildings (claims window)")(t.buildings.count())
    time("streets (incl. crossing/inclusion windows)")(t.streets.count())
    time("junction atoms")(t.junctionAtoms.count())
    time("junction edges (closure)")(t.junctionEdges.count())
    time("full stats (cached)")(PlacePipeline.stats(t))
    // fresh end-to-end: what Bench actually times
    time("cold build+stats")(PlacePipeline.stats(PlacePipeline.build(spark, cached, metas)))
    time("warm build+stats")(PlacePipeline.stats(PlacePipeline.build(spark, cached, metas)))
    spark.stop()
  }
}
