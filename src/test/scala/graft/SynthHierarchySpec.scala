package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.hier.{Hierarchy, PlacePipeline}
import graft.synth.SynthWorld

/** PlacePipeline on the synthetic per-boundary extracts, checked against
  * closed-form counts (the known-true containment oracle of the generated
  * world — FIXTURES.md §3). */
class SynthHierarchySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("synthetic extracts build to closed-form entity counts") {
    val cfg = SynthWorld.Config(seed = 5L, gridP = 2, gridC = 2,
      streetsPerCity = 3, buildingsPerStreet = 2)
    val (bounds, elems) = SynthWorld.boundaryExtracts(spark, cfg)
    val metas = Hierarchy.metadata(bounds)
    val t = PlacePipeline.build(spark, elems, metas)
    val st = PlacePipeline.stats(t)

    val p = cfg.gridP * cfg.gridP        // provinces
    val c = p * cfg.gridC * cfg.gridC    // cities
    val s = cfg.streetsPerCity
    val b = cfg.buildingsPerStreet
    assert(st.nBoundaries == 1 + p + c)
    // city: 2s streets; crossing ways H0,V0 reappear in province AND country
    assert(st.nStreets == c * 2 * s + c * 2 + c * 2, s"streets: $st")
    assert(st.nBuildings == c * s * b)
    // city: 2 atoms per intersection (s²); province/country: 2 each via the
    // unclaimed crossing ways at the shared border node
    assert(st.nJunctions == c * 2 * s * s + c * 2 + c * 2, s"junctions: $st")
    // one open hyperedge per city (border node outer at every level)
    assert(st.nOpenNames == c, s"open: $st")
    assert(st.nNodes == 2 * (st.nBoundaries + st.nStreets + st.nBuildings) + st.nJunctions)

    assert(t.errors.count() == 0)
    // every building claimed exactly once (deepest boundary)
    import org.apache.spark.sql.functions._
    val multi = t.buildings.groupBy("bname").count().filter(col("count") > 1).count()
    assert(multi == 0)
  }
}
