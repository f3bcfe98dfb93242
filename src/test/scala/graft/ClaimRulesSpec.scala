package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.hier.{Boundary, BoundaryElem, Hierarchy, PlacePipeline}

/** Micro-fixture unit tests for the hard sequential-state reformulations
  * (SURVEY.md §7.4): deepest-boundary-wins claims (J3), street un-claim on
  * boundary crossing (J4), junction threshold (A5), display-name rules
  * (F2/F3), and closure-level hyperedge merging. */
class ClaimRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // world: root(level 2) ⊃ mid(level 6) ⊃ deep(level 10)
  private val root = Boundary("2-1-Root", 2, 1, "Root", "0-0-root")
  private val mid = Boundary("6-2-Mid", 6, 2, "Mid", "2-1-Root")
  private val deep = Boundary("10-3-Deep", 10, 3, "Deep", "6-2-Mid")
  private val metas = Hierarchy.metadata(Seq(root, mid, deep))

  private def run(elems: Seq[BoundaryElem]) =
    PlacePipeline.build(spark, elems.toDS(), metas)

  private def bldg(bkey: String, id: Long, tags: (String, String)*) =
    BoundaryElem(bkey, "way", id, Nil, tags.toMap + ("building" -> "yes"))

  test("J3: deepest containing boundary claims a building exactly once") {
    val t = run(Seq(
      bldg("2-1-Root", 100, "name" -> "Town Hall"),
      bldg("6-2-Mid", 100, "name" -> "Town Hall"),
      bldg("10-3-Deep", 100, "name" -> "Town Hall")))
    val rows = t.buildings.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("bkey") == "10-3-Deep")
    assert(rows(0).getAs[String]("bchain") == "Root>Mid>Deep>Town Hall")
  }

  test("J3: a border-straddling element goes to the DESCENDING-first sibling (reference fold order)") {
    // invert_map_list (hierarchy.ml:6-10) prepends during its ascending
    // fold, so builder.ml visits siblings largest-key-first: the element in
    // both extracts is claimed by "6-4-Aid" (> "6-2-Mid"), which is earlier
    // in the reference's post-order
    val mid2 = Boundary("6-4-Aid", 6, 4, "Aid", "2-1-Root")
    val m = Hierarchy.metadata(Seq(root, mid, mid2))
    val t = PlacePipeline.build(spark, Seq(
      bldg("6-2-Mid", 100, "name" -> "Border House"),
      bldg("6-4-Aid", 100, "name" -> "Border House")).toDS(), m)
    val rows = t.buildings.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("bkey") == "6-4-Aid")
  }

  test("F2: unnamed building uses housenumber + street; nameless otherwise errors") {
    val t = run(Seq(
      bldg("10-3-Deep", 1, "addr:street" -> "High St", "addr:housenumber" -> "12"),
      bldg("10-3-Deep", 2, "addr:street" -> "High St"), // no name, no housenumber
      bldg("10-3-Deep", 3))) // bare building: no name at all
    val names = t.buildings.collect().map(_.getAs[String]("bname")).toSet
    assert(names == Set("12 High St"))
    assert(t.errors.count() == 2)
  }

  test("F3: street display name falls back name → ref → typed id") {
    val t = run(Seq(
      BoundaryElem("10-3-Deep", "way", 10, Seq(1, 2), Map("highway" -> "residential", "name" -> "Main")),
      BoundaryElem("10-3-Deep", "way", 11, Seq(2, 3), Map("highway" -> "residential", "ref" -> "A1")),
      BoundaryElem("10-3-Deep", "way", 12, Seq(3, 4), Map("highway" -> "residential"))))
    val names = t.streets.collect().map(_.getAs[String]("street")).toSet
    assert(names == Set("Main", "A1", "way 12"))
  }

  test("J4: crossing street appears in deeper AND enclosing boundary; non-crossing sticks") {
    val crossingWay = BoundaryElem("10-3-Deep", "way", 20, Seq(100, 101), Map("highway" -> "residential", "name" -> "CrossRd"))
    val innerWay = BoundaryElem("10-3-Deep", "way", 21, Seq(200, 201), Map("highway" -> "residential", "name" -> "InnerRd"))
    val elems = Seq(
      crossingWay, innerWay,
      // node 100 is an outer-name node of Deep (bare node in its extract)
      BoundaryElem("10-3-Deep", "node", 100, Nil, Map.empty),
      // both ways also appear in Mid's (enclosing) extract
      crossingWay.copy(bkey = "6-2-Mid"), innerWay.copy(bkey = "6-2-Mid"))
    val t = run(elems)
    val streets = t.streets.collect().map(r => (r.getAs[String]("bkey"), r.getAs[String]("street"))).toSet
    assert(streets.contains(("10-3-Deep", "CrossRd")))
    assert(streets.contains(("6-2-Mid", "CrossRd")), "crossing way must be un-claimed for the parent")
    assert(streets.contains(("10-3-Deep", "InnerRd")))
    assert(!streets.contains(("6-2-Mid", "InnerRd")), "non-crossing way must stick with the deepest boundary")
  }

  test("A5: node is a junction iff ≥2 distinct street names meet or it is an outer-name node") {
    val t = run(Seq(
      // node 5 shared by two distinctly-named streets → junction on both
      BoundaryElem("10-3-Deep", "way", 30, Seq(4, 5), Map("highway" -> "residential", "name" -> "A St")),
      BoundaryElem("10-3-Deep", "way", 31, Seq(5, 6), Map("highway" -> "residential", "name" -> "B St")),
      // node 7 shared by two ways of the SAME street name → not a junction
      BoundaryElem("10-3-Deep", "way", 32, Seq(6, 7), Map("highway" -> "residential", "name" -> "C St")),
      BoundaryElem("10-3-Deep", "way", 33, Seq(7, 8), Map("highway" -> "residential", "name" -> "C St")),
      // node 9 is outer-name → junction even with one street
      BoundaryElem("10-3-Deep", "way", 34, Seq(9, 10), Map("highway" -> "residential", "name" -> "D St")),
      BoundaryElem("10-3-Deep", "node", 9, Nil, Map.empty)))
    val atoms = t.junctionAtoms.collect().map(r => (r.getAs[String]("street"), r.getAs[Long]("nd"))).toSet
    // node 6 joins B St and C St (distinct names) → junction on both;
    // node 7 joins two C St ways (same name) → not a junction
    assert(atoms == Set(("A St", 5L), ("B St", 5L), ("B St", 6L), ("C St", 6L), ("D St", 9L)))
  }

  test("hyperedges merge per (node, closure boundary); open iff outer at every ancestor") {
    // street in Deep and street in Mid share node 50; node 50 is an outer
    // name of Deep (crossing into Mid) but interior to Mid → edge closes at
    // Mid, merging both boundaries' junction atoms into one hyperedge.
    val elems = Seq(
      BoundaryElem("10-3-Deep", "way", 40, Seq(50, 51), Map("highway" -> "residential", "name" -> "DeepSt")),
      BoundaryElem("10-3-Deep", "node", 50, Nil, Map.empty),
      BoundaryElem("6-2-Mid", "way", 41, Seq(50, 52), Map("highway" -> "residential", "name" -> "MidSt1")),
      BoundaryElem("6-2-Mid", "way", 42, Seq(52, 50), Map("highway" -> "residential", "name" -> "MidSt2")))
    val t = run(elems)
    val edges = t.junctionEdges.collect()
      .map(r => (r.getAs[Long]("nd"),
                 r.getSeq[String](r.fieldIndex("port_chains")).toList,
                 Option(r.getAs[String]("outer_name"))))
    // node 50: one merged hyperedge spanning Deep's and Mid's streets
    val e50 = edges.filter(_._1 == 50L)
    assert(e50.length == 1, s"expected one merged edge for node 50, got $e50")
    assert(e50(0)._2.sorted == Seq("Root>Mid>Deep>DeepSt", "Root>Mid>MidSt1", "Root>Mid>MidSt2"))
    assert(e50(0)._3.isEmpty, "edge must be closed at Mid")
    // node 52 (MidSt1×MidSt2 interior junction) is its own closed edge
    assert(edges.count(_._1 == 52L) == 1)
  }

  test("open edge survives when node is outer at every level to the root") {
    val elems = Seq(
      BoundaryElem("10-3-Deep", "way", 60, Seq(70, 71), Map("highway" -> "residential", "name" -> "EdgeSt")),
      BoundaryElem("10-3-Deep", "node", 70, Nil, Map.empty),
      BoundaryElem("6-2-Mid", "node", 70, Nil, Map.empty),
      BoundaryElem("2-1-Root", "node", 70, Nil, Map.empty))
    val t = run(elems)
    val edges = t.junctionEdges.collect()
    assert(edges.length == 1)
    assert(edges(0).getAs[String]("outer_name") == "node 70")
  }
}
