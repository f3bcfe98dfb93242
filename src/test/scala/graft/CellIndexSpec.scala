package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cells.CellIndex
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

/** Property-style tests over a seeded RNG (scalatestplus bridge not in the
  * offline cache, so we drive scalacheck-style cases by hand). */
class CellIndexSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)
  private def cases = (1 to 500).map { _ =>
    (rng.nextDouble() * 179.8 - 89.9, rng.nextDouble() * 359.8 - 179.9,
     1 + rng.nextInt(CellIndex.MaxLevel))
  }

  test("cellOf round-trips through bounds") {
    for ((lat, lon, l) <- cases) {
      val c = CellIndex.cellOf(lat, lon, l)
      assert(CellIndex.level(c) == l)
      val (x0, y0, x1, y1) = CellIndex.bounds(c)
      assert(lon >= x0 && lon <= x1, s"lon $lon not in [$x0,$x1]")
      assert(lat >= y0 && lat <= y1, s"lat $lat not in [$y0,$y1]")
    }
  }

  test("parent contains child; rangeMin/rangeMax bracket descendants") {
    for ((lat, lon, l0) <- cases) {
      val l = math.max(2, l0)
      val c = CellIndex.cellOf(lat, lon, l)
      val p = CellIndex.parent(c)
      assert(CellIndex.contains(p, c))
      assert(CellIndex.cellOf(lat, lon, l - 1) == p)
      val leaf = CellIndex.cellOf(lat, lon, CellIndex.MaxLevel)
      assert(leaf >= CellIndex.rangeMin(c) && leaf <= CellIndex.rangeMax(c))
    }
  }

  test("ij round-trip and children/parent inverse") {
    for ((lat, lon, l) <- cases) {
      val c = CellIndex.cellOf(lat, lon, l)
      val (i, j) = CellIndex.toIJ(c)
      assert(CellIndex.fromIJ(i, j, l) == c)
      if (l < CellIndex.MaxLevel)
        assert(CellIndex.children(c).forall(ch => CellIndex.parent(ch) == c))
    }
  }

  test("ring sizes and disjointness") {
    val c = CellIndex.cellOf(51.5, -0.1, 10)
    assert(CellIndex.ring(c, 0).toSeq == Seq(c))
    assert(CellIndex.ring(c, 1).length == 8)
    assert(CellIndex.ring(c, 2).length == 16)
    val d = CellIndex.disk(c, 2)
    assert(d.length == 25 && d.distinct.length == 25)
  }

  test("ring wraps antimeridian and clips poles") {
    val nearAm = CellIndex.cellOf(0.0, 179.9, 8)
    assert(CellIndex.ring(nearAm, 1).length == 8) // wrapped, none dropped
    val topRow = CellIndex.fromIJ(0, (1L << 8) - 1, 8)
    assert(CellIndex.ring(topRow, 1).length == 5) // top row clipped at pole
  }

  test("cover of a polygon is a disjoint superset of its points") {
    val gf = new GeometryFactory()
    val poly = gf.createPolygon(Array(
      new Coordinate(-0.5, 51.2), new Coordinate(0.8, 51.2),
      new Coordinate(0.8, 51.9), new Coordinate(-0.5, 51.9),
      new Coordinate(-0.5, 51.2)))
    val cover = CellIndex.cover(poly, 12)
    assert(cover.nonEmpty)
    for (a <- cover; b <- cover if a != b) assert(!CellIndex.contains(a, b))
    for (lat <- BigDecimal(51.25) to BigDecimal(51.85) by 0.1;
         lon <- BigDecimal(-0.45) to BigDecimal(0.75) by 0.1) {
      val leaf = CellIndex.cellOf(lat.toDouble, lon.toDouble, 12)
      assert(cover.exists(c => CellIndex.contains(c, leaf)),
        s"point ($lat,$lon) not covered")
    }
    assert(cover.exists(c => CellIndex.level(c) < 12)) // compacted interior
  }

  test("rangeMinAt/rangeMaxAt: exact fixed-level interval ⟺ ancestry") {
    for (_ <- 1 to 300) {
      val la = rng.nextInt(10)
      val l = la + 1 + rng.nextInt(CellIndex.MaxLevel - la - 1)
      val anc = CellIndex.cellOf(rng.nextDouble() * 179 - 89.5,
        rng.nextDouble() * 359 - 179.5, la)
      // random level-l descendant: descend via random children
      var d = anc
      while (CellIndex.level(d) < l)
        d = CellIndex.children(d)(rng.nextInt(4))
      val (lo, hi) = (CellIndex.rangeMinAt(anc, l), CellIndex.rangeMaxAt(anc, l))
      assert(d >= lo && d <= hi, s"descendant $d outside [$lo,$hi]")
      // any level-l cell inside the interval IS a descendant; any outside
      // is not — sample uniformly over the level instead of trusting one side
      val probe = CellIndex.cellOf(rng.nextDouble() * 179 - 89.5,
        rng.nextDouble() * 359 - 179.5, l)
      assert((probe >= lo && probe <= hi) ==
        (CellIndex.parentAt(probe, la) == anc),
        s"interval/ancestry disagree for probe $probe under $anc")
      // degenerate: the interval at the cell's own level is the cell itself
      assert(CellIndex.rangeMinAt(anc, la) == anc && CellIndex.rangeMaxAt(anc, la) == anc)
    }
  }

  test("haversine sanity") {
    val d = CellIndex.haversineM(51.5007, -0.1246, 48.8584, 2.2945) // London→Paris
    assert(d > 330000 && d < 350000)
    assert(CellIndex.haversineM(0, 0, 0, 0) == 0.0)
  }
}
