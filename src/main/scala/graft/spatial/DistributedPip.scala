package graft.spatial

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.WKBReader
import graft.cells.CellIndex

/** Distributed point-in-polygon containment join — the fact×fact path for
  * J7 when the zone side is NOT broadcastable (the broadcast
  * [[BoundaryCellIndex]] covers the planet-admin case at ~10⁷ cover cells;
  * this path covers zone sets beyond executor memory: per-tenant fences,
  * building footprints, generated isochrones).
  *
  * Shape: zones flatMap their UNIFORM level-`level` cell cover into a
  * (cell, zone) table — `full` cells (strictly inside) skip the exact
  * refine AND drop their geometry payload; border cells ship the zone
  * geometry CLIPPED to the cell's (slightly expanded) envelope, so the
  * bytes-per-cell riding the shuffle are O(local boundary complexity), not
  * O(whole-zone vertices) — a coastline zone with 10⁵ border cells no
  * longer replicates its full ring 10⁵×. Points key by their
  * level-`level` cell; ONE shuffle on cell id joins them; the refine is an
  * exact JTS point-in-polygon with a BOUNDED per-task LRU of prepared
  * clipped geometries (each task sees few distinct (cell, zone) pairs
  * because the join co-locates by cell; the LRU caps executor memory when
  * an AQE skew split still co-locates many border zones). Hot cells (a
  * dense metro) split under AQE skew handling; pre-salting the point side
  * composes via [[graft.ops.Skew]] if an exchange is reused.
  *
  * Clip-exactness: the clip envelope is the cell expanded by 10⁻⁶ of its
  * width, so every point assigned to the cell (including points exactly on
  * the cell edge, which floor-assignment puts in one cell) is INTERIOR to
  * the clip window — for such points, p ∈ interior(zone) ⟺
  * p ∈ interior(zone ∩ window). Lower-dimensional residue of the
  * intersection (a zone edge lying exactly on the window edge) is dropped:
  * points there are on the zone boundary, which `contains` excludes in the
  * unclipped predicate too (same rule as the round-3 normalizeSeam fix).
  *
  * Same containment predicate as the broadcast path
  * (BoundaryCellIndex.foreachContaining): `full || prepared.contains(pt)`.
  */
object DistributedPip {

  /** Extra columns of `points` beyond (id, lat, lon) ride through the join
    * untouched — [[Raster.zonalStatsDistributed]] threads the raster value
    * this way instead of paying a second shuffle to re-join it. */
  val ReservedCols: Set[String] = Set("cell", "boundary_id", "pip_full", "pip_wkb",
    "point_id")

  /** points: (id, lat, lon, payload...); zones: (boundary_id, wkb).
    * Returns (point_id, lat, lon, payload..., boundary_id) — one row per
    * containing zone (zones may overlap/nest).
    *
    * NULL-COORDINATE POLICY: rows with a null lat or lon are DROPPED, by
    * the explicit filter below (they can be contained by no zone). Without
    * it the drop would still happen — but silently, at two different
    * operators (null cell key fails the cover equi-join; the refine UDF's
    * primitive params make Spark skip the call and null the predicate) —
    * so the policy is stated here as contract rather than left emergent. */
  def containsJoin(spark: SparkSession, points: DataFrame, zones: DataFrame,
                   level: Int): DataFrame = {
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)
    require(points.columns.forall(c => !ReservedCols.contains(c)),
      s"point columns collide with reserved names: ${ReservedCols.mkString(",")}")
    require(Seq("id", "lat", "lon").forall(points.columns.contains),
      s"points must carry (id, lat, lon); got ${points.columns.mkString(",")}")

    val cover = zones.select(col("boundary_id"), col("wkb"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = new WKBReader()
        val writer = new org.locationtech.jts.io.WKBWriter()
        it.flatMap { case (id, wkb) =>
          // seam-crossing zones normalize once; the refine ships CLIPPED
          // normalized bytes so both sides of the predicate agree
          val geom = CellIndex.normalizeSeam(reader.read(wkb))
          val prep = PreparedGeometryFactory.prepare(geom)
          // invalid rings (bowtie fences, self-touching footprints): the
          // overlay clip could produce a DIFFERENT valid interpretation
          // than the prepared-predicate refine on the raw bytes — ship the
          // unclipped geometry for those zones so the distributed refine
          // stays byte-identical to the broadcast path (checked once per
          // zone, not per cell)
          val clipOk = geom.isValid
          // unclipped fallback bytes serialized ONCE per zone, not per
          // border cell (an invalid 10⁵-vertex zone would otherwise pay
          // 10⁵ full WKB serializations of the same geometry)
          lazy val rawBytes = writer.write(geom)
          // minLevel = maxLevel = level → uniform single-level cover
          CellIndex.cover(geom, level, level).iterator.map { cell =>
            val cg = CellIndex.cellGeometry(cell)
            val full = prep.containsProperly(cg)
            val payload =
              if (full) null
              else if (clipOk) writer.write(clipToCell(geom, cell))
              else rawBytes
            (cell, id, full, payload)
          }
        }
      }.toDF("cell", "boundary_id", "pip_full", "pip_wkb")

    val ptCols = points.columns
    val pts = points
      .filter(col("lat").isNotNull && col("lon").isNotNull) // see policy above
      .withColumn("cell", graft.functions.GeoFunctions.cell_of(col("lat"), col("lon"), level))

    // id resolved BY NAME (the round-3 contract) — positional head-column
    // selection would silently mislabel ids for callers whose id is not
    // the first column
    val outCols: Seq[Column] =
      col("id").as("point_id") +: ptCols.filterNot(_ == "id").map(col).toSeq :+
        col("boundary_id")
    pts.join(cover, "cell")
      .filter(pipRefine(col("cell"), col("boundary_id"), col("pip_full"),
        col("pip_wkb"), col("lat"), col("lon")))
      .select(outCols: _*)
  }

  /** Zone geometry ∩ the cell's expanded envelope, polygonal components
    * only (see clip-exactness note in the object doc). Falls back to the
    * unclipped geometry if the overlay leaves nothing 2-D (cannot happen
    * for a border cell of a valid polygon, but robustness beats an empty
    * refine geometry silently dropping points). */
  private[graft] def clipToCell(geom: Geometry, cell: Long): Geometry = {
    val (lonMin, latMin, lonMax, latMax) = CellIndex.bounds(cell)
    val eps = (lonMax - lonMin) * 1e-6
    val gf = geom.getFactory
    val window = gf.toGeometry(new org.locationtech.jts.geom.Envelope(
      lonMin - eps, lonMax + eps, latMin - eps, latMax + eps))
    // overlay ops throw TopologyException on invalid rings (bowtie fences,
    // self-touching footprints — routine in real zone data); prepared-
    // geometry PREDICATES tolerate them, so fall back to the unclipped
    // bytes rather than failing the job (round-3 behavior for that zone)
    val clipped =
      try geom.intersection(window)
      catch { case _: org.locationtech.jts.geom.TopologyException => return geom }
    val polys = org.locationtech.jts.geom.util.PolygonExtracter.getPolygons(clipped)
    if (polys.isEmpty) geom
    else if (polys.size == 1) polys.get(0).asInstanceOf[Geometry]
    else gf.buildGeometry(polys)
  }

  /** The exact-refine predicate as a deterministic UDF so arbitrary payload
    * columns survive the join without a typed encoder. The prepared-
    * geometry cache is the shared bounded [[GeomLru]] keyed by
    * (cell, zone) — the clipped bytes differ per cell. */
  private[spatial] val CacheCap = 512

  private[spatial] def preparedLoader: Array[Byte] => PreparedGeometry =
    wkb => PreparedGeometryFactory.prepare(new WKBReader().read(wkb))

  private class RefineHelper extends Serializable {
    @transient private lazy val gf = new GeometryFactory()
    private val cache = new GeomLru[PreparedGeometry](CacheCap, preparedLoader)
    def contains(cell: Long, bid: Long, wkb: Array[Byte], lat: Double, lon: Double): Boolean =
      cache.get((cell, bid), wkb).contains(gf.createPoint(new Coordinate(lon, lat)))
  }

  private def pipRefine(cell: Column, bid: Column, full: Column,
                        wkb: Column, lat: Column, lon: Column): Column = {
    val helper = new RefineHelper
    val f = udf { (cell: Long, bid: Long, full: Boolean, wkb: Array[Byte],
                   lat: Double, lon: Double) =>
      full || helper.contains(cell, bid, wkb, lat, lon)
    }
    f(cell, bid, full, wkb, lat, lon)
  }
}
