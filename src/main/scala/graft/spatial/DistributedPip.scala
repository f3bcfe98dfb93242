package graft.spatial

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
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
  * refine AND drop their geometry payload, so the WKB bytes ride the
  * shuffle only for border cells; points key by their level-`level` cell.
  * ONE shuffle on cell id joins them; the refine is an exact JTS
  * point-in-polygon inside a narrow mapPartitions with a per-task
  * prepared-geometry cache (each task sees few distinct zones because the
  * join co-locates by cell). Hot cells (a dense metro) split under AQE
  * skew handling; pre-salting the point side composes via
  * [[graft.ops.Skew]] if an exchange is reused.
  *
  * Same containment predicate as the broadcast path
  * (BoundaryCellIndex.foreachContaining): `full || prepared.contains(pt)`.
  */
object DistributedPip {

  /** points: (id, lat, lon); zones: (boundary_id, wkb).
    * Returns (point_id, lat, lon, boundary_id) — one row per containing
    * zone (zones may overlap/nest). */
  def containsJoin(spark: SparkSession, points: DataFrame, zones: DataFrame,
                   level: Int): DataFrame = {
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)

    val cover = zones.select(col("boundary_id"), col("wkb"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = new WKBReader()
        it.flatMap { case (id, wkb) =>
          // seam-crossing zones normalize once; the refine ships the
          // NORMALIZED bytes so both sides of the predicate agree
          val raw = reader.read(wkb)
          val geom = CellIndex.normalizeSeam(raw)
          val nwkb =
            if (geom eq raw) wkb
            else new org.locationtech.jts.io.WKBWriter().write(geom)
          val prep = PreparedGeometryFactory.prepare(geom)
          // minLevel = maxLevel = level → uniform single-level cover
          CellIndex.cover(geom, level, level).iterator.map { cell =>
            val full = prep.containsProperly(CellIndex.cellGeometry(cell))
            (cell, id, full, if (full) null else nwkb)
          }
        }
      }.toDF("cell", "boundary_id", "full", "wkb")

    val pts = points
      .withColumn("cell", graft.functions.GeoFunctions.cell_of(col("lat"), col("lon"), level))
      .select(col("cell"), col("id"), col("lat"), col("lon"))

    pts.join(cover, "cell")
      .select(col("id"), col("lat"), col("lon"), col("boundary_id"), col("full"), col("wkb"))
      .as[(Long, Double, Double, Long, Boolean, Array[Byte])]
      .mapPartitions { it =>
        val gf = new GeometryFactory()
        val cache = scala.collection.mutable.HashMap.empty[Long, PreparedGeometry]
        it.filter { case (_, lat, lon, bid, full, wkb) =>
          full || cache.getOrElseUpdate(bid,
              PreparedGeometryFactory.prepare(new WKBReader().read(wkb)))
            .contains(gf.createPoint(new Coordinate(lon, lat)))
        }.map { case (id, lat, lon, bid, _, _) => (id, lat, lon, bid) }
      }.toDF("point_id", "lat", "lon", "boundary_id")
  }
}
