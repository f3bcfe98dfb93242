package graft.spatial

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.cells.CellIndex

/** Distributed nearest-neighbor snap — the 100 TB path for J9 when the
  * target side is NOT broadcastable (fact×fact, e.g. pages × planet
  * buildings). Cell-ring expansion as iterative shuffle joins:
  *
  *   round r: unresolved points explode their ring-r cells ⋈ targets
  *   bucketed by cell → per-point running best; a point finalizes one round
  *   after its first hit (the next ring can still hold a closer target —
  *   same guarantee as the broadcast PointCellIndex.nearest).
  *
  * Each round is one shuffle on cell id; resolved points leave the loop, so
  * round cost decays geometrically in dense regions. Hot cells are handled
  * by the bucketing itself (a target cell's rows spread across its join
  * partitions via AQE skew splitting).
  */
object DistributedKnn {

  /** points: (id, lat, lon); targets: (tid, tlat, tlon).
    * Returns (id, nearest_tid, nearest_dist_m). Points with no target
    * within maxRing rings are dropped.
    *
    * Rings are scanned in GEOMETRIC BATCHES ([0], [1], [2,4), [4,8), …):
    * each round is a full shuffle barrier, so O(log maxRing) rounds beats
    * one round per ring — at worst 2× the cells probed, and only for the
    * few points still unresolved in late rounds.
    *
    * Termination is exact: a point finalizes once its best distance is
    * within the geometric lower bound of all unscanned rings
    * (firstUnscannedRing × minCellExtentM at the point's latitude —
    * anisotropy-safe, same rule as the broadcast PointCellIndex). */
  def nearest(spark: SparkSession, points: DataFrame, targets: DataFrame,
              level: Int, maxRing: Int = 64): DataFrame = {
    val ringBatch = udf { (lat: Double, lon: Double, lo: Int, hi: Int) =>
      val center = CellIndex.cellOf(lat, lon, level)
      (lo until hi).flatMap(r => CellIndex.ring(center, r)).distinct.toArray
    }
    val dist = udf { (lat: Double, lon: Double, tlat: Double, tlon: Double) =>
      CellIndex.haversineM(lat, lon, tlat, tlon)
    }
    val targetsByCell = targets
      .withColumn("cell", udf((la: Double, lo: Double) => CellIndex.cellOf(la, lo, level))
        .apply(col("tlat"), col("tlon")))
      .cache()

    // eager plan-truncated materialization (NOT localCheckpoint: its blocks
    // cannot be freed without killing the lineage, and its LogicalRDD keeps
    // constraints that break later unions on Spark 4.1). createDataFrame
    // truncates the PLAN (flat analysis per round) while the RDD lineage
    // stays recomputable — so freed intermediates are a cache decision, not
    // a correctness one.
    def materialize(df: DataFrame): DataFrame = {
      val out = spark.createDataFrame(df.rdd, df.schema).cache()
      out.count()
      out
    }

    val wBest = Window.partitionBy(col("id")).orderBy(col("d").asc, col("tid").asc)
    var unresolved = materialize(points.select("id", "lat", "lon"))
    var best: DataFrame = null // (id, lat, lon, tid, d, hit_ring)
    var lo = 0
    while (lo <= maxRing && !unresolved.isEmpty) {
      val hi = math.min(if (lo < 2) lo + 1 else lo * 2, maxRing + 1) // [lo, hi)
      val cands = unresolved
        .withColumn("cell",
          explode(ringBatch(col("lat"), col("lon"), lit(lo), lit(hi))))
        .join(targetsByCell, "cell")
        .withColumn("d", dist(col("lat"), col("lon"), col("tlat"), col("tlon")))
        .select(col("id"), col("lat"), col("lon"), col("tid"), col("d"), lit(lo).as("hit_ring"))
      val pool = if (best == null) cands
        else best.join(unresolved.select("id"), Seq("id"), "left_semi").unionByName(cands)
      val minExtent = udf { (lat: Double) => CellIndex.minCellExtentM(lat, level) }
      val roundBest = materialize(pool
        .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1).drop("rn"))
      // rings 0..hi-1 are scanned, so the first unscanned ring is hi and
      // any target there is ≥ (hi-1) × minExtent away (the point may sit on
      // its own cell's edge); finalize when the best distance is within
      // that bound; after the last batch finalize everything with a
      // candidate
      val finalized =
        if (hi > maxRing) roundBest
        else roundBest.filter(col("d") <= lit(hi - 1) * minExtent(col("lat")))
      // `best` is materialized per round too: it accumulates a union per
      // round, and sparse worlds (many empty rings) would otherwise blow up
      // analysis time
      val newBest = materialize(if (best == null) roundBest
        else best.join(unresolved.select("id"), Seq("id"), "left_anti").unionByName(roundBest))
      val newUnresolved = materialize(
        unresolved.join(finalized.select("id"), Seq("id"), "left_anti"))
      // the previous round's state and this round's scratch are dead now —
      // free them (round-2 leak: these accumulated for the session lifetime)
      if (best != null) best.unpersist(false)
      unresolved.unpersist(false)
      roundBest.unpersist(false)
      best = newBest
      unresolved = newUnresolved
      lo = hi
    }
    targetsByCell.unpersist(false)
    if (best == null) {
      unresolved.unpersist(false)
      points.limit(0).select(col("id"),
        lit(null).cast("long").as("nearest_tid"),
        lit(null).cast("double").as("nearest_dist_m"))
    } else {
      // the returned frame is the ONLY cache this call leaves behind;
      // callers may unpersist it once consumed (DistributedKnnSpec asserts
      // the persistent-RDD count returns to baseline after that)
      val out = materialize(best.select(col("id"), col("tid").as("nearest_tid"),
        col("d").as("nearest_dist_m")))
      best.unpersist(false)
      unresolved.unpersist(false)
      out
    }
  }
}
