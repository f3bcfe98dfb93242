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
  *   bucketed by cell → per-point running top-k pool; a point finalizes
  *   once its k-th best distance is within the unscanned-ring lower bound
  *   (the next ring can still hold a closer target — same guarantee as the
  *   broadcast PointCellIndex.knn).
  *
  * Each round is one shuffle on cell id; resolved points leave the loop, so
  * round cost decays geometrically in dense regions. Hot cells are handled
  * by the bucketing itself (a target cell's rows spread across its join
  * partitions via AQE skew splitting).
  */
object DistributedKnn {

  /** points: (id, lat, lon); targets: (tid, tlat, tlon).
    * Returns (id, rank, nearest_tid, nearest_dist_m) — up to `k` rows per
    * point ranked by (distance asc, tid asc). Points see fewer than k rows
    * only when fewer than k targets exist within maxRing rings; points
    * with no target there are dropped.
    *
    * Rings are scanned in GEOMETRIC BATCHES ([0], [1], [2,4), [4,8), …):
    * each round is a full shuffle barrier, so O(log maxRing) rounds beats
    * one round per ring — at worst 2× the cells probed, and only for the
    * few points still unresolved in late rounds.
    *
    * Termination is exact: a point finalizes once it holds k candidates
    * AND its k-th best distance is within the geometric lower bound of all
    * unscanned rings (firstUnscannedRing × minCellExtentM at the point's
    * latitude — anisotropy-safe, same rule as the broadcast
    * PointCellIndex); after the last batch every point with any candidate
    * finalizes. k=1 reduces to the round-3 `nearest` contract exactly. */
  def knn(spark: SparkSession, points: DataFrame, targets: DataFrame,
          level: Int, k: Int = 1, maxRing: Int = 64): DataFrame =
    poolLoop(spark, points, targets, level, k, maxRing) match {
      case None =>
        points.limit(0).select(col("id"),
          lit(0).as("rank"),
          lit(null).cast("long").as("nearest_tid"),
          lit(null).cast("double").as("nearest_dist_m"))
      case Some(best) =>
        val wBest = Window.partitionBy(col("id")).orderBy(col("d").asc, col("tid").asc)
        // the returned frame is the ONLY cache this call leaves behind;
        // callers may unpersist it once consumed (DistributedKnnSpec
        // asserts the persistent-RDD count returns to baseline after that)
        val out = materialize(spark, best
          .withColumn("rank", row_number().over(wBest))
          .select(col("id"), col("rank"), col("tid").as("nearest_tid"),
            col("d").as("nearest_dist_m")))
        best.unpersist(false)
        out
    }

  /** k = 1 snap: (id, nearest_tid, nearest_dist_m) — the q36/flagship
    * contract, unchanged from round 3. */
  def nearest(spark: SparkSession, points: DataFrame, targets: DataFrame,
              level: Int, maxRing: Int = 64): DataFrame =
    poolLoop(spark, points, targets, level, k = 1, maxRing = maxRing) match {
      case None =>
        points.limit(0).select(col("id"),
          lit(null).cast("long").as("nearest_tid"),
          lit(null).cast("double").as("nearest_dist_m"))
      case Some(best) => // k = 1 pool: already exactly one row per id
        val out = materialize(spark, best.select(col("id"),
          col("tid").as("nearest_tid"), col("d").as("nearest_dist_m")))
        best.unpersist(false)
        out
    }

  /** Eager plan-truncated materialization (NOT localCheckpoint: its blocks
    * cannot be freed without killing the lineage, and its LogicalRDD keeps
    * constraints that break later unions on Spark 4.1). createDataFrame
    * truncates the PLAN (flat analysis per round) while the RDD lineage
    * stays recomputable — so freed intermediates are a cache decision, not
    * a correctness one. */
  private def materialize(spark: SparkSession, df: DataFrame): DataFrame = {
    val out = spark.createDataFrame(df.rdd, df.schema).cache()
    out.count()
    out
  }

  /** The ring-batch expansion loop shared by [[knn]]/[[nearest]]: returns
    * the materialized CACHED pool (id, lat, lon, tid, d) with ≤ k rows per
    * point — the caller owns (and must unpersist) it — or None when no
    * point found any target within maxRing. */
  private def poolLoop(spark: SparkSession, points: DataFrame, targets: DataFrame,
                       level: Int, k: Int, maxRing: Int): Option[DataFrame] = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the refine/key computations are the registered CODEGEN expressions
    // (GeoFunctions) — no per-row UDF serde on the biggest join of q36/q44;
    // only ringBatch stays a UDF (genuinely array-generating)
    graft.functions.GeoFunctions.register(spark)
    import graft.functions.GeoFunctions.{haversine_m, min_cell_extent_m, cell_of}
    val ringBatch = udf { (lat: Double, lon: Double, lo: Int, hi: Int) =>
      val center = CellIndex.cellOf(lat, lon, level)
      (lo until hi).flatMap(r => CellIndex.ring(center, r)).distinct.toArray
    }
    val targetsByCell = targets
      .withColumn("cell", cell_of(col("tlat"), col("tlon"), level))
      .cache()

    val wBest = Window.partitionBy(col("id"))
      .orderBy(col("d").asc_nulls_last, col("tid").asc_nulls_last)
    val wId = Window.partitionBy(col("id"))
    var unresolved = lazyMaterialize(spark, points.select("id", "lat", "lon"))
    var unresolvedCount = unresolved.count()
    // each round's cached top-k frame; finalized rows are sliced out of
    // these at the end (ONE union), so no per-round best-carry or anti
    // joins exist — every round is exactly one window exchange + one job
    val roundFrames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val finalizedParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var prevKept: DataFrame = null // unfinalized points' pools (≤ k rows per id)
    var lo = 0
    while (lo <= maxRing && unresolvedCount > 0) {
      // batch [lo, hi): rings 0 and 1 share the FIRST batch — the hi = 1
      // finalize bound below is 0 m (vacuous), so a lone ring-0 round was
      // one full shuffle barrier that could finalize nothing; merging it
      // probes the same 9 cells in one round instead of two
      val hi = math.min(if (lo == 0) 2 else lo * 2, maxRing + 1) // [lo, hi)
      val cands = unresolved
        .withColumn("cell",
          explode(ringBatch(col("lat"), col("lon"), lit(lo), lit(hi))))
        .join(targetsByCell, "cell")
        .withColumn("d", haversine_m(col("lat"), col("lon"), col("tlat"), col("tlon")))
        .select(col("id"), col("lat"), col("lon"), col("tid"), col("d"))
      // one SENTINEL row (null tid/d) per unresolved point keeps
      // candidate-less points inside the window output, so the next
      // round's unresolved set falls out of the same pass (the round-5
      // shape re-derived it with an anti join per round); sentinels sort
      // last (nulls_last) and are dropped from every kept slice
      val sentinel = unresolved.select(col("id"), col("lat"), col("lon"),
        lit(null).cast("long").as("tid"), lit(null).cast("double").as("d"))
      val pool0 = (if (prevKept == null) cands else prevKept.unionByName(cands))
        .unionByName(sentinel)
      // longitude wrap can place ONE target cell at two Chebyshev ring
      // distances r and 2^level - r; ringBatch dedups within a batch, but
      // across batches the same (id, tid) row would enter the pool twice —
      // k=1 collapsed duplicates under rn=1, top-k would rank one target
      // at two ranks and displace the true k-th. Possible only when the
      // scanned disk can span the grid (2·maxRing ≥ columns), so fine
      // levels skip the extra exchange entirely.
      val pool =
        if ((1L << level) <= 2L * maxRing) pool0.dropDuplicates("id", "tid")
        else pool0
      // per-point running top-k; kth = the worst retained distance, cnt =
      // retained REAL pool size (count(tid) skips sentinels). `fin` marks
      // finalized points: rings 0..hi-1 are scanned, so the first
      // unscanned ring is hi and any target there is ≥ (hi-1) × minExtent
      // away (the point may sit on its own cell's edge); finalize once the
      // pool is full (cnt = k) AND its worst member beats that bound;
      // after the last batch finalize everything.
      val roundBest = pool
        .withColumn("rn", row_number().over(wBest)).filter(col("rn") <= k)
        .withColumn("cnt", count(col("tid")).over(wId))
        .withColumn("kth", max(col("d")).over(wId))
        .withColumn("fin",
          if (hi > maxRing) lit(true)
          else col("cnt") === k &&
            col("kth") <= lit(hi - 1) * min_cell_extent_m(col("lat"), level))
        .cache()
      finalizedParts += roundBest
        .filter(col("fin") && col("tid").isNotNull)
        .select(col("id"), col("lat"), col("lon"), col("tid"), col("d"))
      prevKept = roundBest
        .filter(!col("fin") && col("tid").isNotNull)
        .select(col("id"), col("lat"), col("lon"), col("tid"), col("d"))
      // the rn = 1 row exists for EVERY unresolved point (sentinel floor),
      // so next round's unresolved set needs no join at all
      val newUnresolved = lazyMaterialize(spark,
        roundBest.filter(!col("fin") && col("rn") === 1)
          .select(col("id"), col("lat"), col("lon")))
      // ONE action per round: materializes roundBest (via its cache) and
      // newUnresolved, and returns the count that drives the loop
      unresolvedCount = newUnresolved.groupBy().count().collect()(0).getLong(0)
      unresolved.unpersist(false)
      roundFrames += roundBest
      unresolved = newUnresolved
      lo = hi
    }
    targetsByCell.unpersist(false)
    unresolved.unpersist(false)
    if (finalizedParts.isEmpty) None
    else {
      // one union of the per-round finalized slices → the caller's cached
      // pool; the per-round caches die here (they kept the slices cheap)
      val best = materialize(spark, finalizedParts.reduce(_ unionByName _))
      roundFrames.foreach(_.unpersist(false))
      Some(best)
    }
  }

  /** [[materialize]] without the eager count — the caller's next action
    * populates the cache; the plan is truncated the same way. */
  private def lazyMaterialize(spark: SparkSession, df: DataFrame): DataFrame =
    spark.createDataFrame(df.rdd, df.schema).cache()
}
