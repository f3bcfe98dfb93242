package graft.spatial

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cells.CellIndex

/** Raster↔vector operators over the cell grid (north rule: "H3/S2 index,
  * point-in-polygon, kNN, raster↔vector").
  *
  * A raster here is a Dataset of occupied grid cells with a value column —
  * the natural distributed representation at planet scale (dense arrays
  * don't shard; (cell, v) rows partition, prune and join like any fact
  * table).
  */
object Raster {

  /** Vector→raster: aggregate points into (cell, v = point count) at
    * `level`. One shuffle (the groupBy); the cell id is the codegen'd
    * z-order expression, not a UDF. */
  def rasterize(spark: SparkSession, points: DataFrame, level: Int): DataFrame = {
    graft.functions.GeoFunctions.register(spark)
    points
      .withColumn("cell",
        graft.functions.GeoFunctions.cell_of(col("lat"), col("lon"), level))
      .groupBy("cell").agg(count(lit(1)).as("v"))
  }

  /** Raster→vector zonal statistics: per zone polygon, the count and sum of
    * raster cells whose CENTROID falls inside it (the standard raster
    * convention; zones may overlap — a cell contributes to every zone
    * containing it). Zones are a broadcast BoundaryCellIndex: cover-cell
    * prejoin + exact PIP refine per centroid, so the raster fact side
    * streams through one narrow pass + one groupBy. */
  def zonalStats(spark: SparkSession, raster: DataFrame,
                 zones: Seq[SpatialBoundary], coverLevel: Int): DataFrame = {
    import spark.implicits._
    val idx = spark.sparkContext.broadcast(BoundaryCellIndex.build(zones, coverLevel))
    raster.select(col("cell"), col("v")).as[(Long, Long)]
      .mapPartitions { it =>
        val ix = idx.value
        it.flatMap { case (cell, v) =>
          val (clat, clon) = CellIndex.centroid(cell)
          ix.containing(clat, clon).iterator.map(z => (z.id, v))
        }
      }
      .toDF("boundary_id", "v")
      .groupBy("boundary_id")
      .agg(count(lit(1)).as("n_cells"), sum(col("v")).as("sum_v"))
  }

  /** Fact×fact zonal statistics: same semantics as [[zonalStats]] but with
    * zones as a TABLE (boundary_id, wkb) routed through
    * [[DistributedPip.containsJoin]]'s cover machinery — the path for zone
    * sets beyond executor memory (per-tenant fences at 10⁸ zones), where
    * the broadcast index cannot be built. The raster value rides the PIP
    * join as a payload column, so the whole operator is the one cover-join
    * shuffle plus the final groupBy — no second shuffle to re-attach `v`. */
  def zonalStatsDistributed(spark: SparkSession, raster: DataFrame, zones: DataFrame,
                            coverLevel: Int): DataFrame = {
    // centroid via the registered codegen expressions — no per-row UDF serde
    // on the fact side of the PIP join
    graft.functions.GeoFunctions.register(spark)
    val pts = raster.select(col("cell").as("id"), col("v"))
      .withColumn("lat", graft.functions.GeoFunctions.cell_centroid_lat(col("id")))
      .withColumn("lon", graft.functions.GeoFunctions.cell_centroid_lon(col("id")))
      .select(col("id"), col("lat"), col("lon"), col("v"))
    DistributedPip.containsJoin(spark, pts, zones, coverLevel)
      .groupBy("boundary_id")
      .agg(count(lit(1)).as("n_cells"), sum(col("v")).as("sum_v"))
  }

  /** Raster→vector component labeling: 4-neighbor connected components of
    * the occupied cells, as iterative min-label propagation (the same
    * checkpointed-loop pattern as R1/R3 — no sequential state, each round
    * one shuffle on the linear key; rounds = component diameter).
    *
    * Input: (i LONG, j LONG) occupied grid coordinates at one level.
    * Output: (i, j, comp) where comp = min linear key (i*gridN + j)
    * reachable in the component. */
  def connectedComponents(spark: SparkSession, cells: DataFrame,
                          gridN: Long, maxIters: Int = 64): DataFrame = {
    import spark.implicits._
    val ids = cells.select(col("i"), col("j"), (col("i") * gridN + col("j")).as("key"))
      .distinct().cache()
    // empty raster: return the empty (i, j, comp) frame rather than NPE on
    // the null fixpoint aggregate below
    if (ids.isEmpty) {
      ids.unpersist()
      return cells.sparkSession.emptyDataFrame
        .select(lit(0L).as("i"), lit(0L).as("j"), lit(0L).as("comp"))
    }
    // undirected 4-adjacency as directed key pairs: emit each cell's four
    // neighbor COORDINATES, equi-join against the occupied set
    val probes = ids.select(col("key").as("src"),
        explode(array(
          struct((col("i") + 1).as("i"), col("j").as("j")),
          struct((col("i") - 1).as("i"), col("j").as("j")),
          struct(col("i").as("i"), (col("j") + 1).as("j")),
          struct(col("i").as("i"), (col("j") - 1).as("j")))).as("n"))
      .select(col("src"), col("n.i").as("i"), col("n.j").as("j"))
    val edges = probes.join(ids.select(col("i"), col("j"), col("key").as("dst")), Seq("i", "j"))
      .select(col("src"), col("dst"))
      .cache()

    var labels = ids.select(col("key"), col("key").as("comp"))
    var converged = false
    var iter = 0
    // convergence via DECIMAL(38,0) sum: keys are i*gridN+j, so at fine
    // grids (gridN ≈ 2³¹) a Long sum of ~10⁹ labels overflows — under ANSI
    // mode that is a job-killing exception, and without ANSI a wrapped sum
    // could silently alias two different label states. 38 digits cannot
    // overflow (n·maxKey ≤ 10¹⁰·2⁶³ < 10³⁰).
    var prevSum: java.math.BigDecimal = null
    while (!converged && iter < maxIters) {
      // (1) push the label across edges, (2) pointer-halve: follow the
      // label one hop (comp := min(comp, comp(comp)) — comp is itself a
      // cell key, so the self-join always hits). Halving turns the round
      // count from O(component diameter) into O(log diameter).
      val pushed = edges.join(labels, col("src") === col("key"))
        .select(col("dst").as("key"), col("comp"))
      val merged = labels.unionByName(pushed)
        .groupBy("key").agg(min(col("comp")).as("comp"))
      val halved = merged.as("a")
        .join(merged.select(col("key").as("ck"), col("comp").as("ccomp")).as("b"),
          col("a.comp") === col("b.ck"))
        .select(col("a.key").as("key"), least(col("a.comp"), col("b.ccomp")).as("comp"))
      // NOT localCheckpoint: its LogicalRDD retains constraints that break
      // the next round's unionByName on Spark 4.1 (key-not-found in
      // rewriteConstraints); createDataFrame truncates lineage cleanly
      val next = spark.createDataFrame(halved.rdd, halved.schema).cache()
      // min-label sums are monotone non-increasing; a fixed sum ⇒ fixpoint
      val s = next.agg(sum(col("comp").cast("decimal(38,0)"))).collect()(0).getDecimal(0)
      if (prevSum != null && s.compareTo(prevSum) == 0) converged = true
      prevSum = s
      // the previous round's cache is dead once `next` is materialized (the
      // agg above populated it) — free it instead of pinning one DataFrame
      // per round for the session lifetime
      if (iter > 0) labels.unpersist(false)
      labels = next
      iter += 1
    }
    // materialize the output, then release every intermediate cache: the
    // returned frame is the ONLY pinned artifact of this call (callers may
    // unpersist it when consumed — asserted by RasterSpec's hygiene test)
    val joined = ids.join(labels, "key").select(col("i"), col("j"), col("comp"))
    val out = spark.createDataFrame(joined.rdd, joined.schema).cache()
    out.count()
    ids.unpersist(false)
    edges.unpersist(false)
    labels.unpersist(false)
    out
  }
}
