package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions
import graft.ops.Skew
import graft.plans.CollapseCellParentOfCellOf
import graft.synth.SynthWorld
import graft.web.{Flagship, Lineage}

class SkewExtensionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; GeoFunctions.register(s); s }
  import spark.implicits._

  test("salted two-phase agg equals the direct aggregation on a skewed key") {
    // 90% of rows share one hot key
    val df = spark.range(20000)
      .withColumn("key", when(col("id") % 10 < 9, lit("hot")).otherwise(concat(lit("k"), col("id") % 7)))
      .withColumn("v", col("id") % 1000)
    val direct = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .withColumnRenamed("key", "k")
    val salted = Skew.saltedAgg(df, col("key"), col("v"), salts = 32, spreadOn = col("id"))
    assert(salted.withColumnRenamed("key", "k").exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted.withColumnRenamed("key", "k")).count() == 0)
    // phase-one parallelism: (hot, salt) groups actually spread
    val phase1 = df.withColumn("_salt", Skew.saltCol(32, col("id")))
      .filter(col("key") === "hot").select("_salt").distinct().count()
    assert(phase1 == 32)
  }

  test("optimizer rule collapses cell_parent(cell_of(...)) into one cell_of") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CollapseCellParentOfCellOf
    try {
      val df = spark.range(100)
        .withColumn("lat", col("id").cast("double") % 80)
        .withColumn("lon", col("id").cast("double") % 170)
        .withColumn("bucket",
          GeoFunctions.cell_parent(GeoFunctions.cell_of(col("lat"), col("lon"), 14), 3))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cell_parent"), optimized)
      assert(optimized.contains("cell_of"), optimized)
      // semantics preserved
      for (r <- df.collect())
        assert(r.getAs[Long]("bucket") ==
          graft.cells.CellIndex.cellOf(r.getAs[Double]("lat"), r.getAs[Double]("lon"), 3))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == CollapseCellParentOfCellOf)
    }
  }

  test("snapshot time travel reads exactly the buckets a snapshot committed") {
    val cfg = SynthWorld.Config(seed = 42L, gridP = 2, gridC = 2,
      streetsPerCity = 3, buildingsPerStreet = 4, pages = 1500L)
    val outDir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val df = Flagship.geocode(spark, cfg).cache()
    val buckets = df.select("bucket").distinct().collect().map(_.getLong(0)).sorted
    val half = buckets.take(buckets.length / 2)
    Lineage.run(spark, df.filter(col("bucket").isin(half: _*)), outDir, "snap-a")
    Lineage.run(spark, df, outDir, "snap-b")
    assert(Lineage.snapshots(outDir) == Seq("snap-a", "snap-b"))
    val asOfA = Lineage.readSnapshot(spark, outDir, "snap-a")
    assert(asOfA.select("bucket").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == half.toSeq)
    val asOfB = Lineage.readSnapshot(spark, outDir, "snap-b")
    assert(asOfB.count() == df.count())
    // incremental read = exactly the buckets snap-b added over snap-a
    val inc = Lineage.readIncrement(spark, outDir, "snap-a", "snap-b")
    val incBuckets = inc.select("bucket").distinct().collect().map(_.getLong(0)).sorted
    assert(incBuckets.toSeq == buckets.drop(buckets.length / 2).toSeq)
    assert(inc.count() + asOfA.count() == df.count())
  }
}
