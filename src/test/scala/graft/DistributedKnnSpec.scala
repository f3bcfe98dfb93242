package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.spatial.{DistributedKnn, PointCellIndex}
import graft.synth.SynthWorld

class DistributedKnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("distributed ring-join nearest matches the broadcast index exactly") {
    val cfg = SynthWorld.Config(seed = 7L, gridP = 2, gridC = 2,
      streetsPerCity = 4, buildingsPerStreet = 5, pages = 0L)
    val targets = SynthWorld.buildings(cfg).map(b => (b.id, b.lat, b.lon))
    // query points: jittered around buildings + a few far-away points
    val rng = new scala.util.Random(99)
    val near = targets.take(60).zipWithIndex.map { case ((_, la, lo), i) =>
      (i.toLong, la + rng.nextDouble() * 0.02 - 0.01, lo + rng.nextDouble() * 0.02 - 0.01)
    }
    val far = Seq((1000L, 47.9, 7.9), (1001L, 40.1, 0.1))
    val points = (near ++ far).toDF("id", "lat", "lon")
    val targetsDf = targets.toDF("tid", "tlat", "tlon")

    val level = 12
    val got = DistributedKnn.nearest(spark, points, targetsDf, level, maxRing = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val idx = PointCellIndex.build(targets, level)
    for ((id, la, lo) <- near ++ far) {
      val want = idx.nearest(la, lo, maxRing = 64).get
      assert(got.contains(id), s"point $id unresolved")
      assert(got(id)._1 == want._1, s"point $id: got ${got(id)}, want $want")
      assert(math.abs(got(id)._2 - want._2) < 1e-9)
    }
  }

  test("distributed top-k matches the broadcast index rank-for-rank (k=3)") {
    val cfg = SynthWorld.Config(seed = 7L, gridP = 2, gridC = 2,
      streetsPerCity = 4, buildingsPerStreet = 5, pages = 0L)
    val targets = SynthWorld.buildings(cfg).map(b => (b.id, b.lat, b.lon))
    val rng = new scala.util.Random(43)
    val near = targets.take(40).zipWithIndex.map { case ((_, la, lo), i) =>
      (i.toLong, la + rng.nextDouble() * 0.02 - 0.01, lo + rng.nextDouble() * 0.02 - 0.01)
    }
    val far = Seq((1000L, 47.9, 7.9), (1001L, 40.1, 0.1))
    val points = (near ++ far).toDF("id", "lat", "lon")
    val targetsDf = targets.toDF("tid", "tlat", "tlon")

    val level = 12
    val got = DistributedKnn.knn(spark, points, targetsDf, level, k = 3, maxRing = 64)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    val idx = PointCellIndex.build(targets, level)
    for ((id, la, lo) <- near ++ far) {
      val want = idx.knn(la, lo, k = 3, maxRing = 64)
      assert(want.size == 3)
      for ((w, r) <- want.zipWithIndex) {
        val g = got((id, r + 1))
        assert(g._1 == w._1, s"point $id rank ${r + 1}: got $g, want $w")
        assert(math.abs(g._2 - w._2) < 1e-9)
      }
    }
    assert(got.size == (near.size + far.size) * 3)
  }

  test("coarse-level top-k dedups wrap-duplicate targets (antimeridian rings)") {
    // level 5 → 32 grid columns, maxRing 64: a seam-adjacent target cell
    // sits at ring r AND ring 32-r of the same point, in different
    // geometric batches — without pool dedup the same neighbor would rank
    // twice and displace the true 3rd
    val points = Seq((1L, 0.0, 179.0)).toDF("id", "lat", "lon")
    val targets = Seq((1L, 0.0, -179.0), (2L, 0.0, 170.0), (3L, 5.0, 179.0), (4L, 0.0, 0.0))
    val got = DistributedKnn.knn(spark, points,
        targets.toDF("tid", "tlat", "tlon"), level = 5, k = 3, maxRing = 64)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    val brute = targets
      .map(t => (t._1, graft.cells.CellIndex.haversineM(0.0, 179.0, t._2, t._3)))
      .sortBy(x => (x._2, x._1)).take(3).map(_._1)
    assert(got.map(_._2).distinct.length == 3, s"duplicate neighbor in $got")
    assert(got.map(_._2).toSeq == brute, s"got $got, want ranks of $brute")
  }

  test("top-k with fewer targets than k returns what exists, correctly ranked") {
    val points = Seq((1L, 44.0, 4.0)).toDF("id", "lat", "lon")
    val targets = Seq((9L, 44.01, 4.0), (5L, 44.02, 4.0)).toDF("tid", "tlat", "tlon")
    val got = DistributedKnn.knn(spark, points, targets, level = 12, k = 5, maxRing = 64)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == Seq((1, 9L), (2, 5L)))
  }

  test("sparse world: >=16 empty rings before the hit completes without plan blowup") {
    // one target ~1 degree away at level 12 (0.0439-degree cell rows) — the
    // loop walks ~23 empty rings before the first hit; with per-round
    // checkpoints of BOTH frames the plan stays flat and the run finishes
    val points = (0L until 8L).map(i => (i, 44.0 + i * 0.001, 4.0)).toDF("id", "lat", "lon")
    val targets = Seq((7L, 45.0, 4.0)).toDF("tid", "tlat", "tlon")
    val t0 = System.nanoTime()
    val got = DistributedKnn.nearest(spark, points, targets, level = 12, maxRing = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.size == 8 && got.values.forall(_ == 7L))
    assert(secs < 120.0, f"sparse ring walk took $secs%.1f s — plan blowup")
  }

  test("nearest pins only its result; unpersist returns the session to baseline") {
    val points = (0L until 50L).map(i =>
      (i, 44.0 + (i % 10) * 0.001, 4.0 + (i / 10) * 0.001)).toDF("id", "lat", "lon")
    val targets = Seq((1L, 44.005, 4.002), (2L, 44.5, 4.5)).toDF("tid", "tlat", "tlon")
    val baseline = spark.sparkContext.getPersistentRDDs.size
    val r1 = DistributedKnn.nearest(spark, points, targets, level = 12)
    val r2 = DistributedKnn.nearest(spark, points, targets, level = 12)
    assert(spark.sparkContext.getPersistentRDDs.size == baseline + 2,
      "targetsByCell / per-round best / unresolved must all be freed")
    r1.unpersist(true)
    r2.unpersist(true)
    assert(spark.sparkContext.getPersistentRDDs.size == baseline)
  }

  test("points with no target within maxRing are dropped, not mis-assigned") {
    val points = Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon")
    val targets = Seq((9L, 45.0, 90.0)).toDF("tid", "tlat", "tlon")
    val got = DistributedKnn.nearest(spark, points, targets, level = 12, maxRing = 2)
    assert(got.count() == 0)
  }
}
