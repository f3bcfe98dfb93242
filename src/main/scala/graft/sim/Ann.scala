package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding
  * FLOAT[64], label) — approximate nearest neighbor for a training-data
  * pipeline.
  *
  *  - [[bruteTopK]]: exact cosine top-k — query side streams against a
  *    broadcast matrix of the index side (correct baseline; the broadcast
  *    side is the bounded "index" corpus, the streaming side scales)
  *  - [[lshTopK]]: random-hyperplane LSH buckets as the scale path —
  *    candidates share a hyperplane signature in at least one band, then
  *    exact re-rank; one shuffle
  */
object Ann {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Deterministic pseudo-random unit-ish hyperplane component. */
  @inline private def planeComponent(plane: Int, dim: Int): Double = {
    val h = graft.synth.SynthWorld.mix(plane.toLong * 1315423911L + dim)
    if ((h & 1L) == 0L) 1.0 else -1.0 // Rademacher planes: exact, fast
  }

  /** Exact cosine top-k for every vector against the whole corpus
    * (excluding self). Output (vec_id, rank, neighbor_id, cos_sim). */
  def bruteTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val rows = emb(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val corpus = rows.collect() // bounded index side
    val norms = corpus.map { case (_, v) =>
      math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    }
    val bc = spark.sparkContext.broadcast((corpus, norms))
    rows.mapPartitions { it =>
      val (cs, ns) = bc.value
      it.flatMap { case (qid, qv) =>
        val qn = math.sqrt(qv.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
        val top = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2)))
        var i = 0
        while (i < cs.length) {
          val (cid, cv) = cs(i)
          if (cid != qid) {
            var dot = 0.0
            var d = 0
            while (d < qv.length) { dot += qv(d).toDouble * cv(d).toDouble; d += 1 }
            val cos = dot / (qn * ns(i))
            if (top.size < k) top.enqueue((cos, cid))
            else if (cos > top.head._1 || (cos == top.head._1 && cid < top.head._2)) {
              top.dequeue(); top.enqueue((cos, cid))
            }
          }
          i += 1
        }
        top.toSeq.sortBy(t => (-t._1, t._2)).zipWithIndex.map {
          case ((cos, cid), r) => (qid, r + 1, cid, cos)
        }
      }
    }.toDF("vec_id", "rank", "neighbor_id", "cos_sim")
  }

  /** Random-hyperplane signatures: `planes` sign bits, split into `bands`;
    * vectors sharing any band bucket are candidates, exact-cosine re-ranked
    * to top-k. Scales as one shuffle on (band, bucket). */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 3,
              planes: Int = 16, bands: Int = 4): DataFrame = {
    import spark.implicits._
    val rows = emb(spark, dir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val perBand = planes / bands
    val signed = rows.map { case (id, v) =>
      val bits = (0 until planes).map { p =>
        var s = 0.0
        var d = 0
        while (d < v.length) { s += planeComponent(p, d) * v(d); d += 1 }
        if (s >= 0) 1L else 0L
      }
      val buckets = (0 until bands).map { b =>
        (0 until perBand).foldLeft(0L)((acc, i) => (acc << 1) | bits(b * perBand + i))
      }.toArray
      (id, v, buckets)
    }.toDF("vec_id", "embedding", "buckets")

    val banded = signed.select(col("vec_id"), col("embedding"),
      posexplode(col("buckets"))).toDF("vec_id", "embedding", "band", "bucket")
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.embedding").as("qv"),
        col("b.vec_id").as("neighbor_id"), col("b.embedding").as("cv"))
      .distinct()
    val cos = cands.withColumn("cos_sim",
      aggregate(zip_with(col("qv"), col("cv"),
          (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x) /
        (sqrt(aggregate(col("qv"), lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))) *
         sqrt(aggregate(col("cv"), lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cos.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id", "cos_sim")
  }
}
