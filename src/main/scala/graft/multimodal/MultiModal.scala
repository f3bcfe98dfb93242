package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` + typed metadata, with the
  * Spark-side plumbing (schema, batch iteration, partitioning) real and the
  * codec itself STUBBED — image/audio libraries are not in this container.
  * The Scala analogue of a `mapInPandas` batch UDF is `mapPartitions` over
  * a typed Dataset: one decoder instance per partition, rows streamed
  * through in batch.
  *
  * Operators: decode→feature-extract (with per-kind frame sampling),
  * resize (block-average downsample — real array math over the byte grid),
  * and embedding-cosine near-dup over the extracted features.
  */
object MultiModal {

  case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           feature: Array[Float], frames_sampled: Int)

  /** STUB decode: a real deployment plugs an image/audio codec here; the
    * sandbox has none, so features are a deterministic function of the
    * bytes (content-hash folded into a fixed-width vector). The signature,
    * batching and schema are the production shape. */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      out(math.floorMod(h, dim).toInt) += ((h >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Resize kernel: block-average downsample of a (w × h) byte grid to
    * (tw × th). The array math is real (what a production resize does after
    * decode); only the pixel source is the stub byte grid. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    require(tw > 0 && th > 0 && tw <= w && th <= h, s"bad resize $w x $h -> $tw x $th")
    val out = new Array[Byte](tw * th)
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw; val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        val y0 = ty * h / th; val y1 = math.max(y0 + 1, (ty + 1) * h / th)
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val idx = y * w + x
            if (idx < bytes.length) { sum += bytes(idx) & 0xff; n += 1 }
            x += 1
          }
          y += 1
        }
        out(ty * tw + tx) = (if (n == 0) 0 else sum / n).toByte
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Deterministic synthetic media table — binary payloads with metadata
    * over three kinds (image / audio / video). */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val h = graft.synth.SynthWorld.mix(seed ^ i)
      val kind = math.floorMod(h, 3L) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + (math.floorMod(h >>> 8, 192L)).toInt
      val bytes = Array.tabulate(len)(j => (graft.synth.SynthWorld.mix(h + j) & 0xff).toByte)
      MediaRow(i, kind, bytes,
        width = if (kind != "audio") 640 else 0,
        height = if (kind != "audio") 480 else 0,
        sample_rate = if (kind == "audio") 16000 else 0)
    }
  }

  /** Batch feature extraction: one pass per partition, decoder state built
    * once per task (the mapInPandas shape). Video is FRAME-SAMPLED before
    * decode: every `frameStride`-th 16-byte frame block feeds the feature;
    * image/audio decode the full payload with per-block subsampling. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
                      frameStride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init happens HERE (stubbed)
      it.map { row =>
        val (decoded, frames) = row.kind match {
          case "video" =>
            val blocks = row.media.grouped(16).toArray
            val sampled = blocks.indices.collect {
              case bi if bi % frameStride == 0 => blocks(bi)
            }
            (sampled.flatten.toArray, sampled.length)
          case _ =>
            (row.media, row.media.grouped(frameStride).size)
        }
        MediaFeatures(row.media_id, row.kind, row.media.length.toLong,
          stubDecode(decoded, dim), frames)
      }
    }
  }

  /** Embedding-cosine near-dup over the extracted features: pairs with
    * cosine ≥ minCosine (planted byte-identical media have cosine 1).
    * Routes through the shared [[graft.sim.Ann.cosinePairsOf]] machinery:
    * exact = true is the guarded all-pairs path (loud row bound);
    * exact = false is the IVF candidate path — the corpus-scale shape
    * (candidates sub-quadratic; byte-identical media share an argmax
    * centroid, so recall of true duplicates is ~certain). */
  def mediaNearDup(feats: DataFrame, minCosine: Double = 0.999,
                   exact: Boolean = true, maxRows: Long = 65536L): DataFrame = {
    // the pair machinery evaluates its input several times; features come
    // from a COMPUTED pipeline (decode + extract), so pin one copy — a
    // single-slot displace cache (previous call's copy freed), the same
    // posture as NearDup's token sets
    val cached = feats
      .select(col("media_id").as("vec_id"), col("feature").as("embedding")).cache()
    val prev = lastFeatsCache.getAndSet(cached)
    if (prev != null) prev.unpersist(false)
    graft.sim.Ann.cosinePairsOf(feats.sparkSession, cached, exact, maxRows)
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  private val lastFeatsCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

  /** Query-shaped entry: features + per-kind stats over synthetic media. */
  def featureStats(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    extractFeatures(synthMedia(spark, n)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("frames_sampled")).as("total_frames"))
  }
}
