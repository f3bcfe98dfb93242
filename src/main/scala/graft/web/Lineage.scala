package graft.web

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Per-partition lineage manifests + resume (north rule: "resumable from
  * checkpoint with per-partition lineage + metrics"; SURVEY.md §4.3).
  *
  * Output layout (Iceberg-style metadata written by hand — no Iceberg jar
  * in the sandbox, SURVEY.md §1.2):
  *   <outDir>/data/bucket=<cellPrefix>/part-*.parquet
  *   <outDir>/_manifests/bucket-<cellPrefix>.json   (rows, checksum, snapshot)
  *   <outDir>/_snapshots/<snapshotId>.json          (committed bucket list)
  *
  * A bucket (coarse cell prefix of the row's tile) is the unit of resume: a
  * killed job leaves some buckets without manifests; the rerun recomputes
  * only those (dynamic partition overwrite), never touching completed ones.
  */
object Lineage {

  case class Manifest(bucket: Long, rows: Long, checksum: Long,
                      snapshotId: String, completedAtMs: Long)

  case class RunResult(pending: Seq[Long], skipped: Seq[Long], manifests: Seq[Manifest])

  private def manifestDir(outDir: String): Path = Paths.get(outDir, "_manifests")

  /** Directory listing with the stream CLOSED (Files.list holds an open
    * directory descriptor until closed — a per-bucket leak at thousands of
    * buckets would exhaust the driver's fd limit mid-maintenance). */
  private def listDir[T](dir: Path)(f: Iterator[Path] => T): T = {
    val st = Files.list(dir)
    try f(st.iterator().asScala) finally st.close()
  }

  def completed(outDir: String): Map[Long, Manifest] = {
    val dir = manifestDir(outDir)
    if (!Files.isDirectory(dir)) return Map.empty
    listDir(dir)(_.filter(_.getFileName.toString.endsWith(".json"))
      .map { p =>
        val m = Files.readString(p)
        def field(k: String): String =
          s""""$k"\\s*:\\s*("[^"]*"|-?\\d+)""".r.findFirstMatchIn(m)
            .map(_.group(1).stripPrefix("\"").stripSuffix("\"")).getOrElse("")
        Manifest(field("bucket").toLong, field("rows").toLong,
          field("checksum").toLong, field("snapshotId"), field("completedAtMs").toLong)
      }
      .map(m => m.bucket -> m).toMap)
  }

  /** Audit committed data against its manifests: recompute per-bucket row
    * counts + checksums from the parquet and return buckets that disagree
    * (corruption / partial writes). Empty = healthy. */
  def audit(spark: SparkSession, outDir: String): Seq[Long] = {
    val ms = completed(outDir)
    if (ms.isEmpty) return Nil
    val actual = spark.read.parquet(s"$outDir/data")
      .withColumn("bucket", col("bucket").cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("rows"), expr("bit_xor(xxhash64(url))").as("checksum"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    ms.keys.toSeq.sorted.filter { b =>
      actual.get(b) match {
        case Some((rows, sum)) => rows != ms(b).rows || sum != ms(b).checksum
        case None => true
      }
    }
  }

  /** Snapshot ids committed so far (Iceberg-style time travel). */
  def snapshots(outDir: String): Seq[String] = {
    val dir = Paths.get(outDir, "_snapshots")
    if (!Files.isDirectory(dir)) Nil
    else listDir(dir)(_.map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json")).toSeq.sorted)
  }

  private def snapshotBuckets(outDir: String, snapshotId: String): Array[Long] = {
    val p = Paths.get(outDir, "_snapshots", s"$snapshotId.json")
    require(Files.exists(p), s"unknown snapshot $snapshotId")
    val txt = Files.readString(p)
    """"buckets"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").filter(_.trim.nonEmpty).map(_.trim.toLong)
  }

  /** Read the table as of a snapshot: only the buckets that snapshot
    * committed (partition pruning does the rest). */
  def readSnapshot(spark: SparkSession, outDir: String, snapshotId: String): DataFrame =
    spark.read.parquet(s"$outDir/data")
      .filter(col("bucket").isin(snapshotBuckets(outDir, snapshotId): _*))

  /** Incremental read (Iceberg-style changelog consumption): the rows of
    * buckets committed in `toSnapshot` but NOT in `fromSnapshot` — what a
    * downstream consumer processes to catch up between snapshots. Bucket
    * partitioning makes this pure partition pruning. */
  def readIncrement(spark: SparkSession, outDir: String,
                    fromSnapshot: String, toSnapshot: String): DataFrame = {
    val before = snapshotBuckets(outDir, fromSnapshot).toSet
    val added = snapshotBuckets(outDir, toSnapshot).filterNot(before)
    spark.read.parquet(s"$outDir/data").filter(col("bucket").isin(added: _*))
  }

  /** Iceberg-style table maintenance: rewrite buckets fragmented into more
    * than `maxFilesPerBucket` parquet files down to ONE file per bucket.
    * Small files are the chronic failure mode of a long-lived partitioned
    * ingest at 100 TB (every micro-batch task appends a file per bucket it
    * touches; scans then pay per-file open + footer costs).
    *
    * Content is untouched, so existing manifests stay valid (rows + the
    * order-independent bit_xor checksum are content-derived) — asserted by
    * a post-compaction [[audit]] in the spec. The rewrite goes through a
    * temp directory and per-bucket directory swaps, NEVER a self-overwrite
    * of paths being read (a cache-backed overwrite could recompute from
    * half-deleted files under memory pressure). A crash mid-swap leaves
    * that bucket's manifest present but data absent — exactly what audit()
    * reports for re-ingest. Returns the compacted bucket ids. */
  def compact(spark: SparkSession, outDir: String,
              maxFilesPerBucket: Int = 8): Seq[Long] = {
    val dataDir = Paths.get(outDir, "data")
    if (!Files.isDirectory(dataDir)) return Nil
    def parquetFiles(p: Path): Long =
      listDir(p)(_.count(_.getFileName.toString.endsWith(".parquet")))
    val victims = listDir(dataDir)(_
      .filter(_.getFileName.toString.startsWith("bucket="))
      .filter(parquetFiles(_) > maxFilesPerBucket)
      .map(_.getFileName.toString.stripPrefix("bucket=").toLong)
      .toSeq.sorted)
    if (victims.isEmpty) return Nil

    // one job: victim rows, hash-partitioned by bucket (each bucket lives in
    // exactly one task → exactly one output file per bucket), written to a
    // temp dir beside the table
    val tmp = Paths.get(outDir, "_compact_tmp")
    spark.read.parquet(s"$outDir/data")
      .withColumn("bucket", col("bucket").cast("long"))
      .filter(col("bucket").isin(victims: _*))
      .repartition(victims.length, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)

    // per-bucket directory swap: remove fragmented dir, move compacted in
    def deleteTree(p: Path): Unit = {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
      finally st.close()
    }
    for (b <- victims) {
      val dst = dataDir.resolve(s"bucket=$b")
      deleteTree(dst)
      Files.move(tmp.resolve(s"bucket=$b"), dst)
    }
    deleteTree(tmp)
    victims
  }

  /** Write `df` (which must carry `bucket` and `url` columns) partitioned by
    * bucket, skipping buckets whose manifests exist. ALL pending buckets go
    * out in ONE dynamic-partition-overwrite job and are audited by ONE
    * read-back aggregation that emits every manifest — the job count is
    * independent of the bucket count (thousands of buckets at 100 TB would
    * otherwise serialize on the driver). Cross-RUN resume granularity stays
    * the bucket: completed buckets are never recomputed or rewritten; within
    * one run the parquet job commit moves each partition dir atomically.
    * Lineage stats come from reading back the written files (validates what
    * is on disk); the input plan is computed once (cached).
    *
    * @param repartitionByBucket false skips the pre-write exchange —
    *        maximal write parallelism at the cost of tasks × buckets
    *        output files (the layout [[compact]] exists to repair); the
    *        default one-exchange layout writes ≤ splitsPerBucket file-sets
    *        per bucket.
    * @param splitsPerBucket bounded salt WITHIN each bucket for the
    *        default layout: a hot bucket (skewed web data) would otherwise
    *        hash to ONE shuffle partition and serialize its whole write
    *        into one straggler task. splits > 1 spreads each bucket over
    *        that many tasks — files per bucket stay ≤ splits (bounded, not
    *        the unbounded tasks × buckets of the off switch) and write
    *        parallelism becomes splits × buckets. 0 = AUTO: derive from the
    *        pending-bucket count so total write parallelism reaches the
    *        cluster's cores (ceil(cores / pending buckets)) — the
    *        spatially-bucketed callers (cell_parent buckets concentrate a
    *        whole region into few buckets) stop serializing their write,
    *        while callers with ≥ cores buckets keep one file-set each. */
  def run(spark: SparkSession, df: DataFrame, outDir: String,
          snapshotId: String, repartitionByBucket: Boolean = true,
          splitsPerBucket: Int = 1): RunResult = {
    require(splitsPerBucket >= 0, "splitsPerBucket must be >= 1, or 0 = auto")
    require(repartitionByBucket || splitsPerBucket <= 1,
      "splitsPerBucket is a salt for the repartition-by-bucket layout; " +
        "with repartitionByBucket = false it would be silently ignored")
    val done = completed(outDir)
    val work = df.cache()
    val allBuckets = work.select("bucket").distinct().collect().map(_.getLong(0)).sorted
    val pending = allBuckets.filterNot(done.contains)
    val skipped = allBuckets.filter(done.contains)
    val ms = scala.collection.mutable.ArrayBuffer.empty[Manifest]
    if (pending.nonEmpty) {
      Files.createDirectories(manifestDir(outDir))
      // repartition by bucket BEFORE the partitioned write: without it
      // every write task emits a file into every bucket dir — tasks ×
      // buckets files (1000 executors × 10⁴ buckets = 10⁷ files at
      // deployment scale; measured 4× the whole commit wall at 200k rows
      // × 64 buckets locally). One exchange on the partition key buys
      // one file-set per bucket and a proportionally cheaper read-back
      // audit and downstream scan.
      locally {
        val filtered = work.filter(col("bucket").isin(pending: _*))
        val splits =
          if (splitsPerBucket > 0) splitsPerBucket
          else math.max(1, (spark.sparkContext.defaultParallelism +
            pending.length - 1) / pending.length) // auto: cores / buckets
        if (!repartitionByBucket) filtered
        else if (splits == 1) filtered.repartition(col("bucket"))
        else filtered.repartition(col("bucket"),
          pmod(xxhash64(col("url")), lit(splits.toLong)))
      }.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(s"$outDir/data")
      // one grouped read-back audit over the just-written partitions
      // (bit_xor: order-independent and overflow-free under ANSI mode)
      val now = System.currentTimeMillis()
      val stats = spark.read.parquet(s"$outDir/data")
        .withColumn("bucket", col("bucket").cast("long"))
        .filter(col("bucket").isin(pending: _*))
        .groupBy("bucket")
        .agg(count(lit(1)).as("rows"), expr("bit_xor(xxhash64(url))").as("checksum"))
        .collect()
        .map(r => Manifest(r.getLong(0), r.getLong(1), r.getLong(2), snapshotId, now))
        .sortBy(_.bucket)
      for (m <- stats) {
        Files.writeString(manifestDir(outDir).resolve(s"bucket-${m.bucket}.json"),
          s"""{"bucket": ${m.bucket}, "rows": ${m.rows}, "checksum": ${m.checksum}, """ +
            s""""snapshotId": "${m.snapshotId}", "completedAtMs": ${m.completedAtMs}}""")
        ms += m
      }
    }
    work.unpersist()
    val snapDir = Paths.get(outDir, "_snapshots")
    Files.createDirectories(snapDir)
    Files.writeString(snapDir.resolve(s"$snapshotId.json"),
      s"""{"snapshotId": "$snapshotId", "completedAtMs": ${System.currentTimeMillis()}, """ +
        s""""buckets": [${(skipped ++ pending).sorted.mkString(",")}]}""")
    RunResult(pending.toSeq, skipped.toSeq, ms.toSeq)
  }
}
