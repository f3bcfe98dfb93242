package graft.web

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.TextOps

/** End-to-end text CURATION — the training-data twin of
  * [[Flagship.ingestWarc]]'s geocode lifecycle: a crawl pages frame
  * (url, warc_ts, text, lang) flows quality-filter → exact-dedup →
  * token-count annotation → lineage-committed bucket table. Resume
  * granularity is the lineage bucket (a killed run reruns only buckets
  * without manifests, [[Lineage.run]]); output rows carry `n_copies` so
  * dedup's collapse is auditable rather than silent.
  *
  * Plan shape at 100 TB: one narrow scoring pass (the quality reason and
  * both token counts are codegen column expressions), then the dedup
  * window shuffle on md5(text) — the canonical winner (min (url,
  * warc_ts)) and the copy count share that one exchange — then the
  * lineage write's repartition-by-bucket exchange. Text rides exactly
  * those two shuffles (the dedup decision and the final placement — the
  * §8 minimum for a pipeline that must both dedup and lay out by
  * bucket); no aggregation materializes the corpus.
  */
object Curation {

  /** Returns [[Lineage.RunResult]]; the curated table lands at
    * `outDir/data/bucket=N` with per-bucket manifests. Rejected rows drop
    * (their reasons are a one-pass aggregate away via
    * [[TextOps.qualityReason]] on the raw input — deliberately not a
    * second output table here); duplicate rows collapse to the canonical
    * min-(url, warc_ts) row with `n_copies`. */
  def curate(spark: SparkSession, pages: DataFrame, outDir: String,
             snapshotId: String, nBuckets: Int = 64,
             minTokens: Int = 30,
             minMeanLenX100: Int = 300, maxMeanLenX100: Int = 900,
             minStopwordBp: Int = 100): Lineage.RunResult = {
    val scored = pages
      // NULL text would pass every when() rule (NULL reason = keep) and
      // then md5(NULL) would collapse all null-text pages into one bogus
      // curated row — reject them up front, explicitly
      .filter(col("text").isNotNull)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("reason", TextOps.qualityReason(col("text"), col("n_chars"),
        minTokens, minMeanLenX100, maxMeanLenX100, minStopwordBp))
      .filter(col("reason").isNull)
      .drop("reason")
      .withColumn("text_hash", md5(col("text")))
    val wHash = Window.partitionBy(col("text_hash"))
    val wRank = wHash.orderBy(col("url"), col("warc_ts"))
    val curated = scored
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n_copies", count(lit(1)).over(wHash))
      .filter(col("rn") === 1)
      .drop("rn", "text_hash", "n_chars")
      .withColumn("n_tokens", TextOps.wsTokens(col("text")).cast("long"))
      .withColumn("n_bpe_tokens", TextOps.bpeTokens(col("text")).cast("long"))
      .withColumn("bucket", pmod(xxhash64(col("url")), lit(nBuckets.toLong)))
    Lineage.run(spark, curated, outDir, snapshotId)
  }
}
