package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY.md §4.2 / the 100 TB checklist):
  * pay the shuffle ONCE at write time — both fact tables bucketed and
  * sorted by the join key — and every subsequent equi-join on that key is
  * exchange-free (SortMergeJoin over pre-bucketed scans). This is the
  * layout decision that matters most for repeated fact×fact joins at
  * 10^12 rows: the pages table bucketed by cell prefix joins the elements
  * table bucketed the same way with zero runtime shuffle.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (the once-paid shuffle). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join two tables bucketed on `key` — plans with no Exchange when
    * bucket counts match (assert via [[hasShuffle]] in tests/audits). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True if the executed plan contains a shuffle exchange (broadcast
    * exchanges don't count — they are the other no-shuffle strategy).
    * Matches the plan tree, not strings: ShuffleExchangeExec prints as
    * "Exchange <partitioning>" and a substring test would also hit
    * "BroadcastExchange …" or miss "Exchange SinglePartition". */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.nonEmpty
}
