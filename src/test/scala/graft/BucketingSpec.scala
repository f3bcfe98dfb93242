package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Bucketing

/** Bucketed co-located join: shuffle paid once at write, joins run
  * exchange-free afterwards. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("join on the bucket key plans without a shuffle exchange and matches the plain join") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_totalprice"))
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("custkey"), col("c_name"))
    Bucketing.writeBucketed(orders, "orders_b", "custkey", 8)
    Bucketing.writeBucketed(customer, "customer_b", "custkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the SMJ path so the assertion is about bucketing, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "customer_b", "custkey")
      assert(!Bucketing.hasShuffle(joined),
        s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      val got = joined.select("o_orderkey", "c_name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = orders.join(customer, "custkey").select("o_orderkey", "c_name")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want)
      // and the unbucketed plain join DOES shuffle under the same settings
      val plain = orders.join(customer, "custkey")
      assert(Bucketing.hasShuffle(plain), "control: plain SMJ should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
