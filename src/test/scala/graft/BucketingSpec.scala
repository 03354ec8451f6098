package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled co-located joins — the storage-layout lever
  * for repeated large joins at 100 TB (join keys bucketed once at
  * write time → zero exchange per join afterwards).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // static warehouse dir: tables land in ./spark-warehouse and are
    // dropped at the end
    val li = spark.read.parquet(s"${sfDir("0.001")}/lineitem.parquet")
    val ord = spark.read.parquet(s"${sfDir("0.001")}/orders.parquet")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum($"l_quantity").as("qty"))
    // force SMJ path (no broadcast) so the exchange question is real
    val noBroadcast = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = noBroadcast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // and it computes the right thing
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum($"l_quantity").as("qty"))
      .as[(String, Double)].collect().toMap
    val got = joined.as[(String, Double)].collect().toMap
    assert(got == expected)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
