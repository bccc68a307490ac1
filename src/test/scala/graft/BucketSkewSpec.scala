package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.SkewOps
import graft.etl.BucketedStore

class BucketSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val orders = Tables.load(spark, SparkTestSession.sfDir, "orders")
    val customer = Tables.load(spark, SparkTestSession.sfDir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    BucketedStore.writeBucketed(orders, "orders_b", "o_custkey", 8)
    BucketedStore.writeBucketed(customer, "customer_b", "o_custkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedStore.cogroupJoin(spark, "orders_b", "customer_b", "o_custkey")
      val qe = joined.queryExecution
      qe.toRdd.count()
      val shuffles = qe.executedPlan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected no shuffles, got ${shuffles.size}")
      // correctness: same row count as the plain join
      val expected = orders.join(
        Tables.load(spark, SparkTestSession.sfDir, "customer"),
        orders("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE orders_b")
      spark.sql("DROP TABLE customer_b")
    }
  }

  test("salted join matches unsalted results on skewed data") {
    // 95% of fact rows share one hot key
    val fact = (0 until 20000).map { i =>
      (if (i % 20 == 0) (i % 7).toLong + 1 else 1L, i.toLong)
    }.toDF("k", "v")
    val dim = (1L to 7L).map(k => (k, s"name-$k")).toDF("k", "name")

    val plain = fact.join(dim, "k")
      .groupBy("k", "name").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .collect().map(_.toString).sorted
    val salted = SkewOps.saltedJoin(fact, dim, "k", salt = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("salted aggregation matches plain aggregation") {
    val df = (0 until 10000).map(i => (if (i % 10 == 0) "rare" else "hot", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedSum(df, "k", "v", salt = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
