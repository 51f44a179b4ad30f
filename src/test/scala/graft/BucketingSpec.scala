package graft

import graft.operators.Bucketing
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** Proves the bucketing co-location claim against the physical plan:
  * two tables bucketed by the join key into the same bucket count join
  * with ZERO shuffle exchanges (broadcast disabled so the test can't
  * pass via a broadcast join), while the same join over plain parquet
  * shuffles both sides.
  */
class BucketingSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = SparkTestSession.spark

  test("co-bucketed join plans no shuffle; plain join shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, sf), "orders_b", s"$dir/orders",
      "o_custkey", buckets = 8)
    Bucketing.writeBucketed(Tables.customer(spark, sf), "customer_b", s"$dir/customer",
      "c_custkey", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val bucketed = Bucketing.coLocatedJoin(spark, "orders_b", "customer_b",
        "o_custkey", "c_custkey")
      assert(bucketed.count() > 0)
      val bucketedShuffles = collect(bucketed.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(bucketedShuffles.isEmpty,
        s"bucketed join should not shuffle:\n${bucketed.queryExecution.executedPlan}")

      val o = Tables.orders(spark, sf)
      val c = Tables.customer(spark, sf)
      val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      plain.count()
      val plainShuffles = collect(plain.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(plainShuffles.nonEmpty, "plain parquet join is expected to shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
