package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics pinned on a hand-written fixture: inclusive
  * equality, latest-wins, tie resolution, LEFT behavior for never-matched
  * keys — plus the plan-shape guarantee that makes it scale: no nested-
  * loop/cartesian join anywhere in the physical plan.
  */
class AsofSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixture = {
    import spark.implicits._
    // left: (key, ts, label)
    val left = Seq(
      ("a", 10L, "L1"), // after r@5 and r@10 -> inclusive pick r@10
      ("a", 4L, "L2"),  // before every right row -> nulls
      ("b", 7L, "L3"),  // between r@3 and r@9 -> r@3
      ("c", 5L, "L4")   // key with no right rows at all -> nulls
    ).toDF("k", "ts", "label")
    // right: (key, ts, rid, price); a@10 has a TIE (rid 7 vs 8)
    val right = Seq(
      ("a", 5L, 6L, 50.0),
      ("a", 10L, 7L, 70.0),
      ("a", 10L, 8L, 80.0),
      ("b", 3L, 9L, 30.0),
      ("b", 9L, 10L, 90.0)
    ).toDF("k", "ts", "rid", "price")
    (left, right)
  }

  private def joined = {
    val (l, r) = fixture
    AsofJoin.asofJoin(l, r, "k", "k", "ts", "ts",
      payload = Seq("rid", "price"), tiebreak = "rid")
  }

  test("inclusive <= picks the equal-timestamp row; ties go to highest tiebreak") {
    val row = joined.filter(col("label") === "L1").collect().head
    assert(row.getAs[Long]("rid") == 8L) // not rid=7 (tie), not rid=6 (older)
    assert(row.getAs[Double]("price") == 80.0)
  }

  test("left rows before any right row, and unmatched keys, keep nulls") {
    val rows = joined.collect().map(r => r.getAs[String]("label") ->
      Option(r.getAs[Any]("rid"))).toMap
    assert(rows("L2").isEmpty)
    assert(rows("L4").isEmpty)
  }

  test("strictly-between timestamps pick the most recent earlier row") {
    val row = joined.filter(col("label") === "L3").collect().head
    assert(row.getAs[Long]("rid") == 9L && row.getAs[Double]("price") == 30.0)
  }

  test("tie groups never mix payload columns from different rows") {
    // rid=8 must come with ITS price (80.0), never rid=8/price=70.0
    val pairs = joined.filter(col("rid").isNotNull)
      .select("rid", "price").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(pairs.subsetOf(Set((6L, 50.0), (7L, 70.0), (8L, 80.0), (9L, 30.0), (10L, 90.0))))
  }

  test("physical plan has no nested-loop or cartesian join") {
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("matches the quadratic reference formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i => (s"k${rnd.nextInt(10)}", rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val r = (1 to 300).map(i => (s"k${rnd.nextInt(12)}", rnd.nextInt(100).toLong, i.toLong, rnd.nextInt(1000).toDouble))
      .toDF("k", "ts", "rid", "price")
    val got = AsofJoin.asofJoin(l, r, "k", "k", "ts", "ts", Seq("rid", "price"), "rid")
      .orderBy("lid").collect().map(_.toSeq).toSeq
    // reference: per-left max over an explicit range join (fine on 300 rows)
    val want = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy(col("r.ts").desc_nulls_last, col("rid").desc_nulls_last)))
      .filter(col("_rn") === 1)
      .select(col("l.k"), col("l.ts"), col("lid"), col("rid"), col("price"))
      .orderBy("lid").collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
