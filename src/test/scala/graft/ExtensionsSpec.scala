package graft

import graft.ext.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions registration: the custom codegen expressions
  * are callable from plain SQL and agree with the Column API.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("dot_long in SQL equals the Column API on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("qvec"))
      .createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_long(qvec, qvec) AS d FROM ext_vecs ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaApi = spark.table("ext_vecs")
      .select(col("vec_id"), VectorOps.dotInt(col("qvec"), col("qvec")).as("d"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.nonEmpty && viaSql.toSeq == viaApi.toSeq)
  }

  test("base58_valid in SQL matches the scalar reference semantics") {
    val rows = spark.sql(
      """SELECT base58_valid('So11111111111111111111111111111111111111112') AS mint,
        |       base58_valid('not-base58!') AS junk,
        |       base58_valid('abc') AS short""".stripMargin).head()
    assert(rows.getBoolean(0))
    assert(!rows.getBoolean(1))
    assert(!rows.getBoolean(2))
  }

  test("registered builders construct working expressions (the injectFunction payload)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // apply() must not throw when handed a fresh extensions object
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    assert(GraftExtensions.registrations.map(_._1) ==
      Seq("dot_long", "base58_valid", "py_repr", "word_shingles"))

    // evaluate each builder's expression directly — a swapped argument or
    // arity bug fails here without needing a second SparkSession
    val byName = GraftExtensions.registrations.map(r => r._1 -> r._3).toMap
    val arr = Literal.create(ArrayData.toArrayData(Array(2L, 3L)), ArrayType(LongType))
    assert(byName("dot_long")(Seq(arr, arr)).eval(null) == 13L)
    val mint = Literal("So11111111111111111111111111111111111111112")
    assert(byName("base58_valid")(Seq(mint)).eval(null) == true)
    assert(byName("py_repr")(Seq(Literal(37.5))).eval(null).toString == "37.5")
    intercept[IllegalArgumentException](byName("dot_long")(Seq(arr)))
    intercept[IllegalArgumentException](byName("base58_valid")(Seq(mint, mint)))
    assert(byName("word_shingles")(Seq(Literal("a b c"), Literal(2))).eval(null)
      .asInstanceOf[ArrayData].array.map(_.toString).toSeq == Seq("a b", "b c"))
    // width must be a literal — it shapes the plan, not the data
    intercept[IllegalArgumentException](
      byName("word_shingles")(Seq(Literal("a b c"),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "n", org.apache.spark.sql.types.IntegerType)())))
  }
}
