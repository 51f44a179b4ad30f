package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Output-type contract for every driver-gated query: the driver's
  * correctness hash canonicalizes only a small set of "plain" column
  * types identically between Spark-parquet and DuckDB. Round 10's q24
  * regression (commit 9dc4f7b) proved the failure mode: values and
  * schema matched bit-for-bit, yet the lone DECIMAL(38,0) output column
  * hashed differently between engines. This spec pins the allowed FINAL
  * output types so a future int64-wrap sweep can widen arithmetic
  * internally (decimal/hugeint is fine mid-plan) but can never land a
  * fragile type in a gated output schema again.
  *
  * Schema inspection reads `df.schema`, so the FINAL plan never
  * executes — but building a DataFrame is not free for every query:
  * the trainer-backed ones (kmeans codebook, IVF, PQ) run their
  * bounded training jobs at construction time (memoized process-wide,
  * see VectorOps). The sweep is cheap at sf0.001, not zero-cost.
  */
class OutputSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Exactly the types the driver's DuckDB-compare hashes stably. */
  private val allowed: Set[DataType] = Set(
    LongType, IntegerType, DoubleType, StringType, BooleanType,
    DateType, TimestampType)

  test("every gated query emits only driver-hashable column types") {
    Caches.scoped {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, build) =>
          val schema = build(spark, dir).schema
          schema.fields.collect {
            case f if !allowed.contains(f.dataType) =>
              s"$name.${f.name}: ${f.dataType.sql}"
          }
      }
      assert(offenders.isEmpty,
        "driver-hash-fragile output column types (widen internally, " +
          s"emit guarded long / exact-digit string):\n${offenders.mkString("\n")}")
    }
  }
}
