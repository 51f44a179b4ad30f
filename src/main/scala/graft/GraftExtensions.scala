package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Base58, DotLong, PyRepr, Shingles}

/** Spark-native integration point: registers the engine's custom codegen
  * expressions in the SQL function registry so plain `spark.sql(...)`
  * users (and external SQL frontends) get them without touching the
  * Column API. Activate either way:
  *
  *   - `--conf spark.sql.extensions=graft.GraftExtensions`
  *   - `SparkSession.builder.withExtensions(new GraftExtensions)`
  *
  * Registered (both are real `doGenCode` expressions — they stay inside
  * whole-stage codegen):
  *
  *   - `dot_long(array<bigint>, array<bigint>) -> bigint` — exact
  *     integer dot product, the primitive behind the similarity pack.
  *   - `base58_valid(string) -> boolean` — Solana-address plausibility
  *     (length + exact base58 decoded length), D11.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_long",
      info("dot_long", "dot_long(a, b) - exact int64 dot product of two bigint arrays"),
      { args =>
        require(args.length == 2, s"dot_long expects 2 arguments, got ${args.length}")
        DotLong(args(0), args(1))
      }),
    ("base58_valid",
      info("base58_valid", "base58_valid(s) - true when s plausibly is a base58 Solana address"),
      { args =>
        require(args.length == 1, s"base58_valid expects 1 argument, got ${args.length}")
        Base58.IsBase58Address(args(0))
      }),
    ("py_repr",
      info("py_repr", "py_repr(d) - Python repr() of a double (shortest roundtrip digits)"),
      { args =>
        require(args.length == 1, s"py_repr expects 1 argument, got ${args.length}")
        PyRepr(args(0))
      }),
    ("word_shingles",
      info("word_shingles",
        "word_shingles(text, n) - array of word n-gram shingle occurrences (codegen, per-row)"),
      { args =>
        require(args.length == 2, s"word_shingles expects 2 arguments, got ${args.length}")
        val n = args(1) match {
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"word_shingles width must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "word_shingles width must be a literal (it shapes the plan)")
        }
        Shingles.WordShinglesExpr(args(0), n)
      }))

  /** Register on an already-built session (tests, notebook sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    registrations.foreach { case (name, inf, builder) =>
      registry.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}
