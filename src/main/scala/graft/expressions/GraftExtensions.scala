package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native expressions with the SQL function registry so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works.
  *
  * Two entry points:
  *  - config: `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (the standard SparkSessionExtensions route);
  *  - runtime: `GraftExtensions.register(spark)` for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(className: String, name: String) =
    new ExpressionInfo(className, null, name)

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("graft_dot",
        info(classOf[DotProduct].getName, "graft_dot"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_dot takes exactly 2 arguments")
          DotProduct(args.head, args(1))
        }),
      ("graft_word_shingles",
        info(classOf[WordShingles].getName, "graft_word_shingles"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_word_shingles takes (text, n)")
          val n = args(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toInt
            case other => throw new IllegalArgumentException(
              s"graft_word_shingles n must be a literal, got $other")
          }
          WordShingles(args.head, n)
        }))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, inf, builder) =>
      registry.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}
