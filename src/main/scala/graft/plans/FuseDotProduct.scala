package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule (SURVEY.md §4.2 extension-point demo, with a real
  * payoff): rewrite the idiomatic higher-order dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProduct]] primitive loop (~5x, see PlanSpec).
  * Users keep writing the declarative form; the optimizer supplies the
  * fast path — the Catalyst way of "optimize the pattern, not the call
  * site".
  *
  * The rewrite is unconditionally safe for `array<double>` inputs because
  * [[DotProduct]] reproduces the HOF semantics exactly: zip_with pads a
  * shorter array with nulls and the fold's `acc + null` poisons the sum →
  * DotProduct returns null on length mismatch; a null element poisons the
  * fold the same way → DotProduct returns null on any null element. */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _ => false
  }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg: ArrayAggregate => agg.argument match {
      case zw: ZipWith
          if doubleArray(zw.left) && doubleArray(zw.right) =>
        (zw.function, agg.zero, agg.merge, agg.finish) match {
          case (
            LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable,
              y: NamedLambdaVariable), _),
            Literal(0.0, DoubleType),
            LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable,
              v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
            if ((isVar(m.left, x) && isVar(m.right, y)) ||
                (isVar(m.left, y) && isVar(m.right, x))) &&
              isVar(a.left, acc) && isVar(a.right, v) &&
              isVar(fin, fv) =>
            DotProduct(zw.left, zw.right)
          case _ => agg
        }
      case _ => agg
    }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wiring; the same rule
  * can be added to a live session via
  * `spark.experimental.extraOptimizations`, and the SQL functions via
  * [[GraftFunctions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuseDotProduct)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftFunctions.descriptions.foreach(e.injectFunction)
  }
}

/** The custom Catalyst expressions as NAMED SQL FUNCTIONS (§2.11 surface):
  * `rolling_hash(text)`, `simhash64(text)`, `dot_product(arr, arr)` become
  * callable from `spark.sql(...)` — config-time via `spark.sql.extensions`
  * ([[GraftExtensions]]) or on a live session via [[register]]. */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def one(name: String)(b: Expression => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument")
        b(args.head)
      })

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    one("rolling_hash")(RollingHash(_)),
    one("simhash64")(SimHash64(_)),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[GraftFunctions.type].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product expects 2 arguments")
        DotProduct(args(0), args(1))
      }))

  /** Idempotent live-session registration (temp functions — the same
    * builders `spark.sql.extensions` would install at session build). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
