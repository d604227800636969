package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Session-extension entry point — the idiomatic way to ship the
  * engine's custom Catalyst surface to a cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Registers `graft_dot` (the codegen'd embedding dot product,
  * [[graft.functions.DotProduct]]) as a permanent session function, so
  * plain `spark.sql("SELECT graft_dot(a, b) ...")` works and the
  * DataFrame helpers in [[graft.functions.VectorFunctions]] find it
  * already present. The engine's operators do not REQUIRE the
  * extension — `VectorFunctions.dot` self-registers idempotently — but
  * a deployment that injects it gets the function catalog-visible from
  * session start on every executor-submitted query.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    // whole-operator extension: the as-of join planner strategy
    // (graft.plans.AsOfJoinExec). AsOf.join also self-registers via
    // spark.experimental.extraStrategies, so in-process callers need
    // no deployment wiring; this makes the operator available to
    // spark.sql-only sessions on an extension-configured cluster too.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
