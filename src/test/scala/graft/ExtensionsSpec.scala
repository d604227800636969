package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions injection path: a session built with
  * `withExtensions(new GraftExtensions)` has `graft_dot` available to
  * plain SQL from session start — the deployment shape for a cluster
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is SQL-visible in a session built with GraftExtensions") {
    // a sibling session on the SAME SparkContext (never stop it — that
    // would stop the shared context); cleared default/active so the
    // builder constructs a new session instead of returning ours
    val prev = spark // force shared-session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne prev)
      val r = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .head().getDouble(0)
      assert(r === 32.0)
      // the injected function matches the self-registered DataFrame path
      import org.apache.spark.sql.functions.{array, lit}
      val viaHelper = graft.functions.VectorFunctions.dot(prev,
        array(lit(1.0), lit(2.0), lit(3.0)), array(lit(4.0), lit(5.0), lit(6.0)))
      assert(prev.range(1).select(viaHelper.as("d")).head().getDouble(0) === 32.0)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
