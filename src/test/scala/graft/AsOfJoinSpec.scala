package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Events
import graft.plans.{AsOf, AsOfJoinExec}

/** The native whole-operator as-of join ([[graft.plans.AsOfJoinExec]]):
  * plan shape, window-composition parity on the real tables, and a
  * randomized brute-force pin of the merge semantics (latest right row
  * with equal key and time <= left time; nulls when none).
  */
class AsOfJoinSpec extends SparkSpec {

  private def collectExecs(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // under AQE the finalized tree nests inside AdaptiveSparkPlanExec
    // and each materialized stage hides its subtree in .plan, not
    // .children — unwrap both
    def walk(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => a.nodeName +: walk(a.executedPlan)
      case q: QueryStageExec        => q.nodeName +: walk(q.plan)
      case _ => p.nodeName +: p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("ev_asof_native plans through AsOfJoinExec, not Window") {
    val df = Events.asofJoinNative(spark, sf)
    df.collect() // materialize so AQE finalizes the physical plan
    val nodes = collectExecs(df)
    assert(nodes.exists(_.contains("AsOfJoin")), s"no AsOfJoinExec in: $nodes")
    assert(!nodes.exists(_.contains("Window")), s"Window leaked into: $nodes")
  }

  test("native keyless as-of matches the union+window composition row-for-row") {
    val native = Events.asofJoinNative(spark, sf).collect().toSeq
    val window = Events.asofJoin(spark, sf).collect().toSeq
    assert(native === window)
  }

  test("native keyed as-of matches the union+window composition row-for-row") {
    val native = Events.asofJoinByKeyNative(spark, sf).collect().toSeq
    val window = Events.asofJoinByKey(spark, sf).collect().toSeq
    assert(native === window)
  }

  test("random as-of graphs: exec agrees with a brute-force scan, ties inclusive") {
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    for (trial <- 0 until 3) {
      // duplicate times on both sides + keys private to each side
      val lRows = Seq.tabulate(200) { i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, i.toLong)
      }
      // unique (rk, rt): with duplicate right timestamps per key the
      // winner is whichever tied row the shuffle ordered last, which
      // is engine-nondeterministic — the real callers join against
      // per-(key, date) aggregates, where the pair is unique
      val rRows = Seq.tabulate(120) { i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, (1000 + i).toLong)
      }.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      val l = lRows.toDF("k", "t", "lid")
      val r = rRows.toDF("rk", "rt", "rid")
      val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
        .select($"k", $"t", $"lid", $"rid")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) -1L else x.getLong(3)))
        .sortBy(x => (x._1, x._2, x._3))

      // brute force: latest rt <= t with equal key; tie on rt broken by
      // sort position = LAST row at that rt in (rk, rt, insertion) order,
      // which is what the forward merge keeps. Sort rRows the way the
      // exec's requiredChildOrdering does (stable on the rest).
      val rSorted = rRows.sortBy(x => (x._1, x._2))
      val want = lRows.map { case (k, t, lid) =>
        val m = rSorted.filter(x => x._1 == k && x._2 <= t).lastOption
        (k, t, lid, m.map(_._3).getOrElse(-1L))
      }.sortBy(x => (x._1, x._2, x._3))

      assert(got.toSeq === want, s"trial $trial mismatch")
    }
  }

  test("random forward as-of graphs: exec agrees with a brute-force scan") {
    val rnd = new scala.util.Random(11)
    import spark.implicits._
    for (trial <- 0 until 3) {
      val lRows = Seq.tabulate(200) { i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, i.toLong)
      }
      val rRows = Seq.tabulate(120) { i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, (1000 + i).toLong)
      }.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      val l = lRows.toDF("k", "t", "lid")
      val r = rRows.toDF("rk", "rt", "rid")
      val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", direction = "forward")
        .select($"k", $"t", $"lid", $"rid")
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) -1L else x.getLong(3)))
        .sortBy(x => (x._1, x._2, x._3))
      // earliest rt >= t with equal key (tie-inclusive)
      val rSorted = rRows.sortBy(x => (x._1, x._2))
      val want = lRows.map { case (k, t, lid) =>
        val m = rSorted.find(x => x._1 == k && x._2 >= t)
        (k, t, lid, m.map(_._3).getOrElse(-1L))
      }.sortBy(x => (x._1, x._2, x._3))
      assert(got.toSeq === want, s"forward trial $trial mismatch")
    }
  }

  test("tolerance nulls stale matches in both directions, keeps in-range ones") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 14L), (1L, 30L)).toDF("k", "t")
    val r = Seq((1L, 9L, 100L), (1L, 40L, 200L)).toDF("rk", "rt", "p")
    // backward, tol=5: t=10 matches rt=9 (gap 1); t=14 matches rt=9
    // (gap 5, inclusive); t=30's best is rt=9 (gap 21) -> null
    val back = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
        tolerance = Some(5L))
      .orderBy("t").collect()
    assert(back(0).getLong(4) === 100L)
    assert(back(1).getLong(4) === 100L)
    assert(back(2).isNullAt(4))
    // forward, tol=10: t=30 matches rt=40 at gap 10 (inclusive);
    // t=10/14's next is rt=40 (gap 30/26) -> null
    val fwd = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
        direction = "forward", tolerance = Some(10L))
      .orderBy("t").collect()
    assert(fwd(0).isNullAt(4))
    assert(fwd(1).isNullAt(4))
    assert(fwd(2).getLong(4) === 200L)
  }

  test("tolerance rejects non-integral time types at the API") {
    import spark.implicits._
    val l = Seq(("a", 1.5)).toDF("k", "t")
    val r = Seq(("a", 1.0, 9L)).toDF("rk", "rt", "p")
    intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", tolerance = Some(1L))
    }
  }

  test("keyless as-of with an empty right side yields all-null payload") {
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 20L)).toDF("t", "v")
    val r = Seq.empty[(Long, Long)].toDF("rt", "p")
    val out = AsOf.join(l, r, Nil, Nil, "t", "rt").collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(3)))
  }

  test("left rows earlier than every right row get nulls, not a future match") {
    import spark.implicits._
    val l = Seq((1L, 5L), (1L, 50L)).toDF("k", "t")
    val r = Seq((1L, 10L, 99L)).toDF("rk", "rt", "p")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .orderBy("t").collect()
    assert(out(0).isNullAt(4), "t=5 must not see the rt=10 row")
    assert(out(1).getLong(4) === 99L)
  }

  test("duplicate (key, time) right rows match a deterministic payload") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    // three tied right rows at (1, 10); payload order breaks the tie:
    // backward keeps the GREATEST payload tuple, forward the least
    def tied() = Seq((1L, 10L, 300L, "c"), (1L, 10L, 100L, "a"),
        (1L, 10L, 200L, "b")).toDF("rk", "rt", "p", "s")
      .repartition(4) // scramble input order so ties aren't input-stable
    for (_ <- 1 to 5) {
      val back = AsOf.join(l, tied(), Seq("k"), Seq("rk"), "t", "rt").collect()
      assert(back(0).getLong(4) === 300L && back(0).getString(5) === "c")
      val fwd = AsOf.join(l, tied(), Seq("k"), Seq("rk"), "t", "rt",
        direction = "forward").collect()
      assert(fwd(0).getLong(4) === 100L && fwd(0).getString(5) === "a")
    }
  }
}
