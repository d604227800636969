package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the (c)-tier extension path: a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` registered through
  * `SparkSessionExtensions` (`graft.GraftExtensions`) or
  * `spark.experimental.extraStrategies` (what [[AsOf.join]] does
  * idempotently, so no deployment wiring is required).
  *
  * Semantics (backward as-of, the DuckDB `ASOF LEFT JOIN` contract the
  * `ev_asof*` oracles already pin): every left row pairs with the
  * LATEST right row whose key equals the left key and whose time is
  * `<=` the left time; right columns are null when no such row exists.
  *
  * Why a custom operator instead of the union+`last(ignoreNulls)`
  * window composition (`ops/Events.scala:332`): the window form
  * carries every left row THROUGH the window state and re-sorts the
  * union of both sides; this exec declares
  * `ClusteredDistribution`/sort requirements and lets
  * `EnsureRequirements` plan the exchanges, then streams BOTH sorted
  * sides through a single O(|L|+|R|) merge per partition holding ONE
  * buffered right row — no window buffer, no union blow-up, and the
  * left side's sort order survives into `outputOrdering` so a
  * downstream `ORDER BY key, time` is a no-op. At 100 TB both sides
  * shuffle once on the join key (exactly what sort-merge join would
  * pay) and the merge is memoryless, so skewed keys cost CPU, not
  * executor memory.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    tolerance: Option[Long]) extends BinaryNode {
  require(leftKeys.length == rightKeys.length, "as-of join key arity mismatch")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; a no-op on every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on the
  * join keys (co-partitioned by `EnsureRequirements`, same machinery
  * sort-merge join uses) and sorted by (keys…, time), so each
  * partition is a single merge pass.
  *
  * Backward (`forward=false`, the default): advance the right cursor
  * while it is at-or-before the current left row, remembering the last
  * advanced row as the match candidate — the only retained state is
  * that one copied right row. Forward (`forward=true`, pandas
  * `merge_asof(direction="forward")`): advance the right cursor past
  * rows strictly before the current left row WITHOUT consuming the
  * head; the head itself is the match when its key agrees (it may also
  * serve later left rows). Both directions are tie-inclusive.
  *
  * `tolerance` (same integral unit as the time column: days for DATE,
  * micros for TIMESTAMP) nulls the payload when the matched row is
  * further than `tolerance` from the left time — `merge_asof`'s
  * staleness cap. Restricted to integral-backed time types, enforced
  * at the [[AsOf.join]] API.
  *
  * Keyless form degrades to `AllTuples` (one global series — same
  * single-partition shape the window composition pays). Null times
  * sort first (natural ordering), so a null-time right row behaves as
  * "before everything" (and never survives a tolerance gate).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge emits left rows in their incoming (keys…, time) order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  // requireAllClusterKeys = true explicitly: zipPartitions pairs the
  // children positionally, which is only sound when BOTH sides hash on
  // the full key list with the same function. The session default
  // (spark.sql.requireAllClusterKeysForCoPartition) happens to be
  // true, but a deployment that flips it would let a child already
  // partitioned on a key SUBSET satisfy the distribution and silently
  // mispair partitions — correctness must not ride on a conf.
  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) Seq(AllTuples, AllTuples)
    else Seq(ClusteredDistribution(leftKeys, requireAllClusterKeys = true),
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true))

  // The right side additionally sorts by its remaining ORDERABLE
  // payload columns: with duplicate right rows at the same (key, time)
  // the merge keeps the last-advanced row (backward) or the surviving
  // head (forward), so without a total order the matched payload would
  // ride on whichever order the engine's (unstable) sort delivered —
  // run-nondeterministic. The extra keys only cost comparisons INSIDE
  // tied (key, time) groups; the sort itself is already required.
  // Non-orderable payload columns (maps) are skipped — ties then
  // deterministically order on every other column, which suffices
  // unless two tied rows differ ONLY in a map (documented in AsOf.join).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val rightJoinExprs = rightKeys :+ rightTime
    val tiebreak = right.output.filter(a =>
      RowOrdering.isOrderable(a.dataType) &&
        !rightJoinExprs.exists(_.semanticEquals(a)))
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)) ++
        tiebreak.map(SortOrder(_, Ascending)))
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lTimeExpr = leftTime; val rTimeExpr = rightTime
    val fwd = forward
    val tol = tolerance
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rightNulls = new GenericInternalRow(rightOutput.length)
      val joined = new JoinedRow
      // tolerance needs the time VALUES, not just their order — the
      // API layer guarantees an integral-backed time type here
      def timeVal(r: InternalRow): Long = timeType match {
        case org.apache.spark.sql.types.DateType |
             org.apache.spark.sql.types.IntegerType => r.getInt(0).toLong
        case _ => r.getLong(0)
      }
      def withinTol(l: InternalRow, m: InternalRow): Boolean = tol match {
        case None => true
        case Some(t) =>
          val lt = lTimeProj(l); val rt = rTimeProj(m) // distinct buffers
          if (lt.isNullAt(0) || rt.isNullAt(0)) false
          else {
            val lv = timeVal(lt); val rv = timeVal(rt)
            (if (fwd) rv - lv else lv - rv) <= t
          }
      }

      new Iterator[InternalRow] {
        // head of the right cursor; rows are copied because the
        // underlying iterator reuses its UnsafeRow buffer
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var lastMatch: InternalRow = _
        private var lastMatchKey: UnsafeRow = _
        advanceRight()

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lKey = lKeyProj(l)
          val m =
            if (fwd) {
              // drop rows strictly before l (key-first order); the
              // surviving head is l's match iff its key agrees — do
              // NOT consume it, it may match later left rows too
              var scanning = rHead != null
              while (scanning) {
                val c = keyOrd.compare(rHeadKey, lKey)
                if (c < 0 ||
                    (c == 0 && timeOrd.compare(rTimeProj(rHead), lTimeProj(l)) < 0)) {
                  advanceRight()
                  scanning = rHead != null
                } else scanning = false
              }
              if (rHead != null && keyOrd.compare(rHeadKey, lKey) == 0) rHead else null
            } else {
              var scanning = rHead != null
              while (scanning) {
                val c = keyOrd.compare(rHeadKey, lKey)
                if (c < 0 ||
                    (c == 0 && timeOrd.compare(rTimeProj(rHead), lTimeProj(l)) <= 0)) {
                  if (c == 0) { lastMatch = rHead; lastMatchKey = rHeadKey }
                  advanceRight()
                  scanning = rHead != null
                } else scanning = false
              }
              if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0)
                lastMatch
              else null
            }
          val out =
            if (m != null && withinTol(l, m)) joined(l, m)
            else joined(l, rightNulls)
          resultProj(out)
        }

        private def advanceRight(): Unit =
          if (rIt.hasNext) {
            rHead = rIt.next().copy()
            rHeadKey = rKeyProj(rHead).copy()
          } else { rHead = null; rHeadKey = null }
      }
    }
  }
}

/** Public DataFrame API for the as-of join. Column references are
  * resolved by name against each side's analyzed output, so callers
  * pass plain column names; the node is built already-resolved and the
  * analyzer passes it through untouched.
  */
object AsOf {

  /** Ensure the planner strategy is registered on this session —
    * `spark.experimental.extraStrategies` is the public, in-process
    * registration point; `graft.GraftExtensions` injects the same
    * strategy for `spark-submit --conf spark.sql.extensions=` fleets.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** As-of join `left` with `right` on equal `keys`. `direction`
    * "backward" (default) keeps the LATEST right row with
    * `right.time <= left.time`; "forward" keeps the EARLIEST with
    * `right.time >= left.time` (pandas `merge_asof` directions).
    * `tolerance` (in the time column's integral unit — days for DATE,
    * micros for TIMESTAMP) nulls matches staler than the cap.
    * Output = all left columns, then all right columns (nullable).
    * Callers rename ahead of the join if the two sides share names.
    *
    * TIES: if the right side has several rows at the SAME (key, time),
    * the matched payload is DETERMINISTIC — the exec sorts tied rows
    * by every remaining orderable right column, and the merge keeps
    * the LAST tied row in that total order for backward (the GREATEST
    * payload tuple) and the FIRST for forward (the least). The one
    * remaining unspecified case: tied rows that differ ONLY in a
    * non-orderable column (a map) — pre-aggregate to one row per
    * (key, time) if that case matters.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val forward = direction match {
      case "backward" => false
      case "forward"  => true
      case other => throw new IllegalArgumentException(
        s"as-of direction must be backward|forward, got '$other'")
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"as-of $side column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    val lt = attr(lPlan, leftTime, "left")
    if (tolerance.isDefined) {
      import org.apache.spark.sql.types._
      val ok = lt.dataType match {
        case DateType | IntegerType | TimestampType | TimestampNTZType | LongType => true
        case _ => false
      }
      require(ok, s"as-of tolerance needs an integral-backed time type, got ${lt.dataType}")
      require(tolerance.get >= 0, "as-of tolerance must be >= 0")
    }
    val node = AsOfJoinPlan(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _, "left")), rightKeys.map(attr(rPlan, _, "right")),
      lt, attr(rPlan, rightTime, "right"), forward, tolerance)
    org.apache.spark.sql.graft.GraftSql.ofRows(spark, node)
  }
}
