package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for winnowing fingerprint selection
  * (`ops.Text.winnow`).
  *
  * The composable form — build the 39-char `md5(shingle) || lpad(10^6
  * - pos)` array, then `array_min(slice(hs, s, 16))` per window —
  * is O(n·w) with a 16-element array allocation per window and runs
  * on the interpreted higher-order-function path. This expression is
  * the O(n) sliding-window minimum (monotonic deque) over the SAME
  * total order, evaluated in one pass per document: digests are
  * compared as unsigned bytes (lowercase-hex order ≡ unsigned-byte
  * order) with the larger position winning ties (≡ the smaller
  * `10^6 - pos` suffix), and the hex string is materialized only for
  * the ~2n/w selected fingerprints. Output values are bit-identical
  * to the composable form, so the DuckDB oracle is unchanged.
  *
  * Measured at sf0.1 (PERF.md round 9): text_winnow 4.9 → sub-second,
  * text_winnow_overlap 5.6 → ~1 s.
  */
case class WinnowSelect(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  protected override def nullSafeEval(input: Any): Any =
    WinnowSelect.winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one static-shaped call keeps the surrounding stage inside
    // whole-stage codegen; the heavy loop lives in compiled Scala
    val helper = ctx.addReferenceObj("winnowHelper", WinnowSelect,
      "graft.functions.WinnowSelect$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $helper.winnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {
  /** Shingle width (chars) and window width (shingles) — fixed to the
    * published text_winnow contract; the guarantee threshold is
    * K + W - 1 = 23 chars. */
  val K = 8
  val W = 16
  private val Hex = "0123456789abcdef".toCharArray

  /** Distinct winnowing selections for one document, as the same
    * `md5hex || lpad(1000000 - pos, 7, '0')` strings the composable
    * form produces, in first-window order. Empty when the text holds
    * fewer than W shingles (callers also filter `length >= 23`). */
  def winnow(text: UTF8String): ArrayData = {
    val n = text.numChars() - K + 1
    if (n < W) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val digs = new Array[Array[Byte]](n + 1) // 1-based positions
    var i = 1
    while (i <= n) {
      md.reset()
      digs(i) = md.digest(text.substringSQL(i, K).getBytes)
      i += 1
    }
    // ordering: unsigned-byte digest compare (== lowercase-hex string
    // order); equal digests (equal shingles) break to the LARGER
    // position, matching the smaller lpad(10^6 - pos) suffix
    def less(a: Int, b: Int): Boolean = {
      val c = java.util.Arrays.compareUnsigned(digs(a), digs(b))
      if (c != 0) c < 0 else a > b
    }
    val dq = new Array[Int](n + 1)
    var head = 0
    var tail = 0
    val sel = new java.util.LinkedHashSet[Int]()
    i = 1
    while (i <= n) {
      while (tail > head && !less(dq(tail - 1), i)) tail -= 1
      dq(tail) = i
      tail += 1
      val s = i - W + 1
      if (s >= 1) {
        while (dq(head) < s) head += 1
        sel.add(dq(head))
      }
      i += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) {
      val p = it.next()
      val d = digs(p)
      val sb = new java.lang.StringBuilder(39)
      var j = 0
      while (j < 16) {
        val b = d(j) & 0xff
        sb.append(Hex(b >> 4)).append(Hex(b & 15))
        j += 1
      }
      val ps = java.lang.String.valueOf(1000000 - p)
      var z = ps.length
      while (z < 7) { sb.append('0'); z += 1 }
      sb.append(ps)
      out(o) = UTF8String.fromString(sb.toString)
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Register `graft_winnow` with the session (same convention as
    * [[VectorFunctions.dot]]) and return a Column-level handle. */
  def selections(spark: SparkSession, text: Column): Column = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_winnow"))) {
      registry.createOrReplaceTempFunction(
        "graft_winnow", exprs => WinnowSelect(exprs(0)), "built-in")
    }
    call_function("graft_winnow", text)
  }
}
