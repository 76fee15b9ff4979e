package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as a native codegen expression: a TRUE O(n) Rabin-Karp rolling hash
  * over k-char grams, then O(n) sliding-window minima (monotone deque),
  * distinct + sorted. This is the rolling-hash fingerprinting operator of
  * the training-data pipeline — robust to insertions/deletions outside
  * the changed windows, unlike whole-document hashing.
  *
  * Scale: entirely row-local (no shuffle) and inside whole-stage codegen;
  * the generated code calls [[Winnow.fingerprint]] — a static primitive
  * loop, no boxing.
  *
  * The hash is exactly reproducible in any engine: polynomial base 257
  * modulo 2^31−1 over UTF-16 code units (ASCII-safe), each window emitting
  * its minimum VALUE, the fingerprint being the sorted distinct minima.
  */
object Winnow {
  val P = 2147483647L // 2^31 − 1
  val B = 257L

  def fingerprint(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var bk = 1L // B^(k−1) mod P
    var j = 0
    while (j < k - 1) { bk = bk * B % P; j += 1 }
    var h = 0L
    j = 0
    while (j < k) { h = (h * B + str.charAt(j)) % P; j += 1 }
    hashes(0) = h
    var i = 1
    while (i < m) {
      // roll: drop char i−1, add char i+k−1 (all mods kept non-negative)
      h = ((h - str.charAt(i - 1) * bk % P + P) % P * B + str.charAt(i + k - 1)) % P
      hashes(i) = h
      i += 1
    }
    val minima =
      if (m < w) Array(hashes.min)
      else {
        val out = new Array[Long](m - w + 1)
        val deque = new Array[Int](m)
        var head = 0
        var tail = 0
        var p = 0
        while (p < m) {
          while (tail > head && hashes(deque(tail - 1)) >= hashes(p)) tail -= 1
          deque(tail) = p
          tail += 1
          if (deque(head) <= p - w) head += 1
          if (p >= w - 1) out(p - w + 1) = hashes(deque(head))
          p += 1
        }
        out
      }
    UnsafeArrayData.fromPrimitiveArray(minima.distinct.sorted)
  }
}

/** string → array<bigint> winnowing fingerprint (k-char grams, window w). */
case class TextWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || w < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 1 and w >= 1")
    else
      VectorExpressions.requireTypes(prettyName, child.dataType -> StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_winnow"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.fingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.fingerprint($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): TextWinnow =
    copy(child = newChild)
}
