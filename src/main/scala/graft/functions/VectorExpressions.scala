package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path (ANN candidate
  * scoring, cosine near-dup): these run inside whole-stage codegen reading
  * `ArrayData` directly, where a Scala UDF pays per-row
  * InternalRow→Seq boxing/unboxing on both the input vectors and the
  * result. The pair-scoring loop of an LSH bucket join calls the dot
  * product once per candidate pair — at 100 TB that is the single
  * hottest expression in the similarity pipeline.
  *
  * Semantics are bit-identical to the UDFs they replace (same
  * left-to-right double accumulation, same `* (1/sqrt)` normalization),
  * so oracle hashes are unchanged.
  *
  * Registered as SQL functions (`vec_norm`, `vec_dot`, `vec_l2`,
  * `vec_sig`) via `SparkSessionExtensions.injectFunction`
  * ([[GraftFunctions]], wired in `GraftSession`), so they are usable
  * from both the DataFrame API (`call_function`) and SQL text.
  */
object VectorExpressions {
  /** Nullability-insensitive element-type check shared by the expressions
    * (ExpectsInputTypes is not usable outside the spark namespace — its
    * AbstractDataType is private[sql]). */
  private[functions] def requireTypes(fn: String,
      pairs: (DataType, DataType)*): TypeCheckResult =
    pairs.zipWithIndex.collectFirst {
      case ((actual, expected), i) if !DataType.equalsIgnoreNullability(actual, expected) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn argument ${i + 1} expects ${expected.simpleString}, got ${actual.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** float-vector → L2-normalized double-vector, one fused primitive loop.
  * Twin of `list_transform(v, x -> x / sqrt(list_dot_product(v, v)))`. */
case class VecNorm(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireTypes(prettyName, child.dataType -> ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val d = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; d(i) = x; ss += x * x; i += 1 }
    val inv = 1.0 / math.sqrt(ss)
    i = 0
    while (i < n) { d(i) *= inv; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val ss = ctx.freshName("ss")
      val inv = ctx.freshName("inv")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $v.numElements();
         |final double[] $d = new double[$n];
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $v.getFloat($i);
         |  $d[$i] = $x; $ss += $x * $x;
         |}
         |final double $inv = 1.0 / java.lang.Math.sqrt($ss);
         |for (int $i = 0; $i < $n; $i++) { $d[$i] *= $inv; }
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($d);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** float-vector → L2 norm (sqrt of the left-to-right sum of squares) —
  * same accumulation order as `aggregate(v, 0D, (a, x) -> a + x * x)`. */
case class VecL2(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireTypes(prettyName, child.dataType -> ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    math.sqrt(ss)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $v.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $v.getFloat($i);
         |  $ss += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($ss);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecL2 =
    copy(child = newChild)
}

/** Dot product of two double-vectors — the per-candidate-pair hot loop.
  * Iterates the LEFT vector's length, like the UDF it replaces. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireTypes(prettyName,
      left.dataType -> ArrayType(DoubleType), right.dataType -> ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = va.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += va.getDouble(i) * vb.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Sign-projection LSH signature: bit j of the result is set when the
  * dot product of the float-vector with fixed ±1 hyperplane j is ≥ 0.
  * Hyperplane weights are md5-hex-digit-parity of the dimension index
  * (`weight(j)(i) = +1 iff hexdigit j of md5(i) is even`) — reproducible
  * in any engine, so the bucket assignment itself is oracle-checkable.
  * Row-local; the weights matrix is one broadcast-once reference object. */
case class VecSig(child: Expression, planes: Int, dims: Int, offset: Int = 0)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireTypes(prettyName, child.dataType -> ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_sig"

  @transient private lazy val w: Array[Array[Double]] =
    VecSig.planeWeights(planes, dims, offset)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var sig = 0L
    var j = 0
    while (j < w.length) {
      val wj = w(j)
      var acc = 0.0
      var i = 0
      while (i < wj.length) { acc += v.getFloat(i).toDouble * wj(i); i += 1 }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planeWeights", w, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val wj = ctx.freshName("wj")
      s"""
         |long $sig = 0L;
         |for (int $j = 0; $j < $planesRef.length; $j++) {
         |  final double[] $wj = $planesRef[$j];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $wj.length; $i++) {
         |    $acc += ((double) $v.getFloat($i)) * $wj[$i];
         |  }
         |  if ($acc >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecSig =
    copy(child = newChild)
}

object VecSig {
  private def md5hex(str: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** weight(j)(i) = +1 when hex digit offset+j of md5(i) is even, else −1.
    * `offset` selects an independent plane family from the same digest —
    * band b of a multi-table LSH index uses offset = b * planes (md5 has
    * 32 hex digits → up to 32/planes independent bands). */
  def planeWeights(planes: Int, dims: Int, offset: Int = 0): Array[Array[Double]] =
    Array.tabulate(planes, dims)((j, i) =>
      if (Integer.parseInt(md5hex(i.toString).substring(offset + j, offset + j + 1), 16) % 2 == 0) 1.0
      else -1.0)
}

/** binary blob → `bins`-dim strided byte-sum feature vector:
  * out[j] = Σ (unsigned byte at position i) for all i ≡ j (mod bins) —
  * ONE pass over the raw bytes. Replaces the interpreted HOF form
  * `transform(sequence(0, bins-1), j -> aggregate(filter(sequence(0,
  * len-1), i -> i % bins = j), 0L, (a, i) -> a + ascii(...)))`, which
  * materializes a boxed `sequence(0, len-1)` PER BIN — O(bins·len)
  * allocation against this kernel's O(len) adds. Values are exact in a
  * long (and far below 2^53, so the downstream array<double> cast is
  * exact too); for pure-ASCII text the unsigned-byte sum equals the
  * per-character `ascii()` sum the oracles replay. */
case class ByteFold(child: Expression, bins: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (bins <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName bins must be > 0, got $bins")
    else VectorExpressions.requireTypes(prettyName, child.dataType -> BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_fold"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Long](bins)
    var i = 0
    var j = 0
    while (i < bytes.length) {
      out(j) += bytes(i) & 0xff
      i += 1; j += 1
      if (j == bins) j = 0
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |final long[] $out = new long[$bins];
         |int $j = 0;
         |for (int $i = 0; $i < $v.length; $i++) {
         |  $out[$j] += ($v[$i] & 0xff);
         |  $j++; if ($j == $bins) $j = 0;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteFold =
    copy(child = newChild)
}
