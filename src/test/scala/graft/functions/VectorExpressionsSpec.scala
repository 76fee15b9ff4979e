package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 2.0f)),
    (1L, Array(3.0f, 0.0f, 4.0f)),
    (2L, Array(-1.0f, 1.0f, 0.5f))).toDF("id", "v")

  behavior of "vector expressions"

  it should "normalize to unit L2 with UDF-identical accumulation" in {
    // reference: the exact loop the expression replaced
    val refNorm = udf { (v: Seq[Float]) =>
      val d = new Array[Double](v.length)
      var ss = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; d(i) = x; ss += x * x; i += 1 }
      val inv = 1.0 / math.sqrt(ss)
      i = 0; while (i < v.length) { d(i) *= inv; i += 1 }
      d
    }
    val got = vecs.select(GraftFunctions.vecNorm(col("v")).as("n"),
      refNorm(col("v")).as("r")).collect()
    got.foreach { row =>
      row.getSeq[Double](0) shouldBe row.getSeq[Double](1) // bit-identical
    }
    val norms = vecs.select(GraftFunctions.vecL2(GraftFunctions.vecNorm(col("v"))
      .cast("array<float>"))).as[Double].collect()
    all(norms) shouldBe 1.0 +- 1e-6
  }

  it should "compute dot products and L2 norms" in {
    val d = vecs.filter(col("id") === 1)
      .select(GraftFunctions.vecL2(col("v"))).as[Double].head()
    d shouldBe 5.0 +- 1e-12 // 3-4-5 triangle
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .as[Double].head()
    dot shouldBe 32.0
  }

  it should "be callable from SQL text (SparkSessionExtensions registration)" in {
    vecs.createOrReplaceTempView("vecs_t")
    val out = spark.sql(
      "SELECT id, vec_sig(v, 4, 3) AS sig, vec_l2(v) AS l2 FROM vecs_t ORDER BY id")
      .collect()
    out should have length 3
    // signature is a 4-bit bucket id
    all(out.map(_.getLong(1))) should (be >= 0L and be < 16L)
  }

  it should "produce identical results interpreted and codegen'd" in {
    val w = VecSig.planeWeights(4, 3)
    // interpreted reference: same math in plain Scala
    def refSig(v: Array[Float]): Long = {
      var sig = 0L
      for (j <- w.indices) {
        var acc = 0.0
        for (i <- w(j).indices) acc += v(i).toDouble * w(j)(i)
        if (acc >= 0) sig |= (1L << j)
      }
      sig
    }
    val rows = vecs.select(col("id"),
      GraftFunctions.vecSig(col("v"), 4, 3).as("sig")).collect()
    val input = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach(r => r.getLong(1) shouldBe refSig(input(r.getLong(0))))
  }

  it should "handle null vectors" in {
    val withNull = Seq((0L, Some(Array(1.0f, 0.0f))), (1L, None))
      .toDF("id", "v")
    val out = withNull.select(GraftFunctions.vecNorm(col("v")),
      GraftFunctions.vecL2(col("v"))).collect()
    out(1).isNullAt(0) shouldBe true
    out(1).isNullAt(1) shouldBe true
  }

  behavior of "ByteFold"

  it should "match the interpreted HOF strided byte-sum exactly (incl. empty and null)" in {
    val docs = Seq(
      (1L, Some("hello world, this is a byte fold test string")),
      (2L, Some("x")), (3L, Some("")), (4L, None))
      .toDF("id", "t")
      .withColumn("b", col("t").cast("binary"))
    val out = docs.select(col("id"),
      GraftFunctions.byteFold(col("b"), 4).as("fv")).collect()
    def ref(s: String): Seq[Long] = {
      val bins = Array.fill(4)(0L)
      s.getBytes("UTF-8").zipWithIndex.foreach { case (b, i) =>
        bins(i % 4) += b & 0xff }
      bins.toSeq
    }
    out(0).getSeq[Long](1) shouldBe ref("hello world, this is a byte fold test string")
    out(1).getSeq[Long](1) shouldBe ref("x")
    out(2).getSeq[Long](1) shouldBe Seq(0L, 0L, 0L, 0L)
    out(3).isNullAt(1) shouldBe true
  }

  it should "equal the ascii()-per-character oracle form it replaces on ASCII text" in {
    val docs = Seq((1L, "The quick brown fox jumps over the lazy dog 0123456789"))
      .toDF("id", "t")
    val native = docs
      .select(GraftFunctions.byteFold(col("t").cast("binary"), 16).as("fv"))
      .collect()(0).getSeq[Long](0)
    val hof = docs.selectExpr(
      """transform(sequence(0, 15), j ->
        |  aggregate(filter(sequence(0, length(t) - 1), i -> i % 16 = j),
        |    0L, (acc, i) -> acc + ascii(substring(t, i + 1, 1)))) AS fv"""
        .stripMargin).collect()(0).getSeq[Long](0)
    native shouldBe hof
  }
}
