package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One co-moment accumulator for a whole embedding corpus: n, per-dim
  * Σx / Σx², and the upper-triangle Σxᵢxⱼ cross products. d(d+3)/2 + 1
  * doubles of state regardless of corpus size. */
final case class CorrMoments(n: Long, s: Array[Double],
                             ss: Array[Double], cross: Array[Double])

/** One (i, j) Pearson cell of the finished matrix. */
final case class CorrCell(i: Int, j: Int, corr: Double)

/** Wrapper so the aggregator output stays a Product (Encoders.product). */
final case class CorrPairs(cells: Seq[CorrCell])

/** Single-pass Pearson dimension-correlation over a vector column — the
  * `numeric_corr` co-moment shape generalized to arrays: each input
  * vector folds its outer-product contributions into ONE array-valued
  * partial aggregate (mergeable, O(d²) state), instead of exploding
  * d(d−1)/2 cell rows per vector before a d²-key shuffle. The finished
  * cells apply the SAME co-moment formula and HALF_UP round-6 as the SQL
  * expression this replaces (Spark's `round` is BigDecimal HALF_UP), so
  * oracle hashes are unchanged up to the sum-order ulps round(6) already
  * absorbs. Dimension is taken lazily from the first vector seen. */
final class EmbedCorrMoments
    extends Aggregator[Seq[Float], CorrMoments, CorrPairs] {

  override def zero: CorrMoments =
    CorrMoments(0L, Array.empty, Array.empty, Array.empty)

  override def reduce(b: CorrMoments, v: Seq[Float]): CorrMoments = {
    val d = v.length
    val acc =
      if (b.s.isEmpty)
        CorrMoments(b.n, new Array[Double](d), new Array[Double](d),
          new Array[Double](d * (d - 1) / 2))
      else b
    require(acc.s.length == d,
      s"embed_corr: ragged vector (dim $d vs ${acc.s.length})")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = v(i).toDouble; i += 1 }
    i = 0
    var k = 0
    while (i < d) {
      val xi = x(i)
      acc.s(i) += xi
      acc.ss(i) += xi * xi
      var j = i + 1
      while (j < d) { acc.cross(k) += xi * x(j); j += 1; k += 1 }
      i += 1
    }
    acc.copy(n = acc.n + 1)
  }

  override def merge(a: CorrMoments, b: CorrMoments): CorrMoments =
    if (a.s.isEmpty) b
    else if (b.s.isEmpty) a
    else {
      // reduce() catches ragged dims within a partition; this catches
      // partials of different dims meeting across partitions (else the
      // sums below would throw or silently truncate b's state)
      require(a.s.length == b.s.length,
        s"embed_corr: ragged partials (dim state ${a.s.length} vs ${b.s.length})")
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); a.ss(i) += b.ss(i); i += 1 }
      i = 0
      while (i < a.cross.length) { a.cross(i) += b.cross(i); i += 1 }
      a.copy(n = a.n + b.n)
    }

  override def finish(m: CorrMoments): CorrPairs = {
    val d = m.s.length
    val n = m.n.toDouble
    val cells = Seq.newBuilder[CorrCell]
    var i = 0
    var k = 0
    while (i < d) {
      var j = i + 1
      while (j < d) {
        // identical IEEE evaluation order as the SQL co-moment expression
        val c = (n * m.cross(k) - m.s(i) * m.s(j)) /
          math.sqrt((n * m.ss(i) - m.s(i) * m.s(i)) *
            (n * m.ss(j) - m.s(j) * m.s(j)))
        val r = // Spark `round(x, 6)` passes NaN/Inf through untouched
          if (c.isNaN || c.isInfinite) c
          else BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        cells += CorrCell(i, j, r)
        j += 1; k += 1
      }
      i += 1
    }
    CorrPairs(cells.result())
  }

  override def bufferEncoder: Encoder[CorrMoments] = Encoders.product[CorrMoments]
  override def outputEncoder: Encoder[CorrPairs] = Encoders.product[CorrPairs]
}
