package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout for multi-dimensional data skipping.
  *
  * Parquet scans prune files/row-groups by min/max statistics. A layout
  * sorted on ONE column gives perfect pruning on that column and none on
  * any other; interleaving the bits of k columns into one Morton key and
  * range-partitioning + sorting on it gives every file a small bounding
  * box in ALL k dimensions, so a selective filter on ANY of them (or a box
  * on several) skips most files. This is the standard lakehouse technique
  * (Delta/Iceberg `ZORDER BY`) expressed with stock Spark operators:
  * scale each column to a `bits`-wide integer via a min/max probe (one
  * tiny agg job), interleave bits with codegen-friendly shift/mask
  * expressions, then `repartitionByRange` + `sortWithinPartitions` on the
  * key — the same two-stage parallel sort a distributed ORDER BY uses, so
  * the layout job is shuffle-once and partition-parallel at any scale.
  *
  * Reference scope note: the reference engine has no storage-layout
  * operator; this is part of the beyond-the-reference 100 TB surface
  * (see SURVEY §8 "Beyond the reference").
  */
object ZOrderLayout {

  /** Interleaves the low `bits` bits of `cols` (non-negative longs) into
    * one Morton key: bit `i` of column `ci` lands at position
    * `i * k + ci`. Pure shift/mask expression tree — whole-stage codegen,
    * no UDF. */
  def mortonKey(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "mortonKey needs at least one column")
    require(k * bits <= 63, s"$k cols x $bits bits exceeds a long")
    cols.zipWithIndex.map { case (c, ci) =>
      (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
        acc.bitwiseOR(shiftleft(
          shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * k + ci))
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Linearly rescales a numeric column from its observed [lo, hi] range
    * onto the integer grid [0, 2^bits). */
  def gridScale(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = (1L << bits) - 1
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(lit(cells), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * cells).cast("long")))
  }

  /** Returns `df` re-laid-out on the Z-curve over `zCols`: range-
    * partitioned into `outParts` write tasks and sorted within each, so a
    * `df.write.parquet` of the result produces files with tight min/max
    * boxes in every `zCols` dimension. The min/max probe is one small agg
    * (2k doubles to the driver). */
  def layout(df: DataFrame, zCols: Seq[String], outParts: Int,
             bits: Int = 12): DataFrame = {
    require(!df.columns.contains("__z"),
      "layout() uses a scratch column named __z; rename the existing one")
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val ranges = zCols.indices.map { i =>
      require(!stats.isNullAt(2 * i),
        s"z-column '${zCols(i)}' has no non-null values to probe " +
          "(empty input or all-null column)")
      (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
    }
    val gridded = zCols.zip(ranges).map { case (c, (lo, hi)) =>
      gridScale(col(c), lo, hi, bits)
    }
    df.withColumn("__z", mortonKey(gridded, bits))
      .repartitionByRange(outParts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
