package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join: for every left row, the latest right row with
  * `rightTs <= leftTs` in the same key group (the standard time-series
  * "most recent quote for each trade" join). Spark has no built-in as-of
  * operator; the naive forms are a range-condition theta join (quadratic
  * per key) or a per-row subquery (not distributed).
  *
  * Composed from existing operators instead (preference (a) of the custom-
  * operator ladder): tag both sides, UNION them, and run ONE keyed window —
  * `last(payload, ignoreNulls)` over rows up to the current one — so each
  * left row picks up the most recent right payload in its key's timeline.
  * Right rows order before left rows at equal timestamps, giving `<=`
  * semantics.
  *
  * Scale: one shuffle of each side on the key + an in-partition sort —
  * identical cost profile to a sort-merge join; no range explosion, state
  * is one payload struct per window frame. Skewed keys split via AQE.
  */
object AsOfJoin {

  /** `left` and `right` must share `keys`; timestamps must be comparable.
    * Right columns other than keys/`rightTs` come back as `<asofPrefix>col`
    * (null where no right row precedes the left row — left-outer shape). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           asofPrefix: String = "asof_"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val keyCols: Seq[Column] = keys.map(col)

    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(s"struct<${payloadCols.map(c =>
          s"`$c`:${right.schema(c).dataType.sql}").mkString(",")}>"))
    val rightTagged = right
      .select((keyCols :+ col(rightTs).as("__ts")) :+
        struct(payloadCols.toIndexedSeq.map(col): _*).as("__payload"): _*)
      .withColumn("__side", lit(0))
    // align columns for the union: right side carries nulls for left cols
    val leftOnly = left.columns.filterNot(c => keys.contains(c))
    val rightAligned = leftOnly.foldLeft(rightTagged)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(leftTagged.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy(keyCols: _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftTagged.unionByName(rightAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = left.columns.map(col) ++
      payloadCols.map(c => col(s"__match.$c").as(s"$asofPrefix$c"))
    matched.select(out.toIndexedSeq: _*)
  }
}
