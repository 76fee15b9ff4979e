package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval join: left rows carry a point (long), right
  * rows an interval `[lo, hi)`; output is every (point, interval) pair with
  * `lo <= p < hi`. Spark plans a raw range predicate as
  * BroadcastNestedLoopJoin (fine only while one side broadcasts) or a
  * cartesian product — a non-starter when both sides are large.
  *
  * Standard bucketization instead: pick a bucket width, give each point its
  * bucket `floor(p / w)`, explode each interval into the buckets it covers,
  * and equi-join on the bucket before the exact range filter. Each matching
  * pair meets in EXACTLY one bucket (the point's), so no distinct is
  * needed. Cost: one shuffle of each side keyed on the bucket; interval
  * explosion factor is `len/w + 1`, so pick `w` near the typical interval
  * length. Skewed buckets (hot time ranges) split via AQE.
  */
object RangeJoin {

  /** `pointCol`, `loCol`, `hiCol` must be long-typed (e.g. `unix_micros`).
    * `width` is a Column so callers can derive it from the data without a
    * driver round-trip — a literal, or a column of the same name present
    * on BOTH inputs (attach via a broadcast cross-join of the stats row);
    * it must evaluate to one constant across all rows. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      width: Column): DataFrame = {
    val p = points.withColumn("__bucket", floor(col(pointCol) / width))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / width), floor((col(hiCol) - 1) / width))))
    p.join(iv, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
