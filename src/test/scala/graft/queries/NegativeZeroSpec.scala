package graft.queries

import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.{SparkEntry, SparkSpec}

/** No contract query may emit IEEE negative zero in a float column.
  *
  * The driver's correctness gate hashes BIT PATTERNS, and the two engines
  * disagree on the zero's sign exactly at sign crossings: Spark's
  * `round(x, n)` maps a tiny negative to +0.0 where DuckDB maps it to
  * -0.0 (round 12's only red row, `msprt_peek`, was this). Every
  * sign-crossing rounded statistic is therefore normalized with `+ 0.0`
  * on BOTH engines.
  *
  * Scope, stated precisely: Spark's round() goes through BigDecimal and
  * can never emit -0.0 itself, so for round()-based columns the
  * DuckDB-side `+ 0.0` is the operative fix and the Spark-side twin is
  * symmetry/documentation. This spec therefore guards the OTHER
  * Spark-side sources — unrounded aggregates, products, divisions, and
  * codegen expressions, any of which can surface -0.0 directly — by
  * executing every contract query and scanning every double/float cell
  * for the -0.0 bit pattern. The cross-engine class (a DuckDB oracle
  * emitting -0.0 where Spark emits +0.0) is gated by the round cadence's
  * full `tools/compare.py` sweep, which replays every oracle and
  * bit-compares float columns — the local equal of the driver's hash.
  */
class NegativeZeroSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  behavior of "contract query outputs"

  it should "never contain IEEE -0.0 in any double or float column" in {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, dir)
        val floatCols = df.schema.fields.collect {
          case f if f.dataType == DoubleType || f.dataType == FloatType =>
            f.name
        }
        if (floatCols.isEmpty) Nil
        else {
          val rows = df.select(floatCols.map(org.apache.spark.sql.functions.col): _*)
            .collect()
          floatCols.zipWithIndex.collect {
            case (c, i) if rows.exists { r =>
              !r.isNullAt(i) && (r.get(i) match {
                case d: java.lang.Double =>
                  java.lang.Double.doubleToRawLongBits(d) ==
                    java.lang.Double.doubleToRawLongBits(-0.0)
                case f: java.lang.Float =>
                  java.lang.Float.floatToRawIntBits(f) ==
                    java.lang.Float.floatToRawIntBits(-0.0f)
                case _ => false
              })
            } => s"$name.$c"
          }
        }
    }
    withClue("columns emitting -0.0 (normalize with `+ 0.0` on BOTH " +
      "engines): ") { offenders shouldBe empty }
  }
}
