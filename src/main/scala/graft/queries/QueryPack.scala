package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries + their DuckDB oracle SQL (driver contract:
  * column names must match between the Spark result and the oracle, and
  * every query orders its output deterministically on a unique key so the
  * row stream is reproducible across engines).
  *
  * Queries without an oracle entry (seeded randomness, ML training, hashing
  * schemes DuckDB can't replicate) get the driver's weaker rows-only check
  * and are covered by ScalaTest specs instead.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
