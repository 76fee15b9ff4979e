package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. At 100 TB these would be
  * partitioned directories; `spark.read.parquet` handles both transparently,
  * and all downstream code treats the result as an ordinary distributed
  * DataFrame (no single-file assumptions anywhere).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as long nanos.
    * Normalize to a proper TimestampType (micros, truncating — same as
    * DuckDB's `CAST(ts AS TIMESTAMP)` from TIMESTAMP_NS). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // naive parquet micros: reinterpret the wall-clock value as UTC
      // regardless of the session timezone. The NTZ→TZ cast yields
      // instant w − offset(sessionTZ); from_utc_timestamp re-adds that
      // offset, so the wall clock lands on the UTC instant under ANY
      // session timezone (to_utc_timestamp would SUBTRACT it again —
      // w − 2·offset under a non-UTC session)
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", from_utc_timestamp(
          col("ts").cast(org.apache.spark.sql.types.TimestampType),
          s.conf.get("spark.sql.session.timeZone")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Per-table loader map — `events` gets its nanos→TimestampType
    * normalization so the SQL view path sees the same schema as the API. */
  def loader(name: String): (SparkSession, String) => DataFrame = name match {
    case "events" => events
    case n        => (s, d) => load(s, d, n)
  }

  /** Register every table as a temp view named after itself — the SQL-view
    * entry path (SURVEY §3.2: Spark SQL is the user-facing query engine). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => loader(n)(spark, dir).createOrReplaceTempView(n))
}
