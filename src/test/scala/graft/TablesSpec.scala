package graft

import org.apache.spark.sql.functions._
import java.time.{LocalDateTime, ZoneOffset}

/** `Tables.events` must normalize a naive (NTZ) parquet timestamp to the
  * wall-clock-as-UTC instant under ANY session timezone — the NTZ→TZ cast
  * alone shifts by the session offset, and to_utc_timestamp (the previous
  * code) shifted by it twice. */
class TablesSpec extends SparkSpec {

  behavior of "Tables.events NTZ normalization"

  it should "yield the same instant under UTC and non-UTC session timezones" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-tz").toString
    // write an events.parquet whose ts is genuinely TimestampNTZ
    val wall = "2024-03-01 12:34:56.789123"
    spark.range(1)
      .select(
        to_timestamp_ntz(lit(wall)).as("ts"),
        lit(7L).as("user_id"), lit("view").as("etype"),
        lit(1).as("page"), lit(0.0).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // sanity: the round-trip really is NTZ (otherwise this spec tests nothing)
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType shouldBe
      org.apache.spark.sql.types.TimestampNTZType

    val expectedMicros = LocalDateTime.parse(wall.replace(' ', 'T'))
      .toInstant(ZoneOffset.UTC).toEpochMilli * 1000 + 123

    def instant(): Long =
      Tables.events(spark, dir).select(unix_micros(col("ts"))).head().getLong(0)

    val utcMicros = instant()
    val tzKey = "spark.sql.session.timeZone"
    try {
      spark.conf.set(tzKey, "Asia/Seoul") // +09:00, no DST ambiguity
      instant() shouldBe utcMicros
      spark.conf.set(tzKey, "America/New_York")
      instant() shouldBe utcMicros
    } finally spark.conf.set(tzKey, "UTC")
    utcMicros shouldBe expectedMicros
  }
}
