package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  import spark.implicits._

  // three daily "chunks" of an append-only fact stream
  private def chunk(day: Int): DataFrame =
    (1 to 2000).map { i =>
      val user = (i * 31 + day * 7) % 400
      (s"type_${i % 3}", user.toLong, (i % 100) / 10.0)
    }.toDF("event_type", "user_id", "value")

  behavior of "IncrementalAgg"

  it should "fold per-chunk states into exactly the full-batch aggregate" in {
    val chunks = Seq(chunk(1), chunk(2), chunk(3))
    val incremental = IncrementalAgg.finalizeState(
      IncrementalAgg.merge(
        chunks.map(IncrementalAgg.state(_, Seq("event_type"), "value", "user_id")),
        Seq("event_type")))
    val full = IncrementalAgg.finalizeState(
      IncrementalAgg.state(chunks.reduce(_ unionByName _),
        Seq("event_type"), "value", "user_id"))

    val inc = incremental.orderBy("event_type")
      .select("event_type", "n", "sum_v", "min_v", "max_v", "avg_v", "n_distinct")
      .collect()
    val bat = full.orderBy("event_type")
      .select("event_type", "n", "sum_v", "min_v", "max_v", "avg_v", "n_distinct")
      .collect()
    inc.zip(bat).foreach { case (i, b) =>
      i.getString(0) shouldBe b.getString(0)
      i.getLong(1) shouldBe b.getLong(1)          // counts: exact
      i.getDouble(3) shouldBe b.getDouble(3)      // min: exact
      i.getDouble(4) shouldBe b.getDouble(4)      // max: exact
      // float addition reorders across chunks → ulp-level drift only
      i.getDouble(2) shouldBe b.getDouble(2) +- 1e-9
      i.getDouble(5) shouldBe b.getDouble(5) +- 1e-9
      // HLL union is estimate-equivalent within the sketch error band
      // (sparse→dense promotion), not register-identical
      math.abs(i.getLong(6) - b.getLong(6)).toDouble / b.getLong(6) should be < 0.05
    }
  }

  it should "estimate distincts within HLL error of the exact count" in {
    val df = chunk(1)
    val est = IncrementalAgg.finalizeState(
      IncrementalAgg.state(df, Seq("event_type"), "value", "user_id"))
      .select("event_type", "n_distinct").as[(String, Double)].collect().toMap
    val exact = df.groupBy("event_type")
      .agg(countDistinct("user_id").cast("double").as("d"))
      .as[(String, Double)].collect().toMap
    est.keySet shouldBe exact.keySet
    est.foreach { case (k, e) =>
      // lgK=12 → relative standard error ~1.6%; 5% is a safe determinism band
      math.abs(e - exact(k)) / exact(k) should be < 0.05
    }
  }

  it should "keep state size at |keys|, independent of history length" in {
    val merged = IncrementalAgg.merge(
      (1 to 5).map(d => IncrementalAgg.state(chunk(d), Seq("event_type"),
        "value", "user_id")),
      Seq("event_type"))
    merged.count() shouldBe 3L // one row per event_type, not per chunk
  }
}
