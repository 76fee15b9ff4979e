package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Long) = new Timestamp(minutes * 60 * 1000)

  behavior of "StreamOps"

  it should "count events per tumbling window across micro-batches" in {
    val in = MemoryStream[Event]
    val q = StreamOps.windowedEventCounts(in.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      in.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(2), 10, "click", 1.0),
        Event(3, ts(12), 11, "view", 1.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(3), 12, "click", 1.0)) // same window as 1,2
      q.processAllAvailable()
      val out = spark.table("win_counts")
        .groupBy("window_start", "event_type")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .as[(Timestamp, String, Long)].collect().toSet
      out should contain ((ts(0), "click", 3L))
      out should contain ((ts(10), "view", 1L))
    } finally q.stop()
  }

  it should "sessionize a keyed stream with gap semantics matching the batch twin" in {
    val gapUs = 10L * 60 * 1000000 // 10 min
    val in = MemoryStream[Event]
    val q = StreamOps.sessionize(in.toDS(), gapUs, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      in.addData(
        Event(1, ts(1), 7, "view", 1.0),
        Event(2, ts(5), 7, "click", 1.0)) // same session
      q.processAllAvailable()
      in.addData(
        Event(3, ts(8), 7, "click", 1.0),  // still session 1 (3 min gap)
        Event(4, ts(30), 7, "view", 1.0))  // 22 min gap → session 2
      q.processAllAvailable()
      val latest = spark.table("sessions")
        .groupBy("user_id", "session_seq")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"),
          org.apache.spark.sql.functions.min("first_event").as("fe"))
        .as[(Long, Long, Long, Long)].collect().toSet
      latest should contain ((7L, 1L, 3L, 1L)) // events 1,2,3
      latest should contain ((7L, 2L, 1L, 4L)) // event 4
    } finally q.stop()
  }

  it should "evict an idle user's session state once the watermark passes the gap" in {
    val gapUs = 10L * 60 * 1000000 // 10 min
    val in = MemoryStream[Event]
    val q = StreamOps.sessionize(in.toDS(), gapUs, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions_evict")
      .outputMode("update").start()
    try {
      in.addData(
        Event(1, ts(1), 7, "view", 1.0),
        Event(2, ts(5), 7, "click", 1.0),
        Event(3, ts(8), 7, "click", 1.0)) // user 7 session 1 (3 events)
      q.processAllAvailable()
      in.addData(Event(4, ts(30), 7, "view", 1.0)) // 22 min gap → session 2
      q.processAllAvailable()
      // park another user far ahead: the watermark (99 min) passes user
      // 7's 30min+gap timeout on the NEXT batch's timeout pass
      in.addData(Event(5, ts(100), 8, "view", 1.0)); q.processAllAvailable()
      in.addData(Event(6, ts(101), 8, "view", 1.0)); q.processAllAvailable()
      // user 7 timed out: final idempotent emission, state removed —
      // only user 8 remains in the store
      q.lastProgress.stateOperators.head.numRowsTotal shouldBe 1L
      // a returning user starts a fresh era (seq restarts at 1) …
      in.addData(Event(7, ts(102), 7, "view", 1.0)); q.processAllAvailable()
      // … and the emitted session CONTENT still equals the batch twin's
      // on full replay: sessions identified by (user_id, first_event)
      val latest = spark.table("sessions_evict")
        .groupBy("user_id", "first_event")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .as[(Long, Long, Long)].collect().toSet
      latest shouldBe Set(
        (7L, 1L, 3L),  // era 1 session 1: events 1,2,3
        (7L, 4L, 1L),  // era 1 session 2: event 4 (re-emitted at eviction)
        (7L, 7L, 1L),  // era 2 session 1: event 7
        (8L, 5L, 2L))  // user 8: events 5,6
      // era restart pinned: the post-eviction session carries seq 1
      spark.table("sessions_evict")
        .filter("user_id = 7 AND first_event = 7")
        .select("session_seq").as[Long].collect().head shouldBe 1L
    } finally q.stop()
  }

  it should "compress state runs across micro-batches like the batch SCD2 twin" in {
    val in = MemoryStream[Event]
    val q = StreamOps.stateChanges(in.toDS())
      .writeStream.format("memory").queryName("state_changes")
      .outputMode("append").start()
    try {
      in.addData(
        Event(1, ts(0), 7, "view", 1.0),
        Event(2, ts(1), 7, "view", 1.0),   // same state → suppressed
        Event(3, ts(2), 7, "click", 1.0))  // change → emitted
      q.processAllAvailable()
      in.addData(
        Event(4, ts(3), 7, "click", 1.0),  // run continues ACROSS batches
        Event(5, ts(4), 7, "view", 1.0),   // change → emitted
        Event(6, ts(0), 9, "view", 1.0))   // other user's first state
      q.processAllAvailable()
      val changes = spark.table("state_changes")
        .as[StateChange].collect().map(c => (c.user_id, c.state, c.event_id)).toSet
      changes shouldBe Set(
        (7L, "view", 1L), (7L, "click", 3L), (7L, "view", 5L),
        (9L, "view", 6L))
    } finally q.stop()
  }

  it should "emit finalized session windows once the watermark passes them" in {
    val in = MemoryStream[Event]
    val q = StreamOps.sessionWindowStats(in.toDF(),
        gap = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("session_windows")
      .outputMode("append").start()
    try {
      in.addData(
        Event(1, ts(1), 7, "view", 1.0),
        Event(2, ts(6), 7, "click", 2.0)) // same session (5 min gap)
      q.processAllAvailable()
      // push the watermark far past the session end, then one more batch
      // so the closed window is finalized and emitted
      in.addData(Event(3, ts(60), 8, "view", 1.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(61), 8, "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("session_windows")
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      // user 7: events at 1 and 6 min merge into [1, 16) — gap extends the
      // window end to last-event + gap
      out shouldBe Set((7L, ts(1), ts(16), 2L, 3.0))
    } finally q.stop()
  }

  it should "alert each user at most once on the first qualifying event" in {
    val in = MemoryStream[Event]
    val q = StreamOps.hotleadAlerts(in.toDS(), threshold = 0.8)
      .writeStream.format("memory").queryName("alerts")
      .outputMode("update").start()
    try {
      in.addData(
        Event(1, ts(0), 7, "view", 0.2),
        Event(2, ts(1), 7, "click", 0.9), // first qualifying for user 7
        Event(3, ts(2), 8, "view", 0.5))
      q.processAllAvailable()
      in.addData(
        Event(4, ts(3), 7, "click", 0.95), // user 7 already alerted → nothing
        Event(5, ts(4), 8, "click", 0.85)) // first qualifying for user 8
      q.processAllAvailable()
      val alerts = spark.table("alerts")
        .as[HotleadAlert].collect().map(a => a.user_id -> a.event_id).toSet
      alerts shouldBe Set(7L -> 2L, 8L -> 5L)
    } finally q.stop()
  }

  it should "attribute purchases to preceding clicks within the horizon" in {
    // offset from epoch 0: the initial watermark clamps at 0, so a row AT
    // exactly epoch 0 would be dropped as late — a test-data pathology,
    // not a property of the operator
    def t(minutes: Long) = ts(100000 + minutes)
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.clickAttribution(
        clicks.toDF(), purchases.toDF(), horizonMinutes = 10)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(1, t(0), 7, "click", 1.0),
        Event(2, t(25), 7, "click", 1.0),
        Event(3, t(0), 8, "click", 1.0))
      purchases.addData(
        Event(10, t(5), 7, "purchase", 9.0),   // within 10m of click 1
        Event(11, t(30), 7, "purchase", 9.0),  // within 10m of click 2 only
        Event(12, t(40), 8, "purchase", 9.0))  // 40m after click 3 → none
      q.processAllAvailable()
      val pairs = spark.table("attrib")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      pairs shouldBe Set(10L -> 1L, 11L -> 2L)
    } finally q.stop()
  }

  it should "dedup a stream by content hash keeping the first occurrence" in {
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.dedupByContent(
        in.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData((1L, "Hello World"), (2L, "  hello world "), (3L, "other"))
      q.processAllAvailable()
      in.addData((4L, "HELLO WORLD"), (5L, "fresh"))
      q.processAllAvailable()
      val kept = spark.table("dedup").select("doc_id").as[Long].collect().toSet
      kept shouldBe Set(1L, 3L, 5L) // 2, 4 are dups of 1 after normalization
    } finally q.stop()
  }

  it should "dedup re-sends with new timestamps inside the watermark horizon" in {
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.dedupWithinWatermark(
        in.toDF().toDF("doc_id", "ts", "text"), "text", "ts",
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts(100000), "Hello World"),
        (2L, ts(100001), "  hello world "), // dup, new ts → still dropped
        (3L, ts(100002), "other"))
      q.processAllAvailable()
      in.addData((4L, ts(100003), "HELLO WORLD"), (5L, ts(100004), "fresh"))
      q.processAllAvailable()
      val kept = spark.table("dedup_wm").select("doc_id").as[Long].collect().toSet
      kept shouldBe Set(1L, 3L, 5L)
    } finally q.stop()
  }

  it should "compose the ingest chain: watermark dedup then a row-local quality gate" in {
    import org.apache.spark.sql.functions.{col, split}
    val in = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamOps.dedupWithinWatermark(
      in.toDF().toDF("doc_id", "ts", "text"), "text", "ts",
      watermark = "10 minutes")
    // the same row-local gate the batch corpus chain applies (token_bounds)
    val gated = deduped.filter(
      org.apache.spark.sql.functions.size(split(col("text"), "\\s+"))
        .between(2, 100))
    val q = gated.writeStream.format("memory").queryName("ingest_chain")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts(100000), "good doc here"),
        (2L, ts(100001), "good doc here"), // dup of 1 -> dropped
        (3L, ts(100002), "short"),         // 1 token -> gated out
        (4L, ts(100003), "another keeper"))
      q.processAllAvailable()
      val kept = spark.table("ingest_chain").select("doc_id").as[Long]
        .collect().toSet
      kept shouldBe Set(1L, 4L)
    } finally q.stop()
  }

  it should "materialize latest-by-key upserts matching the batch compaction" in {
    val in = MemoryStream[Event]
    val q = StreamOps.latestByKey(in.toDS())
      .writeStream.format("memory").queryName("latest")
      .outputMode("update").start()
    try {
      in.addData(
        Event(1, ts(5), 7, "view", 0.1),
        Event(2, ts(9), 7, "click", 0.2), // latest for 7 so far
        Event(3, ts(1), 8, "view", 0.3))
      q.processAllAvailable()
      in.addData(
        Event(4, ts(2), 7, "view", 0.4),      // older than event 2 → ignored
        Event(5, ts(1), 8, "purchase", 0.5))  // same ts as 3, higher id → wins
      q.processAllAvailable()
      // Update sink semantics: last row per key is the materialized state
      val latest = spark.table("latest")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct("us", "last_event", "last_type"))
          .as("r"))
        .select("user_id", "r.last_event", "r.last_type")
        .as[(Long, Long, String)].collect().toSet
      latest shouldBe Set((7L, 2L, "click"), (8L, 5L, "purchase"))
    } finally q.stop()
  }

  it should "enrich a stream against a static dim with a broadcast join" in {
    val dim = Seq((7L, "gold"), (8L, "trial")).toDF("user_id", "segment")
    val in = MemoryStream[Event]
    val enriched = StreamOps.enrichWithDim(in.toDF(), dim, "user_id")
    val q = enriched
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData(
        Event(1, ts(0), 7, "view", 1.0),
        Event(2, ts(1), 9, "click", 1.0)) // no dim row → null segment
      q.processAllAvailable()
      val out = spark.table("enriched")
        .select("event_id", "segment").as[(Long, Option[String])]
        .collect().toMap
      out shouldBe Map(1L -> Some("gold"), 2L -> None)
    } finally q.stop()
  }

  it should "probe a doc stream against the static LSH index like the batch incr twin" in {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val index = StreamOps.nearDupIndex(
      docs.filter($"doc_id" < 400), "doc_id", "text")
    val newDocs = docs.filter($"doc_id" >= 400)
      .as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.nearDupProbe(
        in.toDF().toDF("doc_id", "text"), index, "doc_id", "text")
      .writeStream.format("memory").queryName("neardup_probe")
      .outputMode("append").start()
    try {
      // deliver the new batch across TWO micro-batches — collisions must
      // not depend on batch boundaries (each doc meets the index alone)
      val (b1, b2) = newDocs.splitAt(newDocs.length / 2)
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("neardup_probe")
        .as[(Long, Long, Double)].collect().sorted
      val batch = graft.queries.LlmData.dedupMinhashIncr(spark, dir)
        .as[(Long, Long, Double)].collect().sorted
      streamed should not be empty
      streamed shouldBe batch
    } finally q.stop()
  }

  it should "run the row-local corpus gates unchanged on a streaming ingest" in {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import spark.implicits._
    import graft.config.{CorpusConf, CorpusStepConf}
    // the row-local subset of the cleaning chain (filters + in-place
    // rewrites — no join, no agg) is legal on an unbounded stream as-is;
    // the dedup/mix steps need their streaming twins (nearDupProbe etc.)
    val steps = Seq(
      CorpusStepConf(op = "lang_filter", keepLangs = Seq("en", "de")),
      CorpusStepConf(op = "token_bounds", minTokens = 10, maxTokens = 10000),
      CorpusStepConf(op = "normalize"),
      CorpusStepConf(op = "pii_scrub", pairs = Seq(Seq("[0-9]+", "_num"))),
      CorpusStepConf(op = "quality_gate", minTokens = 10, maxTokens = 10000))
    val cc = CorpusConf(steps = steps)
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val batch = steps.foldLeft(docs)((d, st) =>
        graft.CorpusRunner.applyStep(d, st, cc))
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rows = docs.as[(Long, String, String, String, Long)].collect()
    val in = MemoryStream[(Long, String, String, String, Long)]
    val streamDocs: org.apache.spark.sql.DataFrame =
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val cleaned = steps.foldLeft(streamDocs)(
        (d, st) => graft.CorpusRunner.applyStep(d, st, cc))
      .select("doc_id", "text")
    val q = cleaned.writeStream.format("memory").queryName("gates_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("gates_stream")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      streamed should not be empty
      streamed shouldBe batch
    } finally q.stop()
  }

  it should "score a doc stream with a batch-fitted quality model statelessly" in {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    import spark.implicits._
    // trusted slice speaks a disjoint vocabulary → separable by construction
    val trusted = (0 until 20)
      .map(i => (20000L + i, s"alpha beta gamma delta epsilon zeta $i", "trusted"))
      .toDF("doc_id", "text", "source")
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text", "source").unionByName(trusted).cache()
    val model = graft.text.QualityModel
      .fit(docs, "text", "source", Seq("trusted"))
    val batch = graft.text.QualityModel.scoreAll(model, docs, "text")
      .select("doc_id", "quality_p")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    // scoring is row-local (Tokenizer→HashingTF→LR transform): legal in a
    // stateless streaming projection — train once, score the ingest forever
    val q = graft.text.QualityModel
      .scoreAll(model, in.toDF().toDF("doc_id", "text"), "text")
      .select("doc_id", "quality_p")
      .writeStream.format("memory").queryName("qm_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("qm_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      streamed shouldBe batch
    } finally q.stop()
  }

  it should "bound the probe's pair-dedup state with a watermark when given an event time" in {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val index = StreamOps.nearDupIndex(
      docs.filter($"doc_id" < 400), "doc_id", "text")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val newDocs = docs.filter($"doc_id" >= 400)
      .as[(Long, String)].collect().map { case (id, tx) => (id, tx, t0) }
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val probed = StreamOps.nearDupProbe(
      in.toDF().toDF("doc_id", "text", "ts"), index, "doc_id", "text",
      eventTimeCol = Some("ts"), watermarkDelay = "10 minutes")
    // the continuous-ingest path must carry an event-time watermark so
    // dropDuplicatesWithinWatermark can evict verified-pair state
    probed.queryExecution.analyzed.toString should include("EventTimeWatermark")
    val q = probed.writeStream.format("memory").queryName("neardup_probe_wm")
      .outputMode("append").start()
    try {
      val (b1, b2) = newDocs.splitAt(newDocs.length / 2)
      in.addData(b1.toIndexedSeq); q.processAllAvailable()
      in.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("neardup_probe_wm")
        .as[(Long, Long, Double)].collect().sorted
      val batch = graft.queries.LlmData.dedupMinhashIncr(spark, dir)
        .as[(Long, Long, Double)].collect().sorted
      streamed should not be empty
      streamed shouldBe batch
    } finally q.stop()
  }

  it should "advance a streaming funnel equal to the batch funnel on an in-order replay" in {
    // u1 completes all stages; u2 does the 2nd stage BEFORE the 1st (the
    // strict-order trap — must not count); u3 stops after stage 1; u4
    // starts at stage 2 with no stage-1 event (never counted); u1's last
    // stage arrives in a LATER micro-batch than its earlier stages.
    val stages = Seq("view", "click", "purchase")
    val batch1 = Seq(
      Event(1, ts(0), 1, "view", 1.0), Event(2, ts(1), 1, "click", 1.0),
      Event(3, ts(0), 2, "click", 1.0), Event(4, ts(1), 2, "view", 1.0),
      Event(5, ts(0), 3, "view", 1.0),
      Event(6, ts(0), 4, "click", 1.0))
    val batch2 = Seq(
      Event(7, ts(2), 1, "purchase", 5.0),
      Event(8, ts(2), 2, "click", 1.0),   // now AFTER u2's view → counts
      Event(9, ts(3), 4, "purchase", 2.0)) // still no view → not counted
    val in = MemoryStream[Event]
    val q = StreamOps.funnelAdvances(in.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("funnel_adv")
        .groupBy("stage_idx").count()
        .as[(Int, Long)].collect().toMap
      val batchRow = graft.queries.EventOpsPack
        .funnelStepsOf((batch1 ++ batch2).toDF(), stages).collect().head
      streamed.getOrElse(0, 0L) shouldBe batchRow.getLong(0)
      streamed.getOrElse(1, 0L) shouldBe batchRow.getLong(1)
      streamed.getOrElse(2, 0L) shouldBe batchRow.getLong(2)
      // each user advances each stage at most once across ALL batches
      spark.table("funnel_adv").groupBy("user_id", "stage_idx").count()
        .filter(org.apache.spark.sql.functions.col("count") > 1)
        .count() shouldBe 0L
    } finally q.stop()
  }

  it should "advance a WINDOWED streaming funnel equal to the batch chain DP across micro-batches" in {
    // the batch spec's late-re-anchor corpus, cut mid-chain (shifted +1
    // min off epoch 0 — the initial watermark drops rows AT 0): u1 (a@1,
    // b@6, b@10, c@17, W=10min) converts to depth 2 only; u2 adds a@9 —
    // the a@9→b@10→c@17 chain spans 8min and must be found even though
    // a@9/b@10 arrive a micro-batch before c@17 (state carries the DP);
    // u3's same-timestamp a/b pair must never chain.
    val stages = Seq("a", "b", "c")
    val winUs = 10L * 60 * 1000000L
    val batch1 = Seq(
      Event(1, ts(1), 1, "a", 0.0), Event(2, ts(6), 1, "b", 0.0),
      Event(3, ts(1), 2, "a", 0.0), Event(4, ts(6), 2, "b", 0.0),
      Event(5, ts(9), 2, "a", 0.0),
      Event(6, ts(6), 3, "a", 0.0), Event(7, ts(6), 3, "b", 0.0))
    val batch2 = Seq(
      Event(8, ts(10), 1, "b", 0.0), Event(9, ts(17), 1, "c", 0.0),
      Event(10, ts(10), 2, "b", 0.0), Event(11, ts(17), 2, "c", 0.0))
    val in = MemoryStream[Event]
    val q = StreamOps.windowedFunnelAdvances(in.toDS(), stages, winUs)
      .writeStream.format("memory").queryName("funnel_win_adv")
      .outputMode("append").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("funnel_win_adv")
        .groupBy("stage_idx").count()
        .as[(Int, Long)].collect().toMap
      val batchRow = graft.queries.EventOpsPack
        .funnelWindowedOf((batch1 ++ batch2).toDF(), stages, winUs)
        .collect().head
      streamed.getOrElse(0, 0L) shouldBe batchRow.getLong(0) // 3 users
      streamed.getOrElse(1, 0L) shouldBe batchRow.getLong(1) // u1, u2
      streamed.getOrElse(2, 0L) shouldBe batchRow.getLong(2) // u2 only
      streamed.getOrElse(2, 0L) shouldBe 1L // pin the late re-anchor case
      // each user advances each depth at most once across ALL batches
      spark.table("funnel_win_adv").groupBy("user_id", "stage_idx").count()
        .filter(org.apache.spark.sql.functions.col("count") > 1)
        .count() shouldBe 0L
    } finally q.stop()
  }

  it should "drop cross-batch late events rather than emit false windowed advances" in {
    // batch 1: a@1, b@21, a@31 — the a@31 rolls the strict-earlier buffer
    // forward to include the (start=1, last=21) depth-2 chain. A LATE
    // c@11 arriving in batch 2 must NOT chain onto it (the real order
    // a@1, c@11, b@21 has no a→b→c chain): late events are dropped, and
    // a subsequent in-order c@41 still converts within the window.
    val stages = Seq("a", "b", "c")
    val winUs = 100L * 60 * 1000000L
    val in = MemoryStream[Event]
    val q = StreamOps.windowedFunnelAdvances(in.toDS(), stages, winUs)
      .writeStream.format("memory").queryName("funnel_win_late")
      .outputMode("append").start()
    try {
      in.addData(Event(1, ts(1), 1, "a", 0.0), Event(2, ts(21), 1, "b", 0.0),
        Event(3, ts(31), 1, "a", 0.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(11), 1, "c", 0.0)) // LATE: must be dropped
      q.processAllAvailable()
      spark.table("funnel_win_late").filter("stage_idx = 2")
        .count() shouldBe 0L
      in.addData(Event(5, ts(41), 1, "c", 0.0)) // in-order: converts
      q.processAllAvailable()
      spark.table("funnel_win_late").filter("stage_idx = 2")
        .count() shouldBe 1L
    } finally q.stop()
  }

  it should "evict lapsed funnel state without ever re-emitting an advance" in {
    val stages = Seq("a", "b", "c")
    val winUs = 10L * 60 * 1000000L
    val in = MemoryStream[Event]
    val q = StreamOps.windowedFunnelAdvances(in.toDS(), stages, winUs,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("funnel_win_evict")
      .outputMode("append").start()
    try {
      in.addData(
        Event(1, ts(1), 1, "a", 0.0),  // u1 advances depth 0 (emitted=1)
        Event(2, ts(1), 2, "b", 0.0),  // u2: cursor state, no advance
        Event(3, ts(1), 3, "x", 0.0))  // u3: no stage event → NO state
      q.processAllAvailable()
      // push the watermark far past both users' curTs + window …
      in.addData(Event(4, ts(100), 4, "a", 0.0)); q.processAllAvailable()
      in.addData(Event(5, ts(101), 4, "a", 0.0)); q.processAllAvailable()
      // … timeout pass: u2 (never advanced) is REMOVED, u1 keeps only the
      // compact emitted-marker, u3 never existed → u1 + u4 remain
      q.lastProgress.stateOperators.head.numRowsTotal shouldBe 2L
      // a returning u1 must NOT re-emit depth 0 (append can't retract) —
      // but a fresh in-window chain still advances it to depth 1
      in.addData(Event(6, ts(102), 1, "a", 0.0),
        Event(7, ts(103), 1, "b", 0.0))
      q.processAllAvailable()
      val byStage = spark.table("funnel_win_evict")
        .filter("user_id = 1").groupBy("stage_idx").count()
        .as[(Int, Long)].collect().toMap
      byStage shouldBe Map(0 -> 1L, 1 -> 1L)
    } finally q.stop()
  }

  it should "credit streaming purchases to the first touch equal to the batch attribution" in {
    val batch1 = Seq(
      Event(1, ts(0), 1, "view", 0.0), Event(2, ts(1), 1, "purchase", 10.0),
      Event(3, ts(0), 2, "click", 0.0),
      Event(4, ts(0), 3, "purchase", 7.0)) // purchase IS the first touch
    val batch2 = Seq(
      Event(5, ts(2), 1, "purchase", 5.0), // still credited to "view"
      Event(6, ts(1), 2, "purchase", 3.0),
      Event(7, ts(1), 3, "view", 0.0))
    val in = MemoryStream[Event]
    val q = StreamOps.firstTouchAttributions(in.toDS())
      .writeStream.format("memory").queryName("first_touch_attr")
      .outputMode("append").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("first_touch_attr")
        .groupBy("first_touch")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.sum("value"), 2).as("rev"))
        .as[(String, Long, Double)].collect().toSet
      // batch twin computed directly: rn=1 first touch per user → join
      val all = (batch1 ++ batch2).toDF()
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        .orderBy(org.apache.spark.sql.functions.col("ts").asc,
          org.apache.spark.sql.functions.col("event_id").asc)
      val first = all
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter("rn = 1").select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type").as("first_touch"))
      val batch = all.filter("event_type = 'purchase'")
        .join(first, "user_id").groupBy("first_touch")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.sum("value"), 2).as("rev"))
        .as[(String, Long, Double)].collect().toSet
      streamed shouldBe batch
      streamed.map(_._1) should contain allOf ("view", "click", "purchase")
    } finally q.stop()
  }

  behavior of "ewmaSmooth"

  it should "equal the batch bounded-window EWMA across a micro-batch split" in {
    import org.apache.spark.sql.functions.{abs => fabs, col}
    // u1 has 13 events (crosses the 10-row window so the ring drops
    // history); u2 has 2; the split lands mid-window for u1.
    val evs = (1 to 13).map(i =>
      Event(i.toLong, ts(i.toLong), 1, "view", i * 1.7)) ++
      Seq(Event(20, ts(1), 2, "view", 10.0), Event(21, ts(2), 2, "click", 4.0))
    val (batch1, batch2) = evs.splitAt(7)
    val in = MemoryStream[Event]
    val q = StreamOps.ewmaSmooth(in.toDS())
      .writeStream.format("memory").queryName("ewma_pts")
      .outputMode("append").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("ewma_pts")
        .select("user_id", "rn", "event_id", "ewma")
      val batch = graft.queries.AnalyticsPack.ewmaSmoothOf(
        evs.toDF().withColumn("us",
          org.apache.spark.sql.functions.unix_micros(col("ts"))))
      batch.count() shouldBe evs.length.toLong
      streamed.count() shouldBe evs.length.toLong
      // every (user, rn) point matches to within float-sum-order noise
      val joined = streamed.withColumnRenamed("ewma", "se")
        .join(batch, Seq("user_id", "rn", "event_id"))
      joined.count() shouldBe evs.length.toLong
      joined.filter(fabs(col("se") - col("ewma")) > 1e-9).count() shouldBe 0L
    } finally q.stop()
  }

  behavior of "cusumAlerts"

  it should "equal the batch CUSUM alert set across a micro-batch split" in {
    import org.apache.spark.sql.functions.{col, unix_micros}
    // user 1 drifts upward from event 8 on (sustained +shift the point
    // detector in rollingZscore would NOT flag); user 2 stays flat
    val calm = (1 to 7).map(i =>
      Event(i.toLong, ts(i.toLong), 1, "view", 10.0 + (i % 2)))
    val drift = (8 to 20).map(i =>
      Event(i.toLong, ts(i.toLong), 1, "view", 40.0 + (i % 3)))
    val u2 = (30 to 40).map(i =>
      Event(i.toLong, ts(i.toLong), 2, "view", 10.5))
    val evs = calm ++ drift ++ u2
    // control parameters from the full reference set, rounded exactly as
    // the batch op rounds its global moments
    val df = evs.toDF().withColumn("us", unix_micros(col("ts")))
    val stats = df.agg(
      org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.avg("value").plus(
          org.apache.spark.sql.functions.lit(0.5).multiply(
            org.apache.spark.sql.functions.stddev_samp(col("value")))), 6)
        .as("mk"),
      org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.stddev_samp(col("value")), 6).as("sd"))
      .head()
    val (mk, sd) = (stats.getDouble(0), stats.getDouble(1))

    val (b1, b2) = evs.splitAt(12) // split lands mid-drift for user 1
    val in = MemoryStream[Event]
    val q = StreamOps.cusumAlerts(in.toDS(), mk, sd)
      .writeStream.format("memory").queryName("cusum_alerts")
      .outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("cusum_alerts")
        .select("user_id", "rn", "event_id", "cusum")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = graft.queries.AnalyticsPack.cusumAlertsOf(df)
        .as[(Long, Long, Long, Double)].collect().toSet
      batch should not be empty
      streamed shouldBe batch
      // the drift is sustained, so alerts persist once fired
      streamed.map(_._1) should contain (1L)
      streamed.map(_._1) should not contain 2L
    } finally q.stop()
  }

  behavior of "cmsCounters"

  it should "converge to the batch sketch grid across micro-batches" in {
    // skewed keys: user 1 dominates, users 2-5 trail
    val evs = (1 to 30).map(i => Event(i.toLong, ts(i.toLong), 1, "view", 1.0)) ++
      (31 to 42).map(i => Event(i.toLong, ts(i.toLong), (i % 4 + 2).toLong, "view", 1.0))
    val (b1, b2) = evs.splitAt(17)
    val in = MemoryStream[Event]
    val q = StreamOps.cmsCounters(in.toDS(), width = 64)
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("cms_cells")
        .groupBy("row", "bucket")
        .agg(org.apache.spark.sql.functions.max("cnt").as("cnt"))
        .as[(Int, Long, Long)].collect().toSet
      // batch reference: the same universal hashes over the same events
      val hashes = Seq((1103515245L, 12345L), (214013L, 2531011L),
        (22695477L, 1L), (1664525L, 1013904223L))
      val batch = evs.flatMap(e => hashes.zipWithIndex.map { case ((a, b), i) =>
          // the guarded form StreamOps.cmsCounters computes (key reduced
          // mod p before the multiply) — identical for small keys
          (i, ((a * (e.user_id % 2147483647L) % 2147483647L + b)
            % 2147483647L) % 64)
        }).groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
        .toSet
      streamed shouldBe batch
      // point estimate for the heavy key: min over rows ≥ true count
      val estU1 = hashes.zipWithIndex.map { case ((a, b), i) =>
        val bkt = ((a * 1L + b) % 2147483647L) % 64
        streamed.collectFirst { case (`i`, `bkt`, c) => c }.get
      }.min
      estU1 should be >= 30L
    } finally q.stop()
  }

  behavior of "bloomBits"

  it should "converge to the batch bit set and survive redelivery" in {
    val m = 64
    val evs = (1 to 50).map(i =>
      Event(i.toLong, ts(i.toLong), (i % 17 + 1).toLong, "view", 1.0))
    val (b1, b2) = evs.splitAt(26)
    val in = MemoryStream[Event]
    val q = StreamOps.bloomBits(in.toDS(), m)
      .writeStream.format("memory").queryName("bloom_bits")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable() // redelivery: set-idempotent
      val streamed = spark.table("bloom_bits")
        .select("bit").distinct().as[Long].collect().toSet
      val batch = evs.flatMap { e =>
        Seq((2654435761L, 1013904223L), (22695477L, 12345L)).map {
          case (a, b) =>
            ((a * (e.user_id % 2147483647L) % 2147483647L + b)
              % 2147483647L) % m
        }
      }.toSet
      streamed shouldBe batch
      // state bounded by m regardless of stream length
      q.lastProgress.stateOperators.head.numRowsTotal should be <= m.toLong
    } finally q.stop()
  }

  behavior of "softDedupWeights"

  it should "converge each text's weight to the batch 1/n_copies across micro-batches" in {
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.softDedupWeights(in.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("soft_weights")
      .outputMode("update").start()
    try {
      in.addData((1L, "alpha bravo"), (2L, "charlie delta"), (3L, "alpha bravo"))
      q.processAllAvailable()
      in.addData((4L, "Alpha  Bravo "), (5L, "echo foxtrot")) // normalizes to a dup
      q.processAllAvailable()
      val latest = spark.table("soft_weights")
        .groupBy("text_hash")
        .agg(org.apache.spark.sql.functions.max("n_copies").as("n"),
          org.apache.spark.sql.functions.min("weight").as("w"))
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      latest should have size 4
      // batch twin of the final state: lower(trim)-normalized md5 counts
      val docs = Seq("alpha bravo", "charlie delta", "alpha bravo",
        "Alpha  Bravo ", "echo foxtrot")
      // "Alpha  Bravo " normalizes to "alpha  bravo" (inner whitespace
      // kept - the corpus step's normalize op handles runs), which is
      // NOT the same hash as "alpha bravo": check real multiplicities
      val counts = docs.groupBy(d => d.toLowerCase.trim).view.mapValues(_.size)
      val two = latest.values.count(_._1 == 2L)
      val one = latest.values.count(_._1 == 1L)
      two shouldBe counts.values.count(_ == 2)
      one shouldBe counts.values.count(_ == 1)
      // weights are the batch HALF_UP round(1/n, 6)
      latest.values.foreach { case (n, w) =>
        w shouldBe BigDecimal(1.0 / n).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    } finally q.stop()
  }

  behavior of "kmvDistinct"

  it should "converge to the batch bottom-k sketch and survive redelivery" in {
    val k = 8
    val evs = (1 to 60).map(i =>
      Event(i.toLong, ts(i.toLong), (i % 23 + 1).toLong,
        if (i % 2 == 0) "click" else "view", 1.0))
    val (b1, b2) = evs.splitAt(31)
    val in = MemoryStream[Event]
    val q = StreamOps.kmvDistinct(in.toDS(), k)
      .writeStream.format("memory").queryName("kmv_est")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable() // redelivery: set is idempotent
      val streamed = spark.table("kmv_est")
        .groupBy("group")
        .agg(org.apache.spark.sql.functions.expr("max_by(est, n_kept)").as("est"),
          org.apache.spark.sql.functions.max("n_kept").as("n_kept"))
        .as[(String, Double, Int)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // plain-Scala replay of the same bottom-k sketch
      def coin(id: Long): Double = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
      }
      val want = evs.groupBy(_.event_type).map { case (t, es) =>
        // rank (coin, member) PAIRS — the batch sketch's (h, k) order —
        // so coin-colliding distinct members occupy distinct slots
        val hs = es.map(e => (coin(e.user_id), e.user_id))
          .distinct.sorted.take(k)
        val est =
          if (hs.size < k) hs.size.toDouble else (k - 1).toDouble / hs.last._1
        t -> (BigDecimal(est).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble, hs.size)
      }
      streamed shouldBe want
      // the sketch actually estimates: both groups saw > k members
      evs.groupBy(_.event_type).foreach { case (t, es) =>
        es.map(_.user_id).distinct.size should be > k
        streamed(t)._2 shouldBe k
      }
    } finally q.stop()
  }

  behavior of "windowedPsi"

  it should "converge to the batch per-window PSI across micro-batches" in {
    // baseline: uniform-ish over [0, 100); the second window drifts high
    val baseP = Seq(0.25, 0.25, 0.25, 0.25)
    val winUs = 10L * 60 * 1000000 // 10-min windows
    // shifted off epoch 0: with a watermark on the input (state eviction),
    // a row AT the initial watermark (ts = 0) is late by definition
    val w1 = (1 to 16).map(i =>
      Event(i.toLong, ts(60 + i.toLong % 9), 1, "view", (i % 4) * 25.0 + 1))
    val w2 = (21 to 36).map(i =>
      Event(i.toLong, ts(70 + i % 9), 1, "view", 80.0 + (i % 3)))
    val evs = w1 ++ w2
    val (b1, b2) = evs.splitAt(20)
    val in = MemoryStream[Event]
    val q = StreamOps.windowedPsi(in.toDS(), baseP, 0.0, 100.0, winUs)
      .writeStream.format("memory").queryName("psi_updates")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("psi_updates")
        .groupBy("window_start_us")
        .agg(org.apache.spark.sql.functions.max("n").as("n"),
          org.apache.spark.sql.functions.expr("max_by(psi, n)").as("psi"))
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // plain-Scala replay of the same windows
      def winOf(e: Event) = (e.ts.getTime * 1000L) / winUs * winUs
      val want = evs.groupBy(winOf).map { case (win, es) =>
        val counts = Array.fill(4)(0L)
        es.foreach { e =>
          counts(math.min(3, math.max(0, (e.value / 25.0).toInt))) += 1 }
        val n = counts.sum
        val psi = (0 until 4).map { i =>
          val qd = counts(i).toDouble / n
          if (baseP(i) > 0 && qd > 0)
            (baseP(i) - qd) * math.log(baseP(i) / qd) * 100 else 0.0
        }.sum
        win -> (n, BigDecimal(psi).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      streamed.keySet shouldBe want.keySet
      want.foreach { case (win, (n, psi)) =>
        streamed(win)._1 shouldBe n
        streamed(win)._2 shouldBe psi +- 1e-9
      }
      // the drifted window must score dramatically higher
      val psis = want.toSeq.sortBy(_._1).map(_._2._2)
      psis.last should be > psis.head + 10
    } finally q.stop()
  }

  it should "evict a window's state once the watermark passes its end" in {
    val baseP = Seq(0.25, 0.25, 0.25, 0.25)
    val winUs = 10L * 60 * 1000000 // 10-min windows
    // window 1 = [60min, 70min); window 2 = [90min, 100min)
    val w1 = (1 to 8).map(i =>
      Event(i.toLong, ts(60 + i.toLong % 6), 1, "view", (i % 4) * 25.0 + 1))
    val w2 = (21 to 28).map(i =>
      Event(i.toLong, ts(91 + i % 5), 1, "view", 80.0 + (i % 3)))
    val in = MemoryStream[Event]
    val q = StreamOps.windowedPsi(in.toDS(), baseP, 0.0, 100.0, winUs,
      watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("psi_evict")
      .outputMode("update").start()
    try {
      in.addData(w1: _*); q.processAllAvailable()
      // watermark after this batch ≈ 35min − 1s, past window 1's end …
      in.addData(w2: _*); q.processAllAvailable()
      // … so this batch's timeout pass must emit window 1's final PSI
      // and REMOVE its state: only window 2 remains in the store
      in.addData(Event(29, ts(95), 1, "view", 81.0)); q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      stateRows shouldBe 1L
      // the evicted window's final emission still equals the batch replay
      val streamed = spark.table("psi_evict")
        .groupBy("window_start_us")
        .agg(org.apache.spark.sql.functions.max("n").as("n"),
          org.apache.spark.sql.functions.expr("max_by(psi, n)").as("psi"))
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      def winOf(e: Event) = (e.ts.getTime * 1000L) / winUs * winUs
      val evs = w1 ++ w2 :+ Event(29, ts(95), 1, "view", 81.0)
      val want = evs.groupBy(winOf).map { case (win, es) =>
        val counts = Array.fill(4)(0L)
        es.foreach { e =>
          counts(math.min(3, math.max(0, (e.value / 25.0).toInt))) += 1 }
        val n = counts.sum
        val psi = (0 until 4).map { i =>
          val qd = counts(i).toDouble / n
          if (baseP(i) > 0 && qd > 0)
            (baseP(i) - qd) * math.log(baseP(i) / qd) * 100 else 0.0
        }.sum
        win -> (n, BigDecimal(psi).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      streamed.keySet shouldBe want.keySet
      want.foreach { case (win, (n, psi)) =>
        streamed(win)._1 shouldBe n
        streamed(win)._2 shouldBe psi +- 1e-9
      }
    } finally q.stop()
  }

  behavior of "hllRegisters"

  it should "converge to the batch register grid and survive redelivery" in {
    val evs = (1 to 40).map(i =>
      Event(i.toLong, ts(i.toLong), (i % 13 + 1).toLong,
        if (i % 2 == 0) "click" else "view", 1.0))
    val (b1, b2) = evs.splitAt(23)
    val in = MemoryStream[Event]
    val q = StreamOps.hllRegisters(in.toDS(), m = 64)
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable() // redelivery: max is idempotent
      val streamed = spark.table("hll_regs")
        .groupBy("group", "bucket")
        .agg(org.apache.spark.sql.functions.max("rho").as("rho"))
        .as[(String, Long, Int)].collect().toSet
      def mix(k: Long): Long = {
        var h = ((k % 2147483648L) * 2654435761L) % 2147483648L
        h = h ^ (h / 65536); h = (h * 40503) % 2147483648L; h ^ (h / 8192)
      }
      val batch = evs.map { e =>
        val h = mix(e.user_id); val w = h / 64
        // base = 32 − log2(64) = 26
        (e.event_type, h % 64,
          if (w == 0) 26 else 26 - java.lang.Long.toBinaryString(w).length)
      }.groupBy(r => (r._1, r._2))
        .map { case (k, v) => (k._1, k._2, v.map(_._3).max) }.toSet
      streamed shouldBe batch
    } finally q.stop()
  }

  behavior of "rollingZscore"

  it should "alert on the same outliers as the batch gate across micro-batches" in {
    import org.apache.spark.sql.functions.{abs => fabs, col, unix_micros}
    // user 1: stable baseline then two big spikes (one per micro-batch);
    // user 2: too short to ever have sd>0 variation that alerts
    val base = (1 to 15).map(i =>
      Event(i.toLong, ts(i.toLong), 1, "view", 10.0 + (i % 3) * 0.1))
    val spike1 = Event(16, ts(16), 1, "view", 500.0)
    val tail = (17 to 22).map(i =>
      Event(i.toLong, ts(i.toLong), 1, "view", 10.0 + (i % 3) * 0.1))
    // spike1 is still inside event 23's trailing-20 window, inflating the
    // sample std to ~147 — spike2 must overshoot enough to clear |z|>3
    // despite that masking (a -400 spike lands at z≈-2.8 and stays silent
    // in BOTH engines, which is the correct, if surprising, gate output).
    val spike2 = Event(23, ts(23), 1, "view", -4000.0)
    val u2 = Seq(Event(30, ts(1), 2, "view", 5.0), Event(31, ts(2), 2, "view", 5.1))
    val evs = base ++ Seq(spike1) ++ tail ++ Seq(spike2) ++ u2
    val (b1, b2) = (base ++ Seq(spike1), tail ++ Seq(spike2) ++ u2)
    val in = MemoryStream[Event]
    val q = StreamOps.rollingZscore(in.toDS())
      .writeStream.format("memory").queryName("zscore_alerts")
      .outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("zscore_alerts")
        .select("user_id", "event_id", "z")
        .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
      val batch = graft.queries.EventOpsPack.rollingZscoreOf(
          evs.toDF().withColumn("us", unix_micros(col("ts"))))
        .select("user_id", "event_id", "z")
        .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
      streamed.keySet shouldBe batch.keySet
      streamed.foreach { case (k, z) => z shouldBe batch(k) +- 1e-4 }
      streamed.keySet should contain allOf ((1L, 16L), (1L, 23L))
    } finally q.stop()
  }

  behavior of "multiTouchCredits"

  it should "emit per-channel credits equal to the batch attribution across micro-batches" in {
    import org.apache.spark.sql.functions.{col, sum, unix_micros}
    // u1: view, click (batch 1) + email, purchase 100 (batch 2), then a
    // post-conversion view AND a second purchase — both must be inert in
    // BOTH engines. u2: single view then purchase 50 in one batch.
    // u3: touches but never converts.
    val b1 = Seq(
      Event(1, ts(1), 1, "view", 0.0), Event(2, ts(2), 1, "click", 0.0),
      Event(10, ts(1), 2, "view", 0.0), Event(11, ts(2), 2, "purchase", 50.0),
      Event(20, ts(1), 3, "view", 0.0))
    val b2 = Seq(
      Event(3, ts(3), 1, "email", 0.0), Event(4, ts(4), 1, "purchase", 100.0),
      Event(5, ts(5), 1, "view", 0.0), Event(6, ts(6), 1, "purchase", 999.0),
      Event(21, ts(2), 3, "click", 0.0))
    val in = MemoryStream[Event]
    val q = StreamOps.multiTouchCredits(in.toDS())
      .writeStream.format("memory").queryName("touch_credits")
      .outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("touch_credits")
        .groupBy("channel")
        .agg(sum("credit").as("credit"), sum("attributed").as("attributed"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
        .toMap
      val batch = graft.queries.EventOpsPack.multiTouchOf(
          (b1 ++ b2).toDF().withColumn("us", unix_micros(col("ts"))))
        .collect()
        .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
      streamed.keySet shouldBe batch.keySet
      streamed.foreach { case (ch, (cr, rev)) =>
        cr shouldBe batch(ch)._1 +- 1e-9
        rev shouldBe batch(ch)._2 +- 1e-9
      }
      // u1's 3 touches: view .4 (first), click .2 (middle), email .4 (last)
      streamed("email")._1 shouldBe 0.4 +- 1e-9
      streamed("click")._1 shouldBe 0.2 +- 1e-9
      streamed("view")._2 shouldBe (0.4 * 100 + 1.0 * 50) +- 1e-9
    } finally q.stop()
  }

  behavior of "decayTouchCredits"

  it should "match the batch decay attribution exactly from O(channels) rebased sums" in {
    import org.apache.spark.sql.functions.{col, sum, unix_micros}
    val day = 86400000L // ms
    def dts(d: Long) = new java.sql.Timestamp(d * day)
    // u1: email 14d and view 7d before a 90 purchase (weights 1/4, 1/2 →
    // credits 1/3, 2/3), spread across micro-batches; a post-conversion
    // click must be inert. u2: two same-channel touches collapse into one
    // channel sum. u3: never converts.
    val b1 = Seq(
      Event(1, dts(6), 1, "email", 0.0), Event(2, dts(13), 1, "view", 0.0),
      Event(10, dts(1), 2, "view", 0.0), Event(11, dts(2), 2, "view", 0.0))
    val b2 = Seq(
      Event(3, dts(20), 1, "purchase", 90.0), Event(4, dts(21), 1, "click", 0.0),
      Event(12, dts(3), 2, "purchase", 40.0),
      Event(20, dts(1), 3, "view", 0.0))
    val in = MemoryStream[Event]
    val q = StreamOps.decayTouchCredits(in.toDS())
      .writeStream.format("memory").queryName("decay_credits")
      .outputMode("append").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("decay_credits")
        .groupBy("channel")
        .agg(sum("credit").as("c"), sum("attributed").as("a"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
        .toMap
      val batch = graft.queries.EventOpsPack.decayTouchOf(
          (b1 ++ b2).map(e => (e.user_id, e.event_id, e.event_type, e.value, e.ts))
            .toDF("user_id", "event_id", "event_type", "value", "ts")
            .withColumn("us", unix_micros(col("ts"))))
        .collect()
        .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
      streamed.keySet shouldBe batch.keySet
      streamed.foreach { case (ch, (cr, rev)) =>
        cr shouldBe batch(ch)._1 +- 1e-3  // batch rounds credit_units at 4
        rev shouldBe batch(ch)._2 +- 0.02
      }
      // the analytic values: weights 2^-2 and 2^-1 normalize to 1/3, 2/3
      streamed("email")._1 shouldBe (1.0 / 3) +- 1e-9
      streamed("view")._1 shouldBe (2.0 / 3 + 1.0) +- 1e-9 // + u2's whole credit
      streamed.keySet should not contain "click"
    } finally q.stop()
  }

  behavior of "reservoirSample"

  it should "converge to the batch deterministic sample across micro-batches and redelivery" in {
    import org.apache.spark.sql.functions.col
    val evs = (1 to 40).map(i => Event(i.toLong, ts(i.toLong), i % 5,
      if (i % 2 == 0) "view" else "click", i * 0.5))
    val (b1, b2) = evs.splitAt(23)
    val in = MemoryStream[Event]
    val q = StreamOps.reservoirSample(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("reservoir")
      .outputMode("update").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      // redeliver part of batch 1 (at-least-once source) + batch 2
      in.addData((b1.takeRight(5) ++ b2): _*); q.processAllAvailable()
      // latest emission per group is the live sample (computed driver-side
      // — a memory-sink self-join trips attribute dedup in this Spark)
      val rows = spark.table("reservoir")
        .select("event_type", "seq", "rnk", "event_id")
        .as[(String, Long, Int, Long)].collect()
      val lastSeq = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val streamed = rows.filter(r => r._2 == lastSeq(r._1))
        .map(r => (r._1, r._3, r._4)).toSet
      val batch = graft.queries.AnalyticsPack.groupSampleOf(evs.toDF())
        .select(col("event_type"), col("rnk").cast("int"), col("event_id"))
        .as[(String, Int, Long)].collect().toSet
      streamed shouldBe batch
    } finally q.stop()
  }
}
