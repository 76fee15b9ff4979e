package graft
/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failed query reports duration -1 AND lands in an
  * "errors" object — failures must be visible, never silently fast.
  *
  * Noise resistance: each query is warmed once (unmeasured — codegen, JIT,
  * parquet footers) and then timed `SPARK_GRAFT_RUNS` times (default 3;
  * the exact-rank family gets at least 5 — see [[Bench.NoisyRankQueries]]);
  * the reported number is the MEDIAN, so one GC pause or contended-machine
  * blip cannot dominate a round's signal. The committed BENCH_LOCAL.json
  * additionally carries per-query {median,min,max} spread plus MEASURED
  * shuffle-write and spill bytes from the task metrics of the last timed
  * run — the evidence behind every "this plan shuffles O(keys), not
  * O(rows²)" claim, and the tripwire that catches a silently-acquired
  * extra exchange or a spill regression between rounds.
  */
object Bench {

  /** The exact-rank (range-sort) query family measures noisier than the
    * rest — each run launches a range-partitioner sample job plus the
    * two-pass rank, so scheduler jitter compounds (observed ~11%
    * builder-vs-driver drift at 3 runs where single-exchange queries
    * agree within ~1.5%). These take extra timed runs so the committed
    * medians and the driver's are pinned to the same distribution. */
  private val NoisyRankQueries = Set(
    "robust_outliers", "rfm_tiers", "group_percentiles", "ntile_bins",
    "exact_quantiles", "quality_tiers", "score_rank_norm", "vocab_zipf",
    "interevent_gaps", "psi_exact", "auroc_rank",
    "weighted_percentiles", "weighted_percentiles_interp", "mann_whitney",
    "quantile_treatment", "winsorized_mean", "zorder_layout")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = math.max(1, sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3))
    val spark = GraftSession.local(GraftSession.envCores, "graft-bench")
    // Warm up the machinery every query pays for once (catalog, parquet
    // footer reads, codegen/janino, shuffle + window + join infrastructure)
    // on a 5-row dim table so the first query's warmup isn't charged for it.
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = Tables.region(spark, sfDir)
      r.groupBy("r_regionkey").agg(count(lit(1))).count()
      r.join(r.withColumnRenamed("r_regionkey", "k"), col("r_regionkey") === col("k"))
        .count()
      r.withColumn("rn",
        row_number().over(Window.partitionBy("r_regionkey").orderBy("r_regionkey"))).count()
      // range-partitioner + two-pass rank machinery (plans.GlobalRank)
      graft.plans.GlobalRank.withNtile(r, Seq(col("r_regionkey")), 2, "b").count()
      spark.catalog.clearCache()
    }
    var errors = Map.empty[String, String]
    // local-iteration filter (unset for driver runs → full sweep)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)

    // Task-metric evidence: shuffle-write + spill bytes accumulated by a
    // listener; per-query numbers are the DELTA across one timed run.
    // Listener events drain async, so each snapshot waits (uncharged)
    // until the counters STABILIZE — a fixed sleep would let one query's
    // stragglers bleed into the next query's delta under GC pauses or
    // machine contention, mis-attributing the committed tripwire bytes.
    val shuffleBytes = new java.util.concurrent.atomic.LongAdder
    val spillBytes = new java.util.concurrent.atomic.LongAdder
    val taskEnds = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        Option(te.taskMetrics).foreach { tm =>
          shuffleBytes.add(tm.shuffleWriteMetrics.bytesWritten)
          spillBytes.add(tm.memoryBytesSpilled + tm.diskBytesSpilled)
        }
        taskEnds.increment()
      }
    })
    // Poll until two consecutive 20ms reads agree (bounded at 2s): the
    // bus is empty when no task-end has landed across a full interval.
    def drainListenerBus(): Unit = {
      var prev = (taskEnds.sum(), shuffleBytes.sum(), spillBytes.sum())
      var stable = 0
      val deadline = System.nanoTime() + 2000000000L
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(20)
        val cur = (taskEnds.sum(), shuffleBytes.sum(), spillBytes.sum())
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
    }

    // One attempt, measured in isolation: time the action, then drop cached
    // plans (so a later attempt neither reuses nor evicts them) and collect
    // garbage (so this attempt's heap pressure doesn't surface as a GC
    // pause inside the next one's wall-clock) — both UNCHARGED.
    def attempt(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[(Double, Long, Long)] = {
      drainListenerBus() // settle the PREVIOUS attempt's task events
      val (sh0, sp0) = (shuffleBytes.sum(), spillBytes.sum())
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          errors += name -> e.toString.take(200); false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      drainListenerBus() // settle THIS attempt's task events before snapshot
      if (ok) Some((secs, shuffleBytes.sum() - sh0, spillBytes.sum() - sp0))
      else None
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_ .contains(name)) }
      .map { case (name, fn) =>
        attempt(name, fn) match { // warmup; a failure here skips the runs
          case None => name -> (Seq(-1.0), 0L, 0L)
          case Some(_) =>
            val nRuns = if (NoisyRankQueries(name)) math.max(runs, 5) else runs
            val triples = (1 to nRuns).flatMap(_ => attempt(name, fn))
            if (triples.isEmpty) name -> (Seq(-1.0), 0L, 0L)
            else name -> (triples.map(_._1).sorted,
              triples.last._2, triples.last._3)
        }
      }
    def median(ts: Seq[Double]): Double = ts(ts.size / 2) // ts sorted, odd runs
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, (ts, _, _)) => jstr(k) + ":" + median(ts) }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, (ts, _, _)) if ts.head >= 0 => median(ts) }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs,"sf":"$sfDir"}"""
    println(line)
    // Also persist the full line (plus per-query spread + measured shuffle/
    // spill bytes) to the repo: the driver's captured tail truncates at
    // 2000 chars, which hides a third of the per-query timings — the
    // committed file keeps rounds diffable.
    val stats = results.map { case (k, (ts, sh, sp)) =>
      jstr(k) + s""":{"median":${median(ts)},"min":${ts.head},"max":${ts.last},"shuffle_mb":${math.round(sh / 1e4) / 100.0},"spill_mb":${math.round(sp / 1e4) / 100.0}}"""
    }.mkString("{", ",", "}")
    val fileLine = line.dropRight(1) + s""","stats":$stats}"""
    try {
      val out = java.nio.file.Paths.get(
        sys.props.get("graft.bench.out")
          .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
          .getOrElse("/root/repo/bench/BENCH_LOCAL.json"))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, fileLine + "\n")
    } catch { // best-effort: never fail the bench on a write error —
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write BENCH_LOCAL.json: $e")
    }
    spark.stop()
  }
}
