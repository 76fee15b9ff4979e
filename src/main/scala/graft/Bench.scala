package graft
/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failed query reports duration -1 AND lands in an
  * "errors" object — failures must be visible, never silently fast. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(GraftSession.envCores, "graft-bench")
    // Warm up the machinery every query pays for once (catalog, parquet
    // footer reads, codegen/janino, shuffle + window + join infrastructure)
    // on a 5-row dim table so the first measured query isn't charged for it.
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_ .contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          errors += name -> e.toString.take(200); false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      // Each query is measured in isolation: drop its cached plans so a
      // later query neither reuses nor evicts them, and collect garbage so
      // one query's heap pressure doesn't show up as a GC pause inside the
      // next one's wall-clock (uncharged cleanup).
      spark.catalog.clearCache()
      System.gc()
      name -> (if (ok) secs else -1.0)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // Also persist the full line to the repo: the driver's captured tail
    // truncates at 2000 chars, which hides a third of the per-query
    // timings — the committed file keeps every round diffable.
    try {
      val dir = java.nio.file.Paths.get("bench")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("BENCH_LOCAL.json"), line + "\n")
    } catch { case _: Throwable => () } // best-effort: never fail the bench
    spark.stop()
  }
}
