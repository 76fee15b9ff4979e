package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape contracts for the write-time layouts: bucketing must elide
  * the join shuffle, partitioning must prune directories at planning
  * time. These are the properties that make the layouts worth their
  * write cost at 100 TB, so they are pinned as tests, not just prose. */
class StorageLayoutSpec extends SparkSpec {

  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  behavior of "BucketedLayout"

  it should "join two bucketed tables with no shuffle exchange" in {
    val facts = (1 to 1000).map(i => (i % 97L, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 97L).map(k => (k, s"name_$k")).toDF("k", "name")
    // clear catalog entries AND any orphaned managed-table location a
    // previous JVM left behind (the catalog is in-memory, the dir is not)
    Seq("bl_facts", "bl_dims").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    BucketedLayout.writeBucketed(facts, "bl_facts", Seq("k"), 8)
    BucketedLayout.writeBucketed(dims, "bl_dims", Seq("k"), 8)
    try {
      // AQE off so the compiled plan is final; broadcast off so the shuffle
      // elision (not a broadcast) is what's being proven.
      withConf("spark.sql.adaptive.enabled" -> "false",
               "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = BucketedLayout.coLocatedJoin(spark, "bl_facts", "bl_dims", Seq("k"))
        assert(BucketedLayout.hasNoShuffle(joined),
          s"expected exchange-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
        joined.count() shouldBe 1000L
        // same-key aggregation also reuses the bucket clustering
        val agg = spark.table("bl_facts").groupBy("k").agg(sum("v"))
        assert(BucketedLayout.hasNoShuffle(agg),
          s"expected exchange-free bucketed agg, got:\n${agg.queryExecution.executedPlan}")
        agg.count() shouldBe 97L
      }
      // layout lands one file per bucket, not tasks x buckets
      val files = spark.table("bl_facts").inputFiles.length
      files shouldBe 8
    } finally {
      spark.sql("DROP TABLE IF EXISTS bl_facts")
      spark.sql("DROP TABLE IF EXISTS bl_dims")
    }
  }

  behavior of "PartitionedLayout"

  it should "read only the filtered partition directories" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (1 to 300).map(i => (s"src_${i % 3}", i.toLong)).toDF("source", "id")
    PartitionedLayout.write(df, dir, Seq("source"))
    val all = spark.read.parquet(dir)
    PartitionedLayout.partitionsRead(all) shouldBe 3L
    val one = all.filter($"source" === "src_1")
    PartitionedLayout.partitionsRead(one) shouldBe 1L
    one.count() shouldBe 100L
    // one file per partition value (repartition-before-write contract)
    all.inputFiles.length shouldBe 3
  }

  it should "compact a many-small-files layout into size-targeted files" in {
    val in = java.nio.file.Files.createTempDirectory("graft-smallfiles").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compacted").toString
    (1 to 5000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
      .repartition(64).write.mode("overwrite").parquet(in) // 64 tiny files
    val (before, after) = PartitionedLayout.compactTo(spark, in, out, targetMB = 512)
    before shouldBe 64
    after shouldBe 1 // a few KB of data → one target-sized file
    spark.read.parquet(out).count() shouldBe 5000L
  }
}
