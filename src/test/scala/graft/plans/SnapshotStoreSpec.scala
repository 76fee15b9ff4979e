package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Atomic versioned snapshots: manifests are the commit — readers see
  * whole versions or nothing, diffs ride the id-keyed corpus diff. */
class SnapshotStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshRoot(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-snap").toString
    new java.io.File(p).deleteOnExit()
    p
  }

  behavior of "SnapshotStore"

  it should "publish and read back versions with exact manifests" in {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val root = freshRoot()
    val v1 = graft.Tables.documents(spark, dir).filter(col("doc_id") < 300)
    val v2 = graft.Tables.documents(spark, dir).filter(col("doc_id") < 400)
    val m1 = SnapshotStore.publish(v1, root, 1)
    val m2 = SnapshotStore.publish(v2, root, 2)
    m1.rows shouldBe 300
    m2.rows shouldBe 400
    SnapshotStore.versions(root) shouldBe Seq(1L, 2L)
    SnapshotStore.read(spark, root, 1).count() shouldBe 300
    SnapshotStore.readLatest(spark, root).count() shouldBe 400
    SnapshotStore.manifestRows(root, 2) shouldBe 400
    // round-trip preserves content, not just counts
    SnapshotStore.read(spark, root, 1).select("doc_id")
      .collect().map(_.getLong(0)).sorted shouldBe
      v1.select("doc_id").collect().map(_.getLong(0)).sorted
  }

  it should "keep an uncommitted (crashed) version invisible to readers" in {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val root = freshRoot()
    SnapshotStore.publish(
      graft.Tables.documents(spark, dir).filter(col("doc_id") < 100), root, 1)
    // simulate a crashed writer: data directory exists, no manifest
    graft.Tables.documents(spark, dir)
      .write.mode("overwrite").parquet(s"$root/v=2")
    SnapshotStore.versions(root) shouldBe Seq(1L) // v2 invisible
    SnapshotStore.latestVersion(root) shouldBe Some(1L)
    intercept[IllegalArgumentException](SnapshotStore.read(spark, root, 2))
    // finishing the publish commits it
    SnapshotStore.publish(
      graft.Tables.documents(spark, dir).filter(col("doc_id") < 150), root, 2)
    SnapshotStore.versions(root) shouldBe Seq(1L, 2L)
    SnapshotStore.read(spark, root, 2).count() shouldBe 150
  }

  it should "re-publish into a fresh directory so committed readers are never invalidated" in {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val root = freshRoot()
    val docs = graft.Tables.documents(spark, dir)
    SnapshotStore.publish(docs.filter(col("doc_id") < 300), root, 1)
    val oldDir = SnapshotStore.dataDirOf(root, 1)
    // a reader resolves version 1 BEFORE the re-publish (a training job
    // mid-epoch); it must keep working afterwards
    val reader = spark.read.parquet(s"$root/$oldDir")
    SnapshotStore.publish(docs.filter(col("doc_id") < 150), root, 1)
    val newDir = SnapshotStore.dataDirOf(root, 1)
    newDir should not be oldDir
    reader.count() shouldBe 300          // old directory untouched
    SnapshotStore.read(spark, root, 1).count() shouldBe 150
    SnapshotStore.manifestRows(root, 1) shouldBe 150
    SnapshotStore.versions(root) shouldBe Seq(1L)
    // default vacuum must NOT touch anything inside the grace window —
    // an unreferenced young directory could be an in-flight publish
    SnapshotStore.vacuum(root) shouldBe empty
    new java.io.File(s"$root/$oldDir").exists() shouldBe true
    // past the grace window (forced to 0 here) it reclaims exactly the
    // superseded directory
    SnapshotStore.vacuum(root, graceMs = 0L) shouldBe Seq(oldDir)
    new java.io.File(s"$root/$oldDir").exists() shouldBe false
    SnapshotStore.read(spark, root, 1).count() shouldBe 150
    SnapshotStore.vacuum(root, graceMs = 0L) shouldBe empty
    // a crashed writer's stale manifest temp file is also reclaimed
    val stale = java.nio.file.Paths.get(root, "_manifests", ".v9-dead0000.tmp")
    java.nio.file.Files.writeString(stale, "{}")
    SnapshotStore.vacuum(root) shouldBe empty // young → protected
    SnapshotStore.vacuum(root, graceMs = 0L) shouldBe Seq(".v9-dead0000.tmp")
    java.nio.file.Files.exists(stale) shouldBe false
  }

  it should "support the continuous-ingest loop: probe new docs against v1, publish v2, diff" in {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val root = freshRoot()
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val v1docs = docs.filter(col("doc_id") < 400)
    SnapshotStore.publish(v1docs, root, 1)
    // new ingest batch: probe against v1's LSH band index — the batch
    // form of the streaming near-dup probe (same DataFrame ops)
    val newBatch = docs.filter(col("doc_id") >= 400)
    val index = graft.streaming.StreamOps.nearDupIndex(
      SnapshotStore.read(spark, root, 1), "doc_id", "text")
    val dupIds = graft.streaming.StreamOps
      .nearDupProbe(newBatch, index, "doc_id", "text")
      .select(col("new_id").as("doc_id")).distinct()
    dupIds.count() should be > 0L // the fixture plants cross-split near-dups
    val cleanNew = newBatch.join(dupIds, Seq("doc_id"), "left_anti")
    SnapshotStore.publish(v1docs.unionByName(cleanNew), root, 2)
    val diff = graft.queries.LlmData.corpusDiffOf(
        SnapshotStore.read(spark, root, 1),
        SnapshotStore.read(spark, root, 2), "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    diff("added") shouldBe cleanNew.count()
    diff("unchanged") shouldBe 400
    diff.get("removed") shouldBe None
  }

  it should "fail fast on schemes without atomic rename" in {
    val docs = graft.Tables.region(spark, dir)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.publish(docs, "s3a://bucket/corpus", 1)
    }
    e.getMessage should include("atomic rename")
  }

  it should "diff two committed versions through the id-keyed corpus diff" in {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val root = freshRoot()
    val docs = graft.Tables.documents(spark, dir)
    SnapshotStore.publish(docs.filter(col("doc_id") < 300), root, 1)
    SnapshotStore.publish(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 400), root, 2)
    val a = SnapshotStore.read(spark, root, 1)
    val b = SnapshotStore.read(spark, root, 2)
    val diff = graft.queries.LlmData.corpusDiffOf(a, b, "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    diff("removed") shouldBe 100 // 0..99
    diff("added") shouldBe 100   // 300..399
    diff("unchanged") shouldBe 200
  }
}
