package graft.examples

import graft.GraftSession
import graft.plans.SnapshotStore
import graft.queries.LlmData
import org.apache.spark.sql.functions._

/** End-to-end drive of the similarity-search SERVING shape — the
  * build-once / probe-many lifecycle a production vector index runs:
  *
  *   1. BUILD: train the IVF coarse quantizer (deterministic Lloyd) and
  *      PUBLISH the index — centroids + inverted lists with unit
  *      vectors — as SnapshotStore tables (atomic manifest commit).
  *   2. PROBE: serve top-k queries from the COMMITTED artifact only —
  *      no training pipeline anywhere in the probe plan.
  *   3. REBUILD: publish version 2 under running probes (readers of v1
  *      are never invalidated), then vacuum the superseded files.
  *
  * The probe result is byte-identical to the inline build+probe
  * (`ann_ivf_trained`), which is what the shared driver oracle checks.
  *
  * Run: sbt "runMain graft.examples.SimilarityServe /root/testdata/sf0.01"
  */
object SimilarityServe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(8, "graft-similarity-serve")

    // 1. build + publish (cached per JVM — a second call is free)
    val t0 = System.nanoTime()
    val root = LlmData.ivfIndexPublish(spark, dir)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val lists = SnapshotStore.readLatest(spark, s"$root/lists")
    println(f"[serve] built + published index at $root " +
      f"(${lists.count()} list rows, " +
      f"${SnapshotStore.manifestRows(s"$root/centroids", 1)} centroids) " +
      f"in $buildSecs%.1fs")

    // 2. probe-only serving
    val t1 = System.nanoTime()
    val hits = LlmData.annIvfProbeFrom(spark, dir, root)
    val n = hits.count()
    val probeSecs = (System.nanoTime() - t1) / 1e9
    println(f"[serve] probe-only top-3 for the query set: $n rows " +
      f"in $probeSecs%.1fs (no build stage in this plan)")
    hits.limit(6).collect().foreach { r =>
      println(s"[serve]   q=${r.getLong(0)} rank=${r.getInt(1)} " +
        s"-> ${r.getLong(2)} cos=${r.getDouble(3)}")
    }

    // 3. atomic rebuild under running probes: version 2, then a
    // CORRECTED re-publish of version 2 (the first v2 directory becomes
    // an unreferenced orphan — visibility flipped at the manifest
    // rename, so no probe ever saw a half-written index), then vacuum
    val cents = SnapshotStore.readLatest(spark, s"$root/centroids")
    val listsV1 = SnapshotStore.readLatest(spark, s"$root/lists")
    SnapshotStore.publish(cents, s"$root/centroids", 2L)
    SnapshotStore.publish(listsV1, s"$root/lists", 2L)
    SnapshotStore.publish(listsV1, s"$root/lists", 2L) // corrected rebuild
    val again = LlmData.annIvfProbeFrom(spark, dir, root).count()
    val swept = SnapshotStore.vacuum(s"$root/lists", graceMs = 0L) ++
      SnapshotStore.vacuum(s"$root/centroids", graceMs = 0L)
    println(s"[serve] republished v2 twice (probe still $again rows), " +
      s"vacuumed ${swept.size} superseded dir(s); " +
      s"versions=${SnapshotStore.versions(s"$root/lists").mkString(",")}")

    spark.stop()
  }
}
