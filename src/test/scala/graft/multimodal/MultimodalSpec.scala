package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(n: Int) = (0 until n).map { i =>
    MediaFile(i.toLong, if (i % 2 == 0) "image" else "video",
      Array.tabulate[Byte](100 + i)(b => ((b * 31 + i) % 251).toByte),
      MediaMeta(640, 480, durationMs = 1000L * (i + 1), format = "raw"))
  }.toDS()

  behavior of "Multimodal"

  it should "extract fixed-dim deterministic features per blob" in {
    val feats = Multimodal.extractFeatures(media(10), partitions = 4).collect()
    feats should have size 10
    all(feats.map(_.features.length)) shouldBe Multimodal.featureDim
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media(10)).collect()
    feats.sortBy(_.media_id).zip(again.sortBy(_.media_id)).foreach {
      case (a, b) => a.features.toSeq shouldBe b.features.toSeq
    }
    // depends on content: different blobs → different features
    feats.map(_.features.toSeq).distinct.length should be > 1
  }

  it should "resize blobs and update metadata in lockstep" in {
    val out = Multimodal.resize(media(4), 8, 4).collect()
    all(out.map(_.content.length)) shouldBe 32
    all(out.map(_.meta.width)) shouldBe 8
    all(out.map(_.meta.height)) shouldBe 4
    all(out.map(_.meta.format)) shouldBe "raw" // untouched fields survive
  }

  it should "sample frames proportional to duration with row-local explode" in {
    val frames = Multimodal.sampleFrames(media(4), everyMs = 1000).collect()
    // media i has duration (i+1)s → i+1 frames at 1 fps
    frames.groupBy(_.media_id).view.mapValues(_.length).toMap shouldBe
      Map(0L -> 1, 1L -> 2, 2L -> 3, 3L -> 4)
    frames.filter(_.media_id == 3).map(_.frame_idx).sorted shouldBe Seq(0, 1, 2, 3)
  }

  it should "profile metadata without touching the binary column" in {
    val prof = Multimodal.metaProfile(media(10).toDF())
    val rows = prof.collect()
    rows.map(_.getAs[Long]("n")).sum shouldBe 10
    // plan reads meta/kind only — binary column pruned from the projection
    val scanned = prof.queryExecution.optimizedPlan.toString
    scanned should not include "content"
  }
}
