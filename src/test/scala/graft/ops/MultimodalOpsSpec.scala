package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "an image-ish payload"),
    (1L, "an audio-ish payload"),
    (2L, "a video-ish payload"),
    (3L, "an image-ish payload") // same text as 0 -> same content hash
  ).toDF("doc_id", "text")

  test("media rows carry round-robin modality and utf-8 payload") {
    val rows = MultimodalOps.mediaFromDocuments(docs).collect()
      .map(r => r.media_id -> r).toMap
    assert(rows(0L).modality == "image")
    assert(rows(1L).modality == "audio")
    assert(rows(2L).modality == "video")
    assert(new String(rows(0L).payload, "UTF-8") == "an image-ish payload")
  }

  test("feature extraction is deterministic and content-addressed") {
    val feats = MultimodalOps.documentFeatures(spark, docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    // same payload -> same sha/dims regardless of id (dedup-by-content works)
    assert(feats(0L).getString(3) == feats(3L).getString(3))
    assert(feats(0L).getInt(4) == feats(3L).getInt(4))
    assert(feats(0L).getString(3) != feats(1L).getString(3))
    // dims in the stub's documented ranges
    feats.values.foreach { r =>
      assert(r.getLong(2) > 0)
      assert(r.getInt(4) >= 64 && r.getInt(4) < 64 + 4096)
      assert(r.getInt(5) >= 64 && r.getInt(5) < 64 + 4096)
      val lum = r.getDouble(6)
      assert(lum >= 0.0 && lum <= 1.0)
    }
  }

  test("extraction preserves partitioning (no shuffle)") {
    val media = MultimodalOps.mediaFromDocuments(docs).repartition(3)
    val out = MultimodalOps.extractFeatures(media)
    assert(out.rdd.getNumPartitions == 3)
  }
}
