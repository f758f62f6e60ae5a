package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("metadata-only queries prune the binary payload from the media parquet scan") {
    import spark.implicits._
    // The storage posture SCALE.md claims: payloads stay opaque binary, so
    // a metadata-only query must never read them off disk.
    val docs = Seq((1L, "abc", 3L), (2L, "hello world", 11L))
      .toDF("doc_id", "text", "n_chars")
    val path = java.nio.file.Files.createTempDirectory("graft_media").toString + "/media"
    Multimodal.synthesizeFromDocuments(docs).write.mode("overwrite").parquet(path)
    val qe = spark.read.parquet(path)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"), avg(col("width")).as("w"))
      .queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("media_type") && !plan.contains("payload"),
      plan.take(1500))
  }

  test("decodeFeatures is deterministic and matches a hand-computed digest") {
    import spark.implicits._
    val docs = Seq((1L, "abc", 3L), (2L, "hello world", 11L))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal.decodeFeatures(
        Multimodal.synthesizeFromDocuments(docs).as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap

    // md5("abc") = 900150983cd24fb0... → first byte 0x90 = 144
    assert(out(1L).features(0) == 144 / 255.0)
    assert(out(1L).n_bytes == 3)
    assert(out(1L).media_type == "audio") // odd id
    assert(out(2L).media_type == "image")
    assert(out(1L).features.length == Multimodal.FeatureDim)
  }

  test("resize rewrites metadata and shrinks payload by area ratio") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(7L, "image", "0123456789abcdef".getBytes("UTF-8"),
      width = 8, height = 8, sample_rate = 0)).toDS()
    val out = Multimodal.resize(media, targetW = 4, targetH = 4).collect().head
    assert(out.width == 4 && out.height == 4)
    assert(out.payload.length == 4) // 16 bytes × (16/64 area ratio)
    // upscaling never fabricates bytes
    val up = Multimodal.resize(media, targetW = 16, targetH = 16).collect().head
    assert(up.payload.length == 16 && up.width == 16)
  }

  test("sampleFrames slices payload into n frames") {
    import spark.implicits._
    val docs = Seq((4L, "0123456789abcdef", 16L)).toDF("doc_id", "text", "n_chars")
    val frames = Multimodal.sampleFrames(
        Multimodal.synthesizeFromDocuments(docs).as[Multimodal.MediaRow], 4)
      .orderBy(col("frame_no")).collect()
    assert(frames.length == 4)
    assert(new String(frames.head.getAs[Array[Byte]]("frame_bytes"), "UTF-8") == "0123")
  }
}
