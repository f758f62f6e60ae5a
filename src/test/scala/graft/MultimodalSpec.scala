package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def refLuma(id: Long): Array[Int] =
    Array.tabulate(Multimodal.TotalSamples)(i =>
      Multimodal.lumaAt(id, i % Multimodal.ImgSide, i / Multimodal.ImgSide))

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

  test("decodeFeatures really decodes: PNG/WAV round trip matches the synthesis arithmetic") {
    import spark.implicits._
    val docs = Seq((1L, "x", 1L), (2L, "y", 1L), (8L, "z", 1L))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal.decodeFeatures(Multimodal.synthesizeEncodedMedia(docs))
      .collect().map(f => f.media_id -> f).toMap

    assert(out(1L).media_type == "audio") // odd id
    assert(out(2L).media_type == "image")
    assert(out(2L).n_samples == Multimodal.TotalSamples)
    val block = Multimodal.TotalSamples / Multimodal.FeatureDim
    // image features = block sums of the luma grid the PNG encoded
    for (id <- Seq(2L, 8L); b <- 0 until Multimodal.FeatureDim) {
      val expect = (b * block until (b + 1) * block)
        .map(i => Multimodal.lumaAt(id, i % Multimodal.ImgSide, i / Multimodal.ImgSide).toLong).sum
      assert(out(id).features(b) == expect, s"image $id block $b")
    }
    // audio features = block sums of the PCM samples the WAV encoded
    for (b <- 0 until Multimodal.FeatureDim) {
      val expect = (b * block until (b + 1) * block).map(i => Multimodal.pcmAt(1L, i).toLong).sum
      assert(out(1L).features(b) == expect, s"audio block $b")
    }
  }

  test("imageLuma: decoded grids are bit-equal to the synthesis function (PNG lossless)") {
    import spark.implicits._
    val docs = Seq((0L, "a", 1L), (4L, "b", 1L), (10L, "c", 1L))
      .toDF("doc_id", "text", "n_chars")
    val decoded = Multimodal.imageLuma(Multimodal.synthesizeImages(docs))
      .as[(Long, Array[Int])].collect().toMap
    for (id <- Seq(0L, 4L, 10L))
      assert(decoded(id).sameElements(refLuma(id)), s"image $id decode drift")
  }

  test("re-encode robustness: decode → re-encode → decode is stable, hash unchanged") {
    // A second trip through the codec (e.g. storage-tier recompression)
    // must not move a single luma value or hash bit.
    val grid = refLuma(6L)
    val once = Multimodal.decodePngLuma(Multimodal.encodePng(grid))
    val twice = Multimodal.decodePngLuma(Multimodal.encodePng(once))
    assert(once.sameElements(grid) && twice.sameElements(grid))

    import spark.implicits._
    val hashes = graft.operators.MultimodalOps.withDhash56(
        Seq(("orig", grid), ("reenc", twice)).toDF("tag", "luma"), col("luma"), "fp")
      .select(col("tag"), col("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hashes("orig") == hashes("reenc"))
  }

  test("brightness-shift robustness: uniform +c leaves every dHash bit unchanged") {
    import spark.implicits._
    // dHash bits are strict comparisons of block-sum DIFFERENCES, so a
    // uniform brightness offset cancels exactly (no tolerance involved).
    val grid = refLuma(12L).map(v => v * 200 / 255) // headroom so +55 can't clip
    val shifted = grid.map(_ + 55)
    val hashes = graft.operators.MultimodalOps.withDhash56(
        Seq(("base", grid), ("bright", shifted)).toDF("tag", "luma"), col("luma"), "fp")
      .select(col("tag"), col("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hashes("base") == hashes("bright"))
  }

  test("near-dup variants are a few dHash bits apart; unrelated images are far") {
    import spark.implicits._
    // the q136 premise, checked at the hash level: same group (base 16,
    // variants 16+2k) → small Hamming; different group → large
    val ids = Seq(16L, 18L, 20L, 22L, 48L)
    val grids = ids.map(id => id -> refLuma(id))
    val fps = graft.operators.MultimodalOps.withDhash56(
        grids.toDF("id", "luma"), col("luma"), "fp")
      .select(col("id"), col("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(ham(16L, 18L) <= 7, s"variant pair too far: ${ham(16L, 18L)}")
    assert(ham(16L, 20L) <= 7 && ham(16L, 22L) <= 7)
    assert(ham(16L, 48L) > graft.operators.MultimodalOps.ImgHammingMax,
      s"unrelated pair too close: ${ham(16L, 48L)}")
  }

  test("audioPcm: decoded clips are bit-equal to the synthesis function (WAV lossless)") {
    import spark.implicits._
    val docs = Seq((1L, "a", 1L), (7L, "b", 1L), (13L, "c", 1L), (2L, "even", 1L))
      .toDF("doc_id", "text", "n_chars")
    val decoded = Multimodal.audioPcm(Multimodal.synthesizeClips(docs))
      .as[(Long, Array[Int])].collect().toMap
    assert(decoded.keySet == Set(1L, 7L, 13L)) // even ids are not clips
    for (id <- Seq(1L, 7L, 13L))
      assert(decoded(id).sameElements(Multimodal.clipGrid(id)), s"clip $id decode drift")
    // and the slow-path / fast-path synthesis functions agree
    assert(Multimodal.clipGrid(13L)
      .sameElements(Array.tabulate(Multimodal.TotalSamples)(Multimodal.clipAt(13L, _))))
  }

  test("audio fingerprint is invariant under per-frame uniform gain (and re-encode)") {
    import spark.implicits._
    // The Haitsma–Kalker property q139 is built on: a volume-envelope
    // change (constant added to every sample of a frame) shifts all that
    // frame's energy cells equally, cancelling exactly in the band
    // difference — no tolerance involved. Exercised per-frame with a
    // DIFFERENT offset each frame, plus a codec round trip.
    val base = Multimodal.clipGrid(9L).map(v => v * 180 / 255) // headroom, no clipping
    val gained = base.zipWithIndex.map { case (v, i) =>
      v + 6 * (i / Multimodal.AudFrameLen) // frame f gains +6f
    }
    val reenc = Multimodal.decodeWavPcm(Multimodal.encodeWav(gained))
    assert(reenc.sameElements(gained)) // WAV PCM lossless round trip
    val fps = graft.operators.MultimodalOps.withHk49(
        Seq(("base", base), ("gained", reenc)).toDF("tag", "pcm"), col("pcm"), "fp")
      .select(col("tag"), col("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fps("base") == fps("gained"))
  }

  test("audio near-dup variants are a few fingerprint bits apart with a clean band; unrelated clips are far") {
    import spark.implicits._
    // the q139 premise: same group (odd ids 17,19,21,23), variants
    // perturb one energy cell each → ≤8 bits apart pairwise and at least
    // one of the 4 LSH bands untouched; different group → far
    val ids = Seq(17L, 19L, 21L, 23L, 49L)
    val fps = graft.operators.MultimodalOps.withHk49(
        ids.map(id => id -> Multimodal.clipGrid(id)).toDF("id", "pcm"), col("pcm"), "fp")
      .select(col("id"), col("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    val group = Seq(17L, 19L, 21L, 23L)
    for (a <- group; b <- group if a < b) {
      assert(ham(a, b) <= graft.operators.MultimodalOps.AudHammingMax,
        s"variant pair ($a,$b) too far: ${ham(a, b)}")
      val sharesBand = graft.operators.MultimodalOps.AudBandDefs.exists {
        case (shift, width) =>
          ((fps(a) >> shift) & ((1L << width) - 1)) == ((fps(b) >> shift) & ((1L << width) - 1))
      }
      assert(sharesBand, s"variant pair ($a,$b) has no clean band")
    }
    assert(ham(17L, 49L) > graft.operators.MultimodalOps.AudHammingMax,
      s"unrelated pair too close: ${ham(17L, 49L)}")
  }

  test("downscaleImages really decodes, average-pools, and re-encodes") {
    import spark.implicits._
    val docs = Seq((4L, "a", 1L)).toDF("doc_id", "text", "n_chars")
    val down = Multimodal.downscaleImages(Multimodal.synthesizeImages(docs), factor = 2)
      .collect().head
    assert(down.width == 8 && down.height == 8)
    val outLuma = Multimodal.decodePngLuma(down.payload)
    val src = refLuma(4L)
    val expect = Array.tabulate(64) { i =>
      val (bx, by) = (i % 8, i / 8)
      val s = src(2 * by * 16 + 2 * bx) + src(2 * by * 16 + 2 * bx + 1) +
        src((2 * by + 1) * 16 + 2 * bx) + src((2 * by + 1) * 16 + 2 * bx + 1)
      s / 4
    }
    assert(outLuma.sameElements(expect))
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
