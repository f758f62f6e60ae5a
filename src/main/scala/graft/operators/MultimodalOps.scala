package graft.operators

import graft.{QuerySpec, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Oracle-checked differential test of the multimodal plumbing: documents →
  * binary media rows → typed mapPartitions decode (stub codec) → feature
  * columns. DuckDB recomputes the deterministic fake (md5 digest bytes
  * scaled into [0,1]) directly, verifying the whole typed-Dataset path —
  * encoders, binary payload round-trip, per-partition decoder init, feature
  * array shape.
  */
object MultimodalOps {

  /** q111 frames sampled per media payload. */
  private[operators] val Frames = 4

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q46_multimodal_features") {
      val fCols = (0 until Multimodal.FeatureDim)
        .map(i => s"CAST('0x' || substr(md5(text), ${1 + 2 * i}, 2) AS BIGINT) / 255.0 AS f$i")
        .mkString(",\n        |  ")
      s"""SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        |  strlen(text) AS n_bytes,
        |  $fCols
        |FROM documents
        |ORDER BY media_id""".stripMargin
    } { (s, dir) =>
      import s.implicits._
      val media = Multimodal
        .synthesizeFromDocuments(Tables.load(s, dir, "documents"))
        .as[Multimodal.MediaRow]
      val feats = Multimodal.decodeFeatures(media).toDF()
      feats.select(
          Seq(col("media_id"), col("media_type"), col("n_bytes").cast("bigint").as("n_bytes")) ++
            (0 until Multimodal.FeatureDim).map(i => col("features").getItem(i).as(s"f$i")): _*)
        .orderBy(col("media_id"))
    },

    // ----- frame sampling, oracle-checked on the slicing arithmetic -------
    // [[Multimodal.sampleFrames]] run as a query: n evenly spaced payload
    // slices per media row (the video keyframe-sample shape). The oracle
    // recomputes the BYTE arithmetic — frame count min(n, len), step
    // max(len/n, 1), per-frame length min(f·step+step, len) − f·step —
    // over octet_length of the UTF-8 payload (integer-exact cross-engine;
    // the BYTES themselves ride the typed spec in MultimodalSpec, since
    // DuckDB's md5 is VARCHAR-only and the zh fixture rows are
    // multi-byte). Differential on exactly the part a stub can get wrong:
    // boundary/short-payload slicing.
    QuerySpec("q111_frame_sample")(
      s"""WITH m AS (SELECT doc_id AS media_id,
        |             octet_length(encode(text)) AS len
        |           FROM documents),
        |f AS (SELECT media_id, len, greatest(len // ${MultimodalOps.Frames}, 1) AS step,
        |        unnest(generate_series(0, least(${MultimodalOps.Frames}, len) - 1)) AS frame_no
        |      FROM m)
        |SELECT media_id, frame_no,
        |  CAST(least(frame_no * step + step, len) - frame_no * step AS BIGINT) AS frame_len
        |FROM f ORDER BY media_id, frame_no""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Multimodal
        .synthesizeFromDocuments(Tables.load(s, dir, "documents"))
        .as[Multimodal.MediaRow]
      Multimodal.sampleFrames(media, MultimodalOps.Frames)
        .select(col("media_id"), col("frame_no").cast("bigint").as("frame_no"),
          length(col("frame_bytes")).cast("bigint").as("frame_len"))
        .orderBy(col("media_id"), col("frame_no"))
    }
  )
}
