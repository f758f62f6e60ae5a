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
    }
  )
}
