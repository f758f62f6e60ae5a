package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The trainer-facing JSONL shard export: file layout, line validity, and
  * exact agreement with the oracle-checked q69 manifest and q64 train
  * membership.
  */
class JsonlExportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("JSONL shards round-trip and agree with the q69 manifest") {
    val out = Files.createTempDirectory("graft_jsonl").toFile.getAbsolutePath
    val manifest = operators.CorpusClean.exportJsonlShards(spark, dir, out)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // the returned manifest IS q69's
    val q69 = SparkEntry.queries("q69_export_shards")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(manifest == q69, "export manifest must equal the q69 oracle-checked manifest")

    // physical layout: one shard directory per manifest row, text files
    val shardDirs = new java.io.File(out).list().filter(_.startsWith("shard=")).sorted
    assert(shardDirs.map(_.stripPrefix("shard=").toLong).toSet == manifest.keySet)

    // every line parses as JSON with the expected fields; per-shard doc
    // counts match the manifest; membership matches q64's train split
    val lines = spark.read.text(s"$out/shard=*")
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING," +
            " quality_micro BIGINT, n_tokens BIGINT")).as("j"))
      .select("j.*")
    assert(lines.filter(col("doc_id").isNull).count() == 0, "unparseable JSONL line")
    assert(lines.count() == manifest.values.map(_._1).sum)

    val exportedDocs = lines.select("doc_id").collect().map(_.getLong(0)).toSet
    val trainDocs = SparkEntry.queries("q64_corpus_clean")(spark, dir)
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exportedDocs == trainDocs, "exported docs must be exactly the cleaned train split")

    // byte-determinism: in-file order is doc_id-ascending per shard
    val first = spark.read.text(s"$out/shard=${manifest.keySet.min}")
      .select(get_json_object(col("value"), "$.doc_id").cast("long").as("d"))
      .collect().map(_.getLong(0))
    assert(first.toSeq == first.sorted.toSeq, "shard file must be doc_id-sorted")
  }
}
