package graft

import org.apache.spark.sql.functions._

/** Pins the scale-fixture generator's PLANTED shared-vocabulary stratum —
  * the mechanism that keeps the vocabulary-coverage workload (q67)
  * non-vacuous at any factor (SCALE.md round-14). The stratum is
  * load-bearing for sweep evidence, so its invariants get a spec:
  * deterministic regeneration, the ~10% plant rate, the bounded global
  * g-vocabulary, preserved per-doc token counts, and replica-prefixed
  * text everywhere else.
  */
class DataGenSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.01"

  test("documents replication: planted stratum is deterministic, bounded-vocab, and token-count-preserving") {
    val out1 = java.nio.file.Files.createTempDirectory("graft_dg1").toFile.getAbsolutePath
    val out2 = java.nio.file.Files.createTempDirectory("graft_dg2").toFile.getAbsolutePath
    DataGen.generate(spark, src, out1, factor = 2)
    DataGen.generate(spark, src, out2, factor = 2)

    val docs = spark.read.parquet(s"$out1/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars")).cache()
    val base = Tables.load(spark, src, "documents")
    val nBase = base.count()
    // the replica shift span is max(doc_id)+1, not the row count — fold
    // replicated ids back with the same arithmetic DataGen shifted with
    val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    assert(docs.count() == 2 * nBase, "factor 2 doubles the document count")

    // regeneration is byte-identical (pure hash functions of doc_id)
    val docs2 = spark.read.parquet(s"$out2/documents.parquet")
      .select(col("doc_id"), col("text"))
    assert(docs.select(col("doc_id"), col("text")).except(docs2).isEmpty &&
      docs2.except(docs.select(col("doc_id"), col("text"))).isEmpty,
      "two generations of the same factor must be identical")

    // replica 0 reproduces the source corpus byte-for-byte (the ADVICE-r14
    // exemption: factor=1 generation = the source, and the driver's
    // un-planted sf0.1 fixture stays homologous with generated sf1/sf2)
    val rep0 = docs.filter(col("doc_id") < span).select(col("doc_id"), col("text"))
    assert(rep0.except(base.select(col("doc_id"), col("text"))).isEmpty &&
      base.select(col("doc_id"), col("text")).except(rep0).isEmpty,
      "replica 0 must be byte-identical to the source corpus")

    // partition the output into planted / unplanted by content shape
    val withKind = docs.withColumn("tok", split(col("text"), "\\s+"))
      .withColumn("is_g", forall(col("tok"), t => t.rlike("^g[0-9]{2}$")))
    val planted = withKind.filter(col("is_g")).cache()
    val nPlanted = planted.count()
    // hash-rate tolerance: 10% ± 3 percentage points of the PLANT-ELIGIBLE
    // mass (replicas i ≥ 1 — here just replica 1's nBase docs)
    val rate = nPlanted.toDouble / nBase
    assert(rate > 0.07 && rate < 0.13, f"plant rate $rate%.3f outside the 10%% band")
    assert(planted.filter(col("doc_id") < span).count() == 0,
      "replica 0 must carry no planted docs")

    // the g-vocabulary is exactly the bounded global family
    val gTypes = planted.select(explode(col("tok")).as("t")).distinct().collect().map(_.getString(0))
    assert(gTypes.forall(_.matches("^g[0-9]{2}$")) && gTypes.length <= 32,
      s"plant vocabulary escaped g00..g31: ${gTypes.filterNot(_.matches("^g[0-9]{2}$")).take(3).mkString(",")}")

    // token counts are preserved doc-for-doc (the length-keyed workload
    // shape survives the rewrite); n_chars matches the rewritten text
    val baseTok = base.select((col("doc_id") % span).as("k"), size(split(col("text"), "\\s+")).as("n0"))
      .groupBy(col("k")).agg(first(col("n0")).as("n0"))
    val badCounts = withKind.select((col("doc_id") % span).as("k"), size(col("tok")).as("n1"))
      .join(baseTok, "k").filter(col("n1") =!= col("n0")).count()
    assert(badCounts == 0, s"$badCounts replicated docs changed token count")
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() == 0,
      "n_chars must track the rewritten text")

    // unplanted replica-1 docs are fully r1-prefixed (disjoint token space)
    val unplantedR1 = withKind.filter(!col("is_g") && col("doc_id") >= span)
    assert(unplantedR1.filter(!forall(col("tok"), t => t.startsWith("r1"))).count() == 0,
      "an unplanted replica-1 doc kept unprefixed tokens")
    docs.unpersist(); planted.unpersist()
  }
}
