package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The durable index tier ([[IndexStore]]): build in one session, serve in
  * ANOTHER from parquet — with zero re-shingling/re-fitting of
  * already-indexed data — and append increments so q74's incremental
  * near-dup truly costs O(increment) across sessions. `spark.newSession()`
  * gives the fresh-session identity ([[SessionCache]] keys on it) without
  * restarting the shared test JVM's context.
  */
class IndexStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def shingleContent(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap

  /** Root paths of every parquet relation in the frame's lineage. */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  test("shingle index: built in session A, served from disk in session B (no re-shingle)") {
    val root = tmp("graft_idx_roundtrip")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val built = operators.TextAnalysis.shingleIndex(sA, dir)
    val baseline = shingleContent(
      operators.TextAnalysis.docShingleSets(Tables.load(spark, dir, "documents")))
    assert(shingleContent(built) == baseline)
    val storePath = IndexStore.storePath(root, dir, operators.TextAnalysis.ShingleStoreName)
    assert(IndexStore.committed(sA, storePath), "build session must commit the store")

    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    val served = operators.TextAnalysis.shingleIndex(sB, dir)
    // Zero re-shingling: the served lineage is a columnar scan of the
    // store parquet — the corpus documents table appears NOWHERE in it.
    val paths = scanPaths(served)
    assert(paths.exists(_.contains(storePath)), s"expected store scan, got: $paths")
    assert(!paths.exists(_.contains("documents.parquet")),
      s"served index must not re-read the corpus: $paths")
    assert(shingleContent(served) == baseline)
  }

  test("q74 probes yesterday's store + today's appended batch across sessions") {
    val root = tmp("graft_idx_incr")
    val docs = Tables.load(spark, dir, "documents")
    // The same integer threshold q74 derives: the top-20%-of-id slice is
    // "today's batch"; everything below is yesterday's indexed corpus.
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)

    // Session A (yesterday): index ONLY the old corpus slice.
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    IndexStore.servedFrom(sA, dir, operators.TextAnalysis.ShingleStoreName)(
      operators.TextAnalysis.docShingleSets(
        Tables.load(sA, dir, "documents").filter(col("doc_id") < t)))

    // Session B (today): append the increment's shingle sets — O(increment)
    // shingling — then run the incremental near-dup off the loaded store.
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    operators.TextAnalysis.appendToShingleIndex(sB, dir,
      Tables.load(sB, dir, "documents").filter(col("doc_id") >= t))
    val served = operators.TextAnalysis.shingleIndex(sB, dir)
    val paths = scanPaths(served)
    assert(!paths.exists(_.contains("documents.parquet")),
      s"old docs must never be re-shingled in the serving session: $paths")
    assert(shingleContent(served) ==
      shingleContent(operators.TextAnalysis.docShingleSets(docs)))

    val viaStore = SparkEntry.queries("q74_incremental_neardup")(sB, dir)
      .collect().map(_.toSeq).toSeq
    val direct = SparkEntry.queries("q74_incremental_neardup")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(viaStore == direct, "incremental-over-store must equal full recompute")
  }

  test("SRP rows and IVF model round-trip the store; q40/q53 results unchanged") {
    val root = tmp("graft_idx_srp")
    def results(s: org.apache.spark.sql.SparkSession, q: String) =
      SparkEntry.queries(q)(s, dir).collect().map(_.toSeq).toSeq

    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val q40A = results(sA, "q40_ann_lsh")
    val q53A = results(sA, "q53_ann_ivf")
    assert(IndexStore.committed(sA, IndexStore.storePath(root, dir, "srp_buckets")))
    assert(IndexStore.committed(sA, IndexStore.storePath(root, dir, "ivf_model")))

    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    assert(results(sB, "q40_ann_lsh") == q40A)
    assert(results(sB, "q53_ann_ivf") == q53A)
    // and both equal the storeless in-session build
    assert(results(spark, "q40_ann_lsh") == q40A)
    assert(results(spark, "q53_ann_ivf") == q53A)
  }

  test("SRP index append: new embedding batch probes yesterday's store (q47 unchanged)") {
    val root = tmp("graft_idx_srp_incr")
    val emb = Tables.load(spark, dir, "embeddings")
    val t = emb.selectExpr("(max(vec_id) * 8) div 10 AS t").collect()(0).getLong(0)

    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    IndexStore.servedFrom(sA, dir, operators.Similarity.SrpStoreName)(
      operators.Similarity.srpRows(
        Tables.load(sA, dir, "embeddings").filter(col("vec_id") < t)))

    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    operators.Similarity.appendToSrpIndex(sB, dir,
      Tables.load(sB, dir, "embeddings").filter(col("vec_id") >= t))
    val viaStore = SparkEntry.queries("q47_embedding_neardup")(sB, dir)
      .collect().map(_.toSeq).toSeq
    val direct = SparkEntry.queries("q47_embedding_neardup")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(viaStore == direct, "append-then-serve must equal full recompute")
  }
}
