package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The store-served retrieval family behind the `/search` gateway route:
  * BM25, RM3 expansion, and the MaxSim rerank served off the DURABLE tf
  * store ([[streaming.IndexMaintenance.searchFromStore]] /
  * [[streaming.IndexMaintenance.maxSimFromStore]]) must equal the batch
  * operators over the same corpus — across appends, a crash replay, and
  * takedown purges (a purged doc neither serves as a query nor appears
  * in any result). Each test uses a fresh session + store root, the
  * IndexStoreSpec discipline.
  */
class RetrievalServeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def freshStore(prefix: String): org.apache.spark.sql.SparkSession = {
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, tmp(prefix))
    sA
  }

  private def searchKey(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(r.fieldIndex("q_id")), r.getInt(r.fieldIndex("rk")),
      r.getLong(r.fieldIndex("doc_id")))).toSeq

  test("maxSimFromStore equals batch q160 across streamed appends and a crash replay") {
    val sA = freshStore("graft_rsv_maxsim")
    val docs = Tables.load(sA, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 6) div 10 AS t").collect()(0).getLong(0)
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir,
      docs.filter(col("doc_id") < t))
    // two appended increments with an exactly-once replay probe between
    val inc = docs.filter(col("doc_id") >= t).select("doc_id", "text")
    val mid = docs.selectExpr("(max(doc_id) * 8) div 10 AS m").collect()(0).getLong(0)
    assert(streaming.IndexMaintenance.applyTfBatch(sA, dir, "rsv_ms", 0L,
      inc.filter(col("doc_id") < mid)))
    assert(!streaming.IndexMaintenance.applyTfBatch(sA, dir, "rsv_ms", 0L,
      inc.filter(col("doc_id") < mid)), "replayed batch id must be skipped")
    assert(streaming.IndexMaintenance.applyTfBatch(sA, dir, "rsv_ms", 1L,
      inc.filter(col("doc_id") >= mid)))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val served = key(streaming.IndexMaintenance.maxSimFromStore(sA, dir))
    val batch = key(operators.CorpusOps.maxSimTopK(sA, dir))
    assert(served.nonEmpty && served == batch,
      "store-served MaxSim must equal the batch q160 operator")
  }

  test("searchFromStore more-like-this equals the batch BM25 slice; expand=rm3 equals q163") {
    val sA = freshStore("graft_rsv_search")
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    // plain BM25, one query doc: the served rows are the batch q130 rank
    // list restricted to that q_id (same bag pruning, same integer
    // scores — "score" is q130's bm25_micro)
    val served = streaming.IndexMaintenance.searchFromStore(sA, dir, docId = Some(3L))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = operators.CorpusOps.bm25TopK(sA, dir)
      .filter(col("q_id") === 3L)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(4))).toSeq
    assert(served.nonEmpty && served == batch,
      "served more-like-this must equal the batch q130 slice")
    // RM3 expansion: equals the batch q163 slice for the same query
    val servedX = streaming.IndexMaintenance.searchFromStore(sA, dir,
        docId = Some(3L), expand = true)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val batchX = SparkEntry.queries("q163_prf_expansion")(sA, dir)
      .filter(col("q_id") === 3L)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(4))).toSeq
    assert(servedX.nonEmpty && servedX == batchX,
      "served expand=rm3 must equal the batch q163 slice")
    // a doc id the corpus never held answers 0 rows, not an error
    assert(streaming.IndexMaintenance.searchFromStore(sA, dir,
      docId = Some(999999L)).isEmpty)
  }

  test("searchFromStore term-bag query equals the bag scorer over batch tf; unknown terms drop") {
    val sA = freshStore("graft_rsv_terms")
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    // a real phrase from the corpus (doc 3's first three tokens)
    val phrase = docs.filter(col("doc_id") === 3L)
      .select(concat_ws(" ", slice(functions.TextFunctions.tokens(col("text")), 1, 3)))
      .collect()(0).getString(0)
    assert(phrase.split(" ").length == 3)
    val served = searchKey(streaming.IndexMaintenance.searchFromStore(sA, dir,
      qTerms = Seq(phrase)))
    assert(served.nonEmpty && served.forall(_._1 == -1L),
      "term queries carry the synthetic q_id = -1")
    // expected: the shared bag scorer over the BATCH tf rows with the
    // identically normalized distinct bag
    val tf = operators.CorpusOps.tfRows(docs)
    val (dfF, dl, tot) = operators.CorpusOps.tfStats(tf)
    val nT = sA.range(1).select(lit(docs.count()).cast("long").as("n"))
    import sA.implicits._
    val bag = Seq(phrase).toDF("raw")
      .select(explode(functions.TextFunctions.tokens(col("raw"))).as("term"))
      .distinct().join(dfF, "term")
      .select(lit(-1L).as("q_id"), col("term"), lit(1L).as("mw"), col("df"))
    val expect = searchKey(operators.CorpusOps.bm25OverBags(tf, nT, bag, dl, tot,
      operators.CorpusOps.Bm25K, "score"))
    assert(served == expect, "served term query must equal the batch bag scorer")
    // an all-unknown bag has no posting lists: 0 rows, not an error
    assert(streaming.IndexMaintenance.searchFromStore(sA, dir,
      qTerms = Seq("zzz_never_a_token qqq_nor_this")).isEmpty)
  }

  test("searchFromStore rerank=maxsim equals the library rerank over the BM25 candidates") {
    val sA = freshStore("graft_rsv_rerank")
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    val served = streaming.IndexMaintenance.searchFromStore(sA, dir,
        docId = Some(3L), rerank = Some("maxsim"))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    // expected: the same two-stage computation over batch tf — BM25
    // candidates at MaxSimCand depth, MaxSim rerank over the same bag
    val tf = operators.CorpusOps.tfRows(docs)
    val (dfF, dl, tot) = operators.CorpusOps.tfStats(tf)
    val nT = sA.range(1).select(lit(docs.count()).cast("long").as("n"))
    val bag = operators.CorpusOps.rarestBags(tf.filter(col("doc_id") === 3L), dfF,
      operators.CorpusOps.Bm25QTerms)
    val cand = operators.CorpusOps.bm25OverBags(tf, nT, bag, dl, tot,
        operators.CorpusOps.MaxSimCand, "score")
      .select(col("q_id"), col("doc_id"))
    val expect = operators.CorpusOps.maxSimRerank(tf, dfF,
        bag.select(col("q_id"), col("term")), cand, operators.CorpusOps.Bm25K)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(served.nonEmpty && served == expect,
      "served rerank=maxsim must equal the library two-stage computation")
  }

  test("takedown: a purged doc neither serves as a query nor appears in any retrieval result") {
    val sA = freshStore("graft_rsv_purge")
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    val nDocs = docs.count()
    // purge the current top-1 answer of query doc 3 plus one more doc
    val top1 = streaming.IndexMaintenance.searchFromStore(sA, dir, docId = Some(3L))
      .collect().head.getLong(2)
    val victims = Seq(top1, nDocs - 1)
    IndexStore.purgeKeys(sA, dir, streaming.IndexMaintenance.TfStoreName,
      "doc_id", victims, countDecrement = victims.size)
    // as a query: empty, not an error
    assert(streaming.IndexMaintenance.searchFromStore(sA, dir,
      docId = Some(top1)).isEmpty, "a purged doc must not serve as a query")
    // as results: excluded from BM25, RM3, and MaxSim serves — and the
    // post-purge answers equal batch over the surviving corpus
    val surv = docs.filter(!col("doc_id").isin(victims: _*))
    val tf = operators.CorpusOps.tfRows(surv)
    val (dfF, dl, tot) = operators.CorpusOps.tfStats(tf)
    val nT = sA.range(1).select(lit(nDocs - victims.size).cast("long").as("n"))
    val served = streaming.IndexMaintenance.searchFromStore(sA, dir, docId = Some(3L))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(served.nonEmpty && !served.exists(r => victims.contains(r._2)),
      "purged docs must not appear in served BM25 results")
    val bag = operators.CorpusOps.rarestBags(tf.filter(col("doc_id") === 3L), dfF,
      operators.CorpusOps.Bm25QTerms)
    val expect = operators.CorpusOps.bm25OverBags(tf, nT, bag, dl, tot,
        operators.CorpusOps.Bm25K, "score")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(4))).toSeq
    assert(served == expect,
      "post-purge served BM25 must equal batch over the surviving corpus")
    val ms = streaming.IndexMaintenance.maxSimFromStore(sA, dir)
      .collect().map(_.getLong(2)).toSet
    assert(ms.nonEmpty && ms.intersect(victims.toSet).isEmpty,
      "purged docs must not appear in served MaxSim results")
  }
}
