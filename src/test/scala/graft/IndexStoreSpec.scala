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
    operators.TextAnalysis.buildShingleIndex(sA, dir,
      Tables.load(sA, dir, "documents").filter(col("doc_id") < t))

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
    operators.Similarity.buildSrpIndex(sA, dir,
      Tables.load(sA, dir, "embeddings").filter(col("vec_id") < t))

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

  test("SRP append reuses the BUILD's plane family from store metadata (derived planes)") {
    val root = tmp("graft_idx_srp_planes")
    val emb = Tables.load(spark, dir, "embeddings")
    val t = emb.selectExpr("(max(vec_id) * 8) div 10 AS t").collect()(0).getLong(0)
    // A non-default plane family — the value derivePlanes gives a real
    // 500k-row corpus. Pre-metadata appends bucketed increments with the
    // fixture constant (4), silently mixing two incompatible families.
    val pp = operators.Sizing.derivePlanes(500_000L)
    assert(pp != 4, s"test needs a non-default plane count, got $pp")

    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.Similarity.buildSrpIndex(sA, dir, emb.filter(col("vec_id") < t), pp)
    val storePath = IndexStore.storePath(root, dir, operators.Similarity.SrpStoreName)
    assert(IndexStore.readMeta(sA, storePath).flatMap(_.get("planes")).contains(pp.toString))

    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    operators.Similarity.appendToSrpIndex(sB, dir, emb.filter(col("vec_id") >= t))
    // Serve old∪new under the build's family and compare against a full
    // recompute under the SAME family: identical near-dup pairs.
    val served = operators.Similarity.buildSrpIndex(sB, dir, emb, pp)
    val viaStore = operators.Similarity.neardupPairs(emb, served, 0.5)
      .collect().map(_.toSeq).toSeq
    val direct = operators.Similarity.neardupPairs(
      emb, operators.Similarity.srpRows(emb, pp), 0.5)
      .collect().map(_.toSeq).toSeq
    assert(viaStore == direct,
      "append under the build's plane family must equal full recompute")
  }

  test("append to a store without metadata is refused, not silently mis-bucketed") {
    val root = tmp("graft_idx_srp_bare")
    val emb = Tables.load(spark, dir, "embeddings")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    // a bare pre-metadata store: parquet + _SUCCESS but no sidecar
    operators.Similarity.srpRows(emb).write.mode("overwrite")
      .parquet(IndexStore.storePath(root, dir, operators.Similarity.SrpStoreName))
    val e = intercept[IllegalStateException] {
      operators.Similarity.appendToSrpIndex(sA, dir, emb.limit(10))
    }
    assert(e.getMessage.contains("metadata"))
  }

  test("geometry mismatch rebuilds: a store built under other planes never serves q47") {
    val root = tmp("graft_idx_srp_geom")
    val emb = Tables.load(spark, dir, "embeddings")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.Similarity.buildSrpIndex(sA, dir, emb, planesPerTable = 9)
    val storePath = IndexStore.storePath(root, dir, operators.Similarity.SrpStoreName)
    assert(IndexStore.readMeta(sA, storePath).flatMap(_.get("planes")).contains("9"))

    // q47 requests the fixture family (4 planes): the 9-plane store must
    // REBUILD, not serve incomparable bucket ids.
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    val viaStore = SparkEntry.queries("q47_embedding_neardup")(sB, dir)
      .collect().map(_.toSeq).toSeq
    val direct = SparkEntry.queries("q47_embedding_neardup")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(viaStore == direct)
    assert(IndexStore.readMeta(sB, storePath).flatMap(_.get("planes")).contains("4"),
      "the store must have been rebuilt under the requested family")
  }

  test("corpus-count drift rebuilds the shingle store (loud staleness tripwire)") {
    val root = tmp("graft_idx_stale")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 6) div 10 AS t").collect()(0).getLong(0)

    // Yesterday's store covers only 60% of the corpus and — unlike the
    // incremental test — no append ever advanced its count: the corpus
    // mutated out-of-band relative to the store.
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.TextAnalysis.buildShingleIndex(sA, dir, docs.filter(col("doc_id") < t))

    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    val served = operators.TextAnalysis.shingleIndex(sB, dir)
    // the stale 60% store must NOT be served: content equals the full
    // corpus's sets (i.e. the index was rebuilt)
    assert(shingleContent(served) == shingleContent(operators.TextAnalysis.docShingleSets(docs)))
    val storePath = IndexStore.storePath(root, dir, operators.TextAnalysis.ShingleStoreName)
    assert(IndexStore.readMeta(sB, storePath).flatMap(_.get(IndexStore.CorpusCountKey))
      .contains(docs.count().toString))
  }

  test("a torn sidecar write (tmp without rename) reads as no-metadata and rebuilds") {
    val root = tmp("graft_idx_torn")
    val emb = Tables.load(spark, dir, "embeddings")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.Similarity.buildSrpIndex(sA, dir, emb)
    val storePath = IndexStore.storePath(root, dir, operators.Similarity.SrpStoreName)
    assert(IndexStore.readMeta(sA, storePath).isDefined)

    // Simulate a crash mid-writeMeta: the published sidecar is gone and
    // only the in-flight `.tmp` remains (writeMeta stages bytes there and
    // publishes by rename, so this IS the worst on-disk state a crash can
    // leave — never a truncated `_graft_meta`).
    val p = new org.apache.hadoop.fs.Path(storePath, "_graft_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(storePath, "_graft_meta.tmp")))
    assert(IndexStore.readMeta(sA, storePath).isEmpty,
      "a torn sidecar must read as no metadata")

    // A tracked load in a new session rebuilds and re-publishes the sidecar.
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    operators.Similarity.buildSrpIndex(sB, dir, emb)
    val meta = IndexStore.readMeta(sB, storePath)
    assert(meta.flatMap(_.get("planes")).contains("4"), s"rebuild must re-publish: $meta")
    assert(meta.flatMap(_.get(IndexStore.CorpusCountKey)).contains(emb.count().toString))
  }

  test("a torn append (parquet committed, sidecar lost) never serves silent duplicates") {
    val root = tmp("graft_idx_torn_append")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)
    val inc = docs.filter(col("doc_id") >= t)

    // build on the old slice, then append the increment CLEANLY
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.TextAnalysis.buildShingleIndex(sA, dir, docs.filter(col("doc_id") < t))
    operators.TextAnalysis.appendToShingleIndex(sA, dir, inc)

    // simulate an at-least-once REPLAY whose first attempt committed
    // parquet but crashed before the sidecar write: the increment's rows
    // land a second time, the sidecar does not move. The corpus count
    // alone can NOT catch this — it already matches the corpus.
    val storePath = IndexStore.storePath(root, dir, operators.TextAnalysis.ShingleStoreName)
    operators.TextAnalysis.docShingleSets(inc).write.mode("append").parquet(storePath)
    assert(IndexStore.readMeta(sA, storePath).flatMap(_.get(IndexStore.CorpusCountKey))
      .contains(docs.count().toString), "precondition: corpus count looks right")

    // the replayer's re-append must refuse loudly, not double the batch
    val e = intercept[IllegalStateException] {
      operators.TextAnalysis.appendToShingleIndex(sA, dir, inc)
    }
    assert(e.getMessage.contains("tore"), e.getMessage)

    // and a tracked load rebuilds: exactly one row per doc, no duplicates
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    val served = operators.TextAnalysis.shingleIndex(sB, dir)
    assert(served.count() == docs.count(), "rebuild must purge the duplicated batch")
    assert(shingleContent(served) ==
      shingleContent(operators.TextAnalysis.docShingleSets(docs)))
  }

  test("servedFrom evaluates the by-name corpusCount at most once per call") {
    val root = tmp("graft_idx_count_once")
    val s = spark.newSession()
    s.conf.set(IndexStore.DirConf, root)
    val emb = Tables.load(s, dir, "embeddings")
    var evals = 0
    def counted: Long = { evals += 1; emb.count() }
    // build path: staleness check + sidecar write share one evaluation
    IndexStore.servedFrom(s, dir, "count_once", Map("p" -> "1"), counted)(
      emb.select("vec_id"))
    assert(evals == 1, s"build path evaluated corpusCount $evals times")
    // load path: the staleness check is the single evaluation
    IndexStore.servedFrom(s, dir, "count_once", Map("p" -> "1"), counted)(
      emb.select("vec_id"))
    assert(evals == 2, s"build+load evaluated corpusCount $evals times")
  }

  test("buildSrpIndex derived-planes path adds no extra count job over the explicit path") {
    // Job-count parity via the status tracker (the one public async-safe
    // window onto job starts): the derived-planes build must share its
    // single count() between the plane derivation and servedFrom's
    // staleness/sidecar uses — i.e. run exactly as many jobs as an
    // explicit-planes build of the same index.
    def jobsInGroup(group: String)(f: => Unit): Int = {
      val sc = spark.sparkContext
      sc.setJobGroup(group, group)
      try f finally sc.clearJobGroup()
      // the status store is fed asynchronously; poll until stable
      var last = -1
      var cur = sc.statusTracker.getJobIdsForGroup(group).length
      var spins = 0
      while ((cur != last || cur == 0) && spins < 100) {
        Thread.sleep(100); last = cur
        cur = sc.statusTracker.getJobIdsForGroup(group).length
        spins += 1
      }
      cur
    }
    val emb = Tables.load(spark, dir, "embeddings")
    val pp = operators.Sizing.derivePlanes(emb.count())
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, tmp("graft_idx_jobs_derived"))
    val derived = jobsInGroup("graft-srp-derived") {
      operators.Similarity.buildSrpIndex(sA, dir, Tables.load(sA, dir, "embeddings"), 0)
    }
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, tmp("graft_idx_jobs_explicit"))
    val explicit = jobsInGroup("graft-srp-explicit") {
      operators.Similarity.buildSrpIndex(sB, dir, Tables.load(sB, dir, "embeddings"), pp)
    }
    assert(derived > 0 && derived == explicit,
      s"derived-planes build ran $derived jobs vs $explicit explicit — an extra count() leaked in")
  }

  test("streaming decontamination: per-batch pairs across a simulated crash equal q74 batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_decon")
    val pairsDir = tmp("graft_idx_decon_pairs")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)

    // bootstrap: the batch build covers the pre-stream corpus slice
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.TextAnalysis.buildShingleIndex(sA, dir,
      Tables.load(sA, dir, "documents").filter(col("doc_id") < t))

    // today's increment streams in TWO doc_id-ordered micro-batches
    import sA.implicits._
    implicit val sqlCtx = sA.sqlContext
    val inc = docs.filter(col("doc_id") >= t).select("doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = inc.splitAt(inc.length / 2)
    val input = MemoryStream[(Long, String)]
    val ckpt = tmp("graft_idx_decon_ck")
    val stream = "decon_spec"
    input.addData(b1.toSeq)
    val q1 = streaming.IndexMaintenance.maintainDecontaminatingIndex(
      input.toDF().toDF("doc_id", "text"), dir, pairsDir, ckpt, stream)
    q1.processAllAvailable()
    q1.stop() // simulated crash between batches

    // crash replay IN the exactly-once window: re-invoking the applied
    // batch id must skip both effects (pairs dir untouched, store
    // unchanged) — the marker guards the composition, not just the append
    def pairsSnapshot(): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$pairsDir/batch_id=0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = pairsSnapshot()
    val replayed = streaming.IndexMaintenance.decontaminateBatch(
      sA, dir, pairsDir, stream, 0L,
      Tables.load(sA, dir, "documents").filter(col("doc_id") >= t).limit(3)
        .select("doc_id", "text"))
    assert(!replayed, "an applied batch id must be skipped on replay")
    assert(pairsSnapshot() == before, "a skipped replay must not rewrite pairs")

    // restart from the SAME checkpoint with the rest of the stream
    input.addData(b2.toSeq)
    val q2 = streaming.IndexMaintenance.maintainDecontaminatingIndex(
      input.toDF().toDF("doc_id", "text"), dir, pairsDir, ckpt, stream)
    q2.processAllAvailable()
    q2.stop()

    // batch parity: the union of per-batch pair outputs equals q74's
    // whole-corpus incremental answer on the same fixtures
    val streamed = spark.read.parquet(s"$pairsDir/batch_id=*")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q74_incremental_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "fixture should contain incremental near-dup pairs")
    assert(streamed == batch,
      s"stream/batch divergence: missing=${batch -- streamed} extra=${streamed -- batch}")

    // and the store ended exactly once: served shingles == full corpus
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    assert(shingleContent(operators.TextAnalysis.shingleIndex(sB, dir)) ==
      shingleContent(operators.TextAnalysis.docShingleSets(docs)))
  }

  test("streaming maintenance: doc micro-batches keep the shingle store fresh; replays skip") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_maint_sh")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)

    // bootstrap: yesterday's batch build covers the old corpus slice
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.TextAnalysis.buildShingleIndex(sA, dir,
      Tables.load(sA, dir, "documents").filter(col("doc_id") < t))

    // today: the increment arrives as a stream, in two micro-batches
    import sA.implicits._
    implicit val sqlCtx = sA.sqlContext
    val input = MemoryStream[(Long, String)]
    val inc = docs.filter(col("doc_id") >= t).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = inc.splitAt(inc.length / 2)
    input.addData(b1.toSeq)
    val q = streaming.IndexMaintenance.maintainShingleIndex(
      input.toDF().toDF("doc_id", "text"), dir, tmp("graft_idx_maint_sh_ck"))
    q.processAllAvailable()
    input.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()

    // a fresh session serves old∪new from the store — zero re-shingling
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    val served = operators.TextAnalysis.shingleIndex(sB, dir)
    assert(!scanPaths(served).exists(_.contains("documents.parquet")))
    assert(shingleContent(served) ==
      shingleContent(operators.TextAnalysis.docShingleSets(docs)))

    // replay guard: re-applying an already-applied batch id is a no-op
    val storePath = IndexStore.storePath(root, dir, operators.TextAnalysis.ShingleStoreName)
    val metaBefore = IndexStore.readMeta(sB, storePath)
    val applied = streaming.IndexMaintenance.applyDocsBatch(
      sA, dir, "shingle_maintenance", 1L,
      Tables.load(sA, dir, "documents").limit(3))
    assert(!applied, "a replayed batch id must be skipped")
    assert(IndexStore.readMeta(sB, storePath) == metaBefore,
      "a skipped replay must not touch the sidecar")
  }

  test("streaming maintenance: SRP micro-batch appends serve q47 identically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_maint_srp")
    val emb = Tables.load(spark, dir, "embeddings")
    val t = emb.selectExpr("(max(vec_id) * 8) div 10 AS t").collect()(0).getLong(0)

    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.Similarity.buildSrpIndex(sA, dir,
      Tables.load(sA, dir, "embeddings").filter(col("vec_id") < t))

    import sA.implicits._
    implicit val sqlCtx = sA.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    input.addData(emb.filter(col("vec_id") >= t).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getSeq[Float](r.fieldIndex("embedding")))).toSeq)
    val q = streaming.IndexMaintenance.maintainSrpIndex(
      input.toDF().toDF("vec_id", "embedding"), dir, tmp("graft_idx_maint_srp_ck"))
    q.processAllAvailable()
    q.stop()

    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    val viaStore = SparkEntry.queries("q47_embedding_neardup")(sB, dir)
      .collect().map(_.toSeq).toSeq
    val direct = SparkEntry.queries("q47_embedding_neardup")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(viaStore == direct, "stream-maintained store must equal full recompute")
  }

  test("SRP append invalidates the session IVF model: the next serve re-runs the refresh policy") {
    val root = tmp("graft_idx_ivf_inval")
    val s = spark.newSession()
    s.conf.set(IndexStore.DirConf, root)
    val emb = Tables.load(s, dir, "embeddings")
    val n = emb.count()
    val slice = emb.filter(col("vec_id") < n / 10)
    // "yesterday": the store holds an SRP index and an IVF model that both
    // cover only the 10% slice
    operators.Similarity.buildSrpIndex(s, dir, slice)
    val modelPath = IndexStore.storePath(root, dir, "ivf_model")
    val m0 = operators.Ivf.fit(operators.Ivf.quantize(slice), 4)
    operators.Ivf.save(s, modelPath, m0)

    // first serve against the slice corpus: growth 1.0 → the stored model
    // serves, and the session cache now holds it
    val served0 = operators.Similarity.ivfModel(s, dir, operators.Ivf.quantize(slice))
    assert(served0.n == m0.n)

    // the append grows the indexed corpus 10x past the cached fit …
    operators.Similarity.appendToSrpIndex(s, dir, emb.filter(col("vec_id") >= n / 10))

    // … so the next serve IN THE SAME SESSION must re-run servedModel's
    // refresh policy against the grown corpus and refit (the bug this
    // pins: the session cache hit first and kept serving the slice-fit
    // centroids until a new session).
    val served1 = operators.Similarity.ivfModel(s, dir, operators.Ivf.quantize(emb))
    assert(served1.n == n,
      s"expected a refit on the 10x-grown corpus, served a model fit on ${served1.n} rows")
    assert(operators.Ivf.load(s, modelPath).exists(_.n == n),
      "the refit must also overwrite the stored model")
  }

  test("append records the grown store-rows with ONE full-store scan (the tripwire pre-check)") {
    val root = tmp("graft_idx_scan_once")
    val s = spark.newSession()
    s.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(s, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)
    operators.TextAnalysis.buildShingleIndex(s, dir, docs.filter(col("doc_id") < t))
    val storePath = IndexStore.storePath(root, dir, operators.TextAnalysis.ShingleStoreName)

    val before = IndexStore.fullStoreScans.get()
    operators.TextAnalysis.appendToShingleIndex(s, dir, docs.filter(col("doc_id") >= t))
    assert(IndexStore.fullStoreScans.get() - before == 1,
      "an append must footer-count the WHOLE store exactly once (the torn-append " +
        "pre-check) — the post-append record is recorded + the increment files' count")
    // and the O(increment) record is still exact: sidecar == actual rows
    assert(IndexStore.readMeta(s, storePath).flatMap(_.get(IndexStore.StoreRowsKey))
      .map(_.toLong).contains(s.read.parquet(storePath).count()))
  }

  test("compaction bounds the store's files; rows, sidecar and serving unchanged") {
    val root = tmp("graft_idx_compact")
    val s = spark.newSession()
    s.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(s, dir, "documents")
    val Array(t1, t2) = docs
      .selectExpr("(max(doc_id) * 6) div 10 AS t1", "(max(doc_id) * 8) div 10 AS t2")
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    // a build plus an append: the file count a long-lived maintainer grows
    operators.TextAnalysis.buildShingleIndex(s, dir, docs.filter(col("doc_id") < t1))
    operators.TextAnalysis.appendToShingleIndex(s, dir,
      docs.filter(col("doc_id") >= t1 && col("doc_id") < t2))
    val storePath = IndexStore.storePath(root, dir, operators.TextAnalysis.ShingleStoreName)
    def partFiles(): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(storePath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
    }
    val filesBefore = partFiles().size
    val metaBefore = IndexStore.readMeta(s, storePath)
    val rowsBefore = s.read.parquet(storePath).count()

    IndexStore.compact(s, dir, operators.TextAnalysis.ShingleStoreName)
    assert(partFiles().size == 1, s"default target must compact to one file, got ${partFiles()}")
    assert(partFiles().size < filesBefore, "compaction must actually shrink the file count")
    assert(IndexStore.readMeta(s, storePath) == metaBefore,
      "the sidecar (counts, params, markers) must ride the swap verbatim")
    assert(s.read.parquet(storePath).count() == rowsBefore)

    // the compacted store is still appendable (tripwire agrees) and a
    // fresh session serves old∪new == the full recompute
    operators.TextAnalysis.appendToShingleIndex(s, dir, docs.filter(col("doc_id") >= t2))
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    assert(shingleContent(operators.TextAnalysis.shingleIndex(sB, dir)) ==
      shingleContent(operators.TextAnalysis.docShingleSets(docs)))
  }

  test("maintainer replay after a torn-store rebuild: corpus-count tripwire flags the next tracked load") {
    // The documented recovery edge (IndexMaintenance scaladoc), pinned
    // end-to-end: torn store → tracked-load rebuild that already covers
    // the in-flight batch → restarted maintainer re-applies it as a NEW
    // append → the NEXT tracked load sees the corpus-count drift and
    // rebuilds (no silent duplicates survive).
    val root = tmp("graft_idx_replay_edge")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)
    val inc = docs.filter(col("doc_id") >= t)
    val stream = "shingle_maintenance"

    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    operators.TextAnalysis.buildShingleIndex(sA, dir, docs.filter(col("doc_id") < t))
    // the maintainer's batch 0 TEARS: parquet commits, the sidecar write
    // (count advance + batch marker) is lost
    val storePath = IndexStore.storePath(root, dir, operators.TextAnalysis.ShingleStoreName)
    operators.TextAnalysis.docShingleSets(inc).write.mode("append").parquet(storePath)

    // a restarted maintainer replaying batch 0 must REFUSE (store torn)
    val torn = intercept[IllegalStateException] {
      streaming.IndexMaintenance.applyDocsBatch(sA, dir, stream, 0L, inc)
    }
    assert(torn.getMessage.contains("tore"), torn.getMessage)

    // repair: a tracked load rebuilds from the FULL corpus — the rebuild
    // already covers the in-flight batch, and its fresh sidecar carries
    // no batch marker for the stream
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    assert(shingleContent(operators.TextAnalysis.shingleIndex(sB, dir)) ==
      shingleContent(operators.TextAnalysis.docShingleSets(docs)))
    assert(IndexStore.readMeta(sB, storePath)
      .forall(!_.contains(streaming.IndexMaintenance.markerKey(stream))))

    // the maintainer restarts with its old checkpoint: batch 0 re-applies
    // as a NEW append (marker gone — nothing refuses it) and double-counts
    val applied = streaming.IndexMaintenance.applyDocsBatch(sB, dir, stream, 0L, inc)
    assert(applied, "post-rebuild, the replayed batch lands as a new append")
    assert(IndexStore.readMeta(sB, storePath).flatMap(_.get(IndexStore.CorpusCountKey))
      .map(_.toLong).contains(docs.count() + inc.count()),
      "precondition: the sidecar now over-counts the corpus")

    // … and the NEXT tracked load flags the drift and rebuilds clean
    val sC = spark.newSession()
    sC.conf.set(IndexStore.DirConf, root)
    val served = operators.TextAnalysis.shingleIndex(sC, dir)
    assert(served.count() == docs.count(), "rebuild must purge the duplicated batch")
    assert(shingleContent(served) ==
      shingleContent(operators.TextAnalysis.docShingleSets(docs)))
    assert(IndexStore.readMeta(sC, storePath).flatMap(_.get(IndexStore.CorpusCountKey))
      .contains(docs.count().toString))
  }

  test("IVF refresh policy: ≥2x corpus growth refits; small drift serves the stored model") {
    val root = tmp("graft_idx_ivf_refresh")
    val s = spark.newSession()
    s.conf.set(IndexStore.DirConf, root)
    val emb = Tables.load(s, dir, "embeddings")
    val full = operators.Ivf.quantize(emb)
    val n = full.count()
    val path = IndexStore.storePath(root, dir, "ivf_model")

    // "yesterday": fit on a 10% slice (the verdict's append-10x scenario
    // inverted: the stored fit saw a tenth of today's corpus)
    val slice = operators.Ivf.quantize(emb.filter(col("vec_id") < n / 10))
    val m0 = operators.Ivf.fit(slice, 4)
    operators.Ivf.save(s, path, m0)
    assert(m0.n == slice.count())

    // "today": the corpus is 10x the stored fit → refit, store updated
    val m1 = operators.Ivf.servedModel(s, path, full, 4)
    assert(m1.n == n, s"expected a refit on 10x growth, served a model fit on ${m1.n}")
    assert(operators.Ivf.load(s, path).exists(_.n == n), "refit must overwrite the store")

    // small drift (stored n vs n, growth 1.0 < 2.0) → stored model serves
    val m2 = operators.Ivf.servedModel(s, path, full, 4)
    assert(m2.n == n)
    // structural centroid equality (Array == is reference identity)
    assert(m2.cents.map { case (c, a) => (c, a.toSeq) }
      == m1.cents.map { case (c, a) => (c, a.toSeq) })
  }

  test("streaming chunk dedup: per-batch dups across a simulated crash equal the batch removable set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_chunkdedup")
    val dupDir = tmp("graft_idx_chunkdedup_dups")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)

    // bootstrap: the batch build covers the pre-stream corpus slice
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    streaming.IndexMaintenance.bootstrapChunkStore(sA, dir,
      Tables.load(sA, dir, "documents").filter(col("doc_id") < t))

    // today's increment streams in TWO doc_id-ordered micro-batches
    import sA.implicits._
    implicit val sqlCtx = sA.sqlContext
    val inc = docs.filter(col("doc_id") >= t).select("doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = inc.splitAt(inc.length / 2)
    val input = MemoryStream[(Long, String)]
    val ckpt = tmp("graft_idx_chunkdedup_ck")
    val stream = "chunk_dedup_spec"
    input.addData(b1.toSeq)
    val q1 = streaming.IndexMaintenance.maintainChunkDedup(
      input.toDF().toDF("doc_id", "text"), dir, dupDir, ckpt, stream)
    q1.processAllAvailable()
    q1.stop() // simulated crash between batches

    // replay in the exactly-once window: skipped, dup dir untouched
    def dupSnapshot(batch: Int): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$dupDir/batch_id=$batch")
        .select("chunk_fp", "doc_id", "chunk_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val before = dupSnapshot(0)
    val replayed = streaming.IndexMaintenance.chunkDedupBatch(
      sA, dir, dupDir, stream, 0L,
      Tables.load(sA, dir, "documents").filter(col("doc_id") >= t).limit(3)
        .select("doc_id", "text"))
    assert(!replayed, "an applied batch id must be skipped on replay")
    assert(dupSnapshot(0) == before, "a skipped replay must not rewrite dups")

    // restart from the SAME checkpoint with the rest of the stream
    input.addData(b2.toSeq)
    val q2 = streaming.IndexMaintenance.maintainChunkDedup(
      input.toDF().toDF("doc_id", "text"), dir, dupDir, ckpt, stream)
    q2.processAllAvailable()
    q2.stop()

    // batch parity: the union of per-batch dup outputs equals "every chunk
    // occurrence except the globally first per fingerprint" over the full
    // corpus, first defined on the (doc_id, chunk_id) order the
    // append-only stream realizes
    val streamed = spark.read.parquet(s"$dupDir/batch_id=*")
      .select("chunk_fp", "doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val all = graft.operators.CorpusOps.chunkRows(docs)
      .select("chunk_fp", "doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    // every non-first occurrence per fp, split by where it lives: the
    // stream reports exactly the increment's share (dups wholly inside
    // the bootstrapped corpus were indexed, not streamed)
    val nonFirst = all.groupBy(_._1).values.flatMap { occ =>
      occ.sortBy(o => (o._2, o._3)).drop(1)
    }.toSet
    val expected = nonFirst.filter(_._2 >= t)
    assert(expected.nonEmpty, "fixture should contain duplicate chunks in the increment")
    assert(streamed == expected,
      s"stream/batch divergence: missing=${(expected -- streamed).take(3)} extra=${(streamed -- expected).take(3)}")

    // and the composition reconciles with q123: the batch report's total
    // removable = bootstrap-internal dups + every streamed dup
    val q123Removable = SparkEntry.queries("q123_chunk_dedup")(spark, dir)
      .collect().map(_.getLong(4)).sum
    assert(q123Removable == (nonFirst.size - expected.size) + streamed.size,
      "q123 removable must equal bootstrap dups + streamed dups")
  }

  test("chunk store records its chunker; CDC maintenance dedups on the CDC grid") {
    val root = tmp("graft_idx_cdcstore")
    val dupDir = tmp("graft_idx_cdcstore_dups")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)
    streaming.IndexMaintenance.bootstrapChunkStore(sA, dir,
      docs.filter(col("doc_id") < t), streaming.IndexMaintenance.CdcChunker)
    // the strategy travels in the sidecar — the maintainer resolves it
    // from the store, so a CDC bootstrap can never be maintained on the
    // stride grid
    assert(IndexStore.storedMeta(sA, dir, streaming.IndexMaintenance.ChunkStoreName)
      .exists(_.get("chunker").contains("cdc")))
    val applied = streaming.IndexMaintenance.chunkDedupBatch(sA, dir, dupDir,
      "cdc_chunk_spec", 0L, docs.filter(col("doc_id") >= t).select("doc_id", "text"))
    assert(applied)
    val got = sA.read.parquet(s"$dupDir/batch_id=0")
      .select("chunk_fp", "doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    // expectation on the CDC grid: every occurrence except the globally
    // first per fingerprint, restricted to the increment
    val all = operators.CorpusOps.cdcChunkRows(docs)
      .select("chunk_fp", "doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val expected = all.groupBy(_._1).values.flatMap { occ =>
      occ.sortBy(o => (o._2, o._3)).drop(1)
    }.toSet.filter(_._2 >= t)
    assert(expected.nonEmpty, "fixture should contain duplicate CDC chunks in the increment")
    assert(got == expected,
      s"CDC-grid divergence: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("PQ codebook store: fit in session A, served without refit in session B, q142 row-equal") {
    import graft.operators.{Ivf, Similarity}
    val root = tmp("graft_idx_pq")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val a = Similarity.pqModels(sA, dir, Ivf.quantize(Tables.load(sA, dir, "embeddings")))
    assert(a.length == 4 && a.forall(_.cents.length == 16))
    val path0 = IndexStore.storePath(root, dir, "pq_model_0")
    assert(IndexStore.committed(sA, path0), "codebook 0 not persisted")
    val filesBefore = new java.io.File(path0).listFiles().map(f => f.getName -> f.lastModified).toMap

    // session B with the same store: served codebooks are identical and
    // the store files are untouched (no refit)
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    val b = Similarity.pqModels(sB, dir, Ivf.quantize(Tables.load(sB, dir, "embeddings")))
    a.zip(b).foreach { case (ma, mb) =>
      assert(ma.cents.map(_._1) == mb.cents.map(_._1))
      ma.cents.zip(mb.cents).foreach { case ((_, ca), (_, cb)) =>
        assert(java.util.Arrays.equals(ca, cb), "served codebook diverges from the fit")
      }
    }
    val filesAfter = new java.io.File(path0).listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(filesAfter == filesBefore, "serving session B rewrote the codebook store")

    // and the full query is row-identical between a store-serving session
    // and a plain in-session fit
    val viaStore = SparkEntry.queries("q142_pq_recall")(sB, dir).collect().map(_.toString).toSeq
    val plain = SparkEntry.queries("q142_pq_recall")(spark, dir).collect().map(_.toString).toSeq
    assert(viaStore.nonEmpty && viaStore == plain)
  }

  test("streaming media maintenance: pair union and fp store equal the batch q136 answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.multimodal.Multimodal
    val root = tmp("graft_idx_media")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 6) div 10 AS t").collect()(0).getLong(0)

    // bootstrap on the pre-stream image slice (decode + hash once)
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    streaming.IndexMaintenance.bootstrapMediaFpStore(sA, dir,
      Multimodal.synthesizeImages(Tables.load(sA, dir, "documents").filter(col("doc_id") < t)))

    // the increment streams in TWO id-ordered micro-batches of ENCODED
    // PNG payloads, with a simulated crash-replay between them
    implicit val sqlCtx = sA.sqlContext
    import sA.implicits._
    val inc = Multimodal.synthesizeImages(docs.filter(col("doc_id") >= t))
      .collect().sortBy(_.media_id)
      .map(r => (r.media_id, r.payload, r.width, r.height))
    assert(inc.length >= 4, "fixture should stream at least 4 images")
    val (b1, b2) = inc.splitAt(inc.length / 2)
    val input = MemoryStream[(Long, Array[Byte], Int, Int)]
    val ckpt = tmp("graft_idx_media_ck")
    val pairsDir = tmp("graft_idx_media_pairs")
    val stream = "media_spec"
    input.addData(b1.toSeq)
    val q1 = streaming.IndexMaintenance.maintainMediaFpIndex(
      input.toDF().toDF("media_id", "payload", "width", "height"),
      dir, pairsDir, ckpt, stream)
    q1.processAllAvailable()
    q1.stop()

    // exactly-once: the replayed batch id is skipped, store rows unchanged
    val path = IndexStore.storePath(root, dir, operators.MultimodalOps.MediaFpStoreName)
    val rowsBefore = sA.read.parquet(path).count()
    val replayed = streaming.IndexMaintenance.mediaFpBatch(sA, dir, pairsDir,
      stream, 0L,
      Multimodal.synthesizeImages(
        Tables.load(sA, dir, "documents").filter(col("doc_id") >= t)).limit(2))
    assert(!replayed, "an applied batch id must be skipped on replay")
    assert(sA.read.parquet(path).count() == rowsBefore,
      "a skipped replay must not grow the store")

    // restart from the SAME checkpoint with the rest of the stream
    input.addData(b2.toSeq)
    val q2 = streaming.IndexMaintenance.maintainMediaFpIndex(
      input.toDF().toDF("media_id", "payload", "width", "height"),
      dir, pairsDir, ckpt, stream)
    q2.processAllAvailable()
    q2.stop()

    // the store holds exactly one decode-derived fingerprint per image …
    val stored = sA.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchFps = operators.MultimodalOps.imageFps(Multimodal.synthesizeImages(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == batchFps, "streamed store must equal the batch fingerprints")

    // … and the union of per-batch pair outputs equals the batch q136
    // answer restricted to pairs the increment introduced (higher end ≥ t
    // — the append-only contract)
    def pairKey(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getInt(2))
    val streamed = sA.read.parquet(pairsDir).drop("batch_id")
      .collect().map(pairKey).toSet
    val batchAnswer = SparkEntry.queries("q136_image_neardup")(spark, dir)
      .filter(col("b_id") >= t)
      .collect().map(pairKey).toSet
    assert(batchAnswer.nonEmpty, "fixture increment should introduce near-dup pairs")
    assert(streamed == batchAnswer,
      s"streamed pair union diverges: missing=${(batchAnswer -- streamed).take(3)} " +
        s"extra=${(streamed -- batchAnswer).take(3)}")
  }

  test("streaming tf maintenance: BM25 off the grown store equals the batch answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_tf")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)

    // bootstrap on the pre-stream corpus slice (carries the query docs)
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir,
      Tables.load(sA, dir, "documents").filter(col("doc_id") < t))

    // the increment streams in TWO doc_id-ordered micro-batches with a
    // simulated crash between them
    implicit val sqlCtx = sA.sqlContext
    import sA.implicits._
    val inc = docs.filter(col("doc_id") >= t).select("doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = inc.splitAt(inc.length / 2)
    val input = MemoryStream[(Long, String)]
    val ckpt = tmp("graft_idx_tf_ck")
    val stream = "tf_spec"
    input.addData(b1.toSeq)
    val q1 = streaming.IndexMaintenance.maintainTfIndex(
      input.toDF().toDF("doc_id", "text"), dir, ckpt, stream)
    q1.processAllAvailable()
    q1.stop()

    // exactly-once: the replayed batch id is skipped, store rows unchanged
    val path = IndexStore.storePath(root, dir, streaming.IndexMaintenance.TfStoreName)
    val rowsBefore = sA.read.parquet(path).count()
    val replayed = streaming.IndexMaintenance.applyTfBatch(sA, dir, stream, 0L,
      Tables.load(sA, dir, "documents").filter(col("doc_id") >= t).limit(3)
        .select("doc_id", "text"))
    assert(!replayed, "an applied batch id must be skipped on replay")
    assert(sA.read.parquet(path).count() == rowsBefore,
      "a skipped replay must not grow the store")

    // restart from the SAME checkpoint with the rest of the stream
    input.addData(b2.toSeq)
    val q2 = streaming.IndexMaintenance.maintainTfIndex(
      input.toDF().toDF("doc_id", "text"), dir, ckpt, stream)
    q2.processAllAvailable()
    q2.stop()

    // the store now holds exactly the corpus's (doc, term, tf) rows …
    val stored = sA.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batchTf = operators.CorpusOps.tfRows(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(stored == batchTf, "streamed store must equal the batch tf rows")

    // … and BM25 served off it is row-identical to the batch operator
    // (same queries, pruning, and integer scores — q130's contract)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val served = streaming.IndexMaintenance.bm25FromStore(sA, dir, 8L, 16, 10)
      .collect().map(key).toSeq
    val batch = operators.CorpusOps.bm25TopK(sA, dir).collect().map(key).toSeq
    assert(served == batch, "store-served BM25 must equal the batch answer")
    assert(served.nonEmpty)
  }

  test("streaming DSIR maintenance: store-served weights and shortlist equal batch q144") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_dsir")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 6) div 10 AS t").collect()(0).getLong(0)

    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    streaming.IndexMaintenance.bootstrapDsirStore(sA, dir,
      Tables.load(sA, dir, "documents").filter(col("doc_id") < t))

    // the increment streams in two micro-batches with a crash-replay probe
    implicit val sqlCtx = sA.sqlContext
    import sA.implicits._
    val inc = docs.filter(col("doc_id") >= t).select("doc_id", "text", "lang")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val (b1, b2) = inc.splitAt(inc.length / 2)
    val input = MemoryStream[(Long, String, String)]
    val ckpt = tmp("graft_idx_dsir_ck")
    val stream = "dsir_spec"
    input.addData(b1.toSeq)
    val q1 = streaming.IndexMaintenance.maintainDsirProfiles(
      input.toDF().toDF("doc_id", "text", "lang"), dir, ckpt, stream)
    q1.processAllAvailable()
    q1.stop()

    // exactly-once: replaying an applied batch id must not grow the store
    val path = IndexStore.storePath(root, dir, streaming.IndexMaintenance.DsirStoreName)
    val rowsBefore = sA.read.parquet(path).count()
    val replayed = streaming.IndexMaintenance.applyDsirBatch(sA, dir, stream, 0L,
      Tables.load(sA, dir, "documents").filter(col("doc_id") >= t).limit(3))
    assert(!replayed, "an applied batch id must be skipped on replay")
    assert(sA.read.parquet(path).count() == rowsBefore)

    input.addData(b2.toSeq)
    val q2 = streaming.IndexMaintenance.maintainDsirProfiles(
      input.toDF().toDF("doc_id", "text", "lang"), dir, ckpt, stream)
    q2.processAllAvailable()
    q2.stop()

    // weights off the grown store == the batch q144 weight derivation
    // (recomputed here from the full corpus through the same helpers)
    val servedW = streaming.IndexMaintenance.dsirWeightsFromStore(sA, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchProf = operators.CorpusOps.dsirProfileRows(
      Tables.load(sA, dir, "documents"))
    val batchW = operators.CorpusOps.dsirWeights(batchProf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(servedW == batchW, "store-served weights must equal batch weights")

    // … and the store-served shortlist over the same corpus equals q144
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val servedSel = streaming.IndexMaintenance.dsirSelectFromStore(sA, dir,
      Tables.load(sA, dir, "documents")).collect().map(key).toSeq
    val batchSel = SparkEntry.queries("q144_dsir_select")(sA, dir)
      .collect().map(key).toSeq
    assert(servedSel == batchSel, "store-served shortlist must equal q144")
    assert(servedSel.nonEmpty)
  }

  test("purgeKeys: doc purge from the tf store serves post-purge BM25 with a consistent sidecar") {
    val root = tmp("graft_idx_purge")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    val nDocs = docs.count()
    // purge two non-query docs (queries are doc_id < 8)
    val victims = docs.filter(col("doc_id") >= 8).orderBy(col("doc_id").desc)
      .limit(2).collect().map(_.getLong(0)).toSeq
    val victimRows = operators.CorpusOps.tfRows(
      docs.filter(col("doc_id").isin(victims: _*))).count()
    val path = IndexStore.storePath(root, dir, streaming.IndexMaintenance.TfStoreName)
    val rowsBefore = sA.read.parquet(path).count()

    val removed = IndexStore.purgeKeys(sA, dir,
      streaming.IndexMaintenance.TfStoreName, "doc_id", victims, countDecrement = 2)
    assert(removed == victimRows, "purge must remove exactly the victims' tf rows")
    assert(sA.read.parquet(path).count() == rowsBefore - victimRows)
    // no orphaned staging dir after a clean purge
    assert(!new java.io.File(path + ".purging").exists())
    // sidecar: store rows re-recorded, corpus count decremented (BM25's N)
    val meta = IndexStore.readMeta(sA, path).get
    assert(meta(IndexStore.StoreRowsKey).toLong == rowsBefore - victimRows)
    assert(meta(IndexStore.CorpusCountKey).toLong == nDocs - 2)

    // BM25 served off the purged store == batch BM25 over corpus-minus-victims
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val served = streaming.IndexMaintenance.bm25FromStore(sA, dir, 8L, 16, 10)
      .collect().map(key).toSeq
    val survivors = docs.filter(!col("doc_id").isin(victims: _*))
    val nT = sA.range(1).select(lit(nDocs - 2).cast("long").as("n"))
    val batch = operators.CorpusOps.bm25TopKOverTf(
        operators.CorpusOps.tfRows(survivors), nT, 8L, 16, 10)
      .collect().map(key).toSeq
    assert(served == batch, "post-purge BM25 must equal the batch answer on the surviving corpus")
    assert(served.nonEmpty)
    // the purged docs can no longer appear in any rank list
    assert(!served.exists(r => victims.contains(r._3)))
  }

  test("profile additivity: split-corpus increments sum to the whole-corpus profiles (DSIR + LM)") {
    // The correctness BASIS of both maintainers: profiles/bigram counts
    // are additive, so appending per-batch increments and summing at
    // serve time must equal the one-shot batch profile for ANY batching.
    val docs = Tables.load(spark, dir, "documents")
    val parts = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    def dsirMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      operators.CorpusOps.dsirProfileRows(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val whole = dsirMap(docs)
    val summed = parts.map(dsirMap).flatten
      .groupBy(_._1).map { case (b, xs) =>
        b -> ((xs.map(_._2._1).sum, xs.map(_._2._2).sum))
      }
    assert(summed == whole, "DSIR profile increments must sum to the batch profile")
    def bgMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      operators.CorpusOps.bigramBags(df)
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("c")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val wholeBg = bgMap(docs)
    val summedBg = parts.map(bgMap).flatten
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    assert(summedBg == wholeBg, "bigram increments must sum to the batch counts")
  }

  test("streaming LM maintenance: store-served model and scores equal batch q146") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_lm")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 6) div 10 AS t").collect()(0).getLong(0)

    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val pre = Tables.load(sA, dir, "documents").filter(col("doc_id") < t)
    streaming.IndexMaintenance.bootstrapLmStore(sA, dir, pre)
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, pre) // unigram side

    // BOTH maintainers attach to the same stream; two micro-batches with
    // a crash-replay probe on the LM side
    implicit val sqlCtx = sA.sqlContext
    import sA.implicits._
    val inc = docs.filter(col("doc_id") >= t).select("doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = inc.splitAt(inc.length / 2)
    val input = MemoryStream[(Long, String)]
    val ckptLm = tmp("graft_idx_lm_ck"); val ckptTf = tmp("graft_idx_lm_tfck")
    input.addData(b1.toSeq)
    val qa = streaming.IndexMaintenance.maintainLmBigrams(
      input.toDF().toDF("doc_id", "text"), dir, ckptLm, "lm_spec")
    val qb = streaming.IndexMaintenance.maintainTfIndex(
      input.toDF().toDF("doc_id", "text"), dir, ckptTf, "lm_tf_spec")
    qa.processAllAvailable(); qb.processAllAvailable(); qa.stop(); qb.stop()

    val lmPath = IndexStore.storePath(root, dir, streaming.IndexMaintenance.LmStoreName)
    val before = sA.read.parquet(lmPath).count()
    val replayed = streaming.IndexMaintenance.applyLmBatch(sA, dir, "lm_spec", 0L,
      Tables.load(sA, dir, "documents").filter(col("doc_id") >= t).limit(3))
    assert(!replayed && sA.read.parquet(lmPath).count() == before,
      "an applied batch id must be skipped on replay without growing the store")

    input.addData(b2.toSeq)
    val qa2 = streaming.IndexMaintenance.maintainLmBigrams(
      input.toDF().toDF("doc_id", "text"), dir, ckptLm, "lm_spec")
    val qb2 = streaming.IndexMaintenance.maintainTfIndex(
      input.toDF().toDF("doc_id", "text"), dir, ckptTf, "lm_tf_spec")
    qa2.processAllAvailable(); qb2.processAllAvailable(); qa2.stop(); qb2.stop()

    // the served model equals the batch model type for type …
    val servedM = streaming.IndexMaintenance.lmModelFromStore(sA, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("p_micro")).toMap
    val batchM = operators.CorpusOps.lmBigramModel(sA, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("p_micro")).toMap
    assert(servedM == batchM, "store-served LM model must equal the batch model")

    // … and scoring the whole corpus off the store equals q146 row for row
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val served = streaming.IndexMaintenance.lmScoreFromStore(sA, dir,
      Tables.load(sA, dir, "documents")).collect().map(key).toSeq
    val batch = SparkEntry.queries("q146_lm_score")(sA, dir).collect().map(key).toSeq
    assert(served == batch, "store-served LM scores must equal q146")
    assert(served.nonEmpty)
  }

  test("DSIR geometry tripwire: a sidecar built under different constants fails append and serve loudly") {
    val root = tmp("graft_idx_dsir_geom")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapDsirStore(sA, dir, docs)
    val path = IndexStore.storePath(root, dir, streaming.IndexMaintenance.DsirStoreName)

    // Simulate a version skew: the store was built by a binary whose
    // DsirBuckets constant differed from ours. Appending or serving under
    // the current constants would silently mix bucket spaces — both paths
    // must refuse instead.
    val meta = IndexStore.readMeta(sA, path).get
    IndexStore.writeMeta(sA, path, meta.updated("buckets", "1024"))
    val exServe = intercept[IllegalStateException] {
      streaming.IndexMaintenance.dsirWeightsFromStore(sA, dir)
    }
    assert(exServe.getMessage.contains("geometry drift"), exServe.getMessage)
    val exAppend = intercept[IllegalStateException] {
      streaming.IndexMaintenance.applyDsirBatch(sA, dir, "geom_spec", 0L, docs.limit(2))
    }
    assert(exAppend.getMessage.contains("geometry drift"), exAppend.getMessage)

    // Same refusal for a target-language change…
    IndexStore.writeMeta(sA, path, meta.updated("targetLang", "de"))
    assert(intercept[IllegalStateException] {
      streaming.IndexMaintenance.dsirWeightsFromStore(sA, dir)
    }.getMessage.contains("geometry drift"))
    // …and the pristine sidecar serves normally again.
    IndexStore.writeMeta(sA, path, meta)
    assert(streaming.IndexMaintenance.dsirWeightsFromStore(sA, dir).count() > 0)
  }

  test("LM snapshot tripwire: lmModelFromStore refuses when lm_bigrams and tf_index cover different corpora") {
    val root = tmp("graft_idx_lm_snap")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapLmStore(sA, dir, docs)
    // tf store bootstrapped over a LAGGING corpus (one batch behind)
    val t = docs.selectExpr("max(doc_id) AS t").collect()(0).getLong(0)
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs.filter(col("doc_id") < t))
    val ex = intercept[IllegalStateException] {
      streaming.IndexMaintenance.lmModelFromStore(sA, dir)
    }
    assert(ex.getMessage.contains("different corpus snapshots"), ex.getMessage)
    // catching the tf store up (same snapshot) serves normally
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    assert(streaming.IndexMaintenance.lmModelFromStore(sA, dir).count() > 0)
  }

  test("LM content-digest tripwire: equal counts of DIFFERENT batches refuse to serve") {
    val root = tmp("graft_idx_lm_digest")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 8) div 10 AS t").collect()(0).getLong(0)
    val pre = docs.filter(col("doc_id") < t)
    streaming.IndexMaintenance.bootstrapLmStore(sA, dir, pre)
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, pre)
    // both sidecars carry the bootstrap digest, and they agree
    def meta(name: String) = IndexStore.storedMeta(sA, dir, name).get
    val lmName = streaming.IndexMaintenance.LmStoreName
    val tfName = streaming.IndexMaintenance.TfStoreName
    assert(meta(lmName)(IndexStore.CorpusHashKey) == meta(tfName)(IndexStore.CorpusHashKey))

    // The residual the count check cannot see: each maintainer ingests a
    // batch of the SAME SIZE but DIFFERENT documents (a mis-wired fan-out
    // feeding the two maintainers from different topics). Counts agree;
    // the model would silently mix snapshots without the digest.
    val tail = docs.filter(col("doc_id") >= t).orderBy("doc_id")
    val n = tail.count()
    assert(n >= 2, s"fixture tail too small ($n) for a split")
    val half = tail.limit((n / 2).toInt).agg(max("doc_id")).collect()(0).getLong(0)
    val toLm = tail.filter(col("doc_id") <= half)
    val toTf = tail.filter(col("doc_id") > half).limit(toLm.count().toInt)
    assert(toLm.count() == toTf.count())
    assert(streaming.IndexMaintenance.applyLmBatch(sA, dir, "dg_spec", 0L, toLm))
    assert(streaming.IndexMaintenance.applyTfBatch(sA, dir, "dg_spec", 0L, toTf))
    assert(meta(lmName)(IndexStore.CorpusCountKey) == meta(tfName)(IndexStore.CorpusCountKey),
      "counts must agree — this is exactly the case the digest exists for")
    val ex = intercept[IllegalStateException] {
      streaming.IndexMaintenance.lmModelFromStore(sA, dir)
    }
    assert(ex.getMessage.contains("different corpus CONTENT"), ex.getMessage)

    // identical batches on both sides advance the digests equally — serves
    streaming.IndexMaintenance.bootstrapLmStore(sA, dir, pre)
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, pre)
    assert(streaming.IndexMaintenance.applyLmBatch(sA, dir, "dg_spec2", 0L, toLm))
    assert(streaming.IndexMaintenance.applyTfBatch(sA, dir, "dg_spec2", 0L, toLm))
    assert(meta(lmName)(IndexStore.CorpusHashKey) == meta(tfName)(IndexStore.CorpusHashKey))
    assert(streaming.IndexMaintenance.lmModelFromStore(sA, dir).count() > 0)

    // a digest-less side (pre-digest store, or post-purge) falls back to
    // count-only serving instead of refusing forever
    val tfPath = IndexStore.storePath(root, dir, tfName)
    IndexStore.writeMeta(sA, tfPath,
      IndexStore.readMeta(sA, tfPath).get - IndexStore.CorpusHashKey)
    assert(streaming.IndexMaintenance.lmModelFromStore(sA, dir).count() > 0)
  }

  test("streaming IVF maintenance: growth refit, crash replay, store-served ANN equals batch q53") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_ivf")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    val pre = e.filter(col("vec_id") < 200)
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir, pre)
    val assignPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName)
    val modelPath = IndexStore.storePath(root, dir,
      operators.Similarity.IvfModelStoreName)
    def meta = IndexStore.readMeta(sA, assignPath).get
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "200")
    assert(BigInt(meta(streaming.IndexMaintenance.IvfFitIdotSumKey)) > 0,
      "fixture fit baseline must have positive mean assignment dot")

    // two micro-batches growing the corpus 200 -> 350 -> 500; the growth
    // trigger (>= 2 x 200) must fire on the SECOND, not the first
    implicit val sqlCtx = sA.sqlContext
    import sA.implicits._
    val rows = e.select("vec_id", "embedding").filter(col("vec_id") >= 200)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (b1, b2) = rows.partition(_._1 < 350)
    val input = MemoryStream[(Long, Seq[Float])]
    val ckpt = tmp("graft_idx_ivf_ck")
    input.addData(b1.toSeq)
    val q1 = streaming.IndexMaintenance.maintainIvfAssignments(
      input.toDF().toDF("vec_id", "embedding"), dir, ckpt, "ivf_spec")
    q1.processAllAvailable(); q1.stop()
    assert(meta(streaming.IndexMaintenance.IvfIncNKey) == "150",
      "first batch is below both triggers - no refit, inc sums advance")
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "200")

    // crash replay: the applied batch id must skip without moving rows OR sums
    val before = (sA.read.parquet(assignPath).count(), meta)
    val replayed = streaming.IndexMaintenance.applyIvfBatch(sA, dir, "ivf_spec", 0L,
      e.select("vec_id", "embedding").filter(col("vec_id") >= 200).limit(5))
    assert(!replayed && sA.read.parquet(assignPath).count() == before._1
      && meta == before._2,
      "a replayed batch must not re-append or double-count the drift sums")

    input.addData(b2.toSeq)
    val q2 = streaming.IndexMaintenance.maintainIvfAssignments(
      input.toDF().toDF("vec_id", "embedding"), dir, ckpt, "ivf_spec")
    q2.processAllAvailable(); q2.stop()
    // growth refit fired: fresh baseline over all 500, inc sums zeroed,
    // durable model refit on the full corpus
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "500", meta.toString)
    assert(meta(streaming.IndexMaintenance.IvfIncNKey) == "0")
    assert(operators.Ivf.load(sA, modelPath).exists(_.n == 500))

    // serving parity: the maintained inverted file answers exactly q53
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val served = key(operators.Similarity.ivfAnnFromStore(sA, dir))
    val batch = key(SparkEntry.queries("q53_ann_ivf")(sA, dir))
    assert(served == batch, "store-served IVF ANN must equal batch q53")
    assert(served.nonEmpty)
  }

  test("binary ANN off the maintained assignment store equals batch; purged ids never serve") {
    val root = tmp("graft_idx_binserve")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir, e)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    // serving parity: the stored vectors answer exactly the batch
    // Hamming-prefilter + exact-rerank computation
    val served = key(operators.Similarity.binaryAnnFromStore(sA, dir))
    val batch = key(operators.Similarity.binaryTopK(e, e.filter(col("vec_id") < 8)))
    assert(served.nonEmpty && served == batch,
      "store-served binary ANN must equal the batch path")
    // the Matryoshka rung rides the same store frames: prefix-16 integer
    // prefilter + full-dim exact rerank, store == batch
    val mServed = key(operators.Similarity.mrlAnnFromStore(sA, dir, dims = 16))
    val mBatch = key(operators.Similarity.mrlTopK(e, e.filter(col("vec_id") < 8), dims = 16))
    assert(mServed.nonEmpty && mServed == mBatch,
      "store-served MRL ANN must equal the batch path")
    // IVF-composed serving (probesOpt — the q166/q167 posture): the
    // stored coarse centroids bound the cheap first pass by probed-cell
    // mass, and the answer equals the batch computation over the SAME
    // fixture candidate stage (the bootstrap fit and the session fit are
    // the same deterministic k-means over the same corpus)
    val eqf = operators.Ivf.quantize(e)
    val cand = operators.Similarity.fixtureCellCandidates(sA, dir, eqf)
    val cServed = key(operators.Similarity.binaryAnnFromStore(sA, dir,
      probesOpt = Some(2)))
    val cBatch = key(operators.Similarity.binaryTopK(e,
      e.filter(col("vec_id") < 8), candOpt = Some(cand)))
    assert(cServed.nonEmpty && cServed == cBatch,
      "composed binary×IVF serve must equal the batch candidate-stage path")
    val cmServed = key(operators.Similarity.mrlAnnFromStore(sA, dir, dims = 16,
      probesOpt = Some(2)))
    val cmBatch = key(operators.Similarity.mrlTopK(e,
      e.filter(col("vec_id") < 8), dims = 16, candOpt = Some(cand)))
    assert(cmServed.nonEmpty && cmServed == cmBatch,
      "composed MRL×IVF serve must equal the batch candidate-stage path")
    // takedown: purge every current top-1 neighbor; the binary serve
    // must follow the store's membership — no purged id as a neighbor,
    // and exact parity with the batch computation on the survivors
    val victims = served.filter(_._2 == 1).map(_._3).distinct
    assert(victims.nonEmpty)
    streaming.IndexMaintenance.purgeEmbeddingTier(sA, dir, victims)
    val after = key(operators.Similarity.binaryAnnFromStore(sA, dir))
    assert(after.map(_._3).toSet.intersect(victims.toSet).isEmpty,
      "a purged id is still servable as a binary-ANN neighbor")
    val eSurv = e.filter(!col("vec_id").isin(victims: _*))
    assert(after == key(operators.Similarity.binaryTopK(eSurv, eSurv.filter(col("vec_id") < 8))),
      "post-purge binary serve must equal the batch path on the surviving corpus")
  }

  test("cross-modal queries served off the maintained IVF assignment store equal the batch path") {
    val root = tmp("graft_idx_ivf_xm")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir, e)
    val modelPath = IndexStore.storePath(root, dir,
      operators.Similarity.IvfModelStoreName)
    val model = operators.Ivf.load(sA, modelPath).get
    // image-side queries paired to the first 8 texts (id domain +XmOffset):
    // the maintained TEXT-side inverted file serves the other modality
    val imgQ = operators.Similarity.crossModalImageSide(e.filter(col("vec_id") < 8))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val served = key(operators.Similarity.ivfAnnFromStore(sA, dir,
      queriesOpt = Some(imgQ)))
    // batch equivalent: same stored centroids, corpus cells recomputed live
    val eqf = operators.Ivf.quantize(e)
    val cents = operators.Ivf.centsDF(sA, model.cents)
    val cells = operators.Ivf.ranked(eqf, cents).filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val batch = key(operators.Ivf.annTopK(
      e.select(col("vec_id"), col("embedding")),
      operators.Ivf.quantize(imgQ).select(col("vec_id"), col("eq")),
      cents, 8, 2, 3, graft.functions.VectorFunctions.dotDec,
      cellsOpt = Some(cells),
      qEmbOpt = Some(imgQ.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))))
    assert(served == batch, "cross-modal store-served ANN must equal the batch computation")
    assert(served.nonEmpty)
    // paired-text sanity: the shared space is real through the store path
    val top1 = served.filter(_._2 == 1).map(r => (r._1, r._3)).toMap
    assert(top1.count { case (q, n) => n == q - operators.Similarity.XmOffset } >= 6,
      s"paired-text top-1 recall collapsed through the store path: $top1")
  }

  test("attribute-constrained serving off the maintained store equals the batch filtered computation") {
    val root = tmp("graft_idx_filt_serve")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir, e)
    val flt = Tables.load(sA, dir, "documents")
      .filter(col("lang") === "en").select(col("doc_id").as("vec_id"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val served = key(operators.Similarity.ivfAnnFromStore(sA, dir, probes = 4,
      candIdsOpt = Some(flt)))
    assert(served.nonEmpty)
    // every neighbor satisfies the predicate (no post-filter could have
    // produced short rows instead)
    val allowed = flt.collect().map(_.getLong(0)).toSet
    assert(served.forall(r => allowed(r._3)), "an excluded id served as a neighbor")
    // batch equivalent: stored model, cells recomputed live and id-filtered
    // BEFORE the probe join — q157's candidate leg
    val model = operators.Ivf.load(sA, IndexStore.storePath(root, dir,
      operators.Similarity.IvfModelStoreName)).get
    val cents = operators.Ivf.centsDF(sA, model.cents)
    val eqf = operators.Ivf.quantize(e).select(col("vec_id"), col("eq"))
    val cells = operators.Ivf.ranked(eqf, cents).filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cell")).join(flt, "vec_id")
    val batch = key(operators.Ivf.annTopK(
      e.select(col("vec_id"), col("embedding")), eqf, cents, 8, 4, 3,
      functions.VectorFunctions.dotDec, cellsOpt = Some(cells)))
    assert(served == batch, "store-served filtered ANN must equal the batch path")
  }

  test("image-side (xm) family maintenance: exactly-once appends, own store entries, q155's serving leg off the store equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_xm_maint")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    val img = operators.Similarity.crossModalImageSide(e)
    val off = operators.Similarity.XmOffset
    // bootstrap the IMAGE-side family on the first 470 paired images:
    // own assignment store (ivf_assign_xm), own coarse model
    // (xm_ivf_model), own PQ codebooks (pq_model_<m>_xm)
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir,
      img.filter(col("vec_id") < off + 470), family = "_xm")
    val assignPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName + "_xm")
    val modelPath = IndexStore.storePath(root, dir,
      operators.Similarity.XmIvfModelStoreName)
    def meta = IndexStore.readMeta(sA, assignPath).get
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "470")
    assert(meta(streaming.IndexMaintenance.PqFitResNKey) == "470")
    for (m <- 0 until operators.Similarity.pqSubvectors)
      assert(operators.Ivf.load(sA, IndexStore.storePath(root, dir,
        operators.Similarity.pqModelStoreName(m, "_xm"))).isDefined,
        s"xm PQ codebook $m must bootstrap alongside the coarse model")
    // the TEXT-side family is untouched — separate store entries entirely
    assert(!IndexStore.committed(sA, IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName)))

    // maintain the remaining 30 image vectors through the streaming leg
    implicit val sqlCtx = sA.sqlContext
    import sA.implicits._
    val rows = img.filter(col("vec_id") >= off + 470).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val input = MemoryStream[(Long, Seq[Double])]
    input.addData(rows.toSeq)
    val q = streaming.IndexMaintenance.maintainIvfAssignments(
      input.toDF().toDF("vec_id", "embedding"), dir, tmp("graft_idx_xm_ck"),
      "xm_spec", family = "_xm")
    q.processAllAvailable(); q.stop()
    assert(sA.read.parquet(assignPath).count() == 500)
    assert(meta(streaming.IndexMaintenance.IvfIncNKey) == "30")
    // exactly-once: a replay of the applied batch id is a full no-op
    val before = (sA.read.parquet(assignPath).count(), meta)
    assert(!streaming.IndexMaintenance.applyIvfBatch(sA, dir, "xm_spec", 0L,
      img.filter(col("vec_id") >= off + 470).limit(5), family = "_xm"))
    assert(sA.read.parquet(assignPath).count() == before._1 && meta == before._2,
      "a replayed xm batch must not re-append or advance the ledgers")

    // q155's serving leg: TEXT queries probe the maintained IMAGE store
    val model = operators.Ivf.load(sA, modelPath).get
    val txtQ = e.filter(col("vec_id") < 8).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val served = key(operators.Similarity.ivfAnnFromStore(sA, dir,
      queriesOpt = Some(txtQ), family = "_xm"))
    // batch equivalent: same stored centroids, image cells recomputed live
    val cents = operators.Ivf.centsDF(sA, model.cents)
    val cells = operators.Ivf.ranked(
        operators.Ivf.quantize(img).select(col("vec_id"), col("eq")), cents)
      .filter(col("rk") === 1).select(col("vec_id"), col("cid").as("cell"))
    val batch = key(operators.Ivf.annTopK(
      img.select(col("vec_id"), col("embedding")),
      operators.Ivf.quantize(txtQ).select(col("vec_id"), col("eq")),
      cents, 8, 2, 3, graft.functions.VectorFunctions.dotDec,
      cellsOpt = Some(cells),
      qEmbOpt = Some(txtQ.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))))
    assert(served == batch, "xm store-served ANN must equal the batch computation")
    assert(served.nonEmpty)
    // paired-image sanity through the maintained store
    val top1 = served.filter(_._2 == 1).map(r => (r._1, r._3)).toMap
    assert(top1.count { case (qid, n) => n == qid + off } >= 6,
      s"paired-image top-1 recall collapsed through the xm store path: $top1")

    // a document takedown reaches the OFFSET id domain: purging doc ids
    // removes their paired image vectors from the xm store too
    val removed = streaming.IndexMaintenance.purgeEmbeddingTier(sA, dir, Seq(100L, 101L))
    assert(removed(streaming.IndexMaintenance.IvfAssignStoreName + "_xm") == 2,
      removed.toString)
    assert(sA.read.parquet(assignPath)
      .filter(col("vec_id").isin(off + 100L, off + 101L)).count() == 0,
      "purged docs' paired image vectors must leave the xm store")
  }

  test("IVF drift trigger: distribution shift refits long before the growth policy") {
    val root = tmp("graft_idx_ivf_drift")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir, e)
    val assignPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName)
    val modelPath = IndexStore.storePath(root, dir,
      operators.Similarity.IvfModelStoreName)
    def meta = IndexStore.readMeta(sA, assignPath).get
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "500")
    assert(BigInt(meta(streaming.IndexMaintenance.IvfFitIdotSumKey)) > 0)

    // 50 zero vectors (10% of the fit corpus - over the 5% arming floor,
    // FAR under the 2x growth threshold): mean assignment dot 0 < 50% of
    // the positive baseline mean -> the drift trigger must refit
    val drifted = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 500).as("vec_id"),
        expr("transform(embedding, x -> CAST(0.0 AS FLOAT))").as("embedding"))
    assert(streaming.IndexMaintenance.applyIvfBatch(sA, dir, "drift_spec", 0L, drifted))
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "550",
      s"drift refit must re-baseline over the grown corpus: $meta")
    assert(meta(streaming.IndexMaintenance.IvfIncNKey) == "0")
    assert(operators.Ivf.load(sA, modelPath).exists(_.n == 550),
      "the durable model entry must carry the drift refit")

    // the refit is the DETERMINISTIC batch fit over the grown corpus:
    // serving off the store equals recomputing everything from scratch
    val store = sA.read.parquet(assignPath)
    val eqf = operators.Ivf.quantize(store.select("vec_id", "embedding"))
      .select("vec_id", "eq")
    val fresh = operators.Ivf.fit(eqf, 16)
    val loaded = operators.Ivf.load(sA, modelPath).get
    assert(fresh.cents.map(_._1) == loaded.cents.map(_._1) &&
      fresh.cents.zip(loaded.cents).forall { case ((_, a), (_, b)) =>
        java.util.Arrays.equals(a, b)
      }, "drift refit must reproduce the deterministic batch fit")
  }

  test("IVF skew trigger: a new hot cell refits when the mean-dot trigger cannot see it") {
    val root = tmp("graft_idx_ivf_skew")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir, e)
    val assignPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName)
    def meta = IndexStore.readMeta(sA, assignPath).get
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "500")

    // the hot mode: replicas of the store's BEST-assigned vector — every
    // append lands in one cell with an ABOVE-baseline-mean dot, so the
    // mean-dot drift statistic moves the wrong way for its trigger while
    // one cell absorbs 100% of the appended mass
    val hot = sA.read.parquet(assignPath)
      .orderBy(col("idot").desc).select("embedding").limit(1)
      .collect()(0).getSeq[Float](0)
    import sA.implicits._
    def hotBatch(ids: Range) =
      ids.map(i => (i.toLong, hot)).toDF("vec_id", "embedding")

    // 20 rows = 4% of the fit corpus: skewed but UNARMED — no refit, the
    // per-cell counts accumulate in the sidecar
    assert(streaming.IndexMaintenance.applyIvfBatch(sA, dir, "skew_spec", 0L,
      hotBatch(500 until 520)))
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "500",
      s"4% appended mass must not refit: $meta")
    val tracked = meta(streaming.IndexMaintenance.IvfIncCellCountsKey)
    assert(tracked.nonEmpty && tracked.split(",").length == 1 &&
      tracked.endsWith(":20"), s"one hot cell with 20 appends, got '$tracked'")

    // prove the mean-dot trigger is blind here: with the tracked appends
    // the drift inequality (incMean < 50% of fitMean) is FALSE
    val fitSum = BigInt(meta(streaming.IndexMaintenance.IvfFitIdotSumKey))
    val incSum = BigInt(meta(streaming.IndexMaintenance.IvfIncIdotSumKey))
    assert(incSum * 100 * BigInt(500) >= fitSum * BigInt(20) * 50,
      "precondition: the hot batch must NOT satisfy the mean-dot drift trigger")

    // 10 more rows arm the 5% floor; max-cell share 100% >= 8/16 fires
    assert(streaming.IndexMaintenance.applyIvfBatch(sA, dir, "skew_spec", 1L,
      hotBatch(520 until 530)))
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "530",
      s"skew refit must re-baseline over the grown corpus: $meta")
    assert(meta(streaming.IndexMaintenance.IvfIncNKey) == "0")
    assert(meta(streaming.IndexMaintenance.IvfIncCellCountsKey) == "",
      "cell-count tracking restarts against the refit cells")
    assert(meta(streaming.IndexMaintenance.IvfLastRefitTriggerKey) == "skew")
    val modelPath = IndexStore.storePath(root, dir,
      operators.Similarity.IvfModelStoreName)
    assert(operators.Ivf.load(sA, modelPath).exists(_.n == 530),
      "the durable model entry must carry the skew refit")
  }

  test("PQ residual trigger: a norm/distribution shift refits the codebooks while every IVF trigger stays silent") {
    val root = tmp("graft_idx_pq_drift")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir, e)
    val assignPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName)
    def meta = IndexStore.readMeta(sA, assignPath).get
    // bootstrap stamped the PQ residual baseline next to the IVF one
    assert(meta(streaming.IndexMaintenance.PqFitResNKey) == "500", meta.toString)
    assert(BigInt(meta(streaming.IndexMaintenance.PqFitResSumKey)) > 0,
      "fixture codebooks must have a positive reconstruction residual")
    assert(meta(streaming.IndexMaintenance.PqResModKey) == "1")

    // the shift: 50 rows (10% — over the 5% arming floor) of 3×-scaled
    // vectors. Coarse triggers are all BLIND to it: growth 550 < 1000;
    // the mean assignment dot TRIPLES (drift fires on a drop); argmax
    // cells are scale-invariant, so the appends spread like the base
    // corpus (no hot cell). But the codebooks reconstruct 3×-norm
    // vectors badly — |selfdot − codedot| ≈ 9s − 3d vs the baseline
    // s − d — so ADC ordering is degrading with NO coarse symptom:
    // exactly the gap the residual statistic exists to see.
    val scaled = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 3.0 AS FLOAT))").as("embedding"))
    assert(streaming.IndexMaintenance.applyIvfBatch(sA, dir, "pq_spec", 0L, scaled))
    // IVF: no refit — baseline untouched, inc sums advanced
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "500",
      s"no coarse trigger may fire: $meta")
    assert(!meta.contains(streaming.IndexMaintenance.IvfLastRefitTriggerKey))
    // PQ: refit fired — fresh baseline over all 550, zeroed increments,
    // provenance recorded, durable entries carry the 550-row fit
    assert(meta(streaming.IndexMaintenance.PqLastRefitTriggerKey) == "residual", meta.toString)
    assert(meta(streaming.IndexMaintenance.PqFitResNKey) == "550")
    assert(meta(streaming.IndexMaintenance.PqIncResNKey) == "0")
    for (m <- 0 until operators.Similarity.pqSubvectors)
      assert(operators.Ivf.load(sA, IndexStore.storePath(root, dir,
        operators.Similarity.pqModelStoreName(m))).exists(_.n == 550),
        s"pq_model_$m must carry the residual refit")

    // the refit is the DETERMINISTIC batch fit over the store's own
    // quantized vectors — all four subvector codebooks reproduce exactly
    val eqStore = sA.read.parquet(assignPath).select("vec_id", "eq")
    for (m <- 0 until operators.Similarity.pqSubvectors) {
      val fresh = operators.Ivf.fit(
        eqStore.select(col("vec_id"), expr(s"slice(eq, ${m * 16 + 1}, 16)").as("eq")),
        k = 16, dim = 16)
      val loaded = operators.Ivf.load(sA, IndexStore.storePath(root, dir,
        operators.Similarity.pqModelStoreName(m))).get
      assert(fresh.cents.map(_._1) == loaded.cents.map(_._1) &&
        fresh.cents.zip(loaded.cents).forall { case ((_, a), (_, b)) =>
          java.util.Arrays.equals(a, b)
        }, s"subvector $m refit must reproduce the deterministic batch fit")
    }

    // replay safety: the applied batch id skips without advancing the
    // PQ increments (they ride the marker's sidecar write)
    val before = meta
    assert(!streaming.IndexMaintenance.applyIvfBatch(sA, dir, "pq_spec", 0L, scaled))
    assert(meta == before, "a replayed batch must not advance the residual sums")

    // the pq_drift ledger reads exactly what the trigger just did
    val ledger = streaming.IndexMaintenance.pqDriftView(sA, dir).collect()
    assert(ledger.length == 1)
    assert(ledger(0).getAs[String]("last_refit_trigger") == "residual")
    assert(!ledger(0).getAs[Boolean]("residual_pending"))

    // serving continuity across the refit: a FRESH session on the same
    // store serves q142 off the refreshed durable codebooks — no refit at
    // serve time (the entries keep their 550-row fit), full 8-row report
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root)
    val report = SparkEntry.queries("q142_pq_recall")(sB, dir).collect()
    assert(report.length == 8, "q142 must serve the full report off the refit store")
    assert(operators.Ivf.load(sB, IndexStore.storePath(root, dir,
      operators.Similarity.pqModelStoreName(0))).exists(_.n == 550),
      "serving q142 must not silently refit the maintained codebooks")
  }

  test("embedding-tier purge: one takedown propagates to IVF/SRP/media stores, decrements the ledgers, and purged ids never serve as neighbors") {
    val root = tmp("graft_idx_tier_purge")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    // maintained IVF tier: fit on 470, append 30 (ids 470..499) so the
    // append ledgers are non-zero and decrementable
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir,
      e.filter(col("vec_id") < 470))
    assert(streaming.IndexMaintenance.applyIvfBatch(sA, dir, "purge_spec", 0L,
      e.select("vec_id", "embedding").filter(col("vec_id") >= 470)))
    // SRP + media tiers over the full corpus
    operators.Similarity.buildSrpIndex(sA, dir, e)
    operators.MultimodalOps.buildMediaFpIndex(sA, dir,
      multimodal.Multimodal.synthesizeImages(Tables.load(sA, dir, "documents")))
    val assignPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName)
    def meta = IndexStore.readMeta(sA, assignPath).get
    assert(meta(streaming.IndexMaintenance.IvfIncNKey) == "30")
    assert(meta(streaming.IndexMaintenance.PqIncResNKey) == "30")

    // the takedown: 10 fit-corpus ids + 10 appended ids (none queries)
    val purged = ((100L until 110L) ++ (480L until 490L)).toSeq
    // expected occupancy ledger after the purge: per-cell subtraction of
    // exactly the purged rows still ATTRIBUTED to the append ledger
    // (ivf_epoch == current fit epoch) — fit-corpus rows were never
    // counted there, so purging them must not shrink the skew statistic
    val purgedAppended = (480L until 490L).toSeq
    def parseCells(enc: String): Map[Int, Long] =
      enc.split(",").filter(_.nonEmpty).map { kv =>
        val Array(c, n) = kv.split(":"); c.toInt -> n.toLong
      }.toMap
    val trackedBefore = parseCells(meta(streaming.IndexMaintenance.IvfIncCellCountsKey))
    val purgedCells = sA.read.parquet(assignPath)
      .filter(col("vec_id").isin(purgedAppended: _*))
      .groupBy(col("cid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expectedCells = trackedBefore.flatMap { case (c, n) =>
      val d = n - purgedCells.getOrElse(c, 0L)
      if (d > 0) Some(c -> d) else None
    }
    val removed = streaming.IndexMaintenance.purgeEmbeddingTier(sA, dir, purged)
    assert(removed(streaming.IndexMaintenance.IvfAssignStoreName) == 20, removed.toString)
    assert(removed(operators.Similarity.SrpStoreName) == 20L * 16, removed.toString)
    // images exist for EVEN doc_ids only (250 of 500) → 10 of the 20
    // purged ids have a fingerprint to remove
    assert(removed(operators.MultimodalOps.MediaFpStoreName) == 10, removed.toString)

    // ledger decrements rode the staged swap: appended mass 30 − 10
    // purged APPENDED rows — the 10 purged fit rows carry epoch 0 and
    // were never in the Inc ledgers, so they decrement nothing (exact
    // attribution; the old all-present decrement understated appended
    // mass and could defer the refit triggers unboundedly)
    assert(meta(streaming.IndexMaintenance.IvfIncNKey) == "20", meta.toString)
    assert(meta(streaming.IndexMaintenance.PqIncResNKey) == "20", meta.toString)
    assert(parseCells(meta(streaming.IndexMaintenance.IvfIncCellCountsKey)) == expectedCells,
      s"occupancy ledger must carry the exact clamped decrement: $meta")
    // fit baseline deliberately survives (it describes the training set)
    assert(meta(streaming.IndexMaintenance.IvfFitNKey) == "470")

    // IVF serving parity on the surviving corpus: the store answers
    // exactly the batch computation under the stored model, and no
    // purged id appears as a neighbor
    val eSurv = e.filter(!col("vec_id").isin(purged: _*))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val served = key(operators.Similarity.ivfAnnFromStore(sA, dir))
    assert(served.nonEmpty)
    assert(served.map(_._3).toSet.intersect(purged.toSet).isEmpty,
      "a purged id is still servable as an ANN neighbor")
    val model = operators.Ivf.load(sA, IndexStore.storePath(root, dir,
      operators.Similarity.IvfModelStoreName)).get
    val batch = key(operators.Ivf.annTopK(eSurv,
      operators.Ivf.quantize(eSurv).select("vec_id", "eq"),
      operators.Ivf.centsDF(sA, model.cents), 8, 2, 3,
      functions.VectorFunctions.dotDec))
    assert(served == batch, "store-served filtered corpus must equal the batch path")

    // SRP: the decremented corpus count matches the survivors, so the
    // tracked load SERVES (no rebuild), and serving equals a fresh
    // recompute over the surviving corpus under the same plane family
    val bkStored = operators.Similarity.buildSrpIndex(sA, dir, eSurv)
    assert(bkStored.count() == eSurv.count() * 16)
    def srpKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val servedSrp = srpKey(operators.Similarity.srpAnnTopK(eSurv, bkStored, 8, 8, 3))
    assert(servedSrp.map(_._3).toSet.intersect(purged.toSet).isEmpty,
      "a purged id is still servable as an SRP neighbor")
    val freshSrp = srpKey(operators.Similarity.srpAnnTopK(eSurv,
      operators.Similarity.srpRows(eSurv), 8, 8, 3))
    assert(servedSrp == freshSrp, "purged SRP store must equal a fresh survivor build")

    // media: the store's fingerprints equal a fresh decode of the
    // surviving images — q136-store-aware serves the survivor set
    val mfpPath = IndexStore.storePath(root, dir,
      operators.MultimodalOps.MediaFpStoreName)
    val storedFps = sA.read.parquet(mfpPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedFps.size == 240 &&
      storedFps.map(_._1).intersect(purged.toSet).isEmpty)
    val freshFps = operators.MultimodalOps.imageFps(
        multimodal.Multimodal.synthesizeImages(
          Tables.load(sA, dir, "documents").filter(!col("doc_id").isin(purged: _*))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedFps == freshFps, "purged media store must equal a fresh survivor decode")

    // idempotent replay: a re-delivered purge removes nothing and the
    // ledgers stay put (an at-least-once deletion pipeline is safe)
    val before = meta
    val replay = streaming.IndexMaintenance.purgeEmbeddingTier(sA, dir, purged)
    assert(replay.values.forall(_ == 0), replay.toString)
    assert(meta == before)

    // crash-window refusal: between purgeKeys' delete and rename there is
    // NO committed store — serving refuses loudly instead of answering
    // from a half-purged index
    val succ = new org.apache.hadoop.fs.Path(assignPath, "_SUCCESS")
    succ.getFileSystem(sA.sparkContext.hadoopConfiguration).delete(succ, false)
    assertThrows[IllegalArgumentException] {
      operators.Similarity.ivfAnnFromStore(sA, dir)
    }
  }

  test("purgeKeys drops the corpus content digest (underivable after a purge)") {
    val root = tmp("graft_idx_purge_digest")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    val tfName = streaming.IndexMaintenance.TfStoreName
    assert(IndexStore.storedMeta(sA, dir, tfName).get.contains(IndexStore.CorpusHashKey))
    val victim = docs.agg(min("doc_id")).collect()(0).getLong(0)
    IndexStore.purgeKeys(sA, dir, tfName, "doc_id", Seq(victim), countDecrement = 1L)
    val after = IndexStore.storedMeta(sA, dir, tfName).get
    assert(!after.contains(IndexStore.CorpusHashKey),
      "a purged store must not advertise a digest it no longer matches")
    // re-bootstrap over the post-purge corpus restores the digest
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir,
      docs.filter(col("doc_id") =!= victim))
    assert(IndexStore.storedMeta(sA, dir, tfName).get.contains(IndexStore.CorpusHashKey))
  }

  test("purgeKeys: NULL-keyed rows survive the rewrite and a bare store gains a sidecar") {
    val root = tmp("graft_idx_purge_null")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val path = IndexStore.storePath(root, dir, "null_key_store")
    // a BARE store (no sidecar) holding a null-keyed row — e.g. an index
    // whose key column is nullable by schema
    import sA.implicits._
    Seq(Some(1L) -> "a", Some(2L) -> "b", Option.empty[Long] -> "c")
      .toDF("k", "v").write.mode("overwrite").parquet(path)
    assert(IndexStore.readMeta(sA, path).isEmpty, "precondition: bare store")

    val removed = IndexStore.purgeKeys(sA, dir, "null_key_store", "k", Seq(2L))
    assert(removed == 1L)
    val after = sA.read.parquet(path).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1)).toSet
    assert(after == Set(Some(1L) -> "a", None -> "c"),
      s"null-keyed row must survive a purge of other keys, got $after")
    // the purge proved the row count — the republished store records it
    val meta = IndexStore.readMeta(sA, path)
    assert(meta.exists(_.get(IndexStore.StoreRowsKey).contains("2")),
      s"bare store must gain a StoreRows sidecar on purge, got $meta")
  }

  test("streaming anchor maintenance: crash replay, store-served substring dedup equals batch q153") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_anchor")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    val split = 400L
    val pre = docs.filter(col("doc_id") < split)
    streaming.IndexMaintenance.bootstrapAnchorStore(sA, dir, pre)
    val path = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.AnchorStoreName)
    def meta = IndexStore.readMeta(sA, path).get
    assert(meta(IndexStore.CorpusCountKey) == "400")
    assert(meta("k") == operators.Fuzzy.SubstringK.toString)

    // stream the remaining docs PLUS one sub-K short doc (zero anchors,
    // but it still counts as a document — the serve-side count check must
    // include it or every short doc would permanently block serving)
    implicit val sqlCtx = sA.sqlContext
    import sA.implicits._
    val tail = docs.filter(col("doc_id") >= split).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val shortDoc = (900001L, "tiny doc under the anchor width")
    val input = MemoryStream[(Long, String)]
    input.addData((tail :+ shortDoc).toSeq)
    val q = streaming.IndexMaintenance.maintainAnchorIndex(
      input.toDF().toDF("doc_id", "text"), dir, tmp("graft_idx_anchor_ck"), "anchor_spec")
    q.processAllAvailable(); q.stop()
    assert(meta(IndexStore.CorpusCountKey) == "501",
      s"bootstrap 400 + streamed 101 documents: $meta")

    // crash replay: the applied batch id must skip without moving rows
    val before = (sA.read.parquet(path).count(), meta)
    val replayed = streaming.IndexMaintenance.applyAnchorBatch(sA, dir,
      "anchor_spec", 0L, docs.filter(col("doc_id") >= split).limit(3))
    assert(!replayed && sA.read.parquet(path).count() == before._1
      && meta == before._2,
      "a replayed batch must not re-append anchors or advance the sidecar")

    // serving a LAGGING corpus view refuses loudly (the short doc is
    // indexed in the store's count but missing from this frame)
    intercept[IllegalArgumentException] {
      operators.Fuzzy.substringDedupFromStore(sA, dir, docs).collect()
    }

    // store-served profile == batch q153 over the same corpus, and the
    // served lineage reads anchors from the store parquet
    val full = docs.select("doc_id", "text")
      .unionByName(Seq(shortDoc).toDF("doc_id", "text"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val served = operators.Fuzzy.substringDedupFromStore(sA, dir, full)
    assert(scanPaths(served).exists(_.contains(path)),
      s"served profile must scan the anchor store: ${scanPaths(served)}")
    val servedRows = key(served)
    val batchRows = key(operators.Fuzzy.substringDedup(full))
    Materialize.releaseAll(sA)
    assert(servedRows == batchRows,
      "store-served substring dedup must equal the batch profile")
    assert(servedRows.nonEmpty && servedRows.exists(_._4 > 0),
      "fixture corpus must profile at least one duplicated span")
  }

  test("unified takedown: purgeAll spans text/model/embedding/media tiers, store-served operators equal batch over the survivors, replay is a no-op") {
    val root = tmp("graft_idx_purge_unified")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    val e = Tables.load(sA, dir, "embeddings")

    // every maintained tier, bootstrapped over the full corpus
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    streaming.IndexMaintenance.bootstrapLmStore(sA, dir, docs)
    streaming.IndexMaintenance.bootstrapDsirStore(sA, dir, docs)
    operators.TextAnalysis.buildShingleIndex(sA, dir, docs)
    streaming.IndexMaintenance.bootstrapAnchorStore(sA, dir, docs)
    streaming.IndexMaintenance.bootstrapChunkStore(sA, dir, docs)
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir, e)
    operators.Similarity.buildSrpIndex(sA, dir, e)
    operators.MultimodalOps.buildMediaFpIndex(sA, dir,
      multimodal.Multimodal.synthesizeImages(docs))
    streaming.IndexMaintenance.bootstrapBpeStore(sA, dir, docs)

    val purged = (100L until 110L).toSeq
    val removed = streaming.IndexMaintenance.purgeAll(sA, dir, purged)
    // one call reported every tier: doc-keyed rows, model decrements,
    // embedding rows, media fingerprints (even doc_ids only -> 5 of 10)
    assert(removed(streaming.IndexMaintenance.LmStoreName) == 10, removed.toString)
    assert(removed(streaming.IndexMaintenance.DsirStoreName) == 10, removed.toString)
    assert(removed(operators.TextAnalysis.ShingleStoreName) == 10, removed.toString)
    assert(removed(streaming.IndexMaintenance.TfStoreName) > 0, removed.toString)
    assert(removed(streaming.IndexMaintenance.AnchorStoreName) > 0, removed.toString)
    assert(removed(streaming.IndexMaintenance.ChunkStoreName) > 0, removed.toString)
    assert(removed(streaming.IndexMaintenance.IvfAssignStoreName) == 10, removed.toString)
    assert(removed(operators.Similarity.SrpStoreName) == 160, removed.toString)
    assert(removed(operators.MultimodalOps.MediaFpStoreName) == 5, removed.toString)

    val surv = docs.filter(!col("doc_id").isin(purged: _*))
    val nSurv = surv.count()

    // BM25 (q130 serving path) == batch scoring body over the survivors
    def bmKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val servedBm = streaming.IndexMaintenance.bm25FromStore(sA, dir, 8L, 16, 10)
      .collect().map(bmKey).toSeq
    val nT = sA.range(1).select(lit(nSurv).cast("long").as("n"))
    val batchBm = operators.CorpusOps.bm25TopKOverTf(
        operators.CorpusOps.tfRows(surv), nT, 8L, 16, 10)
      .collect().map(bmKey).toSeq
    assert(servedBm == batchBm && servedBm.nonEmpty,
      "post-purge store-served BM25 must equal the batch answer over the survivors")

    // q146 LM model == batch model over the survivors, type for type —
    // the EXACT decrement: negated bigram counts summed back out, purged-
    // only bigram types vanished, corpus count + digest un-advanced
    val servedLm = streaming.IndexMaintenance.lmModelFromStore(sA, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batchLm = operators.CorpusOps.lmModelOverBigrams(
        operators.CorpusOps.bigramBags(surv)
          .groupBy(col("a"), col("b"))
          .agg(sum(col("c")).cast("long").as("c12")),
        operators.CorpusOps.tfRows(surv)
          .groupBy(col("term")).agg(sum(col("tf")).as("n")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(servedLm == batchLm && servedLm.nonEmpty,
      "post-purge store-served LM model must equal a fresh survivor build")

    // the BPE word mass: the summed store equals the batch word counts
    // over the survivors (the tokenizer's training set forgot the purged
    // docs exactly); the merge table itself is a fit artifact and stays
    assert(removed(streaming.IndexMaintenance.BpeWordStoreName) == 10, removed.toString)
    val storedWords = streaming.IndexMaintenance.bpeEncodedFromStore(sA, dir)
      .select("term", "freq").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val survWords = operators.CorpusOps.tfRows(surv).groupBy(col("term"))
      .agg(sum(col("tf")).cast("long").as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(storedWords == survWords,
      "post-purge BPE word store must equal the survivor word counts")

    // q144 DSIR weights == batch weights over the survivors
    val servedW = streaming.IndexMaintenance.dsirWeightsFromStore(sA, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchW = operators.CorpusOps.dsirWeights(
        operators.CorpusOps.dsirProfileRows(surv))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(servedW == batchW && servedW.nonEmpty,
      "post-purge store-served DSIR weights must equal a fresh survivor build")

    // q153 substring dedup served off the purged anchor store == batch
    // over the survivors (the corpus-count gate proves the decrement)
    def subKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val servedSub = subKey(operators.Fuzzy.substringDedupFromStore(sA, dir, surv))
    val batchSub = subKey(operators.Fuzzy.substringDedup(surv))
    Materialize.releaseAll(sA)
    assert(servedSub == batchSub && servedSub.nonEmpty,
      "post-purge store-served substring dedup must equal the survivor batch")

    // ANN: purged ids never serve as neighbors, and the store answers the
    // batch computation over the survivors under the stored model
    def annKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val eSurv = e.filter(!col("vec_id").isin(purged: _*))
    val servedAnn = annKey(operators.Similarity.ivfAnnFromStore(sA, dir))
    assert(servedAnn.nonEmpty &&
      servedAnn.map(_._3).toSet.intersect(purged.toSet).isEmpty,
      "a purged id is still servable as an ANN neighbor")
    val model = operators.Ivf.load(sA, IndexStore.storePath(root, dir,
      operators.Similarity.IvfModelStoreName)).get
    val batchAnn = annKey(operators.Ivf.annTopK(eSurv,
      operators.Ivf.quantize(eSurv).select("vec_id", "eq"),
      operators.Ivf.centsDF(sA, model.cents), 8, 2, 3,
      functions.VectorFunctions.dotDec))
    assert(servedAnn == batchAnn,
      "post-purge store-served ANN must equal the survivor batch path")

    // media fingerprints == a fresh decode of the surviving images
    val mfpPath = IndexStore.storePath(root, dir,
      operators.MultimodalOps.MediaFpStoreName)
    val storedFps = sA.read.parquet(mfpPath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val freshFps = operators.MultimodalOps.imageFps(
        multimodal.Multimodal.synthesizeImages(surv))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedFps == freshFps,
      "post-purge media store must equal a fresh survivor decode")

    // chunk store: no purged carrier remains
    assert(sA.read.parquet(IndexStore.storePath(root, dir,
        streaming.IndexMaintenance.ChunkStoreName))
      .filter(col("doc_id").isin(purged: _*)).count() == 0)

    // the request was absorbed: tombstones landed last
    val tombPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.PurgeTombstoneStoreName)
    assert(sA.read.parquet(tombPath).count() == 10)

    // full replay: nothing decrements twice, nothing is removed again
    val lmMetaBefore = IndexStore.storedMeta(sA, dir,
      streaming.IndexMaintenance.LmStoreName).get
    val replay = streaming.IndexMaintenance.purgeAll(sA, dir, purged)
    assert(replay.isEmpty, replay.toString)
    assert(IndexStore.storedMeta(sA, dir,
      streaming.IndexMaintenance.LmStoreName).get == lmMetaBefore,
      "a replayed purge must not advance the model-tier ledgers")

    // an OVERLAPPING second request decrements only its fresh ids, and the
    // model tier still equals a fresh build over the now-smaller corpus
    val second = (105L until 115L).toSeq // 5 absorbed + 5 new
    val removed2 = streaming.IndexMaintenance.purgeAll(sA, dir, second)
    assert(removed2(streaming.IndexMaintenance.LmStoreName) == 5, removed2.toString)
    val surv2 = docs.filter(!col("doc_id").isin((100L until 115L).toSeq: _*))
    val servedLm2 = streaming.IndexMaintenance.lmModelFromStore(sA, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batchLm2 = operators.CorpusOps.lmModelOverBigrams(
        operators.CorpusOps.bigramBags(surv2)
          .groupBy(col("a"), col("b"))
          .agg(sum(col("c")).cast("long").as("c12")),
        operators.CorpusOps.tfRows(surv2)
          .groupBy(col("term")).agg(sum(col("tf")).as("n")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(servedLm2 == batchLm2,
      "overlapping purge must decrement exactly the fresh ids' mass")
  }

  test("purgeAll staleness trip: purging an ingested id with unknown content trips the additive models; re-bootstrap restores service") {
    val root = tmp("graft_idx_purge_stale")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val docs = Tables.load(sA, dir, "documents")
    streaming.IndexMaintenance.bootstrapTfStore(sA, dir, docs)
    streaming.IndexMaintenance.bootstrapLmStore(sA, dir, docs)
    streaming.IndexMaintenance.bootstrapDsirStore(sA, dir, docs)

    // a streamed-in document whose content the corpus parquet does NOT
    // hold — after ingestion, the stores carry its mass
    import sA.implicits._
    val newDoc = Seq((100000L, "zq vr zq qq ww zz xx", "en"))
      .toDF("doc_id", "text", "lang")
    assert(streaming.IndexMaintenance.applyTfBatch(sA, dir, "trip_spec", 0L, newDoc))
    assert(streaming.IndexMaintenance.applyLmBatch(sA, dir, "trip_spec", 0L, newDoc))
    assert(streaming.IndexMaintenance.applyDsirBatch(sA, dir, "trip_spec", 0L, newDoc))

    // purge it WITHOUT its content: the doc-keyed tf store witnesses the
    // ingestion, so the additive models trip stale instead of silently
    // keeping the purged mass
    val removed = streaming.IndexMaintenance.purgeAll(sA, dir, Seq(100000L))
    assert(removed(streaming.IndexMaintenance.LmStoreName) == 0)
    assert(removed(streaming.IndexMaintenance.TfStoreName) > 0,
      "the doc-keyed tf rows must still purge")
    val exLm = intercept[IllegalStateException] {
      streaming.IndexMaintenance.lmModelFromStore(sA, dir)
    }
    assert(exLm.getMessage.contains("stale from a document purge"), exLm.getMessage)
    val exDs = intercept[IllegalStateException] {
      streaming.IndexMaintenance.dsirWeightsFromStore(sA, dir)
    }
    assert(exDs.getMessage.contains("stale from a document purge"), exDs.getMessage)

    // re-bootstrap over the surviving corpus restores exact service
    streaming.IndexMaintenance.bootstrapLmStore(sA, dir, docs)
    streaming.IndexMaintenance.bootstrapDsirStore(sA, dir, docs)
    val servedM = streaming.IndexMaintenance.lmModelFromStore(sA, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("p_micro")).toMap
    val batchM = operators.CorpusOps.lmBigramModel(sA, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("p_micro")).toMap
    assert(servedM == batchM,
      "re-bootstrap must restore the exact LM model over the survivors")
    assert(streaming.IndexMaintenance.dsirWeightsFromStore(sA, dir).count() > 0)

    // the EXACT path for a streamed-in doc: purging WITH its content
    // (docsOpt) decrements precisely and never trips
    val newDoc2 = Seq((100001L, "aa bb aa cc", "ru")).toDF("doc_id", "text", "lang")
    assert(streaming.IndexMaintenance.applyTfBatch(sA, dir, "trip_spec", 1L, newDoc2))
    assert(streaming.IndexMaintenance.applyLmBatch(sA, dir, "trip_spec", 1L, newDoc2))
    assert(streaming.IndexMaintenance.applyDsirBatch(sA, dir, "trip_spec", 1L, newDoc2))
    val removed2 = streaming.IndexMaintenance.purgeAll(sA, dir, Seq(100001L),
      docsOpt = Some(newDoc2))
    assert(removed2(streaming.IndexMaintenance.LmStoreName) == 1, removed2.toString)
    val servedM2 = streaming.IndexMaintenance.lmModelFromStore(sA, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("p_micro")).toMap
    assert(servedM2 == batchM,
      "an exact streamed-doc purge must restore the pre-append model")
  }

  test("vec_id-clustered assignment store: a point lookup prunes to one candidate row group on a multi-batch store, and through a clustered compact") {
    val root = tmp("graft_idx_point")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    // fit on 440 vectors, then three streamed batches of 20 — the store
    // spans four separately-written file sets
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir,
      e.filter(col("vec_id") < 440))
    for ((lo, b) <- Seq((440L, 0L), (460L, 1L), (480L, 2L)))
      assert(streaming.IndexMaintenance.applyIvfBatch(sA, dir, "pt_spec", b,
        e.select("vec_id", "embedding")
          .filter(col("vec_id") >= lo && col("vec_id") < lo + 20)))
    val path = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName)

    // per-row-group (min, max) of vec_id straight from the parquet
    // footers — the statistics a pushed `vec_id = id` predicate consults
    import scala.jdk.CollectionConverters._
    val hconf = sA.sparkContext.hadoopConfiguration
    def vecGroups(): Seq[(Long, Long)] =
      new java.io.File(path).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet")).flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), hconf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.asScala.toSeq.map { blk =>
            val st = blk.getColumns.asScala
              .find(_.getPath.toDotString == "vec_id").get.getStatistics
            (st.genericGetMin.asInstanceOf[Long], st.genericGetMax.asInstanceOf[Long])
          } finally r.close()
        }
    def candidates(gs: Seq[(Long, Long)], id: Long): Int =
      gs.count { case (mn, mx) => mn <= id && id <= mx }

    val gs = vecGroups()
    assert(gs.size >= 4, s"multi-batch store must span several row groups: $gs")
    // stored-id point lookups admit exactly ONE candidate group each —
    // ids across the bootstrap and every batch prove the file sets are
    // id-range disjoint (NOT append-ordered accident: within-write sort
    // plus range partitioning)
    for (id <- Seq(5L, 250L, 439L, 445L, 465L, 499L))
      assert(candidates(gs, id) == 1,
        s"point lookup vec_id=$id must prune to 1 group, got ${candidates(gs, id)} of ${gs.size}")
    // serving semantics unchanged: the lookup still answers
    assert(sA.read.parquet(path).filter(col("vec_id") === 445L).count() == 1)
    def annKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val before = annKey(operators.Similarity.ivfAnnFromStore(sA, dir))
    assert(before.nonEmpty)

    // a CLUSTERED compact merges the accumulated file sets and keeps the
    // pruning property (a plain compact would launder the layout away)
    IndexStore.compact(sA, dir, streaming.IndexMaintenance.IvfAssignStoreName,
      targetRowsPerFile = 100, clusterBy = Some("vec_id"))
    val gs2 = vecGroups()
    assert(gs2.size >= 5, s"compacted store must split into ~100-row files: $gs2")
    for (id <- Seq(5L, 250L, 445L, 499L))
      assert(candidates(gs2, id) == 1,
        s"post-compact lookup vec_id=$id must prune to 1 group, got ${candidates(gs2, id)} of ${gs2.size}")
    // the serve is byte-identical through the compact
    assert(annKey(operators.Similarity.ivfAnnFromStore(sA, dir)) == before,
      "clustered compaction must not change what the store serves")
  }

  test("streaming BPE maintenance: exactly-once word increments, compression-drift refit, store-served merges and encoding equal batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_idx_bpe")
    val docs = Tables.load(spark, dir, "documents")
    val t = docs.selectExpr("(max(doc_id) * 6) div 10 AS t").collect()(0).getLong(0)
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val pre = Tables.load(sA, dir, "documents").filter(col("doc_id") < t)
    streaming.IndexMaintenance.bootstrapBpeStore(sA, dir, pre)

    def mergeKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    def wordsOf(d: org.apache.spark.sql.DataFrame) =
      operators.CorpusOps.tfRows(d).groupBy(col("term"))
        .agg(sum(col("tf")).cast("long").as("freq"))
    // the stored model equals a batch learn over exactly the fit corpus
    assert(mergeKey(streaming.IndexMaintenance.bpeMergesFromStore(sA, dir)) ==
      operators.Bpe.learn(wordsOf(pre)),
      "bootstrapped merges must equal a batch learn over the fit corpus")

    // stream the remaining docs in two micro-batches with a replay probe
    implicit val sqlCtx = sA.sqlContext
    import sA.implicits._
    val inc = docs.filter(col("doc_id") >= t).select("doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = inc.splitAt(inc.length / 2)
    val input = MemoryStream[(Long, String)]
    val ckpt = tmp("graft_idx_bpe_ck")
    input.addData(b1.toSeq)
    val q1 = streaming.IndexMaintenance.maintainBpeModel(
      input.toDF().toDF("doc_id", "text"), dir, ckpt, "bpe_spec")
    q1.processAllAvailable(); q1.stop()
    val wordPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.BpeWordStoreName)
    def meta = IndexStore.readMeta(sA, wordPath).get
    val before = (sA.read.parquet(wordPath).count(), meta)
    assert(!streaming.IndexMaintenance.applyBpeBatch(sA, dir, "bpe_spec", 0L,
      Tables.load(sA, dir, "documents").filter(col("doc_id") >= t).limit(3)
        .select("doc_id", "text")))
    assert((sA.read.parquet(wordPath).count(), meta) == before,
      "a replayed batch must not re-append or advance the compression ledger")
    input.addData(b2.toSeq)
    val q2 = streaming.IndexMaintenance.maintainBpeModel(
      input.toDF().toDF("doc_id", "text"), dir, ckpt, "bpe_spec")
    q2.processAllAvailable(); q2.stop()

    // the summed store equals the batch word counts over the full corpus
    val stored = streaming.IndexMaintenance.bpeEncodedFromStore(sA, dir)
      .select("term", "freq").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batchW = wordsOf(docs).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(stored == batchW, "summed word store must equal the batch word counts")
    // fixture text compresses like the fit corpus: no refit fired
    assert(!meta.contains(streaming.IndexMaintenance.BpeLastRefitTriggerKey),
      s"homogeneous appends must not fire the compression trigger: $meta")
    val ledger0 = streaming.IndexMaintenance.bpeDriftView(sA, dir).collect()
    assert(ledger0.length == 1 && !ledger0(0).getAs[Boolean]("drift_pending"))

    // drift: on a FRESH store fit over the full corpus (so the increment
    // ledger holds ONLY the drift mass), a batch of unseen words the
    // learned merges cannot compress (ratio 1 sym/char vs the fit
    // baseline) with enough char mass to arm the trigger
    val root2 = tmp("graft_idx_bpe_drift")
    val sB = spark.newSession()
    sB.conf.set(IndexStore.DirConf, root2)
    streaming.IndexMaintenance.bootstrapBpeStore(sB, dir,
      Tables.load(sB, dir, "documents"))
    val wordPath2 = IndexStore.storePath(root2, dir,
      streaming.IndexMaintenance.BpeWordStoreName)
    def meta2 = IndexStore.readMeta(sB, wordPath2).get
    val fitSy = BigInt(meta2(streaming.IndexMaintenance.BpeFitSymsKey))
    val fitCh = BigInt(meta2(streaming.IndexMaintenance.BpeFitCharsKey))
    assert(fitSy * 110 < fitCh * 100,
      s"fixture sanity: the fit corpus must compress below 1/1.1 syms/char ($fitSy/$fitCh)")
    val word = "qzxvjw" // letters the merge table has never paired
    val reps = (fitCh / 6 / 10).toInt + 10 // ≥ 10% of fit char mass
    val driftDoc = Seq((900000L, Array.fill(reps)(word).mkString(" ")))
      .toDF("doc_id", "text")
    assert(streaming.IndexMaintenance.applyBpeBatch(sB, dir, "bpe_drift", 0L, driftDoc))
    assert(meta2(streaming.IndexMaintenance.BpeLastRefitTriggerKey) == "compression",
      s"the drift batch must fire the compression refit: $meta2")
    assert(meta2(streaming.IndexMaintenance.BpeIncCharsKey) == "0",
      "a refit must re-baseline with zeroed increments")
    // the refit model equals a batch learn over the grown word mass, and
    // it now spends merges on the drift word (the staleness being closed)
    val grownWords = wordsOf(docs.select("doc_id", "text").unionByName(driftDoc))
    val refit = mergeKey(streaming.IndexMaintenance.bpeMergesFromStore(sB, dir))
    assert(refit == operators.Bpe.learn(grownWords),
      "refit merges must equal a batch learn over the grown corpus")
    assert(refit.exists(m => word.contains(m._2 + m._3)),
      s"the refit vocabulary must learn the drifted word's pairs: $refit")
    // serving continuity: a FRESH session serves the refit model from the
    // durable tier with no re-learn at serve time
    val sC = spark.newSession()
    sC.conf.set(IndexStore.DirConf, root2)
    assert(mergeKey(streaming.IndexMaintenance.bpeMergesFromStore(sC, dir)) == refit)
    val enc = streaming.IndexMaintenance.bpeEncodedFromStore(sC, dir)
      .filter(col("term") === word).select("syms").collect()
    assert(enc.length == 1 && enc(0).getSeq[String](0).length < word.length,
      s"the refit encoding must compress the drifted word: ${enc.toSeq}")
  }

  test("snapshot isolation: serving during maintenance sees the old or new committed store, never a torn state") {
    val root = tmp("graft_idx_snap")
    val sA = spark.newSession()
    sA.conf.set(IndexStore.DirConf, root)
    val e = Tables.load(sA, dir, "embeddings")
    streaming.IndexMaintenance.bootstrapIvfAssignments(sA, dir,
      e.filter(col("vec_id") < 480))
    val assignPath = IndexStore.storePath(root, dir,
      streaming.IndexMaintenance.IvfAssignStoreName)
    def serve() = operators.Similarity.ivfAnnFromStore(sA, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val v0 = serve()
    assert(v0.nonEmpty)

    // 1. staged-swap siblings (a refit/purge/compact mid-flight, staging
    // fully written but not yet swapped) never leak into a read — the
    // serve answers the OLD committed snapshot bit for bit
    def copyDir(from: java.io.File, to: java.io.File): Unit = {
      to.mkdirs()
      from.listFiles().foreach { f =>
        val t = new java.io.File(to, f.getName)
        if (f.isDirectory) copyDir(f, t)
        else java.nio.file.Files.copy(f.toPath, t.toPath)
      }
    }
    for (suffix <- Seq(".refitting", ".purging", ".compacting")) {
      val staging = new java.io.File(assignPath + suffix)
      copyDir(new java.io.File(assignPath), staging)
      assert(serve() == v0,
        s"a fully-written $suffix staging sibling must not perturb the serve")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(staging)
    }

    // 2. a COMMITTED maintenance append is the new snapshot: visible
    // atomically (rows + marker landed in one staged sidecar write)
    assert(streaming.IndexMaintenance.applyIvfBatch(sA, dir, "snap_spec", 0L,
      e.select("vec_id", "embedding")
        .filter(col("vec_id") >= 480 && col("vec_id") < 490)))
    val v1 = serve()
    assert(sA.read.parquet(assignPath).count() == 490)

    // 3. torn append (data files landed, sidecar lost — the crash window
    // between an append's parquet commit and its marker write): reads
    // REFUSE loudly instead of serving rows of an uncommitted batch
    val part = new java.io.File(assignPath).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val extra = new java.io.File(assignPath, "part-torn-extra.parquet")
    java.nio.file.Files.copy(part.toPath, extra.toPath)
    val ex = intercept[IllegalStateException] { serve() }
    assert(ex.getMessage.contains("torn"), ex.getMessage)
    // healing the tear (here: the duplicate file removed; in production,
    // the maintainer's replay or a rebuild) restores the exact snapshot
    extra.delete()
    assert(serve() == v1, "healing the tear must restore the committed snapshot")

    // 4. the delete-before-rename window of a staged swap: NO committed
    // store — loud refusal, never a half-swapped answer
    val succ = new java.io.File(assignPath, "_SUCCESS")
    assert(succ.delete())
    assertThrows[IllegalArgumentException] { serve() }
  }
}
