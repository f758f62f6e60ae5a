package graft

import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DURABLE (cross-session) persistence for the built-once/served-many
  * index artifacts ([[SessionCache]] is the within-session tier): the
  * shingle sets, SRP bucket rows, and IVF centroids live as parquet under
  * a warehouse-style root, so a NEW session — tomorrow's incremental dedup
  * job — loads yesterday's index instead of re-tokenizing/re-projecting
  * the whole corpus. At 100 TB the index build is itself a corpus-scale
  * job; serving it from disk is the difference between an incremental
  * run costing O(increment) and O(corpus).
  *
  * Opt-in via the session conf `spark.graft.index.dir` (unset → every
  * index is built in-session exactly as before; nothing is written).
  * Layout: `<root>/<md5(corpusDir)>/<name>` — one store root can serve
  * many corpora without collisions, and renaming a corpus dir simply
  * re-keys (rebuilds) its indexes rather than silently serving stale rows.
  *
  * Completeness is judged by the `_SUCCESS` marker: a crash mid-write
  * leaves no marker, so the next session rebuilds instead of loading a
  * torn index. Appends (incremental batches) go through the same
  * committer, so a torn append likewise surfaces as missing files, never
  * a half-row — and an append that COMMITTED its parquet but lost its
  * sidecar write is caught by the [[StoreRowsKey]] tripwire (actual store
  * rows ≠ recorded): the next append refuses and the next tracked load
  * rebuilds, so an at-least-once replayer can never land silent
  * duplicates.
  *
  * Every committed entry carries a `_graft_meta` sidecar recording the
  * BUILD's parameters (e.g. the SRP plane family) and the cumulative
  * corpus row count (build + appends). Loads compare both against the
  * caller's request: a parameter mismatch (the store was built under a
  * different index geometry) or a corpus-count drift (the corpus mutated
  * out-of-band under the same path) logs a warning and REBUILDS instead
  * of silently serving rows from an incompatible or stale index. Appends
  * read the sidecar to reuse the build's parameters — an increment must
  * never be bucketed under a different family than the rows it joins.
  * The sidecar is written AFTER the parquet commit, so a crash between
  * the two reads as "no metadata" and rebuilds (same posture as a torn
  * parquet write).
  */
object IndexStore {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.IndexStore")

  /** Session conf key: root directory of the on-disk index store. */
  val DirConf = "spark.graft.index.dir"

  /** Sidecar key holding the cumulative indexed corpus row count. */
  val CorpusCountKey = "corpusCount"

  /** Sidecar key holding an ORDER-INDEPENDENT 64-bit content digest of the
    * ingested corpus (bit_xor of per-row xxhash64) — the cross-store
    * snapshot tripwire's strong form: two stores that ingested the same
    * COUNT of different batches carry equal [[CorpusCountKey]]s but
    * different digests. Maintained by bootstrap (full-corpus digest) and
    * XOR-advanced per append; dropped by [[purgeKeys]] (the purged rows'
    * text is gone, so the digest can't be re-derived — serving paths fall
    * back to count-only comparison until a re-bootstrap restores it).
    */
  val CorpusHashKey = "corpusHash"

  /** Sidecar key holding the store's OWN committed parquet row count —
    * the torn-append tripwire: a crash between a parquet append's commit
    * and its sidecar write leaves actual rows ≠ recorded rows, which an
    * at-least-once replayer would otherwise re-append into SILENT
    * duplicates (the corpus count alone can't catch that case: the
    * replay's single sidecar advance lands on the right corpus total).
    * Appends refuse a mismatched store; loads rebuild it.
    */
  val StoreRowsKey = "storeRows"

  /** Full-store footer-count scans performed — spec observability for the
    * append-cost contract: ONE full scan per append (the torn-append
    * tripwire pre-check), never a second for the post-append record.
    */
  private[graft] val fullStoreScans = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The committed store's actual parquet row count — metadata-cheap per
    * file (row-group footers, no data scan) but O(files) in the store, so
    * a long-lived appender pays more per call as files accumulate;
    * [[compact]] bounds that.
    */
  private def actualStoreRows(s: SparkSession, path: String): Long = {
    fullStoreScans.incrementAndGet()
    s.read.parquet(path).count()
  }

  /** The store's data files (parquet parts — `_SUCCESS`, sidecars and
    * hidden files excluded).
    */
  private def dataFiles(s: SparkSession, path: String): Set[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath.toString).toSet
  }

  def configuredDir(s: SparkSession): Option[String] =
    s.conf.getOption(DirConf).map(_.trim).filter(_.nonEmpty)

  /** Corpus-identity tag: content-free (pure path hash) by design — the
    * store is an optimization tier keyed by the corpus LOCATION; content
    * drift under the same path is caught by the sidecar's corpus count at
    * load time (the loud staleness tripwire), not by the key.
    */
  private def corpusKey(corpusDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(corpusDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  def storePath(root: String, corpusDir: String, name: String): String =
    s"$root/${corpusKey(corpusDir)}/$name"

  /** A committed (fully written) parquet store exists at `path`. */
  def committed(s: SparkSession, path: String): Boolean = {
    val p = new Path(path, "_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Read a committed store entry under SNAPSHOT-ISOLATION discipline:
    * when the sidecar records a row count, the parquet must match it — a
    * mismatch means a maintenance append's data files landed but its
    * sidecar (with the batch marker) did not, so the batch is NOT
    * committed and serving its rows would be a torn read of an
    * uncommitted write. Refuses loudly instead; the maintainer's replay
    * (or a rebuild) heals the store. Staged-swap siblings (`.refitting` /
    * `.purging` / `.compacting`) never affect this read — they are
    * separate directories until their atomic rename. Cost: one
    * footer-count pass over the entry's files.
    */
  def verifiedRead(s: SparkSession, path: String): DataFrame = {
    require(committed(s, path), s"no committed index store at $path")
    readMeta(s, path).flatMap(_.get(StoreRowsKey)).map(_.toLong).foreach { recorded =>
      val actual = actualStoreRows(s, path)
      if (actual != recorded)
        throw new IllegalStateException(
          s"index store at $path is torn: $actual rows vs $recorded recorded — " +
            "a maintenance write landed data without its sidecar; replay the " +
            "maintainer (or rebuild) before serving")
    }
    s.read.parquet(path)
  }

  // ------------------------------------------------------------ sidecar --

  private def metaFile(path: String) = new Path(path, "_graft_meta")

  /** Persist the entry's build metadata (small `key=value` properties —
    * parameters plus [[CorpusCountKey]]) CRASH-CLEANLY: the bytes go to a
    * `.tmp` sibling first and only a rename publishes them, so a crash
    * mid-write can never leave a truncated `_graft_meta` — the worst case
    * is an orphaned `.tmp` plus a missing/old sidecar, both of which read
    * as "rebuild". (The brief delete-before-rename window likewise reads
    * as "no metadata" — safe, because readers rebuild on absence.)
    */
  def writeMeta(s: SparkSession, path: String, meta: Map[String, String]): Unit = {
    val p = metaFile(path)
    val tmp = new Path(path, "_graft_meta.tmp")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val props = new Properties()
    meta.foreach { case (k, v) => props.setProperty(k, v) }
    val os = fs.create(tmp, true)
    try props.store(os, "graft index store metadata") finally os.close()
    // HDFS/posix rename won't clobber an existing target on every FS
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"IndexStore: rename $tmp -> $p failed")
  }

  /** The entry's build metadata, or None when absent/unreadable (a
    * pre-metadata or torn store — callers rebuild).
    */
  def readMeta(s: SparkSession, path: String): Option[Map[String, String]] = {
    val p = metaFile(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try {
      val is = fs.open(p)
      try {
        val props = new Properties()
        props.load(is)
        Some(props.asScala.toMap)
      } finally is.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Convenience: the committed store's metadata for (corpusDir, name)
    * under the configured root, if any.
    */
  def storedMeta(s: SparkSession, corpusDir: String, name: String): Option[Map[String, String]] =
    configuredDir(s).flatMap { root =>
      val path = storePath(root, corpusDir, name)
      if (committed(s, path)) readMeta(s, path) else None
    }

  // ------------------------------------------------------------- serving --

  /** Serve the index frame `name` for `corpusDir`: load it from the store
    * when present AND compatible, build-write-reload when absent or when
    * the sidecar disagrees with the request, or just build when no store
    * is configured. The reload (rather than returning the built frame)
    * pins the returned lineage to the parquet files, so every consumer
    * plan is a plain columnar scan of the store — including in the very
    * session that built it.
    *
    * `params` is the index geometry the caller expects (e.g. the SRP
    * plane family); `corpusCount` (evaluated lazily, ≥ 0 to enable) is
    * the corpus's CURRENT row count — both are recorded in the sidecar at
    * build time and checked at load time, so geometry changes and
    * out-of-band corpus mutation rebuild loudly instead of serving wrong
    * rows. A store without a sidecar (torn meta write) also rebuilds.
    */
  def servedFrom(s: SparkSession, corpusDir: String, name: String,
      params: Map[String, String] = Map.empty, corpusCount: => Long = -1L)(
      build: => DataFrame): DataFrame =
    configuredDir(s) match {
      case None => build
      case Some(root) =>
        val path = storePath(root, corpusDir, name)
        // The by-name count is evaluated AT MOST ONCE per servedFrom call
        // (staleness check and sidecar write share this): for a parquet
        // corpus a count is metadata-cheap, but the contract is "any
        // DataFrame", where each evaluation is a full scan.
        lazy val current = corpusCount
        val fresh =
          if (!committed(s, path)) false
          else readMeta(s, path) match {
            case None =>
              // Tolerate a bare store only when the caller tracks nothing
              // (no params, no count) — otherwise rebuild and self-heal.
              val bare = params.isEmpty && current < 0
              if (!bare) log.warn(s"index store $path has no metadata sidecar — rebuilding")
              bare
            case Some(meta) =>
              val paramDrift = params.collect {
                case (k, v) if !meta.get(k).contains(v) => s"$k: store=${meta.getOrElse(k, "?")} requested=$v"
              }
              val countDrift = meta.get(CorpusCountKey).map(_.toLong) match {
                case Some(stored) if current >= 0 && stored != current =>
                  Seq(s"$CorpusCountKey: store=$stored corpus=$current")
                case _ => Seq.empty
              }
              // torn-append tripwire: the store's own rows must match the
              // sidecar's record (a mismatch = an append committed parquet
              // but crashed before its sidecar write)
              val rowsDrift = meta.get(StoreRowsKey).map(_.toLong) match {
                case Some(recorded) =>
                  val actual = actualStoreRows(s, path)
                  if (actual != recorded)
                    Seq(s"$StoreRowsKey: recorded=$recorded actual=$actual (torn append)")
                  else Seq.empty
                case None => Seq.empty // pre-storeRows sidecar
              }
              val drift = paramDrift ++ countDrift ++ rowsDrift
              if (drift.nonEmpty)
                log.warn(s"index store $path is stale (${drift.mkString("; ")}) — rebuilding")
              drift.isEmpty
          }
        if (!fresh) {
          build.write.mode("overwrite").parquet(path)
          writeMeta(s, path, params ++
            Map(StoreRowsKey -> actualStoreRows(s, path).toString) ++
            (if (current >= 0) Map(CorpusCountKey -> current.toString) else Map.empty))
        }
        s.read.parquet(path)
    }

  /** Append an increment (e.g. a new doc batch's shingle sets) to an
    * existing store, advancing the sidecar's corpus count by
    * `incrementCount` (≥ 0) so the next load's staleness check expects
    * the grown corpus. Requires a configured store: an append with
    * nowhere durable to land is a caller bug, not a silent no-op.
    *
    * SINGLE-WRITER contract: the sidecar advance is a read-modify-write
    * with no cross-process lock, so concurrent appenders to the SAME
    * store entry can lose an increment's count. The failure is loud, not
    * silent-wrong — the next load sees the count disagree with the corpus
    * and rebuilds — but the supported posture is one appending ingest job
    * per store entry at a time (the reference's single consumer writing
    * one fact table has the same shape).
    */
  def append(s: SparkSession, corpusDir: String, name: String, rows: DataFrame,
      incrementCount: Long = -1L, extraMeta: Map[String, String] = Map.empty): Unit = {
    val root = configuredDir(s).getOrElse(throw new IllegalStateException(
      s"IndexStore.append: no index store configured — set $DirConf"))
    val path = storePath(root, corpusDir, name)
    // Torn-append tripwire BEFORE writing: if a previous append committed
    // parquet but crashed before its sidecar write, the actual rows
    // disagree with the record — appending again would double that
    // increment SILENTLY (its sidecar advance still lands on the right
    // corpus total). Refuse loudly; the caller rebuilds via a tracked
    // load, which sees the same mismatch.
    val metaBefore = readMeta(s, path)
    val recordedRows = metaBefore.flatMap(_.get(StoreRowsKey)).map(_.toLong)
    recordedRows.foreach { recorded =>
      val actual = actualStoreRows(s, path)
      if (actual != recorded)
        throw new IllegalStateException(
          s"IndexStore.append: $path has $actual rows but the sidecar records " +
            s"$recorded — a previous append tore (parquet committed, sidecar " +
            "lost). Rebuild the store (any tracked load does) before appending.")
    }
    val trackMeta = metaBefore.isDefined || extraMeta.nonEmpty
    val filesBefore = if (trackMeta) dataFiles(s, path) else Set.empty[String]
    rows.write.mode("append").parquet(path)
    // `extraMeta` (e.g. a streaming maintainer's applied-batch marker)
    // lands in the SAME sidecar write that advances the count and the
    // store-rows record, so a reader never sees one without the others.
    if (trackMeta) {
      // O(increment) post-append record: the pre-check just proved
      // recorded == actual, so the new total is recorded + the rows in
      // THIS append's files — a footer count over the increment's files
      // only, not a second full-store scan (which would make a streaming
      // maintainer's per-batch cost grow with the day's accumulated
      // files). A pre-storeRows sidecar pays one full scan to upgrade.
      val newFiles = (dataFiles(s, path) -- filesBefore).toSeq.sorted
      val written =
        if (newFiles.isEmpty) 0L else s.read.parquet(newFiles: _*).count()
      val storeRowsNow = recordedRows match {
        case Some(recorded) => recorded + written
        case None => actualStoreRows(s, path)
      }
      val meta = metaBefore.getOrElse(Map.empty)
      val advanced = meta.get(CorpusCountKey).map(_.toLong) match {
        case Some(stored) if incrementCount >= 0 =>
          meta.updated(CorpusCountKey, (stored + incrementCount).toString)
        case _ => meta
      }
      writeMeta(s, path,
        advanced ++ Map(StoreRowsKey -> storeRowsNow.toString) ++ extraMeta)
    }
  }

  /** Rewrite the store entry into `targetRowsPerFile`-sized parquet files,
    * preserving rows and sidecar verbatim — the maintenance hook that
    * bounds a long-lived appender's file count (every micro-batch append
    * adds a file set, and both the torn-append tripwire's pre-check and
    * any footer count are O(files); same posture as the warehouse's
    * monthly compaction). Crash-clean by staging: the compacted copy is
    * fully written and row-verified at a `.compacting` sibling before a
    * delete+rename swap publishes it. A crash before the swap leaves the
    * live store untouched (plus an orphaned staging dir); a crash between
    * delete and rename leaves NO committed store, which every tracked
    * load reads as "rebuild" — never a half-compacted serve. Single-writer
    * contract as for [[append]].
    */
  def compact(s: SparkSession, corpusDir: String, name: String,
      targetRowsPerFile: Long = 4L << 20, clusterBy: Option[String] = None): Unit = {
    require(targetRowsPerFile > 0, s"bad targetRowsPerFile $targetRowsPerFile")
    val root = configuredDir(s).getOrElse(throw new IllegalStateException(
      s"IndexStore.compact: no index store configured — set $DirConf"))
    val path = storePath(root, corpusDir, name)
    if (!committed(s, path)) throw new IllegalStateException(
      s"IndexStore.compact: no committed store at $path")
    val meta = readMeta(s, path)
    val actual = actualStoreRows(s, path)
    // tripwire before touching anything: compacting a torn store would
    // LAUNDER its duplicates into a clean-looking file set
    meta.flatMap(_.get(StoreRowsKey)).map(_.toLong).foreach { recorded =>
      if (actual != recorded)
        throw new IllegalStateException(
          s"IndexStore.compact: $path has $actual rows but the sidecar " +
            s"records $recorded (torn append) — rebuild before compacting.")
    }
    val files = math.max(1L, (actual + targetRowsPerFile - 1) / targetRowsPerFile)
    val staging = path + ".compacting"
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true) // a prior crash's orphan
    // clusterBy keeps (or establishes) a sort-clustered layout through
    // the rewrite — range-disjoint files + monotone row groups, so a
    // point lookup on that column prunes to O(1) row groups from the
    // parquet min/max stats instead of scanning the store (the
    // maintained IVF assignment store compacts with clusterBy=vec_id:
    // /ann's doc_id serving path is exactly such a lookup)
    val base = s.read.parquet(path)
    (clusterBy match {
      case Some(c) => base.repartitionByRange(files.toInt,
          org.apache.spark.sql.functions.col(c)).sortWithinPartitions(c)
      case None => base.repartition(files.toInt)
    }).write.mode("overwrite").parquet(staging)
    val compactedRows = s.read.parquet(staging).count() // O(few files)
    if (compactedRows != actual) {
      fs.delete(new Path(staging), true)
      throw new IllegalStateException(
        s"IndexStore.compact: staged copy has $compactedRows rows, store has " +
          s"$actual — aborted, live store untouched.")
    }
    meta.foreach(writeMeta(s, staging, _)) // sidecar rides the swap
    if (!fs.delete(p, true))
      throw new java.io.IOException(s"IndexStore.compact: delete $path failed")
    if (!fs.rename(new Path(staging), p))
      throw new java.io.IOException(s"IndexStore.compact: rename $staging -> $path failed")
  }

  /** Right-to-be-forgotten at the index tier: rewrite the store entry
    * WITHOUT the rows whose `keyCol` is in `keys` — the deletion-request
    * path (GDPR/DMCA takedown) for the durable indexes, completing the
    * governance story the warehouse's targeted delete starts. Same
    * crash-clean staging discipline as [[compact]] (fully written and
    * row-verified at a `.purging` sibling before the delete+rename swap;
    * a crash before the swap leaves the live store untouched, a crash
    * between delete and rename leaves no committed store → every tracked
    * load rebuilds). The sidecar rides the swap with [[StoreRowsKey]]
    * re-recorded at the surviving count and [[CorpusCountKey]] decremented
    * by `countDecrement` (the number of DOCUMENTS purged — the caller
    * knows it; store rows per doc vary by index type), so a store-served
    * consumer (e.g. BM25's N) sees the post-purge corpus. Scale: one
    * store scan + an `isin` filter against the (request-sized, broadcast)
    * key list — purge requests are human-scale, never corpus-scale.
    * Session caches holding pre-purge frames are the caller's to
    * invalidate (fresh sessions always reload from the store).
    */
  def purgeKeys(s: SparkSession, corpusDir: String, name: String,
      keyCol: String, keys: Seq[Long], countDecrement: Long = -1L,
      extraMeta: Map[String, String] = Map.empty): Long = {
    require(keys.nonEmpty, "purgeKeys: empty key list")
    val root = configuredDir(s).getOrElse(throw new IllegalStateException(
      s"IndexStore.purgeKeys: no index store configured — set $DirConf"))
    val path = storePath(root, corpusDir, name)
    if (!committed(s, path)) throw new IllegalStateException(
      s"IndexStore.purgeKeys: no committed store at $path")
    val meta = readMeta(s, path)
    val actual = actualStoreRows(s, path)
    meta.flatMap(_.get(StoreRowsKey)).map(_.toLong).foreach { recorded =>
      if (actual != recorded)
        throw new IllegalStateException(
          s"IndexStore.purgeKeys: $path has $actual rows but the sidecar " +
            s"records $recorded (torn append) — rebuild before purging.")
    }
    import org.apache.spark.sql.functions.col
    val store = s.read.parquet(path)
    // NULL keys never match a purge request, but under SQL null semantics
    // `!isin` ALSO drops them — a null-keyed row must survive the rewrite,
    // not vanish into a confusing staged-count abort.
    val removed = store.filter(col(keyCol).isin(keys: _*)).count()
    val staging = path + ".purging"
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true) // a prior crash's orphan
    store.filter(col(keyCol).isNull || !col(keyCol).isin(keys: _*))
      .write.mode("overwrite").parquet(staging)
    val survivors = s.read.parquet(staging).count()
    if (survivors != actual - removed) {
      fs.delete(new Path(staging), true)
      throw new IllegalStateException(
        s"IndexStore.purgeKeys: staged copy has $survivors rows, expected " +
          s"${actual - removed} — aborted, live store untouched.")
    }
    // A bare store (pre-metadata) gains a minimal sidecar here rather than
    // being republished bare: the purge itself just proved the row count,
    // so record it — future appends/loads get the torn-append tripwire.
    val m = meta.getOrElse(Map.empty[String, String])
    val decremented = m.get(CorpusCountKey).map(_.toLong) match {
      case Some(stored) if countDecrement >= 0 =>
        m.updated(CorpusCountKey, math.max(0L, stored - countDecrement).toString)
      case _ => m
    }
    // the content digest covered the purged docs' text, which is gone —
    // drop it rather than publish a digest the store no longer matches.
    // `extraMeta` (e.g. the embedding-tier purge's ledger decrements)
    // rides the SAME staged sidecar as the row rewrite, so a crash can
    // never publish purged rows with un-decremented ledgers or vice versa.
    writeMeta(s, staging,
      (decremented - CorpusHashKey) ++
        Map(StoreRowsKey -> survivors.toString) ++ extraMeta)
    if (!fs.delete(p, true))
      throw new java.io.IOException(s"IndexStore.purgeKeys: delete $path failed")
    if (!fs.rename(new Path(staging), p))
      throw new java.io.IOException(s"IndexStore.purgeKeys: rename $staging -> $path failed")
    removed
  }
}
