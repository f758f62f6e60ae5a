package graft

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
  * a half-row.
  */
object IndexStore {

  /** Session conf key: root directory of the on-disk index store. */
  val DirConf = "spark.graft.index.dir"

  def configuredDir(s: SparkSession): Option[String] =
    s.conf.getOption(DirConf).map(_.trim).filter(_.nonEmpty)

  /** Corpus-identity tag: content-free (pure path hash) by design — the
    * store is an optimization tier, and a changed corpus under the SAME
    * path is the caller's cache-invalidation event (delete the store dir),
    * exactly like any warehouse-adjacent materialized view.
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

  /** Serve the index frame `name` for `corpusDir`: load it from the store
    * when present, build-write-reload when absent, or just build when no
    * store is configured. The reload (rather than returning the built
    * frame) pins the returned lineage to the parquet files, so every
    * consumer plan is a plain columnar scan of the store — including in
    * the very session that built it.
    */
  def servedFrom(s: SparkSession, corpusDir: String, name: String)(
      build: => DataFrame): DataFrame =
    configuredDir(s) match {
      case None => build
      case Some(root) =>
        val path = storePath(root, corpusDir, name)
        if (!committed(s, path)) build.write.mode("overwrite").parquet(path)
        s.read.parquet(path)
    }

  /** Append an increment (e.g. a new doc batch's shingle sets) to an
    * existing store. Requires a configured store: an append with nowhere
    * durable to land is a caller bug, not a silent no-op.
    */
  def append(s: SparkSession, corpusDir: String, name: String, rows: DataFrame): Unit = {
    val root = configuredDir(s).getOrElse(throw new IllegalStateException(
      s"IndexStore.append: no index store configured — set $DirConf"))
    rows.write.mode("append").parquet(storePath(root, corpusDir, name))
  }
}
