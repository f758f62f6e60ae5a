package graft.streaming

import graft.weather.WeatherFlatten
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S6 production seam: the reference's store step is a batched native-
  * protocol insert into ClickHouse with connection-level limits
  * (`app/clickhouse_db.py:10–30`: max_execution_time=60, batched insert
  * `:87–96`). The Spark-native equivalent is `foreachBatch` →
  * `DataFrameWriter.jdbc`, with the same knobs carried as JDBC options:
  *
  *  - `batchsize`      ← the reference's 90-row flush unit (executemany
  *                       batching); rows per addBatch/executeBatch round;
  *  - `queryTimeout`   ← max_execution_time=60 (seconds, per statement);
  *  - `numPartitions`  ← caps concurrent connections, like the single
  *                       pooled client in the reference;
  *  - `isolationLevel` NONE ← the reference disables insert dedup/txn
  *                       semantics for throughput (insert_deduplicate=0).
  *
  * Offline there is no ClickHouse; the seam is exercised end-to-end in
  * StreamingSpec against Spark's bundled embedded Derby (a real JDBC
  * driver), and the parquet Warehouse stand-in remains the default test
  * sink. At-least-once holds exactly as in [[WeatherStreamJob.start]]:
  * offsets commit to the checkpoint WAL only after the JDBC write returns.
  */
object JdbcSink {

  final case class Config(
      url: String,
      table: String,
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      batchSize: Int = 90,
      queryTimeoutSec: Int = 60,
      numPartitions: Option[Int] = None)

  /** The exact option map handed to the JDBC writer (unit-testable seam). */
  def options(cfg: Config): Map[String, String] =
    Map(
      "url" -> cfg.url,
      "dbtable" -> cfg.table,
      "batchsize" -> cfg.batchSize.toString,
      "queryTimeout" -> cfg.queryTimeoutSec.toString,
      "isolationLevel" -> "NONE") ++
      cfg.user.map("user" -> _) ++
      cfg.password.map("password" -> _) ++
      cfg.driver.map("driver" -> _) ++
      cfg.numPartitions.map("numPartitions" -> _.toString)

  /** One micro-batch → one batched JDBC append. */
  def writeBatch(batch: DataFrame, cfg: Config): Unit =
    batch.write.mode("append").format("jdbc").options(options(cfg)).save()

  /** Column stamping each row with its micro-batch id in idempotent mode.
    * No leading underscore and all-lowercase: it must survive every
    * backend's unquoted-identifier rules (Derby rejects a leading `_`),
    * since the delete statement below references it unquoted.
    */
  val BatchIdCol = "graft_batch_id"

  /** Idempotent (exactly-once) variant of [[writeBatch]]: every row is
    * stamped with the micro-batch id, and the write first DELETEs any rows
    * already carrying that id — so a replayed batch (crash between the
    * JDBC commit and the checkpoint commit, the at-least-once window)
    * overwrites its own partial/duplicate insert instead of doubling
    * rows. Delete-then-insert rather than a staging swap: one round trip,
    * no second table, and the delete is an indexed point predicate on the
    * batch-id column. The default [[writeBatch]] stays at-least-once,
    * matching the reference's own choice (`insert_deduplicate=0`,
    * clickhouse_db.py:23) — this mode is opt-in for sinks that need the
    * upgrade.
    */
  def writeBatchIdempotent(batch: DataFrame, cfg: Config, batchId: Long): Unit = {
    deleteBatch(batch.sparkSession, cfg, batchId)
    writeBatch(batch.withColumn(BatchIdCol, org.apache.spark.sql.functions.lit(batchId)), cfg)
  }

  /** Remove a previous (partial) insert of `batchId`, if the table exists
    * yet — plain JDBC, one indexed DELETE. First-ever batch: the table is
    * created by the append below, nothing to delete.
    */
  private[streaming] def deleteBatch(spark: org.apache.spark.sql.SparkSession,
      cfg: Config, batchId: Long): Unit = {
    cfg.driver.foreach(Class.forName)
    val props = new java.util.Properties()
    cfg.user.foreach(props.setProperty("user", _))
    cfg.password.foreach(props.setProperty("password", _))
    val conn = java.sql.DriverManager.getConnection(cfg.url, props)
    try {
      val exists =
        try { conn.createStatement().executeQuery(
          s"SELECT 1 FROM ${cfg.table} WHERE 1=0").close(); true }
        catch { case _: java.sql.SQLException => false }
      if (exists) {
        // double-quoted (ANSI) identifier: Spark's JDBC writer creates the
        // column quoted, i.e. case-sensitive lowercase — an unquoted
        // reference would fold case and miss it
        val st = conn.prepareStatement(
          s"""DELETE FROM ${cfg.table} WHERE "$BatchIdCol" = ?""")
        try { st.setLong(1, batchId); st.executeUpdate(); () } finally st.close()
      }
    } finally conn.close()
  }

  /** Consumer path with the JDBC store step: raw value stream → flatten →
    * JDBC batch insert per micro-batch (offsets checkpoint after commit).
    * Mirrors [[WeatherStreamJob.start]]'s dead-letter contract.
    * `idempotent = true` upgrades the at-least-once default to
    * exactly-once via [[writeBatchIdempotent]].
    */
  def start(raw: DataFrame, cfg: Config, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("300 seconds"),
            deadLetterPath: Option[String] = None,
            idempotent: Boolean = false): StreamingQuery =
    WeatherFlatten.parse(raw)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = if (deadLetterPath.isDefined) batch.persist() else batch
        try {
          if (idempotent) writeBatchIdempotent(WeatherFlatten.flatten(b), cfg, batchId)
          else writeBatch(WeatherFlatten.flatten(b), cfg)
          deadLetterPath.foreach { p =>
            WeatherFlatten.malformedRaw(b).write.mode("append").text(p)
          }
        } finally if (deadLetterPath.isDefined) { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
