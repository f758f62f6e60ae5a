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

  /** Consumer path with the JDBC store step: raw value stream → flatten →
    * JDBC batch insert per micro-batch (offsets checkpoint after commit).
    * Mirrors [[WeatherStreamJob.start]]'s dead-letter contract.
    */
  def start(raw: DataFrame, cfg: Config, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("300 seconds"),
            deadLetterPath: Option[String] = None): StreamingQuery =
    WeatherFlatten.parse(raw)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = if (deadLetterPath.isDefined) batch.persist() else batch
        try {
          writeBatch(WeatherFlatten.flatten(b), cfg)
          deadLetterPath.foreach { p =>
            WeatherFlatten.malformedRaw(b).write.mode("append").text(p)
          }
        } finally if (deadLetterPath.isDefined) { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
