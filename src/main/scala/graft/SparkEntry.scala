package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-module registries ([[QuerySpec]]); every
  * SQL-expressible operator carries DuckDB oracle SQL for the driver's
  * hash-compare (SURVEY.md §5).
  */
object SparkEntry {

  /** All registered query specs, in module order. */
  def specs: Seq[QuerySpec] =
    operators.Relational.specs ++
      operators.TextAnalysis.specs ++
      operators.Dedup.specs ++
      operators.Similarity.specs ++
      operators.EventsWindows.specs ++
      operators.Behavioral.specs ++
      operators.WeatherOps.specs ++
      operators.MultimodalOps.specs ++
      operators.SqlSurface.specs ++
      operators.Extras.specs ++
      operators.TrainPipe.specs ++
      operators.CorpusClean.specs ++
      operators.CorpusOps.specs ++
      operators.Bpe.specs ++
      operators.Analytics.specs ++
      operators.Fuzzy.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(sp => sp.name -> sp.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(sp => sp.oracle.map(sp.name -> _)).toMap
}
