package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = args.toSet // optional query-name filter for local iteration
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink, not count(): count() lets Catalyst prune the computed
    // columns, so projection-heavy queries would benchmark as bare scans.
    // noop forces every output column through the full plan.
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Warm up codegen/classloading once so per-query numbers measure the
    // plans, not first-query JVM startup; run in declared spec order.
    try run((s, _) => SparkEntry.entry(s)) catch { case _: Throwable => () }
    var errors = List.empty[String]
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
              name: String): Double = {
      val t0 = System.nanoTime()
      // A failed query records -1.0 (and lands in "errors") so breakage
      // never reads as a time-to-failure performance win.
      try { run(fn); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => errors ::= name; -1.0 }
    }
    val specs = SparkEntry.specs.filter(sp => only.isEmpty || only(sp.name))
    val results = specs.map(sp => sp.name -> timed(sp.fn, sp.name)).toMap
    // Optional second, warm pass (SPARK_GRAFT_WARM=1): per-query JIT/GC
    // swing is ±20% on the first run; warm numbers are the plan-comparison
    // signal. Opt-in so the default bench wall time stays unchanged; the
    // headline total is always the first-run sum for comparability.
    val warm =
      if (sys.env.get("SPARK_GRAFT_WARM").contains("1"))
        specs.filter(sp => results(sp.name) >= 0)
          .map(sp => sp.name -> timed(sp.fn, sp.name)).toMap
      else Map.empty[String, Double]
    def toJson(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val errJson = errors.reverse.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val warmJson =
      if (warm.isEmpty) ""
      else s""""value_warm":${warm.values.filter(_ >= 0).sum},"queries_warm":${toJson(warm)},"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${toJson(results)},""" +
      warmJson + s""""errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
