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
      // UTC pin: events.ts arrives as TIMESTAMP_NTZ and Tables.load casts it
      // to TimestampType — only value-preserving when the session is UTC.
      .config("spark.sql.session.timeZone", "UTC")
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
    val results = specs.map(sp => sp.name -> timed(sp.fn, sp.name))
    // Second, warm pass — ON by default (SPARK_GRAFT_WARM=0 skips it):
    // per-query JIT/GC swing is ±20%..5× on the cold run (r02 recorded
    // 6.8 s for a query whose warmed plan runs in ~1 s), so the warm
    // numbers are the plan-comparison signal. The headline "value" stays
    // the cold-run sum for comparability with earlier rounds.
    val resMap = results.toMap
    val warm =
      if (sys.env.get("SPARK_GRAFT_WARM").contains("0")) Seq.empty
      else specs.filter(sp => resMap(sp.name) >= 0)
        .map(sp => sp.name -> timed(sp.fn, sp.name))
    // 3-decimal values keep the ONE json line short, and the totals sit at
    // the END of the line: the driver's tail capture keeps the line's
    // tail, and r02 lost the leading fields (metric/value + the first
    // queries) to exactly that truncation.
    // Locale.ROOT: the f-interpolator uses the default locale, which under
    // comma-decimal locales would print "1,234" and corrupt the JSON line.
    def fmt(v: Double) =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def toJson(m: Seq[(String, Double)]) =
      m.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.reverse.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val warmJson =
      if (warm.isEmpty) ""
      else s""""queries_warm":${toJson(warm)},"value_warm":${fmt(warm.map(_._2).filter(_ >= 0).sum)},"""
    val line = s"""{"unit":"sec","sf":"$sfDir","queries":${toJson(results)},""" +
      warmJson + s""""errors":$errJson,"value":${fmt(total)},"metric":"total"}"""
    println(line)
    // The driver's tail capture has truncated this line mid-JSON before
    // (ADVICE r7: BENCH_r06/r07 lost the cold per-query map, "parsed":null),
    // so ALSO persist the full JSON to a file for reproducible adjudication.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out/bench_last.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"bench: could not persist $outFile: $e")
    }
    spark.stop()
  }
}
