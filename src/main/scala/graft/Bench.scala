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
    Materialize.quietReleaseWarnings()
    // noop sink, not count(): count() lets Catalyst prune the computed
    // columns, so projection-heavy queries would benchmark as bare scans.
    // noop forces every output column through the full plan.
    // releaseAll after every consumed result: per-query ephemeral
    // localCheckpoint blocks otherwise accumulate across 129 queries × 2
    // passes in one JVM and degrade every scan-heavy query (the r9 warm
    // collapse: driver warm 260 s vs 103 s isolated).
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally Materialize.releaseAll(spark)
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
    // Locale.ROOT: the f-interpolator uses the default locale, which under
    // comma-decimal locales would print "1,234" and corrupt the JSON line.
    def fmt(v: Double) =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def toJson(m: Seq[(String, Double)], key: String => String = identity) =
      m.map { case (k, v) => s"\"" + key(k) + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.reverse.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val warmTotal = fmt(warm.map(_._2).filter(_ >= 0).sum)
    // FULL line (both per-query maps, full names) → the bench_out file:
    // the driver's stdout capture keeps only the LAST ~2000 chars, which
    // at 129 queries cannot hold even one full-name per-query map (~3.4
    // KB), so per-round adjudication reads the committed file.
    val fullLine = s"""{"unit":"sec","sf":"$sfDir","queries":${toJson(results)},""" +
      (if (warm.isEmpty) "" else s""""queries_warm":${toJson(warm)},"value_warm":$warmTotal,""") +
      s""""errors":$errJson,"value":${fmt(total)},"metric":"total"}"""
    // STDOUT line, sized to parse whole inside the 2000-char tail capture
    // (every BENCH_r1–r9 artifact has parsed:null from exactly this):
    // per-query values keyed by the name's unique first segment (q01…q127,
    // q36a — verified collision-free), warm map only when warm ran (the
    // plan-comparison signal; cold totals stay), totals at the end.
    def short(k: String) = k.split('_').head
    val perQuery =
      if (warm.isEmpty) s""""queries":${toJson(results, short)},"""
      else s""""queries":{},"queries_warm":${toJson(warm, short)},"value_warm":$warmTotal,"""
    val line = s"""{"unit":"sec","sf":"$sfDir",""" + perQuery +
      s""""errors":$errJson,"value":${fmt(total)},"metric":"total"}"""
    // Sentinel on its own line directly above the JSON: a parser scanning
    // captured stdout can anchor on it instead of guessing which line is
    // the payload (build.sbt's StdoutOutput strategy keeps both lines
    // free of sbt's "[info] " prefix).
    println("GRAFT_BENCH_JSON")
    println(line)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out/bench_last.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"bench: could not persist $outFile: $e")
    }
    spark.stop()
  }
}
