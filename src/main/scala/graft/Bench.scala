package graft
import org.apache.spark.sql.SparkSession

/** Per-pass environment telemetry so a bench artifact is self-adjudicating:
  * the r9 warm-collapse was real accumulated state (evicted blocks piling up
  * in one JVM), the r13 one was co-residency/box drift — but neither was
  * decidable from the committed JSON alone. Each pass now records GC time,
  * storage-memory occupancy, block add/drop counts (a SparkListener), the
  * co-resident java-process count from /proc, and 1-min loadavg, per the
  * adjudication protocol documented in BASELINE.md ("Reading the telemetry").
  */
private final class BenchBlockListener extends org.apache.spark.scheduler.SparkListener {
  val added = new java.util.concurrent.atomic.AtomicLong(0L)
  val dropped = new java.util.concurrent.atomic.AtomicLong(0L)
  override def onBlockUpdated(ev: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit =
    // An invalid storage level on a block update is a removal/eviction;
    // a valid one is an add (cache fill, localCheckpoint block, shuffle).
    if (ev.blockUpdatedInfo.storageLevel.isValid) added.incrementAndGet()
    else dropped.incrementAndGet()
}

object Bench {
  import scala.jdk.CollectionConverters._

  private def gcTotals(): (Long, Long) = {
    val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(b => math.max(0L, b.getCollectionTime)).sum,
     beans.map(b => math.max(0L, b.getCollectionCount)).sum)
  }

  /** Count of live java processes on the box that are NOT this JVM or one of
    * its ancestors (the sbt launcher that forked us is expected and excluded)
    * — so >0 means a genuinely co-resident JVM shared the box during a pass,
    * the r8 signature that inflated totals 1.4–2×. */
  private def javaProcCount(): Int =
    try {
      def ppidOf(pid: String): Option[String] =
        try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc", pid, "stat")), "UTF-8")
          // field 4 of /proc/<pid>/stat is ppid; comm (field 2) may contain
          // spaces so split after the closing paren.
          .split("\\)\\s+").last.split("\\s+").drop(1).headOption
        catch { case _: Exception => None }
      val self = new java.io.File("/proc/self").getCanonicalFile.getName
      val ancestors = Iterator.iterate(Option(self))(p => p.flatMap(ppidOf))
        .takeWhile(p => p.isDefined && p.get != "0").take(32).flatten.toSet
      val proc = new java.io.File("/proc")
      proc.listFiles().iterator
        .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
        .filterNot(f => ancestors(f.getName))
        .count { d =>
          try {
            val comm = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(d.getPath, "comm")), "UTF-8").trim
            comm == "java"
          } catch { case _: Exception => false }
        }
    } catch { case _: Exception => -1 }

  private def load1(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ")(0).toDouble
    catch { case _: Exception => -1.0 }

  /** Driver storage memory in use (MB): max minus remaining across block
    * managers — in local mode this is the single driver entry. Nonzero at
    * pass end means cached/ephemeral blocks survived releaseAll. */
  private def storageUsedMb(spark: SparkSession): Long =
    try spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, rem) => max - rem }.sum / (1024L * 1024L)
    catch { case _: Exception => -1L }

  private def heapUsedMb(): Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory - rt.freeMemory) / (1024L * 1024L)
  }

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
      finally {
        Materialize.releaseAll(spark)
        // dead-broadcast backpressure: past 70% heap occupancy, reclaim
        // the finished query's broadcast/LUT blocks deterministically
        // instead of letting them pile into the next query's allocations
        // (the sf2-at-16g warm>cold signature — SCALE.md r15)
        Materialize.reclaimDeadBroadcasts()
        ()
      }
    val blockStats = new BenchBlockListener
    spark.sparkContext.addSparkListener(blockStats)
    // Warm up codegen/classloading once so per-query numbers measure the
    // plans, not first-query JVM startup; run in declared spec order.
    try run((s, _) => SparkEntry.entry(s)) catch { case _: Throwable => () }
    // Per-pass snapshots (taken at pass boundaries): deltas across a pass
    // plus end-of-pass absolutes, keyed "cold"/"warm" in the output.
    final case class Snap(gcMs: Long, gcN: Long, added: Long, dropped: Long,
                          jvms: Int, ld: Double, storageMb: Long, heapMb: Long)
    def snap(): Snap = {
      val (gMs, gN) = gcTotals()
      Snap(gMs, gN, blockStats.added.get, blockStats.dropped.get,
        javaProcCount(), load1(), storageUsedMb(spark), heapUsedMb())
    }
    def passJson(a: Snap, b: Snap, wallS: Double): String = {
      def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      s"""{"wall_s":${f(wallS)},"gc_ms":${b.gcMs - a.gcMs},"gc_n":${b.gcN - a.gcN},""" +
        s""""blocks_added":${b.added - a.added},"blocks_dropped":${b.dropped - a.dropped},""" +
        s""""jvms_start":${a.jvms},"jvms_end":${b.jvms},""" +
        s""""load1_start":${f(a.ld)},"load1_end":${f(b.ld)},""" +
        s""""storage_used_mb_end":${b.storageMb},"heap_used_mb_end":${b.heapMb}}"""
    }
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
    val coldStart = snap()
    val tCold0 = System.nanoTime()
    val results = specs.map(sp => sp.name -> timed(sp.fn, sp.name))
    val coldEnd = snap()
    val coldWall = (System.nanoTime() - tCold0) / 1e9
    // Second, warm pass — ON by default (SPARK_GRAFT_WARM=0 skips it):
    // per-query JIT/GC swing is ±20%..5× on the cold run (r02 recorded
    // 6.8 s for a query whose warmed plan runs in ~1 s), so the warm
    // numbers are the plan-comparison signal. The headline "value" stays
    // the cold-run sum for comparability with earlier rounds.
    val resMap = results.toMap
    val warmStart = snap()
    val tWarm0 = System.nanoTime()
    val warm =
      if (sys.env.get("SPARK_GRAFT_WARM").contains("0")) Seq.empty
      else specs.filter(sp => resMap(sp.name) >= 0)
        .map(sp => sp.name -> timed(sp.fn, sp.name))
    val warmEnd = snap()
    val warmWall = (System.nanoTime() - tWarm0) / 1e9
    val telemetry = s"""{"cold":${passJson(coldStart, coldEnd, coldWall)}""" +
      (if (warm.isEmpty) "}" else s""","warm":${passJson(warmStart, warmEnd, warmWall)}}""")
    // One-look adjudication flags (protocol in BASELINE.md): shared_box = a
    // non-ancestor java process was alive at any boundary; state_accum = the
    // warm pass ended with storage memory occupied AND GROWN vs the cold
    // pass's end — the by-design session-cached shared indexes occupy a
    // steady (sf-proportional) footprint from the first pass on, while the
    // r9-real accumulation signature is per-pass monotonic growth (evicted
    // ephemeral blocks piling up); an absolute threshold alone
    // false-positives on any fixture big enough for the caches to pass it
    // (measured: 348 MB steady at sf1, identical at both pass ends).
    // gc_pressure = warm-pass GC time exceeds 10% of its wall.
    val sharedBox = Seq(coldStart, coldEnd, warmStart, warmEnd).exists(_.jvms > 0)
    val stateAccum = warm.nonEmpty && warmEnd.storageMb > 64 &&
      warmEnd.storageMb > coldEnd.storageMb * 5 / 4 + 16
    val gcPressure = warm.nonEmpty &&
      (warmEnd.gcMs - warmStart.gcMs) > (warmWall * 1000 * 0.10)
    // Raw end-of-pass storage occupancy rides NEXT TO the boolean: the
    // growth gate deliberately tolerates a large steady cache, so an
    // adjudicator can still see near-threshold growth (or a cold-pass
    // plateau leak the gate cannot catch) even when state_accum is false.
    val flags = s"""{"shared_box":$sharedBox,"state_accum":$stateAccum,""" +
      s""""gc_pressure":$gcPressure,"storage_mb_cold_end":${coldEnd.storageMb},""" +
      s""""storage_mb_warm_end":${warmEnd.storageMb}}"""
    // Locale.ROOT: the f-interpolator uses the default locale, which under
    // comma-decimal locales would print "1,234" and corrupt the JSON line.
    def fmt(v: Double) =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Stdout-map values at centisecond precision: the per-query maps ride
    // a SIZE-LIMITED tail capture (see below), and 169×2 entries at %.3f
    // is ~400 B fatter for digits below measurement noise. The committed
    // bench_out file keeps full %.3f values.
    def fmt2(v: Double) =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def toJson(m: Seq[(String, Double)], key: String => String = identity,
        f: Double => String = fmt) =
      m.map { case (k, v) => s"\"" + key(k) + "\":" + f(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.reverse.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val warmTotal = fmt(warm.map(_._2).filter(_ >= 0).sum)
    // FULL line (both per-query maps, full names) → the bench_out file:
    // the driver's stdout capture keeps only the LAST ~2000 chars, which
    // at 129 queries cannot hold even one full-name per-query map (~3.4
    // KB), so per-round adjudication reads the committed file.
    val fullLine = s"""{"unit":"sec","sf":"$sfDir","queries":${toJson(results)},""" +
      (if (warm.isEmpty) "" else s""""queries_warm":${toJson(warm)},"value_warm":$warmTotal,""") +
      s""""telemetry":$telemetry,"flags":$flags,""" +
      s""""errors":$errJson,"value":${fmt(total)},"metric":"total"}"""
    // STDOUT line: per-query values keyed by the name's unique first
    // segment (q01…q167, q35a/q36a — verified collision-free). r18
    // measurement-visibility fix (VERDICT r17 item 1): the cold map used
    // to be REPLACED by "queries":{} whenever the warm pass ran, which
    // blinded the driver's per-query comparison and its scaling block
    // (PERF_r17.json: n_common = 0, per_query = {}). Both maps now ride
    // the stdout line — the r17 tail capture already parsed a 169-entry
    // short-key map, so two maps (~4.5 KB) are within the capture. The
    // timing methodology is untouched; this only changes what is printed.
    def short(k: String) = k.split('_').head
    val perQuery =
      if (warm.isEmpty) s""""queries":${toJson(results, short, fmt2)},"""
      else s""""queries":${toJson(results, short, fmt2)},""" +
        s""""queries_warm":${toJson(warm, short, fmt2)},"value_warm":$warmTotal,"""
    val line = s"""{"unit":"sec","sf":"$sfDir",""" + perQuery +
      s""""flags":$flags,"errors":$errJson,"value":${fmt(total)},"metric":"total"}"""
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
