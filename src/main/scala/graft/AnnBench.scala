package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Similarity, Sizing}
import graft.functions.VectorFunctions.dotDec

/** Scale measurement for the embedding/ANN family on the DERIVED-sizing
  * library path (the round-4 rehearsal measured exponent 0.61 for this
  * family with the FIXTURE constants held — 16 SRP buckets/table, 16 IVF
  * cells — so buckets/cells grew linearly with the corpus and the
  * Σ|bucket|²/Σ|cell|² pair spaces grew ~quadratically; `operators.Sizing`
  * is the fix, and this main is its empirical check).
  *
  * Usage: `AnnBench <dir1> [dir2 ...]` — for each data dir, times a warm
  * pass of the q47/q53/q68 pipelines with planes/cells derived from the
  * corpus count, and prints ONE JSON line per dir.
  *
  * Regime matching: the default sizing targets (1024 rows/bucket, 4096
  * rows/cell) put a 2k–20k-row FIXTURE corpus in the clamp regime
  * (`MinPlanes`/`MinCells` active, cells far below target), which is not
  * the geometry a multi-billion-row production corpus reaches. The
  * measurement therefore re-aims both targets down 16× (64 rows/bucket,
  * 256 rows/cell) so BOTH scales sit in the at-target regime — buckets and
  * cells at their target occupancy, the pair space n·target by
  * construction — exactly the regime the default targets produce at
  * n ≥ ~4M rows. The derivation formulas under measurement are unchanged;
  * only the target constants are scaled to match fixture row counts.
  */
object AnnBench {

  /** 16× below the production targets: keeps a 2k-row corpus at-target. */
  val BucketTarget = Sizing.TargetBucketRows / 16 // 64
  val CellTarget = Sizing.TargetCellRows / 16 // 256

  private val NumQueries = 8
  private val Probes = 2
  private val TopK = 3
  private val Tau = 0.5
  private val SemTau = 0.45

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnBench <dataDir> [dataDir ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach(dir => measure(spark, dir))
    spark.stop()
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Seconds for one run of `f` (cold includes codegen; callers take the
    * SECOND call as the warm number, matching graft.Bench's methodology).
    */
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def fmt(v: Double) =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Minimal JSON string literal (a path may carry quotes, backslashes —
    * or control characters, which JSON forbids raw in strings).
    */
  private def jstr(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < 0x20 => "\\u%04x".format(c.toInt)
      case c => c.toString
    }.mkString("\"", "", "\"")

  def measure(spark: SparkSession, dir: String): Unit = {
    val e = Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val planes = Sizing.derivePlanes(n, BucketTarget)
    val cells = Sizing.deriveCells(n, CellTarget)

    // --- index builds (the amortized cost: once per corpus, not per query)
    var srpIdx: DataFrame = null
    val tSrpBuild = time {
      srpIdx = Similarity.srpRows(e, planes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      noop(srpIdx)
    }
    var model: Ivf.Model = null
    val eqf = Ivf.quantize(e)
    val tIvfFit = time {
      // k = 0: fit() itself derives the cell count from CellTarget — the
      // sizing knob under measurement is genuinely exercised, not
      // precomputed and passed in as an explicit k.
      model = Ivf.fit(eqf, cellTarget = CellTarget,
        seedTarget = Ivf.TargetSeedSample / 16)
    }
    require(model.cents.length <= cells,
      s"fit derived ${model.cents.length} cells, expected ≤ $cells (empty cells may drop)")
    val centsDF = Ivf.centsDF(spark, model.cents)

    // --- serving pipelines (cold, then warm; warm is the signal)
    def q47d(): Unit = noop(Similarity.neardupPairs(e, srpIdx, Tau))
    def q53d(): Unit =
      noop(Ivf.annTopK(e, eqf, centsDF, NumQueries, Probes, TopK, dotDec))
    def q68d(): Unit = {
      val probed = Ivf.ranked(eqf, centsDF)
        .filter(col("rk") <= Probes)
        .select(col("vec_id"), col("cid").as("cell"), col("eq"))
      noop(Similarity.semDedupDrops(e, probed, SemTau))
    }
    val ops = Seq[(String, () => Unit)](
      "q47d_neardup" -> (() => q47d()),
      "q53d_ann_ivf" -> (() => q53d()),
      "q68d_semdedup" -> (() => q68d()))
    val cold = ops.map { case (name, f) => name -> time(f()) }
    val warm = ops.map { case (name, f) => name -> time(f()) }
    srpIdx.unpersist()

    def obj(m: Seq[(String, Double)]) =
      m.map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    val warmTotal = warm.map(_._2).sum
    println(s"""{"dir":${jstr(dir)},"n":$n,"planes":$planes,"cells":$cells,""" +
      s""""bucket_target":$BucketTarget,"cell_target":$CellTarget,""" +
      s""""build":{"srp":${fmt(tSrpBuild)},"ivf_fit":${fmt(tIvfFit)}},""" +
      s""""cold":${obj(cold)},"warm":${obj(warm)},"warm_total":${fmt(warmTotal)}}""")
  }
}
