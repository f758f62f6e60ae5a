package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic LOCAL fixture scaler for scale rehearsals (SCALE.md): the
  * driver ships sf ≤ 0.1, so the sf0.1→sf1 scaling-exponent measurement
  * needs a locally generated 10× set. Replication is FK-consistent (every
  * bigint key family shifts by `replica × (max_key + 1)`) and
  * WORKLOAD-PRESERVING rather than row-duplicating:
  *
  *  - `documents`: replica r > 0 prefixes every token with `r<r>` — token
  *    counts, in-replica duplicate structure, and shingle df distributions
  *    are preserved while cross-replica shingle spaces stay DISJOINT, so
  *    the dedup pair space scales ~linearly (replicating text verbatim
  *    would instead make every doc a 10-way near-dup and square the pair
  *    space — a different workload, not a bigger one). A 10% planted
  *    stratum per replica ([[plantedText]]) is rewritten onto a shared
  *    global vocabulary instead, so factor-proportional document
  *    frequencies — and with them the vocabulary-coverage workload
  *    (q67) — survive the prefixing at every factor;
  *  - `embeddings`: replica r rotates the vector by r positions — norms
  *    and pairwise-similarity distribution preserved, replicas
  *    decorrelated;
  *  - `events.ts` is written back as raw long nanos, the driver fixtures'
  *    physical type, so [[Tables.load]] applies the identical decode path.
  *
  * NOT an oracle input: generated dirs are for `graft.Bench` only (the
  * DuckDB correctness gate stays on the driver's own fixtures).
  */
object DataGen {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DataGen <srcDir> <outDir> [factor] [userMode: uniform|zipf]")
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val userMode = if (args.length > 3) args(3) else "uniform"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, factor, userMode)
    spark.stop()
  }

  private def keySpan(df: DataFrame, key: String): Long =
    df.agg(max(col(key)).cast(LongType)).head().getLong(0) + 1

  /** The planted SHARED-vocabulary stratum: [[PlantPerMille]]‰ of every
    * replica-i≥1's documents (a pure hash of the shifted doc_id; replica 0
    * is exempt — see the write site) have their
    * text rewritten token-for-token onto a small GLOBAL vocabulary
    * g00..g31 — the only token types whose document frequency grows with
    * the factor (everything else is replica-prefixed, so per-type df is
    * capped at one replica's worth). This keeps the vocabulary-coverage
    * workload (q67) non-vacuous at ANY factor: the global top-k reference
    * vocabulary is the g-family by construction at factor ≥ 10, planted
    * docs straddle the 50% OOV threshold (each token is in the top-16-of-
    * 32 vocab with probability ≈ ½), and unplanted docs fail it — a real
    * survivor stratum plus a real rejected mass. Replica-prefixed docs
    * keep their disjoint shingle spaces; the planted docs' shingle space
    * (g-grams) is bounded at 32³, so its near-dup pair contribution stays
    * a small constant fraction of the base corpus's own in-replica pair
    * space.
    */
  private val PlantPerMille = 100
  private val PlantVocab = 32

  private def plantedDoc(docId: Column): Column =
    pmod(xxhash64(docId, lit("oov_plant")), lit(1000L)) < PlantPerMille

  /** Token-for-token deterministic rewrite onto the g-vocabulary: token j
    * of a planted doc becomes g<hash(doc_id, j) % 32>, zero-padded so
    * lexicographic tie-breaks are stable. Token COUNT is preserved (the
    * length-keyed workload shape survives); content is replica- and
    * doc-specific (no verbatim cross-replica duplicates — the pair space
    * must scale with the workload, not square with the factor).
    */
  private def plantedText(docId: Column): Column =
    concat_ws(" ",
      transform(split(col("text"), "\\s+"), (_, j) =>
        concat(lit("g"), lpad(pmod(xxhash64(docId, j), lit(PlantVocab.toLong))
          .cast(org.apache.spark.sql.types.StringType), 2, "0"))))

  /** `userMode = "zipf"` remaps events.user_id to a deterministic Zipf(1)
    * distribution over the replicated user span — the heavy-hitter shape a
    * production events table has (a 100-TB clickstream is never uniform).
    * Inverse-CDF sampling of p(r) ∝ 1/r over [1, U): r = ⌊exp(v·ln U)⌋ with
    * v a pure hash of event_id, so the fixture is reproducible and engine-
    * independent. The rank-1 user absorbs ≈ ln(2)/ln(U) of ALL events
    * (~5% at U≈2M) — the single-task window/grouping partition the skew
    * rehearsal exists to exercise. Every per-user query contract is
    * unchanged (same schema, same semantics — only the key distribution
    * moves), and the DuckDB oracle runs on the same parquet, so the
    * behavioral family stays oracle-checkable at skew.
    */
  def generate(spark: SparkSession, src: String, out: String, factor: Int,
      userMode: String = "uniform"): Unit = {
    def shift(c: String, span: Long, i: Int): Column = col(c) + lit(span * i)
    def write(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")
    def reps(mk: Int => DataFrame): DataFrame =
      (0 until factor).map(mk).reduce(_ union _)

    for (t <- Seq("region", "nation")) write(t, Tables.load(spark, src, t), 1)

    val cust = Tables.load(spark, src, "customer")
    val supp = Tables.load(spark, src, "supplier")
    val part = Tables.load(spark, src, "part")
    val ord = Tables.load(spark, src, "orders")
    val li = Tables.load(spark, src, "lineitem")
    val ev = Tables.load(spark, src, "events")
    val docs = Tables.load(spark, src, "documents")
    val emb = Tables.load(spark, src, "embeddings")
    val (cSpan, sSpan, pSpan, oSpan) = (keySpan(cust, "c_custkey"),
      keySpan(supp, "s_suppkey"), keySpan(part, "p_partkey"), keySpan(ord, "o_orderkey"))
    val (eSpan, uSpan) = (keySpan(ev, "event_id"), keySpan(ev, "user_id"))
    val (dSpan, vSpan) = (keySpan(docs, "doc_id"), keySpan(emb, "vec_id"))

    write("customer", reps(i => cust.withColumn("c_custkey", shift("c_custkey", cSpan, i))), 4)
    write("supplier", reps(i => supp.withColumn("s_suppkey", shift("s_suppkey", sSpan, i))), 2)
    write("part", reps(i => part.withColumn("p_partkey", shift("p_partkey", pSpan, i))), 4)
    write("orders", reps(i => ord
      .withColumn("o_orderkey", shift("o_orderkey", oSpan, i))
      .withColumn("o_custkey", shift("o_custkey", cSpan, i))), 8)
    write("lineitem", reps(i => li
      .withColumn("l_orderkey", shift("l_orderkey", oSpan, i))
      .withColumn("l_partkey", shift("l_partkey", pSpan, i))
      .withColumn("l_suppkey", shift("l_suppkey", sSpan, i))), 16)
    // back to the fixtures' physical type: raw long nanos
    val totalUsers = uSpan * factor
    def userCol(i: Int): Column = userMode match {
      case "zipf" =>
        // v uniform in [0,1) from a pure event_id hash; r = ⌊exp(v·ln U)⌋
        // inverts the Zipf(1) CDF (≈ ln r / ln U) over [1, U). Full
        // 63-bit hash width (no coarse modulus grid: a 1e6 grid would cap
        // distinct v values — and so distinct users — at 1e6 regardless
        // of factor, silently flattening per-user cardinality growth at
        // large scale-ups).
        val v = pmod(xxhash64(col("event_id"), lit("zipf_users")),
            lit(Long.MaxValue))
          .cast(org.apache.spark.sql.types.DoubleType) / Long.MaxValue.toDouble
        floor(exp(v * math.log(totalUsers.toDouble))).cast(LongType)
      case _ => shift("user_id", uSpan, i)
    }
    write("events", reps(i => ev
      .withColumn("event_id", shift("event_id", eSpan, i))
      .withColumn("user_id", userCol(i))
      .withColumn("ts", unix_micros(col("ts")) * 1000L)), 8)
    write("documents", reps { i =>
      val d = docs.withColumn("doc_id", shift("doc_id", dSpan, i))
      // Replica 0 is EXEMPT from planting: generate(factor=1) reproduces
      // the source corpus byte-for-byte, and the driver's own (un-planted)
      // sf0.1 fixture stays workload-homologous with generated sf1/sf2 —
      // the scaling-exponent comparison reads the same base workload at
      // every point. Cost: per-type g-token df is (factor−1)/factor of
      // fully-proportional — immaterial to the q67 threshold workload at
      // factor ≥ 2, and the stratum still grows linearly with the factor.
      if (i == 0) d
      else {
        val prefixed = concat_ws(" ",
          transform(split(col("text"), "\\s+"), t => concat(lit(s"r$i"), t)))
        d.withColumn("text", when(plantedDoc(col("doc_id")), plantedText(col("doc_id")))
            .otherwise(prefixed))
          .withColumn("n_chars", length(col("text")).cast(LongType))
      }
    }, 8)
    write("embeddings", reps { i =>
      val e = emb.withColumn("vec_id", shift("vec_id", vSpan, i))
      if (i == 0) e
      else e.withColumn("embedding",
        concat(slice(col("embedding"), i + 1, 64 - i), slice(col("embedding"), 1, i)))
    }, 4)
  }
}
