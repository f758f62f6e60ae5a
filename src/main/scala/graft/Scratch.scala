package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only measurement harness (r18 optimization round): times declared
  * queries and dissected sub-plans in isolation — noop sink, releaseAll +
  * dead-broadcast reclaim between runs, min of 3 reported (the bench's
  * warm-pass posture). Every isolated before/after number in
  * OPTIMIZATION_r18.md comes from here; committed so the measurements are
  * reproducible. Not part of the driver contract (Bench/Verify are).
  *
  * Usage: `runMain graft.Scratch [name-prefix…]` with the usual
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env vars; no args runs all.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Materialize.quietReleaseWarnings()
    val which = args.toSet

    def time(name: String)(df: => DataFrame): Unit =
      if (which.isEmpty || which.exists(name.startsWith)) {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          Materialize.releaseAll(spark)
          Materialize.reclaimDeadBroadcasts()
          t
        }
        println(f"SCRATCH $name%-40s ${ts.min}%7.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      }

    val li = Tables.load(spark, dir, "lineitem")

    // ---- q54 dissection -------------------------------------------------
    time("q54_full_current")(SparkEntry.queries("q54_profile")(spark, dir))
    time("q54_scan_only")(li.select(col("l_quantity"), col("l_extendedprice"), col("l_discount")))
    time("q54_base_stats_only") {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      li.agg(count(lit(1)).as("n"), cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_nn"),
        min(col(c)).cast(DoubleType).as(s"${c}_mn"),
        max(col(c)).cast(DoubleType).as(s"${c}_mx"),
        sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType).as(s"${c}_sm"))): _*)
    }
    time("q54_nd_extendedprice")(
      li.select(col("l_extendedprice")).distinct().agg(count(lit(1)).as("nd")))
    time("q54_nd_quantity")(
      li.select(col("l_quantity")).distinct().agg(count(lit(1)).as("nd")))
    time("q54_rewrite_4scans") {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val base = li.agg(count(lit(1)).as("n"), cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_n_nonnull"),
        min(col(c)).cast(DoubleType).as(s"${c}_min_v"),
        max(col(c)).cast(DoubleType).as(s"${c}_max_v"),
        sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType).as(s"${c}_sum_v"))): _*)
      val joined = cols.foldLeft(base)((acc, c) =>
        acc.crossJoin(li.select(col(c)).distinct()
          .agg(count(lit(1)).as(s"${c}_n_distinct"))))
      val stackRows = cols.map(c =>
        s"'$c', n, ${c}_n_nonnull, ${c}_min_v, ${c}_max_v, ${c}_sum_v, ${c}_n_distinct")
      joined.selectExpr(s"stack(${cols.size}, ${stackRows.mkString(", ")}) " +
        "AS (col, n, n_nonnull, min_v, max_v, sum_v, n_distinct)")
        .orderBy(col("col"))
    }

    // ---- q30 dissection --------------------------------------------------
    time("q30_full_current")(SparkEntry.queries("q30_approx_distinct")(spark, dir))
    time("q30_exact_partkey")(
      li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")))
    time("q30_approx_only")(
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao")))

    // ---- q128 dissection ---------------------------------------------------
    time("q128x_full")(SparkEntry.queries("q128_tfidf_cosine")(spark, dir))
    time("q128x_weights_n2") {
      val w = operators.CorpusOps.tfidfWeightIndex(spark, dir)
      w.groupBy(col("doc_id"))
        .agg(sum((col("w").cast(DecimalType(38, 0)) * col("w").cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0))).as("n2"))
    }
    time("q128x_cand_only") {
      val post = operators.Dedup.corpusPostings(spark, dir)
      post.filter(size(col("ds")).between(2, 64))
        .select(explode(operators.Dedup.pairCombos(col("ds"))).as("p"))
        .groupBy(col("p.a").as("a_doc"), col("p.b").as("b_doc"))
        .agg(count(lit(1)).as("n_blk"))
        .filter(col("n_blk") >= 2)
        .select(col("a_doc"), col("b_doc"))
    }
    time("q128x_numerator") {
      val w = operators.CorpusOps.tfidfWeightIndex(spark, dir)
      val post = operators.Dedup.corpusPostings(spark, dir)
      val cand = post.filter(size(col("ds")).between(2, 64))
        .select(explode(operators.Dedup.pairCombos(col("ds"))).as("p"))
        .groupBy(col("p.a").as("a_doc"), col("p.b").as("b_doc"))
        .agg(count(lit(1)).as("n_blk"))
        .filter(col("n_blk") >= 2)
        .select(col("a_doc"), col("b_doc"))
      val wa = w.select(col("doc_id").as("a_doc"), col("term"), col("w").as("wa"))
      val wb = w.select(col("doc_id").as("b_doc"), col("term"), col("w").as("wb"))
      cand.join(wa, "a_doc").join(wb, Seq("b_doc", "term"))
        .groupBy(col("a_doc"), col("b_doc"))
        .agg(count(lit(1)).as("n_shared"),
          sum((col("wa").cast(DecimalType(38, 0)) * col("wb").cast(DecimalType(38, 0)))
            .cast(DecimalType(38, 0))).as("num"))
    }

    if (which.exists("q128sizes".startsWith)) {
      val w = operators.CorpusOps.tfidfWeightIndex(spark, dir)
      val post = operators.Dedup.corpusPostings(spark, dir)
      val cand = post.filter(size(col("ds")).between(2, 64))
        .select(explode(operators.Dedup.pairCombos(col("ds"))).as("p"))
        .groupBy(col("p.a").as("a_doc"), col("p.b").as("b_doc"))
        .agg(count(lit(1)).as("n_blk"))
        .filter(col("n_blk") >= 2)
        .select(col("a_doc"), col("b_doc"))
      println("SIZES w rows = " + w.count())
      println("SIZES cand pairs = " + cand.count())
      println("SIZES cand x wa rows = " +
        cand.join(w.select(col("doc_id").as("a_doc")), "a_doc").count())
    }

    // ---- q153 ------------------------------------------------------------
    time("q153_full")(SparkEntry.queries("q153_substring_dedup")(spark, dir))
    val docs = Tables.load(spark, dir, "documents")
    time("q153_anchors_only")(operators.Fuzzy.anchorRows(docs))

    // ---- q70 -------------------------------------------------------------
    time("q70_full")(SparkEntry.queries("q70_sketch_union")(spark, dir))

    // ---- others (isolated full runs for before/after deltas) -------------
    Seq("q36_ngram_jaccard", "q79_containment_neardup", "q36a_jaccard_capped", "q38_simhash",
      "q121_fuzzy_blocking", "q128_tfidf_cosine", "q145_dup_centrality",
      "q146_lm_score", "q160_maxsim_topk", "q163_prf_expansion",
      "q165_lsh_band_sweep", "q105_source_overlap", "q74_incremental_neardup",
      "q58_repetition", "q141_media_dedup_profile", "q156_crossmodal_reverse",
      "q155_crossmodal_ivfpq")
      .foreach(n => time(n)(SparkEntry.queries(n)(spark, dir)))

    spark.stop()
  }
}
