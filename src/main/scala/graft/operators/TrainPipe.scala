package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data-pipeline operators beyond the dedup/similarity families:
  * deterministic dataset splitting, corpus vocabulary, intra-document
  * repetition (a Gopher-style quality signal), and PII scrubbing. All are
  * per-row projections or hash-aggregations — scan-parallel at any corpus
  * size — and every one is oracle-paired (md5-derived hashing and regex
  * primitives with exact DuckDB equivalents).
  */
object TrainPipe {

  private val hex60SqlExpr = "CAST('0x' || substr(md5(%s), 1, 15) AS BIGINT)"

  /** Email-ish and long-digit-run patterns, RE2- and Java-compatible. */
  private[operators] val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[operators] val DigitRunPat = "[0-9]{7,}"

  /** q65 token budget per training shard — sized so the fixtures produce a
    * multi-shard layout (sf0.01 ≈ 9 shards, sf0.1 ≈ 90).
    */
  private val PackBudget = 2048

  /** q147 cascade thresholds. Chosen so every DISCRIMINATING rule kills a
    * visible share of the fixture (short ≈ 9%, repetitious ≈ 34%,
    * stopword-poor ≈ 35%, quality floor ≈ 16% at sf0.01) while the
    * punctuation rule honestly reports 0 on the punctuation-free synthetic
    * text — a funnel must show its no-op rules too.
    */
  private val FunnelMinTokens = 20L
  private val FunnelQualityFloor = 550000L

  /** q66 keep-fractions in micro-units per lang stratum (absent → keep
    * all): the fixture's dominant `en` stratum downsampled hardest.
    */
  private val StratFractionsMicro: Map[String, Long] =
    Map("en" -> 250000L, "zh" -> 500000L, "es" -> 500000L)

  /** q66's salted per-doc uniform draw in micro-units — a pure column
    * expression, so the same sampler runs unchanged over a stream
    * (StreamingSpec pins batch/stream agreement).
    */
  private[graft] def stratUMicro(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hex60(concat(docId.cast(StringType), lit("|strat"))) % 1000000

  /** Stratified-sample membership for a (doc key, stratum) pair against
    * per-stratum keep-fractions (micro-units; absent stratum → keep).
    */
  private[graft] def stratifiedKeep(docId: org.apache.spark.sql.Column,
      stratum: org.apache.spark.sql.Column,
      fractionsMicro: Map[String, Long]): org.apache.spark.sql.Column =
    stratUMicro(docId) <
      coalesce(try_element_at(typedLit(fractionsMicro), stratum), lit(1000000L))

  /** q67 reference-vocabulary size and max OOV ratio. k=16 against the
    * fixture's 31-token vocabulary so the coverage signal is
    * non-degenerate; production k is 10⁴–10⁵ — still a broadcast-sized
    * dimension, which is the point of the join formulation.
    */
  private val VocabK = 16
  private val MaxOovMicro = 500000L

  /** q71 per-lang mixture weights in micro-units (epochs): a doc is
    * emitted floor(w) times plus one more when its salted hash draw falls
    * under frac(w) — so fractional epochs (and pure downsampling, w < 1)
    * come out exactly right in expectation while staying a deterministic
    * pure function of the doc key.
    */
  private val MixWeightsMicro: Map[String, Long] = Map(
    "en" -> 500000L, "zh" -> 2500000L, "de" -> 2000000L,
    "fr" -> 1500000L, "es" -> 1000000L)

  val specs: Seq[QuerySpec] = Seq(

    // ----- deterministic train/val/test split -----------------------------
    // Membership is a pure function of the stable doc key (salted 60-bit
    // md5 bucket mod 100 → 80/10/10), so the split is reproducible across
    // runs, engines, and repartitioning — the property a training pipeline
    // needs for resumable preprocessing. One hash-aggregation, no shuffle
    // of document bodies.
    QuerySpec("q56_dataset_split")(
      s"""SELECT split, count(*) AS n_docs, CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
        |FROM (SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |                  ELSE 'test' END AS split, text
        |      FROM (SELECT text,
        |              ${hex60SqlExpr.format("CAST(doc_id AS VARCHAR) || '|split'")} % 100 AS b
        |            FROM documents))
        |GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      val b = hex60(concat(col("doc_id").cast(StringType), lit("|split"))) % 100
      Tables.load(s, dir, "documents")
        .withColumn("split",
          when(b < 80, "train").when(b < 90, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
             sum(octet_length(col("text"))).as("n_bytes"))
        .orderBy(col("split"))
    },

    // ----- corpus vocabulary: top-k tokens by document frequency ----------
    // explode(distinct tokens) → hash-agg df → TakeOrderedAndProject:
    // map-side combine bounds the shuffle by vocabulary size, and top-k
    // never global-sorts. The (df DESC, token ASC) order is total.
    QuerySpec("q57_vocab_topk")(
      """SELECT t AS token, count(*) AS df FROM (
        |  SELECT DISTINCT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+')) AS t
        |  FROM documents)
        |GROUP BY t ORDER BY df DESC, token ASC LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token").asc)
        .limit(20)
    },

    // ----- per-language heavy hitters (grouped topK analog) ---------------
    // ClickHouse topK per GROUP BY key: the k most document-frequent
    // tokens within each language. q57's global top-k is a
    // TakeOrderedAndProject; the grouped variant can't be (k rows PER
    // key), and the naive per-lang window funnels the whole vocabulary of
    // a dominant language through one task — so it runs through the same
    // salted two-phase TopK.perKeyTopK as q16/q75: per-(lang, salt) local
    // top-k prunes to ≤ salts·k rows per language before the exact global
    // rank. (df DESC, token ASC) is a total order, so rank = dense
    // position and the result is deterministic.
    QuerySpec("q85_lang_heavy_hitters")(
      """WITH d AS (SELECT DISTINCT doc_id, lang,
        |    unnest(regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+')) AS t
        |  FROM documents),
        |cnt AS (SELECT lang, t AS token, count(*) AS df FROM d GROUP BY lang, t),
        |rk AS (SELECT lang, token, df,
        |         rank() OVER (PARTITION BY lang ORDER BY df DESC, token ASC) AS rk
        |       FROM cnt)
        |SELECT lang, token, df, rk FROM rk WHERE rk <= 5
        |ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      val cnt = Tables.load(s, dir, "documents")
        .select(col("lang"), explode(array_distinct(tokens(col("text")))).as("token"))
        .groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("df"))
      TopK.perKeyTopK(cnt,
          keys = Seq(col("lang")),
          order = Seq(col("df").desc, col("token").asc),
          k = 5, saltFrom = col("token"))
        .select(col("lang"), col("token"), col("df"), col("rk"))
        .orderBy(col("lang"), col("rk"))
    },

    // ----- intra-document repetition (Gopher-style quality signal) --------
    // duplicate-3-gram fraction per doc, entirely in-row (no shuffle):
    // 1 − distinct/total shingles, in exact micro-units.
    QuerySpec("q58_repetition")(
      """SELECT doc_id, n_sh, n_distinct_sh,
        |  CAST(floor((1.0 - CAST(n_distinct_sh AS DOUBLE) / CAST(n_sh AS DOUBLE)) * 1000000) AS BIGINT) AS rep_micro
        |FROM (
        |  SELECT doc_id,
        |    greatest(len(w) - 2, 0) AS n_sh,
        |    len(list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
        |                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS n_distinct_sh
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\s+') AS w
        |        FROM documents))
        |WHERE n_sh > 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = tokens(col("text"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          greatest(size(w) - 2, lit(0)).cast(LongType).as("n_sh"),
          size(array_distinct(shingles(w))).cast(LongType).as("n_distinct_sh"))
        .filter(col("n_sh") > 0)
        .withColumn("rep_micro",
          floor((lit(1.0) - col("n_distinct_sh").cast(DoubleType) /
            col("n_sh").cast(DoubleType)) * 1000000).cast(LongType))
        .orderBy(col("doc_id"))
    },

    // ----- sequence packing: concatenate-and-chunk token sharding ---------
    // The step that turns a cleaned corpus into fixed-token-budget training
    // shards: documents are laid out in doc_id order as one token stream
    // and a document's shard is where its FIRST token lands
    // (shard = floor((cum − tok) / budget)). The running token total comes
    // from [[Ordinals.globalRunningSumNative]] — two-phase, content-keyed
    // buckets, so there is NO single-partition window at any corpus size;
    // the oracle's `sum() OVER (ORDER BY doc_id)` is the semantic spec,
    // not the plan. `n_spanning` counts documents whose token span crosses
    // a shard boundary (floor((cum−1)/budget) lands in a later shard) —
    // the fragmentation a packing-aware loader needs to know.
    QuerySpec("q65_pack_sequences")(
      s"""SELECT shard, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |  CAST(sum(CASE WHEN shard_end > shard THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
        |FROM (
        |  SELECT doc_id, tok, cum,
        |    CAST(floor((cum - tok) / $PackBudget.0) AS BIGINT) AS shard,
        |    CAST(floor((cum - 1) / $PackBudget.0) AS BIGINT) AS shard_end
        |  FROM (
        |    SELECT doc_id, tok,
        |      sum(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM (SELECT doc_id,
        |            CAST(len(regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+')) AS BIGINT) AS tok
        |          FROM documents)))
        |GROUP BY shard ORDER BY shard""".stripMargin) { (s, dir) =>
      // localCheckpoint (the q69 pattern): globalRunningSumNative drives
      // four jobs over its input (count, boundary sample, bucket totals,
      // final plan) — materializing the narrow (doc_id, tok) frame once
      // keeps the regex tokenization from running 4×.
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("tok"))
        .transform(graft.Materialize.ephemeral)
      Ordinals.globalRunningSumNative(toks, "cum", "doc_id", col("tok"))
        .withColumn("shard",
          floor((col("cum") - col("tok")).cast(DoubleType) / PackBudget).cast(LongType))
        .withColumn("shard_end",
          floor((col("cum") - 1).cast(DoubleType) / PackBudget).cast(LongType))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
          sum(when(col("shard_end") > col("shard"), 1L).otherwise(0L)).as("n_spanning"))
        .orderBy(col("shard"))
    },

    // ----- stratified sampling: the data-mixture primitive ----------------
    // Deterministic per-stratum downsampling (here: by lang, the dominant
    // stratum kept at 25%) via a salted 60-bit hash of the doc key against
    // a per-stratum threshold — membership is a pure row-local function
    // (no shuffle, no join, reproducible across runs/engines/partitioning),
    // which is what lets a 100 TB mixture be re-materialized incrementally.
    // The sampled u_micro rides the output so the oracle pins the hash
    // itself, not just the surviving set.
    QuerySpec("q66_stratified_sample")(
      s"""SELECT doc_id, lang, source, u_micro FROM (
        |  SELECT doc_id, lang, source,
        |    ${hex60SqlExpr.format("CAST(doc_id AS VARCHAR) || '|strat'")} % 1000000 AS u_micro
        |  FROM documents)
        |WHERE u_micro < CASE lang WHEN 'en' THEN 250000 WHEN 'zh' THEN 500000
        |                          WHEN 'es' THEN 500000 ELSE 1000000 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("u_micro", stratUMicro(col("doc_id")))
        .filter(stratifiedKeep(col("doc_id"), col("lang"), StratFractionsMicro))
        .select(col("doc_id"), col("lang"), col("source"), col("u_micro"))
        .orderBy(col("doc_id"))
    },

    // ----- vocabulary-coverage (OOV) filter -------------------------------
    // Drop documents whose token stream falls too far outside a reference
    // vocabulary (the top-k by document frequency — q57's vocabulary,
    // consumed as a filter): classic non-linguistic-noise screening. The
    // vocabulary is EXPLICITLY BOUNDED (LIMIT k with a total (df, token)
    // order), so broadcasting it is legitimate — the in-vocab count is a
    // broadcast join + per-doc count, the total comes free from the same
    // row, and the OOV ratio is exact micro-units. Scale: one explode
    // shuffle keyed by doc_id for the count-back; everything else rides
    // the scan.
    QuerySpec("q67_oov_filter")(
      s"""WITH tok AS (SELECT doc_id,
        |         unnest(regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+')) AS t
        |       FROM documents),
        |vocab AS (SELECT t FROM (
        |    SELECT t, count(*) AS df FROM (SELECT DISTINCT doc_id, t FROM tok)
        |    GROUP BY t ORDER BY df DESC, t ASC LIMIT $VocabK)),
        |inv AS (SELECT doc_id, count(*) AS n_inv FROM tok JOIN vocab USING (t) GROUP BY doc_id),
        |tot AS (SELECT doc_id,
        |          CAST(len(regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+')) AS BIGINT) AS n_tokens
        |        FROM documents)
        |SELECT doc_id, n_tokens, n_inv, oov_micro FROM (
        |  SELECT tot.doc_id, tot.n_tokens, coalesce(inv.n_inv, 0) AS n_inv,
        |    CAST(floor((1.0 - CAST(coalesce(inv.n_inv, 0) AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS oov_micro
        |  FROM tot LEFT JOIN inv ON tot.doc_id = inv.doc_id)
        |WHERE oov_micro <= $MaxOovMicro
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      val vocab = docs
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("t").asc).limit(VocabK)
        .select(col("t"))
      val inv = tok.join(broadcast(vocab), "t")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_inv"))
      docs.select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("n_tokens"))
        .join(inv, Seq("doc_id"), "left")
        .withColumn("n_inv", coalesce(col("n_inv"), lit(0L)))
        .withColumn("oov_micro",
          floor((lit(1.0) - col("n_inv").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)) * 1000000).cast(LongType))
        .filter(col("oov_micro") <= MaxOovMicro)
        .orderBy(col("doc_id"))
    },

    // ----- mixture upsampling: fractional per-stratum epochs --------------
    // q66's complement — the data-mixture WEIGHTING op ("books ×2.5"): a
    // doc in stratum with weight w is emitted floor(w) times plus one
    // Bernoulli(frac(w)) extra copy decided by the salted doc-key hash —
    // deterministic, row-local until the explode, and exact in
    // expectation for fractional epochs. The output aggregates the
    // emission (post-explode), so the oracle pins both the copy-count
    // function and the actual row multiplication. Scale: explode factor
    // = the mixture weight (bounded by design); no shuffle before the
    // final stats aggregation.
    QuerySpec("q71_mixture_upsample")(
      s"""SELECT lang, count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_rows_emitted, max(copy_id) AS max_copies
        |FROM (
        |  SELECT lang, doc_id, unnest(generate_series(1, n_copies)) AS copy_id
        |  FROM (
        |    SELECT lang, doc_id,
        |      CAST(w_micro // 1000000 AS BIGINT)
        |        + CASE WHEN ${hex60SqlExpr.format("CAST(doc_id AS VARCHAR) || '|mix'")} % 1000000
        |                    < w_micro % 1000000 THEN 1 ELSE 0 END AS n_copies
        |    FROM (SELECT doc_id, lang,
        |            CASE lang WHEN 'en' THEN 500000 WHEN 'zh' THEN 2500000
        |                      WHEN 'de' THEN 2000000 WHEN 'fr' THEN 1500000
        |                      ELSE 1000000 END AS w_micro
        |          FROM documents))
        |  WHERE n_copies >= 1)
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val w = coalesce(
        try_element_at(typedLit(MixWeightsMicro), col("lang")), lit(1000000L))
      val u = hex60(concat(col("doc_id").cast(StringType), lit("|mix"))) % 1000000
      Tables.load(s, dir, "documents")
        .withColumn("n_copies",
          (w / 1000000L).cast(LongType) + when(u < w % 1000000L, 1L).otherwise(0L))
        .filter(col("n_copies") >= 1)
        .select(col("lang"), col("doc_id"),
          explode(sequence(lit(1L), col("n_copies"))).as("copy_id"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_rows_emitted"), max(col("copy_id")).as("max_copies"))
        .orderBy(col("lang"))
    },

    // ----- cross-split leakage check --------------------------------------
    // The QA gate a training pipeline runs AFTER splitting: content that
    // hash-splits into train while a bag-of-words-identical copy lands in
    // val/test leaks evaluation data into training. One fingerprint
    // hash-groupBy (q35's fp_bag) carrying per-split conditional counts;
    // emit only fingerprints present in train AND in an eval split.
    // Scale: shuffle = one row per doc on a 128-bit key; output is the
    // (hopefully tiny) leak list.
    QuerySpec("q72_split_leakage")(
      s"""SELECT fp_bag, n_train, n_val, n_test, first_doc FROM (
        |  SELECT fp_bag,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        |    min(doc_id) AS first_doc
        |  FROM (
        |    SELECT doc_id,
        |      md5(array_to_string(list_sort(list_distinct(
        |        regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+'))), ' ')) AS fp_bag,
        |      CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |    FROM (SELECT doc_id, text,
        |            ${hex60SqlExpr.format("CAST(doc_id AS VARCHAR) || '|split'")} % 100 AS b
        |          FROM documents))
        |  GROUP BY fp_bag)
        |WHERE n_train > 0 AND (n_val > 0 OR n_test > 0)
        |ORDER BY first_doc""".stripMargin) { (s, dir) =>
      val b = hex60(concat(col("doc_id").cast(StringType), lit("|split"))) % 100
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text")))))
            .cast(BinaryType)).as("fp_bag"),
          when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
        .groupBy(col("fp_bag"))
        .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_train") > 0 && (col("n_val") > 0 || col("n_test") > 0))
        .orderBy(col("first_doc"))
    },

    // ----- PII scrub: detect + mask emails and long digit runs ------------
    // Pure projection; counts verify the detector, the masked length
    // verifies the rewrite (both engines replace ALL occurrences — DuckDB
    // needs the 'g' flag).
    QuerySpec("q59_pii_scrub")(
      s"""SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '$EmailPat')) AS n_emails,
        |  len(regexp_extract_all(text, '$DigitRunPat')) AS n_digit_runs,
        |  strlen(regexp_replace(regexp_replace(lower(text), '$EmailPat', '<EMAIL>', 'g'),
        |                        '$DigitRunPat', '<NUM>', 'g')) AS scrubbed_bytes
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val lowered = lower(col("text"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(lowered, lit(EmailPat), lit(0))).cast(LongType)
            .as("n_emails"),
          size(regexp_extract_all(col("text"), lit(DigitRunPat), lit(0))).cast(LongType)
            .as("n_digit_runs"),
          octet_length(
            regexp_replace(regexp_replace(lowered, EmailPat, "<EMAIL>"),
              DigitRunPat, "<NUM>")).cast(LongType).as("scrubbed_bytes"))
        .orderBy(col("doc_id"))
    },

    // ----- token-weighted quality quantile (quantileExactWeighted analog) -
    // The cutoff a mixture designer actually wants: the quality value
    // below which 10% of the corpus's TOKEN MASS (not document count)
    // falls — ClickHouse quantileExactWeighted(0.1)(quality, tokens),
    // exact. Docs collapse to one row per distinct quality_micro (≤ 1e6+1
    // rows by construction — the micro-unit domain bounds the frame at any
    // corpus size), the token/doc running sums ride the two-phase
    // native running sum (never a single-partition window), and the
    // threshold test is INTEGER (cum·10 ≥ total) so no float division
    // enters the compared columns. One doc-keyed join + one hash-agg
    // touch the corpus; everything after is domain-bounded.
    QuerySpec("q91_weighted_quantile")(
      s"""WITH ${TextAnalysis.qualityCteSql},
        |tk AS (SELECT doc_id,
        |         CAST(len(regexp_split_to_array(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+')) AS BIGINT) AS tok
        |       FROM documents),
        |g AS (SELECT quality_micro, CAST(sum(tok) AS BIGINT) AS w, count(*) AS nd
        |      FROM qscore q JOIN tk USING (doc_id) GROUP BY quality_micro),
        |c AS (SELECT quality_micro,
        |        CAST(sum(w) OVER o AS BIGINT) AS cum_w,
        |        CAST(sum(nd) OVER o AS BIGINT) AS cum_d
        |      FROM g WINDOW o AS (ORDER BY quality_micro
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT max(cum_w) AS tot_w, max(cum_d) AS tot_d FROM c)
        |SELECT min(c.quality_micro) AS cutoff_quality_micro,
        |  min_by(c.cum_w, c.quality_micro) AS dropped_tokens,
        |  min_by(c.cum_d, c.quality_micro) AS dropped_docs,
        |  min(t.tot_w) AS total_tokens, min(t.tot_d) AS total_docs
        |FROM c, t WHERE c.cum_w * 10 >= t.tot_w""".stripMargin) { (s, dir) =>
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).cast(LongType).as("tok"))
      val q = TextAnalysis.qualityIndex(s, dir)
        .select(col("doc_id"), col("quality_micro"))
      val g = toks.join(q, Seq("doc_id"))
        .groupBy(col("quality_micro"))
        .agg(sum(col("tok")).as("w"), count(lit(1)).as("nd"))
        .transform(graft.Materialize.ephemeral) // several jobs read this tiny frame
      val cum = Ordinals.globalRunningSumNative(
        Ordinals.globalRunningSumNative(g, "cum_w", "quality_micro", col("w")),
        "cum_d", "quality_micro", col("nd"))
      val tot = cum.agg(max(col("cum_w")).as("tot_w"), max(col("cum_d")).as("tot_d"))
      cum.crossJoin(broadcast(tot)) // 1-row totals — the q35a scalar pattern
        .filter(col("cum_w") * 10 >= col("tot_w"))
        .agg(min(col("quality_micro")).as("cutoff_quality_micro"),
          min_by(col("cum_w"), col("quality_micro")).as("dropped_tokens"),
          min_by(col("cum_d"), col("quality_micro")).as("dropped_docs"),
          min(col("tot_w")).as("total_tokens"),
          min(col("tot_d")).as("total_docs"))
    },

    // ----- filter-cascade funnel report (rule diagnostics) ----------------
    // The report a pipeline runs BEFORE committing to a filter cascade
    // (the Gopher/C4 rule-tuning loop): for each rule, in cascade order —
    // how many docs fail it at all (n_fail_total), how many are killed BY
    // it (first rule to fail: n_fail_marginal — the rule's actual
    // contribution), and how many docs survive the cascade up to and
    // including it (n_survive_after). Rules: too-short, repetitious (low
    // distinct-token ratio), stopword-poor, punctuation-heavy, and the
    // q33 quality floor. Every flag is an INTEGER comparison (counts
    // cross-multiplied against thresholds — no ratio division at all)
    // except the quality floor, which reuses the proven-exact
    // quality_micro. Scale: one scan projection computing all flags +
    // first-fail, a 5-way posexplode (constant fan-out), and ONE 5-group
    // hash-agg — the whole report is scan-shaped with a 5-row result; the
    // quality leg rides the shared quality index.
    QuerySpec("q147_filter_funnel")(
      s"""WITH ${TextAnalysis.qualityCteSql},
        |feat AS (SELECT doc_id, len(w) AS nt, len(list_distinct(w)) AS nd,
        |    len(list_filter(w, x -> x IN ${TextAnalysis.sqlStrList(TextAnalysis.stopwords)})) AS sc,
        |    length(t) - length(regexp_replace(t, '[^a-z0-9 ]', '', 'g')) AS pc,
        |    length(t) AS nc
        |  FROM (SELECT doc_id, t, regexp_split_to_array(t, '\\s+') AS w
        |        FROM (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
        |              FROM documents))),
        |fl AS (SELECT f.doc_id,
        |    CASE WHEN f.nt < $FunnelMinTokens THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN f.nd * 10 < f.nt * 4 THEN 1 ELSE 0 END AS f2,
        |    CASE WHEN f.sc * 20 < f.nt THEN 1 ELSE 0 END AS f3,
        |    CASE WHEN f.pc * 20 > f.nc THEN 1 ELSE 0 END AS f4,
        |    CASE WHEN q.quality_micro < $FunnelQualityFloor THEN 1 ELSE 0 END AS f5
        |  FROM feat f JOIN qscore q USING (doc_id)),
        |ff AS (SELECT doc_id, f1, f2, f3, f4, f5,
        |    CASE WHEN f1 = 1 THEN 1 WHEN f2 = 1 THEN 2 WHEN f3 = 1 THEN 3
        |         WHEN f4 = 1 THEN 4 WHEN f5 = 1 THEN 5 ELSE 0 END AS ffail
        |  FROM fl),
        |ks AS (SELECT unnest(generate_series(1, 5)) AS k)
        |SELECT ks.k,
        |  CASE ks.k WHEN 1 THEN 'too_short' WHEN 2 THEN 'repetitious'
        |       WHEN 3 THEN 'stopword_poor' WHEN 4 THEN 'punct_heavy'
        |       ELSE 'low_quality' END AS rule,
        |  CAST(sum(CASE ks.k WHEN 1 THEN f1 WHEN 2 THEN f2 WHEN 3 THEN f3
        |           WHEN 4 THEN f4 ELSE f5 END) AS BIGINT) AS n_fail_total,
        |  CAST(sum(CASE WHEN ffail = ks.k THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_marginal,
        |  CAST(sum(CASE WHEN ffail = 0 OR ffail > ks.k THEN 1 ELSE 0 END) AS BIGINT) AS n_survive_after
        |FROM ff, ks GROUP BY ks.k ORDER BY ks.k""".stripMargin) { (s, dir) =>
      val feat = Tables.load(s, dir, "documents")
        .withColumn("t", normText(col("text")))
        .withColumn("w", split(col("t"), " "))
        .select(col("doc_id"),
          size(col("w")).cast(LongType).as("nt"),
          size(array_distinct(col("w"))).cast(LongType).as("nd"),
          markerCount(col("w"), TextAnalysis.stopwords).cast(LongType).as("sc"),
          (length(col("t")) - length(regexp_replace(col("t"), "[^a-z0-9 ]", "")))
            .cast(LongType).as("pc"),
          length(col("t")).cast(LongType).as("nc"))
      val fl = feat
        .join(TextAnalysis.qualityIndex(s, dir).select(col("doc_id"), col("quality_micro")),
          "doc_id")
        .select(col("doc_id"),
          (col("nt") < FunnelMinTokens).cast(IntegerType).as("f1"),
          (col("nd") * 10 < col("nt") * 4).cast(IntegerType).as("f2"),
          (col("sc") * 20 < col("nt")).cast(IntegerType).as("f3"),
          (col("pc") * 20 > col("nc")).cast(IntegerType).as("f4"),
          (col("quality_micro") < FunnelQualityFloor).cast(IntegerType).as("f5"))
        .withColumn("ffail", expr(
          "CASE WHEN f1 = 1 THEN 1 WHEN f2 = 1 THEN 2 WHEN f3 = 1 THEN 3 " +
            "WHEN f4 = 1 THEN 4 WHEN f5 = 1 THEN 5 ELSE 0 END"))
      fl.select(col("ffail"), posexplode(array(col("f1"), col("f2"), col("f3"), col("f4"), col("f5"))))
        .select((col("pos") + 1).cast(LongType).as("k"), col("col").as("fail"), col("ffail"))
        .groupBy(col("k"))
        .agg(sum(col("fail")).cast(LongType).as("n_fail_total"),
          sum(when(col("ffail") === col("k"), 1L).otherwise(0L)).as("n_fail_marginal"),
          sum(when(col("ffail") === 0 || col("ffail") > col("k"), 1L).otherwise(0L))
            .as("n_survive_after"))
        .withColumn("rule", expr(
          "CASE k WHEN 1 THEN 'too_short' WHEN 2 THEN 'repetitious' " +
            "WHEN 3 THEN 'stopword_poor' WHEN 4 THEN 'punct_heavy' " +
            "ELSE 'low_quality' END"))
        .select(col("k"), col("rule"), col("n_fail_total"),
          col("n_fail_marginal"), col("n_survive_after"))
        .orderBy(col("k"))
    }
  )
}
