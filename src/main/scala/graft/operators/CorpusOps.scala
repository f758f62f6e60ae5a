package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators added in round 8 — the retrieval/indexing
  * face of the training-data pipeline:
  *
  *  - q96: overlapping token-window chunking (the RAG / long-context
  *    preprocessing step: every document becomes fixed-budget chunks with
  *    stride overlap and stable per-chunk fingerprints). Pure per-row
  *    `sequence → explode → slice` higher-order functions — scan-parallel,
  *    no shuffle at all before the output sort.
  *  - q97: per-document distinctive terms — top-k by (tf DESC, df ASC,
  *    term ASC). The integer-exact cousin of tf-idf ranking (higher tf
  *    wins; document frequency breaks ties toward RARER terms — the idf
  *    direction — and the term itself makes the order total, so no
  *    cross-engine float log). Shares the corpus df profile with the dedup
  *    family's document-frequency machinery.
  *  - q98: temperature-based mixture reweighting (α = 0.5) — the
  *    data-mixing step that flattens source imbalance when composing a
  *    training mix (per-source weight ∝ share^α, renormalized). Everything
  *    after the one per-source aggregate is dimension-sized; the share →
  *    √share → renormalize chain is kept cross-engine-exact by doing each
  *    division as a single IEEE double op and the weight SUM in
  *    DECIMAL(28,10).
  *
  * Scale: q96 is embarrassingly parallel (chunk count rides the token
  * count, not the corpus); q97's heavy objects are the (doc, term) tf
  * aggregate and a doc-keyed window — doc_id is corpus-cardinality, so the
  * window parallelizes by key and needs no salting (contrast
  * TopK.perKeyTopK, which exists for LOW-cardinality keys); q98 collapses
  * the corpus in one hash-agg to a source-cardinality frame.
  */
object CorpusOps {

  /** q96 chunk budget / stride (tokens). 32/24 = 8-token overlap; the
    * fixture's ~56-token docs produce 1–4 chunks each. Production values
    * (e.g. 512/384) change only the constants — the plan shape is
    * identical.
    */
  private val ChunkSize = 32
  private val ChunkStride = 24

  /** q97 distinctive terms kept per document. */
  private val TermK = 3

  private val hex60Sql = "CAST('0x' || substr(md5(%s), 1, 15) AS BIGINT)"

  val specs: Seq[QuerySpec] = Seq(

    // ----- overlapping token-window chunking (RAG preprocessing) ----------
    // One chunk per stride step: starts p = 1 + k·S for k = 0..⌊(n−1)/S⌋,
    // chunk = tokens[p, p+C). The LAST chunk may be short (no padding, no
    // dropped tail tokens — every token lands in ≥1 chunk). Emits a stable
    // 60-bit fingerprint per chunk (the retrieval index key), not the text:
    // chunk rows stay narrow however large the documents get.
    QuerySpec("q96_chunk_windows")(
      s"""WITH t AS (SELECT doc_id,
        |  string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, len(tok) AS n,
        |        unnest(generate_series(0, (len(tok) - 1) // $ChunkStride)) AS k
        |      FROM t)
        |SELECT doc_id, k AS chunk_id,
        |  1 + k * $ChunkStride AS start_pos,
        |  least($ChunkSize, n - k * $ChunkStride) AS n_tokens,
        |  ${hex60Sql.format(s"array_to_string(list_slice(tok, 1 + k * $ChunkStride, k * $ChunkStride + $ChunkSize), ' ')")} AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      val tok = tokens(col("text"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), tok.as("tok"), size(tok).as("n"))
        .select(col("doc_id"), col("tok"), col("n"),
          explode(sequence(lit(0),
            floor((col("n") - 1) / ChunkStride).cast(IntegerType))).as("k"))
        .select(col("doc_id"), col("k").as("chunk_id"),
          (col("k") * ChunkStride + 1).as("start_pos"),
          least(lit(ChunkSize), col("n") - col("k") * ChunkStride).as("n_tokens"),
          hex60(array_join(
            slice(col("tok"), col("k") * ChunkStride + 1, lit(ChunkSize)), " "))
            .as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // ----- per-document distinctive terms (integer-exact tf-idf rank) -----
    // tf from one (doc, term) hash-agg; df from the (already-distinct)
    // pairs in a term-keyed second agg. The df side is vocabulary-sized —
    // orders of magnitude under the corpus — and joins back on the term
    // key; AQE picks broadcast when it fits. Ranking window partitions by
    // doc_id (corpus-cardinality key ⇒ parallel by construction).
    QuerySpec("q97_distinctive_terms")(
      s"""WITH tf AS (
        |  SELECT doc_id, t AS term, count(*) AS tf
        |  FROM (SELECT doc_id,
        |          unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS t
        |        FROM documents)
        |  GROUP BY doc_id, t),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |        row_number() OVER (PARTITION BY tf.doc_id
        |          ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
        |      FROM tf JOIN df USING (term))
        |SELECT doc_id, rk, term, tf, df FROM r WHERE rk <= $TermK
        |ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
      // localCheckpoint: tf feeds both the join's probe side and the df
      // aggregate — materialize it once so the corpus scan and the
      // (doc, term) shuffle run once, not per branch.
      val tf = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.join(df, "term")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TermK)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // ----- temperature-based mixture reweighting (α = 0.5) ----------------
    // Per-source token-mass shares flattened by √: w_s = √(mass_s/total),
    // α-share = w_s / Σw. Cross-engine exactness: mass sums are BIGINT;
    // each share is ONE double division; √ is IEEE-correctly-rounded in
    // both engines (proven by q25's qroot); the renormalizing SUM runs in
    // DECIMAL(28,10) (order-independent), and the final α-share is again
    // one double division. The Σw scalar is a 1-row broadcast cross join —
    // the same posture as CorpusClean's threshold scalars.
    QuerySpec("q98_mixture_temperature")(
      """WITH m AS (SELECT source, count(*) AS n_docs,
        |             CAST(sum(n_chars) AS BIGINT) AS mass
        |           FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM m),
        |w AS (SELECT m.source, m.n_docs, m.mass,
        |        CAST(m.mass AS DOUBLE) / t.total AS raw_share,
        |        CAST(sqrt(CAST(m.mass AS DOUBLE) / t.total) AS DECIMAL(28,10)) AS wdec
        |      FROM m, t),
        |z AS (SELECT CAST(sum(wdec) AS DECIMAL(28,10)) AS wsum FROM w)
        |SELECT w.source, w.n_docs, w.mass, w.raw_share,
        |  CAST(w.wdec AS DOUBLE) / CAST(z.wsum AS DOUBLE) AS alpha_share
        |FROM w, z ORDER BY w.source""".stripMargin) { (s, dir) =>
      val dv = DecimalType(28, 10)
      // localCheckpoint: the total, the weights, and their sum all read m
      // (source-cardinality, but its lineage holds the corpus scan +
      // shuffle) — materialize once.
      val m = Tables.load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("mass"))
        .localCheckpoint()
      val t = m.agg(sum(col("mass")).cast(LongType).as("total"))
      val w = m.crossJoin(broadcast(t))
        .withColumn("raw_share", col("mass").cast(DoubleType) / col("total"))
        .withColumn("wdec", sqrt(col("mass").cast(DoubleType) / col("total")).cast(dv))
      val z = w.agg(sum(col("wdec")).cast(dv).as("wsum"))
      w.crossJoin(broadcast(z))
        .select(col("source"), col("n_docs"), col("mass"), col("raw_share"),
          (col("wdec").cast(DoubleType) / col("wsum").cast(DoubleType)).as("alpha_share"))
        .orderBy(col("source"))
    }
  )
}
