package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables
import graft.functions.det._

/** Text-analysis operators for a training-data pipeline (SURVEY.md
  * §2.9): tf-idf, lexicon sentiment, language-ID heuristic, quality
  * scoring, token counting, and rolling-hash fingerprinting.
  *
  * All per-document math is integer or single-operation double (then
  * rounded), so both engines agree bit-for-bit; lexicons are inline
  * literal tables (broadcast on the Spark side, VALUES in the oracle).
  */
object TextPipeline {

  /** tf-idf: top-5 distinctive terms per language. Two aggregations +
    * one join — df is a tiny per-term table (vocab-sized), broadcast. */
  private val q25 = QueryDef(
    "q25_tfidf_top_terms",
    "tf-idf: top-5 terms per language by tf * ln((N+1)/(df+1))",
    Some("""
      WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT lang, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents)
      SELECT lang, rn, term, tf, df, tfidf FROM (
        SELECT lang, term, tf, df, tfidf,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) AS BIGINT) AS rn
        FROM (SELECT lang, term, tf, df,
                     ROUND(tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)), 4) AS tfidf
              FROM tf JOIN df USING (term) CROSS JOIN n))
      WHERE rn <= 5
      ORDER BY lang, rn"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
      val df = tok.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(df), Seq("term")).crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 4))
      val w = Window.partitionBy("lang").orderBy(col("tfidf").desc, col("term").asc)
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select("lang", "rn", "term", "tf", "df", "tfidf")
        .orderBy("lang", "rn")
    })

  private val lexicon = Seq(
    ("fast", 2), ("spark", 2), ("merge", 1), ("join", 1), ("query", 1),
    ("stream", 1), ("vector", 1), ("big", 1),
    ("slow", -2), ("dup", -2), ("small", -1), ("the", -1))

  /** Lexicon sentiment: Σ weight(token) per doc; non-lexicon tokens
    * contribute 0 via left join + coalesce. */
  private val q26 = QueryDef(
    "q26_sentiment_lexicon",
    "lexicon sentiment score per document",
    Some(s"""
      WITH lex(word, weight) AS (VALUES ${lexicon.map { case (w, v) => s"('$w', $v)" }.mkString(", ")}),
      tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents)
      SELECT doc_id, lang, COUNT(*) AS n_tokens,
             CAST(SUM(COALESCE(weight, 0)) AS BIGINT) AS score,
             CASE WHEN SUM(COALESCE(weight, 0)) > 0 THEN 'pos'
                  WHEN SUM(COALESCE(weight, 0)) < 0 THEN 'neg'
                  ELSE 'neu' END AS sentiment
      FROM tok LEFT JOIN lex USING (word)
      GROUP BY doc_id, lang
      ORDER BY doc_id"""),
    (s, dir) => {
      val lex = s.createDataFrame(lexicon).toDF("word", "weight")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("word"))
        .join(broadcast(lex), Seq("word"), "left")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("weight"), lit(0))).cast("long").as("score"))
        .withColumn("sentiment",
          when(col("score") > 0, "pos").when(col("score") < 0, "neg").otherwise("neu"))
        .select("doc_id", "lang", "n_tokens", "score", "sentiment")
        .orderBy("doc_id")
    })

  private val markers = Seq(
    ("the", "en"), ("fast", "en"), ("join", "en"), ("query", "en"),
    ("order", "de"), ("group", "de"), ("batch", "de"), ("window", "de"),
    ("data", "es"), ("table", "es"), ("row", "es"), ("value", "es"),
    ("merge", "fr"), ("sort", "fr"), ("column", "fr"), ("line", "fr"),
    ("spark", "zh"), ("stream", "zh"), ("vector", "zh"), ("hash", "zh"))

  /** Language-ID heuristic: marker-token voting (the n-gram-profile
    * classic shrunk to the fixtures' 31-word vocab). argmax hits with
    * lang-asc tie-break; zero hits → 'und'. Accuracy is not the point —
    * deterministic, scalable classification plumbing is. */
  private val q27 = QueryDef(
    "q27_langid_heuristic",
    "marker-token language-ID vote per document vs actual lang",
    Some(s"""
      WITH markers(word, plang) AS (VALUES ${markers.map { case (w, l) => s"('$w', '$l')" }.mkString(", ")}),
      tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      sc AS (SELECT doc_id, plang, COUNT(*) AS hits
             FROM tok JOIN markers USING (word) GROUP BY 1, 2),
      best AS (SELECT doc_id, plang, hits FROM (
                 SELECT doc_id, plang, hits,
                        row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, plang) AS rn
                 FROM sc) WHERE rn = 1)
      SELECT d.doc_id, d.lang, COALESCE(b.plang, 'und') AS pred_lang,
             COALESCE(b.hits, 0) AS hits,
             CASE WHEN d.lang = COALESCE(b.plang, 'und') THEN 1 ELSE 0 END AS is_match
      FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
      ORDER BY d.doc_id"""),
    (s, dir) => {
      val m = s.createDataFrame(markers).toDF("word", "plang")
      val docs = Tables.documents(s, dir)
      val sc = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .join(broadcast(m), Seq("word"))
        .groupBy("doc_id", "plang").agg(count(lit(1)).as("hits"))
      val w = Window.partitionBy("doc_id").orderBy(col("hits").desc, col("plang").asc)
      val best = sc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("plang"), col("hits"))
      docs.select(col("doc_id"), col("lang"))
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("plang"), lit("und")).as("pred_lang"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          when(col("lang") === coalesce(col("plang"), lit("und")), 1).otherwise(0).as("is_match"))
        .orderBy("doc_id")
    })

  /** Quality scoring: length / stopword-ratio features and a composite
    * score — per-row arithmetic only, fully parallel, no shuffle. */
  private val q28 = QueryDef(
    "q28_quality_score",
    "document quality features + composite score",
    Some("""
      SELECT doc_id, lang, n_chars, n_tokens, avg_token_len, stop_ratio,
             ROUND(least(1.0, n_tokens / 50.0) * (1.0 - stop_ratio), 4) AS quality
      FROM (
        SELECT doc_id, lang, n_chars,
               CAST(len(t) AS BIGINT) AS n_tokens,
               ROUND(CAST(n_chars - (len(t) - 1) AS DOUBLE) / len(t), 4) AS avg_token_len,
               ROUND(CAST(len(list_filter(t, w -> list_contains(['the', 'a'], w))) AS DOUBLE) / len(t), 4) AS stop_ratio
        FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS t FROM documents))
      ORDER BY doc_id"""),
    (s, dir) => {
      // token array materialized once per row (see text.shingles)
      val t = col("t")
      val stops = array(lit("the"), lit("a"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          split(col("text"), " ").as("t"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(t).cast("long").as("n_tokens"),
          round((col("n_chars") - (size(t) - 1)).cast("double") / size(t), 4)
            .as("avg_token_len"),
          round(size(filter(t, w => array_contains(stops, w))).cast("double") / size(t), 4)
            .as("stop_ratio"))
        .withColumn("quality",
          round(least(lit(1.0), col("n_tokens") / 50.0) * (lit(1.0) - col("stop_ratio")), 4))
        .orderBy("doc_id")
    })

  /** Token counting per language: whitespace tokens + a BPE-ish subword
    * estimate (⌈len/4⌉ chunks per word) — integer-exact on both sides. */
  private val q29 = QueryDef(
    "q29_token_stats",
    "whitespace + subword token counts aggregated per language",
    Some("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(ws_tokens) AS BIGINT) AS sum_ws_tokens,
             CAST(SUM(subtokens) AS BIGINT) AS sum_subtokens,
             CAST(MAX(ws_tokens) AS BIGINT) AS max_ws_tokens,
             ROUND(CAST(SUM(ws_tokens) AS DOUBLE) / COUNT(*), 4) AS avg_ws_tokens
      FROM (
        SELECT lang, len(t) AS ws_tokens,
               CAST(list_sum(list_transform(t, w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS subtokens
        FROM (SELECT lang, string_split(text, ' ') AS t FROM documents))
      GROUP BY lang
      ORDER BY lang"""),
    (s, dir) => {
      // token array materialized once per row (see text.shingles)
      val t = col("t")
      Tables.documents(s, dir)
        .select(col("lang"), split(col("text"), " ").as("t"))
        .select(col("lang"),
          size(t).cast("long").as("ws_tokens"),
          aggregate(
            transform(t, w => ceil(length(w) / 4.0).cast("long")),
            lit(0L), (acc, x) => acc + x).as("subtokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("sum_ws_tokens"),
          sum(col("subtokens")).as("sum_subtokens"),
          max(col("ws_tokens")).as("max_ws_tokens"),
          round(sum(col("ws_tokens")).cast("double") / count(lit(1)), 4).as("avg_ws_tokens"))
        .orderBy("lang")
    })

  /** Rolling-hash document fingerprint: Σ code(c_i)·31^(i mod 9) mod p —
    * per-row, integer-exact, identical on both engines (the 31^k powers
    * are literal so neither engine touches floating pow). */
  private val q30 = QueryDef(
    "q30_doc_fingerprint",
    "polynomial rolling-hash fingerprint per document",
    Some("""
      SELECT doc_id, n_chars,
             CAST(list_sum(list_transform(generate_series(1, length(text)),
                    i -> (unicode(text[i]) * ([1, 31, 961, 29791, 923521, 28629151, 887503681, 27512614111, 852891037441][((i - 1) % 9) + 1])) % 1000000007))
                  % 1000000007 AS BIGINT) AS fingerprint
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) => {
      val powers = array(Seq(1L, 31L, 961L, 29791L, 923521L, 28629151L,
        887503681L, 27512614111L, 852891037441L).map(lit): _*)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          (aggregate(
            transform(sequence(lit(1), length(col("text"))),
              i => (ascii(col("text").substr(i, lit(1))).cast("long") *
                element_at(powers, pmod(i - 1, lit(9)) + 1)) % 1000000007L),
            lit(0L), (acc, x) => acc + x) % 1000000007L).as("fingerprint"))
        .orderBy("doc_id")
    })

  // ---------------------------------------------------------------------
  // q99 — sparse tf-idf cosine retrieval over an inverted index
  // ---------------------------------------------------------------------

  /** The tf-idf inverted index (doc_id, term, weight) as a materialized
    * view — the retrieval index a production pipeline MAINTAINS next to
    * the corpus rather than rebuilding per query batch. Weights are the
    * rational idf form w = tf·N/df (exact integers into one IEEE divide
    * — deliberately not ln-based: cosine ORDERING is idf-monotone
    * either way, and N/df keeps every intermediate bit-identical across
    * engines). */
  private[graft] def tfidfIndex(s: SparkSession, dir: String): DataFrame =
    graft.sources.MaterializedViews.cached(s, dir, "tfidf_index") {
      val docs = Tables.documents(s, dir)
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      val nDocs = docs.select(count(lit(1)).as("n"))
      val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), Seq("w")).crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("w"),
          ((col("tf") * col("n")).cast("double") / col("df")).as("wt"))
    }

  /** Per-document tf-idf vector norms, maintained alongside
    * [[tfidfIndex]] (squared norms ride the exact-decimal accumulator;
    * sqrt is IEEE-exact on the identical rounded double). */
  private[graft] def tfidfNorms(s: SparkSession, dir: String): DataFrame =
    graft.sources.MaterializedViews.cached(s, dir, "tfidf_norms") {
      tfidfIndex(s, dir).groupBy("doc_id")
        .agg(sqrt(graft.functions.det.dsum(col("wt") * col("wt"))).as("nrm"))
    }

  /** Sparse retrieval: a deterministic 2% hash slice of documents plays
    * the query set, and each query retrieves its top-3 most similar
    * corpus docs by tf-idf cosine — computed through the INVERTED INDEX
    * ([[tfidfIndex]] posting lists joined on term), the sparse sibling
    * of the dense ANN family (q31/q32/q65/q72): only documents sharing
    * a term with the query ever pair, so cost is bounded by
    * posting-list co-occurrence, not |Q|·N. At 100 TB the same plan
    * takes the standard retrieval refinements — df-threshold stopword
    * pruning and champion (top-weight) lists per term — which are
    * no-ops on this 31-word fixture vocabulary and therefore omitted
    * rather than pretended.
    *
    * Join shape, measured at sf0.1 (12.1 s → ~2 s): the QUERY slice
    * broadcasts (a query batch is always small next to the corpus), so
    * the posting probe runs partition-parallel over the index with no
    * shuffle on the 31-value term key (which skew-capped parallelism at
    * |vocab| tasks); the index is repartitioned by doc_id first, so
    * every (query, candidate) pair's terms land in ONE partition and
    * the per-pair dot partials collapse map-side — the shuffle carries
    * ~|pairs| combined rows, not |pairs|·|shared terms| raw products.
    * Dots and norms ride the exact-decimal accumulator rounded at 4 dp;
    * ties break on candidate doc id. */
  private val q99 = QueryDef(
    "q99_tfidf_cosine_retrieval",
    "top-3 tf-idf cosine matches per hash-sliced query doc via inverted index",
    Some(s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM documents),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok GROUP BY 1, 2),
      df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      idx AS (SELECT tf.doc_id, tf.w,
                     CAST(tf.tf * n.n AS DOUBLE) / df.df AS wt
              FROM tf JOIN df USING (w) CROSS JOIN n),
      nrm AS (SELECT doc_id, sqrt(${graft.functions.det.dsumSql("wt * wt")}) AS nrm
              FROM idx GROUP BY 1),
      q AS (SELECT doc_id, w, wt FROM idx
            WHERE ${graft.functions.text.md5Hash60Sql("'ret:' || CAST(doc_id AS VARCHAR)")}
                  % 50 = 0),
      dots AS (SELECT q.doc_id AS query_doc, c.doc_id AS match_doc,
                      ${graft.functions.det.dsumSql("q.wt * c.wt")} AS dot
               FROM q JOIN idx c USING (w)
               WHERE c.doc_id != q.doc_id
               GROUP BY 1, 2),
      cos AS (SELECT query_doc, match_doc,
                     ROUND(dot / (nq.nrm * nc.nrm), 4) AS cosine
              FROM dots JOIN nrm nq ON nq.doc_id = query_doc
                        JOIN nrm nc ON nc.doc_id = match_doc)
      SELECT query_doc, match_doc, cosine,
             CAST(rk AS BIGINT) AS rank
      FROM (SELECT query_doc, match_doc, cosine,
                   row_number() OVER (PARTITION BY query_doc
                                      ORDER BY cosine DESC, match_doc) AS rk
            FROM cos)
      WHERE rk <= 3 ORDER BY query_doc, rank"""),
    (s, dir) => {
      import graft.functions.{det, text}
      val idx = tfidfIndex(s, dir)
      val nrm = tfidfNorms(s, dir)
      val q = idx
        .filter(text.md5Hash60(concat(lit("ret:"), col("doc_id").cast("string")))
          % 50 === 0)
        .select(col("doc_id").as("query_doc"), col("w"), col("wt").as("qwt"))
      // Explicit partition count: repartition(col) alone is an AQE
      // REPARTITION_BY_COL hint, and on this (byte-small, row-heavy)
      // index AQE coalesces it to ONE partition — serializing the 9.7M
      // probe rows, the decimal aggregate, and the window partial sort
      // through a single task (measured: 12 s vs 2 s).
      val nPart = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val dots = broadcast(q)
        .join(idx.repartition(nPart, col("doc_id"))
          .select(col("doc_id").as("match_doc"), col("w"),
            col("wt").as("cwt")), Seq("w"))
        .filter(col("match_doc") =!= col("query_doc"))
        .groupBy("query_doc", "match_doc")
        .agg(det.dsum(col("qwt") * col("cwt")).as("dot"))
      val cos = dots
        .join(nrm.select(col("doc_id").as("query_doc"), col("nrm").as("nq")),
          Seq("query_doc"))
        .join(nrm.select(col("doc_id").as("match_doc"), col("nrm").as("nc")),
          Seq("match_doc"))
        .select(col("query_doc"), col("match_doc"),
          round(col("dot") / (col("nq") * col("nc")), 4).as("cosine"))
      cos.withColumn("rank", row_number().over(
          Window.partitionBy("query_doc")
            .orderBy(col("cosine").desc, col("match_doc"))).cast("long"))
        .filter(col("rank") <= 3)
        .select("query_doc", "match_doc", "cosine", "rank")
        .orderBy("query_doc", "rank")
    })

  // ---------------------------------------------------------------------
  // q104 — per-source vocabulary drift (chi-square vs corpus distribution)
  // ---------------------------------------------------------------------

  /** Domain-shift monitor: how far each source's token distribution sits
    * from the corpus-wide distribution, as the chi-square divergence
    * Σ_w (q_s(w) − p(w))² / p(w) over the corpus vocabulary (q_s(w)=0
    * when the source never emits w). The curation dashboard uses this to
    * spot sources whose language drifted (a crawler gone wrong, a new
    * domain) before they pollute the mix. Chi-square instead of KL: every
    * term is rational arithmetic over exact counts — no libm ln, so
    * cross-engine parity is by construction, not by libm agreement
    * (contrast q86's documented ln risk). Reported in ppm (terms are
    * ~1e-5) with the sum on the exact-decimal accumulator.
    *
    * Scale: token counts are map-side-combined aggregates; the
    * (source × vocab) grid joins the per-source totals against the
    * BROADCAST vocabulary dimension (the corpus side collapses to
    * |vocab| rows + a one-row total, never re-shuffling the corpus).
    * With an open vocabulary at 100 TB, cap the dimension to the top-V
    * corpus terms first (one TakeOrdered) — same plan shape. */
  private val q104 = QueryDef(
    "q104_vocab_drift_by_source",
    "per-source chi-square divergence (ppm) of token distribution vs corpus",
    Some(s"""
      WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                   FROM documents),
      sc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n_sw
             FROM tok GROUP BY 1, 2),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS t_s FROM tok GROUP BY 1),
      cc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM tok GROUP BY 1),
      ct AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM tok),
      term AS (SELECT st.source, st.t_s,
                      COALESCE(sc.n_sw, 0) AS n_sw, cc.n_w, ct.t
               FROM st CROSS JOIN cc CROSS JOIN ct
               LEFT JOIN sc ON sc.source = st.source AND sc.w = cc.w),
      x AS (SELECT source, t_s, n_sw,
                   (CAST(n_sw AS DOUBLE) / t_s - CAST(n_w AS DOUBLE) / t)
                 * (CAST(n_sw AS DOUBLE) / t_s - CAST(n_w AS DOUBLE) / t)
                 / (CAST(n_w AS DOUBLE) / t) * 1e6 AS chi
            FROM term)
      SELECT source, MAX(t_s) AS n_tokens,
             CAST(SUM(CASE WHEN n_sw > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_vocab_used,
             ${dsumSql("chi")} AS chi2_ppm
      FROM x GROUP BY 1 ORDER BY 1"""),
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val sc = tok.groupBy("source", "w").agg(count(lit(1)).as("n_sw"))
      val st = tok.groupBy("source").agg(count(lit(1)).as("t_s"))
      val cc = tok.groupBy("w").agg(count(lit(1)).as("n_w"))
      val ct = tok.agg(count(lit(1)).as("t"))
      val qs = col("n_sw").cast("double") / col("t_s")
      val p = col("n_w").cast("double") / col("t")
      val x = st.crossJoin(broadcast(cc)).crossJoin(broadcast(ct))
        .join(broadcast(sc), Seq("source", "w"), "left")
        .select(col("source"), col("t_s"),
          coalesce(col("n_sw"), lit(0L)).as("n_sw"), col("n_w"), col("t"))
        .select(col("source"), col("t_s"), col("n_sw"),
          ((qs - p) * (qs - p) / p * lit(1e6)).as("chi"))
      x.groupBy("source")
        .agg(max(col("t_s")).as("n_tokens"),
          sum(when(col("n_sw") > 0, 1).otherwise(0)).cast("long")
            .as("n_vocab_used"),
          dsum(col("chi")).as("chi2_ppm"))
        .orderBy("source")
    })

  // ---------------------------------------------------------------------
  // q144 — Gini-Simpson lexical diversity per source
  // ---------------------------------------------------------------------

  /** Per-source lexical diversity as the Gini-Simpson index
    * 1 − Σ p_w² (with p_w the token's occurrence share) plus the
    * "effective vocabulary" 1 / Σ p_w² — the diversity dial a mixing
    * pipeline reads next to q104's chi-square drift. Gini-Simpson is
    * chosen over Shannon entropy for the q104 reason: it is RATIONAL in
    * the counts (Σ n_w² / N²), so cross-engine parity is exact integer
    * arithmetic plus one rounded divide — never a libm log whose last
    * ulp the two engines need not agree on. One explode into a
    * (source × vocab)-bounded grid count, then a per-source aggregate
    * with exact integer Σn² (n ≤ tokens-per-source, Σn² < 2^63 by
    * orders of magnitude); everything map-side combines. */
  private val q144 = QueryDef(
    "q144_token_diversity_index",
    "per-source Gini-Simpson token diversity + effective vocabulary",
    Some("""
      WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
                   FROM documents),
      g AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok GROUP BY source, w),
      a AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
                   COUNT(*) AS n_distinct,
                   CAST(SUM(n * n) AS BIGINT) AS sum_sq
            FROM g GROUP BY source)
      SELECT source, n_tokens, n_distinct,
             ROUND(1.0 - CAST(sum_sq AS DOUBLE)
                   / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
               + 0.0 AS gini_simpson,
             ROUND(CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)
                   / CAST(sum_sq AS DOUBLE), 4) + 0.0 AS effective_vocab
      FROM a ORDER BY source"""),
    (s, dir) => {
      val g = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("n"))
      g.groupBy("source")
        .agg(sum("n").as("n_tokens"), count(lit(1)).as("n_distinct"),
          sum(col("n") * col("n")).as("sum_sq"))
        .select(col("source"), col("n_tokens"), col("n_distinct"),
          (round(lit(1.0) - col("sum_sq").cast("double")
            / (col("n_tokens").cast("double") * col("n_tokens").cast("double")), 6)
            + lit(0.0)).as("gini_simpson"),
          (round(col("n_tokens").cast("double") * col("n_tokens").cast("double")
            / col("sum_sq").cast("double"), 4) + lit(0.0)).as("effective_vocab"))
        .orderBy("source")
    })

  // ---------------------------------------------------------------------
  // q164 — text normalization mass audit (pre-tokenization cleanup)
  // ---------------------------------------------------------------------

  /** The lowercase → strip-non-alphanumeric → collapse-whitespace
    * normalization every tokenizer-prep pass runs, audited by exact
    * character accounting per source: raw mass, mass after keeping only
    * [a-z0-9 ], mass after whitespace collapse + trim, and the keep
    * ratio — the number that flags a source whose content is mostly
    * markup/punctuation before any tokens are spent on it. Pure per-row
    * regex projections (codegen'd, embarrassingly parallel) + one
    * source-domain aggregate; length sums are exact integers, the ratio
    * one IEEE divide, round6. The character class is spelled [^a-z0-9 ]
    * (no shorthand) so the Java and RE2-style engines agree; the oracle
    * passes the 'g' flag DuckDB needs for replace-all. */
  private val q164 = QueryDef(
    "q164_text_normalization_audit",
    "per source: char masses through lower/strip/collapse normalization",
    Some("""
      WITH n AS (SELECT source,
                        length(text) AS raw,
                        regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS alnum
                 FROM documents),
      c AS (SELECT source, raw, length(alnum) AS kept,
                   length(trim(regexp_replace(alnum, ' +', ' ', 'g'))) AS norm
            FROM n)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(raw) AS BIGINT) AS chars_raw,
             CAST(SUM(kept) AS BIGINT) AS chars_alnum,
             CAST(SUM(norm) AS BIGINT) AS chars_norm,
             ROUND(CAST(SUM(norm) AS DOUBLE) / SUM(raw), 6) + 0.0 AS keep_ratio
      FROM c GROUP BY source ORDER BY source"""),
    (s, dir) => {
      val n = Tables.documents(s, dir).select(col("source"),
        length(col("text")).as("raw"),
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("alnum"))
      val c = n.select(col("source"), col("raw"),
        length(col("alnum")).as("kept"),
        length(trim(regexp_replace(col("alnum"), " +", " "))).as("norm"))
      c.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("raw")).cast("long").as("chars_raw"),
          sum(col("kept")).cast("long").as("chars_alnum"),
          sum(col("norm")).cast("long").as("chars_norm"))
        .select(col("source"), col("n_docs"), col("chars_raw"),
          col("chars_alnum"), col("chars_norm"),
          (round(col("chars_norm").cast("double") / col("chars_raw"), 6)
            + lit(0.0)).as("keep_ratio"))
        .orderBy("source")
    })

  // ---------------------------------------------------------------------
  // q190 — phrase search over a positional inverted index
  // ---------------------------------------------------------------------

  /** Search-engine phrase matching: the inverted index q12 builds gains
    * POSITIONS, and a two-word phrase query becomes an equi-join of the
    * two posting lists on (doc, adjacent position) — the classic
    * positional-index plan, no substring scan of any document. Three
    * fixed phrase queries ride a broadcast literal table; occurrences
    * and distinct matching docs report per phrase. At 100 TB the
    * positional index is the q99 retrieval MV with one more column,
    * posting lists partition by term, and a phrase probe touches two
    * postings — never the corpus. Position arithmetic is exact
    * 1-based integers on both engines. */
  private val q190 = QueryDef(
    "q190_phrase_search",
    "two-word phrase queries via positional posting-list adjacency joins",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      idx AS (SELECT doc_id, u.p AS pos, u.w AS term
              FROM tok, unnest(list_transform(generate_series(1, len(t)),
                               i -> struct_pack(p := i, w := t[i]))) AS r(u)),
      q AS (SELECT * FROM (VALUES ('table hash', 'table', 'hash'),
                           ('customer join', 'customer', 'join'),
                           ('merge group', 'merge', 'group'))
                 AS t(phrase, w1, w2)),
      m AS (SELECT q.phrase, a.doc_id
            FROM q JOIN idx a ON a.term = q.w1
                  JOIN idx b ON b.doc_id = a.doc_id
                            AND b.pos = a.pos + 1
                            AND b.term = q.w2)
      SELECT phrase,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM m GROUP BY phrase ORDER BY phrase"""),
    (s, dir) => {
      val idx = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("pos0", "term")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("term"))
      val phrases = Seq(("table hash", "table", "hash"),
        ("customer join", "customer", "join"),
        ("merge group", "merge", "group"))
      val q = s.range(1).select(explode(array(phrases.map { case (p, a, b) =>
        struct(lit(p).as("phrase"), lit(a).as("w1"), lit(b).as("w2"))
      }: _*)).as("x")).select(col("x.phrase").as("phrase"),
        col("x.w1").as("w1"), col("x.w2").as("w2"))
      val a = idx.join(broadcast(q), col("term") === col("w1"))
        .select(col("phrase"), col("doc_id"), col("pos"), col("w2"))
      val m = a.join(idx.select(col("doc_id").as("bdoc"),
          col("pos").as("bpos"), col("term").as("bterm")),
        col("doc_id") === col("bdoc") && col("bpos") === col("pos") + 1
          && col("bterm") === col("w2"))
      m.groupBy("phrase")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .orderBy("phrase")
    })

  /** Okapi BM25 (Robertson et al., TREC-3; the Lucene-default scoring
    * function) for a fixed 3-term query over the corpus — the
    * probabilistic-retrieval sibling of q99's tf-idf cosine. Per term:
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)), weighted by the
    * saturating tf ratio tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)) with
    * the standard k1=1.2, b=0.75. Every per-row operand mirrors the
    * oracle token-for-token (same IEEE ops on the same integer inputs),
    * the ≤3-term score sum rides the exact-decimal accumulator, and the
    * rank windows over the ROUNDED score (ties by doc_id), so both
    * engines rank identically. Scale shape: tf is corpus-sized but
    * keyed by doc_id (one shuffle); df and the corpus stats are
    * term-count-sized broadcasts; the oracle states the global rank
    * window, but the ENGINE computes it through [[rankByScoreDesc]]'s
    * bucket-prefix decomposition (round-13 verdict item 3) — local
    * rank within a score bucket + broadcast prefix counts, never one
    * task sorting every scored doc. */
  private val q228 = QueryDef(
    "q228_bm25_retrieval",
    "Okapi BM25 (k1=1.2, b=0.75) document ranking for a 3-term query",
    Some(s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents),
      len AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
              FROM tok GROUP BY 1),
      stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl,
                       CAST(COUNT(*) AS BIGINT) AS n_docs FROM len),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
             WHERE term IN ('scan', 'window', 'sort') GROUP BY 1, 2),
      df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
             FROM tok WHERE term IN ('scan', 'window', 'sort') GROUP BY 1),
      contrib AS (
        SELECT t.doc_id, l.dl,
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl /
                   (CAST(s.sum_dl AS DOUBLE) / s.n_docs))) AS c
        FROM tf t JOIN df d USING (term) JOIN len l USING (doc_id)
        CROSS JOIN stats s),
      scored AS (SELECT doc_id, dl, ${graft.functions.det.dsumSql("c")} AS score
                 FROM contrib GROUP BY 1, 2)
      SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS rn, doc_id, dl, score
      FROM scored
      ORDER BY rn"""),
    (s, dir) => {
      rankByScoreDesc(bm25Scored(s, dir), "score", 16, "rn")
        .select("rn", "doc_id", "dl", "score")
        .orderBy("rn")
    })

  /** The fixed 3-term retrieval query q228/q233 share. */
  private val queryTerms = Seq("scan", "window", "sort")

  /** Global `row_number() OVER (ORDER BY scoreCol DESC, doc_id)` via
    * the q154 bucket-prefix decomposition (round-13 verdict item 3):
    * local rank within a score bucket (parallelism = buckets) plus the
    * broadcast prefix count of better buckets — never the
    * single-partition WindowExec the plain global window plans. The
    * bucket `floor(-score · 2^p)` is a pure coarsening of the DESC
    * order key (equal scores share a bucket; the power-of-two scale is
    * an exact float op, so strict score order maps to non-decreasing
    * bucket order), which makes the decomposition provably
    * rank-identical — the consumers' oracles state the plain window
    * and the hash gate proves it on real data. */
  private def rankByScoreDesc(df: DataFrame, scoreCol: String,
      scale: Int, rankName: String): DataFrame =
    graft.functions.ranks.bucketedGlobalRank(
        df.withColumn("__bkt", floor(-col(scoreCol) * scale).cast("long")),
        Nil, "__bkt", Seq(col(scoreCol).desc, col("doc_id")), rankName)
      .drop("__bkt")

  /** Per-doc token statistics computed MAP-SIDE from the split array
    * (optimization r17, guide §2.3/§2.4): `dl` is `size(split)` and each
    * query term's occurrence count is `size(filter(toks, = term))` — the
    * quantities the oracle derives by unnesting every token and
    * re-grouping by doc_id. The previous form exploded the FULL corpus
    * token stream and shuffled |tokens| rows back into |docs| groups
    * (plus a second explode+shuffle for the query-term tf and a len
    * join); all of that is per-row array arithmetic over the document
    * row itself, so no explode, no exchange, and no len join exist at
    * any scale. NULL-text docs produce no unnested rows in the oracle
    * and are filtered identically here; an empty text splits to [''],
    * dl = 1 on both engines. */
  private def bm25DocStats(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id") +: size(toks).cast("long").as("dl") +:
        queryTerms.map(t =>
          size(filter(toks, x => x === lit(t))).cast("long").as(s"tf_$t")): _*)
  }

  /** BM25-scored candidates (doc_id, dl, score[, rel]) for
    * [[queryTerms]] — q228's scoring stage, reused as q233's lexical
    * ranker and (with `withRel = true`) q234's graded ranking. Every
    * operand mirrors the oracle's contrib expression: identical IEEE
    * ops on identical integer inputs -> identical bits. Shape after the
    * r17 rewrite: one map-side pass ([[bm25DocStats]]) feeds (a) ONE
    * tiny corpus aggregate (sum_dl, n_docs, per-term df — a 1-row
    * broadcast; df_t = #docs with tf_t > 0 ≡ the oracle's
    * COUNT(DISTINCT doc_id) per term) and (b) the per-(doc, term)
    * contrib rows via an in-stage 3-struct explode with tf > 0 — so the
    * only remaining exchange is the final per-doc score aggregation,
    * whose input is |matching doc × term| rows, never |tokens|.
    * `rel` (q234's relevance grade, #distinct query terms present)
    * falls out of the same aggregate as count(*) — the contrib rows are
    * one-per-(doc, distinct term) by construction — replacing q234's
    * second full tokenize + groupBy + join. */
  private def bm25Scored(s: SparkSession, dir: String,
      withRel: Boolean = false): DataFrame = {
    val d = bm25DocStats(s, dir)
    val statsAggs = Seq(sum(col("dl")).as("sum_dl"),
      count(lit(1)).as("n_docs")) ++
      queryTerms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = d.agg(statsAggs.head, statsAggs.tail: _*)
    val tf = d.select(col("doc_id"), col("dl"),
        explode(array(queryTerms.map(t =>
          struct(lit(t).as("term"), col(s"tf_$t").as("tf"))): _*)).as("x"))
      .select(col("doc_id"), col("dl"), col("x.term").as("term"),
        col("x.tf").as("tf"))
      .filter(col("tf") > 0)
    val dfCol = queryTerms.tail.foldLeft(
        when(col("term") === queryTerms.head, col(s"df_${queryTerms.head}"))) {
        (acc, t) => acc.when(col("term") === t, col(s"df_$t"))
      }
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val c = idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / avgdl))
    val rel =
      if (withRel) Seq(count(lit(1)).as("rel")) else Seq.empty
    tf.crossJoin(broadcast(stats))
      .withColumn("df", dfCol)
      .withColumn("c", c)
      .groupBy("doc_id", "dl")
      .agg(graft.functions.det.dsum(col("c")).as("score"), rel: _*)
  }

  /** Reciprocal Rank Fusion (Cormack et al., SIGIR'09 — the standard
    * hybrid-search combiner, default in Elasticsearch/OpenSearch/
    * Vespa): fuse two retrievers for the same query with
    * `rrf(d) = Σ_s 1/(60 + rank_s(d))` — rank-based, so the two
    * systems' incomparable score scales never touch. System A is the
    * BM25 ranking ([[bm25Scored]]); system B is tf-idf COSINE against
    * the query as a unit pseudo-document (weights from the SAME
    * maintained index MVs q99 retrieves through — the production
    * shape: one index, many scorers). Both ranks window over ROUNDED
    * scores with doc_id ties, so the reciprocal terms are exact
    * integer-denominator doubles, identical on both engines; the fused
    * rank then orders on that identical sum. Candidate sets coincide
    * by construction (docs containing ≥1 query term). Scale shape:
    * both rankers are per-doc aggregates over posting joins; the
    * global rank windows are the oracle-friendly form of the top-k
    * heap a 100 TB retrieval would run (q99's TakeOrdered note). */
  private val q233 = QueryDef(
    "q233_rrf_hybrid_fusion",
    "reciprocal rank fusion (k=60) of BM25 and tf-idf-cosine rankings, top 20",
    Some(s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents),
      len AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
              FROM tok GROUP BY 1),
      stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl,
                       CAST(COUNT(*) AS BIGINT) AS n_docs FROM len),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
             WHERE term IN ('scan', 'window', 'sort') GROUP BY 1, 2),
      df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
             FROM tok WHERE term IN ('scan', 'window', 'sort') GROUP BY 1),
      contrib AS (
        SELECT t.doc_id, l.dl,
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl /
                   (CAST(s.sum_dl AS DOUBLE) / s.n_docs))) AS c
        FROM tf t JOIN df d USING (term) JOIN len l USING (doc_id)
        CROSS JOIN stats s),
      bm AS (SELECT doc_id, ${graft.functions.det.dsumSql("c")} AS score
             FROM contrib GROUP BY 1),
      bmr AS (SELECT doc_id,
                     CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                       AS BIGINT) AS rank_bm25 FROM bm),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      tfa AS (SELECT doc_id, term AS w, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok GROUP BY 1, 2),
      dfa AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tfa GROUP BY 1),
      idx AS (SELECT tfa.doc_id, tfa.w,
                     CAST(tfa.tf * n.n AS DOUBLE) / dfa.df AS wt
              FROM tfa JOIN dfa USING (w) CROSS JOIN n),
      nrm AS (SELECT doc_id, sqrt(${graft.functions.det.dsumSql("wt * wt")}) AS nrm
              FROM idx GROUP BY 1),
      qv AS (SELECT w, CAST(1 * n.n AS DOUBLE) / df AS wq
             FROM dfa CROSS JOIN n
             WHERE w IN ('scan', 'window', 'sort')),
      qn AS (SELECT sqrt(${graft.functions.det.dsumSql("wq * wq")}) AS qn FROM qv),
      dots AS (SELECT i.doc_id, ${graft.functions.det.dsumSql("i.wt * q.wq")} AS dot
               FROM idx i JOIN qv q USING (w) GROUP BY 1),
      cos AS (SELECT d.doc_id,
                     ROUND(d.dot / (m.nrm * qn.qn), 4) AS sim
              FROM dots d JOIN nrm m USING (doc_id) CROSS JOIN qn),
      cor AS (SELECT doc_id,
                     CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
                       AS BIGINT) AS rank_cos FROM cos),
      fused AS (SELECT b.doc_id, b.rank_bm25, c.rank_cos,
                       1.0 / (60 + b.rank_bm25) + 1.0 / (60 + c.rank_cos) AS rrf
                FROM bmr b JOIN cor c USING (doc_id)),
      ranked AS (SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id)
                          AS BIGINT) AS fused_rank,
                        doc_id, rank_bm25, rank_cos,
                        (ROUND(rrf, 6) + 0.0) AS rrf_score
                 FROM fused)
      SELECT fused_rank, doc_id, rank_bm25, rank_cos, rrf_score
      FROM ranked WHERE fused_rank <= 20
      ORDER BY fused_rank"""),
    (s, dir) => {
      import graft.functions.det
      // all three global ranks ride the bucket-prefix decomposition
      // (rankByScoreDesc) — the oracle states the plain windows
      val bmr = rankByScoreDesc(bm25Scored(s, dir), "score", 16, "rank_bm25")
        .select("doc_id", "rank_bm25")
      val idx = tfidfIndex(s, dir)
      val nrm = tfidfNorms(s, dir)
      val nDocs = Tables.documents(s, dir).select(count(lit(1)).as("n"))
      val qidx = idx.filter(col("w").isin(queryTerms: _*))
      // query pseudo-doc weights: tf_q = 1 per term, same rational idf
      // as the index (df = posting-list length per term)
      val qv = qidx.groupBy("w").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .select(col("w"), (lit(1) * col("n")).cast("double") / col("df"))
        .toDF("w", "wq")
      val qn = qv.agg(sqrt(det.dsum(col("wq") * col("wq"))).as("qn"))
      val dots = qidx.join(broadcast(qv), Seq("w"))
        .groupBy("doc_id").agg(det.dsum(col("wt") * col("wq")).as("dot"))
      val simDf = dots.join(nrm, Seq("doc_id")).crossJoin(broadcast(qn))
        .select(col("doc_id"),
          round(col("dot") / (col("nrm") * col("qn")), 4).as("sim"))
      val cor = rankByScoreDesc(simDf, "sim", 256, "rank_cos")
        .select("doc_id", "rank_cos")
      val fused = bmr.join(cor, Seq("doc_id"))
        .withColumn("rrf", lit(1.0) / (lit(60) + col("rank_bm25")) +
          lit(1.0) / (lit(60) + col("rank_cos")))
      // rrf ∈ (0, 2/61]: the 2^12 scale spreads it over ~100 buckets
      rankByScoreDesc(fused, "rrf", 4096, "fused_rank")
        .select(col("fused_rank"), col("doc_id"), col("rank_bm25"),
          col("rank_cos"), (round(col("rrf"), 6) + lit(0.0)).as("rrf_score"))
        .filter(col("fused_rank") <= 20)
        .orderBy("fused_rank")
    })

  /** nDCG@k (Järvelin & Kekäläinen 2002 — the standard graded ranking
    * metric): how well does the BM25 ranking ([[bm25Scored]]) order
    * documents by graded relevance? Grade = number of DISTINCT query
    * terms a document contains (1..3 — a label-free pseudo-relevance
    * the fixture supports honestly), DCG@k = Σ (2^grade − 1)/log2(i+1)
    * over the top k ranks, normalized by the ideal DCG of the same
    * grade multiset sorted descending. Grades are small integers so
    * 2^grade is exact; per-position contributions are identical IEEE
    * ops on identical inputs; the ≤k-term sums ride the decimal
    * accumulator and the ratio divides the two ROUNDED sums. Ranking
    * eval completes the retrieval toolkit: recall (q130), AUC (q199),
    * calibration (q204), ranking quality (here). Scale: two
    * corpus-keyed aggregates + k-bounded windows — the k rows per cut
    * are constant-size regardless of corpus. */
  private val q234 = QueryDef(
    "q234_ndcg_ranking_eval",
    "nDCG@{5,10,20} of the BM25 ranking against term-count graded relevance",
    Some(s"""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents),
      len AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
              FROM tok GROUP BY 1),
      stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl,
                       CAST(COUNT(*) AS BIGINT) AS n_docs FROM len),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
             WHERE term IN ('scan', 'window', 'sort') GROUP BY 1, 2),
      df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
             FROM tok WHERE term IN ('scan', 'window', 'sort') GROUP BY 1),
      contrib AS (
        SELECT t.doc_id, l.dl,
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
                 (t.tf * 2.2) /
                 (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl /
                   (CAST(s.sum_dl AS DOUBLE) / s.n_docs))) AS c
        FROM tf t JOIN df d USING (term) JOIN len l USING (doc_id)
        CROSS JOIN stats s),
      bm AS (SELECT doc_id, ${graft.functions.det.dsumSql("c")} AS score
             FROM contrib GROUP BY 1),
      grade AS (SELECT doc_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS rel
                FROM tok WHERE term IN ('scan', 'window', 'sort')
                GROUP BY 1),
      ranked AS (SELECT b.doc_id, g.rel,
                        CAST(row_number() OVER (ORDER BY b.score DESC, b.doc_id)
                          AS BIGINT) AS rn
                 FROM bm b JOIN grade g USING (doc_id)),
      ideal AS (SELECT rel,
                       CAST(row_number() OVER (ORDER BY rel DESC, doc_id)
                         AS BIGINT) AS rn
                FROM ranked),
      ks AS (SELECT CAST(unnest([5, 10, 20]) AS BIGINT) AS k),
      dcg AS (SELECT ks.k,
                     ${graft.functions.det.dsumSql(
                       "(2.0 ** r.rel - 1.0) / log2(CAST(r.rn + 1 AS DOUBLE))")}
                       AS dcg
              FROM ranked r CROSS JOIN ks WHERE r.rn <= ks.k GROUP BY 1),
      idcg AS (SELECT ks.k,
                      ${graft.functions.det.dsumSql(
                        "(2.0 ** i.rel - 1.0) / log2(CAST(i.rn + 1 AS DOUBLE))")}
                        AS idcg
               FROM ideal i CROSS JOIN ks WHERE i.rn <= ks.k GROUP BY 1)
      SELECT d.k, d.dcg, i.idcg,
             (ROUND(d.dcg / i.idcg, 4) + 0.0) AS ndcg
      FROM dcg d JOIN idcg i USING (k)
      ORDER BY k"""),
    (s, dir) => {
      import graft.functions.det
      // grade (= #distinct query terms present) rides the scoring
      // aggregate itself (bm25Scored withRel): the oracle's separate
      // tokenize → groupBy → join pipeline has the same domain (docs
      // with >= 1 query term) and the same value (one contrib row per
      // distinct present term), so the whole grade subtree is free.
      val ranked = rankByScoreDesc(
          bm25Scored(s, dir, withRel = true)
            .select("doc_id", "score", "rel"), "score", 16, "rn")
        .select("doc_id", "rel", "rn")
      // ideal ranking: rel ∈ {1,2,3} is its own (3-bucket) coarsening
      val ideal = rankByScoreDesc(ranked.select("doc_id", "rel"),
          "rel", 1, "irn")
        .select(col("rel"), col("irn").as("rn"))
      val ks = Seq(5L, 10L, 20L)
      def gain(rel: Column, rn: Column): Column =
        (pow(lit(2.0), rel) - lit(1.0)) / log2((rn + lit(1)).cast("double"))
      val kdf = s.createDataset(ks)(org.apache.spark.sql.Encoders.scalaLong)
        .toDF("k")
      val dcg = ranked.crossJoin(broadcast(kdf))
        .filter(col("rn") <= col("k"))
        .groupBy("k").agg(det.dsum(gain(col("rel"), col("rn"))).as("dcg"))
      val idcg = ideal.crossJoin(broadcast(kdf))
        .filter(col("rn") <= col("k"))
        .groupBy("k").agg(det.dsum(gain(col("rel"), col("rn"))).as("idcg"))
      dcg.join(idcg, Seq("k"))
        .select(col("k"), col("dcg"), col("idcg"),
          (round(col("dcg") / col("idcg"), 4) + lit(0.0)).as("ndcg"))
        .orderBy("k")
    })

  // ---------------------------------------------------------------------
  // q242 — positional phrase proximity search
  // ---------------------------------------------------------------------

  /** Proximity retrieval over a POSITIONAL inverted index — the "termA
    * NEAR/w termB" operator (Lucene's SpanNearQuery / PhraseQuery
    * semantics, ordered, slop ≤ 2): for three query term pairs, every
    * document where the second term follows the first within 3
    * positions, with the occurrence count and the tightest gap. q12's
    * inverted index answers WHICH docs contain a term; this is the
    * positions-aware layer phrase and proximity ranking need.
    *
    * Scale shape: the postings are filtered to the QUERY TERMS before
    * any join (two tiny position lists per doc — the index-lookup
    * shape, never a full-text scan at match time once the postings
    * table is materialized), and the position match is an equi-join on
    * doc_id with a bounded gap predicate — per-doc work is
    * |postings_a| × |postings_b| within one document only, never
    * cross-doc. At 100 TB the postings list is the sorted secondary
    * index a search engine maintains; the plan is unchanged. */
  private val q242 = QueryDef(
    "q242_phrase_proximity",
    "ordered proximity match (gap <= 3) for three term pairs: per-doc hits + min gap",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      pos AS (SELECT doc_id, t[i] AS term, i
              FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
                    FROM tok)),
      q(pair_id, term_a, term_b) AS (VALUES (1, 'scan', 'column'),
                                            (2, 'window', 'order'),
                                            (3, 'sort', 'key')),
      hits AS (SELECT q.pair_id, a.doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_hits,
                      CAST(MIN(b.i - a.i) AS BIGINT) AS min_gap
               FROM q
               JOIN pos a ON a.term = q.term_a
               JOIN pos b ON b.doc_id = a.doc_id AND b.term = q.term_b
                         AND b.i - a.i BETWEEN 1 AND 3
               GROUP BY 1, 2)
      SELECT CAST(pair_id AS BIGINT) AS pair_id, doc_id, n_hits, min_gap
      FROM hits
      ORDER BY pair_id, doc_id"""),
    (s, dir) => {
      import s.implicits._
      val q = Seq((1L, "scan", "column"), (2L, "window", "order"),
        (3L, "sort", "key")).toDF("pair_id", "term_a", "term_b")
      val tt = col("t")
      val pos = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), posexplode(tt).as(Seq("i0", "term")))
        .select(col("doc_id"), col("term"), (col("i0") + 1).as("i"))
      val terms = Seq("scan", "column", "window", "order", "sort", "key")
      val p = pos.filter(col("term").isin(terms: _*))
      val a = p.select(col("doc_id"), col("term").as("term_a"), col("i").as("ia"))
        .join(broadcast(q), Seq("term_a"))
        .select(col("doc_id"), col("pair_id"), col("term_b").as("qb"), col("ia"))
      val b = p.select(col("doc_id").as("doc_b"), col("term").as("qb2"),
        col("i").as("ib"))
      a.join(b, col("doc_id") === col("doc_b") && col("qb") === col("qb2")
          && col("ib") - col("ia") >= 1 && col("ib") - col("ia") <= 3)
        .groupBy(col("pair_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_hits"),
          min(col("ib") - col("ia")).cast("long").as("min_gap"))
        .select(col("pair_id"), col("doc_id"), col("n_hits"), col("min_gap"))
        .orderBy("pair_id", "doc_id")
    })

  // ---------------------------------------------------------------------
  // q251 — Gopher-style quality-rule scorecard (rule-level pass counts)
  // ---------------------------------------------------------------------

  /** The rule-based document filter of the Gopher/MassiveText lineage
    * (Rae et al. 2021 §A1.1; the same battery FineWeb and Dolma run
    * before any model-based scoring), reported at RULE grain — per
    * rule, how many docs pass/fail, plus the all-rules conjunction —
    * because the per-rule attrition table is what a curation owner
    * reads before touching a threshold. Four rules with signal in this
    * corpus (bounds scaled to its word-soup docs; the mechanism, not
    * the constants, is the operator):
    *   r1 word count ≥ 20 (Gopher: 50..100k — drops fragments);
    *   r2 mean word length in [3, 4.5] (Gopher: 3..10);
    *   r3 stopword battery: 'the' AND 'a' both present (Gopher: ≥2 of
    *      its 8 English stopwords — a cheap English-fluency proxy);
    *   r4 top-word dominance ≤ 1/8 of tokens (the repetition screen,
    *      q95's max-frequency signal as a hard rule).
    * EVERY threshold compares integers (mean length as 2·Σlen vs 6·wc
    * and 9·wc; dominance as 8·max_count vs wc; Σ word lengths =
    * length(text) − (wc−1) since text is single-space joined) — no
    * float reaches a comparison, so both engines agree exactly.
    * Shape at 100 TB: r1–r3 are one projection pass; r4 is the only
    * shuffle (per-(doc, word) count → per-doc max, both map-side
    * combinable); the readout is a 5-row stack off one scalar agg. */
  private val q251 = QueryDef(
    "q251_gopher_quality_rules",
    "Gopher-style rule battery: per-rule pass/fail counts + all-rules conjunction",
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t,
                          CAST(len(text) AS BIGINT) AS tl
                   FROM documents),
      base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS wc,
                      tl - (len(t) - 1) AS sumlen,
                      list_contains(t, 'the') AND list_contains(t, 'a') AS sw
               FROM tok),
      mf AS (SELECT doc_id, MAX(c) AS maxn FROM (
               SELECT doc_id, COUNT(*) AS c
               FROM tok, unnest(t) AS u(w) GROUP BY doc_id, w)
             GROUP BY doc_id),
      fl AS (SELECT b.wc >= 20 AS r1,
                    2 * b.sumlen >= 6 * b.wc AND 2 * b.sumlen <= 9 * b.wc AS r2,
                    b.sw AS r3,
                    8 * m.maxn <= b.wc AS r4
             FROM base b JOIN mf m USING (doc_id)),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(r1::INT) AS BIGINT) AS p1,
                     CAST(SUM(r2::INT) AS BIGINT) AS p2,
                     CAST(SUM(r3::INT) AS BIGINT) AS p3,
                     CAST(SUM(r4::INT) AS BIGINT) AS p4,
                     CAST(SUM((r1 AND r2 AND r3 AND r4)::INT) AS BIGINT) AS pa
              FROM fl)
      SELECT rule, n_pass, n - n_pass AS n_fail FROM (
        SELECT 'r1_word_count' AS rule, p1 AS n_pass, n FROM agg
        UNION ALL SELECT 'r2_mean_word_len', p2, n FROM agg
        UNION ALL SELECT 'r3_stopwords', p3, n FROM agg
        UNION ALL SELECT 'r4_top_word_frac', p4, n FROM agg
        UNION ALL SELECT 'r5_all_rules', pa, n FROM agg)
      ORDER BY rule"""),
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("t"),
          length(col("text")).cast("long").as("tl"))
      val base = tok.select(col("doc_id"),
        size(col("t")).cast("long").as("wc"),
        (col("tl") - (size(col("t")) - 1)).as("sumlen"),
        (array_contains(col("t"), "the") && array_contains(col("t"), "a"))
          .as("sw"))
      val mf = tok.select(col("doc_id"), explode(col("t")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("maxn"))
      val fl = base.join(mf, Seq("doc_id"))
        .select((col("wc") >= 20).as("r1"),
          (lit(2) * col("sumlen") >= lit(6) * col("wc") &&
            lit(2) * col("sumlen") <= lit(9) * col("wc")).as("r2"),
          col("sw").as("r3"),
          (lit(8) * col("maxn") <= col("wc")).as("r4"))
      def pass(c: Column) = sum(when(c, 1L).otherwise(0L))
      val agg = fl.agg(count(lit(1)).as("n"),
        pass(col("r1")).as("p1"), pass(col("r2")).as("p2"),
        pass(col("r3")).as("p3"), pass(col("r4")).as("p4"),
        pass(col("r1") && col("r2") && col("r3") && col("r4")).as("pa"))
      agg.selectExpr(
          """stack(5,
             'r1_word_count', p1,
             'r2_mean_word_len', p2,
             'r3_stopwords', p3,
             'r4_top_word_frac', p4,
             'r5_all_rules', pa) AS (rule, n_pass)""",
          "n")
        .select(col("rule"), col("n_pass"), (col("n") - col("n_pass")).as("n_fail"))
        .orderBy("rule")
    })

  def defs: Seq[QueryDef] =
    Seq(q25, q26, q27, q28, q29, q30, q99, q104, q144, q164, q190, q228,
      q233, q234, q242, q251)
}
