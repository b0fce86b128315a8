package graft.queries

import graft.Tables
import graft.operators.TextStats
import graft.operators.TextStats._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents`: token counting, quality scoring,
  * language-ID heuristic, shingle fingerprinting. All ratios are exact
  * int/int double divisions, identical across engines — no rounding needed.
  */
object TextAnalysis extends QueryPack {

  private def toks: Column = TextStats.tokens(col("text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace, BPE-ish regex, distinct alnum tokens.
    "ta_tokens" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        wsTokenCount(col("text")).cast("long").as("n_ws"),
        bpeishTokenCount(col("text")).cast("long").as("n_bpe"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: length / alpha ratio / stopword ratio composite.
    "ta_quality" -> { (s, d) =>
      val t = toks
      val nTok = size(t)
      val nStop = hitCount(t, stopwords("en"))
      val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      Tables.documents(s, d).select(
        col("doc_id"),
        nTok.cast("long").as("n_tok"),
        (nStop.cast("double") / nTok).as("stop_ratio"),
        (alpha.cast("double") / length(col("text"))).as("alpha_ratio"),
        (lit(0.5) * (nStop.cast("double") / nTok)
          + lit(0.3) * (alpha.cast("double") / length(col("text")))
          + lit(0.2) * least(lit(1.0), nTok.cast("double") / 50.0)).as("quality"))
        .orderBy(col("doc_id"))
    },

    // Language-ID heuristic: stopword-profile scores, argmax with
    // deterministic tie order en > de > es > fr.
    "ta_langid" -> { (s, d) =>
      val t = toks
      val n = size(t)
      def score(l: String): Column =
        hitCount(t, stopwords(l)).cast("double") / n
      val (en, de, es, fr) = (score("en"), score("de"), score("es"), score("fr"))
      Tables.documents(s, d).select(
        col("doc_id"), col("lang").as("labeled_lang"),
        en.as("en_score"), de.as("de_score"), es.as("es_score"), fr.as("fr_score"),
        when(en >= de && en >= es && en >= fr, "en")
          .when(de >= es && de >= fr, "de")
          .when(es >= fr, "es")
          .otherwise("fr").as("pred"))
        .orderBy(col("doc_id"))
    },

    // Document fingerprint: min-md5 over word-5-gram shingles + cardinality
    // (rolling-hash winnowing, expressed as a bottom-1 sketch).
    "ta_fingerprint" -> { (s, d) =>
      val sh = TextStats.shingles(toks, 5)
      Tables.documents(s, d).select(
        col("doc_id"),
        array_min(transform(sh, s0 => md5(s0))).as("fp"),
        size(sh).cast("long").as("n_shingles"))
        .orderBy(col("doc_id"))
    },
    // Attached-function token statistics: per-lang top-10 tokens through
    // the TokenFreqAgg UDAF (partial-aggregated count maps).
    "ta_token_stats" -> { (s, d) =>
      val tokfreq = udaf(new graft.operators.Statistics.TokenFreqAgg(10))
      Tables.documents(s, d)
        .select(col("lang"), explode(toks).as("term"))
        .groupBy("lang")
        .agg(tokfreq(col("term")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
          col("col._1").as("term"), col("col._2").as("cnt"))
        .orderBy(col("lang"), col("rank"))
    },

    // Corpus-level statistics (the collection-stats surface): doc count,
    // token totals, global vocabulary size, length distribution. One
    // shuffle for the distinct-vocab count; everything else partial-aggs.
    "ta_corpus_stats" -> { (s, d) =>
      val base = Tables.documents(s, d)
        .select(col("lang"), toks.as("t"), col("n_chars"))
      val stats = base.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("t")).cast("long")).as("total_tok"),
        min(size(col("t")).cast("long")).as("min_tok"),
        max(size(col("t")).cast("long")).as("max_tok"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      // vocab as explode + two-phase distinct count — never materializes
      // a language's token set in one aggregation buffer
      val vocab = base
        .select(col("lang"), explode(array_distinct(col("t"))).as("term"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("term")).as("vocab"))
      stats.join(vocab, Seq("lang")).orderBy(col("lang"))
    },

    // PII scrubbing (training-data redaction): tag emails / phones /
    // IPv4s and emit per-row redaction counts + a digest of the cleaned
    // text. The corpus is synthetic, so the PII-bearing text is
    // constructed deterministically in-plan from customer fields — the
    // oracle builds the identical string; the operator under test is the
    // generic regexp_replace chain + counters in TextStats (RE2-safe
    // patterns, codegen'd, no UDF).
    "ta_pii_redact" -> { (s, d) =>
      val t = concat(
        lit("contact "), col("c_name"),
        lit(" <user"), col("c_custkey").cast("string"),
        lit("@example.com> or +1-"),
        lpad((col("c_custkey") % 900 + 100).cast("string"), 3, "0"),
        lit("-555-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("c_custkey") % 256).cast("string"),
        lit(".1 segment "), col("c_mktsegment"))
      Tables.customer(s, d).select(
        col("c_custkey"),
        TextStats.piiCount(t, "email").cast("long").as("n_email"),
        TextStats.piiCount(t, "phone").cast("long").as("n_phone"),
        TextStats.piiCount(t, "ipv4").cast("long").as("n_ip"),
        md5(TextStats.redactPii(t)).as("sig"))
        .orderBy(col("c_custkey"))
    },

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf·ln(N/df). Two aggregations (term counts per doc, then doc
    // frequency over the tf table — df is exactly one count per distinct
    // (doc, term) row, no second distinct needed) and a WindowGroupLimit
    // top-3. The tf⋈df join stays a shuffle join on purpose: at corpus
    // scale the vocabulary is NOT broadcastable; the 1-row corpus count
    // is.
    "ta_keywords" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val tf = docs.select(col("doc_id"), explode(toks).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
      tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * log(col("n").cast("double") / col("df")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"),
          col("df"), round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // Gopher-style repetition signals: duplicate-token ratio, most-common
    // word fraction, most-common bigram fraction. Pure per-row array
    // algebra — zero shuffles, stays in WholeStageCodegen, so it scales
    // with the scan (docs are bounded-length; the per-doc O(m^2) distinct
    // scan is constant work per row).
    "ta_repetition" -> { (s, d) =>
      val t = toks
      val n = size(t)
      val bi = transform(sequence(lit(1), n - 1),
        i => concat_ws(" ", slice(t, i, lit(2))))
      def topFreq(arr: Column): Column =
        array_max(transform(array_distinct(arr),
          g => size(filter(arr, x => x === g))))
      Tables.documents(s, d).select(
        col("doc_id"),
        n.cast("long").as("n_tok"),
        (size(array_distinct(t)).cast("double") / n).as("uniq_ratio"),
        (topFreq(t).cast("double") / n).as("top_word_frac"),
        when(n >= 2, topFreq(bi).cast("double") / (n - 1))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    },

    // Gopher-style rule filters: token-count bounds, mean word length,
    // alphabetic-word fraction, stopword floor — the classic rule gate a
    // pretraining pipeline applies before model-based filtering. Pure
    // per-row array algebra (zero shuffles, WholeStageCodegen end to
    // end), so throughput == scan throughput at any corpus size.
    "ta_gopher_rules" -> { (s, d) =>
      val t = toks
      val n = size(t)
      val meanLen = aggregate(t, lit(0L), (acc, x) => acc + length(x))
        .cast("double") / n
      val alphaFrac = size(filter(t, x => x.rlike("[a-z]")))
        .cast("double") / n
      val nStop = hitCount(t, stopwords("en"))
      Tables.documents(s, d).select(
        col("doc_id"),
        n.cast("long").as("n_tok"),
        meanLen.as("mean_len"),
        alphaFrac.as("alpha_frac"),
        nStop.cast("long").as("n_stop"),
        (n.between(5, 400) && meanLen >= 3.0 && meanLen <= 10.0 &&
          alphaFrac >= 0.8 && nStop >= 2).as("keep"))
        .orderBy(col("doc_id"))
    },

    // CCNet-style n-gram LM quality scoring (the perplexity filter of
    // the classic LLM-pretraining pipeline): an add-0.5-smoothed bigram
    // LM is fitted on the corpus itself, and every document is scored by
    // its per-transition cross-entropy (nats) and perplexity. See
    // TextStats.bigramLmScore for the plan shape (per-row transition
    // build, vocab-sized shuffle-joined LM tables).
    "ta_perplexity" -> { (s, d) =>
      TextStats.bigramLmScore(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    },

    // Interpolated Kneser–Ney bigram scoring (the KenLM-standard
    // smoothing CCNet's published filter actually runs): discounted
    // observed mass plus the continuation distribution N1+(·,w)/B,
    // fitted on the corpus and self-scored. Same additive count table
    // as ta_perplexity — only the smoothing differs. See
    // TextStats.kneserNeyScore.
    "ta_kneser_ney" -> { (s, d) =>
      TextStats.kneserNeyScore(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    },

    // Kneser–Ney's ingest face at the moment fallbacks matter: EARLY in
    // ingest the maintained LM has seen only a sliver of the corpus
    // (here a ~1% stored sample, doc_id % 101 == 1), and an arriving
    // batch is mostly novel — 3051 of the batch's 4215 transitions at
    // sf0.01 score through the unseen-continuation count-1 floor, so
    // the fallback formula is oracle-proven, not just fixture-gated.
    // (The unseen-CONTEXT backoff cannot fire on this corpus — its
    // vocabulary is dense enough that every word is some bigram's
    // context even in a 1% sample — so that branch stays pinned by the
    // hand-computed TextAnalysisSpec fixture.)
    "ta_kn_probe" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      TextStats.scoreWithKn(
          TextStats.bigramTransitions(docs.filter(col("doc_id") % 7 === 0)),
          TextStats.bigramLmCounts(TextStats.bigramTransitions(
            docs.filter(col("doc_id") % 101 === 1))))
        .orderBy(col("doc_id"))
    },

    // Stupid Backoff trigram scoring (Brants 2007) — the canonical
    // DISTRIBUTED LM scheme: plain count ratios with a fixed 0.4 backoff
    // penalty, no normalization pass, three additive count tables. Fitted
    // on the stored corpus, scoring the arriving batch (every 7th doc) so
    // all three branches — trigram hit, bigram backoff, OOV floor — carry
    // real weight through the oracle.
    "ta_stupid_backoff" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      TextStats.stupidBackoffScore(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0))
        .orderBy(col("doc_id"))
    },

    // GPT-3-style quality classifier (Brown 2020 App.A): multinomial
    // Naive Bayes fitted on the stored corpus to tell the "curated"
    // sources (even-digit suffix) from the rest, scoring the arriving
    // batch (every 7th doc) by target-class log-odds — unseen batch
    // words exercise the smoothing floors through the oracle. See
    // TextStats.scoreWithNb for the plan shape (one vocab-keyed join,
    // two one-row broadcasts).
    "ta_nb_quality" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
        substring(col("source"), -1, 1)
          .isin("0", "2", "4", "6", "8").as("is_target"))
      TextStats.nbQualityScore(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text"))
        .orderBy(col("doc_id"))
    },

    // Zipf rank-frequency diagnostics: ln(freq)-vs-ln(rank) slope + R²
    // over the top-1000 words — natural text tracks slope ≈ −1; strong
    // deviation flags boilerplate corpora. TakeOrdered top-K, bounded
    // rank window, single-pass regression aggregates.
    "ta_zipf" -> { (s, d) =>
      TextStats.zipfStats(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
    },

    // Per-doc trigram novelty: fraction of a doc's distinct shingles
    // occurring nowhere else (df = 1) — the boilerplate detector that
    // complements the dedup signals. Vocab-keyed df join, never
    // broadcast.
    "ta_novelty" -> { (s, d) =>
      TextStats.noveltyRate(
          Tables.documents(s, d).select(col("doc_id"), col("text")))
        .orderBy(col("doc_id"))
    },

    // The novelty detector's ingest face: arriving batch (every 7th
    // doc) scores against df over everything seen — row-identical to
    // ta_novelty restricted to the batch, |batch|-scaled scoring work.
    "ta_novelty_probe" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      TextStats.noveltyProbe(docs.filter(col("doc_id") % 7 === 0), docs)
        .orderBy(col("doc_id"))
    },

    // Per-source distinct-n diversity (Li et al. distinct-1/distinct-2
    // corpus-side) + vocabulary stats — the boilerplate-source detector.
    // Exact count_distinct form: the DuckDB-checked twin of the HLL
    // scale path below.
    "ta_source_vocab" -> { (s, d) =>
      TextStats.sourceVocab(
          Tables.documents(s, d).select(col("source"), col("text")))
        .orderBy(col("source"))
    },

    // The 100 TB form of the same diagnostic: HyperLogLog++ sketches
    // partial-aggregate map-side (fixed-size state per source — no
    // gram-keyed shuffle of the full vocabulary). Rows-only in
    // CORRECTNESS (cross-engine sketches differ by construction);
    // TextAnalysisSpec gates relative error <= 3*rsd against the exact
    // twin, mirroring pl_ccnet_buckets_approx's pattern.
    "ta_source_vocab_approx" -> { (s, d) =>
      TextStats.sourceVocab(
          Tables.documents(s, d).select(col("source"), col("text")),
          approx = true)
        .orderBy(col("source"))
    },

    // Collocation mining: corpus bigram PMI with an exact integer
    // min-count row cut (a float-score cut would make the row set
    // engine-dependent at ties). The word2phrase/phrase-detection
    // staple over the documents table.
    "ta_collocations" -> { (s, d) =>
      TextStats.collocations(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          minCount = 5)
        .orderBy(col("w1"), col("w2"))
    },

    // Per-source distribution drift: Jensen–Shannon divergence between
    // each source's unigram distribution and the corpus mixture —
    // sparse-support evaluation (the missing-vocab KL tail telescopes
    // to a closed form; see TextStats.domainDrift).
    "ta_domain_drift" -> { (s, d) =>
      TextStats.domainDrift(
          Tables.documents(s, d).select(col("source"), col("text")))
        .orderBy(col("source"))
    },

    // Text-to-KNN end to end with NO hash opacity anywhere: documents
    // embed through the fitted dense tf-idf function (vocabulary cut,
    // slot weights, and L2 norm all SQL-reproducible — see
    // fc_dense_tfidf), then exact cosine top-10 per query document.
    // The one dense embed→search pipeline whose every stage the DuckDB
    // oracle rebuilds bit-for-bit.
    "ta_tfidf_knn" -> { (s, d) =>
      val ef = graft.functions.EmbeddingFunctions.VocabTfIdfDense.fit(
        Tables.documents(s, d), "text", dim = 64)
      val vecs = Tables.documents(s, d)
        .select(col("doc_id"), ef.embed(col("text")).as("embedding"))
        .filter(exists(col("embedding"), x => x =!= 0f))
      val corpus = vecs.select(col("doc_id").as("offset_id"), col("embedding"))
      val queries = vecs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("embedding").as("q_embedding"))
      graft.operators.Knn.exact(corpus, queries, k = 10, space = "cosine")
        .select(col("query_id"), col("rank"), col("offset_id").as("doc_id"),
          col("dist").cast("float").as("dist"))
        .orderBy(col("query_id"), col("rank"))
    },
  )

  private def sqlToks = "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '')"
  private def sqlHits(l: String) =
    s"len(list_filter(t, x -> x IN (${stopwords(l).map(w => s"'$w'").mkString(",")})))"

  /** Shared DuckDB CTE chain reproducing `VocabTfIdfDense.fit` + `embed`
    * over the documents table bit-for-bit (df-ranked 64-slot vocabulary,
    * 1/64-quantized BM25 idf, 1/1024-quantized ln(1+tf)·idf weights,
    * double-normalized, f32 cells) — through `vecs(doc_id, emb)`, with
    * `idf(term, slot, idf)` and `slots(slot)` available to callers for
    * building query-side vectors. Reused by `ta_tfidf_knn`,
    * `mm_embed_knn_oracle`, and `fc_search_text`.
    */
  val tfidfVecsCte: String =
    """tf0 AS (SELECT doc_id, unnest(t) AS term FROM
      |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
      |       x -> x <> '') AS t FROM documents)),
      |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf0 GROUP BY 1, 2),
      |n AS (SELECT count(*) AS n FROM documents),
      |dfv AS (SELECT term, count(*) AS df FROM
      |          (SELECT DISTINCT doc_id, term FROM tf0) GROUP BY term),
      |vocab AS (SELECT term, df,
      |            row_number() OVER (ORDER BY df DESC, term) AS rn FROM dfv),
      |idf AS (SELECT term, rn - 1 AS slot,
      |          floor(ln(((SELECT n FROM n) - df + 0.5) / (df + 0.5) + 1.0)
      |            * 64) / 64 AS idf
      |        FROM vocab WHERE rn <= 64),
      |w AS (SELECT f.doc_id, i.slot,
      |        floor(ln(1.0 + f.tf) * i.idf * 1024) / 1024 AS w
      |      FROM freq f JOIN idf i ON f.term = i.term),
      |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w
      |        GROUP BY doc_id HAVING sum(w * w) > 0),
      |cells AS (SELECT w.doc_id, w.slot, CAST(w.w / nrm.nn AS FLOAT) AS w
      |          FROM w JOIN nrm ON w.doc_id = nrm.doc_id),
      |slots AS (SELECT unnest(range(64)) AS slot),
      |vecs AS (SELECT d.doc_id,
      |           list(coalesce(c.w, CAST(0 AS FLOAT)) ORDER BY s.slot) AS emb
      |         FROM (SELECT DISTINCT doc_id FROM cells) d
      |         CROSS JOIN slots s
      |         LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.slot = s.slot
      |         GROUP BY d.doc_id)""".stripMargin

  /** Shared CTE chain ending in `pplt(doc_id, n_trans, nll, ppl)` — the
    * DuckDB rebuild of [[graft.operators.TextStats.bigramLmScore]], used
    * by ta_perplexity's oracle and by downstream pipeline oracles
    * (PipelinePack's CCNet bucketing, StreamingPack's st_perplexity).
    */
  def sqlPerplexityCte: String =
    s"""tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
      |tr AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS w
      |       FROM tk WHERE len(t) >= 2),
      |bigc AS (SELECT prev, w, count(*) AS cbw FROM tr GROUP BY 1, 2),
      |prevc AS (SELECT prev, count(*) AS cp FROM tr GROUP BY 1),
      |voc AS (SELECT count(DISTINCT term) AS v
      |        FROM (SELECT unnest(t) AS term FROM tk WHERE len(t) >= 2)),
      |dtf AS (SELECT doc_id, prev, w, count(*) AS c FROM tr GROUP BY 1, 2, 3),
      |pplt AS (SELECT d.doc_id, sum(d.c)::BIGINT AS n_trans,
      |  round(-sum(d.c * ln((b.cbw + 0.5) / (p.cp + 0.5 * (SELECT v FROM voc))))
      |    / sum(d.c), 6) AS nll,
      |  round(exp(-sum(d.c * ln((b.cbw + 0.5) / (p.cp + 0.5 * (SELECT v FROM voc))))
      |    / sum(d.c)), 2) AS ppl
      |FROM dtf d JOIN bigc b ON d.prev = b.prev AND d.w = b.w
      |JOIN prevc p ON d.prev = p.prev
      |GROUP BY d.doc_id)""".stripMargin

  /** Shared CTE chain ending in `knt(doc_id, n_trans, nll, ppl)` — the
    * DuckDB rebuild of [[graft.operators.TextStats.kneserNeyScore]]
    * (interpolated KN, D = 0.75), used by ta_kneser_ney's oracle and by
    * st_kneser_ney (the maintained count table folds to the batch fit,
    * so the streamed score is the same formula over the same counts).
    */
  def sqlKneserNeyCte: String =
    s"""tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
      |tr AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS w
      |       FROM tk WHERE len(t) >= 2),
      |bigc AS (SELECT prev, w, count(*) AS cbw FROM tr GROUP BY 1, 2),
      |prevc AS (SELECT prev, sum(cbw) AS cp, count(*) AS n1fw FROM bigc GROUP BY 1),
      |contc AS (SELECT w, count(*) AS n1bw FROM bigc GROUP BY 1),
      |btot AS (SELECT count(*) AS b FROM bigc),
      |dtf AS (SELECT doc_id, prev, w, count(*) AS c FROM tr GROUP BY 1, 2, 3),
      |knt AS (SELECT d.doc_id, sum(d.c)::BIGINT AS n_trans,
      |  round(-sum(d.c * ln((greatest(b.cbw - 0.75, 0)
      |      + 0.75 * p.n1fw * cc.n1bw / (SELECT b FROM btot)) / p.cp))
      |    / sum(d.c), 6) AS nll,
      |  round(exp(-sum(d.c * ln((greatest(b.cbw - 0.75, 0)
      |      + 0.75 * p.n1fw * cc.n1bw / (SELECT b FROM btot)) / p.cp))
      |    / sum(d.c)), 2) AS ppl
      |FROM dtf d JOIN bigc b ON d.prev = b.prev AND d.w = b.w
      |JOIN prevc p ON d.prev = p.prev
      |JOIN contc cc ON d.w = cc.w
      |GROUP BY d.doc_id)""".stripMargin

  /** Shared DuckDB CTE chain rebuilding [[graft.operators.TextStats
    * .scoreWithNb]] — fit on `corpusFilter` docs, score `batchFilter`
    * docs — through `agg(doc_id, n_toks, logodds)`. One definition
    * serves ta_nb_quality / st_nb_quality (stored/arriving split) and
    * PipelinePack's pl_nb_pareto_sample (corpus-wide self-score): a
    * scoring-formula change edits exactly one SQL block.
    */
  def sqlNbCte(corpusFilter: String, batchFilter: String,
      posExpr: String = "right(source, 1) IN ('0','2','4','6','8')"): String =
    s"""tk AS (SELECT doc_id,
      |          $posExpr AS pos,
      |          $sqlToks AS t FROM documents),
      |corp AS (SELECT * FROM tk WHERE $corpusFilter),
      |wc AS (SELECT pos, w, count(*) AS cw
      |       FROM (SELECT pos, unnest(t) AS w FROM corp) GROUP BY 1, 2),
      |piv AS (SELECT w, sum(CASE WHEN pos THEN cw END) AS cpos,
      |               sum(CASE WHEN NOT pos THEN cw END) AS cneg
      |        FROM wc GROUP BY w),
      |tot AS (SELECT coalesce(sum(CASE WHEN pos THEN cw END), 0) AS npos,
      |               coalesce(sum(CASE WHEN NOT pos THEN cw END), 0) AS nneg,
      |               count(DISTINCT w) AS v FROM wc),
      |pri AS (SELECT coalesce(sum(CASE WHEN pos THEN 1 END), 0) AS dpos,
      |               coalesce(sum(CASE WHEN NOT pos THEN 1 END), 0) AS dneg
      |        FROM corp),
      |dtf AS (SELECT doc_id, w, count(*) AS c
      |        FROM (SELECT doc_id, unnest(t) AS w FROM tk WHERE $batchFilter)
      |        GROUP BY 1, 2),
      |sc AS (SELECT d.doc_id, d.c,
      |         d.c * (ln((coalesce(p.cpos, 0) + 1.0) / (t.npos + 1.0 * t.v))
      |              - ln((coalesce(p.cneg, 0) + 1.0) / (t.nneg + 1.0 * t.v))) AS term
      |       FROM dtf d LEFT JOIN piv p ON d.w = p.w CROSS JOIN tot t),
      |agg AS (SELECT doc_id, sum(c)::BIGINT AS n_toks,
      |          round(ln((SELECT dpos FROM pri)::DOUBLE / (SELECT dneg FROM pri))
      |            + sum(term), 6) AS logodds
      |        FROM sc GROUP BY doc_id)""".stripMargin

  /** DuckDB rebuild of the ta_nb_quality fit+score (scoreWithNb over the
    * stored/arriving split) — also st_nb_quality's oracle verbatim (the
    * stream-maintained count tables fold to the batch fit).
    */
  val sqlNbQuality: String =
    s"""WITH ${sqlNbCte("doc_id % 7 <> 0", "doc_id % 7 = 0")}
      |SELECT doc_id, n_toks, logodds, logodds > 0 AS pred
      |FROM agg ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "ta_collocations" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
        |tr AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |       FROM tk WHERE len(t) >= 2),
        |big AS (SELECT w1, w2, count(*) AS c FROM tr GROUP BY 1, 2),
        |l AS (SELECT w1, count(*) AS cl FROM tr GROUP BY 1),
        |r AS (SELECT w2, count(*) AS cr FROM tr GROUP BY 1),
        |n AS (SELECT count(*) AS n_trans FROM tr)
        |SELECT b.w1, b.w2, b.c,
        |  round(ln(b.c::DOUBLE * (SELECT n_trans FROM n) / (l.cl * r.cr)), 6) AS pmi
        |FROM big b JOIN l USING (w1) JOIN r USING (w2)
        |WHERE b.c >= 5 ORDER BY w1, w2""".stripMargin,

    "ta_domain_drift" ->
      s"""WITH tok AS (SELECT source, unnest($sqlToks) AS w FROM documents),
        |sw AS (SELECT source, w, count(*) AS csw FROM tok GROUP BY 1, 2),
        |st AS (SELECT source, sum(csw) AS ns FROM sw GROUP BY 1),
        |cw AS (SELECT w, sum(csw) AS cw FROM sw GROUP BY 1),
        |nt AS (SELECT sum(cw) AS n FROM cw),
        |j AS (SELECT sw.source, st.ns,
        |        sw.csw::DOUBLE / st.ns AS p,
        |        cw.cw::DOUBLE / (SELECT n FROM nt) AS q
        |      FROM sw JOIN st USING (source) JOIN cw USING (w))
        |SELECT source, max(ns)::BIGINT AS n_tokens,
        |  round((sum(p * ln(p / ((p + q) / 2))) + sum(q * ln(q / ((p + q) / 2)))
        |         + ln(2) * (1 - sum(q))) / 2, 6) AS jsd
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "ta_stupid_backoff" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
        |ctr AS (SELECT unnest(t[1:len(t)-2]) AS p2, unnest(t[2:len(t)-1]) AS p1,
        |               unnest(t[3:len(t)]) AS w
        |        FROM tk WHERE len(t) >= 3 AND doc_id % 7 <> 0),
        |tri AS (SELECT p2, p1, w, count(*) AS c3 FROM ctr GROUP BY 1, 2, 3),
        |ctx3 AS (SELECT p2, p1, sum(c3) AS n3 FROM tri GROUP BY 1, 2),
        |cbr AS (SELECT unnest(t[1:len(t)-1]) AS p1, unnest(t[2:len(t)]) AS w
        |        FROM tk WHERE len(t) >= 2 AND doc_id % 7 <> 0),
        |bi AS (SELECT p1, w, count(*) AS c2 FROM cbr GROUP BY 1, 2),
        |ctx2 AS (SELECT p1, sum(c2) AS n2 FROM bi GROUP BY 1),
        |uni AS (SELECT w, count(*) AS c1
        |        FROM (SELECT unnest(t) AS w FROM tk WHERE doc_id % 7 <> 0)
        |        GROUP BY 1),
        |ntot AS (SELECT sum(c1) AS n FROM uni),
        |btr AS (SELECT doc_id, unnest(t[1:len(t)-2]) AS p2,
        |               unnest(t[2:len(t)-1]) AS p1, unnest(t[3:len(t)]) AS w
        |        FROM tk WHERE len(t) >= 3 AND doc_id % 7 = 0),
        |dtf AS (SELECT doc_id, p2, p1, w, count(*) AS c FROM btr GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT d.doc_id, d.c,
        |  CASE WHEN tri.c3 IS NOT NULL THEN tri.c3::DOUBLE / ctx3.n3
        |       WHEN bi.c2 IS NOT NULL THEN 0.4 * bi.c2::DOUBLE / ctx2.n2
        |       ELSE 0.4 * 0.4 * greatest(coalesce(uni.c1, 0), 1)::DOUBLE
        |            / (SELECT n FROM ntot) END AS s
        |  FROM dtf d
        |  LEFT JOIN tri ON d.p2 = tri.p2 AND d.p1 = tri.p1 AND d.w = tri.w
        |  LEFT JOIN ctx3 ON d.p2 = ctx3.p2 AND d.p1 = ctx3.p1
        |  LEFT JOIN bi ON d.p1 = bi.p1 AND d.w = bi.w
        |  LEFT JOIN ctx2 ON d.p1 = ctx2.p1
        |  LEFT JOIN uni ON d.w = uni.w)
        |SELECT doc_id, sum(c)::BIGINT AS n_trans,
        |  round(-sum(c * ln(s)) / sum(c), 6) AS nll,
        |  round(exp(-sum(c * ln(s)) / sum(c)), 2) AS ppl
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ta_perplexity" ->
      s"""WITH $sqlPerplexityCte
        |SELECT doc_id, n_trans, nll, ppl FROM pplt ORDER BY doc_id""".stripMargin,

    "ta_kneser_ney" ->
      s"""WITH $sqlKneserNeyCte
        |SELECT doc_id, n_trans, nll, ppl FROM knt ORDER BY doc_id""".stripMargin,

    // the full KN formula with LEFT joins + both fallback floors — the
    // probe's provable contract (fit on stored docs, score the batch)
    "ta_kn_probe" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
        |tr AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS w
        |       FROM tk WHERE len(t) >= 2 AND doc_id % 101 = 1),
        |bigc AS (SELECT prev, w, count(*) AS cbw FROM tr GROUP BY 1, 2),
        |prevc AS (SELECT prev, sum(cbw) AS cp, count(*) AS n1fw FROM bigc GROUP BY 1),
        |contc AS (SELECT w, count(*) AS n1bw FROM bigc GROUP BY 1),
        |btot AS (SELECT count(*) AS b FROM bigc),
        |btr AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS prev, unnest(t[2:len(t)]) AS w
        |        FROM tk WHERE len(t) >= 2 AND doc_id % 7 = 0),
        |dtf AS (SELECT doc_id, prev, w, count(*) AS c FROM btr GROUP BY 1, 2, 3),
        |sc AS (SELECT d.doc_id, d.c,
        |  CASE WHEN p.cp IS NULL
        |       THEN greatest(coalesce(cc.n1bw, 0), 1)::DOUBLE / (SELECT b FROM btot)
        |       ELSE (greatest(coalesce(b.cbw, 0) - 0.75, 0)
        |             + 0.75 * p.n1fw * greatest(coalesce(cc.n1bw, 0), 1)::DOUBLE
        |               / (SELECT b FROM btot)) / p.cp END AS s
        |  FROM dtf d
        |  LEFT JOIN bigc b ON d.prev = b.prev AND d.w = b.w
        |  LEFT JOIN prevc p ON d.prev = p.prev
        |  LEFT JOIN contc cc ON d.w = cc.w)
        |SELECT doc_id, sum(c)::BIGINT AS n_trans,
        |  round(-sum(c * ln(s)) / sum(c), 6) AS nll,
        |  round(exp(-sum(c * ln(s)) / sum(c)), 2) AS ppl
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ta_source_vocab" ->
      s"""WITH tk AS (SELECT source, $sqlToks AS t FROM documents),
        |uni AS (SELECT source, count(*) AS n_tokens,
        |          count(DISTINCT w) AS d_uni
        |        FROM (SELECT source, unnest(t) AS w FROM tk)
        |        GROUP BY source),
        |bi AS (SELECT source, count(*) AS n_bigrams,
        |         count(DISTINCT prev || ' ' || w) AS d_bi
        |       FROM (SELECT source, unnest(t[1:len(t)-1]) AS prev,
        |                    unnest(t[2:len(t)]) AS w
        |             FROM tk WHERE len(t) >= 2)
        |       GROUP BY source)
        |SELECT source, n_tokens::BIGINT AS n_tokens, d_uni::BIGINT AS d_uni,
        |  round(d_uni::DOUBLE / n_tokens, 6) AS distinct1,
        |  coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
        |  coalesce(d_bi, 0)::BIGINT AS d_bi,
        |  CASE WHEN n_bigrams > 0
        |       THEN round(d_bi::DOUBLE / n_bigrams, 6) END AS distinct2
        |FROM uni LEFT JOIN bi USING (source) ORDER BY source""".stripMargin,

    "ta_nb_quality" -> sqlNbQuality,

    "ta_zipf" ->
      s"""WITH freq AS (SELECT w, count(*) AS c
        |             FROM (SELECT unnest($sqlToks) AS w FROM documents)
        |             GROUP BY w),
        |top AS (SELECT w, c FROM freq ORDER BY c DESC, w LIMIT 1000),
        |ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank
        |           FROM top)
        |SELECT count(*)::BIGINT AS n_terms,
        |  round(regr_slope(ln(c), ln(rank)), 6) AS zipf_slope,
        |  round(regr_r2(ln(c), ln(rank)), 6) AS zipf_r2
        |FROM ranked""".stripMargin,

    // the corpus-wide novelty SQL restricted to batch docs — the
    // probe's provable contract (df stays corpus-wide)
    "ta_novelty_probe" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
        |sh AS (SELECT doc_id,
        |         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
        |                               for i in range(1, len(t) - 1)])) AS sg
        |       FROM tk WHERE len(t) >= 3),
        |dfv AS (SELECT sg, count(*) AS df FROM sh GROUP BY sg)
        |SELECT doc_id, count(*)::BIGINT AS n_shingles,
        |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
        |  round(avg(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty
        |FROM sh JOIN dfv USING (sg)
        |WHERE doc_id % 7 = 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ta_novelty" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
        |sh AS (SELECT doc_id,
        |         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
        |                               for i in range(1, len(t) - 1)])) AS sg
        |       FROM tk WHERE len(t) >= 3),
        |dfv AS (SELECT sg, count(*) AS df FROM sh GROUP BY sg)
        |SELECT doc_id, count(*)::BIGINT AS n_shingles,
        |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
        |  round(avg(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty
        |FROM sh JOIN dfv USING (sg)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ta_tfidf_knn" ->
      s"""WITH $tfidfVecsCte,
        |q AS (SELECT doc_id AS query_id, emb AS qe FROM vecs WHERE doc_id < 3),
        |dist AS (SELECT query_id, v.doc_id,
        |           1.0 - list_cosine_similarity(v.emb, qe) AS dist
        |         FROM vecs v, q),
        |r AS (SELECT query_id, doc_id, dist,
        |        row_number() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rank
        |      FROM dist)
        |SELECT query_id, rank, doc_id, CAST(dist AS FLOAT) AS dist
        |FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    "ta_pii_redact" ->
      """WITH t AS (SELECT c_custkey,
        |  'contact ' || c_name || ' <user' || c_custkey || '@example.com> or +1-' ||
        |  lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0') || '-555-' ||
        |  lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
        |  ' from 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.1 segment ' ||
        |  c_mktsegment AS x
        |  FROM customer)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(x,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(x,
        |    '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(x,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  md5(regexp_replace(regexp_replace(regexp_replace(x,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS sig
        |FROM t ORDER BY c_custkey""".stripMargin,

    "ta_tokens" ->
      s"""SELECT doc_id,
         |  len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_ws,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
         |  len(list_distinct($sqlToks)) AS n_uniq
         |FROM documents ORDER BY doc_id""".stripMargin,

    "ta_quality" ->
      s"""WITH base AS (SELECT doc_id, text, $sqlToks AS t FROM documents),
         |m AS (SELECT doc_id, len(t) AS n_tok,
         |        ${sqlHits("en")} AS n_stop,
         |        length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         |        length(text) AS n_chars
         |      FROM base)
         |SELECT doc_id, n_tok,
         |  n_stop::DOUBLE / n_tok AS stop_ratio,
         |  alpha::DOUBLE / n_chars AS alpha_ratio,
         |  0.5 * (n_stop::DOUBLE / n_tok) + 0.3 * (alpha::DOUBLE / n_chars)
         |    + 0.2 * least(1.0, n_tok::DOUBLE / 50.0) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,

    "ta_langid" ->
      s"""WITH base AS (SELECT doc_id, lang, $sqlToks AS t FROM documents),
         |m AS (SELECT doc_id, lang, len(t) AS n,
         |        ${sqlHits("en")}::DOUBLE / len(t) AS en_score,
         |        ${sqlHits("de")}::DOUBLE / len(t) AS de_score,
         |        ${sqlHits("es")}::DOUBLE / len(t) AS es_score,
         |        ${sqlHits("fr")}::DOUBLE / len(t) AS fr_score
         |      FROM base)
         |SELECT doc_id, lang AS labeled_lang, en_score, de_score, es_score, fr_score,
         |  CASE WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score THEN 'en'
         |       WHEN de_score >= es_score AND de_score >= fr_score THEN 'de'
         |       WHEN es_score >= fr_score THEN 'es'
         |       ELSE 'fr' END AS pred
         |FROM m ORDER BY doc_id""".stripMargin,

    "ta_token_stats" ->
      s"""WITH tf AS (SELECT lang, unnest($sqlToks) AS term FROM documents),
         |c AS (SELECT lang, term, count(*) AS cnt FROM tf GROUP BY 1, 2),
         |r AS (SELECT lang, term, cnt,
         |        row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rank
         |      FROM c)
         |SELECT lang, rank, term, cnt FROM r WHERE rank <= 10
         |ORDER BY lang, rank""".stripMargin,

    "ta_fingerprint" ->
      s"""WITH base AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |sh AS (SELECT doc_id,
         |         CASE WHEN len(t) >= 5
         |              THEN list_distinct(list_transform(range(1, len(t)-3),
         |                     i -> array_to_string(t[i:i+4], ' ')))
         |              ELSE [] END AS s
         |       FROM base)
         |SELECT doc_id, list_min(list_transform(s, x -> md5(x))) AS fp,
         |  len(s) AS n_shingles
         |FROM sh ORDER BY doc_id""".stripMargin,

    "ta_keywords" ->
      s"""WITH base AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf
         |       FROM (SELECT doc_id, unnest(t) AS term FROM base)
         |       GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n FROM documents),
         |sc AS (SELECT doc_id, term, tf, df, tf * ln(n::DOUBLE / df) AS tfidf
         |       FROM tf JOIN dfq USING (term) CROSS JOIN n),
         |r AS (SELECT doc_id, term, tf, df, tfidf,
         |        row_number() OVER (PARTITION BY doc_id
         |          ORDER BY tfidf DESC, term) AS rank
         |      FROM sc)
         |SELECT doc_id, rank, term, tf, df, round(tfidf, 6) AS tfidf
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "ta_corpus_stats" ->
      s"""WITH base AS (SELECT lang, $sqlToks AS t, n_chars FROM documents),
         |stats AS (SELECT lang, count(*) AS n_docs,
         |    CAST(sum(len(t)) AS BIGINT) AS total_tok,
         |    CAST(min(len(t)) AS BIGINT) AS min_tok,
         |    CAST(max(len(t)) AS BIGINT) AS max_tok,
         |    round(avg(n_chars), 2) AS avg_chars
         |  FROM base GROUP BY lang),
         |v AS (SELECT lang, count(DISTINCT term) AS vocab
         |  FROM (SELECT lang, unnest(t) AS term FROM base) GROUP BY lang)
         |SELECT s.lang, n_docs, total_tok, min_tok, max_tok, avg_chars, vocab
         |FROM stats s JOIN v USING (lang) ORDER BY lang""".stripMargin,

    "ta_repetition" ->
      s"""WITH base AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |b AS (SELECT doc_id, t, len(t) AS n,
         |        CASE WHEN len(t) >= 2
         |             THEN list_transform(range(1, len(t)),
         |                    i -> array_to_string(t[i:i+1], ' '))
         |             ELSE [] END AS bi
         |      FROM base)
         |SELECT doc_id, n AS n_tok,
         |  len(list_distinct(t))::DOUBLE / n AS uniq_ratio,
         |  list_max(list_transform(list_distinct(t),
         |    w -> len(list_filter(t, x -> x = w))))::DOUBLE / n AS top_word_frac,
         |  CASE WHEN n >= 2
         |       THEN list_max(list_transform(list_distinct(bi),
         |              g -> len(list_filter(bi, x -> x = g))))::DOUBLE / (n - 1)
         |       ELSE 0.0 END AS top_bigram_frac
         |FROM b ORDER BY doc_id""".stripMargin,

    "ta_gopher_rules" ->
      s"""WITH base AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |m AS (SELECT doc_id, len(t) AS n_tok,
         |        list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t)
         |          AS mean_len,
         |        len(list_filter(t, x -> regexp_matches(x, '[a-z]')))::DOUBLE
         |          / len(t) AS alpha_frac,
         |        ${sqlHits("en")} AS n_stop
         |      FROM base)
         |SELECT doc_id, n_tok, mean_len, alpha_frac, n_stop,
         |  (n_tok BETWEEN 5 AND 400) AND mean_len >= 3.0 AND mean_len <= 10.0
         |    AND alpha_frac >= 0.8 AND n_stop >= 2 AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
  )
}
