package graft.queries

import graft.Tables
import graft.functions.SparseOps
import graft.operators.TextStats
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse retrieval surface: IDF (`operators/idf.rs:24-56`), BM25 scoring
  * (`chromadb/utils/embedding_functions/bm25_embedding_function.py`), and
  * sparse-dot KNN (`rust/index/src/sparse/reader.rs`) over `documents`.
  *
  * Sparse vectors here are term-frequency vectors with hash-assigned ids
  * (`term_id = xxhash64(term)` — unbounded vocabulary, no global
  * dictionary sort, no single-partition window). Values are integer tf, so
  * f32 accumulation in [[SparseOps.sparseDot]] is exact and matches the
  * DuckDB oracle's integer sums bit-for-bit; scores depend only on term
  * equality, so hashed ids leave results unchanged.
  *
  * ln() differs by <=1 ulp across libm implementations → idf/bm25 scores
  * are rounded to 6 places on both sides.
  */
object SparsePack extends QueryPack {

  private val queryTerms = Seq("query", "data", "filter", "spark")

  /** (doc_id, term, tf) exploded token frequencies. */
  private def termFreqs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Idf operator: corpus document frequencies → BM25-style idf.
    "sp_idf" -> { (s, d) =>
      val n = Tables.documents(s, d).count()
      termFreqs(s, d)
        .groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("idf", round(
          log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6))
        .filter(col("df") >= 10)
        .orderBy(col("term"))
    },

    // BM25 ranking of documents for a fixed term query (k1=1.2, b=0.75).
    // Shuffle-free formulation: the query's term set is tiny and known, so
    // per-doc tf for each query term is array algebra over the token array
    // (codegen'd higher-order filter) — no corpus-wide explode/groupBy.
    // Every corpus scalar the formula needs (N, avgdl, per-term df) folds
    // into ONE single-row aggregate, broadcast into the scoring scan; the
    // top-20 is a TakeOrdered. Two narrow scans total, zero wide shuffles,
    // zero driver actions — at 100 TB the only costs are the scans
    // themselves (persist `perDoc` to make it one).
    "sp_bm25_rank" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val toks = docs
        .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
        .withColumn("dl", size(col("toks")))
      val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
        size(filter(col("toks"), x => x === t)).as(s"tf$i")
      }
      val perDoc = toks.select(col("doc_id") +: col("dl") +: tfCols: _*)
      // avgdl over docs with >=1 token only, matching the oracle's dl table
      // (derived from freq, which has no rows for empty docs).
      val statAggs = count(lit(1)).as("n") +:
        avg(when(col("dl") > 0, col("dl"))).as("avgdl") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
      val k1 = 1.2; val b = 0.75
      val contribs = queryTerms.indices.map { i =>
        val idf = log(
          (col("n").cast("double") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
        when(col(s"tf$i") > 0,
          idf * (col(s"tf$i") * lit(k1 + 1)) /
            (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .otherwise(lit(0.0))
      }
      val hits = queryTerms.indices.map(i => when(col(s"tf$i") > 0, 1L).otherwise(0L))
      perDoc.crossJoin(broadcast(stats))
        .withColumn("n_terms", hits.reduce(_ + _))
        .filter(col("n_terms") > 0)
        .select(col("doc_id"),
          round(contribs.reduce(_ + _), 6).as("bm25"), col("n_terms"))
        .orderBy(desc("bm25"), col("doc_id"))
        .limit(20)
    },

    // Sparse KNN: top-20 docs by sparse dot against the query's tf vector,
    // through the codegen'd merge-intersection SparseDot expression.
    // Unbounded-vocabulary ids: term_id = xxhash64(term) — no global
    // dictionary, no single-partition sort window, and the query-side ids
    // are constant-folded literals (zero driver round-trips). Scores only
    // depend on term EQUALITY, so hashed ids leave results unchanged.
    "sp_sparse_knn" -> { (s, d) =>
      val tf = termFreqs(s, d).withColumn("term_id", xxhash64(col("term")))
      val docVecs = tf
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("term_id"), col("tf")))).as("p"))
        .select(col("doc_id"),
          col("p.term_id").as("indices"),
          col("p.tf").cast("array<float>").as("values"))
      val qi = array_sort(array(queryTerms.map(t => xxhash64(lit(t))): _*))
      val qv = array(queryTerms.map(_ => lit(1.0f)): _*)
      docVecs
        .select(col("doc_id"),
          SparseOps.sparseDot(col("indices"), col("values"), qi, qv).as("score"))
        .filter(col("score") > 0)
        .orderBy(desc("score"), col("doc_id"))
        .limit(20)
    },
    // Same top-20 as sp_sparse_knn, but through the MaxScore dynamic-
    // pruning operator (document-at-a-time with block-max upper-bound
    // skipping — the reference's sparse/maxscore.rs). Exact → shares the
    // same oracle. The one collect pulls 4 hashed query ids from a
    // single-row local relation, not from data.
    "sp_sparse_knn_maxscore" -> { (s, d) =>
      val tf = termFreqs(s, d).withColumn("term_id", xxhash64(col("term")))
      val postings = tf
        .select(col("term_id"), col("doc_id"), col("tf").cast("float").as("w"))
      val qIds = s.range(1)
        .select(queryTerms.map(t => xxhash64(lit(t))): _*)
        .collect()(0)
      val q = (0 until queryTerms.size).map(i => qIds.getLong(i) -> 1.0f)
      graft.operators.MaxScore.topk(postings, q, k = 20)
        .select(col("doc_id"), col("score").cast("float").as("score"))
        .orderBy(desc("score"), col("doc_id"))
    },
  )

  private val qTermsSql = queryTerms.map(t => s"'$t'").mkString(",")
  private val tfSql =
    """tf AS (
      |  SELECT doc_id, unnest(t) AS term FROM
      |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
      |       x -> x <> '') AS t FROM documents)),
      |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sp_idf" ->
      s"""WITH $tfSql
         |SELECT term, count(*) AS df,
         |  round(ln(((SELECT count(*) FROM documents) - count(*) + 0.5)
         |           / (count(*) + 0.5) + 1.0), 6) AS idf
         |FROM freq GROUP BY term HAVING count(*) >= 10 ORDER BY term""".stripMargin,

    "sp_bm25_rank" ->
      s"""WITH $tfSql,
         |dl AS (SELECT doc_id, sum(tf) AS dl FROM freq GROUP BY 1),
         |stats AS (SELECT avg(dl) AS avgdl FROM dl),
         |n AS (SELECT count(*) AS n FROM documents),
         |idf AS (SELECT term, count(*) AS df,
         |          ln(((SELECT n FROM n) - count(*) + 0.5) / (count(*) + 0.5) + 1.0) AS idf
         |        FROM freq WHERE term IN ($qTermsSql) GROUP BY term)
         |SELECT f.doc_id,
         |  round(sum(idf.idf * (f.tf * 2.2)
         |    / (f.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))), 6) AS bm25,
         |  count(*) AS n_terms
         |FROM freq f JOIN idf ON f.term = idf.term JOIN dl ON f.doc_id = dl.doc_id
         |WHERE f.term IN ($qTermsSql)
         |GROUP BY f.doc_id ORDER BY bm25 DESC, f.doc_id LIMIT 20""".stripMargin,

    "sp_sparse_knn" ->
      s"""WITH $tfSql
         |SELECT doc_id, CAST(sum(tf) AS FLOAT) AS score
         |FROM freq WHERE term IN ($qTermsSql)
         |GROUP BY doc_id HAVING sum(tf) > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "sp_sparse_knn_maxscore" ->
      s"""WITH $tfSql
         |SELECT doc_id, CAST(sum(tf) AS FLOAT) AS score
         |FROM freq WHERE term IN ($qTermsSql)
         |GROUP BY doc_id HAVING sum(tf) > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
  )
}
