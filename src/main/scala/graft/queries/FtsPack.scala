package graft.queries

import graft.Tables
import graft.operators.Fts
import graft.sources.CollectionStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trigram-FTS surface over `documents` — the reference's full-text
  * segment queried through the 3-stage pipeline (candidates → intersect →
  * verify), with the plain-scan twin kept as the bench baseline.
  *
  * Scale note: at sf0.1 the corpus is ~1.5 MB, so the scan twin is pure
  * fixed job overhead (~0.25 s) and wall-clock cannot distinguish the
  * paths; the scale-relevant metric is WORK — the indexed verify touches
  * only the ~29 candidate rows via a pushed id filter (FtsSpec asserts
  * `In(doc_id` reaches the parquet scan) instead of regex/contains over
  * all 5000 documents. At 100 TB that ratio is the whole query.
  */
object FtsPack extends QueryPack {

  private val needle = "sort merge"
  private val pattern = "sort merge.*scan"
  // alternation-bearing pattern: candidates come from the literal DNF
  // ((sort merge ∧ join) ∪ (hash join)) answered from the trigram index
  private val altPattern = "(sort merge|hash) join"

  private def served(s: SparkSession, d: String): String =
    CollectionStore.ftsServing(Tables.documents(s, d), CollectionStore.indexRoot(d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stage-pruned literal search: posting intersect → contains verify.
    "ft_contains_indexed" -> { (s, d) =>
      Fts.containsSearch(Tables.documents(s, d), served(s, d), needle)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // The same predicate as a full scan — bench baseline for the index.
    "ft_contains_scan" -> { (s, d) =>
      Tables.documents(s, d).filter(col("text").contains(needle))
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Regex routed through the index via its mandatory literal, verified
    // with the real rlike.
    "ft_regex_indexed" -> { (s, d) =>
      Fts.regexSearch(Tables.documents(s, d), served(s, d), pattern)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Alternation regex through the index: the literal-DNF analysis
    // (RegexPrefilter.literalDnf, the reference's literal_expr.rs) turns
    // the pattern into (sort merge ∧ join) ∪ (hash ∧ join) candidate
    // sets from the SAME trigram postings, then the real rlike verifies.
    "ft_regex_alt_indexed" -> { (s, d) =>
      Fts.regexSearch(Tables.documents(s, d), served(s, d), altPattern)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Hybrid where_document + KNN (the reference's pre-filtered vector
    // query with a full-text where_document leaf): FTS candidates feed an
    // id semi-join on the embedding table, exact KNN runs over survivors
    // only. At 100 TB the FTS index prunes the KNN candidate scan to the
    // matching slice — filter-first ordering, `knn_filter.rs`.
    "ft_knn_hybrid" -> { (s, d) =>
      val cand = Fts.containsSearch(Tables.documents(s, d), served(s, d), needle)
        .select(col("doc_id").as("offset_id"))
      val survivors = Tables.embeddings(s, d)
        .select(col("vec_id").as("offset_id"), col("embedding"))
        .join(cand, Seq("offset_id"))
      val queries = Tables.embeddings(s, d).filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      graft.operators.Knn.exact(survivors, queries, k = 5, "cosine")
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("offset_id"))
        .orderBy(col("query_id"), col("rank"))
    },
  )

  val oracle: Map[String, String] = Map(
    "ft_contains_indexed" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE contains(text, '$needle') ORDER BY doc_id""".stripMargin,

    "ft_contains_scan" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE contains(text, '$needle') ORDER BY doc_id""".stripMargin,

    "ft_regex_indexed" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE regexp_matches(text, '$pattern') ORDER BY doc_id""".stripMargin,

    "ft_regex_alt_indexed" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE regexp_matches(text, '$altPattern') ORDER BY doc_id""".stripMargin,

    "ft_knn_hybrid" ->
      s"""WITH cand AS (SELECT doc_id FROM documents WHERE contains(text, '$needle')),
         |e AS (SELECT vec_id, embedding FROM embeddings JOIN cand ON vec_id = doc_id),
         |q AS (SELECT vec_id AS query_id, embedding AS qe
         |      FROM embeddings WHERE vec_id < 3),
         |dd AS (SELECT query_id, vec_id,
         |         1.0 - list_cosine_similarity(embedding, qe) AS dist
         |       FROM e, q),
         |r AS (SELECT query_id, vec_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
         |      FROM dd)
         |SELECT query_id, rank, dist, vec_id AS offset_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
  )
}
