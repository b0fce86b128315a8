package graft.queries

import graft.Tables
import graft.api.Collection
import graft.model.Where
import graft.model.Where._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's core read surface (Count / Get plans + Where DSL) over a
  * collection view of the `documents` table.
  *
  * The collection view shreds metadata into typed maps with *deliberately
  * missing keys* (keyed off doc_id residues) so every query exercises the
  * reference's two-valued missing-key semantics
  * (`chromadb/test/property/test_filtering.py:32-84`):
  *
  *   - meta_str:  lang (always), source (iff doc_id % 4 != 0)
  *   - meta_int:  par = doc_id % 10 (always), n_chars (iff doc_id % 2 == 0)
  *   - meta_float: quality = n_chars/100.0 (iff doc_id % 3 != 0)
  *   - meta_bool: long = n_chars > 250 (iff doc_id % 5 != 0)
  *   - meta_str_arr: tags = [lang, source, 'tag'||doc_id%3] (always)
  *
  * The DuckDB oracles spell the same semantics out against the raw columns
  * (e.g. `$ne` on quality == `doc_id%3=0 OR quality <> v`), so a hash match
  * proves the compiled predicate implements Chroma's logic, not SQL NULLs.
  */
object ChromaCore extends QueryPack {

  /** documents.parquet → Chroma record schema (FIXTURES.md §1). */
  def docsCollection(s: SparkSession, d: String): Collection = {
    import s.implicits._
    val df = Tables.documents(s, d).select(
      concat(lit("doc-"), $"doc_id").as("id"),
      $"doc_id".as("offset_id"),
      $"text".as("document"),
      lit(null).cast("string").as("uri"),
      when($"doc_id" % 4 =!= 0,
        map(lit("lang"), $"lang", lit("source"), $"source"))
        .otherwise(map(lit("lang"), $"lang")).as("meta_str"),
      when($"doc_id" % 2 === 0,
        map(lit("par"), ($"doc_id" % 10).cast("long"), lit("n_chars"), $"n_chars"))
        .otherwise(map(lit("par"), ($"doc_id" % 10).cast("long"))).as("meta_int"),
      when($"doc_id" % 3 =!= 0, map(lit("quality"), $"n_chars" / 100.0))
        .otherwise(map_from_arrays(array(), array()).cast("map<string,double>")).as("meta_float"),
      when($"doc_id" % 5 =!= 0, map(lit("long"), $"n_chars" > 250))
        .otherwise(map_from_arrays(array(), array()).cast("map<string,boolean>")).as("meta_bool"),
      map(lit("tags"),
        array($"lang", $"source", concat(lit("tag"), ($"doc_id" % 3).cast("string"))))
        .as("meta_str_arr"))
    new Collection(df)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Count plan (plan.rs:34).
    "cc_count" -> { (s, d) => docsCollection(s, d).countDf },

    // Get: numeric range + string eq, with offset/limit paging by offset_id.
    "cc_get_range" -> { (s, d) =>
      docsCollection(s, d).get(
        where = Some(And(Seq(
          Cmp("n_chars", "$gte", VInt(100)),
          Cmp("n_chars", "$lt", VInt(400)),
          Cmp("lang", "$eq", VStr("en"))))),
        limit = Some(50), offset = 10, include = Seq("document"))
    },

    // Get: $ne + $nin — TRUE on missing keys (two-valued semantics).
    "cc_get_ne_missing" -> { (s, d) =>
      docsCollection(s, d).get(
        where = Some(And(Seq(
          Cmp("quality", "$ne", VFloat(2.0)),
          SetIn("source", Seq(VStr("src1"), VStr("src2")), negated = true)))),
        include = Seq("document"))
    },

    // Get: $or over bool-typed and int-typed keys; metadata-key projection.
    "cc_get_or_bool" -> { (s, d) =>
      docsCollection(s, d).get(
        where = Some(Or(Seq(
          Cmp("long", "$eq", VBool(true)),
          Cmp("par", "$lte", VInt(2))))),
        include = Seq("meta:lang"))
    },

    // Get: array-metadata $contains + document $contains.
    "cc_get_arr_contains" -> { (s, d) =>
      docsCollection(s, d).get(
        where = Some(And(Seq(
          ArrContains("tags", VStr("tag1"), negated = false),
          DocContains("filter", negated = false)))),
        include = Seq("document"))
    },

    // Get: document $regex + $not_contains.
    "cc_doc_regex" -> { (s, d) =>
      docsCollection(s, d).get(
        where = Some(And(Seq(
          DocRegex("sort (merge|scan)", negated = false),
          DocContains("join", negated = true)))),
        include = Seq("document"))
    },

    // Get with where_document routed through the served trigram index:
    // the mandatory $contains needle prunes to FTS candidates, the full
    // predicate (incl. the metadata leaf) verifies. Same result as the
    // plain scan — the oracle can't tell them apart, the plan can.
    "cc_get_indexed" -> { (s, d) =>
      val root = graft.sources.CollectionStore.ftsServing(
        graft.Tables.documents(s, d), graft.sources.CollectionStore.indexRoot(d))
      docsCollection(s, d).getIndexed(
        root,
        where = And(Seq(
          DocContains("sort merge", negated = false),
          Cmp("par", "$lte", VInt(6)))),
        include = Seq("document"))
    },

    // $or of document $contains served from the SAME index: the needle
    // DNF (Where.containsDnf) answers the disjunction as
    // ids('sort merge') ∪ ids('hash join') before the full predicate
    // (incl. the metadata leaf) verifies — the alternation case the old
    // single-needle prefilter had to full-scan.
    "cc_get_indexed_or" -> { (s, d) =>
      val root = graft.sources.CollectionStore.ftsServing(
        graft.Tables.documents(s, d), graft.sources.CollectionStore.indexRoot(d))
      docsCollection(s, d).getIndexed(
        root,
        where = And(Seq(
          Or(Seq(DocContains("sort merge", negated = false),
            DocContains("hash join", negated = false))),
          Cmp("par", "$lte", VInt(8)))),
        include = Seq("document"))
    },

    // Get: negated document $regex + positive $contains + negated array
    // $contains — the negation surface (metadata.rs:1775-1781) under the
    // same two-valued semantics.
    "cc_doc_not_regex" -> { (s, d) =>
      docsCollection(s, d).get(
        where = Some(And(Seq(
          DocRegex("sort (merge|scan)", negated = true),
          DocContains("filter", negated = false),
          ArrContains("tags", VStr("tag2"), negated = true)))),
        include = Seq("document"))
    },

    // Projection of several metadata keys (Select keys, operator.rs:1787-1794).
    "cc_projection_multi" -> { (s, d) =>
      docsCollection(s, d).get(
        where = Some(Cmp("par", "$eq", VInt(3))),
        include = Seq("document", "meta:quality", "meta:par"))
    },

    // Filter by explicit id list (query_ids, operator.rs:182-185).
    "cc_get_by_ids" -> { (s, d) =>
      docsCollection(s, d).get(
        where = Some(And(Seq(
          IdIn((0 to 100 by 7).map(i => s"doc-$i")),
          Cmp("lang", "$ne", VStr("zh"))))),
        include = Seq("document"))
    },

    // Unbounded paged export: the WHOLE collection walked in 64-row
    // pages through per-partition cursors — concatenated pages must
    // hash-match the oracle's row_number paging exactly, with no global
    // sort in the plan (PlanSpec gates the shape).
    "cc_get_page_walk" -> { (s, d) =>
      docsCollection(s, d).pagedExport(pageSize = 64)
        .select(col("page"), col("id"), col("document"))
    },
  )

  val oracle: Map[String, String] = Map(
    "cc_count" -> "SELECT count(*) AS n FROM documents",

    "cc_get_range" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE doc_id%2=0 AND n_chars>=100 AND n_chars<400 AND lang='en'
        |ORDER BY doc_id OFFSET 10 LIMIT 50""".stripMargin,

    "cc_get_ne_missing" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE (doc_id%3=0 OR n_chars/100.0 <> 2.0)
        |  AND (doc_id%4=0 OR source NOT IN ('src1','src2'))
        |ORDER BY doc_id""".stripMargin,

    "cc_get_or_bool" ->
      """SELECT 'doc-'||doc_id AS id, lang FROM documents
        |WHERE (doc_id%5<>0 AND n_chars>250) OR (doc_id%10) <= 2
        |ORDER BY doc_id""".stripMargin,

    "cc_get_arr_contains" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE doc_id%3=1 AND contains(text, 'filter')
        |ORDER BY doc_id""".stripMargin,

    "cc_doc_regex" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE regexp_matches(text, 'sort (merge|scan)')
        |  AND NOT contains(text, 'join')
        |ORDER BY doc_id""".stripMargin,

    "cc_doc_not_regex" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE NOT regexp_matches(text, 'sort (merge|scan)')
        |  AND contains(text, 'filter')
        |  AND doc_id%3<>2
        |ORDER BY doc_id""".stripMargin,

    "cc_get_indexed" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE contains(text, 'sort merge') AND doc_id%10 <= 6
        |ORDER BY doc_id""".stripMargin,

    "cc_get_indexed_or" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE (contains(text, 'sort merge') OR contains(text, 'hash join'))
        |  AND doc_id%10 <= 8
        |ORDER BY doc_id""".stripMargin,

    "cc_projection_multi" ->
      """SELECT 'doc-'||doc_id AS id, text AS document,
        |  CASE WHEN doc_id%3<>0 THEN (n_chars/100.0)::VARCHAR END AS quality,
        |  (doc_id%10)::VARCHAR AS par
        |FROM documents WHERE doc_id%10 = 3 ORDER BY doc_id""".stripMargin,

    "cc_get_by_ids" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE doc_id%7=0 AND doc_id<=100 AND lang<>'zh'
        |ORDER BY doc_id""".stripMargin,

    // offset_id = doc_id and ids are unique here, so (offset_id, id)
    // order is doc_id order; integer page = floor(position / 64)
    "cc_get_page_walk" ->
      """SELECT CAST(floor((row_number() OVER (ORDER BY doc_id) - 1)
        |    / 64.0) AS BIGINT) AS page,
        |  'doc-'||doc_id AS id, text AS document
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
