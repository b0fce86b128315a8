package graft.queries

import graft.Tables
import graft.api.Collection
import graft.model.WhereParser
import graft.operators.Rank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end Chroma API facade: the full Knn and Search plans driven
  * through [[Collection]] with filters arriving as the JSON `$`-DSL
  * (parsed by [[WhereParser]]), exactly as a client would send them.
  */
object FacadePack extends QueryPack {

  /** embeddings.parquet as a collection: meta_int.label always present,
    * meta_bool.even present iff vec_id % 3 != 0 (missing-key semantics).
    */
  def vecCollection(s: SparkSession, d: String): Collection = {
    import s.implicits._
    val df = Tables.embeddings(s, d).select(
      concat(lit("vec-"), $"vec_id").as("id"),
      $"vec_id".as("offset_id"),
      $"embedding",
      lit(null).cast("string").as("document"),
      lit(null).cast("string").as("uri"),
      map_from_arrays(array(), array()).cast("map<string,string>").as("meta_str"),
      map(lit("label"), $"label".cast("long")).as("meta_int"),
      map_from_arrays(array(), array()).cast("map<string,double>").as("meta_float"),
      when($"vec_id" % 3 =!= 0, map(lit("even"), ($"vec_id" % 2 === 0)))
        .otherwise(map_from_arrays(array(), array()).cast("map<string,boolean>"))
        .as("meta_bool"))
    new Collection(df)
  }

  private def queryVecs(s: SparkSession, d: String, n: Int): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Knn plan with a JSON-DSL pre-filter (filter-before-KNN order).
    "fc_query_filtered" -> { (s, d) =>
      val where = WhereParser.parse(
        """{"$and": [{"label": {"$ne": 3}}, {"even": {"$eq": true}}]}""")
      vecCollection(s, d)
        .query(queryVecs(s, d, 3), k = 5, where = Some(where))
        .select(col("query_id"), col("rank"), col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Search plan: two KNN leaves, weighted-sum rank, top-1 per label.
    "fc_search_grouped" -> { (s, d) =>
      import Rank._
      val q0 = queryVecs(s, d, 1)
      val q1 = queryVecs(s, d, 2).filter(col("query_id") === 1)
      vecCollection(s, d)
        .search(
          leaves = Seq((q0, 50, "cosine"), (q1, 50, "cosine")),
          rank = Sum(Seq(Mul(Seq(Val(0.6), Leaf(0, default = 2.0))),
                         Mul(Seq(Val(0.4), Leaf(1, default = 2.0))))),
          groupBy = Some((Seq(element_at(col("meta_int"), "label")), 1)),
          limit = Some(10),
          include = Seq("meta_int"))
        .select(col("id"), col("#score").as("score"),
          element_at(col("meta_int"), "label").as("label"))
        .orderBy(col("score"), col("id"))
    },
  )

  val oracle: Map[String, String] = Map(
    "fc_query_filtered" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 3),
        |cand AS (SELECT * FROM embeddings
        |         WHERE label <> 3 AND vec_id % 3 <> 0 AND vec_id % 2 = 0),
        |d AS (SELECT query_id, vec_id,
        |        1.0 - list_cosine_similarity(embedding, qe) AS dist
        |      FROM cand, q),
        |r AS (SELECT query_id, vec_id, dist,
        |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
        |      FROM d)
        |SELECT query_id, rank, dist, 'vec-'||vec_id AS id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "fc_search_grouped" ->
      """WITH q0 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |q1 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
        |l0 AS (SELECT vec_id, dist FROM
        |        (SELECT vec_id, 1.0 - list_cosine_similarity(embedding, q0.qe) AS dist,
        |           row_number() OVER (ORDER BY (1.0 - list_cosine_similarity(embedding, q0.qe)), vec_id) AS rn
        |         FROM embeddings, q0) WHERE rn <= 50),
        |l1 AS (SELECT vec_id, dist FROM
        |        (SELECT vec_id, 1.0 - list_cosine_similarity(embedding, q1.qe) AS dist,
        |           row_number() OVER (ORDER BY (1.0 - list_cosine_similarity(embedding, q1.qe)), vec_id) AS rn
        |         FROM embeddings, q1) WHERE rn <= 50),
        |f AS (SELECT coalesce(l0.vec_id, l1.vec_id) AS vec_id,
        |        0.6 * coalesce(l0.dist::DOUBLE, 2.0) + 0.4 * coalesce(l1.dist::DOUBLE, 2.0) AS score
        |      FROM l0 FULL OUTER JOIN l1 ON l0.vec_id = l1.vec_id),
        |j AS (SELECT f.vec_id, f.score, e.label::BIGINT AS label
        |      FROM f JOIN embeddings e ON f.vec_id = e.vec_id),
        |g AS (SELECT vec_id, score, label,
        |        row_number() OVER (PARTITION BY label ORDER BY score, vec_id) AS rn
        |      FROM j)
        |SELECT 'vec-'||vec_id AS id, score, label FROM g WHERE rn = 1
        |ORDER BY score, id LIMIT 10""".stripMargin,
  )
}
