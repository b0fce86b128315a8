package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY §2 (one
  * entry per operator), organized as [[graft.queries.QueryPack]]s by area.
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-match gate;
  * queries absent from it are approximate/non-SQL ops gated in ScalaTest
  * instead (recall / subset invariants).
  */
object SparkEntry {

  val packs: Seq[QueryPack] = Seq(
    Relational,
    ChromaCore,
    VectorSearch,
    WritePath,
    TextAnalysis,
    DedupPack,
    StreamingPack,
    SparsePack,
    MultimodalPack,
    FacadePack,
    PipelinePack,
    FtsPack,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The signature Chroma shape: hybrid Search plan end-to-end — JSON-DSL
    * pre-filter, two KNN leaves, rank fusion, grouped top-k. */
  def entry(spark: SparkSession): DataFrame =
    queries("fc_search_grouped")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
