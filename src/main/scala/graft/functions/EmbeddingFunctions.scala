package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's embedding-function plug point — the reference has 30+
  * pluggable `EmbeddingFunction`s (`chromadb/utils/embedding_functions/`,
  * protocol `chromadb/api/types.py`). Here it's a trait from Column to
  * Column so implementations compose into any Catalyst plan; heavy model
  * inference belongs in a `mapPartitions` batch (model loaded once per
  * partition), light deterministic featurizers can stay whole-stage.
  */
trait EmbeddingFunction {
  def name: String
  def dim: Int
  /** text column → ARRAY<FLOAT> embedding column */
  def embed(text: Column): Column
}

object EmbeddingFunctions {

  /** Deterministic hashed bag-of-words embedder (a real, useful baseline —
    * feature hashing a la HashingTF — and the stand-in for model-based
    * functions, which are not available in this container). L2-normalized.
    */
  final class HashedBow(val dim: Int = 64) extends EmbeddingFunction {
    val name = s"hashed_bow_$dim"
    def embed(text: Column): Column = {
      val toks = graft.operators.TextStats.tokens(text)
      // counts[i] = #tokens hashing to bucket i (xxhash64 → bucket)
      val counts = array((0 until dim).map(b =>
        size(filter(toks, t => pmod(xxhash64(t), lit(dim)) === b))): _*)
      val norm = sqrt(aggregate(counts, lit(0.0d), (acc, x) => acc + x * x))
      transform(counts, c => (c / norm).cast("float"))
    }
  }

  val registry: Map[String, EmbeddingFunction] = Seq(
    new HashedBow(64), new HashedBow(128)
  ).map(f => f.name -> f).toMap
}
