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
      // Single pass: hash each token once to a bucket, then histogram with
      // an aggregate fold (dim int-ops per token). The lambda-binding trick
      // (transform over a 1-element array) makes Catalyst evaluate the
      // counts subtree once instead of re-deriving it for norm + divide.
      val buckets = transform(graft.operators.TextStats.tokens(text),
        t => pmod(xxhash64(t), lit(dim)).cast("int"))
      val counts = aggregate(buckets,
        array_repeat(lit(0), dim),
        (acc, b) => transform(acc, (x, i) => when(i === b, x + 1).otherwise(x)))
      element_at(transform(array(counts), c =>
        transform(c, x => (x / sqrt(aggregate(c, lit(0.0d),
          (a, v) => a + v.cast("double") * v))).cast("float"))), 1)
    }
  }

  val registry: Map[String, EmbeddingFunction] = Seq(
    new HashedBow(64), new HashedBow(128)
  ).map(f => f.name -> f).toMap
}
