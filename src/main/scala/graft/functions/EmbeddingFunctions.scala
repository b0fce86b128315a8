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
  /** Query-side embedding — defaults to [[embed]], exactly the
    * reference protocol (`chromadb/api/types.py:854`: `embed_query`
    * falls back to `__call__`). Asymmetric models (E5/instructor-style
    * "passage:"/"query:" prefixes) override it; the read path
    * ([[graft.api.CollectionHandle.queryText]]) always embeds queries
    * through THIS, never through [[embed]].
    */
  def embedQuery(text: Column): Column = embed(text)
  /** Whole-DataFrame embed: append `out` derived from `textCol`. The
    * default rides [[EmbeddingFunctions.attachOnce]]; model-backed
    * functions override it with a batched `mapPartitions` runner (the
    * write path calls THIS, so heavy inference gets real batching while
    * expression functions keep their codegen plans).
    */
  def embedDf(df: DataFrame, textCol: String, out: String): DataFrame =
    EmbeddingFunctions.attachOnce(df, out, embed(col(textCol)))
}

/** Sparse counterpart — the reference's sparse embedding functions
  * (`chromadb/utils/embedding_functions/bm25_embedding_function.py`,
  * SPLADE et al.) emit `SparseVector`s; here the output is a
  * `STRUCT<indices ARRAY<BIGINT>, values ARRAY<FLOAT>>` with indices
  * sorted ascending — exactly the `meta_sparse` value shape, so the
  * output plugs straight into `Collection.sparseSearch`.
  */
trait SparseEmbeddingFunction {
  def name: String
  /** text column → sparse vector struct column */
  def embedSparse(text: Column): Column
  /** Query-side sparse embedding, defaulting to [[embedSparse]] — the
    * sparse half of the reference protocol (`chromadb/api/types.py:1512`).
    */
  def embedSparseQuery(text: Column): Column = embedSparse(text)
}

object EmbeddingFunctions {

  /** Attach a computed column so it is evaluated exactly ONCE per row.
    *
    * A bare `withColumn` leaves the expression open to `CollapseProject`,
    * which inlines a fresh copy into every downstream consumer — each
    * `getField`, every filter the optimizer pushes below the projection,
    * each sort key. For an interpreted higher-order-function tree (all
    * embedding functions here) that re-evaluation multiplies: the BM25
    * facade query measured ~40× the single-evaluation cost before this
    * barrier existed. The one-element `explode` is a `Generate` node the
    * optimizer never collapses through, so downstream operators see a
    * plain attribute. This mirrors the reference, which materializes
    * embeddings at write/compaction time rather than re-deriving them
    * inside the query plan.
    */
  def attachOnce(df: DataFrame, name: String, value: Column): DataFrame = {
    val keep = df.columns.map(df.col)
    df.select(keep :+ explode(array(value)).as(name): _*)
  }

  /** Deterministic hashed bag-of-words embedder (a real, useful baseline —
    * feature hashing a la HashingTF — and the stand-in for model-based
    * functions, which are not available in this container). L2-normalized.
    */
  final class HashedBow(val dim: Int = 64) extends EmbeddingFunction {
    val name = s"hashed_bow_$dim"
    // Single native-kernel pass (hash -> histogram -> L2 normalize):
    // the expression-tree formulation of the same fold evaluated ~dim
    // interpreted nodes per token; TextHash.hashedBow is one JVM loop.
    def embed(text: Column): Column =
      graft.functions.TextHash.hashedBow(
        graft.operators.TextStats.tokens(text), dim)
  }

  /** Hashed word-bigram embedder: adjacent token pairs feature-hashed
    * into `dim` buckets (multiset — repeated bigrams count), histogram
    * L2-normalized by the same native kernel as [[HashedBow]]. Captures
    * local word ORDER that unigram BoW is blind to ("new york times" vs
    * "times new york" embed apart); the standard cheap step up the
    * n-gram ladder before model-based functions.
    */
  final class HashedBigram(val dim: Int = 64) extends EmbeddingFunction {
    val name = s"hashed_bigram_$dim"
    def embed(text: Column): Column = {
      // bind the token array through a lambda slot: a direct reference
      // inside sequence/slice would re-tokenize per bigram (the
      // HashedCharNgram O(len²) trap)
      val bigrams = element_at(transform(
        array(graft.operators.TextStats.tokens(text)), t =>
          when(size(t) >= 2,
            transform(sequence(lit(1), size(t) - 1),
              i => concat_ws(" ", slice(t, i, lit(2)))))
            .otherwise(array().cast("array<string>"))), 1)
      graft.functions.TextHash.hashedBow(bigrams, dim)
    }
  }

  /** Hashed character-n-gram embedder (subword features a la fastText):
    * char n-grams of the lowercased text feature-hashed into `dim`
    * buckets, histogram L2-normalized. Robust to tokenization-hostile
    * text (code, URLs, CJK) where word-BoW degrades.
    */
  final class HashedCharNgram(val dim: Int = 64, n: Int = 3) extends EmbeddingFunction {
    val name = s"hashed_char${n}gram_$dim"
    def embed(text: Column): Column = {
      // `lower(text)` must be bound through a lambda slot: referencing it
      // directly inside the transform lambda re-lowercases the whole text
      // once per gram (O(len²) in the interpreted HOF path).
      val grams = flatten(transform(array(lower(text)), lowered =>
        transform(
          sequence(lit(1), greatest(length(lowered) - (n - 1), lit(0))),
          i => lowered.substr(i, lit(n)))))
      val buckets = transform(grams, g => pmod(xxhash64(g), lit(dim)).cast("int"))
      val counts = aggregate(buckets,
        array_repeat(lit(0), dim),
        (acc, b) => transform(acc, (x, i) => when(i === b, x + 1).otherwise(x)))
      element_at(transform(array(counts), c =>
        transform(c, x => (x / sqrt(aggregate(c, lit(0.0d),
          (a, v) => a + v.cast("double") * v))).cast("float"))), 1)
    }
  }

  /** Fast JL-transform embedder (Ailon & Chazelle 2006): feature-hash
    * tokens into a WIDE space, apply the seeded FWHT rotation, keep the
    * first `dim` coordinates. The wide hashed-BoW is sparse; the
    * orthonormal rotation spreads its mass, so the kept coordinates
    * approximate a dense Gaussian random projection at O(D log D) per
    * row instead of O(D·dim) — while inner products (hence cosines) are
    * preserved in expectation across the reduction.
    */
  final class FjltBow(val dim: Int = 64, wide: Int = 256) extends EmbeddingFunction {
    val name = s"fjlt_bow_$dim"
    def embed(text: Column): Column =
      slice(graft.functions.Rotation.fwhtRotate(
        graft.functions.TextHash.hashedBow(
          graft.operators.TextStats.tokens(text), wide)), 1, dim)
  }

  /** Deterministic text-statistics featurizer: 8 quality signals as a
    * dense vector — the embedding-function shape of the reference's
    * quality scoring, useful as classifier input at pipeline scale.
    * Not normalized (features carry magnitudes).
    */
  final class TextStatsFeatures extends EmbeddingFunction {
    val name = "text_stats_8"
    val dim = 8
    def embed(text: Column): Column = {
      val len = length(text).cast("double")
      val toks = graft.operators.TextStats.tokens(text)
      val nToks = size(toks).cast("double")
      def ratio(pattern: String): Column =
        (length(text) - length(regexp_replace(text, pattern, ""))).cast("double") /
          greatest(len, lit(1.0))
      array(Seq(
        log1p(len),
        ratio("[\\p{Punct}]"),
        ratio("[0-9]"),
        ratio("[A-Z]"),
        ratio("\\s"),
        nToks / greatest(len, lit(1.0)),                       // token density
        size(array_distinct(toks)).cast("double") /
          greatest(nToks, lit(1.0)),                           // type-token ratio
        len / greatest(nToks, lit(1.0))                        // avg token span
      ).map(_.cast("float")): _*)
    }
  }

  /** Asymmetric document/query embedding via instruction prefixes — the
    * E5 / instructor-model convention ("passage: " on the write path,
    * "query: " at search time) expressed as a wrapper over ANY dense
    * function, exercising the protocol's `embed_query` override point
    * (`chromadb/api/types.py:854`). Deterministic end-to-end: the
    * prefixes change the hashed token stream, so document and query
    * embeddings of the same text genuinely differ, exactly like the
    * models this surface exists for.
    */
  final class PrefixedEmbedding(base: EmbeddingFunction,
      docPrefix: String = "passage: ", queryPrefix: String = "query: ")
      extends EmbeddingFunction {
    val name = s"prefixed_${base.name}"
    val dim: Int = base.dim
    def embed(text: Column): Column =
      base.embed(concat(lit(docPrefix), text))
    override def embedQuery(text: Column): Column =
      base.embed(concat(lit(queryPrefix), text))
  }

  /** BM25 sparse embedding function — the doc-side BM25 term saturation of
    * `bm25_embedding_function.py` (fastembed Bm25: k1=1.2, b=0.75, fixed
    * avgdl constant; IDF belongs to the query side). Values quantize to
    * 1/1024 steps so the f32 sparse-dot kernel is bit-identical to a
    * double-computing oracle.
    */
  final class Bm25Sparse(k1: Double = 1.2, b: Double = 0.75,
      avgdl: Double = 256.0) extends SparseEmbeddingFunction {
    val name = "bm25_sparse"
    def embedSparse(text: Column): Column = {
      // Term frequencies by run-length over the SORTED token array —
      // O(n log n) per document. Two past performance bugs inform the
      // shape:
      //  - a per-distinct-token `filter(toks, _ === t)` recount is O(n²);
      //  - a lambda body referencing an OUTER subtree (e.g.
      //    `element_at(toks, i)` with toks defined outside the lambda)
      //    re-evaluates that subtree per ELEMENT in Spark's interpreted
      //    HOF path — re-tokenizing the document n times. Every shared
      //    subtree is therefore bound once via `bound` (a 1-element
      //    transform whose lambda slot downstream lambdas read for free).
      def bound(e: Column)(f: Column => Column): Column =
        element_at(transform(array(e), v => f(v)), 1)
      bound(sort_array(graft.operators.TextStats.tokens(text))) { toks =>
      bound(size(toks)) { n =>
      // 1-based positions where a new run (distinct token) starts.
      bound(when(n === 0, array().cast("array<int>"))
        .otherwise(filter(sequence(lit(1), n), i =>
          (i === 1) || (element_at(toks, i) =!= element_at(toks, i - 1))))) { starts =>
      // Each run ends where the next begins (sentinel n+1 for the last).
      // Empty guard: zip_with null-pads the shorter side, so ends must be
      // empty (not [n+1]) when there are no tokens.
      bound(when(size(starts) === 0, array().cast("array<int>"))
        .otherwise(concat(
          slice(starts, lit(2), greatest(size(starts) - 1, lit(0))),
          array(n + 1)))) { ends =>
      bound(sort_array(zip_with(starts, ends, (s, e) => {
        val tf = (e - s).cast("double")
        val x = tf * lit(k1 + 1) /
          (tf + lit(k1) * (lit(1 - b) + lit(b) * n.cast("double") / lit(avgdl)))
        struct(xxhash64(element_at(toks, s)).as("i"),
          (floor(x * lit(1024.0)) / lit(1024.0)).cast("float").as("v"))
      }))) { pairs =>
        struct(pairs.getField("i").as("indices"),
          pairs.getField("v").as("values"))
      }}}}}
    }
  }

  /** SPLADE-style fitted sparse text embedding — the learned-sparse
    * family of the reference's embedding-function suite
    * (`chromadb/utils/embedding_functions/` SPLADE et al., which emit
    * per-term weights from a model): here the "model" is a FITTED idf
    * vocabulary ([[LogTfIdfSparse.fit]] — one aggregation over a corpus,
    * top-`maxVocab` terms by document frequency), and the doc-side
    * weight is the classic learned-sparse surrogate
    * `w(t) = ln(1 + tf) · idf(t)`, pruned to the vocabulary. idf
    * quantizes to 1/64 and the product to 1/1024, so the f32 sparse-dot
    * kernel is bit-identical to a double-computing oracle (the
    * `fc_sparse_idf` trick).
    *
    * The fitted vocabulary rides the plan as a map literal — right for a
    * bounded vocab (the SPLADE lexicon is 30k terms); an unbounded vocab
    * would apply weights via a broadcast join against the df table
    * instead.
    */
  final class LogTfIdfSparse(val idf: Map[Long, Double])
      extends SparseEmbeddingFunction {
    val name = "logtfidf_sparse"
    def embedSparse(text: Column): Column =
      TextHash.logTfIdfSparse(graft.operators.TextStats.tokens(text), idf)
  }

  object LogTfIdfSparse {
    /** Fit the idf vocabulary: document frequencies in ONE distributed
      * aggregation, top `maxVocab` terms by (df desc, term asc) —
      * deterministic, so an oracle can reproduce the exact vocabulary —
      * idf = BM25-idf quantized to 1/64. The collect is bounded by
      * `maxVocab`.
      */
    def fit(docs: org.apache.spark.sql.DataFrame, textCol: String = "text",
        maxVocab: Int = 2048): LogTfIdfSparse = {
      val n = docs.count().toDouble
      val dfRows = docs
        .select(explode(array_distinct(
          graft.operators.TextStats.tokens(col(textCol)))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), col("term")).limit(maxVocab)
        .collect()
      val idf = dfRows.map { r =>
        val term = r.getString(0)
        val d = r.getLong(1).toDouble
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
        val tid = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        tid -> math.floor(math.log((n - d + 0.5) / (d + 0.5) + 1.0) * 64.0) / 64.0
      }.toMap
      new LogTfIdfSparse(idf)
    }
  }

  /** Fitted DENSE tf-idf embedder — the dense sibling of
    * [[LogTfIdfSparse]] and the classic "project onto the top-`dim`
    * vocabulary" text featurizer (the reference's embedding-function
    * suite spans exactly this fitted-featurizer family alongside its
    * model backends, `chromadb/utils/embedding_functions/`): slot `i`
    * of the vector is `ln(1+tf)·idf` of the i-th vocabulary term
    * (fitted order: df desc, term asc), L2-normalized. Both
    * quantization steps (idf to 1/64, weights to 1/1024) and the
    * dyadic-exact norm make the output reproducible bit-for-bit by a
    * SQL oracle — the only dense embedding function here that earns a
    * hash-exact CORRECTNESS row rather than a spec gate.
    */
  final class VocabTfIdfDense(val slots: Map[Long, Int],
      val idfBySlot: Seq[Double]) extends EmbeddingFunction {
    val dim: Int = idfBySlot.size
    val name = s"vocab_tfidf_$dim"
    def embed(text: Column): Column =
      TextHash.vocabTfIdfDense(
        graft.operators.TextStats.tokens(text), slots, idfBySlot)
  }

  object VocabTfIdfDense {
    /** Fit the vocabulary: document frequencies in ONE distributed
      * aggregation; the top `dim` terms by (df desc, term asc) take
      * slots 0..dim-1 in that order — deterministic, so an oracle can
      * reproduce slot assignment — idf = BM25-idf quantized to 1/64.
      * The collect is bounded by `dim`.
      */
    def fit(docs: org.apache.spark.sql.DataFrame, textCol: String = "text",
        dim: Int = 64): VocabTfIdfDense = {
      val n = docs.count().toDouble
      val rows = docs
        .select(explode(array_distinct(
          graft.operators.TextStats.tokens(col(textCol)))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), col("term")).limit(dim)
        .collect()
      val slots = Map.newBuilder[Long, Int]
      val idf = Seq.newBuilder[Double]
      rows.zipWithIndex.foreach { case (r, slot) =>
        val term = r.getString(0)
        val d = r.getLong(1).toDouble
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
        val tid = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        slots += tid -> slot
        idf += math.floor(math.log((n - d + 0.5) / (d + 0.5) + 1.0) * 64.0) / 64.0
      }
      new VocabTfIdfDense(slots.result(), idf.result())
    }
  }

  /** TRAINED dense embedder — Latent Semantic Analysis (Deerwester et
    * al. 1990, the original learned text embedding): the corpus's
    * tf-idf document-term matrix decomposes by DISTRIBUTED SVD
    * (`mllib.linalg.distributed.RowMatrix.computeSVD` — the fit is a
    * Spark job over every document, not a closed-form formula), and
    * documents/queries embed by projecting their term vector onto the
    * top-`dim` right singular vectors. The one embedding function here
    * whose weights are LEARNED from data in-container, giving
    * second-order semantics no fitted featurizer has: two texts sharing
    * ZERO terms embed close when their terms CO-OCCUR elsewhere in the
    * corpus (spec-gated — plain tf-idf scores that pair exactly 0).
    * Singular-vector signs are canonicalized (largest-magnitude
    * component positive) so a fit is reproducible.
    */
  final class LsaDense(vocab: VocabTfIdfDense,
      projection: Array[Array[Double]]) extends EmbeddingFunction {
    val dim: Int = projection.headOption.map(_.length).getOrElse(0)
    val name = s"lsa_$dim"
    def embed(text: Column): Column = {
      val p = projection
      val k = dim
      val project = udf { (v: Seq[Float]) =>
        if (v == null) null
        else {
          val out = new Array[Float](k)
          var i = 0
          while (i < v.length) {
            val x = v(i)
            if (x != 0f) {
              var j = 0
              while (j < k) { out(j) += (x * p(i)(j)).toFloat; j += 1 }
            }
            i += 1
          }
          val n = math.sqrt(out.map(x => x.toDouble * x).sum).toFloat
          (if (n == 0f) out else out.map(_ / n)).toSeq
        }
      }
      project(vocab.embed(text))
    }
  }

  object LsaDense {
    /** Fit: tf-idf featurize every document (the fitted vocabulary is
      * [[VocabTfIdfDense]]'s, deterministic), stack into a distributed
      * RowMatrix, take the top-`dim` right singular vectors. At corpus
      * scale this is the standard tall-skinny SVD — the Gramian reduces
      * tree-style across executors, only the vocab×vocab (or ARPACK
      * Lanczos) step runs on the driver; no document row ever leaves
      * its partition un-aggregated.
      */
    def fit(docs: org.apache.spark.sql.DataFrame, textCol: String = "text",
        dim: Int = 32, vocabDim: Int = 256): LsaDense = {
      val vocab = VocabTfIdfDense.fit(docs, textCol, vocabDim)
      // null texts embed to null (the protocol) — the SVD input drops
      // them, same as the vocabulary fit's explode did
      val rows = docs.filter(col(textCol).isNotNull)
        .select(vocab.embed(col(textCol)).as("v"))
        .rdd.map(r => org.apache.spark.mllib.linalg.Vectors.dense(
          r.getSeq[Float](0).map(_.toDouble).toArray))
      val svd = new org.apache.spark.mllib.linalg.distributed.RowMatrix(rows)
        .computeSVD(math.min(dim, vocab.dim), computeU = false)
      val v = svd.V // vocabDim × k, column j = j-th right singular vector
      // computeSVD may return FEWER columns than asked (rank-deficient
      // corpus: components under rCond·sigma0 are dropped) — the fitted
      // embedder is rank-limited, never an index crash
      val k = v.numCols
      val proj = Array.tabulate(vocab.dim, k)((i, j) => v(i, j))
      // canonical signs: flip each column so its largest-|x| entry is
      // positive — SVD is sign-indeterminate, embeddings must not be
      (0 until k).foreach { j =>
        val m = (0 until vocab.dim).maxBy(i => math.abs(proj(i)(j)))
        if (proj(m)(j) < 0)
          (0 until vocab.dim).foreach(i => proj(i)(j) = -proj(i)(j))
      }
      new LsaDense(vocab, proj)
    }
  }

  /** A loadable inference model: `load()` runs ONCE per partition (the
    * expensive step — an ONNX session, a tokenizer) and returns the
    * batch-infer closure. This is the `onnx_mini_lm_l6_v2.py` shape:
    * session construction amortizes across the partition, texts flow
    * through in batches.
    */
  trait ModelBackend extends Serializable {
    def name: String
    def dim: Int
    def load(): Seq[String] => Seq[Array[Float]]
  }

  /** DETERMINISTIC FAKE backend — this container has no model runtimes
    * (no ONNX, no network), so a seeded hash-vector model stands in.
    * The Spark-side contract it exercises is real: per-partition `load`,
    * batched inference, row passthrough. A real ONNX backend drops in by
    * implementing [[ModelBackend.load]] with a session + tokenizer.
    * Instrumented (loads/batch sizes) for the lifecycle spec.
    */
  final class FakeModelBackend(val dim: Int = 32, tag: String = "")
      extends ModelBackend {
    val name = s"fake_hash_$dim$tag"
    def load(): Seq[String] => Seq[Array[Float]] = {
      FakeModelBackend.loadsFor(name).incrementAndGet()
      texts => {
        FakeModelBackend.batchesFor(name).add(texts.size)
        texts.map { t =>
          val h0 = scala.util.hashing.MurmurHash3.stringHash(t, 42)
          val v = Array.tabulate(dim) { i =>
            val h = scala.util.hashing.MurmurHash3.productHash((h0, i))
            (h.toFloat / Int.MaxValue.toFloat)
          }
          val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
          if (norm == 0f) v else v.map(_ / norm)
        }
      }
    }
  }
  object FakeModelBackend {
    // per-name instrumentation (static: local-mode tasks run in this JVM)
    // so concurrent suites exercising other backends can't interfere
    private val loads = scala.collection.concurrent
      .TrieMap[String, java.util.concurrent.atomic.AtomicInteger]()
    private val batches = scala.collection.concurrent
      .TrieMap[String, java.util.concurrent.ConcurrentLinkedQueue[Int]]()
    def loadsFor(name: String): java.util.concurrent.atomic.AtomicInteger =
      loads.getOrElseUpdate(name, new java.util.concurrent.atomic.AtomicInteger(0))
    def batchesFor(name: String): java.util.concurrent.ConcurrentLinkedQueue[Int] =
      batches.getOrElseUpdate(name, new java.util.concurrent.ConcurrentLinkedQueue[Int]())
  }

  /** Model-runner embedding function: batched `mapPartitions` inference
    * with one model instantiation per partition and per-JVM session
    * reuse. `embed(Column)` (the plan-composition surface) routes rows
    * through the same cached session via a UDF — correct everywhere, but
    * write paths should call [[embedDf]] for real batching.
    */
  final class ModelEmbeddingFunction(backend: ModelBackend,
      batchSize: Int = 32) extends EmbeddingFunction {
    val name = s"model_${backend.name}"
    val dim: Int = backend.dim
    def embed(text: Column): Column = {
      val b = backend
      val f = udf { (s: String) =>
        if (s == null) null
        else ModelEmbeddingFunction.session(b)(Seq(s)).head.toSeq
      }
      f(text)
    }
    override def embedDf(df: DataFrame, textCol: String, out: String): DataFrame = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      val idx = df.schema.fieldIndex(textCol)
      val outSchema = df.schema.add(out, ArrayType(FloatType))
      val b = backend
      val bs = batchSize
      df.mapPartitions { it =>
        val infer = ModelEmbeddingFunction.session(b)
        it.grouped(bs).flatMap { batch =>
          // null text -> null embedding, matching embed(Column)'s
          // null-in/null-out UDF: a null document must not acquire a
          // phantom empty-string embedding (and become ANN-retrievable)
          // on the DataFrame write path only.
          val texts = batch.map(r => Option(r.getString(idx)))
          // an all-null batch must not reach the backend: a real ONNX
          // session/tokenizer may reject an empty input batch
          val nonNull = texts.flatten
          val embs = if (nonNull.isEmpty) Seq.empty else infer(nonNull)
          val embIt = embs.iterator
          batch.iterator.zip(texts.iterator).map { case (r, t) =>
            Row.fromSeq(r.toSeq :+ t.map(_ => embIt.next().toSeq).orNull)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    }
  }
  object ModelEmbeddingFunction {
    // one loaded session per backend per JVM: partitions on the same
    // executor share it, fresh executors load their own. ConcurrentHashMap
    // computeIfAbsent runs the (expensive) loader at most once even when
    // the first partitions race — TrieMap.getOrElseUpdate may evaluate
    // the default twice under contention.
    private val sessions = new java.util.concurrent
      .ConcurrentHashMap[String, Seq[String] => Seq[Array[Float]]]()
    def session(b: ModelBackend): Seq[String] => Seq[Array[Float]] =
      sessions.computeIfAbsent(b.name, _ => b.load())
    private[graft] def resetSessions(): Unit = sessions.clear()
  }

  /** Greedy longest-match-first WordPiece tokenization (the
    * MiniLM/BERT scheme the reference's default embedding function uses,
    * `onnx_mini_lm_l6_v2.py:1`): lowercase, split on non-alphanumerics,
    * then per word the longest vocab prefix, continuations prefixed
    * `##`, unknown pieces → `[UNK]`. Pure JVM — testable without the
    * runtime; [[OnnxModelBackend]] feeds its ids to the ORT session.
    */
  final class WordPiece(vocab: Map[String, Int], maxLen: Int = 256)
      extends Serializable {
    private val unk = vocab.getOrElse("[UNK]", 100)
    private val cls = vocab.getOrElse("[CLS]", 101)
    private val sep = vocab.getOrElse("[SEP]", 102)
    def encode(text: String): Array[Long] = {
      val out = scala.collection.mutable.ArrayBuffer[Long](cls.toLong)
      val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      var wi = 0
      while (wi < words.length && out.length < maxLen - 1) {
        val w = words(wi)
        // pieces buffer per word: BERT WordPiece replaces the ENTIRE
        // word with one [UNK] when any position fails to match — emitting
        // matched prefixes followed by [UNK] would diverge from the
        // reference tokenizer's ids for every OOV-tailed word
        val pieces = scala.collection.mutable.ArrayBuffer[Long]()
        var start = 0
        var bad = false
        while (start < w.length && !bad) {
          var end = w.length
          var pieceId = -1
          while (end > start && pieceId < 0) {
            val piece = (if (start > 0) "##" else "") + w.substring(start, end)
            pieceId = vocab.getOrElse(piece, -1)
            if (pieceId < 0) end -= 1
          }
          if (pieceId < 0) bad = true
          else { pieces += pieceId.toLong; start = end }
        }
        val emit = if (bad) Seq(unk.toLong) else pieces.toSeq
        emit.iterator.takeWhile(_ => out.length < maxLen - 1).foreach(out += _)
        wi += 1
      }
      out += sep.toLong
      out.toArray
    }
  }

  object WordPiece {
    /** Standard one-token-per-line `vocab.txt` (row index = id). */
    def fromVocabFile(path: String): WordPiece = {
      import scala.jdk.CollectionConverters._
      val lines = java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(path)).asScala
      new WordPiece(lines.zipWithIndex.map { case (t, i) => t -> i }.toMap)
    }
  }

  /** REAL ONNX backend: MiniLM-style session (input_ids/attention_mask/
    * token_type_ids → last_hidden_state), mean-pooled over the attention
    * mask and L2-normalized — the reference's default embedding function
    * (`onnx_mini_lm_l6_v2.py:1`) re-expressed on the JVM. The
    * `ai.onnxruntime` classes are reached by REFLECTION so this file
    * compiles (and everything else runs) in the zero-egress container,
    * where the onnxruntime jar cannot resolve (dependency attempt
    * 2026-08-14: no coursier/maven cache entry, offline mode — see
    * COVERAGE.md). [[available]] gates the spec: with an ORT jar on the
    * classpath and a model + vocab on shared storage, `load()` runs true
    * inference with zero code changes.
    */
  final class OnnxModelBackend(modelPath: String, vocabPath: String,
      val dim: Int = 384, maxLen: Int = 256)
      extends ModelBackend with AutoCloseable {
    val name = s"onnx_${new java.io.File(modelPath).getName}_$dim"
    // the OrtSession holds native memory beyond the JVM heap — kept so
    // [[close]] can release it (reflection: `session.close()`)
    @volatile private var sessionRef: Object = null
    def load(): Seq[String] => Seq[Array[Float]] = {
      val cl = getClass.getClassLoader
      val envCls = Class.forName("ai.onnxruntime.OrtEnvironment", true, cl)
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val session = envCls
        .getMethod("createSession", classOf[String])
        .invoke(env, modelPath)
      sessionRef = session.asInstanceOf[Object]
      val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor", true, cl)
      val create = tensorCls.getMethod("createTensor",
        envCls, classOf[Object])
      val runM = session.getClass.getMethod("run", classOf[java.util.Map[_, _]])
      def closeOf(o: Object): Unit =
        o.getClass.getMethod("close").invoke(o)
      val tokenizer = WordPiece.fromVocabFile(vocabPath)
      texts => {
        val ids = texts.map(t => tokenizer.encode(t).take(maxLen)).toArray
        val width = ids.map(_.length).max
        val padded = ids.map(a => a ++ Array.fill(width - a.length)(0L))
        val mask = ids.map(a =>
          Array.fill(a.length)(1L) ++ Array.fill(width - a.length)(0L))
        val zeros = Array.fill(ids.length)(Array.fill(width)(0L))
        // OnnxTensor and OrtSession.Result hold NATIVE buffers — each
        // embed call must release them or the process leaks off-heap
        // memory at ingest cadence
        val inputs = new java.util.HashMap[String, Object]()
        try {
          inputs.put("input_ids", create.invoke(null, env, padded))
          inputs.put("attention_mask", create.invoke(null, env, mask))
          inputs.put("token_type_ids", create.invoke(null, env, zeros))
          val result = runM.invoke(session, inputs)
          val hidden = try {
            val value = result.getClass.getMethod("get", classOf[Int])
              .invoke(result, Integer.valueOf(0))
            value.getClass.getMethod("getValue").invoke(value)
              .asInstanceOf[Array[Array[Array[Float]]]] // [batch][tok][dim]
          } finally closeOf(result)
          hidden.zip(mask).map { case (toks, m) =>
            val pooled = new Array[Float](toks(0).length)
            var n = 0
            toks.indices.foreach { t =>
              if (m(t) == 1L) {
                n += 1
                var i = 0
                while (i < pooled.length) { pooled(i) += toks(t)(i); i += 1 }
              }
            }
            var i = 0
            while (i < pooled.length) { pooled(i) /= math.max(n, 1); i += 1 }
            val norm = math.sqrt(pooled.map(x => x.toDouble * x).sum).toFloat
            if (norm == 0f) pooled else pooled.map(_ / norm)
          }.toSeq
        } finally {
          inputs.values().forEach(t => if (t != null) closeOf(t))
        }
      }
    }
    /** Release the native OrtSession (idempotent; no-op before load). */
    def close(): Unit = {
      val s = sessionRef
      if (s != null) {
        sessionRef = null
        s.getClass.getMethod("close").invoke(s)
      }
    }
  }

  object OnnxModelBackend {
    /** True when an ONNX Runtime jar is on the classpath — gates the
      * real-inference spec (canceled in the zero-egress container).
      */
    def available: Boolean =
      try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
      catch { case _: ClassNotFoundException => false }
  }

  /** Pure-JVM mini-inference backend — the MiniLM GRAPH SHAPE
    * (WordPiece tokenize → token-embedding gather → hidden GEMM +
    * activation → mean-pool → L2-normalize, `onnx_mini_lm_l6_v2.py:1`)
    * run by plain JVM matmul over hand-vendored int8 weight tensors with
    * float32 dequantization scales (the reference's default model ships
    * int8-quantized weights the same way). The weights are a fixed
    * seeded lattice, not trained — but the inference is REAL matrix
    * math: embeddings respond to token CONTENT (texts sharing WordPiece
    * tokens share pooled embedding mass through the same GEMM), unlike
    * [[FakeModelBackend]] where a one-character edit decorrelates the
    * whole vector. This proves the tokenize → infer → pool → normalize
    * path end-to-end in a container with no model runtime;
    * [[OnnxModelBackend]] swaps in trained MiniLM wherever an ORT jar +
    * model file exist, with zero changes above [[ModelBackend]].
    */
  final class MiniGemmBackend(val dim: Int = 32, hidden: Int = 48,
      maxLen: Int = 64, seed: Long = 42L) extends ModelBackend {
    val name = s"mini_gemm_$dim"
    def load(): Seq[String] => Seq[Array[Float]] = {
      val tok = new WordPiece(MiniGemmBackend.Vocab, maxLen)
      val v = MiniGemmBackend.Vocab.size
      // int8 weights, deterministic per seed; dequant = q * scale
      val rnd = new java.util.Random(seed)
      def int8(n: Int): Array[Byte] = {
        val a = new Array[Byte](n); rnd.nextBytes(a); a
      }
      val embQ = int8(v * hidden)
      val embScale = 1f / 64f
      val w1Q = int8(hidden * dim)
      val w1Scale = 1f / (8f * hidden)
      val b1 = Array.tabulate(dim)(j => (((j * 37 + 11) % 97) - 48) / 970f)
      texts => texts.map { t =>
        val ids = tok.encode(t)
        val pool = new Array[Float](dim)
        val x = new Array[Float](hidden)
        ids.foreach { idL =>
          val id = idL.toInt
          var i = 0
          while (i < hidden) { // gather + dequantize the token embedding
            x(i) = embQ(id * hidden + i) * embScale; i += 1
          }
          var j = 0
          while (j < dim) { // h = tanh(W1ᵀ x + b1); pool accumulates
            var acc = b1(j)
            var i2 = 0
            while (i2 < hidden) {
              acc += x(i2) * (w1Q(i2 * dim + j) * w1Scale); i2 += 1
            }
            pool(j) += math.tanh(acc).toFloat
            j += 1
          }
        }
        var j = 0
        while (j < dim) { pool(j) /= math.max(ids.length, 1); j += 1 }
        val norm = math.sqrt(pool.map(p => p.toDouble * p).sum).toFloat
        if (norm == 0f) pool else pool.map(_ / norm)
      }
    }
  }

  object MiniGemmBackend {
    /** Hand-vendored tiny WordPiece vocabulary: the BERT specials, a
      * band of common English words and suffix pieces (longest-match
      * engages on these), and single-character pieces with their `##`
      * continuations as the universal fallback — every word tokenizes,
      * none collapses to [UNK].
      */
    val Vocab: Map[String, Int] = {
      val specials = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]")
      val words = Seq("the", "of", "and", "to", "in", "is", "on", "for",
        "with", "that", "this", "from", "are", "was", "have", "not",
        "data", "query", "index", "vector", "search", "spark", "text",
        "doc", "table", "count", "filter", "join", "scan", "sort", "hash",
        "quick", "brown", "fox", "jump", "over", "lazy", "dog")
      val pieces = Seq("##ing", "##ed", "##er", "##ion", "##s", "##ly",
        "##es", "##est", "##able")
      val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
      (specials ++ words ++ pieces ++ chars ++ chars.map("##" + _))
        .zipWithIndex.toMap
    }
  }

  val registry: Map[String, EmbeddingFunction] = Seq(
    new HashedBow(64), new HashedBow(128),
    new HashedBigram(64),
    new HashedCharNgram(64), new HashedCharNgram(128),
    new TextStatsFeatures, new FjltBow(64),
    new PrefixedEmbedding(new HashedBow(64)),
    new ModelEmbeddingFunction(new FakeModelBackend(32)),
    new ModelEmbeddingFunction(new MiniGemmBackend(32))
  ).map(f => f.name -> f).toMap

  val sparseRegistry: Map[String, SparseEmbeddingFunction] = Seq(
    new Bm25Sparse()
  ).map(f => f.name -> f).toMap
}
