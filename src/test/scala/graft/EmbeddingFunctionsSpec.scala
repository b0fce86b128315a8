package graft

import graft.functions.EmbeddingFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EmbeddingFunction protocol gates: every registered function must be
  * deterministic, dimension-correct, and (for the normalized families)
  * unit-norm; sparse functions must emit sorted, aligned index/value
  * arrays that plug into sparseSearch unchanged.
  */
class EmbeddingFunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf).limit(50).cache()

  test("dense registry: deterministic, right dim, normalized where claimed") {
    for ((name, ef) <- EmbeddingFunctions.registry) {
      val out = docs.select(ef.embed(col("text")).as("e"))
      val a = out.collect().map(_.getSeq[Float](0))
      val b = out.collect().map(_.getSeq[Float](0))
      assert(a.toSeq == b.toSeq, s"$name not deterministic")
      assert(a.forall(_.length == ef.dim), s"$name wrong dim")
      if (name.startsWith("hashed_")) {
        a.filter(_.exists(_ != 0f)).foreach { v =>
          val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
          assert(math.abs(norm - 1.0) < 1e-4, s"$name norm $norm != 1")
        }
      }
      // embeddings separate texts: among 50 docs, vectors are not all equal
      assert(a.distinct.length > 1, s"$name collapses all inputs")
    }
  }

  test("bigram EF is order-sensitive where unigram BoW is order-blind") {
    import spark.implicits._
    val pair = Seq("new york times daily", "times new york daily").toDF("text")
    def vecs(name: String): Seq[Seq[Float]] =
      pair.select(EmbeddingFunctions.registry(name).embed(col("text")).as("e"))
        .collect().map(_.getSeq[Float](0)).toSeq
    val uni = vecs("hashed_bow_64")
    assert(uni.head == uni(1), "unigram BoW should be permutation-invariant")
    val bi = vecs("hashed_bigram_64")
    assert(bi.head != bi(1), "bigram embedding must separate reorderings")
    // fewer than 2 tokens -> zero vector (no bigrams), not a crash
    val short = Seq("word", "").toDF("text")
      .select(EmbeddingFunctions.registry("hashed_bigram_64")
        .embed(col("text")).as("e"))
      .collect().map(_.getSeq[Float](0))
    assert(short.forall(_.forall(_ == 0f)))
  }

  test("bm25 sparse EF: sorted indices, aligned values, saturating in tf") {
    val ef = new EmbeddingFunctions.Bm25Sparse()
    val out = docs.select(ef.embedSparse(col("text")).as("sv"))
      .select(col("sv.indices"), col("sv.values")).collect()
    out.foreach { r =>
      val idx = r.getSeq[Long](0); val vs = r.getSeq[Float](1)
      assert(idx.length == vs.length)
      assert(idx == idx.sorted, "indices must be sorted for the merge kernel")
      assert(idx.distinct.length == idx.length, "indices must be unique")
      assert(vs.forall(v => v > 0f && v < 2.2f), "bm25 values bounded by k1+1")
    }
    // saturation: tf=10 scores higher than tf=1 but far below 10x
    import SparkTestSession.spark.implicits._
    val two = Seq(("a " * 1).trim, ("a " * 10).trim).toDF("text")
      .select(ef.embedSparse(col("text")).as("sv"))
      .select(element_at(col("sv.values"), 1)).collect().map(_.getFloat(0))
    assert(two(1) > two(0) && two(1) < 10 * two(0))
  }

  test("fitted SPLADE-style EF: vocab-pruned, sorted, exact ln(1+tf)*idf weights") {
    import spark.implicits._
    val corpus = Seq(
      "spark spark data engine",
      "data filter engine",
      "spark data",
      "rare token here").toDF("text")
    val ef = EmbeddingFunctions.LogTfIdfSparse.fit(corpus, "text", maxVocab = 3)
    // vocabulary = top-3 by (df desc, term asc): data(3), spark(2), engine(2)
    assert(ef.idf.size == 3)
    def idfOf(df: Int) =
      math.floor(math.log((4.0 - df + 0.5) / (df + 0.5) + 1.0) * 64.0) / 64.0
    val out = corpus.select(ef.embedSparse(col("text")).as("sv"))
      .select(col("sv.indices"), col("sv.values")).collect()
    val row0 = out(0) // "spark spark data engine"
    val ids = row0.getSeq[Long](0)
    val ws = row0.getSeq[Float](1)
    assert(ids == ids.sorted, "indices must be sorted")
    assert(ids.length == 3 && ws.length == 3) // all three vocab terms present
    def w(tf: Int, df: Int): Float =
      (math.floor(math.log(1.0 + tf) * idfOf(df) * 1024.0) / 1024.0).toFloat
    // tf: spark=2 (df 2), data=1 (df 3), engine=1 (df 2)
    assert(ws.toSet == Set(w(2, 2), w(1, 3), w(1, 2)))
    // out-of-vocab document embeds to the empty sparse vector
    val rare = out(3)
    assert(rare.getSeq[Long](0).isEmpty && rare.getSeq[Float](1).isEmpty)
  }

  test("fitted dense tf-idf EF: slot order, exact weights, unit norm, OOV zero") {
    import spark.implicits._
    val corpus = Seq(
      "spark spark data engine",
      "data filter engine",
      "spark data",
      "rare token here").toDF("text")
    val ef = EmbeddingFunctions.VocabTfIdfDense.fit(corpus, "text", dim = 3)
    // slots by (df desc, term asc): data(3)->0, engine(2)->1, spark(2)->2
    assert(ef.dim == 3 && ef.slots.size == 3)
    def idfOf(df: Int) =
      math.floor(math.log((4.0 - df + 0.5) / (df + 0.5) + 1.0) * 64.0) / 64.0
    def w(tf: Int, df: Int): Double =
      math.floor(math.log(1.0 + tf) * idfOf(df) * 1024.0) / 1024.0
    val out = corpus.select(ef.embed(col("text")).as("e")).collect()
      .map(_.getSeq[Float](0))
    assert(out.forall(_.length == 3))
    // row 0 "spark spark data engine": tf data=1, engine=1, spark=2
    val raw = Seq(w(1, 3), w(1, 2), w(2, 2))
    val norm = math.sqrt(raw.map(x => x * x).sum)
    assert(out(0) == raw.map(x => (x / norm).toFloat),
      s"expected exact normalized weights, got ${out(0)}")
    out.take(3).foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"norm $n != 1")
    }
    // out-of-vocabulary document embeds to the zero vector
    assert(out(3).forall(_ == 0f))
  }

  test("prefixed EF: asymmetric doc/query embeddings through the embedQuery override") {
    val base = EmbeddingFunctions.registry("hashed_bow_64")
    val pref = EmbeddingFunctions.registry("prefixed_hashed_bow_64")
    val one = docs.limit(1).select(
      pref.embed(col("text")).as("d"),
      pref.embedQuery(col("text")).as("q"),
      base.embed(concat(lit("passage: "), col("text"))).as("dExp"),
      base.embed(concat(lit("query: "), col("text"))).as("qExp"),
      base.embedQuery(col("text")).as("baseQ"),
      base.embed(col("text")).as("baseD")).collect()(0)
    def v(i: Int) = one.getSeq[Float](i)
    assert(v(0) == v(2), "doc side must be base embed of 'passage: '+text")
    assert(v(1) == v(3), "query side must be base embed of 'query: '+text")
    assert(v(0) != v(1), "asymmetric function must embed doc and query differently")
    // the protocol default: symmetric functions answer embedQuery with embed
    assert(v(4) == v(5), "embedQuery must fall back to embed when not overridden")
  }

  test("model runner: batched mapPartitions inference, one session per JVM") {
    import EmbeddingFunctions.{FakeModelBackend, ModelEmbeddingFunction}
    import spark.implicits._
    // unique tag: this test owns its backend name, so parallel suites
    // touching the registry's fake backend can't perturb the counters
    val backend = new EmbeddingFunctions.FakeModelBackend(32, tag = "_lifecycle")
    val fn = new ModelEmbeddingFunction(backend, batchSize = 4)
    val df = (0 until 22).map(i => (s"id$i", s"document number $i"))
      .toDF("id", "document").repartition(3)
    val out = fn.embedDf(df, "document", "embedding")
    val rows = out.collect()
    // row passthrough + appended embedding of the right shape
    assert(rows.length == 22)
    assert(rows.forall(_.getSeq[Float](2).length == 32))
    // the expensive load ran ONCE for this JVM (3 partitions shared it),
    // and inference was batched at <= batchSize
    assert(FakeModelBackend.loadsFor(backend.name).get() == 1,
      s"expected one session load, got ${FakeModelBackend.loadsFor(backend.name).get()}")
    val sizes = scala.jdk.CollectionConverters
      .CollectionHasAsScala(FakeModelBackend.batchesFor(backend.name)).asScala.toSeq
    assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 4),
      s"bad batch sizes: $sizes")
    assert(sizes.sum == 22, s"rows inferred ${sizes.sum} != 22")
    // deterministic, and the Column surface agrees with the batched path
    val viaCol = df.select(col("id"), fn.embed(col("document")).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val viaDf = rows.map(r => r.getString(0) -> r.getSeq[Float](2)).toMap
    assert(viaCol == viaDf, "embed(Column) disagrees with embedDf batching")
  }

  test("schema-declared model function embeds through the client write path") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_model_ef").toString
    val client = new graft.api.Client(spark, root)
    val coll = client.createCollection("modeled",
      graft.sources.Catalog.Schema(
        embeddingFunction = Some("model_fake_hash_32")))
    coll.add(Seq(("a", "first doc"), ("b", "second doc")).toDF("id", "document"))
    val embs = coll.state.collect().flatMap(_.embedding)
    assert(embs.length == 2 && embs.forall(_.length == 32),
      "write path did not embed through the model runner")
  }

  test("TextHash kernels callable from plain SQL via GraftExtensions") {
    import SparkTestSession.spark
    val r = spark.sql(
      """SELECT simhash64(array('alpha','beta')) AS sh,
        |       size(minhash_sig(array('a b c','b c d'), 8)) AS ms,
        |       size(hashed_bow(array('x','y','x'), 16)) AS hb""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) == 8)
    assert(r.getInt(2) == 16)
    // SQL surface and Column DSL agree
    val viaSql = spark.sql("SELECT simhash64(array('alpha','beta')) AS s")
      .collect()(0).getLong(0)
    val viaDsl = spark.range(1)
      .select(graft.functions.TextHash.simhash64(
        array(lit("alpha"), lit("beta")))).collect()(0).getLong(0)
    assert(viaSql == viaDsl)
  }

  test("WordPiece: greedy longest-match, ## continuations, UNK, CLS/SEP framing") {
    import graft.functions.EmbeddingFunctions.WordPiece
    val vocab = Map("[UNK]" -> 0, "[CLS]" -> 1, "[SEP]" -> 2,
      "un" -> 3, "##aff" -> 4, "##able" -> 5, "##affable" -> 6,
      "spark" -> 7, "query" -> 8)
    val wp = new WordPiece(vocab)
    // greedy longest-first: "unaffable" -> un + ##affable (not ##aff ##able)
    assert(wp.encode("unaffable").toSeq == Seq(1L, 3L, 6L, 2L))
    assert(wp.encode("Spark QUERY").toSeq == Seq(1L, 7L, 8L, 2L))
    // word with no matchable prefix -> single UNK
    assert(wp.encode("zzz").toSeq == Seq(1L, 0L, 2L))
    // OOV TAIL also collapses the WHOLE word to one UNK (BERT WordPiece
    // semantics: matched prefixes must not leak when any position fails)
    assert(wp.encode("unzzz").toSeq == Seq(1L, 0L, 2L))
    assert(wp.encode("unzzz spark").toSeq == Seq(1L, 0L, 7L, 2L))
    // punctuation splits, empty input still framed
    assert(wp.encode("spark,query!").toSeq == Seq(1L, 7L, 8L, 2L))
    assert(wp.encode("").toSeq == Seq(1L, 2L))
  }

  test("LSA: learned co-occurrence semantics that tf-idf provably lacks") {
    import graft.functions.EmbeddingFunctions.{LsaDense, VocabTfIdfDense}
    import spark.implicits._
    // two topics; "car" and "wheel" NEVER co-occur in one document but
    // both co-occur with "engine"/"road" — LSA must place them in the
    // same latent direction, where tf-idf scores the pair exactly 0
    // topic blocks are ASYMMETRIC (7 vs 4 docs) so the top-2 singular
    // values are well separated — a symmetric corpus makes sigma1 ~
    // sigma2 and the fitted basis can rotate inside the degenerate
    // subspace between runs, which is an SVD property, not a bug
    val corpus = (Seq(
      "car engine road", "engine road drive", "wheel engine drive",
      "car road drive", "wheel road engine", "car engine drive",
      "wheel car road",
      "banana fruit sweet", "fruit sweet ripe", "mango fruit ripe",
      "banana sweet fruit") ++
      (0 until 10).map(i => s"filler$i padding$i noise$i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val lsa = LsaDense.fit(corpus, "text", dim = 2)
    def emb(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        t: String): Array[Float] =
      Seq(t).toDF("text").select(f(col("text"))).collect()
        .head.getSeq[Float](0).toArray
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val car = emb(lsa.embed, "car")
    val wheel = emb(lsa.embed, "wheel")
    val fruit = emb(lsa.embed, "banana")
    assert(car.length == 2)
    assert(math.abs(math.sqrt(car.map(x => x.toDouble * x).sum) - 1) < 1e-5)
    // the learned structure: never-co-occurring same-topic terms align
    assert(cos(car, wheel) > 0.6,
      f"LSA cos(car, wheel) = ${cos(car, wheel)}%.3f — no learned co-occurrence")
    assert(cos(car, wheel) > cos(car, fruit) + 0.5,
      f"topics not separated: same=${cos(car, wheel)}%.3f cross=${cos(car, fruit)}%.3f")
    // tf-idf provably cannot: disjoint term sets -> exactly 0
    val tfidf = VocabTfIdfDense.fit(corpus, "text", dim = 32)
    assert(cos(emb(tfidf.embed, "car"), emb(tfidf.embed, "wheel")) == 0.0,
      "tf-idf must score disjoint-term texts exactly 0 — the LSA contrast")
    // refit reproducibility (signs canonicalized): same latent geometry
    val lsa2 = LsaDense.fit(corpus, "text", dim = 2)
    val again = emb(lsa2.embed, "car")
    assert(car.zip(again).forall { case (a, b) => math.abs(a - b) < 1e-5 },
      "refit on the same corpus must reproduce the embedding")
  }

  test("mini-GEMM backend: real matrix inference, token overlap drives similarity") {
    import graft.functions.EmbeddingFunctions.MiniGemmBackend
    val infer = new MiniGemmBackend(32).load()
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val Seq(base, nearDup, unrelated) = infer(Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox leaps over the lazy dog",
      "zzz yyy xxx www vvv uuu ttt sss")).map(_.clone)
    // unit-norm, right width, deterministic across session reloads
    Seq(base, nearDup, unrelated).foreach { v =>
      assert(v.length == 32)
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    }
    val again = new MiniGemmBackend(32).load()(
      Seq("the quick brown fox jumps over the lazy dog")).head
    assert(base.sameElements(again), "weights must be seed-deterministic")
    // REAL inference semantics: shared tokens flow through the same GEMM
    // into shared pooled mass — the seeded-hash fake fails exactly this
    assert(cos(base, nearDup) > 0.8,
      s"near-dup cosine ${cos(base, nearDup)} too low for a one-token edit")
    assert(cos(base, nearDup) > cos(base, unrelated) + 0.3,
      s"token overlap must dominate: near=${cos(base, nearDup)} " +
        s"far=${cos(base, unrelated)}")
    // int8/float32 quantized weights, not the hash fake: a one-CHAR edit
    // perturbs, not decorrelates (the typo re-tokenizes "browm" into char
    // pieces, so several token positions move — hence the looser bound)
    val oneChar = infer(Seq("the quick browm fox jumps over the lazy dog")).head
    assert(cos(base, oneChar) > 0.6, "a one-char edit must stay close")
  }

  test("mini-GEMM embeddings round-trip add -> query with sane KNN neighbors") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_gemm_ef").toString
    val client = new graft.api.Client(spark, root)
    val coll = client.createCollection("gemmed",
      graft.sources.Catalog.Schema(
        embeddingFunction = Some("model_mini_gemm_32")))
    coll.add(Seq(
      ("fox", "the quick brown fox jumps over the lazy dog"),
      ("sql", "query the index table with a filter and a sort"),
      ("vec", "vector search over the data with a hash index"),
      ("alpha", "zzz yyy xxx www vvv uuu"))
      .toDF("id", "document"))
    // embeddings came from the model (right width, unit norm, non-fake)
    val embs = coll.state.collect().flatMap(_.embedding)
    assert(embs.length == 4 && embs.forall(_.length == 32))
    // a query phrased like each doc retrieves THAT doc first
    def top1(q: String): String =
      coll.queryText(Seq(q), k = 1).select("id").collect().head.getString(0)
    assert(top1("quick brown fox leaps over a lazy dog") == "fox")
    assert(top1("filter and sort a query on the index table") == "sql")
    assert(top1("hash index for vector search on data") == "vec")
  }

  test("ONNX backend runs real inference when an ORT jar is present") {
    import graft.functions.EmbeddingFunctions.{OnnxModelBackend, ModelEmbeddingFunction}
    // the zero-egress container has no onnxruntime jar (resolution
    // attempt documented in COVERAGE.md) — this cancels here and runs
    // real inference wherever the jar + model exist
    assume(OnnxModelBackend.available, "ai.onnxruntime not on classpath")
    val model = sys.env.getOrElse("GRAFT_ONNX_MODEL", "/models/minilm.onnx")
    val vocab = sys.env.getOrElse("GRAFT_ONNX_VOCAB", "/models/vocab.txt")
    assume(new java.io.File(model).exists() && new java.io.File(vocab).exists())
    val ef = new ModelEmbeddingFunction(new OnnxModelBackend(model, vocab))
    val out = ef.embedDf(
      Tables.documents(spark, sf).limit(8), "text", "embedding")
      .select("embedding").collect().map(_.getSeq[Float](0))
    assert(out.forall(_.length == 384))
    out.foreach { v =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-4)
    }
  }
}
