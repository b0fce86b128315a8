package graft.queries

import graft.Tables
import graft.functions.EmbeddingFunctions
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal + embedding-function surface. `mm_decode_features` and
  * `mm_resize` run the REAL JDK image codec (`javax.imageio`): synthetic
  * PNG blobs — dims and pixels a closed-form function of doc_id — are
  * PNG-encoded, decoded back through zlib/ImageIO, and verified by a
  * DuckDB oracle computing the same dimensions and raster digest from
  * the formula. `mm_embed_knn` embeds text with the hashed-BoW embedding
  * function and runs KNN over the result (rows-only; determinism and
  * unit-norm gated in MultimodalSpec).
  */
object MultimodalPack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // real PNG decode: encode per-doc synthetic images to actual PNG
    // bytes, decode through ImageIO, emit true dims + raster digest
    "mm_decode_features" -> { (s, d) =>
      val blobs = Multimodal.synthPngBlobs(
        Tables.documents(s, d).select(col("doc_id")))
      Multimodal.decodeImageFeatures(blobs).orderBy(col("doc_id"))
    },

    // real WAV decode: per-doc synthetic PCM16 clips encode to actual
    // RIFF/WAV bytes, decode back through javax.sound.sampled, and emit
    // integer-exact clip features (rate, channels, n, Σv, Σv², zero
    // crossings, max, min) the oracle recomputes from the sample formula
    "mm_audio_features" -> { (s, d) =>
      val blobs = Multimodal.synthWavBlobs(
        Tables.documents(s, d).select(col("doc_id")))
      Multimodal.decodeAudioFeatures(blobs).orderBy(col("doc_id"))
    },

    // REAL multi-frame decode: per-doc animated GIFs (docId%5+2 frames,
    // lossless 256-gray palette) through the JDK sequence reader — every
    // frame's raster digest matches the closed-form pixel formula, so
    // the oracle proves true codec round-trips, not byte plumbing.
    "mm_gif_frames" -> { (s, d) =>
      Multimodal.decodeGifFrames(
          Multimodal.synthGifBlobs(Tables.documents(s, d).select(col("doc_id"))))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Frame sampling over "video" blobs: every 3rd 100-byte frame with
    // its offset + digest — the one-to-many media explode, oracle-checked
    // on the deterministic sampling geometry.
    "mm_frame_sample" -> { (s, d) =>
      val blobs = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      Multimodal.frameSample(blobs, frameBytes = 100, stride = 3)
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // URI data-loader leg (the reference's ImageLoader): PNG files are
    // staged EXECUTOR-SIDE once per collection (foreachPartition to
    // shared storage, ensureBuilt-keyed), records carry file:// uris,
    // and the loader fetches + decodes bytes in the executors — same
    // oracle as mm_decode_features, proving uri → bytes → codec lands
    // on identical rasters.
    "mm_uri_decode" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d)
      val mediaDir = s"$root/media_png"
      graft.sources.CollectionStore.ensureBuilt(root, "media_png", "v1") {
        val dir = mediaDir
        Tables.documents(s, d).select(col("doc_id")).foreachPartition {
          (it: Iterator[org.apache.spark.sql.Row]) =>
            java.nio.file.Files.createDirectories(
              java.nio.file.Paths.get(dir))
            it.foreach { r =>
              val id = r.getLong(0)
              val p = java.nio.file.Paths.get(dir, s"$id.png")
              if (!java.nio.file.Files.exists(p))
                java.nio.file.Files.write(p, Multimodal.syntheticImageBytes(id))
            }
        }
      }
      val uris = Tables.documents(s, d).select(col("doc_id"),
        concat(lit(s"file://$mediaDir/"), col("doc_id"), lit(".png"))
          .as("uri"))
      Multimodal.decodeImageFeatures(Multimodal.loadUris(uris))
        .orderBy(col("doc_id"))
    },

    // real decode → nearest-neighbor ×2 downscale, resized-raster digest
    "mm_resize" -> { (s, d) =>
      val blobs = Multimodal.synthPngBlobs(
        Tables.documents(s, d).select(col("doc_id")))
      Multimodal.resizeImages(blobs, stride = 2).orderBy(col("doc_id"))
    },

    // Image-similarity pipeline THROUGH the real codec: synthetic PNGs →
    // javax.imageio decode → 8-dim integer moment features (w, h, Σv,
    // Σv², Σvx, Σvy, max, min — Multimodal.imageMoments) → exact
    // squared-L2 KNN. Every moment is an integer < 2^24 (exact in
    // float32 AND double) so the distance arithmetic is EXACT on both
    // sides — the whole decode→featurize→KNN composition hash-matches
    // the closed-form DuckDB oracle with no float ambiguity.
    "mm_image_knn" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val blobs = Multimodal.synthPngBlobs(
        Tables.documents(s, d).select(col("doc_id")))
      val feats = graft.sources.CollectionStore.cacheOnce(
        Multimodal.imageMomentFeatures(blobs))
      val q = feats.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("embedding").as("qe"))
      val dist = aggregate(
        zip_with(col("embedding").cast("array<double>"),
          col("qe").cast("array<double>"), (x, y) => (x - y) * (x - y)),
        lit(0d), (acc, z) => acc + z)
      feats.crossJoin(broadcast(q))
        .select(col("query_id"), col("doc_id"), dist.as("dist"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("dist"), col("doc_id"))).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("doc_id"), col("dist"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Exhaustive-mode oracle twin of mm_embed_knn — the embed-at-write →
    // KNN composition with the SQL-expressible fitted tf-idf embedding
    // in place of the hashed-BoW one (xxhash64 has no DuckDB twin):
    // materializing the embedded collection once (embedDf + cacheOnce,
    // the write-path shape) must serve the same exact KNN as inline
    // embedding and as the DuckDB oracle. Closes the one approximate
    // family that had no hash-exact twin.
    "mm_embed_knn_oracle" -> { (s, d) =>
      val ef = graft.functions.EmbeddingFunctions.VocabTfIdfDense.fit(
        Tables.documents(s, d), "text", dim = 64)
      val docsVec = graft.sources.CollectionStore.cacheOnce(
        ef.embedDf(Tables.documents(s, d), "text", "embedding")
          .select(col("doc_id").as("offset_id"), col("embedding"))
          .filter(exists(col("embedding"), x => x =!= 0f)))
      val queries = docsVec.filter(col("offset_id") < 3)
        .select(col("offset_id").as("query_id"),
          col("embedding").as("q_embedding"))
      graft.operators.Knn.exact(docsVec, queries, k = 10, space = "cosine")
        .select(col("query_id"), col("rank"), col("offset_id").as("doc_id"),
          col("dist").cast("float").as("dist"))
        .orderBy(col("query_id"), col("rank"))
    },

    "mm_embed_knn" -> { (s, d) =>
      val ef = EmbeddingFunctions.registry("hashed_bow_64")
      // embed-at-write: materialize the embedded table once (in production
      // this is the stored collection), then query it.
      val docsVec = graft.sources.CollectionStore.cacheOnce(
        Tables.documents(s, d)
          .select(col("doc_id").as("offset_id"), ef.embed(col("text")).as("embedding")))
      val queries = docsVec.filter(col("offset_id") < 3)
        .select(col("offset_id").as("query_id"), col("embedding").as("q_embedding"))
      graft.operators.Knn.exact(docsVec, queries, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
  )

  /** Real-codec decode oracle: true raster dims + row-major gray-value
    * digest from the closed pixel form — shared by the blob and uri
    * decode legs (identical expected rasters).
    */
  private val decodeOracleSql =
    """SELECT doc_id,
      |  CAST(doc_id % 13 + 4 AS INT) AS width,
      |  CAST(doc_id % 11 + 3 AS INT) AS height,
      |  md5(array_to_string(flatten(list_transform(range(0, doc_id % 11 + 3), y ->
      |    list_transform(range(0, doc_id % 13 + 4), x ->
      |      CAST((x*7 + y*13 + doc_id) % 128 AS VARCHAR)))), ',')) AS sig
      |FROM documents ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // the ta_tfidf_knn oracle verbatim: identical embedding, queries, k
    "mm_embed_knn_oracle" -> TextAnalysis.oracle("ta_tfidf_knn"),
    // uri → bytes → codec must land on the same rasters as inline blobs
    "mm_uri_decode" -> decodeOracleSql,

    // the synthetic clip's every sample is closed-form in the id; the
    // features are integer sums, so the REAL RIFF/PCM decode path must
    // land on exactly these rows
    "mm_audio_features" ->
      """WITH ids AS (SELECT doc_id, doc_id % 50 + 20 AS n FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, n)) AS i FROM ids),
        |v AS (SELECT doc_id, i, ((i*31 + doc_id*7) % 2003) - 1001 AS v FROM s),
        |z AS (SELECT doc_id, v, CASE WHEN (lag(v) OVER
        |        (PARTITION BY doc_id ORDER BY i) < 0) <> (v < 0)
        |      THEN 1 ELSE 0 END AS zc FROM v)
        |SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
        |  count(*)::BIGINT AS n_samples,
        |  sum(v)::BIGINT AS sum_v, sum(v*v)::BIGINT AS sum_sq,
        |  sum(zc)::BIGINT AS n_zero_cross,
        |  max(v)::INT AS v_max, min(v)::INT AS v_min
        |FROM z GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // pixel moments from the closed form; integer-exact arithmetic both
    // sides makes the squared-L2 distances bit-identical
    "mm_image_knn" ->
      """WITH ys AS (SELECT doc_id, unnest(range(0, doc_id % 11 + 3)) AS y
        |           FROM documents),
        |pxy AS (SELECT doc_id, y, unnest(range(0, doc_id % 13 + 4)) AS x FROM ys),
        |pv AS (SELECT doc_id, x, y, (x*7 + y*13 + doc_id) % 128 AS v FROM pxy),
        |vecs AS (SELECT doc_id, [
        |    CAST(doc_id % 13 + 4 AS DOUBLE), CAST(doc_id % 11 + 3 AS DOUBLE),
        |    CAST(sum(v) AS DOUBLE), CAST(sum(v*v) AS DOUBLE),
        |    CAST(sum(v*x) AS DOUBLE), CAST(sum(v*y) AS DOUBLE),
        |    CAST(max(v) AS DOUBLE), CAST(min(v) AS DOUBLE)] AS emb
        |  FROM pv GROUP BY doc_id),
        |q AS (SELECT doc_id AS query_id, emb AS qe FROM vecs WHERE doc_id < 3),
        |d AS (SELECT query_id, v.doc_id,
        |        list_sum(list_transform(range(1, 9),
        |          i -> (v.emb[i]-qe[i])*(v.emb[i]-qe[i]))) AS dist
        |      FROM vecs v, q),
        |r AS (SELECT query_id, doc_id, dist,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY dist, doc_id) AS rank
        |      FROM d)
        |SELECT query_id, rank, doc_id, dist
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the synthetic image's dims and every pixel are closed-form in
    // doc_id, so the REAL codec's output (true raster dims + row-major
    // gray-value digest) is SQL-computable — any decode fault breaks it
    "mm_decode_features" -> decodeOracleSql,

    // nearest-neighbor ×2: out pixel (x,y) samples in-pixel (2x,2y);
    // out dims are ceil(in/2) — the resized raster digest from the
    // same closed form
    "mm_resize" ->
      """SELECT doc_id,
        |  CAST(doc_id % 13 + 4 AS INT) AS w_in, CAST(doc_id % 11 + 3 AS INT) AS h_in,
        |  CAST((doc_id % 13 + 5) // 2 AS INT) AS w_out,
        |  CAST((doc_id % 11 + 4) // 2 AS INT) AS h_out,
        |  md5(array_to_string(flatten(list_transform(range(0, (doc_id % 11 + 4) // 2), y ->
        |    list_transform(range(0, (doc_id % 13 + 5) // 2), x ->
        |      CAST((2*x*7 + 2*y*13 + doc_id) % 128 AS VARCHAR)))), ',')) AS sig
        |FROM documents ORDER BY doc_id""".stripMargin,

    // each decoded frame must reproduce the closed-form raster exactly
    // (GIF is lossless at <= 256 colors)
    "mm_gif_frames" ->
      """WITH fr AS (SELECT doc_id,
        |        unnest(range(0, doc_id % 5 + 2)) AS frame_idx
        |      FROM documents)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(doc_id % 5 + 2 AS INT) AS n_frames,
        |  CAST(doc_id % 13 + 4 AS INT) AS width,
        |  CAST(doc_id % 11 + 3 AS INT) AS height,
        |  md5(array_to_string(flatten(list_transform(range(0, doc_id % 11 + 3), y ->
        |    list_transform(range(0, doc_id % 13 + 4), x ->
        |      CAST((x*7 + y*13 + doc_id + 31*frame_idx) % 128 AS VARCHAR)))), ',')) AS sig
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,

    // documents are pure ASCII (octet_length == length holds corpus-wide),
    // so VARCHAR slicing equals byte slicing and md5(substr) == md5(frame)
    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
        |        unnest(range(0, (octet_length(encode(text)) + 99) // 100, 3)) AS frame_idx
        |      FROM documents)
        |SELECT doc_id, frame_idx, frame_idx * 100 AS byte_off,
        |  md5(substring(text, CAST(frame_idx * 100 + 1 AS INT), 100)) AS sig
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
