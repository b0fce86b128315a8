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

    // Frame sampling over "video" blobs: every 3rd 100-byte frame with
    // its offset + digest — the one-to-many media explode, oracle-checked
    // on the deterministic sampling geometry.
    "mm_frame_sample" -> { (s, d) =>
      val blobs = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      Multimodal.frameSample(blobs, frameBytes = 100, stride = 3)
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // real decode → nearest-neighbor ×2 downscale, resized-raster digest
    "mm_resize" -> { (s, d) =>
      val blobs = Multimodal.synthPngBlobs(
        Tables.documents(s, d).select(col("doc_id")))
      Multimodal.resizeImages(blobs, stride = 2).orderBy(col("doc_id"))
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

  val oracle: Map[String, String] = Map(
    // the ta_tfidf_knn oracle verbatim: identical embedding, queries, k
    "mm_embed_knn_oracle" -> TextAnalysis.oracle("ta_tfidf_knn"),
    // the synthetic image's dims and every pixel are closed-form in
    // doc_id, so the REAL codec's output (true raster dims + row-major
    // gray-value digest) is SQL-computable — any decode fault breaks it
    "mm_decode_features" ->
      """SELECT doc_id,
        |  CAST(doc_id % 13 + 4 AS INT) AS width,
        |  CAST(doc_id % 11 + 3 AS INT) AS height,
        |  md5(array_to_string(flatten(list_transform(range(0, doc_id % 11 + 3), y ->
        |    list_transform(range(0, doc_id % 13 + 4), x ->
        |      CAST((x*7 + y*13 + doc_id) % 128 AS VARCHAR)))), ',')) AS sig
        |FROM documents ORDER BY doc_id""".stripMargin,

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
