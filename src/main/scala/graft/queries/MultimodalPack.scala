package graft.queries

import graft.Tables
import graft.functions.EmbeddingFunctions
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal + embedding-function surface. `mm_decode_features` routes
  * real bytes through the batched mapPartitions decode path (stubbed
  * codec, real plumbing) and is oracle-checked on the deterministic
  * outputs. `mm_embed_knn` embeds text with the hashed-BoW embedding
  * function and runs KNN over the result (rows-only; determinism and
  * unit-norm gated in MultimodalSpec).
  */
object MultimodalPack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_features" -> { (s, d) =>
      val blobs = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      Multimodal.decodeFeatures(blobs).orderBy(col("doc_id"))
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

    // Stride-downsample "resize" over the blob, digest-verified.
    "mm_resize" -> { (s, d) =>
      val blobs = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      Multimodal.resize(blobs, stride = 4).orderBy(col("doc_id"))
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
    "mm_decode_features" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
        |  CAST(octet_length(encode(text)) // 64 + 1 AS INT) AS height,
        |  md5(text) AS sig
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ASCII corpus: every-4th-char of the VARCHAR == every-4th-byte
    "mm_resize" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_in,
        |  (octet_length(encode(text)) + 3) // 4 AS n_out,
        |  md5(array_to_string(
        |    list_transform(range(1, length(text) + 1, 4),
        |      i -> substring(text, CAST(i AS INT), 1)), '')) AS sig
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
