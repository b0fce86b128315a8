package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `BINARY` columns with typed
  * metadata, processed by batched per-partition workers.
  *
  * The reference models media as `uri` pointers on records
  * (`chromadb/api/models/Collection.py:96-109`) with pluggable data loaders
  * / embedding functions. At 100 TB the Spark-native shape is: bytes or
  * uris in the table, decode/feature-extract as `mapPartitions` batches so
  * per-executor model/codec state is initialized once per partition, not
  * per row.
  *
  * The actual image/audio codecs are NOT in this container, so
  * [[decodeStub]] is a clearly-marked deterministic fake; everything
  * around it — schema, batching, partitioning, output contract — is the
  * real plumbing a codec would drop into.
  */
object Multimodal {

  /** Deterministic fake "decode": parses a fake header from the bytes.
    * STUB — replace with a real codec (e.g. javax.imageio / ffmpeg JNI)
    * when available; the signature and batching stay the same.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    val width = n % 64 + 1
    val height = n / 64 + 1
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    (width, height, digest)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_bytes", LongType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("sig", StringType)))

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("frame_idx", LongType),
    StructField("byte_off", LongType), StructField("sig", StringType)))

  /** Frame sampling over a "video" blob: fixed-size frame windows, every
    * `stride`-th frame emitted with its byte offset and content digest.
    * The frame DECODER is the stub boundary (real codecs absent from this
    * container); the sampling loop, per-partition batching, one-to-many
    * explode shape, and deterministic output contract are the real
    * plumbing a video pipeline drops ffmpeg into. Scales map-only: frames
    * per row are bounded by blob size, no shuffle until the output sort.
    */
  def frameSample(blobs: DataFrame, frameBytes: Int = 100,
      stride: Int = 3): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5") // per-partition init
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val off = i * frameBytes
          val frame = java.util.Arrays.copyOfRange(bytes, off,
            math.min(off + frameBytes, bytes.length))
          digest.reset()
          val sig = digest.digest(frame).map("%02x".format(_)).mkString
          Row(id, i.toLong, off.toLong, sig)
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_in", LongType),
    StructField("n_out", LongType), StructField("sig", StringType)))

  /** "Resize": deterministic stride-downsample of the blob (every
    * `stride`-th byte). STUB for a real resampler — the size contract
    * (ceil(n/stride)), batching, and digest verification are the real
    * plumbing; swap the inner loop for an image scaler when codecs
    * exist. Map-only, no shuffle.
    */
  def resize(blobs: DataFrame, stride: Int = 4): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val out = bytes.indices.by(stride).map(bytes(_)).toArray
        digest.reset()
        val sig = digest.digest(out).map("%02x".format(_)).mkString
        Row(id, bytes.length.toLong, out.length.toLong, sig)
      }
    }
    spark.createDataFrame(rdd, resizeSchema)
  }

  /** Batched decode/feature-extract over (doc_id, blob BINARY) rows —
    * the `mapInPandas` shape in Scala: one worker init per partition,
    * rows streamed through it.
    */
  def decodeFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      // per-partition init happens here (codec/model handle)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, sig) = decodeStub(bytes)
        Row(id, bytes.length.toLong, w, h, sig)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
