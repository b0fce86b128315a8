package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `BINARY` columns with typed
  * metadata, processed by batched per-partition workers.
  *
  * The reference models media as `uri` pointers on records
  * (`chromadb/api/models/Collection.py:96-109`) with pluggable data loaders
  * / embedding functions (`chromadb/utils/data_loaders.py:1` ImageLoader).
  * At 100 TB the Spark-native shape is: bytes or uris in the table,
  * decode/feature-extract as `mapPartitions` batches so per-executor
  * model/codec state is initialized once per partition, not per row.
  *
  * IMAGES decode for real: `javax.imageio` ships in every JDK, so the
  * PNG/BMP paths ([[decodeImage]], [[resizeImage]]) run a true codec —
  * zlib inflate, raster access, nearest-neighbor resampling — and are
  * oracle-checked on dimensions + a pixel digest. AUDIO (WAV/PCM)
  * decodes for real too: `javax.sound.sampled` is likewise JDK-resident,
  * so [[decodeWav]] runs a true RIFF parse + PCM frame read,
  * oracle-checked on integer-exact clip features. MULTI-FRAME media
  * decodes for real on the one animation container the JDK ships a
  * codec for: [[decodeGifFrames]] reads every frame of an animated GIF
  * through the sequence reader, each raster oracle-checked bit-exact
  * (GIF is lossless at <= 256 colors). Only modern VIDEO and
  * compressed-audio codecs (H.264/MP3/AAC) are absent from the JDK and
  * this container, so the generic frame-sampling DECODER stays a
  * clearly-marked deterministic stub ([[decodeStub]]); the sampling
  * loop, batching, and output contract around it are the real plumbing
  * ffmpeg would drop into.
  */
object Multimodal {

  /** Deterministic fake frame "decode": parses a fake header from the
    * bytes. STUB for VIDEO / compressed audio only (no JDK codec
    * exists) — images go through the real [[decodeImage]], WAV audio
    * through the real [[decodeWav]]. Replace with ffmpeg JNI when
    * available; the signature and batching stay the same.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    val width = n % 64 + 1
    val height = n / 64 + 1
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    (width, height, digest)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Row-major gray-value digest of a decoded raster: md5 over the
    * comma-joined `rgb & 0xff` values. Text-valued (not raw-byte) so the
    * SAME digest is computable in ANSI SQL from the pixel formula — the
    * trick that lets a DuckDB oracle verify a real binary codec path.
    */
  def rasterDigest(img: BufferedImage): String = {
    val sb = new java.lang.StringBuilder(img.getWidth * img.getHeight * 4)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        if (x > 0 || y > 0) sb.append(',')
        sb.append(img.getRGB(x, y) & 0xff)
        x += 1
      }
      y += 1
    }
    md5Hex(sb.toString)
  }

  /** Deterministic synthetic grayscale image for a document id: dims
    * `(id % 13 + 4) × (id % 11 + 3)`, pixel `v(x,y) = (7x + 13y + id)
    * mod 128` — every property an oracle needs is a closed-form function
    * of the id, while the bytes themselves go through a REAL PNG encode
    * (deflate, filters), so the decode path is exercised end-to-end.
    */
  def syntheticImage(docId: Long): BufferedImage = {
    val w = (docId % 13 + 4).toInt
    val h = (docId % 11 + 3).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7L + y * 13L + docId) % 128L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** [[syntheticImage]] encoded to real PNG (or BMP) bytes. */
  def syntheticImageBytes(docId: Long, format: String = "png"): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(syntheticImage(docId), format, bos)
    bos.toByteArray
  }

  /** Decode or fail LOUDLY: `ImageIO.read` returns null (not an
    * exception) for unrecognized bytes, and a bare executor NPE from a
    * null raster gives no hint which blob was corrupt.
    */
  private def readImage(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null,
      s"undecodable image bytes (${bytes.length} bytes, " +
        s"magic ${bytes.take(4).map("%02x".format(_)).mkString})")
    img
  }

  /** REAL image decode via the JDK codec: format auto-detected from the
    * magic bytes (PNG, BMP, GIF, JPEG — whatever `javax.imageio`
    * registers), returns true raster dimensions + the pixel digest.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, String) = {
    val img = readImage(bytes)
    (img.getWidth, img.getHeight, rasterDigest(img))
  }

  /** REAL nearest-neighbor downscale on the decoded raster: output pixel
    * `(x, y)` samples input `(x·stride, y·stride)`; output dims are
    * `ceil(in/stride)`. Deterministic by construction (no interpolation
    * rounding), so the resized raster digest is SQL-computable.
    */
  def resizeImage(img: BufferedImage, stride: Int): BufferedImage = {
    val wo = (img.getWidth + stride - 1) / stride
    val ho = (img.getHeight + stride - 1) / stride
    val out = new BufferedImage(wo, ho, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ho) {
      var x = 0
      while (x < wo) {
        out.setRGB(x, y, img.getRGB(x * stride, y * stride))
        x += 1
      }
      y += 1
    }
    out
  }

  /** `(doc_id, blob BINARY)` of real PNG bytes per document — the
    * synthetic media table the image queries decode. Map-only; the blob
    * column is genuine binary (a corrupted byte fails the zlib inflate).
    */
  /** Spread an id frame over the cluster's full parallelism before a
    * CPU-heavy per-row codec stage: the ids come off a scan whose
    * partition count tracks INPUT BYTES (tiny for a long column), while
    * the generate/encode/decode work downstream is per-row compute — at
    * 32 cores a 1-4-partition scan left 28+ cores idle (measured: the
    * GIF query ran 4 tasks end-to-end). The shuffle moves 8-byte rows,
    * the heavy blob bytes are created AFTER it (guide §8: move the light
    * proxy, not the payload); `defaultParallelism` keeps the count
    * cluster-adaptive rather than a constant.
    */
  private def spreadIds(ids: DataFrame): DataFrame = {
    val df = ids.select(col("doc_id"))
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
  }

  def synthPngBlobs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = spreadIds(ids).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticImageBytes(id))
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
  }

  private val imageSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("sig", StringType)))

  /** Batched REAL image decode over `(doc_id, blob BINARY)` rows: one
    * codec init per partition, rows streamed through `ImageIO`. Output
    * `(doc_id, width, height, sig)` with `sig` the raster digest —
    * oracle-checkable when the blobs are [[synthPngBlobs]].
    */
  def decodeImageFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      ImageIO.setUseCache(false) // per-partition codec init, no disk cache
      it.map { r =>
        val id = r.getLong(0)
        val (w, h, sig) = decodeImage(r.getAs[Array[Byte]](1))
        Row(id, w, h, sig)
      }
    }
    spark.createDataFrame(rdd, imageSchema)
  }

  private val resizeImgSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("w_in", IntegerType), StructField("h_in", IntegerType),
    StructField("w_out", IntegerType), StructField("h_out", IntegerType),
    StructField("sig", StringType)))

  /** URI-based media loader — the reference's DataLoader protocol
    * (`chromadb/utils/data_loaders.py:1` ImageLoader: records carry
    * `uri` pointers, a loader fetches bytes when media is needed):
    * resolves each `(doc_id, uri)` row to its bytes executor-side, one
    * loader init per partition. The `file://` leg uses java.nio; an
    * object-store client drops into the same mapPartitions slot — the
    * media bytes never route through the driver.
    */
  def loadUris(uris: DataFrame): DataFrame = {
    val spark = uris.sparkSession
    val rdd = uris.select(col("doc_id"), col("uri")).rdd.mapPartitions { it =>
      // per-partition loader init slot (an S3/HTTP client would live here)
      it.map { r =>
        val u = java.net.URI.create(r.getString(1))
        Row(r.getLong(0),
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(u)))
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
  }

  /** 8-dim moment feature vector of a decoded grayscale raster —
    * `[w, h, Σv, Σv², Σv·x, Σv·y, max v, min v]` — the
    * feature-extraction leg of an image-similarity pipeline. Every
    * component is integer-exact arithmetic over the pixels, so for
    * [[syntheticImage]] blobs the identical vector is computable in
    * ANSI SQL from the pixel formula: the decode→featurize→KNN
    * composition gets a hash-exact oracle THROUGH the real codec.
    */
  def imageMoments(img: BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sv = 0L; var sv2 = 0L; var svx = 0L; var svy = 0L
    var mx = Int.MinValue; var mn = Int.MaxValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = img.getRGB(x, y) & 0xff
        sv += v; sv2 += v.toLong * v; svx += v.toLong * x; svy += v.toLong * y
        if (v > mx) mx = v
        if (v < mn) mn = v
        x += 1
      }
      y += 1
    }
    Array(w.toFloat, h.toFloat, sv.toFloat, sv2.toFloat, svx.toFloat,
      svy.toFloat, mx.toFloat, mn.toFloat)
  }

  private val momentSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Batched REAL decode → [[imageMoments]] featurize over image blobs —
    * the image "embedding function": map-only, codec init per partition,
    * output ready for the KNN operators.
    */
  def imageMomentFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { r =>
        Row(r.getLong(0), imageMoments(readImage(r.getAs[Array[Byte]](1))).toSeq)
      }
    }
    spark.createDataFrame(rdd, momentSchema)
  }

  /** Batched REAL decode → nearest-neighbor resize over image blobs:
    * output carries both dims and the RESIZED raster's digest. Map-only,
    * no shuffle.
    */
  def resizeImages(blobs: DataFrame, stride: Int = 2): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val img = readImage(r.getAs[Array[Byte]](1))
        val out = resizeImage(img, stride)
        Row(id, img.getWidth, img.getHeight, out.getWidth, out.getHeight,
          rasterDigest(out))
      }
    }
    spark.createDataFrame(rdd, resizeImgSchema)
  }

  /** Deterministic synthetic PCM16 clip for a document id:
    * `n = id % 50 + 20` samples at 8 kHz mono,
    * `sample(i) = ((i·31 + id·7) mod 2003) − 1001` — every audio feature
    * is a closed-form function of the id, while the bytes go through a
    * REAL WAV encode/decode (RIFF container + PCM codec via
    * `javax.sound.sampled`, which ships in every JDK — the same
    * no-external-dependency argument as the image path).
    */
  def syntheticWavSamples(docId: Long): Array[Short] = {
    val n = (docId % 50 + 20).toInt
    Array.tabulate(n)(i =>
      (((i.toLong * 31 + docId * 7) % 2003) - 1001).toShort)
  }

  /** [[syntheticWavSamples]] encoded to real WAV bytes (RIFF header +
    * 16-bit little-endian PCM) through the JDK audio writer.
    */
  def syntheticWavBytes(docId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = syntheticWavSamples(docId)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bb.array), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode via the JDK codec: RIFF parse + PCM frames through
    * `AudioSystem`, then integer-exact clip features —
    * `(sample_rate, channels, n_samples, Σv, Σv², zero-crossings, max,
    * min)` — so for [[syntheticWavSamples]] blobs the identical row is
    * computable in ANSI SQL from the sample formula. Fails LOUDLY on
    * undecodable bytes or a non-PCM16 format rather than mis-reading
    * frames.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Long, Long, Long, Long, Int, Int) = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case e: javax.sound.sampled.UnsupportedAudioFileException =>
        throw new IllegalArgumentException(
          s"undecodable audio bytes (${bytes.length} bytes, " +
            s"magic ${bytes.take(4).map("%02x".format(_)).mkString})", e)
      }
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"expected 16-bit little-endian signed PCM, got $fmt")
    val raw = ais.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var n = 0L; var sv = 0L; var sv2 = 0L; var zc = 0L
    var mx = Int.MinValue; var mn = Int.MaxValue
    var prevNeg = false
    while (bb.remaining() >= 2) {
      val v: Int = bb.getShort()
      val neg = v < 0
      if (n > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      sv += v; sv2 += v.toLong * v
      if (v > mx) mx = v
      if (v < mn) mn = v
      n += 1
    }
    (fmt.getSampleRate.toInt, fmt.getChannels, n, sv, sv2, zc, mx, mn)
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_v", LongType), StructField("sum_sq", LongType),
    StructField("n_zero_cross", LongType),
    StructField("v_max", IntegerType), StructField("v_min", IntegerType)))

  /** `(doc_id, blob BINARY)` of real WAV bytes per document. */
  // NOT spread like the image generators: the downstream decode funnels
  // through javax.sound's synchronized provider lookup, and 32-way task
  // concurrency measured 3.5x SLOWER than the 4-task scan partitioning
  // (lock contention, not CPU, bounds the audio path).
  def synthWavBlobs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col("doc_id")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticWavBytes(id))
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
  }

  /** Batched REAL WAV decode over `(doc_id, blob BINARY)` rows — the
    * audio sibling of [[decodeImageFeatures]]: map-only, codec init per
    * partition, integer-exact features out.
    */
  def decodeAudioFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      it.map { r =>
        val (rate, ch, n, sv, sv2, zc, mx, mn) =
          decodeWav(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), rate, ch, n, sv, sv2, zc, mx, mn)
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }

  /** Deterministic synthetic multi-frame media: frame `f` of doc `id`
    * has [[syntheticImage]]'s dims and pixel `v(x,y,f) = (7x + 13y + id
    * + 31f) mod 128` — closed-form for the oracle, while the bytes go
    * through a REAL animated-GIF encode. Frames are TYPE_BYTE_INDEXED on
    * an exact 256-gray palette: GIF is lossless for <= 256 colors, so
    * decode must reproduce every pixel bit-for-bit.
    */
  def syntheticGifFrame(docId: Long, f: Int): BufferedImage = {
    val w = (docId % 13 + 4).toInt
    val h = (docId % 11 + 3).toInt
    val cmap = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
    val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          ((x * 7L + y * 13L + docId + 31L * f) % 128L).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Pinned GIF frame metadata for `writer`: the JDK writer's DEFAULT
    * image metadata both interlaces (and mis-rows small interlaced
    * frames) and carries a web-cube LocalColorTable instead of the
    * image's own palette — pin the interlaceFlag off and substitute the
    * exact 256-gray table. The descriptor's dims are placeholders (the
    * writer stamps the actual raster size), so ONE metadata instance
    * serves every frame of every doc — the 256-entry DOM build happens
    * once per writer, not once per frame.
    */
  private def gifFrameMetadata(writer: javax.imageio.ImageWriter)
      : javax.imageio.metadata.IIOMetadata = {
    val md = writer.getDefaultImageMetadata(
      javax.imageio.ImageTypeSpecifier.createFromRenderedImage(
        syntheticGifFrame(0L, 0)), null)
    val fmt = md.getNativeMetadataFormatName
    val tree = md.getAsTree(fmt)
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val kids = tree.getChildNodes
    (0 until kids.getLength).foreach { i =>
      val n = kids.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      if (n.getNodeName == "ImageDescriptor")
        n.setAttribute("interlaceFlag", "FALSE")
      if (n.getNodeName == "LocalColorTable") {
        while (n.hasChildNodes) n.removeChild(n.getFirstChild)
        (0 until 256).foreach { c =>
          val e = new javax.imageio.metadata.IIOMetadataNode("ColorTableEntry")
          e.setAttribute("index", c.toString)
          e.setAttribute("red", c.toString)
          e.setAttribute("green", c.toString)
          e.setAttribute("blue", c.toString)
          n.appendChild(e)
        }
      }
    }
    md.setFromTree(fmt, tree)
    md
  }

  private def encodeGif(docId: Long, writer: javax.imageio.ImageWriter,
      md: javax.imageio.metadata.IIOMetadata): Array[Byte] = {
    val nFrames = (docId % 5 + 2).toInt
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { f =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(syntheticGifFrame(docId, f), null, md),
          null)
      }
      writer.endWriteSequence()
    } finally ios.close()
    bos.toByteArray
  }

  /** `docId % 5 + 2` [[syntheticGifFrame]]s through the JDK's REAL
    * animated-GIF sequence writer.
    */
  def syntheticGifBytes(docId: Long): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try encodeGif(docId, writer, gifFrameMetadata(writer))
    finally writer.dispose()
  }

  /** `(doc_id, blob BINARY)` of real animated-GIF bytes per document.
    * One writer + one pinned metadata instance per PARTITION — codec
    * init and the palette DOM amortize across every blob.
    */
  def synthGifBlobs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = spreadIds(ids).rdd.mapPartitions { it =>
      ImageIO.setUseCache(false)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val md = gifFrameMetadata(writer)
      it.map { r =>
        val id = r.getLong(0)
        Row(id, encodeGif(id, writer, md))
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
  }

  private val gifFrameSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("frame_idx", IntegerType),
    StructField("n_frames", IntegerType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("sig", StringType)))

  /** REAL multi-frame decode: every frame of an animated GIF through the
    * JDK's sequence reader — the true-codec replacement for the
    * byte-window [[frameSample]] stub path on a container format the JVM
    * can actually decode. One reader init per partition, frames stream
    * per row; output `(doc_id, frame_idx, n_frames, width, height, sig)`
    * with `sig` the raster digest — oracle-checkable when the blobs are
    * [[synthGifBlobs]] (lossless palette round-trip). Scales map-only.
    */
  def decodeGifFrames(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rdd = blobs.select(col("doc_id"), col("blob")).rdd.mapPartitions { it =>
      ImageIO.setUseCache(false)
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // fail LOUDLY with blob context (the readImage/decodeWav
        // convention): the reader throws bare IIOExceptions on corrupt
        // bytes, which name no document on a thousand-task run
        val ios = ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(ios, false, true)
          val n = reader.getNumImages(true)
          if (n <= 0)
            throw new IllegalArgumentException(
              s"decodeGifFrames: no frames in blob for doc $id (${bytes.length} bytes)")
          (0 until n).map { f =>
            val img = reader.read(f)
            Row(id, f, n, img.getWidth, img.getHeight, rasterDigest(img))
          }
        } catch {
          case e: java.io.IOException =>
            throw new IllegalArgumentException(
              s"decodeGifFrames: undecodable GIF blob for doc $id " +
                s"(${bytes.length} bytes): ${e.getMessage}", e)
        } finally ios.close() // the map above is strict — frames are read
      }
    }
    spark.createDataFrame(rdd, gifFrameSchema)
  }

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

}
