package graft

import graft.functions.EmbeddingFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("hashed-BoW embedding is deterministic, unit-norm, right dim") {
    val ef = EmbeddingFunctions.registry("hashed_bow_64")
    val docs = Tables.documents(spark, sf).limit(50)
    val e1 = docs.select(col("doc_id"), ef.embed(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val e2 = docs.select(col("doc_id"), ef.embed(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(e1 == e2)
    assert(e1.values.forall(_.length == 64))
    e1.values.foreach { v =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm != 1")
    }
  }

  test("real WAV decode round-trips format and every sample's statistics") {
    import graft.operators.Multimodal
    for (id <- Seq(0L, 7L, 49L, 123L)) {
      val bytes = Multimodal.syntheticWavBytes(id)
      // the blob is a genuine RIFF container, not raw samples
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      val (rate, ch, n, sv, sv2, zc, mx, mn) = Multimodal.decodeWav(bytes)
      val s = Multimodal.syntheticWavSamples(id).map(_.toInt)
      assert(rate == 8000 && ch == 1 && n == s.length)
      assert(sv == s.map(_.toLong).sum && sv2 == s.map(v => v.toLong * v).sum)
      assert(zc == s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
      assert(mx == s.max && mn == s.min)
    }
    // undecodable bytes fail loudly, naming the blob's shape
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeWav(Array[Byte](1, 2, 3, 4, 5)))
    assert(e.getMessage.contains("undecodable audio"))
  }

  test("video-frame decode stub is pure and deterministic") {
    val bytes = "hello world".getBytes("UTF-8")
    val (w, h, sig) = graft.operators.Multimodal.decodeStub(bytes)
    assert((w, h) == (bytes.length % 64 + 1, bytes.length / 64 + 1))
    assert(sig == java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString)
  }

  test("real animated-GIF decode round-trips every frame's pixels") {
    import graft.operators.Multimodal
    // GIF is lossless at <= 256 colors, so each decoded frame must
    // reproduce its source raster exactly — including the metadata
    // pins (interlace off, exact gray LocalColorTable) the writer needs
    for (id <- Seq(0L, 1L, 7L, 42L, 143L)) {
      val bytes = Multimodal.syntheticGifBytes(id)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)), false, true)
      val n = reader.getNumImages(true)
      assert(n == (id % 5 + 2).toInt, s"id=$id frame count")
      (0 until n).foreach { f =>
        assert(Multimodal.rasterDigest(reader.read(f)) ==
          Multimodal.rasterDigest(Multimodal.syntheticGifFrame(id, f)),
          s"id=$id frame=$f raster")
      }
    }
  }

  test("real PNG/BMP decode round-trips dims and every pixel") {
    import graft.operators.Multimodal
    for (id <- Seq(0L, 1L, 7L, 42L, 143L)) {
      val img = Multimodal.syntheticImage(id)
      val (ew, eh) = ((id % 13 + 4).toInt, (id % 11 + 3).toInt)
      assert((img.getWidth, img.getHeight) == (ew, eh))
      for (fmt <- Seq("png", "bmp")) {
        // genuine encode → genuine decode: deflate/filters (PNG) or
        // DIB rows (BMP) through javax.imageio, not a byte echo
        val bytes = Multimodal.syntheticImageBytes(id, fmt)
        val (w, h, sig) = Multimodal.decodeImage(bytes)
        assert((w, h) == (ew, eh), s"$fmt dims for id=$id")
        assert(sig == Multimodal.rasterDigest(img), s"$fmt digest for id=$id")
        // decoded pixels equal the generator formula exactly
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        for (y <- 0 until eh; x <- 0 until ew)
          assert((back.getRGB(x, y) & 0xff) == ((x * 7 + y * 13 + id) % 128),
            s"$fmt pixel ($x,$y) id=$id")
      }
    }
    // corrupted bytes fail the real codec, not silently decode
    val broken = Multimodal.syntheticImageBytes(7L).take(20)
    intercept[Exception] { Multimodal.decodeImage(broken) }
  }

  test("nearest-neighbor resize samples (x*stride, y*stride) exactly") {
    import graft.operators.Multimodal
    val id = 42L
    val img = Multimodal.syntheticImage(id)
    val out = Multimodal.resizeImage(img, 2)
    assert(out.getWidth == (img.getWidth + 1) / 2)
    assert(out.getHeight == (img.getHeight + 1) / 2)
    for (y <- 0 until out.getHeight; x <- 0 until out.getWidth)
      assert(out.getRGB(x, y) == img.getRGB(x * 2, y * 2))
  }

  test("image moments are integer-exact and match a direct pixel computation") {
    import graft.operators.Multimodal
    val id = 42L
    val img = Multimodal.syntheticImage(id)
    val (w, h) = (img.getWidth, img.getHeight)
    val px = for (y <- 0 until h; x <- 0 until w)
      yield (x, y, ((x * 7 + y * 13 + id) % 128).toInt)
    val expect = Array[Float](w, h, px.map(_._3).sum,
      px.map(p => p._3 * p._3).sum, px.map(p => p._3 * p._1).sum,
      px.map(p => p._3 * p._2).sum, px.map(_._3).max, px.map(_._3).min)
    assert(Multimodal.imageMoments(img).toSeq == expect.toSeq)
    // through the real codec too
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.syntheticImageBytes(id)))
    assert(Multimodal.imageMoments(back).toSeq == expect.toSeq)
  }

  test("uri loader fetches executor-side bytes identical to inline blobs") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mm_uris")
    val ids = Seq(3L, 17L, 99L)
    ids.foreach { id =>
      java.nio.file.Files.write(dir.resolve(s"$id.png"),
        Multimodal.syntheticImageBytes(id))
    }
    import SparkTestSession.spark.implicits._
    val uris = ids.toDF("doc_id")
      .select(col("doc_id"),
        concat(lit(s"file://$dir/"), col("doc_id"), lit(".png")).as("uri"))
    val got = Multimodal.decodeImageFeatures(Multimodal.loadUris(uris))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    ids.foreach { id =>
      val (w, h, sig) = Multimodal.decodeImage(Multimodal.syntheticImageBytes(id))
      assert(got(id) == ((w, h, sig)), s"id=$id")
    }
  }

  test("distributed decode over blob column matches driver-side codec") {
    import graft.operators.Multimodal
    val ids = Tables.documents(spark, sf).select(col("doc_id")).limit(20)
    val got = Multimodal.decodeImageFeatures(Multimodal.synthPngBlobs(ids))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    got.foreach { case (id, (w, h, sig)) =>
      val (ew, eh, esig) = Multimodal.decodeImage(
        Multimodal.syntheticImageBytes(id))
      assert((w, h, sig) == (ew, eh, esig), s"id=$id")
    }
  }
}
