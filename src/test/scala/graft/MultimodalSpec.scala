package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def imgs = Seq(
    (1L, "hello world"),
    (2L, "hello world"),          // exact duplicate payload
    (3L, "a much longer payload with different bytes entirely"),
    (4L, "")).toDF("id", "text")
    .select(col("id"), Multimodal.stubImage(col("text")).as("img"))

  test("header parse (Catalyst) inverts the stub encoder") {
    val meta = Multimodal.imageMeta(imgs, "id", "img").orderBy("id").collect()
    // dims derive from payload byte length: len%251+1, len%127+1, len%3+1
    val lens = Seq(11, 11, 51, 0)
    meta.zip(lens).foreach { case (r, len) =>
      assert(r.getInt(1) == len % 251 + 1, "width")
      assert(r.getInt(2) == len % 127 + 1, "height")
      assert(r.getInt(3) == len % 3 + 1, "channels")
      assert(r.getInt(4) == len + 9, "n_bytes")
    }
  }

  test("batched decode stub parses the same header values") {
    val dec = Multimodal.decodeStub(imgs, "id", "img").orderBy("id").collect()
    assert(dec.map(_.getInt(1)).toSeq == Seq(12, 12, 52, 1)) // widths
    assert(dec.map(_.getInt(3)).toSeq == Seq(3, 3, 1, 1))    // channels
    // identical payloads → identical fake decode output
    assert(dec(0).getDouble(4) == dec(1).getDouble(4))
  }

  test("feature stub: fixed-size normalized histogram, deterministic") {
    val f = Multimodal.featuresStub(imgs, "id", "img").orderBy("id").collect()
    f.foreach { r =>
      val hist = r.getSeq[Float](1)
      assert(hist.length == 16)
      if (r.getLong(0) != 4L)
        assert(math.abs(hist.sum - 1.0f) < 1e-5, s"not normalized: $hist")
    }
    val f2 = Multimodal.featuresStub(imgs, "id", "img").orderBy("id").collect()
    assert(f.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
  }

  test("content-hash dedup groups identical binaries only") {
    val d = Multimodal.dedupByContent(imgs, "id", "img")
      .orderBy("keep_id").collect()
    assert(d.length == 3)
    val dupGroup = d.find(_.getLong(1) == 1L).get
    assert(dupGroup.getLong(2) == 2L) // ids 1 and 2 merged
  }

  test("real PNG decode via javax.imageio matches ground truth") {
    import java.awt.image.BufferedImage
    // independently-constructed PNGs: known dims and exact pixel values,
    // so width/height/channels/meanPixel have a closed-form ground truth
    def png(w: Int, h: Int, tpe: Int, px: (Int, Int) => Int): (Array[Byte], Double) = {
      val img = new BufferedImage(w, h, tpe)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val r = img.getRaster
      val n = w.toLong * h * r.getNumBands
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w; b <- 0 until r.getNumBands)
        sum += r.getSample(x, y, b)
      (bos.toByteArray, sum.toDouble / n)
    }
    // 3-band RGB gradient + 1-band gray checkerboard
    val (rgb, rgbMean) = png(20, 10, BufferedImage.TYPE_INT_RGB,
      (x, y) => (x * 12 << 16) | (y * 25 << 8) | ((x + y) * 7))
    val (gray, grayMean) = png(7, 5, BufferedImage.TYPE_BYTE_GRAY,
      (x, y) => if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val stub = Seq(("payload-text", 3L)).toDF("text", "id")
      .select(col("id"), Multimodal.stubImage(col("text")).as("img"))
      .select(col("id"), col("img")).as[(Long, Array[Byte])].head()
    val df = Seq((1L, rgb), (2L, gray), stub, (4L, Array[Byte](9, 9, 9, 9)))
      .toDF("id", "img")
    val got = Multimodal.decodeImages(df, "id", "img")
      .orderBy("id").collect()
    // PNG RGB: dims, 3 bands, exact sample mean
    assert(got(0).getString(1) == "png" && got(0).getInt(2) == 20 &&
      got(0).getInt(3) == 10 && got(0).getInt(4) == 3)
    assert(math.abs(got(0).getDouble(5) - rgbMean) < 1e-12)
    // PNG gray: 1 band, checkerboard mean
    assert(got(1).getString(1) == "png" && got(1).getInt(2) == 7 &&
      got(1).getInt(3) == 5 && got(1).getInt(4) == 1)
    assert(math.abs(got(1).getDouble(5) - grayMean) < 1e-12)
    // stub container still decodes through its header
    assert(got(2).getString(1) == "stub" && got(2).getInt(2) > 0)
    // unknown bytes neither throw nor lie
    assert(got(3).getString(1) == "unknown" && got(3).getInt(2) == 0)
  }

  test("real PNG resize: nearest-neighbor thumbnail matches closed-form samples") {
    import java.awt.image.BufferedImage
    // 16×16 gray gradient v(x,y) = x*10 + y: nearest-neighbor 8×8 picks
    // source (2x, 2y), so thumb(x,y) = 20x + 2y exactly
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = x * 10 + y
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "img")
    val got = Multimodal.resizeImages(df, "id", "img").collect().head
    // expectations from independent raster reads at the nearest-neighbor
    // source coordinates (2x, 2y) — setRGB's gray conversion is not the
    // identity, so closed-form v(x,y) values would not match the codec
    val r = img.getRaster
    val exp = for (y <- 0 until 8; x <- 0 until 8) yield r.getSample(2 * x, 2 * y, 0)
    assert(math.abs(got.getDouble(3) - exp.sum.toDouble / 64) < 1e-12)
    // corner = first 8 thumbnail samples of row 0 packed big-endian
    val corner = (0 until 8).foldLeft(0L)((a, x) =>
      (a << 8) | (r.getSample(2 * x, 0, 0) & 0xff).toLong)
    assert(got.getLong(4) == corner)
  }

  test("frame sampling picks uniform, deterministic frame indices") {
    // 64-byte payload → 4 frames of 16; k=4 picks all of 0..3; a stub
    // header must be skipped
    val payload = Array.tabulate[Byte](64)(i => i.toByte)
    val stub = "GIMG".getBytes("US-ASCII") ++
      Array[Byte](0, 4, 0, 4, 1) ++ payload
    val df = Seq((1L, stub), (2L, payload ++ payload)).toDF("id", "clip")
    val got = Multimodal.sampleFrames(df, "id", "clip", k = 4, frameBytes = 16)
      .select("id", "frameIdx").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    assert(got(1L) == List(0, 1, 2, 3))
    // 128-byte raw clip → 8 frames, uniform pick 0,2,4,6
    assert(got(2L) == List(0, 2, 4, 6))
  }

  test("aHash: identical PNGs collide, one-pixel edit stays near, inverse is far") {
    import java.awt.image.BufferedImage
    def png(px: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def grad(x: Int, y: Int) = { val v = x * 16 + y * 3; (v << 16) | (v << 8) | v }
    val base = png(grad)
    val same = png(grad)
    val edit = png((x, y) => if (x == 3 && y == 3) 0xffffff else grad(x, y))
    val inv = png((x, y) => { val v = 255 - (x * 16 + y * 3); (v << 16) | (v << 8) | v })
    val df = Seq((1L, base), (2L, same), (3L, edit), (4L, inv)).toDF("id", "img")
    val fp = Multimodal.imageAHash(df, "id", "img")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L), "identical images must hash identically")
    val near = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val far = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(near <= 3, s"one-pixel edit moved $near bits")
    assert(far > 20, s"inverted image only $far bits away")
  }

  test("isStubImage gates on the magic") {
    val flags = imgs.select(Multimodal.isStubImage(col("img"))).as[Boolean].collect()
    assert(flags.forall(identity))
    val not = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(Multimodal.isStubImage(col("b"))).as[Boolean].head()
    assert(!not)
  }

  test("aHash 128-bit compare is exact past the 64-bit product overflow") {
    // the regime a ~500-megapixel image reaches: s·n and total·cnt exceed
    // Long range, where the old `s * n >= total * cnt` wrapped negative
    val big = 3_100_000_000L // s·n ≈ 9.61e18 > Long.MaxValue ≈ 9.22e18
    assert(Multimodal.mulCmpGE(big, big, big, big))           // equal
    assert(Multimodal.mulCmpGE(big, big, big - 1, big))       // strictly >
    assert(!Multimodal.mulCmpGE(big - 1, big, big, big))      // strictly <
    // naive comparison would get this one wrong: lhs wraps negative while
    // rhs stays positive
    assert(big * big < 0 && Multimodal.mulCmpGE(big, big, 2L, 3L))
    // and the non-overflow regime is unchanged
    assert(Multimodal.mulCmpGE(6L, 7L, 42L, 1L))
    assert(!Multimodal.mulCmpGE(6L, 7L, 43L, 1L))
  }

  test("synthetic PNG encode→decode round-trips the pixel formula") {
    // PNG is lossless: the decoded raster must equal the generator formula
    // sample-for-sample (the independence claim m06b's oracle rests on)
    val pngs = Multimodal.syntheticPngs(Seq(7L, 23L).toDF("doc_id"), "doc_id")
      .as[(Long, Array[Byte])].collect().toMap
    for ((id, bytes) <- pngs) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (16 + (id % 17).toInt, 16 + (id % 13).toInt)
      assert(img.getWidth == w && img.getHeight == h)
      assert(img.getRaster.getNumBands == 1)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) ==
          ((id * 5 + x * 7L + y * 11L + x.toLong * y) % 256).toInt,
          s"pixel ($x,$y) of image $id")
    }
  }
}
