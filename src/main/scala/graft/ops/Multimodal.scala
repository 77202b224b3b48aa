package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata — the training-data-pipeline surface for non-text modalities.
  *
  * Design for 100 TB:
  *   - Media stays an opaque `binary` column next to typed metadata
  *     (width/height/channels/byte size/content hash). Metadata extraction
  *     is pure Catalyst byte-slicing (`substring`/`hex`/`conv`) — codegen'd,
  *     no UDF, so scans stay in whole-stage codegen and column pruning
  *     means a metadata-only query never materializes payload bytes beyond
  *     the header slice.
  *   - Content-hash dedup groups on a 16-byte key — the same map-only
  *     fingerprint + tiny-shuffle shape as text exact-dedup (Dedup.scala).
  *   - Heavy per-item decoding (pixel decode, resample, frame extraction)
  *     runs batched per partition via [[decodeImages]]/[[featuresStub]] —
  *     `mapPartitions` over (id, bytes), the Scala analogue of
  *     `mapInPandas`: one JVM-side batch per partition, no per-row setup.
  *     PNG/JPEG decode is REAL (`javax.imageio`, in the JDK); the
  *     synthetic GIMG container decodes through its header; audio/video
  *     codecs are not in this container, so those stay deterministic
  *     fakes with the real schema, batch shape, and partitioning.
  *
  * The stub container format (tests + synthetic tables):
  * `"GIMG" | width:u16be | height:u16be | channels:u8 | payload bytes`.
  */
object Multimodal {

  /** Build a stub image binary from a text payload: dims derive
    * deterministically from the payload length. Pure Catalyst. */
  def stubImage(text: Column): Column = {
    val len = octet_length(text)
    val w = len % 251 + 1
    val h = len % 127 + 1
    val c = len % 3 + 1
    concat(
      lit("GIMG".getBytes("US-ASCII")),
      unhex(lpad(hex(w), 4, "0")),
      unhex(lpad(hex(h), 4, "0")),
      unhex(lpad(hex(c), 2, "0")),
      encode(text, "UTF-8"))
  }

  /** u16/u8 big-endian header field at `pos` (1-based), parsed with
    * codegen'd byte slicing — no UDF. */
  private def beInt(bin: Column, pos: Int, len: Int): Column =
    conv(lower(hex(substring(bin, pos, len))), 16, 10).cast("int")

  def imageWidth(bin: Column): Column = beInt(bin, 5, 2)
  def imageHeight(bin: Column): Column = beInt(bin, 7, 2)
  def imageChannels(bin: Column): Column = beInt(bin, 9, 1)
  def isStubImage(bin: Column): Column =
    substring(bin, 1, 4) === lit("GIMG".getBytes("US-ASCII"))

  /** Content hash of the full binary (hex-string md5, engine-portable). */
  def contentHash(bin: Column): Column = md5(lower(hex(bin)))

  /** Typed-metadata projection over a binary column: the metadata-only
    * path a catalog scan takes (payload untouched past the header). */
  def imageMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      imageWidth(col(binCol)).as("width"),
      imageHeight(col(binCol)).as("height"),
      imageChannels(col(binCol)).as("channels"),
      octet_length(col(binCol)).as("n_bytes"),
      contentHash(col(binCol)).as("content_hash"))

  /** Exact dedup on content hash: one survivor per identical binary. */
  def dedupByContent(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol), contentHash(col(binCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** One decoded record from the batched decoder stub. */
  final case class Decoded(id: Long, width: Int, height: Int, channels: Int,
      meanByte: Double)

  /** One decoded record from the real/batched image decoder. */
  final case class DecodedImage(id: Long, format: String, width: Int,
      height: Int, channels: Int, meanPixel: Double)

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
  private def isStub(b: Array[Byte]): Boolean =
    b.length >= 9 && b(0) == 'G' && b(1) == 'I' && b(2) == 'M' && b(3) == 'G'

  /** Batched REAL image decode over partitions — PNG/JPEG through
    * `javax.imageio` (ships with the JDK: no extra dependency), the
    * synthetic GIMG container through its header, anything else a
    * zero-dim "unknown" row. Same mapPartitions batch shape as
    * [[decodeStub]]: one JVM-side batch per partition, no per-row codec
    * setup (ImageIO's reader lookup is static), payload bytes stream
    * through the partition iterator without materializing the whole
    * partition. meanPixel averages every raster sample (all bands) —
    * deterministic codec-level ground truth MultimodalSpec checks against
    * independently-constructed images. */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val ds = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        if (isPng(bytes) || isJpeg(bytes)) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"ImageIO failed to decode image id=$id")
          val r = img.getRaster
          val bands = r.getNumBands
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              var b = 0
              while (b < bands) { sum += r.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight * bands
          DecodedImage(id, if (isPng(bytes)) "png" else "jpeg",
            img.getWidth, img.getHeight, bands,
            if (n > 0) sum.toDouble / n else 0.0)
        } else if (isStub(bytes)) {
          val bb = java.nio.ByteBuffer.wrap(bytes)
          val w = bb.getShort(4) & 0xffff
          val h = bb.getShort(6) & 0xffff
          val c = bb.get(8) & 0xff
          var sum = 0L
          var i = 9
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          val mean =
            if (bytes.length > 9) sum.toDouble / (bytes.length - 9) else 0.0
          DecodedImage(id, "stub", w, h, c, mean)
        } else DecodedImage(id, "unknown", 0, 0, 0, 0.0)
      }
    }(Encoders.product[DecodedImage]).toDF()
  }

  /** One perceptual-hash record from [[imageAHash]]. */
  final case class ImageHash(id: Long, fp: Long)

  /** Batched perceptual average-hash (aHash) over partitions: the sample
    * stream (decoded raster samples for real PNG/JPEG, payload bytes for
    * the GIMG container) splits into 60 contiguous chunks; bit i of the
    * fingerprint is set iff chunk i's mean ≥ the overall mean. 60 bits
    * keep the fingerprint positive in a signed 64-bit carrier (the d04b
    * trick), and the comparison is INTEGER cross-multiplication
    * (sum_i·n ≥ total·cnt_i) — no float anywhere, so a SQL oracle
    * reproduces every bit.
    *
    * This is the image analogue of SimHash: near-identical images (same
    * bytes reordered locally, small payload edits) land within a small
    * Hamming distance, and the SAME pigeonhole chunk join
    * ([[Dedup.simhashPairsOfFps]]) that powers text near-dup turns the
    * fingerprints into candidate pairs without an all-pairs join. */
  def imageAHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val ds = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        val samples: Array[Int] =
          if (isPng(bytes) || isJpeg(bytes)) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            require(img != null, s"ImageIO failed to decode image id=$id")
            val r = img.getRaster
            val bands = r.getNumBands
            val out = new Array[Int](img.getWidth * img.getHeight * bands)
            var k = 0; var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                var b = 0
                while (b < bands) { out(k) = r.getSample(x, y, b); k += 1; b += 1 }
                x += 1
              }
              y += 1
            }
            out
          } else if (isStub(bytes)) {
            val out = new Array[Int](math.max(0, bytes.length - 9))
            var i = 9
            while (i < bytes.length) { out(i - 9) = bytes(i) & 0xff; i += 1 }
            out
          } else Array.empty[Int]
        val n = samples.length
        var total = 0L
        var i = 0
        while (i < n) { total += samples(i); i += 1 }
        var fp = 0L
        var c = 0
        while (c < 60) {
          val lo = (c.toLong * n / 60).toInt
          val hi = ((c + 1).toLong * n / 60).toInt
          var s = 0L
          var j = lo
          while (j < hi) { s += samples(j); j += 1 }
          val cnt = hi - lo
          if (cnt > 0 && mulCmpGE(s, n, total, cnt)) fp |= 1L << c
          c += 1
        }
        ImageHash(id, fp)
      }
    }(Encoders.product[ImageHash]).toDF()
  }

  /** 128-bit compare a·b ≥ c·d for non-negative longs. The aHash bit test
    * cross-multiplies chunk sums against the total — at ~1.5e9 samples
    * (a ≈ 500-megapixel RGB image) the 64-bit products would overflow and
    * silently corrupt fingerprint bits, so compare the full 128-bit
    * products via Math.multiplyHigh (one instruction on modern JVMs). */
  private[graft] def mulCmpGE(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(lo1, lo2) >= 0
  }

  /** Deterministic synthetic REAL PNGs: for each id an 8-bit grayscale
    * image of id-derived dims (w = 16 + id%17, h = 16 + id%13) whose pixel
    * (x, y) is the pure integer formula (id·5 + x·7 + y·11 + x·y) mod 256,
    * encoded through the actual `javax.imageio` PNG writer in the same
    * batched mapPartitions stage the decoders use. PNG is lossless, so
    * everything downstream of [[decodeImages]]/[[resizeImages]]/
    * [[imageAHash]]'s ImageIO DECODE branch — the production path for
    * real corpora — is value-checkable by a SQL oracle that replays the
    * pixel formula and never touches a PNG byte (an encode→decode→
    * resample loop check, not a golden-file check). */
  def syntheticPngs(df: DataFrame, idCol: String): DataFrame = {
    val ds = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    ds.mapPartitions { ids =>
      ids.map { id =>
        val w = 16 + (id % 17).toInt
        val h = 16 + (id % 13).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            r.setSample(x, y, 0,
              ((id * 5 + x * 7L + y * 11L + x.toLong * y) % 256).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("id", "img")
  }

  /** Batched "pixel decode" over partitions — the mapInPandas-shaped
    * stage. The pixel step is a DETERMINISTIC FAKE (header parse + payload
    * byte mean standing in for a real codec); batching, schema, and
    * partitioning are real. */
  def decodeStub(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val ds = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        val bb = java.nio.ByteBuffer.wrap(bytes)
        require(bytes.length >= 9 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'M' && bytes(3) == 'G', s"not a stub image (id=$id)")
        val w = bb.getShort(4) & 0xffff
        val h = bb.getShort(6) & 0xffff
        val c = bb.get(8) & 0xff
        var sum = 0L
        var i = 9
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        val mean = if (bytes.length > 9) sum.toDouble / (bytes.length - 9) else 0.0
        Decoded(id, w, h, c, mean)
      }
    }(Encoders.product[Decoded]).toDF()
  }

  /** One resized-thumbnail record from [[resizeImages]]. */
  final case class Resized(id: Long, outW: Int, outH: Int, meanPixel: Double,
      corner: Long)

  /** Batched resize to a fixed `outW`×`outH` thumbnail — the
    * normalization step before a vision encoder. Real for PNG/JPEG:
    * decode via ImageIO, nearest-neighbor sample the raster's first band
    * (deterministic — no interpolation filter variance across JVMs); the
    * GIMG container nearest-neighbor samples its payload bytes through
    * the SAME index map, so the synthetic table's thumbnails are exactly
    * SQL-reproducible. Emits the thumbnail's mean pixel and its first
    * 8 samples packed big-endian (`corner`) — the verifiable summary of
    * the resampled grid (a full pixel array would bloat the oracle).
    * Same mapPartitions batch shape as [[decodeImages]]. */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
      outW: Int = 8, outH: Int = 8): DataFrame = {
    val ds = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        // source sample grid: (w, h, sample accessor)
        val (w, h, at): (Int, Int, (Int, Int) => Int) =
          if (isPng(bytes) || isJpeg(bytes)) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            require(img != null, s"ImageIO failed to decode image id=$id")
            val r = img.getRaster
            (img.getWidth, img.getHeight, (x, y) => r.getSample(x, y, 0))
          } else if (isStub(bytes)) {
            val bb = java.nio.ByteBuffer.wrap(bytes)
            val sw = math.max(1, bb.getShort(4) & 0xffff)
            val n = bytes.length - 9
            if (n <= 0) (0, 0, (_, _) => 0)
            else {
              // payload laid out row-major at the header width; height =
              // ceil(n / w), truncated grid (last partial row dropped)
              val sh = math.max(1, n / sw)
              (math.min(sw, n), sh, (x, y) => bytes(9 + y * sw + x) & 0xff)
            }
          } else (0, 0, (_, _) => 0)
        if (w == 0 || h == 0) Resized(id, outW, outH, 0.0, 0L)
        else {
          var sum = 0L
          var corner = 0L
          var k = 0
          var oy = 0
          while (oy < outH) {
            val sy = (oy.toLong * h / outH).toInt
            var ox = 0
            while (ox < outW) {
              val sx = (ox.toLong * w / outW).toInt
              val v = at(sx, sy)
              sum += v
              if (k < 8) corner = (corner << 8) | (v & 0xff)
              k += 1
              ox += 1
            }
            oy += 1
          }
          Resized(id, outW, outH, sum.toDouble / (outW * outH), corner)
        }
      }
    }(Encoders.product[Resized]).toDF()
  }

  /** One sampled-frame record from [[sampleFrames]]. */
  final case class Frame(id: Long, frameIdx: Int, frameHash: String)

  /** Batched frame sampling over a "video" binary — uniformly pick
    * `k` frames. No video codecs ship in this container (documented
    * honest stub), so the frame SPLIT is the deterministic fake: the
    * payload divides into fixed `frameBytes` frames; the SAMPLING math
    * (uniform index map i ↦ ⌊i·nFrames/k⌋) and the batch shape are the
    * real thing, and each emitted frame is identified by its md5 — all
    * SQL-reproducible. Emits fewer rows when the clip has < k frames. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      k: Int = 4, frameBytes: Int = 16): DataFrame = {
    val ds = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { batch =>
      batch.flatMap { case (id, bytes) =>
        val payloadOff = if (isStub(bytes)) 9 else 0
        val n = (bytes.length - payloadOff) / frameBytes
        if (n <= 0) Iterator.empty
        else {
          val picks = (0 until math.min(k, n))
            .map(i => (i.toLong * n / math.min(k, n)).toInt).distinct
          picks.iterator.map { f =>
            // frame identity = md5 of the frame's LOWERCASE HEX (the
            // contentHash convention — SQL engines can't slice blobs
            // portably, hex text they can)
            val off = payloadOff + f * frameBytes
            val hx = bytes.slice(off, off + frameBytes)
              .map(b => f"${b & 0xff}%02x").mkString
            val md = java.security.MessageDigest.getInstance("MD5")
            md.update(hx.getBytes("US-ASCII"))
            Frame(id, f, md.digest().map(b => f"${b & 0xff}%02x").mkString)
          }
        }
      }
    }(Encoders.product[Frame]).toDF()
  }

  /** Batched feature extraction: normalized 16-bin byte histogram of the
    * payload — a deterministic stand-in for an embedding model, with the
    * real output shape (fixed-size float vector per item). */
  def featuresStub(df: DataFrame, idCol: String, binCol: String,
      bins: Int = 16): DataFrame = {
    val ds = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    val rowEnc = Encoders.row(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false)))))
    ds.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        val hist = new Array[Float](bins)
        var i = 9
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) * bins / 256) += 1f
          i += 1
        }
        val n = math.max(1, bytes.length - 9).toFloat
        var b = 0
        while (b < bins) { hist(b) /= n; b += 1 }
        Row(id, hist.toSeq)
      }
    }(rowEnc).toDF()
  }
}
