package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal}

/** Multimodal binary-column operators over a synthetic image table derived
  * deterministically from documents (real binary media is container-less
  * here; see [[graft.ops.Multimodal]] for the format and scale rationale).
  *
  * The oracle derives the expected metadata independently (from the text
  * the stub encodes), so a bug in either the binary construction or the
  * header byte-parsing shows up as a mismatch.
  */
object MultimodalQueries {

  val entries: Seq[QueryDef] = Seq(
    // ---- m01: typed metadata extraction from an opaque binary column —
    // codegen'd byte slicing, payload untouched past the header
    QueryDef(
      "m01_image_meta",
      (s, d) => {
        val imgs = Tables.documents(s, d)
          .select(col("doc_id"), Multimodal.stubImage(col("text")).as("img"))
        Multimodal.imageMeta(imgs, "doc_id", "img").orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          octet_length(encode(text)) % 251 + 1 AS width,
          octet_length(encode(text)) % 127 + 1 AS height,
          octet_length(encode(text)) % 3 + 1 AS channels,
          octet_length(encode(text)) + 9 AS n_bytes,
          md5(lower(hex(
            encode('GIMG')
            || unhex(lpad(hex(octet_length(encode(text)) % 251 + 1), 4, '0'))
            || unhex(lpad(hex(octet_length(encode(text)) % 127 + 1), 4, '0'))
            || unhex(lpad(hex(octet_length(encode(text)) % 3 + 1), 2, '0'))
            || encode(text)))) AS content_hash
        FROM documents ORDER BY doc_id""")),

    // ---- m02: exact dedup of binary payloads on the 16-byte content hash
    // (map-only hash + tiny shuffle, same shape as d01 at 100 TB)
    QueryDef(
      "m02_binary_dedup",
      (s, d) => {
        val imgs = Tables.documents(s, d)
          .select(col("doc_id"), Multimodal.stubImage(col("text")).as("img"))
        Multimodal.dedupByContent(imgs, "doc_id", "img")
          .orderBy("content_hash")
      },
      Some("""SELECT md5(lower(hex(
            encode('GIMG')
            || unhex(lpad(hex(octet_length(encode(text)) % 251 + 1), 4, '0'))
            || unhex(lpad(hex(octet_length(encode(text)) % 127 + 1), 4, '0'))
            || unhex(lpad(hex(octet_length(encode(text)) % 3 + 1), 2, '0'))
            || encode(text)))) AS content_hash,
          MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // ---- m03: the batched image-decode stage (mapPartitions, the
    // mapInPandas-shaped path) driven end-to-end: every synthetic GIMG
    // container decodes through the SAME decodeImages entry point that
    // handles real PNG/JPEG via javax.imageio (codec-level ground truth
    // for those lives in MultimodalSpec — SQL cannot rasterize). The
    // oracle re-derives format/dims/mean-payload-byte independently from
    // the text the stub encodes, so a break in either the container
    // construction or the decoder's header/byte walk turns the row red.
    QueryDef(
      "m03_image_decode",
      (s, d) => {
        val imgs = Tables.documents(s, d)
          .select(col("doc_id"), Multimodal.stubImage(col("text")).as("img"))
        Multimodal.decodeImages(imgs, "doc_id", "img")
          .select(col("id").as("doc_id"), col("format"), col("width"),
            col("height"), col("channels"), col("meanPixel").as("mean_pixel"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'stub' AS format,
          octet_length(encode(text)) % 251 + 1 AS width,
          octet_length(encode(text)) % 127 + 1 AS height,
          octet_length(encode(text)) % 3 + 1 AS channels,
          CASE WHEN octet_length(encode(text)) > 0 THEN
            CAST(list_sum(list_transform(range(1, octet_length(encode(text)) + 1),
              i -> CAST(concat('0x', substring(hex(encode(text)), 2*i-1, 2)) AS BIGINT))) AS DOUBLE)
              / octet_length(encode(text))
          ELSE 0.0 END AS mean_pixel
        FROM documents ORDER BY doc_id""")),

    // ---- m04: perceptual average-hash (aHash) per image — 60-bit
    // fingerprint from chunked sample means, computed in the SAME batched
    // decode stage (raster samples for PNG/JPEG, payload bytes for GIMG).
    // The bit test is integer cross-multiplication, so DuckDB recomputes
    // every fingerprint bit-for-bit from the payload hex.
    QueryDef(
      "m04_image_ahash",
      (s, d) => {
        val imgs = Tables.documents(s, d)
          .select(col("doc_id"), Multimodal.stubImage(col("text")).as("img"))
        Multimodal.imageAHash(imgs, "doc_id", "img")
          .select(col("id").as("doc_id"), col("fp"))
          .orderBy("doc_id")
      },
      Some(ahashSql("SELECT doc_id, text FROM documents") +
        " SELECT doc_id, fp FROM f ORDER BY doc_id")),

    // ---- m05: image near-dup pairs — the pigeonhole chunk join
    // (Dedup.simhashPairsOfFps, the d04 production operator) over aHash
    // fingerprints: operator reuse across modalities. The input plants
    // its own near-dups (single-byte-edited copies of images 0–49, ids
    // +100000 — the image-world "one pixel changed"); the oracle
    // recomputes fingerprints AND the brute-force Hamming pair set
    // (provably equal to the chunk join's by the pigeonhole identity).
    QueryDef(
      "m05_image_neardup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val edited = docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"),
            expr("concat(substring(text, 1, length(text)-1), '!')").as("text"))
        val imgs = docs.select(col("doc_id"), col("text")).unionByName(edited)
          .select(col("doc_id"), Multimodal.stubImage(col("text")).as("img"))
        Dedup.simhashPairsOfFps(
            Multimodal.imageAHash(imgs, "doc_id", "img"), maxHamming = 3)
          .select(col("id_a"), col("id_b"),
            col("hamming").cast("long").as("hamming"))
          .orderBy("id_a", "id_b")
      },
      Some(ahashSql("""SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 100000,
            substring(text, 1, length(text)-1) || '!' FROM documents
          WHERE doc_id < 50""") +
        """ SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        FROM f a JOIN f b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
        ORDER BY id_a, id_b""")),

    m06, m06b, m07
  )

  /** m06: fixed-grid nearest-neighbor resize (8×8 thumbnail) in the
    * batched decode stage — real ImageIO raster sampling for PNG/JPEG
    * (spec'd in MultimodalSpec), the GIMG payload grid here, same index
    * map, so DuckDB replays every sampled byte: thumbnail mean and the
    * first-row corner pack are value-checked. Oracle assumes non-empty
    * payloads (true of the synthetic table at every SF). */
  private lazy val m06 = QueryDef(
    "m06_image_resize",
    (s, d) => {
      val imgs = Tables.documents(s, d)
        .select(col("doc_id"), Multimodal.stubImage(col("text")).as("img"))
      Multimodal.resizeImages(imgs, "doc_id", "img")
        .select(col("id").as("doc_id"), col("outW").as("out_w"),
          col("outH").as("out_h"),
          round(col("meanPixel"), 9).as("mean_pixel"), col("corner"))
        .orderBy("doc_id")
    },
    Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
          octet_length(encode(text)) AS n,
          octet_length(encode(text)) % 251 + 1 AS sw FROM documents),
      g AS (SELECT doc_id, sw, hx, least(sw, n) AS w,
          greatest(1, n // sw) AS h FROM b),
      s AS (SELECT doc_id,
          [CAST(concat('0x', substring(hx,
             2 * ((((i // 8) * h) // 8) * sw + (((i % 8) * w) // 8)) + 1, 2)) AS BIGINT)
           for i in range(0, 64)] AS px FROM g)
      SELECT doc_id, 8 AS out_w, 8 AS out_h,
        ROUND(CAST(list_sum(px) AS DOUBLE) / 64, 9) AS mean_pixel,
        list_reduce(list_prepend(CAST(0 AS BIGINT), px[1:8]),
          (a, x) -> a * 256 + x) AS corner
      FROM s ORDER BY doc_id"""))

  /** m06b: the REAL-codec path at oracle breadth — 48 actual PNGs
    * (deterministic grayscale pixel formula, encoded by the real ImageIO
    * PNG writer in [[graft.ops.Multimodal.syntheticPngs]]) run through the
    * PRODUCTION ImageIO DECODE branches of resizeImages (8×8 nearest-
    * neighbor thumbnail) and imageAHash (60-bit chunked-mean fingerprint).
    * PNG is lossless, so the DuckDB oracle replays the pixel FORMULA at
    * the sampled coordinates — it never sees a PNG byte — which makes
    * this an independent end-to-end check of encode → decode → resample →
    * hash, not a golden-file comparison. (The corner pack can set bit 63:
    * the oracle folds in HUGEINT and converts to the signed-64 wrap the
    * Scala `<< 8 |` accumulator produces.) */
  private lazy val m06b = QueryDef(
    "m06b_real_png_resize",
    (s, d) => {
      val pngs = Multimodal.syntheticPngs(
        Tables.documents(s, d).filter(col("doc_id") < 48), "doc_id")
      val rs = Multimodal.resizeImages(pngs, "id", "img")
        .select(col("id").as("doc_id"),
          round(col("meanPixel"), 9).as("mean_pixel"), col("corner"))
      val ah = Multimodal.imageAHash(pngs, "id", "img")
        .select(col("id").as("doc_id"), col("fp"))
      rs.join(ah, Seq("doc_id")).orderBy("doc_id")
    },
    Some("""WITH ids AS (SELECT doc_id, 16 + doc_id % 17 AS w,
          16 + doc_id % 13 AS h FROM documents WHERE doc_id < 48),
      thumb AS (SELECT doc_id,
          [ (doc_id*5 + (((i % 8) * w) // 8) * 7 + (((i // 8) * h) // 8) * 11
             + (((i % 8) * w) // 8) * (((i // 8) * h) // 8)) % 256
            for i in range(0, 64)] AS px FROM ids),
      pix AS (SELECT doc_id, w * h AS n,
          [ (doc_id*5 + (i % w) * 7 + (i // w) * 11 + (i % w) * (i // w)) % 256
            for i in range(0, w * h)] AS arr FROM ids),
      t AS (SELECT doc_id, n, arr, list_sum(arr) AS total FROM pix),
      f AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), c ->
          CASE WHEN ((c+1)*n)//60 - (c*n)//60 > 0
            AND COALESCE(list_sum(arr[(c*n)//60 + 1 : ((c+1)*n)//60]), 0) * n
                >= total * (((c+1)*n)//60 - (c*n)//60)
          THEN (CAST(1 AS BIGINT) << c) ELSE 0 END)) AS BIGINT) AS fp FROM t),
      rs AS (SELECT doc_id,
          ROUND(CAST(list_sum(px) AS DOUBLE) / 64, 9) AS mean_pixel,
          list_reduce(list_prepend(CAST(0 AS HUGEINT),
            [CAST(x AS HUGEINT) for x in px[1:8]]),
            (a, x) -> a * 256 + x) AS chuge FROM thumb)
      SELECT rs.doc_id, rs.mean_pixel,
        CAST(CASE WHEN chuge >= 9223372036854775808 THEN
          chuge - 18446744073709551616 ELSE chuge END AS BIGINT) AS corner,
        f.fp
      FROM rs JOIN f USING (doc_id) ORDER BY rs.doc_id"""))

  /** m07: uniform frame sampling over a "video" binary — the frame split
    * is the documented deterministic stub (no codecs in the container);
    * the uniform pick math, batch shape, and per-frame md5 identity are
    * real and fully SQL-replayed. */
  private lazy val m07 = QueryDef(
    "m07_frame_sample",
    (s, d) => {
      val clips = Tables.documents(s, d)
        .select(col("doc_id"), Multimodal.stubImage(col("text")).as("clip"))
      Multimodal.sampleFrames(clips, "doc_id", "clip", k = 4, frameBytes = 16)
        .select(col("id").as("doc_id"), col("frameIdx").as("frame_idx"),
          col("frameHash").as("frame_hash"))
        .orderBy("doc_id", "frame_idx")
    },
    Some("""WITH b AS (SELECT doc_id, encode(text) AS p,
          octet_length(encode(text)) // 16 AS nf FROM documents),
      f AS (SELECT doc_id, p, nf FROM b WHERE nf > 0),
      pick AS (SELECT doc_id, p,
          unnest(list_distinct([(i * nf) // least(4, nf)
            for i in range(0, least(4, nf))])) AS fi FROM f)
      SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
        md5(lower(substring(hex(p), fi * 32 + 1, 32))) AS frame_hash
      FROM pick ORDER BY doc_id, frame_idx"""))

  /** CTE chain recomputing [[Multimodal.imageAHash]]'s 60-bit fingerprint
    * from the GIMG payload bytes (hex-pair parse → chunked integer mean
    * test), parameterized by the doc source. Ends with CTE `f(doc_id, fp)`. */
  private def ahashSql(srcSql: String): String =
    s"""WITH src AS ($srcSql),
      b AS (SELECT doc_id, hex(encode(text)) AS hx,
        octet_length(encode(text)) AS n FROM src),
      ar AS (SELECT doc_id, n,
        [CAST(concat('0x', substring(hx, 2*i-1, 2)) AS BIGINT)
          for i in range(1, n+1)] AS arr FROM b),
      t AS (SELECT doc_id, n, arr, list_sum(arr) AS total FROM ar),
      f AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), c ->
          CASE WHEN ((c+1)*n)//60 - (c*n)//60 > 0
            AND COALESCE(list_sum(arr[(c*n)//60 + 1 : ((c+1)*n)//60]), 0) * n
                >= total * (((c+1)*n)//60 - (c*n)//60)
          THEN (CAST(1 AS BIGINT) << c) ELSE 0 END)) AS BIGINT) AS fp
        FROM t)"""
}
