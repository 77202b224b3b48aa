package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

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
        FROM documents ORDER BY doc_id"""))
  )
}
