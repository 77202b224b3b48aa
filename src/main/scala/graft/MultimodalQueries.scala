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
        FROM documents GROUP BY 1 ORDER BY 1"""))
  )
}
