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

  test("isStubImage gates on the magic") {
    val flags = imgs.select(Multimodal.isStubImage(col("img"))).as[Boolean].collect()
    assert(flags.forall(identity))
    val not = Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(Multimodal.isStubImage(col("b"))).as[Boolean].head()
    assert(!not)
  }
}
