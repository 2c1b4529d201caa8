package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub: deterministic dims/features; empty payload is safe") {
    val d = Multimodal.decodeStub(Multimodal.Asset(1L, "image", "abcdefgh".getBytes("UTF-8")))
    assert(d.n_bytes == 8)
    assert(d.width == 64 + (97 * 256 + 98) % 1024)  // 'a','b'
    assert(d.height == 64 + (99 * 256 + 100) % 1024) // 'c','d'
    assert(d.features.length == 8)
    assert(d.features.forall(f => f >= 0f && f <= 1f))
    val empty = Multimodal.decodeStub(Multimodal.Asset(2L, "image", Array.empty))
    assert(empty.n_bytes == 0 && empty.width == 64 && empty.height == 64)
    assert(empty.features.toSeq == Seq.fill(8)(0.0f))
  }

  test("decode runs as a distributed narrow map over binary assets") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "spark")).toDF("doc_id", "text")
    val decoded = Multimodal.decode(spark, Multimodal.assetsFrom(docs, "doc_id", "text"))
    val rows = decoded.collect().sortBy(_.asset_id)
    assert(rows.length == 3)
    assert(rows.map(_.n_bytes).toSeq == Seq(11, 0, 5))
    assert(rows.forall(_.kind == "image"))
  }

  test("resize: target geometry with rescaled features, same row count") {
    val docs = Seq((1L, "some payload bytes")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFrom(docs, "doc_id", "text")
    val r = Multimodal.resize(spark, assets, 224, 224).collect()(0)
    assert(r.width == 224 && r.height == 224)
    assert(r.features.length == 8)
  }

  test("frameSample: k frames per asset, deterministic fingerprints") {
    val docs = Seq((1L, "a" * 100), (2L, "")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFrom(docs, "doc_id", "text", kind = "video")
    val frames = Multimodal.sampleFrames(spark, assets, 4).collect()
    assert(frames.count(_.asset_id == 1L) == 4) // empty payload -> no frames
    assert(frames.count(_.asset_id == 2L) == 0)
    val offs = frames.filter(_.asset_id == 1L).sortBy(_.frame_idx).map(_.offset)
    assert(offs.toSeq == Seq(0, 25, 50, 75))
    val again = Multimodal.sampleFrames(spark, assets, 4).collect()
      .filter(_.asset_id == 1L).sortBy(_.frame_idx).map(_.frame_checksum)
    assert(frames.filter(_.asset_id == 1L).sortBy(_.frame_idx)
      .map(_.frame_checksum).toSeq == again.toSeq)
  }

  test("metadata: pure-expression pre-filter fields") {
    val docs = Seq((7L, "AB")).toDF("doc_id", "text")
    val m = Multimodal.metadata(Multimodal.assetsFrom(docs, "doc_id", "text")).collect()(0)
    assert(m.getAs[Int]("n_bytes") == 2)
    assert(m.getAs[Int]("header_code") == 65 * 256 + 66)
    assert(m.getAs[String]("checksum") ==
      java.security.MessageDigest.getInstance("MD5").digest("AB".getBytes())
        .map("%02x".format(_)).mkString)
  }
}
