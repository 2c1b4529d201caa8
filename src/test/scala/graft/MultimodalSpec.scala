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

  test("decodeImage: REAL PNG round-trip via javax.imageio, distributed") {
    // syntheticPng encodes w=1+id%8, h=1+id%5, sample i = (id*31+i)%256
    // with the JDK PNG writer; PNG is lossless so the decode side must
    // recover the exact dims and integer sample sum.
    val ids = (0L to 19L).toDF("doc_id")
    val assets = ids.as[Long].mapPartitions(_.map(id =>
      Multimodal.Asset(id, "image", Multimodal.syntheticPng(id)))).toDF()
    val rows = Multimodal.decode(spark, assets).collect().sortBy(_.asset_id)
    assert(rows.length == 20)
    rows.foreach { d =>
      val id = d.asset_id
      val (w, h) = (1 + (id % 8).toInt, 1 + (id % 5).toInt)
      assert(d.codec == "png", s"id $id decoded via ${d.codec}, wanted png")
      assert(d.width == w && d.height == h)
      assert(d.sum_sample == (0 until w * h).map(i => (id * 31 + i) % 256).sum)
      assert(d.features.length == 8 && d.features.forall(f => f >= 0f && f <= 1f))
    }
    // The payload really is a PNG a third-party reader agrees on: magic
    // bytes + ImageIO's own container sniffing already proved it above.
    val png = Multimodal.syntheticPng(7L)
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
  }

  test("jpegRoundTrip: REAL JPEG decode — exact geometry, bounded lossy error") {
    val out = Multimodal.jpegRoundTrip(spark, (0L to 23L).toDS())
      .collect().sortBy(_.asset_id)
    assert(out.length == 24)
    out.foreach { p =>
      val id = p.asset_id
      assert(p.codec == "jpeg", s"id $id decoded via ${p.codec}, wanted jpeg")
      assert(p.width == 8 * (1 + id % 4) && p.height == 8 * (1 + id % 3),
        s"id $id geometry ${p.width}x${p.height}")
      assert(p.mean_err_le_2, s"id $id mean reconstruction error above 2")
      assert(p.max_err_le_8, s"id $id max reconstruction error above 8")
    }
    // the payload really is a JPEG: SOI marker FF D8
    val jpg = Multimodal.syntheticJpeg(5L)
    assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8)
    // measure the true error profile once so the contract bounds stay
    // honest (the operator's booleans must have real headroom)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var sumErr = 0L; var maxErr = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val e = math.abs(img.getRaster.getSample(x, y, 0) -
        Multimodal.syntheticJpegSample(5L, x, y))
      sumErr += e; maxErr = math.max(maxErr, e)
    }
    val meanErr = sumErr.toDouble / (img.getWidth * img.getHeight)
    info(f"jpeg q=0.95 smooth-ramp reconstruction: mean=$meanErr%.3f max=$maxErr")
    assert(meanErr <= 1.0, s"quality drifted: mean err $meanErr (contract bound 2)")
    assert(maxErr <= 4, s"quality drifted: max err $maxErr (contract bound 8)")
  }

  test("decodeImage: BMP container also takes the real path") {
    val img = new java.awt.image.BufferedImage(
      5, 3, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(2, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val d = Multimodal.decodeAsset(Multimodal.Asset(1L, "image", bos.toByteArray))
    assert(d.codec == "bmp" && d.width == 5 && d.height == 3)
  }

  test("decode dispatch: unrecognized bytes fall back to the labeled stub") {
    val d = Multimodal.decodeAsset(
      Multimodal.Asset(9L, "image", "not an image at all".getBytes("UTF-8")))
    assert(d.codec == "stub")
    val bytes = "not an image at all".getBytes("UTF-8")
    assert(d.sum_sample == bytes.map(_ & 0xFF).sum.toLong)
    val empty = Multimodal.decodeAsset(Multimodal.Asset(10L, "image", Array.empty))
    assert(empty.codec == "stub" && empty.sum_sample == 0L)
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
