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

  test("dHash56: hand-computed bits, flat image hashes to zero") {
    // flat image: no strict descents -> 0
    assert(Multimodal.dHash56(Array.fill(64)(7), 8, 8) == 0L)
    // 8x8 strictly decreasing row: every g(r,c) > g(r,c+1) -> all 56 bits
    val desc = Array.tabulate(64)(i => 63 - (i % 8))
    assert(Multimodal.dHash56(desc, 8, 8) == (1L << 56) - 1)
    // first column brighter: every row descends once at c=0 -> bit r*7
    val one = Array.tabulate(64)(i => if (i % 8 == 0) 1 else 0)
    assert(Multimodal.dHash56(one, 8, 8) ==
      (0 until 8).map(r => 1L << (r * 7)).sum)
  }

  test("dHash56 is invariant under lossless re-encode (PNG round trip)") {
    val spark2 = spark
    import spark2.implicits._
    val assets = (0L to 20L).toDS()
      .map(id => Multimodal.Asset(id, "image", Multimodal.syntheticPngRich(id)))
      .toDF()
    val hashed = Multimodal.decodeDHash(spark, assets).collect()
    // recompute from the formula: decode path must agree exactly
    hashed.foreach { h =>
      val w = 16 + (h.asset_id % 16).toInt
      val hh = 16 + (h.asset_id % 8).toInt
      val vals = Array.tabulate(w * hh)(i =>
        ((h.asset_id * 31 + 7L * i.toLong * i) % 256).toInt)
      assert((h.width, h.height) == (w, hh))
      assert(h.dhash == Multimodal.dHash56(vals, w, hh), s"id ${h.asset_id}")
    }
  }

  test("dhashNearDup: banded join finds exactly the brute-force pairs") {
    val spark2 = spark
    import spark2.implicits._
    val hashes = Seq(
      (1L, 5, 5, 0x0L),                       // empty hash
      (2L, 5, 5, 0x3L),                       // bits {0,1}
      (3L, 5, 5, 0xFL),                       // bits {0,1,2,3}
      (4L, 5, 5, 0x3L),                       // exact dup of id2
      (5L, 5, 5, (0x1L << 55) | 0x1L))        // bits {0,55} - spans bands
      .toDF("asset_id", "width", "height", "dhash")
    val out = Multimodal.dhashNearDup(hashes, 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // brute force: all pairs with popcount(xor) <= 3; (1,3)/(3,5) are 4
    assert(out.toSeq == Seq((1L, 2L, 2), (1L, 4L, 2), (1L, 5L, 2),
      (2L, 3L, 2), (2L, 4L, 0), (2L, 5L, 2), (3L, 4L, 2), (4L, 5L, 2)))
  }

  test("lumaStats: decoded statistics equal the raster formula's") {
    val id = 7L
    val assets = Seq(Multimodal.Asset(id, "image",
      Multimodal.syntheticPngRich(id))).toDF()
    val r = Multimodal.lumaStats(spark, assets).collect().head
    // recompute from the generator formula: w=16+id%16, h=16+id%8
    val w = 16 + (id % 16).toInt; val h = 16 + (id % 8).toInt
    val vals = (0 until w * h).map(i => ((id * 31 + 7L * i * i) % 256).toInt)
    val n = vals.length
    val mean = vals.sum.toDouble / n
    val std = math.sqrt(vals.map(v => v.toDouble * v).sum / n - mean * mean)
    assert((r.getInt(1), r.getInt(2), r.getLong(3)) == (w, h, n.toLong))
    assert(math.abs(r.getDouble(4) - mean) < 1e-6)
    assert(math.abs(r.getDouble(5) - std) < 1e-5)
    assert(r.getInt(6) == vals.min && r.getInt(7) == vals.max)
  }

  test("audioStats: WAV encode→decode roundtrips the closed-form waveform; garbage skipped") {
    val id = 7L
    val n = 64 + (id % 64).toInt
    val s = Array.tabulate(n)(i => (((id * 37 + 11L * i * i) % 4096) - 2048).toInt)
    val assets = Seq(
      Multimodal.Asset(id, "audio", Multimodal.syntheticWav(id)),
      Multimodal.Asset(99L, "audio", Array[Byte](1, 2, 3, 4))) // not a WAV
      .toDF()
    val out = Multimodal.audioStats(spark, assets).collect()
    assert(out.length == 1) // the garbage payload is skipped, not fatal
    val r = out.head
    val mean = s.sum.toDouble / n
    val rms = math.sqrt(s.map(v => v.toDouble * v).sum / n)
    val zc = s.sliding(2).count(p => p(0).toLong * p(1) < 0)
    assert((r.getLong(0), r.getInt(1), r.getLong(2)) == ((id, 8000, n.toLong)))
    assert(math.abs(r.getDouble(3) - n * 1000.0 / 8000.0) < 1e-9) // duration_ms
    assert(math.abs(r.getDouble(4) - rms) < 1e-5)
    assert(math.abs(r.getDouble(5) - mean) < 1e-6)
    assert(r.getLong(6) == s.map(math.abs).max.toLong)
    assert(r.getLong(7) == zc.toLong)
  }

  test("probeMp4: hand-computed metadata for both container variants") {
    // id=0 takes BOTH edge paths: mvhd version 1 (0 % 5 == 0, +12 bytes)
    // and mdat largesize (0 % 7 == 0, +8 bytes). Base layout 252 bytes.
    val p0 = Multimodal.probeMp4(0L, Multimodal.syntheticMp4(0L))
    assert(p0.n_bytes == 272L && p0.n_boxes == 4)
    assert(p0.boxes == "ftyp,moov,free,mdat")
    assert(p0.major_brand == "isom" && p0.minor_version == 0L)
    assert(p0.timescale == 600L && p0.duration == 3000L)
    assert(p0.duration_sec == 5.0)
    assert(p0.width == 160 && p0.height == 120 && p0.mdat_bytes == 0L)
    // id=3 takes neither: plain v0 mvhd, 32-bit mdat size.
    val p3 = Multimodal.probeMp4(3L, Multimodal.syntheticMp4(3L))
    assert(p3.n_bytes == 258L)                       // 252 + 3%32 + 3%100
    assert(p3.major_brand == "avc1" && p3.minor_version == 3L)
    assert(p3.timescale == 2400L && p3.duration == 2400L * 8)
    assert(p3.duration_sec == 8.0)
    assert(p3.width == 208 && p3.height == 147 && p3.mdat_bytes == 3L)
  }

  test("videoProbe: valid payloads parse, garbage is skipped (quarantine)") {
    val assets = Seq(
      Multimodal.Asset(7L, "video", Multimodal.syntheticMp4(7L)),
      Multimodal.Asset(99L, "video", "not an mp4 at all".getBytes("UTF-8")),
      Multimodal.Asset(11L, "video", Multimodal.syntheticMp4(11L))).toDF()
    val out = Multimodal.videoProbe(spark, assets).collect()
      .map(p => p.asset_id -> p).toMap
    assert(out.keySet == Set(7L, 11L))               // garbage dropped
    assert(out(7L).major_brand == "avc1")            // 7 % 4 == 3
    assert(out(11L).duration_sec == (5 + 11 % 120).toDouble)
  }

  test("probeMp4 rejects truncated and overrunning boxes") {
    val ok = Multimodal.syntheticMp4(4L)
    intercept[Exception](Multimodal.probeMp4(4L, ok.dropRight(3)))
    val corrupt = ok.clone()
    corrupt(0) = 0x7f.toByte                         // ftyp size overruns file
    intercept[Exception](Multimodal.probeMp4(4L, corrupt))
  }
}
