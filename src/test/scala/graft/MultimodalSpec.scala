package graft

import graft.ops.{Multimodal, Similarity}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 300).cache()

  test("binary payload round-trips through parquet with typed metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").partitionBy("kind").parquet(dir)
    val back = spark.read.parquet(dir).as[Multimodal.MediaFile]
    assert(back.count() == 300)
    val a = media.filter(_.mediaId == 5).head()
    val b = back.filter(_.mediaId == 5).head()
    assert(java.util.Arrays.equals(a.payload, b.payload))
    assert(a.meta == b.meta && a.kind == b.kind)

    // metadata-only profile must never read the binary column
    val plan = Multimodal.mediaProfile(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("payload"),
      s"payload must be pruned from the scan:\n$plan")
  }

  test("feature extraction is deterministic and partition-invariant") {
    val f1 = Multimodal.extractFeatures(media)
      .collect().map(f => f.mediaId -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(11))
      .collect().map(f => f.mediaId -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.size == 16))
    assert(f1.values.forall(v => v.forall(x => x >= -1.0f && x < 1.0f)))
  }

  test("frame sampling explodes per duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 5000)
      .collect().groupBy(_.mediaId)
    val videos = media.filter(_.kind == "video").collect()
    assert(videos.nonEmpty)
    videos.foreach { v =>
      val expected = math.max(1, (v.meta.durationMs / 5000).toInt)
      assert(frames(v.mediaId).length == expected, s"media ${v.mediaId}")
      // stub thumbs are deterministic and distinct per frame
      assert(frames(v.mediaId).map(_.thumb.toSeq).distinct.length == expected)
    }
    assert(frames.keySet == videos.map(_.mediaId).toSet)
  }

  test("container header parse recovers ground truth for WAV, PNG and MP4") {
    val parsed = Multimodal.withParsedMeta(media).collect()
      .map(m => m.mediaId -> m).toMap
    val originals = media.collect()
    assert(Seq("audio", "image", "video")
      .forall(k => originals.exists(_.kind == k)))
    originals.foreach { o =>
      // every payload is a REAL container prefix (RIFF/WAVE chunk
      // list, PNG signature+IHDR, BMFF ftyp/moov/mvhd/tkhd): the
      // parsed header must reproduce the labeled metadata exactly
      val p = parsed(o.mediaId)
      assert(p.meta == o.meta,
        s"media ${o.mediaId} (${o.kind}): parsed ${p.meta} != labeled ${o.meta}")
    }
    // unrecognized container → labeled metadata fallback (the seam for
    // formats the codec doesn't parse yet)
    val junk = originals.head.copy(mediaId = 9999L,
      payload = Array.fill[Byte](64)(0x55))
    assert(Multimodal.withParsedMeta(
      spark.createDataset(Seq(junk))).head().meta == junk.meta)

    // and each parse is load-bearing: corrupting a declared field must
    // change the parsed value correspondingly
    val a = originals.find(_.kind == "audio").get
    val corrupted = a.payload.clone()
    val bb = java.nio.ByteBuffer.wrap(corrupted)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, bb.getInt(40) / 2) // halve declared data length
    val reparsed = Multimodal.withParsedMeta(
      spark.createDataset(Seq(a.copy(payload = corrupted)))).head()
    assert(reparsed.meta.durationMs == a.meta.durationMs / 2,
      s"halved data size must halve duration: $reparsed vs $a")

    val img = originals.find(_.kind == "image").get
    val imgC = img.payload.clone()
    java.nio.ByteBuffer.wrap(imgC).putInt(16, 7777) // IHDR width (BE)
    val imgP = Multimodal.withParsedMeta(
      spark.createDataset(Seq(img.copy(payload = imgC)))).head()
    assert(imgP.meta.width == 7777 && imgP.meta.height == img.meta.height)

    val vid = originals.find(_.kind == "video").get
    val vidC = vid.payload.clone()
    // mvhd duration field: ftyp(24) + moov hdr(8) + mvhd hdr(8) + 16
    java.nio.ByteBuffer.wrap(vidC).putInt(24 + 8 + 8 + 16,
      (vid.meta.durationMs * 3).toInt) // timescale 1000 → 3× duration
    val vidP = Multimodal.withParsedMeta(
      spark.createDataset(Seq(vid.copy(payload = vidC)))).head()
    assert(vidP.meta.durationMs == vid.meta.durationMs * 3,
      s"tripled mvhd duration must triple parsed ms: $vidP vs $vid")
  }

  private def sha256Feature(payload: Array[Byte]): Seq[Float] = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    Seq.tabulate(16)(k =>
      (((d(2 * k) & 0xff) << 8 | (d(2 * k + 1) & 0xff)) / 32768.0f) - 1.0f)
  }

  test("PNG features come from REAL decoded pixels (independent raster oracle)") {
    val images = media.filter(_.kind == "image").collect()
    assert(images.nonEmpty)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.mediaId -> f.feature.toSeq).toMap
    images.foreach { m =>
      // independent oracle: decode with ImageIO HERE and recompute the
      // 4x4 grid of mean ITU-601 luminances the codec is spec'd to emit
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.payload))
      assert(img != null, s"corpus image ${m.mediaId} must be decodable")
      assert(img.getWidth == m.meta.width && img.getHeight == m.meta.height)
      val expect = Seq.tabulate(16) { k =>
        val (r, c) = (k / 4, k % 4)
        val (y0, x0) = (r * img.getHeight / 4, c * img.getWidth / 4)
        val y1 = math.max(y0 + 1, (r + 1) * img.getHeight / 4)
        val x1 = math.max(x0 + 1, (c + 1) * img.getWidth / 4)
        val lums = for (y <- y0 until y1; x <- x0 until x1) yield {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000L
        }
        (lums.sum.toDouble / lums.size / 128.0 - 1.0).toFloat
      }
      assert(feats(m.mediaId) == expect, s"media ${m.mediaId}")
      // and the real path actually engaged: not the digest fallback
      assert(feats(m.mediaId) != sha256Feature(m.payload))
    }
  }

  test("WAV features come from REAL decoded PCM samples (independent parse oracle)") {
    val audios = media.filter(_.kind == "audio").collect()
    assert(audios.nonEmpty)
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.mediaId -> f.feature.toSeq).toMap
    audios.foreach { m =>
      // independent oracle: the data chunk is at offset 44 (canonical
      // 44-byte header), 16-bit LE, truncated vs its declared length
      val bb = java.nio.ByteBuffer.wrap(m.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val declared = bb.getInt(40).toLong & 0xffffffffL
      val n = (math.min(declared, (m.payload.length - 44).toLong) / 2).toInt
      assert(n > 0, s"corpus audio ${m.mediaId} must carry samples")
      val s = Array.tabulate(n)(i => bb.getShort(44 + 2 * i))
      val expect = Seq.tabulate(16) { k =>
        val i0 = k * n / 16
        val i1 = math.max(i0 + 1, (k + 1) * n / 16)
        val sum = (i0 until i1).map(i => math.abs(s(i).toLong)).sum
        (sum.toDouble / (i1 - i0) * 2.0 / 32769.0 - 1.0).toFloat
      }
      assert(feats(m.mediaId) == expect, s"media ${m.mediaId}")
      assert(feats(m.mediaId) != sha256Feature(m.payload))
    }
  }

  test("undecodable payloads (MP4, junk) fall back to the digest feature") {
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.mediaId -> f.feature.toSeq).toMap
    val videos = media.filter(_.kind == "video").collect()
    assert(videos.nonEmpty)
    videos.foreach(m => assert(feats(m.mediaId) == sha256Feature(m.payload)))
    val junk = videos.head.copy(mediaId = 424242L,
      payload = Array.fill[Byte](128)(0x5a))
    val jf = Multimodal.extractFeatures(spark.createDataset(Seq(junk)))
      .head().feature.toSeq
    assert(jf == sha256Feature(junk.payload))
  }

  test("thumbnails: real resample, valid PNG out, images only, color-exact") {
    val thumbs = Multimodal.thumbnails(media, 16, 16).collect()
    val imageIds = media.filter(_.kind == "image").collect()
      .map(_.mediaId).toSet
    // only decodable payloads produce thumbs, and all images do
    assert(thumbs.map(_.mediaId).toSet == imageIds)
    thumbs.foreach { t =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(t.png))
      assert(img != null && img.getWidth == 16 && img.getHeight == 16)
    }
    // a solid-color source must thumbnail to exactly that color
    // (bilinear resample of a constant field is constant)
    val solid = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = solid.createGraphics()
    g.setColor(new java.awt.Color(200, 40, 90)); g.fillRect(0, 0, 64, 48)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(solid, "png", bos)
    val row = Multimodal.MediaFile(7L, "image",
      Multimodal.MediaMeta("png", 64, 48, 0L, 0), bos.toByteArray)
    val t = Multimodal.thumbnails(spark.createDataset(Seq(row)), 8, 8).head()
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(t.png))
    for (y <- 0 until 8; x <- 0 until 8)
      assert((back.getRGB(x, y) & 0xffffff) == (200 << 16 | 40 << 8 | 90))
  }

  test("media features feed similarity search end-to-end") {
    val feats = Multimodal.extractFeatures(media)
      .select($"mediaId".as("vec_id"), $"feature".as("embedding"))
    val q = feats.filter($"vec_id" === 0).head().getSeq[Float](1)
      .map(_.toDouble)
    val top = Similarity.cosineTopK(feats, q, 5)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 0L && math.abs(top.head._2 - 1.0) < 1e-6,
      "query vector must be its own nearest neighbor")
    assert(top.length == 5)
  }
}
