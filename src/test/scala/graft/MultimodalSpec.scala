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
