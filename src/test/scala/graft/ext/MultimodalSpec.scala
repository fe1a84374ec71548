package graft.ext

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, ""), (3L, "xyz"))
    .toDF("doc_id", "text")

  test("packAssets: binary payload with typed id/kind") {
    val packed = Multimodal.packAssets(docs, "doc_id", "text")
    val schema = packed.schema
    assert(schema("data").dataType.typeName == "binary")
    val r = packed.filter($"asset_id" === 1).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("data"), "UTF-8") == "hello world")
    assert(r.getAs[String]("kind") == "image")
  }

  test("extractImageFeatures: deterministic stub features per payload") {
    val packed = Multimodal.packAssets(docs, "doc_id", "text")
    val feats = Multimodal.imageFeatures(packed).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    val f1 = feats(1L)
    assert(f1.getAs[Long]("n_bytes") == 11)
    assert(f1.getAs[Int]("width") == 16 + 11)
    val expHeight = 16 + (('h'.toInt * 7 + 'd'.toInt) % 240)
    assert(f1.getAs[Int]("height") == expHeight)
    // empty payload: degenerate but defined
    assert(feats(2L).getAs[Int]("width") == 16)
    // re-run → identical (determinism contract)
    val again = Multimodal.imageFeatures(packed).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Double]("mean_luma")).toMap
    feats.foreach { case (id, r) =>
      assert(again(id) == r.getAs[Double]("mean_luma"))
    }
  }

  test("metadata-only queries prune the binary payload out of the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Multimodal.packAssets(docs, "doc_id", "text").write
      .mode("overwrite").parquet(tmp)
    val metaOnly = spark.read.parquet(tmp).select("asset_id", "kind")
    val scan = metaOnly.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("data:binary"),
      s"binary column must be pruned from ReadSchema:\n$scan")
  }

  test("decodeImage hook is explicitly unimplemented") {
    intercept[NotImplementedError](Multimodal.decodeImage(Array[Byte](1)))
  }

  test("sampleFrames: one row per sampled offset, stub duration") {
    val packed = Multimodal.packAssets(docs, "doc_id", "text", kind = "video")
    val frames = Multimodal.sampleFrames(packed.as[Multimodal.Asset]).collect()
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset(1L).length == ("hello world".length % 10) + 1)
    assert(byAsset(1L).map(_.frame_index).sorted.sameElements(
      0 until byAsset(1L).length))
    assert(byAsset(1L).forall(f => f.frame_offset_ms == f.frame_index * 1000L))
  }
  test("resizeToBox: aspect preserved, fits the box, floor-clamped") {
    val assets = Seq(
      Multimodal.Asset(1L, "image", Array.fill[Byte](100)(65)),  // 116 x 16+(65*8%240)
      Multimodal.Asset(2L, "image", Array.emptyByteArray)        // 16 x 16
    ).toDS()
    val out = Multimodal.resizeToBox(assets, 224, 224).collect()
      .map(r => r.asset_id -> r).toMap
    out.values.foreach { r =>
      assert(r.out_width <= 224 && r.out_height <= 224 && r.out_width >= 1 && r.out_height >= 1)
      // the larger dimension fills the box (within floor rounding)
      assert(r.out_width == 224 || r.out_height == 224)
      assert(r.out_bytes == r.out_width.toLong * r.out_height * 3)
    }
    assert(out(2L).out_width == 224 && out(2L).out_height == 224, "square scales to the full box")
  }

  test("audioFeatures: PCM-fiction math over the payload") {
    val assets = Seq(Multimodal.Asset(1L, "audio", "abcd".getBytes)).toDS()
    val f = Multimodal.audioFeatures(assets).collect().head
    assert(f.n_bytes == 4 && f.n_samples == 2 && f.duration_ms == 0)
    assert(f.rms == (('a' * 31 + 'd') % 1000).toDouble / 1000.0)
  }
}
