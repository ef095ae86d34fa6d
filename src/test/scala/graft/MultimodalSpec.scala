package graft

import graft.ops.Multimodal

/** Binary-column multimodal plumbing (stubbed codec, real dataflow). */
class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "a much longer payload body for frames"),
      (3L, "x")).toDF("doc_id", "text")
    Multimodal.attachBinary(df, "doc_id", "text", "text/plain")
  }

  test("attachBinary: payload bytes + typed metadata struct") {
    import spark.implicits._
    assert(media.schema("payload").dataType.typeName == "binary")
    val row = media.filter($"media_id" === 1L).select($"payload", $"meta.n_bytes", $"meta.mime").collect().head
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") == "hello world")
    assert(row.getLong(1) == 11L)
    assert(row.getString(2) == "text/plain")
  }

  test("decode: deterministic stub, fixed feature dim, one row per media") {
    val d1 = Multimodal.decode(media, featureDim = 16).collect().sortBy(_.media_id)
    val d2 = Multimodal.decode(media, featureDim = 16).collect().sortBy(_.media_id)
    assert(d1.length == 3)
    assert(d1.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height)
      assert(a.features.toSeq == b.features.toSeq)
      assert(a.features.length == 16)
    }
  }

  test("resize: caps the max dimension, preserves aspect floor of 1") {
    val resized = Multimodal.resize(Multimodal.decode(media), maxDim = 8).collect()
    resized.foreach { d =>
      assert(math.max(d.width, d.height) <= 8 && math.min(d.width, d.height) >= 1)
    }
  }

  test("sampleFrames: stride-2 generator over n_frames") {
    import spark.implicits._
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, stride = 2)
      .select($"media_id", $"frame_idx").as[(Long, Int)].collect()
    val nFrames = decoded.collect().map(d => d.media_id -> d.n_frames).toMap
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val expected = (0 until nFrames(id) by 2).toSeq
      assert(fs.map(_._2).sorted.toSeq == expected, s"media $id")
    }
  }
}
