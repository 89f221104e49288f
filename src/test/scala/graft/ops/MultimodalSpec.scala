package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, Array.fill[Byte](250)(7)),
    (2L, "short".getBytes("UTF-8")))
    .toDF("media_id", "media")

  test("extractMeta: typed metadata from binary columns, stable checksum") {
    val out = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(out(0).n_bytes == 250 && out(1).n_bytes == 5)
    assert(out(0).width >= 16 && out(0).height >= 16)
    assert(out(0).checksum.matches("[0-9a-f]{32}"))
    // deterministic across runs
    val again = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(out.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("sampleFrames: one frame per 100 bytes, stride respected, fixed-width features") {
    val frames = Multimodal.sampleFrames(media, stride = 1).collect()
    assert(frames.count(_.media_id == 1L) == 2) // 250 bytes → 2 full frames
    assert(frames.count(_.media_id == 2L) == 0) // 5 bytes → none
    assert(frames.forall(_.feature.length == 4))
    val strided = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(strided.count(_.media_id == 1L) == 1)
  }

  test("sliceFrames: exact byte windows, codegen-native plan (no mapPartitions)") {
    val bytes = (0 until 250).map(_.toByte).toArray
    val df = Seq((1L, bytes)).toDF("media_id", "media")
    val out = Multimodal.sliceFrames(df, 100).orderBy("frame_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Array[Byte]]("frame").toSeq == bytes.slice(0, 100).toSeq)
    assert(out(1).getAs[Array[Byte]]("frame").toSeq == bytes.slice(100, 200).toSeq)
    // stays inside whole-stage codegen: no SerializeFromObject / DeserializeToObject
    val plan = Multimodal.sliceFrames(df, 100).queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && plan.contains("Generate"), plan)
  }
}
