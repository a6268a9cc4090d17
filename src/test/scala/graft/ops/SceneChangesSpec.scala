package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cut detection contract: a planted luma step is a scene change, flat
  * continuation is not, the first frame always opens a scene, and
  * non-Y4M payloads produce no rows. */
class SceneChangesSpec extends AnyFunSuite {

  test("planted luma steps are detected; flat frames are not") {
    import TestSpark.spark.implicits._
    val w = 4; val h = 4
    def frame(level: Int): Array[Byte] =
      Array.fill(w * h * 3 / 2)(level.toByte)
    // scenes: 3 frames at 10, 2 frames at 200, 1 frame back at 10
    val video = Multimodal.y4mEncode(w, h, "C420",
      Seq(frame(10), frame(10), frame(10), frame(200), frame(200), frame(10)))
    val df = Seq((1L, video), (2L, Array[Byte](9, 9, 9))).toDF("doc_id", "bin")
    val out = Multimodal.sceneChanges(df, "bin", threshold = 50.0)
      .orderBy("doc_id", "frame_index").collect()
    assert(out.forall(_.getLong(0) == 1L), "non-Y4M row leaked frames")
    assert(out.length == 6)
    val flags = out.map(r => r.getInt(1) -> r.getBoolean(4)).toMap
    assert(flags == Map(0 -> true, 1 -> false, 2 -> false,
      3 -> true, 4 -> false, 5 -> true))
    assert(out(0).isNullAt(3)) // first frame has no delta
  }

  test("threshold is exclusive and config errors fail loudly") {
    import TestSpark.spark.implicits._
    val video = Multimodal.y4mEncode(2, 2, "C420",
      Seq(Array.fill(6)(0.toByte), Array.fill(6)(50.toByte)))
    val df = Seq((1L, video)).toDF("doc_id", "bin")
    // delta = exactly 50: NOT a change at threshold 50 (strict >)
    val strict = Multimodal.sceneChanges(df, "bin", threshold = 50.0)
      .filter(col("frame_index") === 1).collect()(0).getBoolean(4)
    assert(!strict)
    intercept[IllegalArgumentException](
      Multimodal.sceneChanges(df, "bin", threshold = 0.0))
  }
}
