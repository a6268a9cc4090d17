package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Activity-segmentation contract: silent and loud spans alternate into
  * 1-based segment ids, the partial last frame normalizes by its true
  * length, thresholds are strict, non-WAV rows vanish. */
class AudioSegmentsSpec extends AnyFunSuite {

  test("alternating silence/tone spans segment correctly") {
    import TestSpark.spark.implicits._
    // 4 frames of 256: silent, loud, loud, silent → segments 1, 2, 2, 3
    val smp = Array.tabulate(1024) { i =>
      if (i < 256 || i >= 768) 0 else 16384
    }
    val wav = Multimodal.wavEncodePcm16(16000, 1, smp)
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2))).toDF("doc_id", "bin")
    val out = Multimodal.audioSegments(df, "bin", energyThreshold = 0.1)
      .orderBy("frame_index").collect()
    assert(out.forall(_.getLong(0) == 1L), "non-WAV row leaked frames")
    val segs = out.map(r => (r.getInt(1), r.getBoolean(3), r.getLong(4)))
    assert(segs.toSeq == Seq((0, false, 1L), (1, true, 2L),
      (2, true, 2L), (3, false, 3L)))
    // loud-frame energy is exactly (16384/32768)^2 = 0.25
    assert(out(1).getDouble(2) == 0.25)
  }

  test("partial last frame normalizes by its true sample count") {
    import TestSpark.spark.implicits._
    // 300 samples: frame 1 has 44 samples, all at half amplitude
    val wav = Multimodal.wavEncodePcm16(16000, 1, Array.fill(300)(16384))
    val df = Seq((1L, wav)).toDF("doc_id", "bin")
    val out = Multimodal.audioSegments(df, "bin", energyThreshold = 0.1)
      .orderBy("frame_index").collect()
    assert(out.length == 2)
    assert(out(1).getDouble(2) == 0.25) // 44 × 0.25 / 44, not / 256
    assert(out(1).getLong(4) == 1L)     // same segment, no flip
  }
}
