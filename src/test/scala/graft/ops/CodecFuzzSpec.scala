package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input fuzz for all four REAL decoders: random buffers,
  * truncations, and bit-flip mutations of VALID streams must decode to
  * Some(consistent value) or None — never throw, never allocate from a
  * forged multi-GB header. Deterministic LCG fuzz (no Random) so a
  * failure reproduces. */
class CodecFuzzSpec extends AnyFunSuite {

  private def lcg(seed: Long): () => Long = {
    var h = seed
    () => { h = h * 6364136223846793005L + 1442695040888963407L; h >>> 16 }
  }

  private def randomBytes(n: Int, seed: Long): Array[Byte] = {
    val r = lcg(seed)
    Array.fill(n)((r() & 0xff).toByte)
  }

  private def decodeAll(b: Array[Byte]): Unit = {
    Multimodal.decodePng(b)
    Jpeg.decode(b)
    Multimodal.decodeWav(b)
    Multimodal.decodeY4m(b)
    Multimodal.decodeHeader(b)
    Multimodal.decodeAnyFeatures(b, 16)
  }

  test("random garbage buffers never throw (all decoders)") {
    for (i <- 0 until 300) decodeAll(randomBytes((i * 37) % 512, 1000L + i))
  }

  test("garbage wearing each container's magic never throws") {
    val magics = Seq(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array(0xff, 0xd8).map(_.toByte),
      "RIFF????WAVE".getBytes("ISO-8859-1"),
      "YUV4MPEG2 ".getBytes("ISO-8859-1"))
    for (m <- magics; i <- 0 until 100)
      decodeAll(m ++ randomBytes(64 + i, 5000L + i))
  }

  test("near-2^31 chunk lengths and FDICT streams return None, not crash") {
    // r9 review regressions: Int-overflow in the chunk-length guards and
    // an unserved zlib preset-dictionary request (infinite inflate loop)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    // PNG chunk claiming len=0x7ffffff0: off+12+len wraps negative on Int
    val hugeChunk = pngSig ++ be(0x7ffffff0) ++ "IHDR".getBytes ++
      randomBytes(40, 7L)
    assert(Multimodal.decodePng(hugeChunk).isEmpty)
    // WAV data chunk claiming ~2^31 bytes
    def le(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    val fmt = "fmt ".getBytes ++ le(16) ++
      Array[Byte](1, 0, 1, 0) ++ le(16000) ++ le(32000) ++
      Array[Byte](2, 0, 16, 0)
    val hugeWav = "RIFF".getBytes ++ le(100) ++ "WAVE".getBytes ++ fmt ++
      "data".getBytes ++ le(0x7ffffff0) ++ randomBytes(64, 8L)
    assert(Multimodal.decodeWav(hugeWav).isEmpty)
    // valid PNG container but IDAT zlib header sets FDICT (0x78 0xf9 +
    // 4 dict-id bytes): must return None promptly, not loop forever
    val good = Multimodal.pngEncode(4, 4, 1, randomBytes(16, 9L))
    val fdictIdat = Array[Byte](0x78.toByte, 0xf9.toByte) ++
      randomBytes(16, 10L)
    val forged = Multimodal.pngContainer(4, 4, 0, fdictIdat)
    val t0 = System.nanoTime()
    assert(Multimodal.decodePng(forged).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "FDICT hang")
    assert(Multimodal.decodePng(good).isDefined) // sanity: real one still ok
  }

  test("forged huge-dimension headers are rejected, not allocated") {
    // PNG IHDR claiming 65535 x 65535 RGBA
    val hugePng = Multimodal.pngContainer(65535, 65535, 6, randomBytes(32, 1L))
    assert(Multimodal.decodePng(hugePng).isEmpty)
    // Y4M header claiming 100000 x 100000
    assert(Multimodal.decodeY4m(
      ("YUV4MPEG2 W100000 H100000 F25:1 C420\nFRAME\n" + "x" * 100).getBytes).isEmpty)
    // JPEG SOF claiming 65535 x 65535 (hand-build: SOI + SOF0)
    val sof = Array[Int](0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 8,
      0xff, 0xff, 0xff, 0xff, 1, 1, 0x11, 0).map(_.toByte)
    Jpeg.decode(sof ++ randomBytes(64, 2L)) // must not throw/allocate
  }

  test("bit-flip mutations of valid streams never throw") {
    val r = lcg(99L)
    val png = Multimodal.pngEncode(13, 9, 3, randomBytes(13 * 9 * 3, 3L))
    val jpgGrid = Array.tabulate(6) { i =>
      val b = new Array[Int](64); b(0) = i * 9 - 20; b(1) = 30; b
    }
    val jpg = Jpeg.encodeFromCoeffs(20, 12, Seq(jpgGrid), Seq((1, 1)))
    val wav = Multimodal.wavEncodePcm16(8000, 2,
      Array.tabulate(200)(i => ((i * 7919) % 65536) - 32768))
    val y4m = Multimodal.y4mEncode(8, 6, "C420",
      Seq(randomBytes(72, 4L), randomBytes(72, 5L)))
    for (valid <- Seq(png, jpg, wav, y4m); _ <- 0 until 200) {
      val m = valid.clone()
      val nFlips = 1 + (r() % 4).toInt
      for (_ <- 0 until nFlips) {
        val at = (r() % m.length).toInt
        m(at) = (m(at) ^ (1 << (r() % 8).toInt)).toByte
      }
      decodeAll(m)
    }
    // truncations at every length of one stream each
    for (valid <- Seq(png, jpg, wav, y4m); len <- 0 until valid.length by 7)
      decodeAll(valid.take(len))
  }
}
