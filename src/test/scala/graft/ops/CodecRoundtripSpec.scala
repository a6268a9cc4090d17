package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Real-codec roundtrips: [[Multimodal.pngEncode]]/[[Multimodal.decodePng]]
  * (zlib + all five PNG scanline filters) and
  * [[Multimodal.wavEncodePcm16]]/[[Multimodal.decodeWav]] (RIFF PCM).
  * Pixels/samples are deterministic pseudo-random so every filter branch
  * sees non-trivial deltas. */
class CodecRoundtripSpec extends AnyFunSuite {

  private def pix(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var h = seed
    var i = 0
    while (i < n) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 33) & 0xff).toByte
      i += 1
    }
    out
  }

  test("PNG roundtrip: every channel count x every fixed filter type") {
    for (ch <- 1 to 4; ft <- 0 to 4) {
      val (w, h) = (13, 7)
      val px = pix(w * h * ch, seed = ch * 100L + ft)
      val png = Multimodal.pngEncode(w, h, ch, px, filterMode = ft)
      val dec = Multimodal.decodePng(png)
      assert(dec.isDefined, s"ch=$ch ft=$ft failed to decode")
      val r = dec.get
      assert(r.width == w && r.height == h && r.channels == ch)
      assert(r.pixels.sameElements(px), s"ch=$ch ft=$ft pixel mismatch")
    }
  }

  test("PNG roundtrip: cycling filters + multi-IDAT chunking") {
    val (w, h, ch) = (31, 17, 3)
    val px = pix(w * h * ch, seed = 42L)
    // tiny IDAT chunks force the decoder to concatenate many chunks
    val png = Multimodal.pngEncode(w, h, ch, px, filterMode = -1, idatChunkLen = 64)
    val nIdat = {
      var count = 0; var off = 8
      while (off + 8 <= png.length) {
        val len = ((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
          ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff)
        if (png(off + 4) == 'I' && png(off + 5) == 'D' &&
            png(off + 6) == 'A' && png(off + 7) == 'T') count += 1
        off += 12 + len
      }
      count
    }
    assert(nIdat > 1, "fixture must actually split IDAT")
    assert(Multimodal.decodePng(png).exists(_.pixels.sameElements(px)))
  }

  test("PNG decode: 1x1 edge, corrupt CRC, truncated stream all fail loudly") {
    val one = Multimodal.pngEncode(1, 1, 1, Array[Byte](0x7f))
    assert(Multimodal.decodePng(one).exists(r =>
      r.width == 1 && r.height == 1 && r.pixels.sameElements(Array[Byte](0x7f))))
    // flip one IDAT payload byte -> CRC mismatch -> None, never garbage
    val png = Multimodal.pngEncode(8, 8, 2, pix(128, 7L))
    // first IDAT chunk: 8 sig + 25 IHDR = off 33; data begins at 41
    val corrupt = png.clone()
    corrupt(44) = (corrupt(44) ^ 0x55).toByte
    assert(Multimodal.decodePng(corrupt).isEmpty)
    assert(Multimodal.decodePng(png.take(png.length / 2)).isEmpty)
    assert(Multimodal.decodePng(null).isEmpty)
    assert(Multimodal.decodePng("not a png at all, just text".getBytes).isEmpty)
  }

  test("PNG decode: header-only fixture (zeroed CRC) is rejected, not misread") {
    val hdrOnly = Multimodal.pngContainer(4, 4, 2, pix(10, 3L))
    assert(Multimodal.decodeHeader(hdrOnly).contains(("png", 4, 4, 3)))
    assert(Multimodal.decodePng(hdrOnly).isEmpty)
  }

  test("WAV roundtrip: int16 samples survive exactly, both channel layouts") {
    for (ch <- 1 to 2) {
      val smp = Array.tabulate(300 * ch)(i => ((i * 7919) % 65536) - 32768)
      val wav = Multimodal.wavEncodePcm16(16000, ch, smp)
      val dec = Multimodal.decodeWav(wav)
      assert(dec.isDefined)
      val p = dec.get
      assert(p.sampleRate == 16000 && p.channels == ch)
      assert(p.samples.length == smp.length)
      // s / 32768.0 is exact in binary FP -> lossless roundtrip
      val back = p.samples.map(v => math.round(v * 32768.0).toInt)
      assert(back.sameElements(smp))
    }
  }

  test("WAV decode: rejects non-RIFF, non-PCM, and truncated data") {
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav(pix(100, 9L)).isEmpty)
    val wav = Multimodal.wavEncodePcm16(8000, 1, Array.tabulate(64)(i => i * 100))
    assert(Multimodal.decodeWav(wav.take(50)).isEmpty)
    val nonPcm = wav.clone(); nonPcm(20) = 3 // format tag != 1 (IEEE float)
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
  }

  test("Y4M roundtrip: every colorspace, frames survive byte-exact") {
    for (cs <- Seq("C420", "C420jpeg", "C422", "C444", "Cmono")) {
      val (w, h) = (8, 6)
      val fb = cs match {
        case "C444" => 3 * w * h
        case "C422" => w * h + 2 * ((w / 2) * h)
        case "Cmono" => w * h
        case _ => w * h * 3 / 2
      }
      val frames = (0 until 4).map(f => pix(fb, f * 1000L + cs.hashCode))
      val y4m = Multimodal.y4mEncode(w, h, cs, frames)
      val dec = Multimodal.decodeY4m(y4m)
      assert(dec.isDefined, s"$cs failed to decode")
      val v = dec.get
      assert(v.width == w && v.height == h && v.colorspace == cs)
      assert(v.frames.length == 4)
      frames.zip(v.frames).foreach { case (a, b) => assert(a.sameElements(b), cs) }
    }
  }

  test("Y4M decode: rejects bad magic, odd-dim 420, truncated frames") {
    assert(Multimodal.decodeY4m(null).isEmpty)
    assert(Multimodal.decodeY4m("YUV4MPEG3 W8 H6 C420\n".getBytes).isEmpty)
    // 4:2:0 requires even dims — hand-build a header claiming 7x6
    assert(Multimodal.decodeY4m(
      ("YUV4MPEG2 W7 H6 F25:1 C420\nFRAME\n" + "x" * 63).getBytes).isEmpty)
    val ok = Multimodal.y4mEncode(8, 6, "C420", Seq(pix(72, 1L), pix(72, 2L)))
    assert(Multimodal.decodeY4m(ok.take(ok.length - 5)).isEmpty,
      "truncated last frame must fail loudly")
    assert(Multimodal.decodeY4m(ok).exists(_.frames.length == 2))
  }

  test("extractFeatures routes real PNG/WAV through real decoders") {
    val (w, h, ch) = (6, 5, 3)
    val px = pix(w * h * ch, 11L)
    val png = Multimodal.pngEncode(w, h, ch, px)
    val f = Multimodal.decodeAnyFeatures(png, 16)
    val mean = px.map(_ & 0xff).map(_.toDouble).sum / px.length
    assert(math.abs(f(0) - mean) < 1e-9, "f(0) must be the REAL decoded pixel mean")
    val smp = Array.tabulate(200)(i => ((i * 31) % 65536) - 32768)
    val wav = Multimodal.wavEncodePcm16(16000, 1, smp)
    val g = Multimodal.decodeAnyFeatures(wav, 16)
    val sMean = smp.map(_ / 32768.0).sum / smp.length
    assert(math.abs(g(0) - sMean) < 1e-9, "g(0) must be the REAL decoded sample mean")
    // opaque bytes fall back to the documented fake
    val opaque = "just some text".getBytes("UTF-8")
    assert(Multimodal.decodeAnyFeatures(opaque, 16)
      .sameElements(Multimodal.fakeDecode(opaque, 16)))
  }
}
