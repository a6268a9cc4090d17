package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Real baseline-JPEG codec checks, three tiers:
  *   1. LOSSLESS tier — entropy coding over quantized coefficients
  *      roundtrips exactly (encode → decodeCoeffs), every sampling
  *      layout.
  *   2. ARITHMETIC tier — DC-only streams decode to the closed-form
  *      `clamp(((dc·q + 4) >> 3) + 128)` (the mm_jpeg_features oracle
  *      contract).
  *   3. CROSS-IMPLEMENTATION tier — the JDK's independent ImageIO
  *      (IJG-derived) codec decodes OUR streams to the same pixels, and
  *      OUR decoder decodes ImageIO-WRITTEN streams (foreign quant +
  *      Huffman tables read from DQT/DHT) to the same pixels.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def rng(seed: Long): () => Long = {
    var h = seed
    () => { h = h * 6364136223846793005L + 1442695040888963407L; h >>> 16 }
  }

  /** Padded coefficient grid for one component: sparse random blocks,
    * AC ∈ ±1023 (size ≤ 10, the Annex K AC table ceiling), DC ∈ ±1000. */
  private def randomGrid(nbx: Int, nby: Int, seed: Long): Array[Array[Int]] = {
    val r = rng(seed)
    Array.tabulate(nbx * nby) { _ =>
      val blk = new Array[Int](64)
      blk(0) = (r() % 2001).toInt - 1000
      var i = 0
      while (i < 6) { // sparse ACs, runs of zeros between
        val k = 1 + (r() % 63).toInt
        blk(k) = (r() % 2047).toInt - 1023
        i += 1
      }
      blk
    }
  }

  private def grids(w: Int, h: Int, sampling: Seq[(Int, Int)], seed: Long)
      : Seq[Array[Array[Int]]] = {
    val maxH = sampling.map(_._1).max; val maxV = sampling.map(_._2).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    sampling.zipWithIndex.map { case ((sh, sv), ci) =>
      randomGrid(mcusX * sh, mcusY * sv, seed + ci)
    }
  }

  test("coefficient roundtrip is lossless: gray, 4:4:4, 4:2:0, odd dims") {
    val layouts = Seq(
      (Seq((1, 1)), 23, 17),                      // gray, non-multiple dims
      (Seq((1, 1), (1, 1), (1, 1)), 16, 16),       // 4:4:4
      (Seq((2, 2), (1, 1), (1, 1)), 33, 21),       // 4:2:0 with padding
      (Seq((2, 1), (1, 1), (1, 1)), 24, 8))        // 4:2:2
    for (((sampling, w, h), li) <- layouts.zipWithIndex) {
      val cf = grids(w, h, sampling, 1000L * li)
      val jpg = Jpeg.encodeFromCoeffs(w, h, cf, sampling)
      val dec = Jpeg.decodeCoeffs(jpg)
      assert(dec.isDefined, s"layout $li failed to decode")
      val (dw, dh, dcf) = dec.get
      assert(dw == w && dh == h)
      assert(dcf.length == cf.length)
      cf.zip(dcf).zipWithIndex.foreach { case ((a, b), ci) =>
        assert(a.length == b.length, s"layout $li comp $ci block count")
        a.zip(b).zipWithIndex.foreach { case ((ba, bb), bi) =>
          assert(ba.sameElements(bb), s"layout $li comp $ci block $bi")
        }
      }
    }
  }

  test("DC-only stream decodes to the closed-form block value (oracle contract)") {
    val (w, h) = (20, 12) // 3x2 luma blocks, crop exercises padding
    val sampling = Seq((1, 1))
    val dcs = Seq(-55, 0, 17, 60, -31, 5)
    val cf = Seq(dcs.map { d =>
      val b = new Array[Int](64); b(0) = d; b
    }.toArray)
    val jpg = Jpeg.encodeFromCoeffs(w, h, cf, sampling)
    val r = Jpeg.decode(jpg).get
    assert(r.width == w && r.height == h && r.channels == 1)
    for (y <- 0 until h; x <- 0 until w) {
      val blk = (y / 8) * 3 + (x / 8)
      val expect = math.min(255, math.max(0,
        ((dcs(blk) * Jpeg.QLum(0) + 4) >> 3) + 128))
      assert((r.pixels(y * w + x) & 0xff) == expect, s"($x,$y)")
    }
  }

  test("ImageIO decodes OUR gray stream to (near-)identical pixels") {
    val (w, h) = (32, 24)
    val sampling = Seq((1, 1))
    val cf = grids(w, h, sampling, 77L).map(_.map { blk =>
      // keep magnitudes moderate so both IDCTs stay well inside range
      blk.zipWithIndex.map { case (v, i) => if (i == 0) v / 20 else v / 40 }
    })
    val jpg = Jpeg.encodeFromCoeffs(w, h, cf, sampling)
    val mine = Jpeg.decode(jpg).get
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(theirs != null, "ImageIO rejected our stream")
    assert(theirs.getWidth == w && theirs.getHeight == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      // raw raster sample — getRGB would run the nonlinear gray→sRGB
      // colorspace transform and compare apples to gamma
      val t = theirs.getRaster.getSample(x, y, 0)
      val m = mine.pixels(y * w + x) & 0xff
      maxDiff = math.max(maxDiff, math.abs(t - m))
    }
    assert(maxDiff <= 2, s"gray IDCT cross-impl drift $maxDiff > 2")
  }

  test("ImageIO decodes OUR 4:4:4 color stream to (near-)identical RGB") {
    val (w, h) = (16, 16)
    val sampling = Seq((1, 1), (1, 1), (1, 1))
    val cf = grids(w, h, sampling, 99L).map(_.map { blk =>
      blk.zipWithIndex.map { case (v, i) => if (i == 0) v / 30 else v / 60 }
    })
    val jpg = Jpeg.encodeFromCoeffs(w, h, cf, sampling)
    val mine = Jpeg.decode(jpg).get
    assert(mine.channels == 3)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(theirs != null)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = theirs.getRGB(x, y)
      val o = (y * w + x) * 3
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - (mine.pixels(o) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - (mine.pixels(o + 1) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - (mine.pixels(o + 2) & 0xff)))
    }
    assert(maxDiff <= 3, s"color cross-impl drift $maxDiff > 3")
  }

  test("our decoder reads an ImageIO-WRITTEN stream (foreign tables)") {
    val (w, h) = (40, 28)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5 + y * 3) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos), "no JPEG writer in JDK")
    val bytes = baos.toByteArray
    val mine = Jpeg.decode(bytes)
    assert(mine.isDefined, "our decoder rejected an ImageIO baseline stream")
    val r = mine.get
    assert(r.width == w && r.height == h)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val t = theirs.getRaster.getSample(x, y, 0) // raw, not gray→sRGB
      val m = r.pixels(y * w + x) & 0xff
      maxDiff = math.max(maxDiff, math.abs(t - m))
    }
    assert(maxDiff <= 2, s"foreign-stream drift $maxDiff > 2")
  }

  test("malformed streams fail as None, never as garbage or a throw") {
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode("definitely not a jpeg".getBytes).isEmpty)
    val jpg = Jpeg.encodeFromCoeffs(16, 16, grids(16, 16, Seq((1, 1)), 5L), Seq((1, 1)))
    assert(Jpeg.decode(jpg.take(jpg.length / 3)).isEmpty)
    // flip a byte inside the entropy segment: either still decodable or
    // a clean None — never an exception
    val c = jpg.clone(); c(jpg.length - 10) = (c(jpg.length - 10) ^ 0x7f).toByte
    Jpeg.decode(c) // must not throw
  }
}
