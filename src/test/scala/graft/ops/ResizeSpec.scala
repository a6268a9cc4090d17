package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Raster resize contracts: exact box block-means, the nearest index
  * map, identity cases, the loud non-integer-factor failure, and the
  * corpus-level decode→resize→re-encode map on PNG and JPEG inputs. */
class ResizeSpec extends AnyFunSuite {
  import Multimodal.{Raster, resizeRaster}

  private def gray(w: Int, h: Int, f: (Int, Int) => Int): Raster =
    Raster(w, h, 1, Array.tabulate(w * h)(i => (f(i % w, i / w) & 0xff).toByte))

  test("box 2x2 halves to the truncating block mean, per channel") {
    // 4x2, 2 channels: block (0,0) ch0 = {0, 10, 40, 50} -> 25
    val px = Array.tabulate(4 * 2 * 2) { i =>
      val c = i % 2; val x = (i / 2) % 4; val y = i / 8
      ((x * 10 + y * 40 + c * 3) & 0xff).toByte
    }
    val half = resizeRaster(Raster(4, 2, 2, px), 2, 1, "box")
    assert((half.width, half.height, half.channels) == (2, 1, 2))
    assert((half.pixels(0) & 0xff) == 25)      // ch0 block mean
    assert((half.pixels(1) & 0xff) == 28)      // ch1 = ch0 + 3
    assert((half.pixels(2) & 0xff) == 45)      // x-blocks {20,30}+{60,70}/4
  }

  test("box mean truncates (integer division, never rounds)") {
    val r = gray(2, 2, (x, y) => if (x == 0 && y == 0) 3 else 0) // mean 0.75
    assert((resizeRaster(r, 1, 1, "box").pixels(0) & 0xff) == 0)
  }

  test("nearest at the same size is the identity; upscale replicates") {
    val r = gray(3, 2, (x, y) => x + 10 * y)
    val same = resizeRaster(r, 3, 2, "nearest")
    assert(same.pixels.sameElements(r.pixels))
    val up = resizeRaster(gray(2, 1, (x, _) => x * 7), 4, 1, "nearest")
    assert(up.pixels.map(_ & 0xff).toSeq == Seq(0, 0, 7, 7))
  }

  test("non-integer box factor fails loudly; nearest handles any ratio") {
    val r = gray(5, 4, (x, y) => x + y)
    val e = intercept[IllegalArgumentException](resizeRaster(r, 2, 2, "box"))
    assert(e.getMessage.contains("integer shrink factors"))
    val nn = resizeRaster(r, 2, 3, "nearest")
    assert((nn.width, nn.height) == (2, 3))
  }

  test("resizeImages: PNG and JPEG decode, resize, PNG re-encode; bad rows null") {
    import TestSpark.spark.implicits._
    val pngBytes = Multimodal.pngEncode(4, 4, 3,
      Array.tabulate(48)(i => (i * 5).toByte))
    // a real JPEG from our encoder via the JDK-validated path used in specs
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 4).foreach(x =>
      img.setRGB(x, y, (x * 60 << 16) | (y * 60 << 8) | 128)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpgBytes = bos.toByteArray
    val df = Seq((1L, pngBytes), (2L, jpgBytes), (3L, Array[Byte](1, 2, 3)),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "bin")
    val out = Multimodal.resizeImages(df, "bin", 2, 2, "box")
      .select("id", "resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val r1 = Multimodal.decodePng(out(1L)).get
    assert((r1.width, r1.height, r1.channels) == (2, 2, 3))
    val r2 = Multimodal.decodePng(out(2L)).get
    assert((r2.width, r2.height) == (2, 2))
    assert(out(3L) == null && out(4L) == null)
  }
}
