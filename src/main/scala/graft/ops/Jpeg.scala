package graft.ops

/** REAL baseline JPEG (ITU T.81) codec — pure JVM, no external deps.
  *
  * Decoder: marker walk (DQT/DHT/SOF0/DRI/SOS), canonical Huffman
  * entropy decode with byte-unstuffing and restart-marker handling,
  * dequantization, the fixed-point Loeffler–Ligtenberg–Moshovitz
  * integer IDCT (the same published 13-bit constants every baseline
  * codec uses), replication chroma upsampling, and integer-exact
  * JFIF YCbCr→RGB. Baseline sequential only — progressive (SOF2),
  * arithmetic coding, and 12-bit precision are rejected with None.
  *
  * Encoder: coefficient-space fixture partner — callers hand QUANTIZED
  * DCT coefficient blocks and get spec-valid JFIF bytes (Annex K quant +
  * Huffman tables written to DQT/DHT, so any conforming decoder — ours
  * or the JDK's ImageIO — reads them back). Entropy coding is lossless
  * over quantized coefficients, which is what makes exact oracles
  * possible for a lossy format: the DC-only gate fixture decodes to
  * `clamp(((dc·q + 4) >> 3) + 128)` per block, pure integer arithmetic
  * a SQL engine replays without ever seeing the JPEG bytes.
  *
  * Reference analogue: the torchvision JPEG decode behind polars-ts
  * imaging adapters (`polars_ts/imaging.py`) — ours is the byte-level
  * JVM path.
  */
object Jpeg {

  // ── Annex K tables (ITU T.81, public standard) ──────────────────────

  /** Zigzag scan: natural-order index of the k-th zigzag coefficient. */
  private[ops] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (natural order). */
  private[ops] val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table (natural order). */
  private[ops] val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChromBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // ── canonical Huffman code construction (T.81 Annex C) ──────────────

  /** Decoder-side table (T.81 F.2.2.3: MINCODE/MAXCODE/VALPTR). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    // encoder-side: symbol → (code, length)
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          var i = 0
          while (i < bits(l - 1)) {
            codeOf(vals(k)) = code; lenOf(vals(k)) = l
            code += 1; k += 1; i += 1
          }
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** One Huffman symbol off the bit reader; −1 on exhausted/invalid. */
    def decode(br: BitReader): Int = {
      var code = br.readBit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return vals(valPtr(l) + code - minCode(l))
        val b = br.readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1
    }
  }

  private val TDcLum = new HuffTable(DcLumBits, DcLumVals)
  private val TDcChrom = new HuffTable(DcChromBits, DcChromVals)
  private val TAcLum = new HuffTable(AcLumBits, AcLumVals)
  private val TAcChrom = new HuffTable(AcChromBits, AcChromVals)

  // ── entropy-segment bit IO (byte stuffing per T.81 B.1.1.5) ─────────

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0; private var cnt = 0
    var atMarker = false
    def readBit(): Int = {
      if (cnt == 0) {
        if (atMarker || pos >= data.length) return -1
        val b = data(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 < data.length && (data(pos + 1) & 0xff) == 0x00) {
            buf = 0xff; pos += 2
          } else { atMarker = true; return -1 }
        } else { buf = b; pos += 1 }
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    /** `n` magnitude bits as an unsigned int; −1 if exhausted. */
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** Byte-align and step over an expected RSTn marker. False if the
      * next marker is not RST0–RST7. */
    def skipRestart(): Boolean = {
      cnt = 0
      if (!atMarker) {
        // reader stopped short of the marker bytes — find them
        while (pos + 1 < data.length && (data(pos) & 0xff) != 0xff) pos += 1
      }
      if (pos + 1 >= data.length) return false
      val m = data(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2; atMarker = false
      true
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0; private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (cnt > 0) { put(0xff, 8 - cnt) }
  }

  /** EXTEND (T.81 F.12): magnitude-category bits → signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Magnitude category of a value (T.81 F.1.2.1.1). */
  private def category(v: Int): Int = {
    // Long abs: math.abs(Int.MinValue) stays negative and would make
    // the shift loop spin forever (unreachable after the range require
    // in encodeFromCoeffs, but kept total on principle)
    var a = math.abs(v.toLong); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ── fixed-point integer IDCT (Loeffler–Ligtenberg–Moshovitz) ────────
  // The published 13-bit fixed-point constants used by every baseline
  // implementation (CONST_BITS=13, PASS1_BITS=2). Input: DEQUANTIZED
  // coefficients in natural order. Output: clamped 0..255 samples
  // (+128 level shift applied here).

  private val ConstBits = 13
  private val Pass1Bits = 2
  private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt
  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private[ops] def idct8x8(in: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Long](64)
    // pass 1: columns → workspace (scaled up by PASS1_BITS)
    var c = 0
    while (c < 8) {
      if (in(8 + c) == 0 && in(16 + c) == 0 && in(24 + c) == 0 &&
          in(32 + c) == 0 && in(40 + c) == 0 && in(48 + c) == 0 && in(56 + c) == 0) {
        val dc = (in(c).toLong << Pass1Bits)
        var r = 0
        while (r < 8) { ws(8 * r + c) = dc; r += 1 }
      } else {
        var z2 = in(16 + c).toLong; var z3 = in(48 + c).toLong
        var z1 = (z2 + z3) * 4433L
        val t2 = z1 - z3 * 15137L
        val t3 = z1 + z2 * 6270L
        z2 = in(c).toLong; z3 = in(32 + c).toLong
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val s10 = t0 + t3; val s13 = t0 - t3
        val s11 = t1 + t2; val s12 = t1 - t2
        var o0 = in(56 + c).toLong; var o1 = in(40 + c).toLong
        var o2 = in(24 + c).toLong; var o3 = in(8 + c).toLong
        z1 = o0 + o3; z2 = o1 + o2
        var zz3 = o0 + o2; var z4 = o1 + o3
        val z5 = (zz3 + z4) * 9633L
        o0 *= 2446L; o1 *= 16819L; o2 *= 25172L; o3 *= 12299L
        z1 *= -7373L; z2 *= -20995L; zz3 *= -16069L; z4 *= -3196L
        zz3 += z5; z4 += z5
        val r0 = o0 + z1 + zz3; val r1 = o1 + z2 + z4
        val r2 = o2 + z2 + zz3; val r3 = o3 + z1 + z4
        ws(c) = (s10 + r3 + (1L << (ConstBits - Pass1Bits - 1))) >> (ConstBits - Pass1Bits)
        ws(56 + c) = (s10 - r3 + (1L << (ConstBits - Pass1Bits - 1))) >> (ConstBits - Pass1Bits)
        ws(8 + c) = (s11 + r2 + (1L << (ConstBits - Pass1Bits - 1))) >> (ConstBits - Pass1Bits)
        ws(48 + c) = (s11 - r2 + (1L << (ConstBits - Pass1Bits - 1))) >> (ConstBits - Pass1Bits)
        ws(16 + c) = (s12 + r1 + (1L << (ConstBits - Pass1Bits - 1))) >> (ConstBits - Pass1Bits)
        ws(40 + c) = (s12 - r1 + (1L << (ConstBits - Pass1Bits - 1))) >> (ConstBits - Pass1Bits)
        ws(24 + c) = (s13 + r0 + (1L << (ConstBits - Pass1Bits - 1))) >> (ConstBits - Pass1Bits)
        ws(32 + c) = (s13 - r0 + (1L << (ConstBits - Pass1Bits - 1))) >> (ConstBits - Pass1Bits)
      }
      c += 1
    }
    // pass 2: rows → samples
    var r = 0
    while (r < 8) {
      val b = 8 * r
      if (ws(b + 1) == 0 && ws(b + 2) == 0 && ws(b + 3) == 0 && ws(b + 4) == 0 &&
          ws(b + 5) == 0 && ws(b + 6) == 0 && ws(b + 7) == 0) {
        val v = clamp255(descale(ws(b), Pass1Bits + 3) + 128)
        var i = 0
        while (i < 8) { out(b + i) = v; i += 1 }
      } else {
        var z2 = ws(b + 2); var z3 = ws(b + 6)
        var z1 = (z2 + z3) * 4433L
        val t2 = z1 - z3 * 15137L
        val t3 = z1 + z2 * 6270L
        z2 = ws(b); z3 = ws(b + 4)
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val s10 = t0 + t3; val s13 = t0 - t3
        val s11 = t1 + t2; val s12 = t1 - t2
        var o0 = ws(b + 7); var o1 = ws(b + 5)
        var o2 = ws(b + 3); var o3 = ws(b + 1)
        z1 = o0 + o3; z2 = o1 + o2
        var zz3 = o0 + o2; var z4 = o1 + o3
        val z5 = (zz3 + z4) * 9633L
        o0 *= 2446L; o1 *= 16819L; o2 *= 25172L; o3 *= 12299L
        z1 *= -7373L; z2 *= -20995L; zz3 *= -16069L; z4 *= -3196L
        zz3 += z5; z4 += z5
        val r0 = o0 + z1 + zz3; val r1 = o1 + z2 + z4
        val r2 = o2 + z2 + zz3; val r3 = o3 + z1 + z4
        val sh = ConstBits + Pass1Bits + 3
        out(b) = clamp255(descale(s10 + r3, sh) + 128)
        out(b + 7) = clamp255(descale(s10 - r3, sh) + 128)
        out(b + 1) = clamp255(descale(s11 + r2, sh) + 128)
        out(b + 6) = clamp255(descale(s11 - r2, sh) + 128)
        out(b + 2) = clamp255(descale(s12 + r1, sh) + 128)
        out(b + 5) = clamp255(descale(s12 - r1, sh) + 128)
        out(b + 3) = clamp255(descale(s13 + r0, sh) + 128)
        out(b + 4) = clamp255(descale(s13 - r0, sh) + 128)
      }
      r += 1
    }
  }

  // ── decoder ─────────────────────────────────────────────────────────

  private case class Comp(id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** REAL baseline JPEG decode → [[Multimodal.Raster]] (gray: 1 channel;
    * color: 3-channel interleaved RGB via integer JFIF conversion, or
    * raw YCbCr when `toRgb` is false). None on anything non-baseline or
    * malformed. */
  def decode(bytes: Array[Byte], toRgb: Boolean = true): Option[Multimodal.Raster] =
    decodeInternal(bytes).map { case (w, h, comps, planes, pw) =>
      assemble(w, h, comps, planes, pw, toRgb)
    }

  /** Guard: a malformed stream (bad Huffman code, truncated segment)
    * must fail as None, never as a thrown index error. */
  private def safely[A](body: => Option[A]): Option[A] =
    try body catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Spec hook: the QUANTIZED coefficient blocks exactly as entropy-
    * decoded (per component: row-major padded block grid of 64-length
    * natural-order arrays), before dequant/IDCT. Proves the lossless
    * half of the pipeline losslessly. */
  private[ops] def decodeCoeffs(bytes: Array[Byte])
      : Option[(Int, Int, Seq[Array[Array[Int]]])] =
    safely(parseStream(bytes, keepCoeffs = true)).map(s => (s.w, s.h, s.coeffs))

  private case class Parsed(w: Int, h: Int, comps: Seq[Comp],
      planes: Seq[Array[Int]], planeW: Seq[Int], coeffs: Seq[Array[Array[Int]]])

  private def decodeInternal(bytes: Array[Byte])
      : Option[(Int, Int, Seq[Comp], Seq[Array[Int]], Seq[Int])] =
    safely(parseStream(bytes, keepCoeffs = false)).map(s =>
      (s.w, s.h, s.comps, s.planes, s.planeW))

  private def parseStream(bytes: Array[Byte], keepCoeffs: Boolean): Option[Parsed] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64)
    val qtSeen = new Array[Boolean](4)
    val dcT = new Array[HuffTable](4); val acT = new Array[HuffTable](4)
    var comps: Seq[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (pos + 3 >= bytes.length) return None
      if ((bytes(pos) & 0xff) != 0xff) return None
      var mpos = pos
      while (mpos < bytes.length && (bytes(mpos) & 0xff) == 0xff) mpos += 1
      if (mpos >= bytes.length) return None
      val marker = bytes(mpos) & 0xff
      pos = mpos + 1
      marker match {
        case 0xd8 => () // spurious SOI
        case 0xd9 => return None // EOI before SOS
        case 0xc0 | 0xc1 => // baseline / extended sequential
          val len = be16(bytes, pos)
          if (pos + len > bytes.length) return None
          val prec = bytes(pos + 2) & 0xff
          if (prec != 8) return None
          h = be16(bytes, pos + 3); w = be16(bytes, pos + 5)
          val nf = bytes(pos + 7) & 0xff
          if (w <= 0 || h <= 0 || (nf != 1 && nf != 3)) return None
          // allocation guard against hostile SOF dimensions
          if (w.toLong * h > (1L << 28)) return None
          comps = (0 until nf).map { i =>
            val o = pos + 8 + 3 * i
            val hv = bytes(o + 1) & 0xff
            Comp(bytes(o) & 0xff, (hv >> 4) & 0xf, hv & 0xf, bytes(o + 2) & 0xff)
          }
          if (comps.exists(cp => cp.h < 1 || cp.h > 2 || cp.v < 1 || cp.v > 2 ||
              cp.tq > 3)) return None
          pos += len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive/lossless/arithmetic — not baseline
        case 0xc4 => // DHT (possibly several tables)
          val len = be16(bytes, pos)
          if (pos + len > bytes.length) return None
          var o = pos + 2
          while (o < pos + len) {
            val tc = (bytes(o) >> 4) & 0xf; val th = bytes(o) & 0xf
            if (th > 3 || tc > 1) return None
            val bits = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xff)
            val n = bits.sum
            if (o + 17 + n > pos + len) return None
            val vals = Array.tabulate(n)(i => bytes(o + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            o += 17 + n
          }
          pos += len
        case 0xdb => // DQT (zigzag order in stream → natural here)
          val len = be16(bytes, pos)
          if (pos + len > bytes.length) return None
          var o = pos + 2
          while (o < pos + len) {
            val pq = (bytes(o) >> 4) & 0xf; val tq = bytes(o) & 0xf
            if (pq != 0 || tq > 3) return None // 8-bit tables only
            if (o + 65 > pos + len) return None
            var k = 0
            while (k < 64) { qt(tq)(Zigzag(k)) = bytes(o + 1 + k) & 0xff; k += 1 }
            qtSeen(tq) = true
            o += 65
          }
          pos += len
        case 0xdd => // DRI
          val len = be16(bytes, pos)
          if (len != 4 || pos + len > bytes.length) return None
          restartInterval = be16(bytes, pos + 2)
          pos += len
        case 0xda => // SOS
          val len = be16(bytes, pos)
          if (comps == null || pos + len > bytes.length) return None
          val ns = bytes(pos + 2) & 0xff
          if (ns != comps.length) return None // single interleaved scan only
          var i = 0
          while (i < ns) {
            val cid = bytes(pos + 3 + 2 * i) & 0xff
            val tt = bytes(pos + 4 + 2 * i) & 0xff
            comps.find(_.id == cid) match {
              case Some(cp) => cp.td = (tt >> 4) & 0xf; cp.ta = tt & 0xf
              case None => return None
            }
            i += 1
          }
          sosAt = pos + len
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST before scan
        case _ => // APPn / COM / anything with a length — skip
          val len = be16(bytes, pos)
          if (len < 2 || pos + len > bytes.length) return None
          pos += len
      }
    }
    // entropy-coded scan
    val maxH = comps.map(_.h).max; val maxV = comps.map(_.v).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    if (comps.exists(cp => !qtSeen(cp.tq) || dcT(cp.td) == null || acT(cp.ta) == null))
      return None
    val blocksW = comps.map(cp => mcusX * cp.h)
    val blocksH = comps.map(cp => mcusY * cp.v)
    val planeW = blocksW.map(_ * 8)
    val planes = comps.indices.map(i => new Array[Int](planeW(i) * blocksH(i) * 8))
    val coeffStore: Seq[Array[Array[Int]]] =
      if (keepCoeffs) comps.indices.map(i =>
        Array.ofDim[Int](blocksW(i) * blocksH(i), 64))
      else null
    val br = new BitReader(bytes, sosAt)
    val pred = new Array[Int](comps.length)
    val block = new Array[Int](64)
    val deq = new Array[Int](64)
    val sample = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.skipRestart()) return None
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val cp = comps(ci)
        var vy = 0
        while (vy < cp.v) {
          var vx = 0
          while (vx < cp.h) {
            java.util.Arrays.fill(block, 0)
            // DC
            val t = dcT(cp.td).decode(br)
            if (t < 0 || t > 15) return None
            val diffBits = br.receive(t)
            if (diffBits < 0) return None
            pred(ci) += extend(diffBits, t)
            block(0) = pred(ci)
            // AC
            var k = 1
            var bad = false
            while (k < 64 && !bad) {
              val rs = acT(cp.ta).decode(br)
              if (rs < 0) bad = true
              else {
                val run = (rs >> 4) & 0xf; val size = rs & 0xf
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += run
                  if (k > 63) bad = true
                  else {
                    val mb = br.receive(size)
                    if (mb < 0) bad = true
                    else { block(Zigzag(k)) = extend(mb, size); k += 1 }
                  }
                }
              }
            }
            if (bad) return None
            val bIdx = (my * cp.v + vy) * blocksW(ci) + (mx * cp.h + vx)
            if (keepCoeffs) System.arraycopy(block, 0, coeffStore(ci)(bIdx), 0, 64)
            // dequant + IDCT into the component plane
            val q = qt(cp.tq)
            var i = 0
            while (i < 64) { deq(i) = block(i) * q(i); i += 1 }
            idct8x8(deq, sample)
            val px0 = (mx * cp.h + vx) * 8; val py0 = (my * cp.v + vy) * 8
            var r = 0
            while (r < 8) {
              var cc = 0
              while (cc < 8) {
                planes(ci)((py0 + r) * planeW(ci) + px0 + cc) = sample(8 * r + cc)
                cc += 1
              }
              r += 1
            }
            vx += 1
          }
          vy += 1
        }
        ci += 1
      }
      mcu += 1
    }
    Some(Parsed(w, h, comps, planes, planeW, coeffStore))
  }

  /** Upsample (replication) + crop + optional integer YCbCr→RGB. */
  private def assemble(w: Int, h: Int, comps: Seq[Comp],
      planes: Seq[Array[Int]], planeW: Seq[Int], toRgb: Boolean): Multimodal.Raster = {
    val maxH = comps.map(_.h).max; val maxV = comps.map(_.v).max
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * planeW(0) + x).toByte
          x += 1
        }
        y += 1
      }
      Multimodal.Raster(w, h, 1, out)
    } else {
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def s(ci: Int): Int = {
            val cp = comps(ci)
            val cx = x * cp.h / maxH; val cy = y * cp.v / maxV
            planes(ci)(cy * planeW(ci) + cx)
          }
          val yy = s(0); val cb = s(1) - 128; val cr = s(2) - 128
          val o = (y * w + x) * 3
          if (toRgb) {
            // JFIF fixed-point (×65536, round-half-up via +32768 >> 16)
            out(o) = clamp255(yy + ((91881 * cr + 32768) >> 16)).toByte
            out(o + 1) = clamp255(yy + ((-22554 * cb - 46802 * cr + 32768) >> 16)).toByte
            out(o + 2) = clamp255(yy + ((116130 * cb + 32768) >> 16)).toByte
          } else {
            out(o) = clamp255(yy).toByte
            out(o + 1) = clamp255(cb + 128).toByte
            out(o + 2) = clamp255(cr + 128).toByte
          }
          x += 1
        }
        y += 1
      }
      Multimodal.Raster(w, h, 3, out)
    }
  }

  // ── encoder (coefficient-space fixture partner) ─────────────────────

  /** Encode QUANTIZED coefficient blocks as a spec-valid baseline JFIF.
    * `coeffs(c)` is the row-major PADDED block grid for component `c`
    * (grid dims `mcusX·h_c × mcusY·v_c`), each block 64 natural-order
    * quantized coefficients. `gray` → 1 component; else 3-component
    * YCbCr with the given per-component (h,v) sampling factors. Annex K
    * quant + Huffman tables are written into DQT/DHT, so any conforming
    * decoder reads this stream. */
  def encodeFromCoeffs(w: Int, h: Int, coeffs: Seq[Array[Array[Int]]],
      sampling: Seq[(Int, Int)]): Array[Byte] = {
    require(w > 0 && h > 0)
    require(coeffs.length == 1 || coeffs.length == 3)
    require(coeffs.length == sampling.length)
    sampling.foreach { case (sh, sv) =>
      require(sh >= 1 && sh <= 2 && sv >= 1 && sv <= 2, s"bad sampling ($sh,$sv)")
    }
    val nComp = coeffs.length
    val maxH = sampling.map(_._1).max; val maxV = sampling.map(_._2).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    (0 until nComp).foreach { ci =>
      val need = (mcusX * sampling(ci)._1) * (mcusY * sampling(ci)._2)
      require(coeffs(ci).length == need,
        s"component $ci: ${coeffs(ci).length} blocks, want $need")
    }
    // T.81 8-bit-precision range: quantized coefficients live in
    // [-1023, 1023] (AC categories <= 10, DC-diff categories <= 11 —
    // exactly the Annex K table domains). An out-of-range value would
    // index a MISSING Huffman symbol (lenOf = 0) and emit a silently
    // undecodable stream, so the contract is enforced loudly here.
    coeffs.zipWithIndex.foreach { case (blocks, ci) =>
      blocks.foreach { blk =>
        var i = 0
        while (i < blk.length) {
          require(blk(i) >= -1023 && blk(i) <= 1023,
            s"component $ci: coefficient ${blk(i)} outside the T.81 " +
              "8-bit range [-1023, 1023]")
          i += 1
        }
      }
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    def wByte(v: Int): Unit = out.write(v & 0xff)
    def wShort(v: Int): Unit = { wByte(v >> 8); wByte(v) }
    def marker(m: Int): Unit = { wByte(0xff); wByte(m) }
    marker(0xd8) // SOI
    // APP0 JFIF
    marker(0xe0); wShort(16)
    Seq('J', 'F', 'I', 'F', 0).foreach(c => wByte(c.toInt))
    wByte(1); wByte(1); wByte(0); wShort(1); wShort(1); wByte(0); wByte(0)
    // DQT (zigzag order on the wire)
    def dqt(tq: Int, table: Array[Int]): Unit = {
      marker(0xdb); wShort(67); wByte(tq)
      var k = 0
      while (k < 64) { wByte(table(Zigzag(k))); k += 1 }
    }
    dqt(0, QLum)
    if (nComp == 3) dqt(1, QChrom)
    // SOF0
    marker(0xc0); wShort(8 + 3 * nComp); wByte(8); wShort(h); wShort(w); wByte(nComp)
    (0 until nComp).foreach { ci =>
      wByte(ci + 1)
      wByte((sampling(ci)._1 << 4) | sampling(ci)._2)
      wByte(if (ci == 0) 0 else 1)
    }
    // DHT ×4 (×2 for gray)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); wShort(19 + vals.length); wByte((tc << 4) | th)
      bits.foreach(wByte); vals.foreach(wByte)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    if (nComp == 3) {
      dht(0, 1, DcChromBits, DcChromVals); dht(1, 1, AcChromBits, AcChromVals)
    }
    // SOS
    marker(0xda); wShort(6 + 2 * nComp); wByte(nComp)
    (0 until nComp).foreach { ci =>
      wByte(ci + 1); wByte(if (ci == 0) 0x00 else 0x11)
    }
    wByte(0); wByte(63); wByte(0)
    // entropy-coded interleaved scan
    val bw = new BitWriter(out)
    val pred = new Array[Int](nComp)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < nComp) {
        val (sh, sv) = sampling(ci)
        val dcTab = if (ci == 0) TDcLum else TDcChrom
        val acTab = if (ci == 0) TAcLum else TAcChrom
        var vy = 0
        while (vy < sv) {
          var vx = 0
          while (vx < sh) {
            val blk = coeffs(ci)((my * sv + vy) * (mcusX * sh) + (mx * sh + vx))
            // DC
            val diff = blk(0) - pred(ci); pred(ci) = blk(0)
            val t = category(diff)
            bw.put(dcTab.codeOf(t), dcTab.lenOf(t))
            if (t > 0)
              bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
            // AC (zigzag walk, RLE with ZRL + EOB)
            var run = 0
            var k = 1
            while (k < 64) {
              val v = blk(Zigzag(k))
              if (v == 0) run += 1
              else {
                while (run > 15) {
                  bw.put(acTab.codeOf(0xf0), acTab.lenOf(0xf0)); run -= 16
                }
                val s = category(v)
                val sym = (run << 4) | s
                bw.put(acTab.codeOf(sym), acTab.lenOf(sym))
                bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
                run = 0
              }
              k += 1
            }
            if (run > 0) bw.put(acTab.codeOf(0x00), acTab.lenOf(0x00)) // EOB
            vx += 1
          }
          vy += 1
        }
        ci += 1
      }
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
