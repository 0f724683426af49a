package graft.multimodal

/** Arithmetic-coded sequential JPEG encoder (ITU-T T.81 SOF9): forward
  * DCT + quantization + the Annex F.1.4 DC/AC statistical models over the
  * [[QmCoder]] QM coder. Exists to SYNTHESIZE fixtures for the decoder
  * gate — the JDK's ImageIO writer cannot produce arithmetic streams, so
  * completing the decode surface needs an in-repo encoder (same pattern
  * as the WAV/BMP/AVI builders). 4:4:4 (or grayscale), 8-bit, flat quant
  * table, interleaved single scan; emits DQT, SOF9, DAC (explicit default
  * conditioning: L=0, U=1, Kx=5), SOS, optional restart markers, EOI.
  *
  * The coding model mirrors [[JpegDecode]]'s arithmetic scan decode
  * decision for decision (JpegArithSpec round-trips both, plus the raw
  * coder); statistics bins follow the Annex F layout: per DC table 64
  * one-byte bins (5 conditioning classes × 4 + magnitude staircase at
  * 20), per AC table 256 bins (3 per coefficient index + the two
  * magnitude staircases at 189/217), sign bits in the fixed
  * state-113 bin.
  */
object JpegArithEncode {

  private val zz: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (s <- 0 until 15; r <- 0 to math.min(s, 7) if s - r <= 7) {
      val (row, col) = if (s % 2 == 0) (s - r, r) else (r, s - r)
      out(i) = row * 8 + col
      i += 1
    }
    out
  }

  /** Forward 8×8 DCT, direct double-precision definition (T.81 A.3.3). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sum += block(y * 8 + x) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) 0.70710678118654752 else 1.0
        val cv = if (v == 0) 0.70710678118654752 else 1.0
        out(v * 8 + u) = sum * cu * cv / 4.0
        u += 1
      }
      v += 1
    }
    out
  }

  /** DC difference: one decision tree per T.81 F.1.4.1 (mirrored by the
    * decoder's `decodeDcArith`). Returns nothing; updates `dcCtx`.
    */
  private def encodeDc(enc: QmCoder.Enc, st: Array[Byte], dcCtx: Array[Int],
      ci: Int, diff: Int): Unit = {
    val base = dcCtx(ci)
    if (diff == 0) {
      enc.encode(st, base, 0)
      dcCtx(ci) = 0
    } else {
      enc.encode(st, base, 1)
      val sign = if (diff < 0) 1 else 0
      enc.encode(st, base + 1, sign)
      val v = math.abs(diff) - 1
      var m = 0
      if (v == 0) enc.encode(st, base + 2 + sign, 0)
      else {
        enc.encode(st, base + 2 + sign, 1)
        m = 1
        var bin = 20 // magnitude-category staircase (Table F.4 X1…)
        while (v >= (m << 1)) { enc.encode(st, bin, 1); m <<= 1; bin += 1 }
        enc.encode(st, bin, 0)
        var mm = m >> 1 // magnitude bits, all in one bin at staircase+14
        while (mm != 0) {
          enc.encode(st, bin + 14, if ((v & mm) != 0) 1 else 0)
          mm >>= 1
        }
      }
      // conditioning class for the NEXT block (F.1.4.4.1.2); defaults
      // L=0, U=1: m≤1 → small diff, m>1 → large diff
      dcCtx(ci) = if (m > 1) 12 + sign * 4 else 4 + sign * 4
    }
  }

  /** AC coefficients per T.81 F.1.4.2 (mirrored by `decodeAcArith`):
    * per-k EOB decision, zero-run decisions, fixed-bin sign, magnitude
    * category with the k≤Kx / k>Kx staircase split.
    */
  private def encodeAc(enc: QmCoder.Enc, st: Array[Byte], fixed: Array[Byte],
      coef: Array[Int], kx: Int, ss: Int = 1, se: Int = 63): Unit = {
    var kend = se
    while (kend >= ss && coef(zz(kend)) == 0) kend -= 1
    var k = ss
    while (k <= kend) {
      var base = 3 * (k - 1)
      enc.encode(st, base, 0) // not end-of-block
      while (coef(zz(k)) == 0) {
        enc.encode(st, base + 1, 0)
        base += 3
        k += 1
      }
      enc.encode(st, base + 1, 1)
      val x = coef(zz(k))
      val sign = if (x < 0) 1 else 0
      enc.encode(fixed, 0, sign) // equiprobable non-adapting bin
      val v = math.abs(x) - 1
      var m = 0
      var bitsBin = base + 2 + 14
      if (v == 0) enc.encode(st, base + 2, 0)
      else {
        enc.encode(st, base + 2, 1)
        m = 1
        if (v < 2) enc.encode(st, base + 2, 0) // same bin decides v ≥ 2
        else {
          enc.encode(st, base + 2, 1)
          m = 2
          var bin = if (k <= kx) 189 else 217
          while (v >= (m << 1)) { enc.encode(st, bin, 1); m <<= 1; bin += 1 }
          enc.encode(st, bin, 0)
          bitsBin = bin + 14
        }
      }
      var mm = m >> 1
      while (mm != 0) {
        enc.encode(st, bitsBin, if ((v & mm) != 0) 1 else 0)
        mm >>= 1
      }
      k += 1
    }
    if (k <= se) enc.encode(st, 3 * (k - 1), 1) // end-of-block (band)
  }

  /** AC refinement scan for one block (mirror of
    * [[JpegDecode.decodeAcRefineArith]]): `vAl` is the coefficient value
    * revealed at this level (trunc toward zero), `vPrev` the previous
    * level's — previously-nonzero positions take a correction bit, a
    * position whose value first becomes ±1 at this level codes
    * newly-nonzero + sign, and past the last previously-nonzero index an
    * end-of-band decision precedes each position.
    */
  private def encodeAcRefine(enc: QmCoder.Enc, st: Array[Byte],
      fixed: Array[Byte], coef: Array[Int], ss: Int, se: Int, al: Int): Unit = {
    val p1 = 1 << al
    def vAl(k: Int): Int = coef(zz(k)) / p1 // Int division: toward zero
    def vPrev(k: Int): Int = coef(zz(k)) / (p1 << 1)
    var kex = se
    while (kex > 0 && vPrev(kex) == 0) kex -= 1
    var kend = se
    while (kend >= ss && vAl(kend) == 0) kend -= 1
    var k = ss
    while (k <= se) {
      var base = 3 * (k - 1)
      if (k > kex) {
        val done = k > kend
        enc.encode(st, base, if (done) 1 else 0)
        if (done) return
      }
      var placed = false
      while (!placed) {
        if (vPrev(k) != 0) {
          enc.encode(st, base + 2, math.abs(vAl(k)) & 1)
          placed = true
        } else if (vAl(k) != 0) {
          enc.encode(st, base + 1, 1)
          enc.encode(fixed, 0, if (vAl(k) < 0) 1 else 0)
          placed = true
        } else {
          enc.encode(st, base + 1, 0)
          base += 3
          k += 1
        }
      }
      k += 1
    }
  }

  private def put16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }

  /** Encode as a HIERARCHICAL pyramid (T.81 annex J, same-resolution
    * form): DHP frame header, a coarsely-quantized non-differential SOF9
    * first frame, then one SOF13 differential frame coding the
    * sample-domain residual (source − first frame's reconstruction) at
    * quant 1 — no level shift, DC prediction frozen at zero (F.2.1.3.1).
    * The encoder reconstructs the first frame with the decoder's own
    * dequant+IDCT+round+clamp arithmetic, so the residual it codes is
    * exactly the one the decoder will add back. No EXP/upsampling (the
    * resolution-pyramid form stays quarantined).
    */
  def encodeHierarchical(width: Int, height: Int, channels: Int,
      px: (Int, Int, Int) => Int, quantBase: Int,
      precision: Int = 8): Array[Byte] = {
    require(channels == 1 || channels == 3, "1 or 3 channels")
    require(quantBase >= 1 && quantBase <= 255, "flat 8-bit quant value")
    require(precision == 8 || precision == 12, "8- or 12-bit samples")
    val half = 1 << (precision - 1)
    val maxV = (1 << precision) - 1
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // quant tables: 0/1 = coarse base frame, 2/3 = unit residual frame
    val nq = if (channels == 3) 2 else 1
    out.write(0xff); out.write(0xdb); put16(out, 2 + 65 * 2 * nq)
    for (t <- 0 until nq) { out.write(t); (0 until 64).foreach(_ => out.write(quantBase)) }
    for (t <- 0 until nq) { out.write(2 + t); (0 until 64).foreach(_ => out.write(1)) }
    // DHP: the full-image frame header (same syntax as SOF, B.3.2)
    out.write(0xff); out.write(0xde); put16(out, 8 + 3 * channels)
    out.write(precision); put16(out, height); put16(out, width); out.write(channels)
    for (c <- 0 until channels) {
      out.write(c + 1); out.write(0x11); out.write(if (c == 0) 0 else 1)
    }
    out.write(0xff); out.write(0xcc); put16(out, 2 + 2 * 2 * nq) // DAC
    for (t <- 0 until nq) { out.write(t); out.write(0x10) }
    for (t <- 0 until nq) { out.write(0x10 | t); out.write(5) }

    // integer component samples (the domain hierarchical residuals live in)
    val bw = (width + 7) / 8; val bh = (height + 7) / 8
    val nBlk = bw * bh
    val src = Array.ofDim[Int](channels, bw * 8 * bh * 8)
    var y = 0
    while (y < bh * 8) {
      var x = 0
      while (x < bw * 8) {
        val sy = math.min(y, height - 1); val sx = math.min(x, width - 1)
        if (channels == 1) src(0)(y * bw * 8 + x) = px(sy, sx, 0)
        else {
          val r = px(sy, sx, 0); val g = px(sy, sx, 1); val b = px(sy, sx, 2)
          def cl(v: Double) = math.max(0, math.min(maxV, math.round(v).toInt))
          src(0)(y * bw * 8 + x) = cl(0.299 * r + 0.587 * g + 0.114 * b)
          src(1)(y * bw * 8 + x) = cl(-0.168736 * r - 0.331264 * g + 0.5 * b + half)
          src(2)(y * bw * 8 + x) = cl(0.5 * r - 0.418688 * g - 0.081312 * b + half)
        }
        x += 1
      }
      y += 1
    }

    // one sequential arithmetic frame over integer sample planes.
    // differential: no level shift, DC prediction frozen at zero.
    def frame(marker: Int, tqBase: Int, quant: Int, planes: Array[Array[Int]],
        differential: Boolean): Array[Array[Int]] = {
      out.write(0xff); out.write(marker); put16(out, 8 + 3 * channels)
      out.write(precision); put16(out, height); put16(out, width); out.write(channels)
      for (c <- 0 until channels) {
        out.write(c + 1); out.write(0x11)
        out.write(tqBase + (if (c == 0) 0 else 1))
      }
      out.write(0xff); out.write(0xda); put16(out, 6 + 2 * channels) // SOS
      out.write(channels)
      for (c <- 0 until channels) {
        out.write(c + 1)
        val t = if (c == 0) 0 else 1
        out.write((t << 4) | t)
      }
      out.write(0); out.write(63); out.write(0)
      val enc = new QmCoder.Enc
      val nt = if (channels == 3) 2 else 1
      val dcStats = Array.fill(nt)(new Array[Byte](64))
      val acStats = Array.fill(nt)(new Array[Byte](256))
      val fixed = Array[Byte](QmCoder.FixedState.toByte)
      val dcCtx = new Array[Int](channels)
      val lastDc = new Array[Int](channels)
      // decoder-mirrored reconstruction accumulates here
      val recon = planes.map(p => new Array[Int](p.length))
      val block = new Array[Double](64)
      val coef = new Array[Int](64)
      val shift = if (differential) 0 else half
      var blk = 0
      while (blk < nBlk) {
        val mx = blk % bw; val my = blk / bw
        var ci = 0
        while (ci < channels) {
          val t = if (ci == 0) 0 else 1
          var i = 0
          while (i < 64) {
            block(i) = planes(ci)((my * 8 + i / 8) * bw * 8 + mx * 8 + i % 8)
              .toDouble - shift
            i += 1
          }
          val f = fdct(block)
          i = 0
          while (i < 64) { coef(i) = math.round(f(i) / quant).toInt; i += 1 }
          val dc = coef(0)
          encodeDc(enc, dcStats(t), dcCtx, ci, dc - lastDc(ci))
          if (!differential) lastDc(ci) = dc // differential: pred stays 0
          encodeAc(enc, acStats(t), fixed, coef, kx = 5)
          // reconstruct exactly as the decoder will (dequant + IDCT)
          i = 0
          while (i < 64) { block(i) = coef(i).toDouble * quant; i += 1 }
          val rec = JpegArithEncode.idctRef(block)
          i = 0
          while (i < 64) {
            recon(ci)((my * 8 + i / 8) * bw * 8 + mx * 8 + i % 8) =
              math.round(rec(i) + shift).toInt
            i += 1
          }
          ci += 1
        }
        blk += 1
      }
      out.write(enc.flush())
      recon
    }

    val recon1 = frame(0xc9, 0, quantBase, src, differential = false)
    val diff = src.indices.map { ci =>
      Array.tabulate(src(ci).length)(i => src(ci)(i) - recon1(ci)(i))
    }.toArray
    frame(0xcd, 2, 1, diff, differential = true)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** 8×8 inverse DCT (decoder-identical double arithmetic) — used by the
    * hierarchical encoder to reconstruct a frame the way the decoder
    * will, so the residual it codes is the one the decoder adds back.
    */
  private[multimodal] def idctRef(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) 0.70710678118654752 else 1.0
            val cv = if (v == 0) 0.70710678118654752 else 1.0
            sum += cu * cv * block(v * 8 + u) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = sum / 4.0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode as ARITHMETIC PROGRESSIVE (SOF10): the annex-G scan script —
    * interleaved DC first at Al=1, DC refinement (fixed-bin bits), then
    * per component AC first (band 1-63, Al=1) and AC refinement — each
    * scan with its own coder and statistics, exactly what
    * [[JpegDecode]]'s `progressiveScanArith` mirrors. 4:4:4 / grayscale,
    * flat quant, 8- or 12-bit.
    */
  def encodeProgressive(width: Int, height: Int, channels: Int,
      px: (Int, Int, Int) => Int, quant: Int,
      precision: Int = 8): Array[Byte] = {
    require(channels == 1 || channels == 3, "1 or 3 channels")
    require(quant >= 1 && quant <= 255, "flat 8-bit quant value")
    require(precision == 8 || precision == 12, "8- or 12-bit samples")
    val half = (1 << (precision - 1)).toDouble
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    val nq = if (channels == 3) 2 else 1
    out.write(0xff); out.write(0xdb); put16(out, 2 + 65 * nq)
    for (t <- 0 until nq) { out.write(t); (0 until 64).foreach(_ => out.write(quant)) }
    out.write(0xff); out.write(0xca); put16(out, 8 + 3 * channels) // SOF10
    out.write(precision); put16(out, height); put16(out, width); out.write(channels)
    for (c <- 0 until channels) {
      out.write(c + 1); out.write(0x11); out.write(if (c == 0) 0 else 1)
    }
    val nt = nq
    out.write(0xff); out.write(0xcc); put16(out, 2 + 2 * 2 * nt) // DAC
    for (t <- 0 until nt) { out.write(t); out.write(0x10) }
    for (t <- 0 until nt) { out.write(0x10 | t); out.write(5) }

    // component planes + quantized coefficient blocks (natural order)
    val bw = (width + 7) / 8; val bh = (height + 7) / 8
    val planes = Array.ofDim[Double](channels, bw * 8 * bh * 8)
    var y = 0
    while (y < bh * 8) {
      var x = 0
      while (x < bw * 8) {
        val sy = math.min(y, height - 1); val sx = math.min(x, width - 1)
        if (channels == 1)
          planes(0)(y * bw * 8 + x) = px(sy, sx, 0) - half
        else {
          val r = px(sy, sx, 0); val g = px(sy, sx, 1); val b = px(sy, sx, 2)
          planes(0)(y * bw * 8 + x) = 0.299 * r + 0.587 * g + 0.114 * b - half
          planes(1)(y * bw * 8 + x) = -0.168736 * r - 0.331264 * g + 0.5 * b
          planes(2)(y * bw * 8 + x) = 0.5 * r - 0.418688 * g - 0.081312 * b
        }
        x += 1
      }
      y += 1
    }
    val nBlk = bw * bh
    val coefBlocks = Array.ofDim[Int](channels, nBlk, 64)
    val block = new Array[Double](64)
    var blk = 0
    while (blk < nBlk) {
      val mx = blk % bw; val my = blk / bw
      var ci = 0
      while (ci < channels) {
        var i = 0
        while (i < 64) {
          block(i) = planes(ci)((my * 8 + i / 8) * bw * 8 + mx * 8 + i % 8)
          i += 1
        }
        val f = fdct(block)
        i = 0
        while (i < 64) {
          coefBlocks(ci)(blk)(i) = math.round(f(i) / quant).toInt
          i += 1
        }
        ci += 1
      }
      blk += 1
    }

    def sosHeader(scomps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      out.write(0xff); out.write(0xda); put16(out, 6 + 2 * scomps.length)
      out.write(scomps.length)
      for (c <- scomps) {
        out.write(c + 1)
        val t = if (c == 0) 0 else 1
        out.write((t << 4) | t)
      }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }

    // scan 1: interleaved DC first, point-transformed by Al=1
    sosHeader(0 until channels, 0, 0, 0, 1)
    locally {
      val enc = new QmCoder.Enc
      val dcStats = Array.fill(nt)(new Array[Byte](64))
      val dcCtx = new Array[Int](channels)
      val lastDc = new Array[Int](channels)
      var b2 = 0
      while (b2 < nBlk) {
        var ci = 0
        while (ci < channels) {
          val t = if (ci == 0) 0 else 1
          val v = coefBlocks(ci)(b2)(0) >> 1 // arithmetic shift: F.1.? point transform
          encodeDc(enc, dcStats(t), dcCtx, ci, v - lastDc(ci))
          lastDc(ci) = v
          ci += 1
        }
        b2 += 1
      }
      out.write(enc.flush())
    }
    // scan 2: DC refinement — one fixed-bin bit per block
    sosHeader(0 until channels, 0, 0, 1, 0)
    locally {
      val enc = new QmCoder.Enc
      val fixed = Array[Byte](QmCoder.FixedState.toByte)
      var b2 = 0
      while (b2 < nBlk) {
        var ci = 0
        while (ci < channels) {
          enc.encode(fixed, 0, coefBlocks(ci)(b2)(0) & 1)
          ci += 1
        }
        b2 += 1
      }
      out.write(enc.flush())
    }
    // per component: AC first (band 1-63 at Al=1), then AC refinement
    for (ci <- 0 until channels) {
      sosHeader(Seq(ci), 1, 63, 0, 1)
      val enc = new QmCoder.Enc
      val acStats = new Array[Byte](256)
      val fixed = Array[Byte](QmCoder.FixedState.toByte)
      val tz = new Array[Int](64)
      var b2 = 0
      while (b2 < nBlk) {
        var k = 1
        while (k <= 63) { tz(zz(k)) = coefBlocks(ci)(b2)(zz(k)) / 2; k += 1 }
        encodeAc(enc, acStats, fixed, tz, kx = 5)
        b2 += 1
      }
      out.write(enc.flush())
    }
    for (ci <- 0 until channels) {
      sosHeader(Seq(ci), 1, 63, 1, 0)
      val enc = new QmCoder.Enc
      val acStats = new Array[Byte](256)
      val fixed = Array[Byte](QmCoder.FixedState.toByte)
      var b2 = 0
      while (b2 < nBlk) {
        encodeAcRefine(enc, acStats, fixed, coefBlocks(ci)(b2), 1, 63, 0)
        b2 += 1
      }
      out.write(enc.flush())
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode `px(y, x, ch)` (`channels` ∈ {1, 3}, RGB, samples in
    * [0, 2^precision)) as an SOF9 arithmetic sequential JPEG at 4:4:4
    * with a flat quant table `quant` (luma, table 0) and `quant` (chroma,
    * table 1). `precision` ∈ {8, 12} (T.81 table B.2 — the extended
    * frames carry 12-bit samples; level shift and quantization scale
    * accordingly). `restartInterval` > 0 emits DRI + RSTn markers with
    * full coder/statistics resets.
    */
  def encode(width: Int, height: Int, channels: Int,
      px: (Int, Int, Int) => Int, quant: Int,
      restartInterval: Int = 0, precision: Int = 8): Array[Byte] = {
    require(channels == 1 || channels == 3, "1 or 3 channels")
    require(quant >= 1 && quant <= 255, "flat 8-bit quant value")
    require(precision == 8 || precision == 12, "8- or 12-bit samples")
    val half = (1 << (precision - 1)).toDouble
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // DQT: table 0 (and 1 for color), flat
    val nq = if (channels == 3) 2 else 1
    out.write(0xff); out.write(0xdb); put16(out, 2 + 65 * nq)
    for (t <- 0 until nq) { out.write(t); (0 until 64).foreach(_ => out.write(quant)) }
    // SOF9: extended sequential, arithmetic coding
    out.write(0xff); out.write(0xc9); put16(out, 8 + 3 * channels)
    out.write(precision); put16(out, height); put16(out, width); out.write(channels)
    for (c <- 0 until channels) {
      out.write(c + 1) // component id
      out.write(0x11) // 1×1 sampling (4:4:4)
      out.write(if (c == 0) 0 else 1) // quant table
    }
    // DAC: explicit default conditioning for the tables in use
    val nt = if (channels == 3) 2 else 1
    out.write(0xff); out.write(0xcc); put16(out, 2 + 2 * 2 * nt)
    for (t <- 0 until nt) { out.write(t); out.write(0x10) } // DC: U=1, L=0
    for (t <- 0 until nt) { out.write(0x10 | t); out.write(5) } // AC: Kx=5
    if (restartInterval > 0) {
      out.write(0xff); out.write(0xdd); put16(out, 4); put16(out, restartInterval)
    }
    // SOS
    out.write(0xff); out.write(0xda); put16(out, 6 + 2 * channels)
    out.write(channels)
    for (c <- 0 until channels) {
      out.write(c + 1)
      val t = if (c == 0) 0 else 1
      out.write((t << 4) | t) // DC table t, AC table t
    }
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al

    // component planes (4:4:4, edge-replicated to 8-multiples)
    val bw = (width + 7) / 8; val bh = (height + 7) / 8
    val planes = Array.ofDim[Double](channels, bw * 8 * bh * 8)
    var y = 0
    while (y < bh * 8) {
      var x = 0
      while (x < bw * 8) {
        val sy = math.min(y, height - 1); val sx = math.min(x, width - 1)
        if (channels == 1)
          planes(0)(y * bw * 8 + x) = px(sy, sx, 0) - half
        else {
          val r = px(sy, sx, 0); val g = px(sy, sx, 1); val b = px(sy, sx, 2)
          planes(0)(y * bw * 8 + x) = 0.299 * r + 0.587 * g + 0.114 * b - half
          planes(1)(y * bw * 8 + x) = -0.168736 * r - 0.331264 * g + 0.5 * b
          planes(2)(y * bw * 8 + x) = 0.5 * r - 0.418688 * g - 0.081312 * b
        }
        x += 1
      }
      y += 1
    }

    // fresh coder + statistics (re-created at each restart boundary)
    var enc: QmCoder.Enc = null
    var dcStats: Array[Array[Byte]] = null
    var acStats: Array[Array[Byte]] = null
    var fixed: Array[Byte] = null
    val dcCtx = new Array[Int](channels)
    val lastDc = new Array[Int](channels)
    def reset(): Unit = {
      enc = new QmCoder.Enc
      dcStats = Array.fill(nt)(new Array[Byte](64))
      acStats = Array.fill(nt)(new Array[Byte](256))
      fixed = Array[Byte](QmCoder.FixedState.toByte)
      java.util.Arrays.fill(dcCtx, 0)
      java.util.Arrays.fill(lastDc, 0)
    }
    reset()

    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = bw * bh
    var rst = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        val seg = enc.flush()
        out.write(seg, 0, seg.length)
        out.write(0xff); out.write(0xd0 + rst)
        rst = (rst + 1) & 7
        reset()
      }
      val mx = mcu % bw; val my = mcu / bw
      var ci = 0
      while (ci < channels) {
        val t = if (ci == 0) 0 else 1
        var i = 0
        while (i < 64) {
          block(i) = planes(ci)((my * 8 + i / 8) * bw * 8 + mx * 8 + i % 8)
          i += 1
        }
        val f = fdct(block)
        i = 0
        while (i < 64) { // quantize in ZIGZAG index space like the decoder
          coef(zz(i)) = math.round(f(zz(i)) / quant).toInt
          i += 1
        }
        val dc = coef(0)
        encodeDc(enc, dcStats(t), dcCtx, ci, dc - lastDc(ci))
        lastDc(ci) = dc
        encodeAc(enc, acStats(t), fixed, coef, kx = 5)
        ci += 1
      }
      mcu += 1
    }
    val seg = enc.flush()
    out.write(seg, 0, seg.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
