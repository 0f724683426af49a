package graft.multimodal

/** Real image-container header parsing — the decode step of the multimodal
  * path that the container's lack of codec libraries kept stubbed. These are
  * public byte formats parsed from first principles:
  *
  *  - PNG (RFC 2083): 8-byte signature, then the IHDR chunk — width/height
  *    as big-endian uint32 at offsets 16/20, bit depth at 24.
  *  - BMP (BITMAPFILEHEADER + BITMAPINFOHEADER): "BM" magic; width/height as
  *    little-endian int32 at 18/22, bit count as little-endian uint16 at 28.
  *  - GIF (87a/89a): "GIF8" magic; logical-screen width/height as
  *    little-endian uint16 at 6/8; color resolution from the packed byte.
  *  - JPEG (JFIF/EXIF): segment scan from SOI to the first SOF0/1/2 frame
  *    header — height/width big-endian uint16 at +5/+7, sample precision
  *    at +4.
  *
  * Full pixel decode still needs a codec; header geometry is what the
  * catalog/filter stages of a 100 TB multimodal pipeline actually consume
  * (drop tiny images, bucket by aspect ratio) and it needs only these bytes.
  */
object ImageHeaders {

  /** (format, width, height, bitDepth); None when no known magic matches. */
  def decode(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b == null) return None
    if (isPng(b)) decodePng(b)
    else if (isBmp(b)) decodeBmp(b)
    else if (isGif(b)) decodeGif(b)
    else if (isJpeg(b)) decodeJpeg(b)
    else None
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 33 && b.take(8).sameElements(pngSig)

  private def decodePng(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    // first chunk must be IHDR (length 13): offsets 8-11 length, 12-15 type
    if (be32(b, 8) != 13 || be32(b, 12) != 0x49484452) return None
    Some(("png", be32(b, 16), be32(b, 20), u8(b, 24)))
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  private def decodeBmp(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (le32(b, 14) < 40) return None // need BITMAPINFOHEADER or later
    // height may be negative (top-down DIB) — geometry is its magnitude
    Some(("bmp", le32(b, 18), math.abs(le32(b, 22)), le16(b, 28)))
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 13 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == '8'.toByte

  private def decodeGif(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    Some(("gif", le16(b, 6), le16(b, 8), ((u8(b, 10) >> 4) & 0x7) + 1))

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  private def decodeJpeg(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b, i) != 0xff) return None // lost segment sync
      val marker = u8(b, i + 1)
      if (marker == 0xff) i += 1 // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
          return Some(("jpeg", be16(b, i + 7), be16(b, i + 5), u8(b, i + 4)))
        i += 2 + len
      }
    }
    None
  }
}
