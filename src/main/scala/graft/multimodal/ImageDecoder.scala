package graft.multimodal

/** The decode seam of the multimodal family: a real codec binding
  * implements this ONE method and every downstream operator
  * (perceptual hash, feature extraction, frame stats) is unchanged —
  * the batched `mapPartitions` shape around it amortizes decoder init
  * per partition, exactly as a JNI/FFI codec needs.
  *
  * Returns (width, height, row-major integer lumas 0..255), or None
  * when the payload is not this decoder's format (callers drop or
  * route such rows — a decode failure must never poison a batch). */
trait ImageDecoder extends Serializable {
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])]
}

/** A GENUINE format decoder (r16 — the seam's first real
  * implementation, replacing "stub only"): binary NetPBM, i.e. P6
  * (PPM, RGB) and P5 (PGM, grayscale), parsed directly from bytes —
  * no image libraries involved, so it runs in this container and in
  * any executor. NetPBM is the standard uncompressed interchange
  * format (every codec toolchain emits it), which makes it the right
  * first rung: the parse is real (magic, whitespace/comment-tolerant
  * header, maxval validation, payload bounds), while formats with
  * entropy coding (PNG/JPEG) arrive as further ImageDecoder
  * implementations behind the same trait.
  *
  * Luma for P6 is the integer mean (r + g + b) / 3 (truncating) —
  * deterministic and engine-portable, so a perceptual hash over
  * decoded pixels stays oracle-replayable. */
object PpmDecoder extends ImageDecoder {

  override def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 2 || bytes(0) != 'P') return None
    val channels = bytes(1) match {
      case '6' => 3 // PPM: binary RGB
      case '5' => 1 // PGM: binary grayscale
      case _   => return None
    }
    var pos = 2
    // header tokens are separated by whitespace; '#' starts a comment
    // running to end of line (the NetPBM spec's only complication)
    def skipSpaceAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val b = bytes(pos)
        if (b == ' ' || b == '\t' || b == '\n' || b == '\r') pos += 1
        else if (b == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipSpaceAndComments()
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) return None
        any = true
        pos += 1
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      // only the 1-byte-per-sample range (the format allows 2-byte
      // samples above 255 — not emitted by our sources; reject rather
      // than mis-stride)
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly ONE whitespace byte separates header from payload
      if pos < bytes.length && (bytes(pos) == '\n' || bytes(pos) == ' ' ||
        bytes(pos) == '\t' || bytes(pos) == '\r')
      _ = { pos += 1 }
      if w.toLong * h * channels <= (bytes.length - pos).toLong
    } yield {
      val lum = new Array[Int](w * h)
      var p = 0
      var i = pos
      if (channels == 3) {
        while (p < lum.length) {
          lum(p) = ((bytes(i) & 0xff) + (bytes(i + 1) & 0xff) +
            (bytes(i + 2) & 0xff)) / 3
          i += 3
          p += 1
        }
      } else {
        while (p < lum.length) { lum(p) = bytes(i) & 0xff; i += 1; p += 1 }
      }
      (w, h, lum)
    }
  }
}
