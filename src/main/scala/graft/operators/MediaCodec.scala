package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Real (pure-JVM, no native deps) encoders/decoders for two self-describing
  * media formats — 24-bit uncompressed BMP and PCM16 WAV. This replaces the
  * round-1 `decodeStub`: the binary column now holds REAL format bytes and
  * the partition transform runs a REAL parse (magic sniff → header decode →
  * payload scan), so the decode stage of the multimodal pipeline is no
  * longer a stand-in. Swapping in JPEG/FLAC later only changes this object.
  */
object MediaCodec {

  /** Decoded feature tuple: (width, height, channels, feat_mean).
    * For images: pixel dims, samples/pixel, mean gray value over the REAL
    * pixel array (row padding excluded). For audio: (frames, 1, channels,
    * mean |amplitude| normalized to [0,1]). */
  type Features = (Int, Int, Int, Double)

  /** Sniff the container by magic bytes, like any real decoder front-end. */
  def decode(payload: Array[Byte]): Features =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      decodeBmp(payload)
    else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F')
      decodeWav(payload)
    else
      throw new IllegalArgumentException(
        s"unknown media container (first bytes: ${payload.take(4).toSeq})")

  // ---- BMP (BITMAPINFOHEADER, 24bpp, BI_RGB) ----

  /** Encode a grayscale image as a fully valid 24-bit BMP: 14-byte file
    * header, 40-byte BITMAPINFOHEADER, bottom-up BGR pixel array with rows
    * padded to 4 bytes. Any standard viewer opens the output. */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0) // reserved
    buf.putInt(54) // pixel-array offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height) // positive = bottom-up row order
    buf.putShort(1) // color planes
    buf.putShort(24) // bits per pixel
    buf.putInt(0) // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 DPI in px/m
    buf.putInt(0).putInt(0) // palette size / important colors
    var y = 0
    while (y < height) { // bottom-up: row y of the buffer is image row (h-1-y)
      var x = 0
      while (x < width) {
        val v = (pixel(x, height - 1 - y) & 0xff).toByte
        buf.put(v).put(v).put(v) // gray: B = G = R
        x += 1
      }
      var pad = width * 3
      while (pad < rowSize) { buf.put(0.toByte); pad += 1 }
      y += 1
    }
    buf.array()
  }

  /** Parse a 24bpp BI_RGB BMP: header fields at their specified offsets,
    * then a real scan of the pixel array (honoring row padding and the
    * header-declared data offset) for the mean gray value. */
  def decodeBmp(payload: Array[Byte]): Features = {
    // header-length guard BEFORE any field read: a payload truncated inside
    // the 54-byte file+DIB header would otherwise escape the geometry
    // require below via ByteBuffer's own IndexOutOfBounds (found by the
    // truncation-totality property test)
    require(payload.length >= 54,
      s"corrupt BMP: ${payload.length} bytes is shorter than the 54-byte header")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B' && buf.get(1) == 'M', "not a BMP")
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val height = math.abs(buf.getInt(22)) // negative height = top-down
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0,
      s"unsupported BMP variant (bpp=$bpp compression=$compression)")
    // LONG arithmetic: width near Int.MaxValue/3 overflows `width * 3`
    // to a small positive rowSize that would slip past the bound below
    // and OOB in the pixel scan anyway
    val rowSizeL = (width.toLong * 3 + 3) / 4 * 4
    // bounds-check the header-declared geometry against the actual payload
    // BEFORE the pixel scan: a truncated/corrupt record must fail with a
    // diagnosable message (like the WAV chunk-size guard), not an
    // ArrayIndexOutOfBoundsException mid-scan
    require(width >= 0 && height >= 0 && dataOffset >= 0 &&
      dataOffset.toLong + rowSizeL * height <= payload.length,
      s"corrupt BMP: declared ${width}x$height@$dataOffset needs " +
        s"${dataOffset.toLong + rowSizeL * height} bytes, " +
        s"payload has ${payload.length}")
    val rowSize = rowSizeL.toInt // bounded by payload.length above
    var sum = 0L
    var y = 0
    while (y < height) {
      var x = 0
      val rowStart = dataOffset + y * rowSize
      while (x < width) {
        // gray encoding: any of the B/G/R samples carries the value
        sum += java.lang.Byte.toUnsignedInt(payload(rowStart + x * 3))
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    (width, height, 3, if (n == 0) 0.0 else sum.toDouble / n / 255.0)
  }

  /** Parse a 24bpp BI_RGB BMP into its gray pixel matrix, row-major
    * TOP-DOWN (image coordinates — buffer rows are stored bottom-up and
    * re-flipped here). Same header validation as [[decodeBmp]]. */
  def decodeBmpPixels(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val (width, height, _, _) = decodeBmp(payload) // full header validation
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val rowSize = (width * 3 + 3) / 4 * 4
    val px = new Array[Int](width * height)
    var iy = 0
    while (iy < height) { // image row iy lives in buffer row (height-1-iy)
      val rowStart = dataOffset + (height - 1 - iy) * rowSize
      var x = 0
      while (x < width) {
        px(iy * width + x) = java.lang.Byte.toUnsignedInt(payload(rowStart + x * 3))
        x += 1
      }
      iy += 1
    }
    (width, height, px)
  }

  /** Nearest-neighbor resize of a top-down row-major gray matrix: output
    * pixel (X,Y) takes source pixel (X*w/W, Y*h/H) — plain floor mapping,
    * integer-exact (the property the DuckDB oracle replays). */
  def resizeNearest(w: Int, h: Int, px: Array[Int], outW: Int,
      outH: Int): Array[Int] = {
    require(w > 0 && h > 0 && outW > 0 && outH > 0)
    val out = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        out(y * outW + x) = px(sy * w + x * w / outW)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- GVID (minimal real video container: indexed BMP frames) ----

  /** Encode a frame sequence as a GVID container: "GVID" magic, LE int32
    * frame count, then each frame as LE int32 length + a fully valid BMP.
    * Deliberately minimal but REAL — a parser must walk the index, honor
    * per-frame lengths, and decode each embedded image; production swaps
    * the BMP payloads for keyframe JPEGs without touching the walk. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + frames.map(4 + _.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GVID".getBytes("US-ASCII"))
    buf.putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Parse a GVID container into its frame payloads, with the same
    * corruption totality as the other decoders: declared lengths are
    * bounds-checked BEFORE any slice, truncation fails with a diagnosable
    * message, never an out-of-bounds error. */
  def decodeVideo(payload: Array[Byte]): Seq[Array[Byte]] = {
    require(payload.length >= 8 &&
      new String(payload, 0, 4, "US-ASCII") == "GVID", "not a GVID")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(4)
    require(n >= 0, s"corrupt GVID: negative frame count $n")
    var pos = 8
    (0 until n).map { i =>
      require(pos + 4 <= payload.length,
        s"corrupt GVID: frame $i index at $pos past end ${payload.length}")
      val len = buf.getInt(pos)
      require(len >= 0 && pos + 4L + len <= payload.length,
        s"corrupt GVID: frame $i declares $len bytes at $pos, " +
          s"payload ends at ${payload.length}")
      val out = java.util.Arrays.copyOfRange(payload, pos + 4, pos + 4 + len)
      pos += 4 + len
      out
    }
  }

  // ---- WAV (RIFF container, PCM signed 16-bit little-endian) ----

  /** Encode PCM16 samples as a fully valid WAV: RIFF header + `fmt ` chunk +
    * `data` chunk. */
  def encodeWav(samples: Array[Short], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0)
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // PCM fmt chunk size
    buf.putShort(1) // audio format: PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a PCM16 WAV (same chunk walk as [[decodeWav]]) and return the
    * raw interleaved samples — the input to frame-level processing. */
  def decodeWavSamples(payload: Array[Byte]): Array[Short] = {
    decodeWav(payload) // full chunk/corruption validation
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var out = Array.emptyShortArray
    while (pos + 8 <= payload.length) {
      val id = new String(payload, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      if (id == "data") {
        val n = size / 2
        out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
      }
      pos += 8 + size + (size & 1)
    }
    out
  }

  /** Parse a PCM16 WAV with a REAL chunk walk (fmt/data are not assumed at
    * fixed offsets — other chunks like LIST may precede them), then scan
    * the sample data for mean |amplitude|. Returns
    * (frames, 1, channels, meanAbsAmplitude∈[0,1]). */
  def decodeWav(payload: Array[Byte]): Features = {
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(payload, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
    var pos = 12
    var channels = -1
    var bits = -1
    var frames = 0
    var meanAbs = 0.0
    while (pos + 8 <= payload.length) {
      val id = new String(payload, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      // a corrupt negative size would advance pos by <= 0 (8 + (-8) = 0):
      // an infinite loop that hangs the executor task — fail the record
      require(size >= 0, s"corrupt RIFF chunk size $size at offset $pos")
      // and the declared body must actually be present: a file truncated
      // mid-chunk would otherwise OOB inside the field reads below
      require(pos + 8L + size <= payload.length,
        s"corrupt WAV: chunk '$id' at $pos declares $size bytes, " +
          s"payload ends at ${payload.length}")
      id match {
        case "fmt " =>
          // the reads below need 16 bytes of chunk body; a corrupt fmt
          // chunk declaring fewer would pass the size-vs-payload guard
          // yet OOB on getShort(pos + 22)
          require(size >= 16, s"corrupt WAV: fmt chunk declares $size bytes")
          require(buf.getShort(pos + 8) == 1, "not PCM")
          channels = buf.getShort(pos + 10).toInt
          bits = buf.getShort(pos + 22).toInt
          require(bits == 16, s"unsupported bit depth $bits")
        case "data" =>
          require(channels > 0, "data chunk before fmt chunk")
          val nSamples = size / 2
          frames = nSamples / channels
          var i = 0
          var sum = 0L
          while (i < nSamples) {
            sum += math.abs(buf.getShort(pos + 8 + i * 2).toInt)
            i += 1
          }
          meanAbs = if (nSamples == 0) 0.0 else sum.toDouble / nSamples / 32768.0
        case _ => // skip unknown chunk (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    require(frames > 0 || channels > 0, "no fmt/data chunk found")
    (frames, 1, channels, meanAbs)
  }
}
