package graft.ops

import java.awt.image.BufferedImage

/** Shared media-container builders for the multimodal specs — ONE
  * definition of each synthetic container so the end-to-end fixture
  * suite and the fuzz suites always test the same byte layout. */
object MediaFixtures {

  /** Hand-assembled Y4M: header + FRAME-marked raw 4:2:0 planes, each
    * frame's Y plane a constant — the known mean. */
  def y4mBytes(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    for (l <- lumas) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(Array.fill(w * h)(l.toByte))          // Y plane
      out.write(Array.fill(w * h / 2)(128.toByte))    // U + V at 4:2:0
    }
    out.toByteArray
  }

  /** In-memory WAV: 16-bit signed little-endian PCM via the same
    * pure-JDK `javax.sound.sampled` stack the decoder uses. */
  def wavBytes(samples: Array[Short], channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(8000f, 16, channels, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private[ops] def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** One ISO-BMFF box: BE u32 size (header included) + fourcc + payload. */
  private[ops] def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(u32be(8L + payload.length))
    bos.write(typ.getBytes("ISO-8859-1"))
    bos.write(payload)
    bos.toByteArray
  }

  /** Hand-assembled minimal MP4: ftyp(brand) + moov[mvhd(v0) +
    * trak[tkhd video w×h] + trak[tkhd audio 0×0]] + mdat. Durations in
    * a 1000-unit timescale, so durationUnits == milliseconds. */
  def mp4Bytes(brand: String, w: Int, h: Int, durationMs: Long): Array[Byte] = {
    require(brand.length == 4)
    val bos = new java.io.ByteArrayOutputStream()
    def fixed1616(v: Int): Array[Byte] = u32be(v.toLong << 16)
    val ftyp = mp4Box("ftyp",
      brand.getBytes("ISO-8859-1") ++ u32be(0) ++ "isom".getBytes("ISO-8859-1"))
    val mvhd = mp4Box("mvhd",
      Array.fill[Byte](4)(0) ++            // version 0 + flags
        u32be(0) ++ u32be(0) ++            // ctime, mtime
        u32be(1000) ++ u32be(durationMs) ++ // timescale, duration
        Array.fill[Byte](80)(0))           // rate..next_track_id
    def tkhd(tw: Int, th: Int) = mp4Box("tkhd",
      Array.fill[Byte](4)(0) ++            // version 0 + flags
        u32be(0) ++ u32be(0) ++ u32be(1) ++ u32be(0) ++ u32be(durationMs) ++
        Array.fill[Byte](52)(0) ++         // reserved..matrix
        fixed1616(tw) ++ fixed1616(th))
    val moov = mp4Box("moov",
      mvhd ++ mp4Box("trak", tkhd(w, h)) ++ mp4Box("trak", tkhd(0, 0)))
    val mdat = mp4Box("mdat", Array.fill[Byte](16)(0x42))
    bos.write(ftyp); bos.write(moov); bos.write(mdat)
    bos.toByteArray
  }

  /** Shortest EBML size vint for v (marker bit in the first byte). */
  private[ops] def ebmlSize(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
    val out = new Array[Byte](n)
    var x = v | (1L << (7 * n))
    (n - 1 to 0 by -1).foreach { i => out(i) = (x & 0xff).toByte; x >>= 8 }
    out
  }

  /** One EBML element: raw id bytes + size vint + payload. */
  private[ops] def ebmlElem(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
    id ++ ebmlSize(payload.length.toLong) ++ payload

  private[ops] def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)

  /** Hand-assembled minimal Matroska/WebM: EBML header with DocType +
    * Segment[Info[TimecodeScale 1e6 ns, Duration float] Tracks[video
    * TrackEntry with PixelWidth×PixelHeight + audio TrackEntry]]. With
    * the 1 ms timecode scale, Duration units == milliseconds. */
  def mkvBytes(docType: String, w: Int, h: Int, durationMs: Long): Array[Byte] =
    mkvBytesDurBits(docType, w, h,
      java.lang.Double.doubleToLongBits(durationMs.toDouble))

  /** [[mkvBytes]] with the Duration float's RAW BITS caller-supplied —
    * the malformed-field port (NaN, infinities, implausibly-huge). */
  def mkvBytesDurBits(docType: String, w: Int, h: Int, durBits: Long): Array[Byte] = {
    val id = Map(
      "EBML" -> Array(0x1a, 0x45, 0xdf, 0xa3), "DocType" -> Array(0x42, 0x82),
      "Segment" -> Array(0x18, 0x53, 0x80, 0x67),
      "Info" -> Array(0x15, 0x49, 0xa9, 0x66),
      "TimecodeScale" -> Array(0x2a, 0xd7, 0xb1), "Duration" -> Array(0x44, 0x89),
      "Tracks" -> Array(0x16, 0x54, 0xae, 0x6b), "TrackEntry" -> Array(0xae),
      "TrackType" -> Array(0x83), "Video" -> Array(0xe0),
      "PixelWidth" -> Array(0xb0), "PixelHeight" -> Array(0xba)
    ).map { case (k, v) => k -> v.map(_.toByte) }
    val header = ebmlElem(id("EBML"),
      ebmlElem(id("DocType"), docType.getBytes("ISO-8859-1")))
    val info = ebmlElem(id("Info"),
      ebmlElem(id("TimecodeScale"), beBytes(1000000L, 3)) ++
        ebmlElem(id("Duration"), beBytes(durBits, 8)))
    val video = ebmlElem(id("Video"),
      ebmlElem(id("PixelWidth"), beBytes(w.toLong, 2)) ++
        ebmlElem(id("PixelHeight"), beBytes(h.toLong, 2)))
    val tracks = ebmlElem(id("Tracks"),
      ebmlElem(id("TrackEntry"),
        ebmlElem(id("TrackType"), beBytes(1, 1)) ++ video) ++
        ebmlElem(id("TrackEntry"), ebmlElem(id("TrackType"), beBytes(2, 1))))
    header ++ ebmlElem(id("Segment"), info ++ tracks)
  }

  private def u32le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** One RIFF chunk: fourcc + LE u32 size + data, padded to even. */
  private def riffChunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(fourcc.getBytes("US-ASCII"))
    bos.write(u32le(data.length))
    bos.write(data)
    if (data.length % 2 == 1) bos.write(0)
    bos.toByteArray
  }

  /** A uniform-gray JPEG frame via the imageio writer — the payload a
    * real MJPEG encoder would drop into a '00dc' chunk. */
  def jpegBytes(w: Int, h: Int, luma: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (luma << 16) | (luma << 8) | luma)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Hand-assembled AVI/MJPEG: RIFF('AVI ') wrapping a minimal hdrl
    * LIST (zeroed avih — the demuxer ignores it) and a movi LIST of
    * '00dc' JPEG frame chunks; LE sizes, even padding — exactly the
    * layout [[MultimodalOps.aviFrameMeans]] walks. */
  def aviMjpegBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      riffChunk("LIST", listType.getBytes("US-ASCII") ++ payload)
    val hdrl = list("hdrl", riffChunk("avih", new Array[Byte](56)))
    val movi = list("movi",
      frames.toArray.flatMap(f => riffChunk("00dc", f)))
    riffChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** Animated GIF via the imageio sequence writer; each frame a uniform
    * gray — uniform colors survive GIF palette quantization exactly. */
  def gifBytes(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    for (l <- lumas) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    wr.endWriteSequence(); wr.dispose(); ios.close()
    bos.toByteArray
  }
}
