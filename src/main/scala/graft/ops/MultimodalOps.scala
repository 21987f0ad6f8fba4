package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.zip.ZipExtract

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata, processed in batch-shaped
  * per-partition passes — the Spark-side pattern for decode / feature
  * -extract / frame-sample stages.
  *
  * Codec boundary: IMAGES are decoded for real with the JDK's
  * `javax.imageio` (PNG/JPEG/BMP/GIF) — luminance histogram and bilinear
  * resize run over actual pixels. Payloads imageio does not recognize fall
  * back to a deterministic byte-level stand-in, which is also the path the
  * m_* oracle queries exercise: the testdata corpus carries ASCII text as
  * the payload column, and DuckDB cannot decode images — so the oracle
  * checks the stand-in arithmetic while the scalatest suite checks the
  * real decode on in-fixture PNGs. AUDIO decodes real PCM for sniffed
  * WAV via `javax.sound.sampled`; VIDEO decodes real frames for Y4M
  * (pure-JVM demux), multi-frame GIF (imageio sequence reader), and
  * AVI/MJPEG (pure-JVM RIFF walk + per-frame imageio JPEG decode);
  * ISO-BMFF (MP4/MOV) and Matroska (MKV/WebM) get real METADATA demux
  * — pure-JVM box/EBML walks for brand-or-doctype, tracks, duration,
  * and dimensions (`m_mp4_meta`/`m_mkv_meta`, and `m_dims` routes
  * their presentation dims) — so every container a video corpus ships
  * in now parses its curation metadata for real; only FRAME bytes for
  * MP4/MKV/WebM stay on the deterministic stand-in (no
  * H.264/H.265/VP8/VP9 decoder ships with the JDK), and only that
  * stand-in would change with a real codec dependency, not the plan
  * shapes.
  *
  * Scale: mapPartitions keeps per-task state (a decoder context) allocated
  * once per partition, not per row — the same batch shape as an Arrow-batch
  * UDF; payload bytes never cross a shuffle (metadata-only outputs).
  */
object Multimodal {
  import java.awt.image.BufferedImage

  // per-payload temp-file caching (ImageIO's default) would be one file
  // create/delete PER ROW in the decode path — decode from memory instead
  javax.imageio.ImageIO.setUseCache(false)

  /** Magic-byte whitelist: only payloads carrying a real image signature
    * reach ImageIO at all. Two jobs: (1) perf — `ImageIO.read` runs reader
    * discovery (every registered reader probes the stream) per payload,
    * which benched at +0.5s across m_resize when the corpus is 100%
    * non-image ASCII; (2) determinism — the real-decode path is gated on
    * an explicit signature, not on decoder success, so a random payload a
    * lenient decoder happens to accept can never silently diverge from the
    * byte-stand-in oracle. PNG/JPEG/GIF signatures are unambiguous; BMP's
    * 2-byte "BM" also requires the spec-mandated zero reserved field
    * (bytes 6-9), which no ASCII text satisfies. */
  def looksLikeImage(body: Array[Byte]): Boolean = {
    @inline def at(i: Int): Int = body(i) & 0xff
    (body.length >= 8 && at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' &&
      at(3) == 'G' && at(4) == 0x0d && at(5) == 0x0a && at(6) == 0x1a &&
      at(7) == 0x0a) ||                                            // PNG
    (body.length >= 3 && at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) || // JPEG
    (body.length >= 6 && at(0) == 'G' && at(1) == 'I' && at(2) == 'F' &&
      at(3) == '8' && (at(4) == '7' || at(4) == '9') && at(5) == 'a') || // GIF
    (body.length >= 26 && at(0) == 'B' && at(1) == 'M' &&
      at(6) == 0 && at(7) == 0 && at(8) == 0 && at(9) == 0) ||     // BMP
    (body.length >= 4 && at(0) == 'I' && at(1) == 'I' &&
      at(2) == 0x2a && at(3) == 0) ||                              // TIFF LE
    (body.length >= 4 && at(0) == 'M' && at(1) == 'M' &&
      at(2) == 0 && at(3) == 0x2a)                                 // TIFF BE
    // WBMP has no magic bytes — undetectable by signature, stays on the
    // byte stand-in path by design
  }

  /** Real image decode (JDK imageio), gated by [[looksLikeImage]]. None =
    * not an image — callers fall back to the byte-level stand-in. NonFatal
    * (not just IOException): a truncated real image passes the sniff but
    * throws runtime exceptions on garbage header fields inside the decoder
    * — that must mean "not an image", not a failed Spark task. */
  def decodeImage(body: Array[Byte]): Option[BufferedImage] =
    if (!looksLikeImage(body)) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(body)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** 16-bin luminance histogram over decoded pixels: integer BT.601 luma
    * `(299R + 587G + 114B) / 1000` ∈ [0, 255], binned by `>> 4` —
    * all-integer, so bit-deterministic across platforms. */
  def luminanceHistogram(img: BufferedImage): Array[Long] = {
    val hist = new Array[Long](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        hist(lum >> 4) += 1
        x += 1
      }
      y += 1
    }
    hist
  }

  /** Image features: real pixel luminance histogram when the payload
    * decodes; byte-value histogram stand-in otherwise (the oracle path —
    * the ASCII test corpus is not PNG). Both are 16 bins. */
  def decodeImageFeatures(body: Array[Byte]): Array[Long] =
    decodeImage(body) match {
      case Some(img) => luminanceHistogram(img)
      case None =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < body.length) { hist((body(i) & 0xff) >> 4) += 1; i += 1 }
        hist
    }

  /** Deterministic bilinear resample (own loop — Graphics2D interpolation
    * quality is implementation-defined; this is fixed integer/double
    * arithmetic): output pixel centers map to source coordinates, 4-tap
    * lerp per channel, half-pixel alignment. */
  def bilinearResize(img: BufferedImage, w2: Int, h2: Int): BufferedImage = {
    require(w2 > 0 && h2 > 0)
    val out = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
    val (w, h) = (img.getWidth, img.getHeight)
    def clamp(v: Double, hi: Int) = math.min(math.max(v, 0.0), hi.toDouble)
    var y = 0
    while (y < h2) {
      val sy = clamp((y + 0.5) * h / h2 - 0.5, h - 1)
      val y0 = sy.toInt; val y1 = math.min(y0 + 1, h - 1); val fy = sy - y0
      var x = 0
      while (x < w2) {
        val sx = clamp((x + 0.5) * w / w2 - 0.5, w - 1)
        val x0 = sx.toInt; val x1 = math.min(x0 + 1, w - 1); val fx = sx - x0
        // fetch the 4 taps once; getRGB pays a color-model conversion,
        // so re-fetching per channel would triple the hot-loop cost
        val p00 = img.getRGB(x0, y0); val p10 = img.getRGB(x1, y0)
        val p01 = img.getRGB(x0, y1); val p11 = img.getRGB(x1, y1)
        def ch(shift: Int): Int = {
          def c(p: Int) = (p >> shift) & 0xff
          val top = c(p00) * (1 - fx) + c(p10) * fx
          val bot = c(p01) * (1 - fx) + c(p11) * fx
          math.round(top * (1 - fy) + bot * fy).toInt
        }
        out.setRGB(x, y, (ch(16) << 16) | (ch(8) << 8) | ch(0))
        x += 1
      }
      y += 1
    }
    out
  }

  /** PNG-encode (lossless, so a decode→assert round-trip is exact). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Magic-byte sniff for RIFF/WAVE: bytes 0-3 "RIFF", 8-11 "WAVE"
    * (bytes 4-7 are the chunk size — any value). Same role as
    * [[looksLikeImage]]: only signed payloads reach the codec, so the
    * real-decode path is gated on an explicit signature, never on decoder
    * leniency. */
  def looksLikeWav(body: Array[Byte]): Boolean =
    body.length >= 12 &&
      body(0) == 'R' && body(1) == 'I' && body(2) == 'F' && body(3) == 'F' &&
      body(8) == 'W' && body(9) == 'A' && body(10) == 'V' && body(11) == 'E'

  /** Real WAV/PCM decode (pure-JDK `javax.sound.sampled`), gated by
    * [[looksLikeWav]] — the audio mirror of [[decodeImage]]. Returns the
    * first channel's sample values: signed 16-bit PCM as-is, unsigned
    * 8-bit recentered to signed (v - 128), little/big endian per the
    * header. None = not decodable WAV — callers fall back to the byte
    * stand-in. Channels beyond the first are skipped (feature extraction
    * wants one stream); compressed encodings (A-law/μ-law/float) fall
    * back rather than guess. */
  def decodeWavSamples(body: Array[Byte]): Option[Array[Long]] =
    if (!looksLikeWav(body)) None
    else
      try {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(body))
        try {
          val fmt = ais.getFormat
          val bits = fmt.getSampleSizeInBits
          val ok = (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && bits == 16) ||
            (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
          if (!ok) None
          else {
            val raw = ais.readAllBytes()
            val frameSize = fmt.getFrameSize // all channels, one sample point
            val n = raw.length / frameSize
            val out = new Array[Long](n)
            var i = 0
            while (i < n) {
              val off = i * frameSize // first channel at frame start
              out(i) =
                if (bits == 8) (raw(off) & 0xff) - 128L
                else if (fmt.isBigEndian)
                  ((raw(off) << 8) | (raw(off + 1) & 0xff)).toShort.toLong
                else ((raw(off + 1) << 8) | (raw(off) & 0xff)).toShort.toLong
              i += 1
            }
            Some(out)
          }
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Audio samples for feature framing: real PCM when the payload is a
    * decodable WAV, byte values (ascii) otherwise — the oracle path, since
    * the testdata corpus carries ASCII text and DuckDB cannot decode WAV. */
  def audioSamples(body: Array[Byte]): Array[Long] =
    decodeWavSamples(body).getOrElse {
      val out = new Array[Long](body.length)
      var i = 0
      while (i < body.length) { out(i) = body(i) & 0xffL; i += 1 }
      out
    }

  /** Per-window energies for the landmark core: window w holds the sum
    * of squared sample values over samples [64w, 64w+64) — the exact
    * grain [[MultimodalOps.audioWindowRowsFrom]]'s relational
    * `CAST(i DIV 64 AS INT)` + sum(v*v) pass produces, so the streaming
    * per-clip path and the batch posexplode path frame identically by
    * construction. */
  def windowEnergies(samples: Array[Long]): Array[Long] = {
    val out = new Array[Long]((samples.length + 63) / 64)
    var i = 0
    while (i < samples.length) {
      out(i / 64) += samples(i) * samples(i); i += 1
    }
    out
  }

  /** The landmark-fingerprint core, doc-local and pure — the per-clip
    * dual of [[MultimodalOps.audioMarksFrom]]'s relational pass, for the
    * streaming arm (Structured Streaming cannot run lag/lead windows; a
    * clip arrives whole, so its landmarks need no cross-row state and no
    * window functions). Semantics are pinned EQUAL to the relational
    * marks by AudioStreamSpec on adversarial fixtures and a real corpus
    * slice: peaks are strict vs the previous window and >= vs the next
    * (plateau tiebreak to the first window; clip edges count as -1
    * neighbors), band = length(bin(energy)) - 1 (integer log2; band 0
    * for energy 0), consecutive peaks pair as
    * fp = band1*262144 + band2*4096 + min(dt, 4095), fps distinct per
    * clip. */
  def landmarkFps(energies: Array[Long]): Array[Long] = {
    def band(e: Long): Long =
      if (e == 0L) 0L else 63L - java.lang.Long.numberOfLeadingZeros(e)
    val peaks = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < energies.length) {
      val pe = if (i == 0) -1L else energies(i - 1)
      val ne = if (i == energies.length - 1) -1L else energies(i + 1)
      if (energies(i) > pe && energies(i) >= ne) peaks += i
      i += 1
    }
    val fps = scala.collection.mutable.LinkedHashSet.empty[Long]
    var j = 0
    while (j + 1 < peaks.length) {
      val dt = math.min((peaks(j + 1) - peaks(j)).toLong, 4095L)
      fps += band(energies(peaks(j))) * 262144L +
        band(energies(peaks(j + 1))) * 4096L + dt
      j += 1
    }
    fps.toArray
  }

  /** Per-channel RGB accumulation: (n_r, n_g, n_b, sum_r, sum_g, sum_b),
    * all exact integers. Real path: decoded pixels — the three counts are
    * each width×height. Stand-in (the oracle path): byte i feeds channel
    * i % 3 with its unsigned value, so the channel counts differ by at
    * most 1 when the length isn't a multiple of 3. */
  def colorStats(body: Array[Byte]): (Long, Long, Long, Long, Long, Long) =
    decodeImage(body) match {
      case Some(img) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toLong * img.getHeight
        (n, n, n, sr, sg, sb)
      case None =>
        val ns = new Array[Long](3); val ss = new Array[Long](3)
        var i = 0
        while (i < body.length) {
          val ch = i % 3; ns(ch) += 1; ss(ch) += body(i) & 0xffL; i += 1
        }
        (ns(0), ns(1), ns(2), ss(0), ss(1), ss(2))
    }

  /** Zero-centered sample stream for sign-based features (zero-crossing
    * rate): real PCM when the payload is a decodable WAV (samples are
    * already signed), byte − 96 otherwise. The stand-in centers on 96,
    * not the 8-bit-PCM 128: printable ASCII is 32–126, so 128-centering
    * would leave every stand-in sample negative and the oracle-checked
    * crossing count degenerately zero — 96 splits the printable range
    * (lowercase letters sit above it) so the ASCII path genuinely
    * exercises sign changes. */
  def centeredSamples(body: Array[Byte]): Array[Long] =
    decodeWavSamples(body).getOrElse {
      val out = new Array[Long](body.length)
      var i = 0
      while (i < body.length) { out(i) = (body(i) & 0xffL) - 96L; i += 1 }
      out
    }

  /** True when the payload opens with the Y4M stream magic
    * (`YUV4MPEG2 ` — the raw-video interchange format every yuv toolchain
    * writes). Signature-gated like [[looksLikeImage]], for the same
    * determinism reason. */
  def looksLikeY4m(body: Array[Byte]): Boolean =
    body.length >= 10 && "YUV4MPEG2 ".zipWithIndex.forall {
      case (ch, i) => body(i) == ch.toByte
    }

  private def looksLikeGif(body: Array[Byte]): Boolean =
    body.length >= 6 && body(0) == 'G' && body(1) == 'I' && body(2) == 'F' &&
      body(3) == '8' && (body(4) == '7' || body(4) == '9') && body(5) == 'a'

  /** Real Y4M demux: header `YUV4MPEG2 W<w> H<h> ... [C<cs>]\n`, then per
    * frame a `FRAME[ params]\n` marker followed by raw planar YUV. Frame
    * byte size follows the colorspace (4:2:0 → 3·Y/2, 4:2:2 → 2·Y,
    * 4:4:4 → 3·Y, mono → Y; default C420jpeg per spec). Emits one
    * (frame_idx, mean-luma) row per frame — mean over the Y plane in
    * truncating integer division, so the statistic is exact and
    * engine-replayable. None on any malformed header/frame (sniffed-but-
    * broken payloads fall back to the byte stand-in, the
    * [[decodeImage]] convention). */
  def y4mFrameMeans(body: Array[Byte]): Option[Seq[(Int, Int)]] = {
    if (!looksLikeY4m(body)) return None
    val nlAt = body.indexOf('\n'.toByte)
    if (nlAt < 0) return None
    val params = new String(body, 0, nlAt, "US-ASCII").split(' ').drop(1)
    def num(tag: Char): Option[Int] =
      params.collectFirst { case p if p.nonEmpty && p.head == tag =>
        p.tail.toIntOption }.flatten
    val cs = params.collectFirst { case p if p.nonEmpty && p.head == 'C' =>
      p.tail }.getOrElse("420jpeg")
    (num('W'), num('H')) match {
      case (Some(w), Some(h)) if w > 0 && h > 0 =>
        val ySize = w.toLong * h
        val frameSize = cs match {
          case c if c.startsWith("420") => ySize * 3 / 2
          case c if c.startsWith("422") => ySize * 2
          case c if c.startsWith("444") => ySize * 3
          case "mono"                   => ySize
          case _                        => return None
        }
        if (ySize > Int.MaxValue) return None
        val frames = Seq.newBuilder[(Int, Int)]
        var pos = nlAt + 1
        var idx = 0
        while (pos < body.length) {
          // FRAME marker, optional parameters up to the newline
          if (pos + 5 > body.length ||
            !"FRAME".zipWithIndex.forall { case (c, i) => body(pos + i) == c.toByte })
            return None
          val eol = body.indexOf('\n'.toByte, pos + 5)
          if (eol < 0 || eol + frameSize > body.length) return None
          var sum = 0L
          var i = eol + 1
          val yEnd = eol + 1 + ySize.toInt
          while (i < yEnd) { sum += body(i) & 0xff; i += 1 }
          frames += ((idx, (sum / ySize).toInt))
          idx += 1
          pos = eol + 1 + frameSize.toInt
        }
        val out = frames.result()
        if (out.isEmpty) None else Some(out)
      case _ => None
    }
  }

  private def meanLuma(img: BufferedImage): Int = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sum += (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    (sum / (img.getWidth.toLong * img.getHeight)).toInt
  }

  /** Real multi-frame GIF decode via the JDK's imageio sequence reader —
    * EVERY frame, not just the first one [[decodeImage]] returns. Emits
    * (frame_idx, mean-BT.601-luma) per frame, the same per-frame
    * statistic as [[y4mFrameMeans]]. None when the payload is not a GIF
    * or the reader fails (fall back to the byte stand-in). */
  def gifFrameMeans(body: Array[Byte]): Option[Seq[(Int, Int)]] = {
    if (!looksLikeGif(body)) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(body))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        r.setInput(iis)
        try {
          val n = r.getNumImages(true)
          if (n < 1) None
          else {
            // Reject absurd DECLARED dimensions from the header before
            // read() allocates the raster: a crafted/corrupt payload
            // claiming 65535x65535 would OOM the task, and
            // OutOfMemoryError is an Error the NonFatal guard below
            // deliberately does not swallow. 16 Mpx ≈ a 64 MB raster —
            // far above any real fixture, far below task memory.
            val maxPixels = 16L * 1024 * 1024
            if ((0 until n).exists(i =>
                r.getWidth(i).toLong * r.getHeight(i) > maxPixels)) None
            else Some((0 until n).map(i => (i, meanLuma(r.read(i)))))
          }
        } finally r.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** True when the payload opens with the RIFF/AVI signature
    * (`RIFF....AVI `). Signature-gated like [[looksLikeY4m]]. */
  def looksLikeAvi(body: Array[Byte]): Boolean =
    body.length >= 12 && body(0) == 'R' && body(1) == 'I' &&
      body(2) == 'F' && body(3) == 'F' && body(8) == 'A' &&
      body(9) == 'V' && body(10) == 'I' && body(11) == ' '

  /** One MJPEG frame: JPEG-signature gate, header-declared dimension
    * ceiling BEFORE the raster allocates (the [[gifFrameMeans]] OOM
    * guard), then one imageio decode to mean BT.601 luma. */
  private def jpegFrameMean(payload: Array[Byte]): Option[Int] = {
    if (payload.length < 3 || (payload(0) & 0xff) != 0xff ||
      (payload(1) & 0xff) != 0xd8 || (payload(2) & 0xff) != 0xff) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        r.setInput(iis)
        try {
          val maxPixels = 16L * 1024 * 1024
          if (r.getWidth(0).toLong * r.getHeight(0) > maxPixels) None
          else Some(meanLuma(r.read(0)))
        } finally r.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real AVI/MJPEG demux — the RIFF chunk walk (the WAV container's
    * sibling: AVI is RIFF('AVI ') wrapping LIST chunks; reference
    * formats catalogued at SURVEY.md §1) down to the `movi` LIST, then
    * one [[jpegFrameMean]] per video frame chunk (`##dc`/`##db`,
    * `rec `-nested lists included). LE u32 sizes, even padding. Frame
    * statistic and strictness match [[y4mFrameMeans]]: one
    * (frame_idx, mean-luma) per frame in file order; None on ANY
    * malformed chunk or undecodable frame, so sniffed-but-broken
    * payloads fall back to the byte stand-in instead of half-parsing. */
  def aviFrameMeans(body: Array[Byte]): Option[Seq[(Int, Int)]] = {
    if (!looksLikeAvi(body)) return None
    def u32(at: Int): Long =
      (body(at) & 0xffL) | ((body(at + 1) & 0xffL) << 8) |
        ((body(at + 2) & 0xffL) << 16) | ((body(at + 3) & 0xffL) << 24)
    def fourcc(at: Int): String = new String(body, at, 4, "US-ASCII")
    val riffEnd = math.min(body.length.toLong, 8L + u32(4))
    val frames = Seq.newBuilder[(Int, Int)]
    var idx = 0
    def isFrameChunk(fc: String): Boolean =
      fc(0).isDigit && fc(1).isDigit && fc(2) == 'd' &&
        (fc(3) == 'c' || fc(3) == 'b')
    // strict walk: false = malformed somewhere → reject the whole file.
    // Real AVI nests at most RIFF → movi → rec (depth 2 below the top);
    // the explicit depth ceiling keeps a crafted chain of
    // self-consistent LIST headers from recursing to StackOverflowError
    // — a FATAL error no NonFatal guard would catch — in a scan task.
    val maxListDepth = 8
    def walk(from: Long, to: Long, inMovi: Boolean, depth: Int): Boolean = {
      if (depth > maxListDepth) return false
      var pos = from
      while (pos < to) {
        if (pos + 8 > to) return false
        val fc = fourcc(pos.toInt)
        val sz = u32(pos.toInt + 4)
        val dataStart = pos + 8
        val dataEnd = dataStart + sz
        if (dataEnd > to) return false
        if (fc == "LIST") {
          if (sz < 4) return false
          val lt = fourcc(dataStart.toInt)
          if (!walk(dataStart + 4, dataEnd,
            inMovi || lt == "movi" || lt == "rec ", depth + 1)) return false
        } else if (inMovi && isFrameChunk(fc)) {
          val payload = java.util.Arrays.copyOfRange(
            body, dataStart.toInt, dataEnd.toInt)
          jpegFrameMean(payload) match {
            case Some(m) => frames += ((idx, m)); idx += 1
            case None => return false
          }
        }
        pos = dataEnd + (sz % 2)
      }
      true
    }
    if (!walk(12, riffEnd, inMovi = false, depth = 0)) return None
    val out = frames.result()
    if (out.isEmpty) None else Some(out)
  }

  /** ISO-BMFF signature: a top-level `ftyp` box first, its declared
    * size sane. Covers MP4/MOV/3GP/HEIF — everything the BMFF family
    * ships as. "Sane" = the u32 at offset 0 fits the payload and holds at
    * least the 16-byte header+brand+version an ftyp must carry (ftyp is
    * never the size-1 largesize or size-0 run-to-end form: it is the
    * first, fixed-layout box). */
  def looksLikeMp4(body: Array[Byte]): Boolean =
    body.length >= 16 && body(4) == 'f' && body(5) == 't' &&
      body(6) == 'y' && body(7) == 'p' && {
        val sz0 = ((body(0) & 0xffL) << 24) | ((body(1) & 0xffL) << 16) |
          ((body(2) & 0xffL) << 8) | (body(3) & 0xffL)
        sz0 >= 16L && sz0 <= body.length
      }

  private val Mp4Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Real ISO-BMFF (MP4/MOV) METADATA demux — a pure-JVM box walk.
    * Frame DECODE remains out of reach in-policy (the JDK ships no
    * H.264/H.265/VP9 decoder, so MP4 frames stay on the byte stand-in —
    * see [[sampleFrames]]), but the container is plain length-prefixed
    * boxes, and the metadata a 100 TB curator actually filters on —
    * dimensions, duration, track count, brand — needs no codec at all:
    * `mvhd` carries timescale+duration, each `trak`'s `tkhd` carries
    * 16.16 fixed-point presentation width/height (nonzero exactly for
    * visual tracks). Returns (major_brand, n_tracks, duration_ms,
    * width, height) — width/height 0 for audio-only files, duration 0
    * when the spec's all-ones "cannot be determined" sentinel is set
    * (fragmented/live captures).
    *
    * Strictness matches the other demuxers ([[y4mFrameMeans]] /
    * [[aviFrameMeans]]): every box is bounds-checked (64-bit largesize
    * and size-0 run-to-end handled), version fields outside {0, 1}
    * reject, any malformed box rejects the WHOLE payload, container
    * recursion is depth-capped so a crafted chain of self-consistent
    * headers cannot StackOverflowError a scan task, and
    * parse-or-reject-never-throw is fuzz-proven. */
  def mp4Meta(body: Array[Byte]): Option[(String, Int, Long, Int, Int)] = {
    if (!looksLikeMp4(body)) return None
    def u32(i: Int): Long =
      ((body(i) & 0xffL) << 24) | ((body(i + 1) & 0xffL) << 16) |
        ((body(i + 2) & 0xffL) << 8) | (body(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    var brand = ""; var nTracks = 0; var durMs = -1L; var w = 0; var h = 0
    var ok = true
    val maxBoxDepth = 8
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var p = start
      while (ok && p < end) {
        if (p + 8 > end) { ok = false; return }
        val sz0 = u32(p.toInt)
        val typ = new String(body, p.toInt + 4, 4, "ISO-8859-1")
        var hdr = 8L; var sz = sz0
        if (sz0 == 1L) {
          if (p + 16 > end) { ok = false; return }
          sz = u64(p.toInt + 8); hdr = 16L
        } else if (sz0 == 0L) sz = end - p
        if (sz < hdr || p + sz > end) { ok = false; return }
        val ps = (p + hdr).toInt; val pLen = (sz - hdr).toInt
        typ match {
          case "ftyp" =>
            if (pLen >= 8) brand = new String(body, ps, 4, "ISO-8859-1")
            else ok = false
          case "mvhd" =>
            // 14496-12: an all-ones duration means "cannot be
            // determined" (fragmented/live files) — report 0 (unknown),
            // never a fake ~13-hour figure from the sentinel bits
            (body(ps) & 0xff) match {
              case 0 if pLen >= 20 =>
                val ts = u32(ps + 12); val dur = u32(ps + 16)
                if (ts > 0)
                  durMs = if (dur == 0xffffffffL) 0L else dur * 1000L / ts
                else ok = false
              case 1 if pLen >= 32 =>
                val ts = u32(ps + 20); val dur = u64(ps + 24)
                // dur is raw 64-bit file data: beyond the sentinel, a value
                // past Long.MaxValue/1000 would WRAP in the millisecond
                // multiply (a positive wrap passes the durMs >= 0 gate) —
                // reject like every other malformed field
                if (ts > 0) {
                  if (dur == -1L) durMs = 0L
                  else if (dur < 0L || dur > Long.MaxValue / 1000L) ok = false
                  else durMs = dur * 1000L / ts
                } else ok = false
              case _ => ok = false
            }
          case "tkhd" =>
            nTracks += 1
            val v = body(ps) & 0xff
            val (wOff, need) = if (v == 0) (76, 84) else (88, 96)
            if (v <= 1 && pLen >= need) {
              val tw = (u32(ps + wOff) >> 16).toInt
              val th = (u32(ps + wOff + 4) >> 16).toInt
              // first VISUAL track wins (audio tracks carry 0x0)
              if (tw > 0 && th > 0 && w == 0) { w = tw; h = th }
            } else ok = false
          case t if Mp4Containers(t) =>
            if (depth >= maxBoxDepth) ok = false
            else walk(ps.toLong, p + sz, depth + 1)
          case _ => () // leaf we don't read (mdat, free, udta, ...)
        }
        p += sz
      }
    }
    try {
      walk(0L, body.length.toLong, 0)
      // a parse without moov (no mvhd) is a fragment, not metadata
      if (ok && brand.nonEmpty && durMs >= 0)
        Some((brand, nTracks, durMs, w, h))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** EBML signature: the 4-byte EBML header element ID that opens every
    * Matroska-family file (MKV/WebM/MKA). */
  def looksLikeEbml(body: Array[Byte]): Boolean =
    body.length >= 8 && (body(0) & 0xff) == 0x1a && (body(1) & 0xff) == 0x45 &&
      (body(2) & 0xff) == 0xdf && (body(3) & 0xff) == 0xa3

  /** Real Matroska/WebM METADATA demux — a pure-JVM EBML walk, the
    * [[mp4Meta]] move applied to the other codec-less-parseable family:
    * elements are (vint id, vint size, payload), so DocType, track
    * count, duration (Info's float Duration × TimecodeScale), and the
    * video track's PixelWidth/PixelHeight come straight off the
    * structure with no VP8/VP9/AV1 decoder involved. Returns
    * (doc_type, n_tracks, duration_ms, width, height); duration 0 when
    * the optional Duration element is absent; width/height 0 for
    * audio-only files.
    *
    * Strictness: malformed vints, out-of-bounds payloads, or an
    * unknown-size element anywhere but Segment (where the spec allows
    * it for live captures — handled as run-to-end) reject the WHOLE
    * payload; container recursion is depth-capped; never throws
    * (fuzz-proven like [[mp4Meta]]). */
  def mkvMeta(body: Array[Byte]): Option[(String, Int, Long, Int, Int)] = {
    if (!looksLikeEbml(body)) return None
    // vint: leading-zero count of the first byte gives the width
    def vintLen(b0: Int): Int = {
      var mask = 0x80; var n = 1
      while (n <= 8 && (b0 & mask) == 0) { mask >>= 1; n += 1 }
      n
    }
    // element id: raw bytes, marker kept (1-4 bytes per spec)
    def readId(p: Long, end: Long): Option[(Long, Int)] = {
      if (p >= end) return None
      val n = vintLen(body(p.toInt) & 0xff)
      if (n > 4 || p + n > end) return None
      var v = 0L
      (0 until n).foreach(i => v = (v << 8) | (body(p.toInt + i) & 0xffL))
      Some((v, n))
    }
    // element size: marker stripped (1-8 bytes); all-ones = unknown
    def readSize(p: Long, end: Long): Option[(Long, Int)] = {
      if (p >= end) return None
      val b0 = body(p.toInt) & 0xff
      val n = vintLen(b0)
      if (n > 8 || p + n > end) return None
      var v = (b0 & (0xff >>> n)).toLong
      (1 until n).foreach(i => v = (v << 8) | (body(p.toInt + i) & 0xffL))
      val allOnes = (1L << (7 * n)) - 1
      Some((if (v == allOnes) -1L else v, n))
    }
    def uintAt(p: Int, len: Int): Long = {
      var v = 0L; (0 until len).foreach(i => v = (v << 8) | (body(p + i) & 0xffL)); v
    }
    var docType = ""; var nTracks = 0; var w = 0; var h = 0
    var scaleNs = 1000000L; var durUnits = -1.0
    // per-Video-element staging so width and height are committed
    // ATOMICALLY per track — never paired across two different tracks
    var inVideo = false; var vw = 0; var vh = 0
    var ok = true
    val containers = Set(0x1a45dfa3L /*EBML*/ , 0x18538067L /*Segment*/ ,
      0x1549a966L /*Info*/ , 0x1654ae6bL /*Tracks*/ , 0xaeL /*TrackEntry*/ ,
      0xe0L /*Video*/ )
    val maxDepth = 8
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var p = start
      while (ok && p < end) {
        val id = readId(p, end) match {
          case Some(x) => x; case None => ok = false; return
        }
        val sz = readSize(p + id._2, end) match {
          case Some(x) => x; case None => ok = false; return
        }
        val ps = p + id._2 + sz._2
        val pe = if (sz._1 < 0) {
          // unknown size: the spec reserves this for Segment-like
          // masters (live capture); anywhere else is malformed
          if (id._1 != 0x18538067L) { ok = false; return } else end
        } else ps + sz._1
        if (pe > end) { ok = false; return }
        val len = (pe - ps).toInt
        id._1 match {
          case 0x4282L => // DocType (inside EBML header)
            docType = new String(body, ps.toInt, len, "ISO-8859-1")
          case 0x2ad7b1L => // TimecodeScale (ns per timecode unit)
            if (len >= 1 && len <= 8) scaleNs = uintAt(ps.toInt, len)
            else ok = false
          case 0x4489L => // Duration (float, in timecode units)
            if (len == 4) durUnits =
              java.lang.Float.intBitsToFloat(uintAt(ps.toInt, 4).toInt).toDouble
            else if (len == 8) durUnits =
              java.lang.Double.longBitsToDouble(uintAt(ps.toInt, 8))
            else ok = false
          case 0xb0L if inVideo => // PixelWidth
            val v = if (len >= 1 && len <= 8) uintAt(ps.toInt, len) else -1L
            if (v >= 0 && v <= Int.MaxValue) vw = v.toInt else ok = false
          case 0xbaL if inVideo => // PixelHeight
            val v = if (len >= 1 && len <= 8) uintAt(ps.toInt, len) else -1L
            if (v >= 0 && v <= Int.MaxValue) vh = v.toInt else ok = false
          case 0xaeL =>
            nTracks += 1
            if (depth >= maxDepth) ok = false else walk(ps, pe, depth + 1)
          case 0xe0L =>
            if (depth >= maxDepth) ok = false
            else {
              inVideo = true; vw = 0; vh = 0
              walk(ps, pe, depth + 1)
              inVideo = false
              // commit only a COMPLETE (width, height) pair, first wins
              if (ok && vw > 0 && vh > 0 && w == 0 && h == 0) { w = vw; h = vh }
            }
          case c if containers(c) =>
            if (depth >= maxDepth) ok = false else walk(ps, pe, depth + 1)
          case _ => () // leaf we don't read (Cluster, SeekHead, Cues, ...)
        }
        p = pe
      }
    }
    try {
      walk(0L, body.length.toLong, 0)
      // The Duration float is raw file data: NaN would silently read as
      // durMs 0 ("fine") through toLong, and an implausibly-huge value
      // saturates to Long.MaxValue — both are malformed fields and must
      // reject the payload, like the mvhd overflow guard in [[mp4Meta]]
      // (double multiply saturates rather than wrapping, so the check is
      // a plain magnitude compare, no divide-first dance needed)
      val durMsD =
        if (durUnits < 0) 0.0 else durUnits * scaleNs / 1e6
      if (durMsD.isNaN || durMsD >= Long.MaxValue.toDouble) ok = false
      if (ok && docType.nonEmpty) Some((docType, nTracks, durMsD.toLong, w, h))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-frame sampling — the video analogue of [[audioSamples]]'
    * codec boundary. REAL demux paths: Y4M ([[y4mFrameMeans]] — pure-JVM
    * header+raw-frames parse), multi-frame GIF ([[gifFrameMeans]] —
    * imageio sequence reader), and AVI/MJPEG ([[aviFrameMeans]] — RIFF
    * chunk walk + per-frame imageio JPEG decode), each emitting one
    * (frame_idx, mean-luma) row per actual container frame. Anything
    * else keeps the deterministic byte stand-in (every `stride`-th byte
    * as the "frame"), which is also the oracle path: the testdata
    * corpus is ASCII text DuckDB replays with substr/unicode, while the
    * scalatest suite drives the real demux on in-fixture Y4M/GIF/AVI
    * payloads. MP4 frames stay on the stand-in (no JDK H.264 decoder —
    * though [[mp4Meta]] demuxes its METADATA for real), as do MKV/WebM
    * entirely, documented, until a real codec dependency is allowed. */
  def sampleFrames(body: Array[Byte], stride: Int = 32): Iterator[(Int, Int)] =
    y4mFrameMeans(body).orElse(gifFrameMeans(body))
      .orElse(aviFrameMeans(body)) match {
      case Some(frames) => frames.iterator
      case None =>
        Iterator.range(0, body.length, stride).zipWithIndex.map {
          case (pos, idx) => (idx, body(pos) & 0xff)
        }
    }

  /** Perceptual difference-hash (dHash), 60-bit: resample to an 11×6
    * grid, emit one bit per horizontal neighbor pair (`left < right`),
    * packed row-major into a positive BIGINT (6 rows × 10 bits — the
    * repo's h60 width convention, so the hash survives BIGINT engines
    * without sign games). Real path: deterministic bilinear resize +
    * integer BT.601 luma per grid cell. Non-image payloads take the
    * byte-sampling stand-in (the oracle path): grid point k ∈ [0, 66)
    * reads the payload byte at `(k·len) DIV 66` — fixed fractional
    * positions DuckDB can replay over ASCII text with substr/unicode. */
  def dHash60(body: Array[Byte]): Long =
    decodeImage(body) match {
      case Some(img) =>
        val small = bilinearResize(img, 11, 6)
        def luma(x: Int, y: Int): Int = {
          val p = small.getRGB(x, y)
          (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
            114 * (p & 0xff)) / 1000
        }
        var h = 0L
        var r = 0
        while (r < 6) {
          var c = 0
          while (c < 10) {
            if (luma(c, r) < luma(c + 1, r)) h |= 1L << (r * 10 + c)
            c += 1
          }
          r += 1
        }
        h
      case None =>
        val len = body.length
        if (len == 0) 0L
        else {
          // k.toLong: at real payload sizes (MBs) k*len overflows Int
          def at(k: Int): Int = body((k.toLong * len / 66).toInt) & 0xff
          var h = 0L
          var b = 0
          while (b < 60) {
            val k = (b / 10) * 11 + b % 10
            if (at(k) < at(k + 1)) h |= 1L << b
            b += 1
          }
          h
        }
    }

  /** Resize: payloads that decode as images take the real path — bilinear
    * downsample by `factor` (dims round up, min 1px) and lossless PNG
    * re-encode. Non-image payloads keep the 1-D nearest-neighbor byte
    * downsample stand-in (the oracle path). */
  def resize(body: Array[Byte], factor: Int = 2): Array[Byte] =
    decodeImage(body) match {
      case Some(img) =>
        encodePng(bilinearResize(img,
          math.max(1, (img.getWidth + factor - 1) / factor),
          math.max(1, (img.getHeight + factor - 1) / factor)))
      case None =>
        val out = new Array[Byte]((body.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = body(i * factor); i += 1 }
        out
    }
}

object MultimodalOps {
  import Tables._

  /** Per-payload dimension census: REAL (width, height) for payloads
    * that decode as images (the tiny-image / extreme-aspect-ratio
    * filter every vision curation pipeline runs before embedding;
    * CLIP-style recipes drop anything under a pixel floor), REAL
    * presentation dimensions from the `tkhd` box for sniffed ISO-BMFF
    * video ([[Multimodal.mp4Meta]] — metadata needs no codec), the
    * (byte-length, 1) stand-in otherwise — the oracle path over the
    * ASCII corpus. One row per payload unconditionally (an empty blob
    * reports (0, 1, 0)).
    *
    * Plan/scale: one narrow mapPartitions through the codec boundary —
    * payloads never cross a shuffle, three small columns leave the
    * scan; no exchange before the presentation sort. */
  def dims(s: SparkSession, d: String): DataFrame =
    dimRows(s, d).orderBy("doc_id")

  private def dimRows(s: SparkSession, d: String): DataFrame =
    dimRowsFrom(documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body")))

  /** The unsorted (doc_id, width, height, n_pixels) census shared by
    * [[dims]] and [[aspectBuckets]] — one decode, two consumers. */
  private[ops] def dimRowsFrom(clips: DataFrame): DataFrame = {
    val s = clips.sparkSession
    import s.implicits._
    clips
      .select(col("doc_id"), col("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, b) =>
        Multimodal.decodeImage(b) match {
          case Some(img) => (id, img.getWidth, img.getHeight)
          case None => Multimodal.mp4Meta(b).orElse(Multimodal.mkvMeta(b)) match {
            case Some((_, _, _, w, h)) if w > 0 && h > 0 => (id, w, h)
            case _ => (id, b.length, 1)
          }
        }
      })
      .toDF("doc_id", "width", "height")
      .select(col("doc_id"), col("width"), col("height"),
        expr("CAST(width AS BIGINT) * height").as("n_pixels"))
  }

  /** Aspect-ratio bucketing census — the batching pass every
    * resolution-bucketed image-training recipe (SDXL-style) runs:
    * payloads are binned by quarter-ratio qr = round-half-up(4·w/h)
    * (spelled (8w + h) div 2h — PURE integer arithmetic, so the bin
    * edge can never flip on a float division in either engine), clamped
    * to [1, 16] (≤1:4 portrait through ≥4:1 landscape; bucket 4 =
    * square), with per-bucket population, exact total pixels, mean
    * pixels (exact BIGINT sum ÷ count), and the ratio envelope
    * (min/max are order-free — no cross-partition double sum). The
    * report is the input to the batch scheduler (how many buckets are
    * worth a resolution group) and the outlier filter (extreme-aspect
    * payloads to drop). Dimensions come from the [[dims]] census —
    * real decodes for images/video, the (byte-length, 1) stand-in
    * otherwise (the oracle path; real-decode bucketing is
    * fixture-proven through THIS core).
    *
    * Plan/scale: the [[dims]] narrow decode pass (payloads never cross
    * a shuffle) + ONE 16-key agg — partial map-side combine makes the
    * exchange 16 rows per task at any corpus size. */
  def aspectBuckets(s: SparkSession, d: String): DataFrame =
    aspectBucketsFrom(dimRows(s, d))

  /** [[aspectBuckets]] over a caller-supplied dims relation — the
    * testable core (real PNG decodes land in their exact buckets). */
  private[ops] def aspectBucketsFrom(dimRows: DataFrame): DataFrame =
    dimRows
      .select(col("n_pixels"),
        expr("least(greatest((8L * width + height) div (2L * height), 1L), 16L)")
          .as("bucket"),
        expr("width / height").as("ratio"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_pixels")).as("total_pixels"),
        min(col("ratio")).as("min_ratio"), max(col("ratio")).as("max_ratio"))
      .select(col("bucket"), col("n_docs"), col("total_pixels"),
        expr("total_pixels / n_docs").as("mean_pixels"),
        col("min_ratio"), col("max_ratio"))
      .orderBy("bucket")

  /** ISO-BMFF metadata census: one row per payload that parses as a
    * whole MP4/MOV — brand, track count, duration, presentation dims
    * ([[Multimodal.mp4Meta]]'s pure-JVM box walk; no codec involved).
    * This is the curation pass a video corpus runs FIRST — drop
    * sub-second clips, absurd aspect ratios, track-less fragments —
    * and it reads only box headers, never a frame. Rows-empty on the
    * ASCII testdata corpus (the oracle is the empty relation, the
    * `d_bridge_docs` convention); the real path is fixture-proven on a
    * hand-assembled MP4 through THIS declared query.
    *
    * Plan/scale: one narrow mapPartitions through the codec boundary —
    * payloads never cross a shuffle; the emitted rows are five small
    * columns. */
  def mp4MetaQuery(s: SparkSession, d: String): DataFrame =
    containerMetaQuery(s, d, "brand", Multimodal.mp4Meta)

  /** The shared shape of the two container-metadata censuses — ONE
    * mapPartitions pipeline parameterized by the parser and the name of
    * its kind column, so the schemas cannot drift. */
  private def containerMetaQuery(s: SparkSession, d: String, kindCol: String,
      parse: Array[Byte] => Option[(String, Int, Long, Int, Int)]): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, b) =>
        parse(b).map { case (kind, nTracks, durMs, w, h) =>
          (id, kind, nTracks.toLong, durMs, w, h)
        }
      })
      .toDF("doc_id", kindCol, "n_tracks", "duration_ms", "width", "height")
      .orderBy("doc_id")
  }

  /** Matroska/WebM twin of [[mp4MetaQuery]]: doc_type, track count,
    * duration, video pixel dimensions from [[Multimodal.mkvMeta]]'s
    * pure-JVM EBML walk — same rows-empty-on-ASCII gate convention,
    * same fixture-proven real path. */
  def mkvMetaQuery(s: SparkSession, d: String): DataFrame =
    containerMetaQuery(s, d, "doc_type", Multimodal.mkvMeta)

  /** Metadata projection over an opaque binary column: byte length +
    * content hash — pure column ops, no decode. */
  def blobMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        length(col("text").cast(BinaryType)).cast("long").as("n_bytes"),
        sha2(col("text").cast(BinaryType), 256).as("content_sha"))
      .orderBy("doc_id")

  /** Batch feature extraction: binary payload → per-bin histogram rows via
    * mapPartitions (decoder stub allocated once per partition). */
  def byteHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder context would be initialized here (STUB)
        it.flatMap { case (id, body) =>
          Multimodal.decodeImageFeatures(body).iterator.zipWithIndex.collect {
            case (n, bin) if n > 0 => (id, bin, n)
          }
        }
      }
      .toDF("doc_id", "bin", "n")
      .orderBy("doc_id", "bin")
  }

  /** Shannon entropy of each blob's byte histogram — the
    * compressed/encrypted-payload detector every multimodal ingest runs
    * before wasting decoder time: plain text and raw bitmaps concentrate
    * mass in few bins (low entropy), deflate/JPEG/AES output is
    * near-uniform (entropy ≈ ln 16 over the 16-bin histogram), and the
    * verdict routes the blob (decode vs quarantine). Rides the SAME
    * histogram rows [[byteHistogram]] emits (real image-feature bins for
    * sniffed payloads, byte stand-in otherwise), so the detector and the
    * histogram can never disagree.
    *
    * Exactness: H = ln N − (Σ nᵢ·ln nᵢ)/N with every ln a [[DetMath]]
    * bit-identical double; the per-bin terms quantize to the 1e-9 BIGINT
    * ledger (the t_unigram_lm device) so the Σ is order-free, and the
    * verdict compares the identical double against a literal threshold
    * (0.95·ln 16 ≈ 2.63) — both engines see the same bits.
    *
    * Plan/scale: the histogram pass + ONE doc-key agg; the DetMath ln
    * chains are in-row arithmetic. */
  def byteEntropy(s: SparkSession, d: String): DataFrame =
    byteEntropyFrom(byteHistogram(s, d))

  /** [[byteEntropy]] over caller-supplied (doc_id, bin, n) histogram
    * rows — the testable core (uniform bins read ≈ ln 16 and flag;
    * a single-bin blob reads ≈ 0 and doesn't). */
  private[ops] def byteEntropyFrom(hist: DataFrame): DataFrame = {
    // ONE doc-key groupBy carries the whole detector: the quantized
    // ledger term is summed exactly wide — DECIMAL(19,0)·DECIMAL(18,0)
    // → DECIMAL(38,0), exact for any BIGINT n × ln-quantum (≤4e29 per
    // row; bins per doc are bounded, so the Σ stays far inside the
    // 10^38 decimal envelope) — so NO wrap can occur before the
    // post-agg guard fires, and the guard needs only the aggregated
    // sum(n)/max(bn_ln). It lives INSIDE the load-bearing entropy
    // expression (the e_stl_anomaly device — a standalone guard column
    // gets pruned and a pruned raise_error never fires) and raises this
    // op's message before the ledger is narrowed back to the 1e18
    // BIGINT contract (9.2x margin: Σ n·round(ln n·1e9) ≤
    // sum(n)·max(ln n)·1e9 + sum(n)/2).
    val lns = graft.ops.DetMath.withLn(hist, "n", "bn")
      .withColumn("q", expr(
        """CAST(n AS DECIMAL(19,0))
         * CAST(CAST(round(bn_ln * 1.0e9) AS BIGINT) AS DECIMAL(18,0))"""))
    val agg = lns.groupBy("doc_id").agg(
      sum(col("n")).as("n_units"),
      max(col("bn_ln")).as("lmax"),
      sum(col("q")).as("slq"))
    graft.ops.DetMath.withLn(agg, "n_units", "nt")
      .withColumn("entropy", expr(
        """nt_ln - ((CASE WHEN CAST(n_units AS DOUBLE) * lmax * 1.0e9 > 1.0e18
        THEN raise_error('m_byte_entropy: entropy ledger exceeds the BIGINT envelope (sum(n)*ln(max n)*1e9 > 1e18) — shard the blob histogram')
        ELSE CAST(slq AS DOUBLE) END) / 1.0e9) / CAST(n_units AS DOUBLE)"""))
      .select(col("doc_id"), col("n_units"), col("entropy"),
        (col("entropy") > lit(2.63d)).as("high_entropy"))
      .orderBy("doc_id")
  }

  /** Frame sampling: one output row per sampled frame with its index and
    * per-frame value — the flatMap (1 row → N rows) shape of a video
    * pipeline. The decode is the codec boundary ([[Multimodal
    * .sampleFrames]]): REAL per-frame mean luma for sniffed Y4M and
    * multi-frame GIF containers, the byte stand-in otherwise (the
    * oracle path over the ASCII corpus — DuckDB cannot demux video). */
  /** The unsorted (doc_id, frame_idx, byte_val) frame stream shared by
    * [[frameSample]] and [[keyframes]] — the consumer decides the final
    * ordering, so the keyframe lag window doesn't pay for an
    * intermediate output sort. */
  private def frameRows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, body) =>
        Multimodal.sampleFrames(body).map { case (idx, v) => (id, idx, v) }
      }
      .toDF("doc_id", "frame_idx", "byte_val")
  }

  def frameSample(s: SparkSession, d: String): DataFrame =
    frameRows(s, d).orderBy("doc_id", "frame_idx")

  /** Scene-cut threshold for [[keyframes]] (mean-luma / stand-in byte
    * units): a frame opens a new shot when it jumps at least this far
    * from its predecessor. */
  val KeyframeDelta = 16

  /** Keyframe (scene-cut) selection over the sampled frame stream — the
    * shot-boundary pass a video curation pipeline runs so captioning /
    * embedding sees one frame per shot instead of thirty near-identical
    * ones per second: a frame is a keyframe when it opens the stream or
    * its value jumps ≥ [[KeyframeDelta]] from the previous frame. Values
    * come through the SAME [[Multimodal.sampleFrames]] codec boundary as
    * `m_frame_sample` — REAL per-frame mean luma for Y4M / animated GIF /
    * AVI-MJPEG, the deterministic byte stand-in otherwise (the oracle path over the
    * ASCII corpus).
    *
    * Plan/scale: the frameSample decode (payload never crosses a
    * shuffle; only (doc_id, idx, value) rows do) + ONE uniform doc-key
    * lag window + filter; output is keyframe-count-sensitive. */
  def keyframes(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameRows(s, d)
      .withColumn("prev", lag(col("byte_val"), 1).over(w))
      .withColumn("delta",
        expr("CAST(abs(byte_val - coalesce(prev, byte_val)) AS BIGINT)"))
      .filter(col("prev").isNull || col("delta") >= KeyframeDelta)
      .select(col("doc_id"), col("frame_idx"), col("byte_val"), col("delta"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize stage: payload in, downsampled payload + before/after metadata
    * out — the map shape of an image-resize pipeline (payload transforms
    * stay within the task; only the transformed payload would flow to the
    * next stage, never across a shuffle key). */
  def resizeStage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, body) =>
          val r = Multimodal.resize(body)
          (id, body.length.toLong, r.length.toLong, ZipExtract.sha256Hex(r))
        }
      }
      .toDF("doc_id", "orig_bytes", "resized_bytes", "resized_sha")
      .orderBy("doc_id")
  }

  /** Audio-style framing: decode the payload to a sample stream, cut into
    * fixed 64-sample windows, emit per-window count and energy (sum of
    * squared sample values — the core of RMS/VAD features). Sample
    * extraction is the codec boundary — a narrow mapPartitions through
    * [[Multimodal.audioSamples]]: real PCM via pure-JDK
    * `javax.sound.sampled` for `RIFF....WAVE`-sniffed payloads, the byte
    * stand-in otherwise (the oracle path — the testdata corpus is ASCII
    * text, which DuckDB can replay). Everything downstream of the decode
    * stays relational: posexplode over the sample array + integer
    * arithmetic + one partial-aggregated shuffle on (doc, window) — all
    * whole-stage codegen, unchanged whichever decode path fired. */
  /** The unsorted per-(doc, window) energy relation shared by
    * [[audioWindows]] and [[silence]] — the consumer decides the final
    * ordering/rollup. */
  private def audioWindowRows(s: SparkSession, d: String): DataFrame =
    audioWindowRowsFrom(
      documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text").cast(BinaryType).as("body")))

  /** [[audioWindowRows]] over caller-supplied (doc_id, body) clips — the
    * shared decode+framing core: the gate path binds it to the documents
    * table; the streaming merge==batch spec (AudioStreamSpec) binds BOTH
    * arms to one clip relation so the comparison starts from identical
    * payloads. */
  private[graft] def audioWindowRowsFrom(clips: DataFrame): DataFrame = {
    val s = clips.sparkSession
    import s.implicits._
    clips
      .select(col("doc_id"), col("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, body) =>
        (id, Multimodal.audioSamples(body))
      })
      .toDF("doc_id", "samples")
      .select(col("doc_id"), posexplode(col("samples")).as(Seq("i", "v")))
      .select(col("doc_id"), expr("CAST(i DIV 64 AS INT)").as("win"), col("v"))
      .groupBy(col("doc_id"), col("win"))
      .agg(count(lit(1)).as("n_samples"),
        sum(expr("v * v")).as("energy"))
  }

  def audioWindows(s: SparkSession, d: String): DataFrame =
    audioWindowRows(s, d)
      .select(col("doc_id"), col("win"), col("n_samples"), col("energy"),
        expr("energy / n_samples").as("mean_energy"))
      .orderBy("doc_id", "win")

  /** DF cap on fingerprint postings in [[audioFprint]] — a landmark
    * shared by more docs than this is boilerplate (tone beeps, codec
    * padding) and is dropped before pair enumeration, the
    * [[graft.ops.DedupOps]] pairCounts discipline. */
  val FprintMaxDf = 32L

  /** Audio landmark fingerprint MATCH report — the Shazam-style
    * constellation device, which is the audio tier's answer to
    * [[phash]]: energy PEAKS (strict local maxima over the
    * [[audioWindows]] grid, plateau tiebreak to the first window) are
    * paired each-with-its-next into landmarks, a landmark hashes as
    * (energy band₁, energy band₂, Δt) — NO absolute time, so a clip
    * re-encoded, trimmed, or embedded in a longer recording still
    * collides on its interior landmarks — and every doc pair sharing
    * ≥ 1 distinct landmark hash is reported with its shared count (the
    * candidate grain, like [[graft.ops.DedupOps]] pairCounts; the
    * standard ≥ 2 MATCH bar is the consumer's threshold on `n_shared`,
    * pinned by the offset-invariance fixture).
    * Bands are integer log₂ of the exact window energy (`length(bin(e))
    * − 1` — the [[DetMath]] k step), so every byte of the pipeline is
    * integer arithmetic: no float can flip a hash in either engine.
    *
    * Plan/scale: the [[audioWindows]] decode + window agg (payloads
    * never cross a shuffle), two doc-key windows over the window grid
    * (peaks) and the peak list (landmark pairing), then the inverted
    * fingerprint index: distinct postings, hot hashes dropped at
    * [[FprintMaxDf]], pairs enumerated per posting list — output-
    * sensitive, never corpus², exactly the pairCounts shape. */
  def audioFprint(s: SparkSession, d: String): DataFrame =
    audioFprintFrom(audioWindowRows(s, d))

  /** [[audioFprint]] over caller-supplied (doc_id, win, energy) rows —
    * the testable core (two clips sharing their interior peak
    * structure at a time offset match; a different clip doesn't; a
    * boilerplate landmark shared corpus-wide is capped away). */
  private[graft] def audioFprintFrom(winRows: DataFrame,
      maxDf: Long = FprintMaxDf): DataFrame = {
    // materialize the capped posting relation ONCE (the pairCounts
    // checkpoint discipline): the self-join reads it twice, and an
    // unmaterialized lineage re-runs the decode + three windows per side
    val cold = audioMarksFrom(winRows)
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("df") <= maxDf)
      .select(col("doc_id"), col("fp"))
      .localCheckpoint()
    cold.as("a")
      .join(cold.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("a_id", "b_id")
  }

  /** The distinct (doc_id, fp) landmark relation of [[audioFprint]] —
    * the relational arm of the landmark definition.
    * [[Multimodal.landmarkFps]] is its per-clip streaming dual; the two
    * are pinned value-equal by AudioStreamSpec so the arms cannot
    * drift. */
  private[graft] def audioMarksFrom(winRows: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("win")
    val peaks = winRows
      .withColumn("pe", lag(col("energy"), 1).over(w))
      .withColumn("ne", lead(col("energy"), 1).over(w))
      // strict vs prev, >= vs next: exactly one peak per plateau (its
      // first window) — identical tiebreak both engines; clip edges
      // count as -inf neighbors
      .filter(col("energy") > coalesce(col("pe"), lit(-1L)) &&
        col("energy") >= coalesce(col("ne"), lit(-1L)))
      .select(col("doc_id"), col("win"),
        expr("length(bin(energy)) - 1").as("band"))
    peaks
      .withColumn("band2", lead(col("band"), 1).over(w))
      .withColumn("dt", lead(col("win"), 1).over(w) - col("win"))
      .filter(col("band2").isNotNull)
      .select(col("doc_id"),
        expr("band * 262144 + band2 * 4096 + least(dt, 4095L)").as("fp"))
      .distinct()
  }

  /** Mean-energy floor below which a window counts as silent in
    * [[silence]]. Real PCM silence sits near 0; the ASCII byte stand-in
    * never goes below printable-character energy, so the gate corpus
    * reports zero silent windows — the real path is driven by the
    * FixtureGateSpec WAV with actual silent segments. */
  val SilenceFloor = 2000L

  /** Per-clip silence report: silent-window count and the
    * first/last sounded window — the trim points a speech pipeline cuts
    * leading/trailing silence at before transcription or embedding, and
    * the "is this clip dead air" verdict. A window is silent when its
    * exact mean energy is below [[SilenceFloor]] — compared as
    * energy < floor·n_samples, pure BIGINTs, so the verdict can never
    * flip on a float rounding.
    *
    * Plan/scale: the [[audioWindows]] decode + window agg (payloads
    * never cross a shuffle) + one uniform doc-key rollup, LEFT-joined
    * from the pruned doc-id projection so a clip whose payload yields
    * ZERO samples (empty blob, dead container) still reports a
    * (0, 0, NULL, NULL) row — one row per clip unconditionally, the
    * m_color_stats census convention. */
  def silence(s: SparkSession, d: String): DataFrame = {
    val rolled = audioWindowRows(s, d)
      .withColumn("quiet", expr(s"energy < ${SilenceFloor}L * n_samples"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("quiet"), 1L).otherwise(0L)).as("n_silent"),
        min(when(!col("quiet"), col("win"))).as("first_sound"),
        max(when(!col("quiet"), col("win"))).as("last_sound"))
    documents(s, d).filter(col("doc_id") < 100).select("doc_id")
      .join(rolled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_silent"), lit(0L)).as("n_silent"),
        col("first_sound"), col("last_sound"))
      .orderBy("doc_id")
  }

  /** Per-image color statistics: channel sample counts, exact integer
    * channel sums, and mean intensity per RGB channel — the "is this
    * corpus dark / washed out / color-cast" profiling pass a visual
    * training pipeline runs before normalization. The decode is the codec
    * boundary ([[Multimodal.colorStats]]: real per-pixel RGB sums for
    * sniffed images, byte→channel-cycling stand-in otherwise — the oracle
    * path over the ASCII corpus); the means are computed relationally so
    * both engines share one division tree over the same exact integers.
    *
    * Plan/scale: narrow mapPartitions — payloads never cross a shuffle,
    * only seven small columns per blob leave the scan; no exchange before
    * the presentation sort. */
  def colorStatsStage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, b) =>
        val (nr, ng, nb, sr, sg, sb) = Multimodal.colorStats(b)
        (id, nr, ng, nb, sr, sg, sb)
      })
      .toDF("doc_id", "n_r", "n_g", "n_b", "sum_r", "sum_g", "sum_b")
      .select(col("doc_id"), col("n_r"), col("n_g"), col("n_b"),
        col("sum_r"), col("sum_g"), col("sum_b"),
        expr("CASE WHEN n_r = 0 THEN CAST(NULL AS DOUBLE) ELSE sum_r / n_r END")
          .as("mean_r"),
        expr("CASE WHEN n_g = 0 THEN CAST(NULL AS DOUBLE) ELSE sum_g / n_g END")
          .as("mean_g"),
        expr("CASE WHEN n_b = 0 THEN CAST(NULL AS DOUBLE) ELSE sum_b / n_b END")
          .as("mean_b"))
      .orderBy("doc_id")
  }

  /** Per-clip audio features over the zero-centered sample stream:
    * zero-crossing count (the classic cheap voiced/unvoiced + noisiness
    * signal next to [[audioWindows]]' energy), exact absolute-amplitude
    * sum, and peak amplitude. Decode is the codec boundary
    * ([[Multimodal.centeredSamples]]: real signed PCM for sniffed WAV,
    * the 96-centered byte stand-in otherwise — the oracle path); the
    * crossing count and amplitude stats are higher-order array
    * expressions over the sample array, so the whole query is ONE narrow
    * pass — no explode, no shuffle, nothing but the presentation sort.
    * All counts/sums are exact integers; the two rates divide them once. */
  def audioZcr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, b) =>
        (id, Multimodal.centeredSamples(b))
      })
      .toDF("doc_id", "sm")
      .select(col("doc_id"),
        size(col("sm")).cast("long").as("n_samples"),
        expr("""CASE WHEN size(sm) < 2 THEN CAST(0 AS BIGINT)
                ELSE CAST(size(filter(zip_with(
                       slice(sm, 1, size(sm) - 1), slice(sm, 2, size(sm) - 1),
                       (a, b) -> (a >= 0) != (b >= 0)), x -> x)) AS BIGINT)
                END""").as("n_cross"),
        expr("aggregate(sm, CAST(0 AS BIGINT), (acc, x) -> acc + abs(x))")
          .as("sum_abs"),
        expr("array_max(transform(sm, x -> abs(x)))").as("peak"))
      .select(col("doc_id"), col("n_samples"), col("n_cross"),
        col("sum_abs"), col("peak"),
        expr("CASE WHEN n_samples > 1 THEN n_cross / (n_samples - 1) END")
          .as("zcr"),
        expr("CASE WHEN n_samples = 0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE sum_abs / n_samples END").as("mean_abs"))
      .orderBy("doc_id")
  }

  /** Perceptual image dedup: 60-bit dHash per payload + exact-hash
    * duplicate groups — the image-grain twin of `d_exact_dedup` (byte
    * -identical files differ after re-encode; the perceptual hash
    * collapses them). The decode is the codec boundary
    * ([[Multimodal.dHash60]]: real pixels for sniffed images, byte
    * stand-in for the oracle path); everything after is relational.
    *
    * Plan/scale: narrow mapPartitions (payload never crosses a shuffle —
    * only the 8-byte hash does) + ONE uniform-key window on the hash. At
    * 100 TB the hash groupBy is the same one-shuffle shape as exact
    * dedup; near-dup (Hamming ≤ k) grouping would add the simhash
    * pigeonhole bands (`d_simhash_pairs`) over the same column. */
  def phash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ph"))
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, body) =>
        (id, Multimodal.dHash60(body))
      })
      .toDF("doc_id", "ph")
      .withColumn("n_same", count(lit(1)).over(w))
      .select(col("doc_id"), col("ph"), col("n_same"),
        (col("n_same") > 1).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Perceptual NEAR-dup image pairs: Hamming ≤ 3 over the 60-bit dHash
    * via the 4×15-bit pigeonhole (a pair within distance 3 agrees on at
    * least one band exactly — 4 bands, 3 flipped bits) — the
    * d_simhash_pairs machinery applied to the image fingerprint, with the
    * same capped posting enumeration.
    *
    * Plan/scale: narrow hash map → 4-row band explode → ONE shuffle on
    * the (band_idx, band) key; pairs enumerated inside bounded posting
    * rows (cap 64); the exact bit_count(xor) ≤ 3 filter runs on
    * candidates only. Never n²; hot bands are dropped by the cap, and
    * only (id, hash) pairs ever shuffle — payloads stay in the scan. */
  /** Perceptual near-dup CLUSTERS: connected components over the
    * [[phashPairs]] Hamming-≤3 graph via the shared
    * [[DedupOps.dedupClustersFrom]] — one photo re-encoded five ways
    * becomes one cluster with one canonical (min-id) representative,
    * the actionable grouping the pairwise view stops short of. Same
    * scale shape: banded pair enumeration + the iterative CC over a
    * checkpointed edge list. */
  def phashClusters(s: SparkSession, d: String): DataFrame =
    DedupOps.dedupClustersFrom(
      phashPairs(s, d).select(col("a_id"), col("b_id")))

  def phashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val maxBand = 64
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, body) =>
        (id, Multimodal.dHash60(body))
      })
      .toDF("doc_id", "ph")
      .select(col("doc_id"), col("ph"),
        explode(expr("sequence(0, 3)")).as("band_idx"))
      .select(col("doc_id"), col("ph"), col("band_idx"),
        expr("(ph >> (15 * band_idx)) & 32767").as("band"))
      .groupBy("band_idx", "band")
      .agg(collect_list(struct(col("doc_id"), col("ph"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBand)
      .select(posexplode(col("ids")).as(Seq("i", "a")), col("ids"))
      .select(col("a"), explode(expr("slice(ids, i + 2, size(ids))")).as("b"))
      .select(
        when(col("a.doc_id") < col("b.doc_id"), col("a")).otherwise(col("b")).as("x"),
        when(col("a.doc_id") < col("b.doc_id"), col("b")).otherwise(col("a")).as("y"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        expr("CAST(bit_count(x.ph ^ y.ph) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_phash_pairs" -> phashPairs,
    "m_phash_clusters" -> phashClusters,
    "m_phash" -> phash,
    "m_blob_meta" -> blobMeta,
    "m_byte_histogram" -> byteHistogram,
    "m_byte_entropy" -> byteEntropy,
    "m_frame_sample" -> frameSample,
    "m_keyframes" -> keyframes,
    "m_silence" -> silence,
    "m_dims" -> dims,
    "m_aspect_buckets" -> aspectBuckets,
    "m_mp4_meta" -> mp4MetaQuery,
    "m_mkv_meta" -> mkvMetaQuery,
    "m_resize" -> resizeStage,
    "m_audio_windows" -> audioWindows,
    "m_audio_fprint" -> audioFprint,
    "m_color_stats" -> colorStatsStage,
    "m_audio_zcr" -> audioZcr)

  /** Shared dHash-replay CTE chain (byte-sampling stand-in: grid point
    * k = (b DIV 10)*11 + b%10, byte at (k*len) DIV 66 via substr/unicode
    * — ASCII ⇒ byte = codepoint), interpolated into BOTH m_phash oracles
    * so the hash definition can never diverge between them. */
  private val PhashCtes = """
      g AS (SELECT doc_id, text, length(text)::BIGINT AS len,
              unnest(generate_series(0, 59))::BIGINT AS b
            FROM documents),
      t AS (SELECT doc_id, b,
              unicode(substr(text,
                (((b // 10 * 11 + b % 10) * len) // 66 + 1)::INT, 1)) AS p0,
              unicode(substr(text,
                (((b // 10 * 11 + b % 10 + 1) * len) // 66 + 1)::INT, 1)) AS p1
            FROM g),
      h AS (SELECT doc_id,
              sum(CASE WHEN p0 < p1 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
                AS ph
            FROM t GROUP BY 1)"""

  val oracles: Map[String, String] = Map(
    "m_phash" -> s"""
      WITH $PhashCtes,
      c AS (SELECT doc_id, ph, count(*) OVER (PARTITION BY ph)::BIGINT AS n_same
            FROM h)
      SELECT doc_id, ph, n_same, n_same > 1 AS is_dup
      FROM c ORDER BY doc_id""",
    "m_phash_pairs" -> s"""
      WITH $PhashCtes,
      ch AS (SELECT doc_id, ph, j AS band_idx,
               (ph >> (15 * j)) & 32767 AS band
             FROM h, generate_series(0, 3) gs(j)),
      keep AS (SELECT band_idx, band FROM ch GROUP BY 1, 2
               HAVING count(*) BETWEEN 2 AND 64),
      pairs AS (SELECT DISTINCT a.doc_id a_id, b.doc_id b_id,
                  a.ph pa, b.ph pb
                FROM ch a JOIN ch b ON a.band_idx = b.band_idx
                  AND a.band = b.band AND a.doc_id < b.doc_id
                JOIN keep k ON a.band_idx = k.band_idx AND a.band = k.band)
      SELECT a_id, b_id, bit_count(xor(pa, pb))::BIGINT AS hamming
      FROM pairs WHERE bit_count(xor(pa, pb)) <= 3
      ORDER BY a_id, b_id""",
    "m_phash_clusters" -> s"""
      WITH RECURSIVE $PhashCtes,
      ch AS (SELECT doc_id, ph, j AS band_idx,
               (ph >> (15 * j)) & 32767 AS band
             FROM h, generate_series(0, 3) gs(j)),
      keep AS (SELECT band_idx, band FROM ch GROUP BY 1, 2
               HAVING count(*) BETWEEN 2 AND 64),
      pp AS (SELECT DISTINCT a.doc_id a_id, b.doc_id b_id,
                  a.ph pa, b.ph pb
             FROM ch a JOIN ch b ON a.band_idx = b.band_idx
               AND a.band = b.band AND a.doc_id < b.doc_id
             JOIN keep k ON a.band_idx = k.band_idx AND a.band = k.band),
      p AS (SELECT a_id, b_id FROM pp WHERE bit_count(xor(pa, pb)) <= 3),
      ed AS (SELECT a_id AS u, b_id AS v FROM p
             UNION SELECT b_id, a_id FROM p),
      r(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM ed) du
                  UNION
                  SELECT ed.u, r.v FROM ed JOIN r ON r.u = ed.v)
      SELECT u AS doc_id, min(v) AS cluster_id FROM r
      GROUP BY u ORDER BY doc_id""",
    "m_blob_meta" -> """
      SELECT doc_id, octet_length(CAST(text AS BLOB))::BIGINT AS n_bytes,
             sha256(text) AS content_sha
      FROM documents ORDER BY doc_id""",
    // text is ASCII, so bytes == code points: the byte histogram equals the
    // character-code histogram.
    "m_byte_entropy" -> s"""
      WITH c AS (SELECT doc_id, unicode(unnest(string_split_regex(text, ''))) cp
                 FROM documents),
      h AS (SELECT doc_id, (cp // 16)::INT AS bin, count(*)::BIGINT AS n
            FROM c GROUP BY 1, 2),
      l AS (SELECT *, ${graft.ops.DetMath.lnDuckSelect("n", "bn")} FROM h),
      -- one doc-key agg mirrors the Spark shape: DuckDB's sum(BIGINT) is
      -- HUGEINT (exact wide, like Spark's DECIMAL(38,0) ledger), so the
      -- envelope guard moves AFTER the agg, before the narrow-back.
      a AS (SELECT doc_id, sum(n)::BIGINT AS n_units, max(bn_ln) AS lmax,
              -- per-row product widened to HUGEINT: n::BIGINT * the 1e9
              -- ledger term can clear 2^63 on one row BEFORE the exact-wide
              -- sum, and DuckDB would raise a generic multiplication
              -- overflow instead of reaching the custom envelope guard in
              -- CTE e (the Spark side is exact-wide DECIMAL(38,0) per term
              -- and always reaches the guard) — r14 advice.
              sum(n::HUGEINT * CAST(round(bn_ln * 1.0e9) AS BIGINT)) AS slq
            FROM l GROUP BY 1),
      t AS (SELECT *, ${graft.ops.DetMath.lnDuckSelect("n_units", "nt")} FROM a),
      e AS (SELECT doc_id, n_units,
              nt_ln - ((CASE WHEN CAST(n_units AS DOUBLE) * lmax * 1.0e9 > 1.0e18
                THEN error('m_byte_entropy: entropy ledger exceeds the BIGINT envelope (sum(n)*ln(max n)*1e9 > 1e18) — shard the blob histogram')
                ELSE CAST(slq AS DOUBLE) END) / 1.0e9)
                / CAST(n_units AS DOUBLE) AS entropy
            FROM t)
      SELECT doc_id, n_units, entropy, entropy > 2.63 AS high_entropy
      FROM e ORDER BY doc_id""",
    "m_byte_histogram" -> """
      WITH c AS (SELECT doc_id, unicode(unnest(string_split_regex(text, ''))) cp
                 FROM documents)
      SELECT doc_id, (cp // 16)::INT AS bin, count(*) AS n
      FROM c GROUP BY 1, 2 ORDER BY doc_id, bin""",
    "m_frame_sample" -> """
      WITH p AS (SELECT doc_id, text,
                   unnest(generate_series(1, length(text), 32)) pos
                 FROM documents WHERE doc_id < 100)
      SELECT doc_id, ((pos - 1) // 32)::INT AS frame_idx,
             unicode(substr(text, pos, 1)) AS byte_val
      FROM p ORDER BY doc_id, frame_idx""",
    "m_keyframes" -> s"""
      WITH p AS (SELECT doc_id, text,
                   unnest(generate_series(1, length(text), 32)) pos
                 FROM documents WHERE doc_id < 100),
      f AS (SELECT doc_id, ((pos - 1) // 32)::INT AS frame_idx,
              unicode(substr(text, pos, 1)) AS byte_val
            FROM p),
      l AS (SELECT doc_id, frame_idx, byte_val,
              lag(byte_val) OVER (PARTITION BY doc_id
                                  ORDER BY frame_idx) AS prev
            FROM f)
      SELECT doc_id, frame_idx, byte_val,
             abs(byte_val - coalesce(prev, byte_val))::BIGINT AS delta
      FROM l
      WHERE prev IS NULL OR abs(byte_val - prev) >= ${KeyframeDelta}
      ORDER BY doc_id, frame_idx""",
    "m_audio_windows" -> """
      WITH p AS (SELECT doc_id, text, unnest(generate_series(1, length(text))) pos
                 FROM documents WHERE doc_id < 100),
      v AS (SELECT doc_id, ((pos - 1) // 64)::INT AS win,
              unicode(substr(text, pos, 1))::BIGINT AS v
            FROM p)
      SELECT doc_id, win, count(*) AS n_samples,
             sum(v * v)::BIGINT AS energy,
             sum(v * v)::BIGINT / count(*) AS mean_energy
      FROM v GROUP BY doc_id, win ORDER BY doc_id, win""",
    "m_audio_fprint" -> s"""
      WITH p AS (SELECT doc_id, text, unnest(generate_series(1, length(text))) pos
                 FROM documents WHERE doc_id < 100),
      v AS (SELECT doc_id, ((pos - 1) // 64)::INT AS win,
              unicode(substr(text, pos, 1))::BIGINT AS v
            FROM p),
      e AS (SELECT doc_id, win, sum(v * v)::BIGINT AS energy
            FROM v GROUP BY 1, 2),
      n AS (SELECT *, lag(energy) OVER wd AS pe, lead(energy) OVER wd AS ne
            FROM e WINDOW wd AS (PARTITION BY doc_id ORDER BY win)),
      pk AS (SELECT doc_id, win,
               (length(bin(energy)) - 1)::BIGINT AS band
             FROM n WHERE energy > coalesce(pe, -1)
               AND energy >= coalesce(ne, -1)),
      mk0 AS (SELECT doc_id, band, lead(band) OVER wd AS band2,
                lead(win) OVER wd - win AS dt
              FROM pk WINDOW wd AS (PARTITION BY doc_id ORDER BY win)),
      mk AS (SELECT DISTINCT doc_id,
               (band * 262144 + band2 * 4096 + least(dt, 4095))::BIGINT AS fp
             FROM mk0 WHERE band2 IS NOT NULL),
      cold AS (SELECT doc_id, fp FROM (
                 SELECT *, count(*) OVER (PARTITION BY fp) AS df FROM mk)
               WHERE df <= $FprintMaxDf)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS n_shared
      FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      ORDER BY a_id, b_id""",
    "m_dims" -> """
      SELECT doc_id, length(text)::INT AS width, 1::INT AS height,
             length(text)::BIGINT AS n_pixels
      FROM documents ORDER BY doc_id""",
    // integer quarter-ratio binning — `//` (DuckDB) and `div` (Spark)
    // agree exactly on non-negative BIGINTs, so no float touches a bin
    // edge; mean from the exact integer sum
    "m_aspect_buckets" -> """
      WITH m AS (SELECT length(text)::BIGINT AS width, 1::BIGINT AS height,
                   length(text)::BIGINT AS n_pixels
                 FROM documents),
      b AS (SELECT n_pixels,
              least(greatest((8 * width + height) // (2 * height), 1), 16)
                AS bucket,
              width / height AS ratio
            FROM m)
      SELECT bucket, count(*)::BIGINT AS n_docs,
             sum(n_pixels)::BIGINT AS total_pixels,
             sum(n_pixels)::BIGINT / count(*) AS mean_pixels,
             min(ratio) AS min_ratio, max(ratio) AS max_ratio
      FROM b GROUP BY 1 ORDER BY bucket""",
    // the ASCII corpus contains no ISO-BMFF payload, so the oracle is
    // the EMPTY relation with the declared schema — hash-exact like any
    // other entry; the real box walk is fixture-proven in scalatest
    "m_mp4_meta" -> """
      SELECT doc_id, CAST(NULL AS VARCHAR) AS brand,
             CAST(NULL AS BIGINT) AS n_tracks,
             CAST(NULL AS BIGINT) AS duration_ms,
             CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height
      FROM documents WHERE FALSE ORDER BY doc_id""",
    "m_mkv_meta" -> """
      SELECT doc_id, CAST(NULL AS VARCHAR) AS doc_type,
             CAST(NULL AS BIGINT) AS n_tracks,
             CAST(NULL AS BIGINT) AS duration_ms,
             CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height
      FROM documents WHERE FALSE ORDER BY doc_id""",
    "m_silence" -> s"""
      WITH p AS (SELECT doc_id, text, unnest(generate_series(1, length(text))) pos
                 FROM documents WHERE doc_id < 100),
      v AS (SELECT doc_id, ((pos - 1) // 64)::INT AS win,
              unicode(substr(text, pos, 1))::BIGINT AS v
            FROM p),
      g AS (SELECT doc_id, win, count(*)::BIGINT AS n_samples,
              sum(v * v)::BIGINT AS energy
            FROM v GROUP BY 1, 2),
      q AS (SELECT doc_id, win,
              energy < $SilenceFloor * n_samples AS quiet
            FROM g),
      r AS (SELECT doc_id, count(*)::BIGINT AS n_windows,
              sum(CASE WHEN quiet THEN 1 ELSE 0 END)::BIGINT AS n_silent,
              min(CASE WHEN NOT quiet THEN win END) AS first_sound,
              max(CASE WHEN NOT quiet THEN win END) AS last_sound
            FROM q GROUP BY 1)
      SELECT d.doc_id, coalesce(r.n_windows, 0)::BIGINT AS n_windows,
        coalesce(r.n_silent, 0)::BIGINT AS n_silent,
        r.first_sound, r.last_sound
      FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
      LEFT JOIN r USING (doc_id)
      ORDER BY d.doc_id""",
    // ASCII ⇒ byte i == codepoint of char i+1; channel = position mod 3.
    // LEFT JOIN from documents keeps a zero-row for an empty payload (the
    // Spark side always emits one row per doc).
    "m_color_stats" -> """
      WITH p AS (SELECT doc_id, text,
                   unnest(generate_series(1, length(text))) pos
                 FROM documents),
      v AS (SELECT doc_id, (pos - 1) % 3 AS ch,
              unicode(substr(text, pos, 1))::BIGINT AS v FROM p),
      g AS (SELECT doc_id,
              count(CASE WHEN ch = 0 THEN 1 END)::BIGINT AS n_r,
              count(CASE WHEN ch = 1 THEN 1 END)::BIGINT AS n_g,
              count(CASE WHEN ch = 2 THEN 1 END)::BIGINT AS n_b,
              coalesce(sum(CASE WHEN ch = 0 THEN v END), 0)::BIGINT AS sum_r,
              coalesce(sum(CASE WHEN ch = 1 THEN v END), 0)::BIGINT AS sum_g,
              coalesce(sum(CASE WHEN ch = 2 THEN v END), 0)::BIGINT AS sum_b
            FROM v GROUP BY 1)
      SELECT d.doc_id, coalesce(n_r, 0) AS n_r, coalesce(n_g, 0) AS n_g,
             coalesce(n_b, 0) AS n_b, coalesce(sum_r, 0) AS sum_r,
             coalesce(sum_g, 0) AS sum_g, coalesce(sum_b, 0) AS sum_b,
             CASE WHEN coalesce(n_r, 0) = 0 THEN NULL
                  ELSE sum_r / n_r END AS mean_r,
             CASE WHEN coalesce(n_g, 0) = 0 THEN NULL
                  ELSE sum_g / n_g END AS mean_g,
             CASE WHEN coalesce(n_b, 0) = 0 THEN NULL
                  ELSE sum_b / n_b END AS mean_b
      FROM documents d LEFT JOIN g USING (doc_id) ORDER BY doc_id""",
    // Stand-in samples are byte − 96 (see Multimodal.centeredSamples);
    // the crossing count compares consecutive signs via lag.
    "m_audio_zcr" -> """
      WITH p AS (SELECT doc_id, text,
                   unnest(generate_series(1, length(text))) pos
                 FROM documents),
      v AS (SELECT doc_id, pos,
              unicode(substr(text, pos, 1))::BIGINT - 96 AS v FROM p),
      l AS (SELECT doc_id, v,
              lag(v) OVER (PARTITION BY doc_id ORDER BY pos) AS pv FROM v),
      g AS (SELECT doc_id, count(*)::BIGINT AS n_samples,
              coalesce(sum(CASE WHEN pv IS NOT NULL
                                 AND ((v >= 0) != (pv >= 0)) THEN 1 END),
                       0)::BIGINT AS n_cross,
              sum(abs(v))::BIGINT AS sum_abs,
              max(abs(v))::BIGINT AS peak
            FROM l GROUP BY 1)
      SELECT d.doc_id, coalesce(n_samples, 0) AS n_samples,
             coalesce(n_cross, 0) AS n_cross,
             coalesce(sum_abs, 0) AS sum_abs, peak,
             CASE WHEN coalesce(n_samples, 0) > 1
                  THEN n_cross / (n_samples - 1) END AS zcr,
             CASE WHEN coalesce(n_samples, 0) = 0 THEN NULL
                  ELSE sum_abs / n_samples END AS mean_abs
      FROM documents d LEFT JOIN g USING (doc_id) ORDER BY doc_id""",
    // '(.).'->'\1' keeps char 1 of every pair (plus an odd tail) == the
    // stride-2 byte downsample over ASCII text.
    "m_resize" -> """
      WITH r AS (SELECT doc_id, length(text)::BIGINT orig_bytes,
                   regexp_replace(text, '(.).', '\1', 'g') rz
                 FROM documents)
      SELECT doc_id, orig_bytes, length(rz)::BIGINT AS resized_bytes,
             sha256(rz) AS resized_sha
      FROM r ORDER BY doc_id""")
}
