package graft.ops

import java.awt.image.BufferedImage

import graft.SparkSpec

/** Real-image codec tests for [[Multimodal]]: known PNGs decode via the
  * JDK's imageio to known pixel features; non-image payloads keep the
  * deterministic byte stand-in the m_* oracles replay (DuckDB cannot
  * decode images — that boundary is the documented split). */
class MultimodalSpec extends SparkSpec {

  /** 2×2 fixture: black, white / red, blue. */
  private def fixturePng: Array[Byte] = {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x0000ff)
    Multimodal.encodePng(img)
  }

  test("PNG payload decodes to the real luminance histogram") {
    val hist = Multimodal.decodeImageFeatures(fixturePng)
    // BT.601 integer luma: black 0 → bin 0, blue 29 → bin 1,
    // red 76 → bin 4, white 255 → bin 15
    val expected = new Array[Long](16)
    expected(0) = 1; expected(1) = 1; expected(4) = 1; expected(15) = 1
    assert(hist.toSeq == expected.toSeq)
  }

  test("bilinear resize averages the 4 taps and round-trips through PNG") {
    val out = Multimodal.resize(fixturePng, factor = 2)
    val img = Multimodal.decodeImage(out).get
    assert(img.getWidth == 1 && img.getHeight == 1)
    // center sample weights all 4 pixels at 1/4: R=(0+255+255+0)/4=127.5
    // → 128, G=255/4=63.75 → 64, B=(255+255)/4=127.5 → 128 (round-half-up)
    assert((img.getRGB(0, 0) & 0xffffff) == ((128 << 16) | (64 << 8) | 128))
  }

  test("bilinear resize interpolates interior pixels of a gradient") {
    val img = new BufferedImage(4, 1, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4) img.setRGB(x, 0, x * 60 << 16) // R = 0,60,120,180
    val out = Multimodal.bilinearResize(img, 2, 1)
    // x=0: sx=(0.5)*4/2-0.5=0.5 → lerp(0,60,.5)=30; x=1: sx=2.5 → 150
    assert(((out.getRGB(0, 0) >> 16) & 0xff) == 30)
    assert(((out.getRGB(1, 0) >> 16) & 0xff) == 150)
  }

  test("non-image payloads fall back to the byte stand-ins (oracle path)") {
    val bytes = "hello graft".getBytes("UTF-8")
    val hist = Multimodal.decodeImageFeatures(bytes)
    val expected = new Array[Long](16)
    bytes.foreach(b => expected((b & 0xff) >> 4) += 1)
    assert(hist.toSeq == expected.toSeq)
    assert(Multimodal.resize(bytes, 2).toSeq ==
      bytes.indices.collect { case i if i % 2 == 0 => bytes(i) }.toSeq)
  }

  test("dHash: gradient images hash by structure, not by encoding") {
    // horizontal ramp: every left < right → all 60 bits set
    val ramp = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = x * 255 / 15; ramp.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val hRamp = Multimodal.dHash60(Multimodal.encodePng(ramp))
    assert(hRamp == (1L << 60) - 1, f"ramp hash $hRamp%x")
    // the reversed ramp: every left > right → no bits set
    val rev = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = (15 - x) * 255 / 15; rev.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(Multimodal.dHash60(Multimodal.encodePng(rev)) == 0L)
    // perceptual: a re-encoded (here: upscaled) ramp keeps the same hash
    val big = Multimodal.bilinearResize(ramp, 64, 32)
    assert(Multimodal.dHash60(Multimodal.encodePng(big)) == hRamp)
  }

  test("dHash stand-in replays the fixed fractional byte positions") {
    val bytes = ("az" * 40).getBytes("UTF-8") // alternating low/high
    val got = Multimodal.dHash60(bytes)
    var want = 0L
    val len = bytes.length
    for (b <- 0 until 60) {
      val k = (b / 10) * 11 + b % 10
      def at(i: Int) = bytes(i * len / 66) & 0xff
      if (at(k) < at(k + 1)) want |= 1L << b
    }
    assert(got == want)
    assert(Multimodal.dHash60(Array.emptyByteArray) == 0L)
  }

  test("dHash near-dup: a small pixel edit moves few bits; bands pigeonhole it") {
    val base = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = x * 255 / 15; base.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val edited = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = x * 255 / 15; edited.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    edited.setRGB(0, 0, 0xffffff) // one bright corner pixel
    val (h1, h2) = (Multimodal.dHash60(Multimodal.encodePng(base)),
      Multimodal.dHash60(Multimodal.encodePng(edited)))
    val hamming = java.lang.Long.bitCount(h1 ^ h2)
    assert(hamming <= 3, s"one-pixel edit flipped $hamming bits")
    // the pigeonhole the query relies on: hamming <= 3 over 4 bands ⇒ at
    // least one 15-bit band identical
    val shared = (0 until 4).exists(j =>
      ((h1 >> (15 * j)) & 32767L) == ((h2 >> (15 * j)) & 32767L))
    assert(shared, "no shared band despite hamming <= 3")
  }

  test("phashPairs agrees with brute force over the corpus hashes") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val got = MultimodalOps.phashPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes = MultimodalOps.phash(spark, d)
      .select(col("doc_id"), col("ph")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    // the cap can only DROP pairs (hot bands), never invent them
    assert(got.subsetOf(want), s"phantom pairs: ${got.diff(want)}")
    // at this SF no band is hot, so the capped result must be exact
    assert(got == want, s"missed pairs: ${want.diff(got)}")
  }

  test("y4m demux property: corrupted payloads parse or reject, never throw") {
    // Strict-or-fallback is the contract: any mutation of a valid stream
    // must yield Some(frames) or None — an exception here would fail a
    // Spark task instead of falling back to the byte stand-in. Truncation
    // at a frame boundary must yield exactly the surviving prefix.
    val base = MediaFixtures.y4mBytes(4, 2, Seq(10, 20, 30))
    val header = base.indexOf('\n'.toByte) + 1
    val frameLen = 6 + 12 // FRAME\n + 4:2:0 payload at 4x2
    val rnd = new scala.util.Random(7411)
    for (_ <- 1 to 200) {
      val b = base.clone()
      rnd.nextInt(3) match {
        case 0 => // bit flips anywhere (header, marker, payload)
          for (_ <- 0 to rnd.nextInt(4)) {
            val at = rnd.nextInt(b.length)
            b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          }
          assert(Multimodal.y4mFrameMeans(b).forall(_.nonEmpty)) // no throw
        case 1 => // truncation at an arbitrary byte: Some(prefix) or None
          val cut = b.take(1 + rnd.nextInt(b.length - 1))
          Multimodal.y4mFrameMeans(cut) match {
            case Some(fs) => assert(fs == Seq((0, 10), (1, 20), (2, 30)).take(fs.size))
            case None => ()
          }
        case 2 => // truncation at an exact frame boundary: exact prefix
          val k = rnd.nextInt(3)
          val cut = b.take(header + k * frameLen)
          val got = Multimodal.y4mFrameMeans(cut)
          if (k == 0) assert(got.isEmpty) // zero frames → None by contract
          else assert(got.get == Seq((0, 10), (1, 20), (2, 30)).take(k))
      }
    }
  }

  test("avi/mjpeg demux property: corrupted payloads parse or reject, never throw") {
    // same strict-or-fallback contract as the y4m fuzz: the RIFF walk
    // plus the per-frame imageio decode must yield Some(nonempty) or
    // None on ANY mutation — never a task-killing throw. Bit flips hit
    // chunk sizes, fourccs, and compressed JPEG entropy data alike.
    val f1 = MediaFixtures.jpegBytes(8, 8, 30)
    val f2 = MediaFixtures.jpegBytes(8, 8, 220)
    val base = MediaFixtures.aviMjpegBytes(Seq(f1, f2))
    assert(Multimodal.aviFrameMeans(base).get.map(_._1) == Seq(0, 1))
    val rnd = new scala.util.Random(9103)
    for (_ <- 1 to 200) {
      val b = base.clone()
      if (rnd.nextBoolean()) {
        for (_ <- 0 to rnd.nextInt(4)) {
          val at = rnd.nextInt(b.length)
          b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
        }
        assert(Multimodal.aviFrameMeans(b).forall(_.nonEmpty))
      } else {
        val cut = b.take(1 + rnd.nextInt(b.length - 1))
        assert(Multimodal.aviFrameMeans(cut).forall(_.nonEmpty))
      }
    }
  }

  test("avi demux: a deeply nested LIST chain is rejected, not recursed to SOE") {
    // self-consistent sizes at every level, so only the depth ceiling
    // stops the walk — without it this recurses once per level and a
    // few-MB payload of 12-byte LIST headers would StackOverflowError
    // (fatal, uncatchable by NonFatal) inside a scan task
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val sz = data.length
      fourcc.getBytes("US-ASCII") ++ Array(
        (sz & 0xff).toByte, ((sz >> 8) & 0xff).toByte,
        ((sz >> 16) & 0xff).toByte, ((sz >> 24) & 0xff).toByte) ++
        data ++ (if (sz % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    }
    var payload = chunk("avih", new Array[Byte](8))
    for (_ <- 1 to 50)
      payload = chunk("LIST", "rec ".getBytes("US-ASCII") ++ payload)
    val bomb = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ payload)
    assert(Multimodal.looksLikeAvi(bomb))
    assert(Multimodal.aviFrameMeans(bomb).isEmpty) // rejected, no throw
    // and a legitimately rec-nested frame still decodes (depth 2)
    val frame = chunk("00dc", MediaFixtures.jpegBytes(4, 4, 77))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("LIST", "rec ".getBytes("US-ASCII") ++ frame))
    val ok = chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ movi)
    assert(Multimodal.aviFrameMeans(ok).exists(_.size == 1))
  }

  test("gif demux property: corrupted payloads parse or reject, never throw") {
    // same contract as the y4m fuzz: the imageio sequence reader sits
    // behind the sniff + NonFatal guard, so any mutation must yield
    // Some(nonempty frames) or None — never a task-killing throw
    val base = MediaFixtures.gifBytes(4, 3, Seq(40, 200))
    assert(Multimodal.gifFrameMeans(base).get == Seq((0, 40), (1, 200)))
    val rnd = new scala.util.Random(5507)
    for (_ <- 1 to 150) {
      val b = base.clone()
      if (rnd.nextBoolean()) {
        for (_ <- 0 to rnd.nextInt(4)) {
          val at = rnd.nextInt(b.length)
          b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
        }
        assert(Multimodal.gifFrameMeans(b).forall(_.nonEmpty))
      } else {
        val cut = b.take(1 + rnd.nextInt(b.length - 1))
        assert(Multimodal.gifFrameMeans(cut).forall(_.nonEmpty))
      }
    }
  }

  test("magic sniff: only real image signatures reach the decoder") {
    // perf + determinism gate: the real-decode path is whitelisted by
    // signature, not by decoder success (ADVICE r5)
    assert(Multimodal.looksLikeImage(fixturePng))
    assert(!Multimodal.looksLikeImage("plain ascii text".getBytes("UTF-8")))
    // ASCII starting with "BM" is NOT a BMP: reserved bytes 6-9 are printable
    assert(!Multimodal.looksLikeImage("BMsome ascii text that goes on".getBytes("UTF-8")))
    assert(!Multimodal.looksLikeImage(Array[Byte]()))
    assert(!Multimodal.looksLikeImage(Array[Byte](0x89.toByte, 'P', 'N'))) // short
    assert(Multimodal.looksLikeImage(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)))
    assert(Multimodal.looksLikeImage("GIF89a".getBytes("US-ASCII")))
    // truncated PNG passes the sniff but must still fall back cleanly
    assert(Multimodal.decodeImage(fixturePng.take(12)).isEmpty)
  }

  /** In-memory WAV fixture: 16-bit signed little-endian PCM via the same
    * pure-JDK `javax.sound.sampled` stack the decoder uses. */
  private def fixtureWav(samples: Array[Short], channels: Int = 1): Array[Byte] = {
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

  test("WAV payload decodes to the real signed PCM samples") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768)
    val wav = fixtureWav(samples)
    assert(Multimodal.looksLikeWav(wav))
    assert(Multimodal.decodeWavSamples(wav).get.toSeq ==
      samples.map(_.toLong).toSeq)
    // audioSamples routes WAV through the real decoder, not the byte path
    assert(Multimodal.audioSamples(wav).toSeq == samples.map(_.toLong).toSeq)
  }

  test("stereo WAV keeps the first channel only") {
    // interleaved L,R frames: feature framing wants one stream
    val wav = fixtureWav(Array[Short](10, -99, 20, -98, 30, -97), channels = 2)
    assert(Multimodal.decodeWavSamples(wav).get.toSeq == Seq(10L, 20L, 30L))
  }

  test("WAV sniff + fallback: non-WAV and truncated payloads keep the byte stand-in") {
    val ascii = "plain ascii audio stand-in".getBytes("UTF-8")
    assert(!Multimodal.looksLikeWav(ascii))
    assert(Multimodal.audioSamples(ascii).toSeq ==
      ascii.map(b => (b & 0xff).toLong).toSeq)
    // RIFF....WAVE prefix passes the sniff but a truncated header must
    // fall back cleanly, never fail a task
    val truncated = fixtureWav(Array[Short](1, 2, 3)).take(16)
    assert(Multimodal.looksLikeWav(truncated))
    assert(Multimodal.decodeWavSamples(truncated).isEmpty)
    assert(Multimodal.audioSamples(truncated).toSeq ==
      truncated.map(b => (b & 0xff).toLong).toSeq)
  }

  test("WAV payloads window real decoded energies in the audio pipeline shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, sum}
    val samples = (0 until 100).map(i => ((i * 37) % 200 - 100).toShort).toArray
    val wav = fixtureWav(samples)
    val ascii = "byte stand-in path".getBytes("UTF-8")
    val rows = Seq((1L, wav), (2L, ascii)).toDS()
      .mapPartitions(_.map { case (id, b) => (id, Multimodal.audioSamples(b)) })
      .toDF("doc_id", "samples")
      .selectExpr("doc_id", "posexplode(samples) AS (i, v)")
      .selectExpr("doc_id", "CAST(i DIV 64 AS INT) AS win", "v")
      .groupBy("doc_id", "win").agg(sum(expr("v * v")).as("energy"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def e(xs: Seq[Long]) = xs.map(v => v * v).sum
    assert(rows((1L, 0)) == e(samples.take(64).map(_.toLong)))
    assert(rows((1L, 1)) == e(samples.drop(64).map(_.toLong)))
    assert(rows((2L, 0)) == e(ascii.map(b => (b & 0xff).toLong)))
  }

  test("real decode runs inside the Spark batch pipeline shape") {
    import spark.implicits._
    val png = fixturePng
    val rows = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDS()
      .mapPartitions(_.map { case (id, body) =>
        (id, Multimodal.decodeImageFeatures(body).sum,
          Multimodal.decodeImage(body).isDefined)
      })
      .collect().sortBy(_._1)
    assert(rows(0) == ((1L, 4L, true)))   // 4 pixels histogrammed
    assert(rows(1)._2 == "not an image".length.toLong && !rows(1)._3)
  }

  test("color stats: real RGB channel sums for images, byte cycling otherwise") {
    // fixture pixels: black, white, red, blue
    // R: 0+255+255+0=510  G: 0+255+0+0=255  B: 0+255+0+255=510, n=4 each
    assert(Multimodal.colorStats(fixturePng) == ((4L, 4L, 4L, 510L, 255L, 510L)))
    val bytes = "abcdefg".getBytes("UTF-8") // 7 bytes → channels 3,2,2
    val (nr, ng, nb, sr, sg, sb) = Multimodal.colorStats(bytes)
    assert((nr, ng, nb) == ((3L, 2L, 2L)))
    assert(sr == ('a' + 'd' + 'g').toLong && sg == ('b' + 'e').toLong &&
      sb == ('c' + 'f').toLong)
  }

  test("centered samples: real signed PCM for WAV, byte − 96 otherwise") {
    val samples = Array[Short](100, -100, 50, -50, 0, -1)
    assert(Multimodal.centeredSamples(fixtureWav(samples)).toSeq ==
      samples.map(_.toLong).toSeq) // real path: NOT recentered
    val ascii = "aZ".getBytes("UTF-8") // 'a'=97 → 1, 'Z'=90 → -6
    assert(Multimodal.centeredSamples(ascii).toSeq == Seq(1L, -6L))
  }

  test("ZCR over real WAV samples counts sign changes (0 counts as positive)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, size}
    // 100→-100→50→-50→0→-1: five consecutive sign flips (0 is positive)
    val samples = Array[Short](100, -100, 50, -50, 0, -1)
    val row = Seq((1L, fixtureWav(samples))).toDS()
      .mapPartitions(_.map { case (id, b) =>
        (id, Multimodal.centeredSamples(b))
      })
      .toDF("doc_id", "sm")
      .select(col("doc_id"), size(col("sm")).as("n"),
        expr("""size(filter(zip_with(
                  slice(sm, 1, size(sm) - 1), slice(sm, 2, size(sm) - 1),
                  (a, b) -> (a >= 0) != (b >= 0)), x -> x))""").as("n_cross"),
        expr("aggregate(sm, CAST(0 AS BIGINT), (acc, x) -> acc + abs(x))")
          .as("sum_abs"),
        expr("array_max(transform(sm, x -> abs(x)))").as("peak"))
      .collect()(0)
    assert(row.getInt(1) == 6 && row.getInt(2) == 5)
    assert(row.getLong(3) == 301L && row.getLong(4) == 100L)
  }

  test("m_aspect_buckets: real PNG decodes land in their exact" +
      " quarter-ratio buckets; extreme ratios clamp; same-bucket docs" +
      " aggregate exactly") {
    graft.GraftSession.init(spark)
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] =
      Multimodal.encodePng(new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB))
    val clips = Seq(
      1L -> png(512, 512),  // qr = 4608 div 1024 = 4 (square)
      2L -> png(500, 500),  // same bucket 4: exercises the rollup
      3L -> png(1024, 512), // 8704 div 1024 = 8 (2:1 wide)
      4L -> png(512, 1024), // 5120 div 2048 = 2 (1:2 tall)
      5L -> png(768, 512),  // 6656 div 1024 = 6 (3:2)
      6L -> png(1, 16),     // 24 div 32 = 0 -> clamps to 1
      7L -> png(160, 2))    // 1282 div 4 = 320 -> clamps to 16
    val got = MultimodalOps.aspectBucketsFrom(
        MultimodalOps.dimRowsFrom(clips.toDF("doc_id", "body"))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set(1L, 2L, 4L, 6L, 8L, 16L), got.keySet.toString)
    assert(got(4L) == ((2L, 512144L, 256072.0, 1.0, 1.0)), got(4L).toString)
    assert(got(8L) == ((1L, 524288L, 524288.0, 2.0, 2.0)), got(8L).toString)
    assert(got(2L) == ((1L, 524288L, 524288.0, 0.5, 0.5)), got(2L).toString)
    assert(got(6L) == ((1L, 393216L, 393216.0, 1.5, 1.5)), got(6L).toString)
    assert(got(1L) == ((1L, 16L, 16.0, 0.0625, 0.0625)), got(1L).toString)
    assert(got(16L) == ((1L, 320L, 320.0, 80.0, 80.0)), got(16L).toString)
  }
}
