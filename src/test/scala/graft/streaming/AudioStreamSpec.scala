package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Multimodal, MultimodalOps}

/** The streaming audio-fingerprint arm (r14 verdict ask #6):
  *
  *   - the doc-local landmark core ([[Multimodal.landmarkFps]] over
  *     [[Multimodal.windowEnergies]]) is value-equal to the batch arm's
  *     relational marks pass ([[MultimodalOps.audioMarksFrom]]) — pinned
  *     on adversarial fixtures AND a real gate-corpus slice, so the two
  *     definitions cannot drift;
  *   - [[StreamOps.audioPairStream]]'s summed deltas reproduce batch
  *     [[MultimodalOps.audioFprintFrom]] exactly across micro-batches,
  *     including TWO landmarks crossing the df cap mid-stream (the
  *     retraction wave nets their early credits to zero, just as the
  *     batch cap drops them).
  */
class AudioStreamSpec extends SparkSpec {

  /** A clip as blocks of 64 repeated bytes: block byte b reads window
    * energy 64*b² through the byte stand-in decode — the exact window
    * grain, so peak structure is designed per block. */
  private def clip(blocks: Seq[Int]): Array[Byte] =
    blocks.flatMap(b => Array.fill(64)(b.toByte)).toArray

  /** The pure per-clip arm, body → distinct fps. */
  private def pureFps(body: Array[Byte]): Set[Long] =
    Multimodal.landmarkFps(
      Multimodal.windowEnergies(Multimodal.audioSamples(body))).toSet

  /** The relational batch arm, clips → (doc_id, fp) set. */
  private def relationalMarks(clips: Seq[(Long, Array[Byte])]): Set[(Long, Long)] = {
    import spark.implicits._
    MultimodalOps.audioMarksFrom(
        MultimodalOps.audioWindowRowsFrom(clips.toDF("doc_id", "body")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("landmark cores agree: pure per-clip == relational marks on" +
      " adversarial fixtures (plateaus, edges, ramps, partial windows," +
      " empty)") {
    graft.GraftSession.init(spark)
    val fixtures: Seq[(Long, Array[Byte])] = Seq(
      1L -> clip(Seq(1, 20, 2, 40, 3, 5, 80, 6, 160, 7)), // the spec corpus shape
      2L -> clip(Seq(5, 5, 5, 5)),                        // full plateau: one peak, no pair
      3L -> clip(Seq(1, 9, 9, 9, 2, 7, 7, 3)),            // interior plateaus (first-window tiebreak)
      4L -> clip(Seq(1, 2, 3, 4, 5)),                     // monotone ramp: edge peak only
      5L -> clip(Seq(5, 4, 3, 2, 1)),                     // monotone fall: first-window peak
      6L -> Array.empty[Byte],                            // zero samples: no windows
      7L -> clip(Seq(42)),                                // single window: lone peak, no pair
      8L -> Array.fill(65)(3.toByte),                     // partial tail window (65 = 64 + 1)
      9L -> Array.fill(200)(0.toByte),                    // energy-0 windows (band 0 path)
      10L -> clip(Seq(0, 10, 0, 10, 0, 10, 0)))           // alternating comb
    val rel = relationalMarks(fixtures)
    val pure = fixtures.flatMap { case (id, body) =>
      pureFps(body).map(fp => (id, fp))
    }.toSet
    assert(rel == pure,
      s"relational ${rel.toSeq.sorted} != pure ${pure.toSeq.sorted}")
    // non-vacuous: the comb fixture must actually mint landmarks
    assert(pure.exists(_._1 == 10L), "comb fixture minted no landmarks")
  }

  test("landmark cores agree on a real gate-corpus slice (sf0.001" +
      " documents — the batch query's own input)") {
    graft.GraftSession.init(spark)
    val clips = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text").cast("binary").as("body"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
    assert(clips.nonEmpty, "corpus slice is empty — the pin is vacuous")
    val rel = relationalMarks(clips)
    val pure = clips.flatMap { case (id, body) =>
      pureFps(body).map(fp => (id, fp))
    }.toSet
    assert(rel == pure, s"arms drift on the real corpus: " +
      s"rel-only ${(rel -- pure).take(5)}, pure-only ${(pure -- rel).take(5)}")
  }

  test("audioPairStream: summed deltas == batch audioFprint across" +
      " micro-batches, two cap saturations mid-stream included") {
    graft.GraftSession.init(spark)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // every clip shares the intro landmark (df=5 > cap 3 → saturates when
    // doc 4 arrives) and — by band collision on the junction pair — a
    // second hot landmark (df>=4 → also saturates); docs 1-2 and 3-4 each
    // keep ONE cold interior suffix landmark that must survive with
    // n_shared = 1; doc 5's suffix is solo
    val intro = Seq(1, 20, 2, 40, 3)
    val docs = Map(
      1L -> clip(intro ++ Seq(5, 80, 6, 160, 7)),
      2L -> clip(intro ++ Seq(5, 80, 6, 160, 7)),
      3L -> clip(intro ++ Seq(5, 90, 6, 200, 7)),
      4L -> clip(intro ++ Seq(5, 90, 6, 200, 7)),
      5L -> clip(intro ++ Seq(5, 90, 6, 90, 7)))
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.audioPairStream(
        in.toDF().toDF("doc_id", "body"), maxDf = 3)
      .writeStream.format("memory").queryName("audiopairs")
      .outputMode("append").start()
    // batch 1: docs 1,2 → +1 on every shared landmark; batch 2: doc 3
    // fills the hot keys to the cap; batch 3: doc 4 crosses it (both
    // retraction waves fire), doc 5 arrives after saturation (ignored on
    // the hot keys, solo on its own)
    in.addData((1L, docs(1L)), (2L, docs(2L)))
    q.processAllAvailable()
    in.addData((3L, docs(3L)))
    q.processAllAvailable()
    in.addData((4L, docs(4L)), (5L, docs(5L)))
    q.processAllAvailable()
    val deltas = spark.table("audiopairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    q.stop()
    assert(deltas.count(_._3 == -1L) >= 6,
      s"both retraction waves must fire (got ${deltas.mkString(", ")})")
    val merged = deltas.groupBy(d => (d._1, d._2))
      .map { case ((a, b), ds) => (a, b, ds.map(_._3).sum) }
      .filter(_._3 != 0L).toSet
    // batch truth over the SAME clips through the SAME decode+cap
    val batch = MultimodalOps.audioFprintFrom(
        MultimodalOps.audioWindowRowsFrom(
          docs.toSeq.toDF("doc_id", "body")), maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == batch,
      s"stream-merged ${merged.toSeq.sorted} != batch ${batch.toSeq.sorted}")
    // and the cold suffixes did survive — the equality is non-vacuous
    assert(batch == Set((1L, 2L, 1L), (3L, 4L, 1L)), batch.toString)
  }

  test("audioPairStreamTtl: expiry loses ONLY cross-horizon pairs; the" +
      " epoch-2 hot landmark retracts inside the TTL arm") {
    graft.GraftSession.init(spark)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // suffix devices (each mints ONE interior landmark):
    //   sufX shared by epoch-1 docs 1,2 and epoch-2 doc 3 — global df 3
    //   (cold): batch keeps (1,2),(1,3),(2,3); the stream must lose
    //   exactly the cross-horizon (1,3),(2,3);
    //   sufE (and the E->H junction) shared by docs 3,4 within epoch 2;
    //   sufH shared by docs 3,4,5,6 — df 4 > cap 3 fires the retraction
    //   wave INSIDE the TTL arm (batch caps it away identically)
    val sufX = Seq(5, 80, 6, 160, 7)
    val sufE = Seq(5, 90, 6, 200, 7)
    val sufH = Seq(5, 40, 6, 120, 7)
    val epoch1 = Seq(1L -> clip(sufX), 2L -> clip(sufX))
    val epoch2 = Seq(
      3L -> clip(sufX ++ sufE ++ sufH),
      4L -> clip(sufE ++ sufH),
      5L -> clip(sufH ++ Seq(3, 30, 4)),
      6L -> clip(sufH ++ Seq(3, 50, 4)))
    val in = MemoryStream[(Long, Array[Byte])]
    // started through the production path: fingerprint-domain state is
    // data-sized -> RocksDB (the pairDeltaStreamTtl discipline)
    val q = StreamOps.startDataSized(spark) {
      StreamOps.audioPairStreamTtl(
          in.toDF().toDF("doc_id", "body"), ttlMs = 400L, maxDf = 3)
        .writeStream.format("memory").queryName("audiottl")
        .outputMode("append").start()
    }
    // processAllAvailable() hangs under ProcessingTimeTimeout (the
    // engine keeps running no-data batches to fire timers) — poll the
    // sink for the hand-traced row count instead
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 120L * 1000L * 1000 * 1000
      while (spark.table("audiottl").count() < n) {
        assert(System.nanoTime() < deadline,
          s"timed out at ${spark.table("audiottl").count()}/$n delta rows")
        Thread.sleep(100)
      }
      Thread.sleep(500) // and NO extra rows trickle in after the target
      assert(spark.table("audiottl").count() == n, "unexpected extra deltas")
    }
    in.addData(epoch1)
    awaitRows(1)       // (1,2) via sufX
    Thread.sleep(1500) // > ttl: epoch boundary — sufX state goes stale
    in.addData(epoch2)
    // sufE +1, E->H junction +1, sufH: 3 credits then the 3-pair wave
    awaitRows(1 + 8)
    val deltas = spark.table("audiottl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    q.stop()
    assert(deltas.count(_._3 == -1L) == 3, deltas.mkString(", "))
    val merged = deltas.groupBy(d => (d._1, d._2))
      .map { case ((a, b), ds) => (a, b, ds.map(_._3).sum) }
      .filter(_._3 != 0L).toSet
    // full batch truth over all six clips through the same decode+cap
    val all = epoch1 ++ epoch2
    val batch = MultimodalOps.audioFprintFrom(
        MultimodalOps.audioWindowRowsFrom(all.toDF("doc_id", "body")),
        maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val epoch1Ids = epoch1.map(_._1).toSet
    val (cross, within) = batch.partition(p =>
      epoch1Ids.contains(p._1) != epoch1Ids.contains(p._2))
    assert(cross.nonEmpty && within.nonEmpty, "fixture degenerate")
    // the contract, exactly: the stream lost the cross-horizon pairs
    // and NOTHING else — a batch backfill of `cross` restores parity
    assert(merged == within,
      s"stream ${merged.toSeq.sorted} != within-horizon ${within.toSeq.sorted}")
    assert((merged ++ cross) == batch, "stream + backfill != full batch")
  }
}
