package graft.streaming

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamOpsSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("tumblingCounts aggregates per window and type with a watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String, Double)]
    val events = in.toDF().toDF("ts_us", "event_type", "value")
      .select(expr("timestamp_micros(ts_us)").as("ts"), col("event_type"), col("value"))
    val q = StreamOps.tumblingCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    val h = 3600L * 1000000L
    in.addData((0L, "a", 1.0), (h / 2, "a", 2.0), (h + 1, "b", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    in.addData((10 * h, "a", 0.0))
    q.processAllAvailable()
    val rows = spark.table("tumbling").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    q.stop()
    assert(rows.contains((0L, "a", 2L, 3.0)))
    assert(rows.contains((3600L * 1000L, "b", 1L, 3.0)))
  }

  test("freshnessStream: state merges across micro-batches == batch core; " +
      "report reads the state") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val events = in.toDF().toDF("ts_us", "event_type")
      .select(expr("timestamp_micros(ts_us)").as("ts"), col("event_type"))
    val q = StreamOps.freshnessStream(events)
      .writeStream.format("memory").queryName("fresh")
      .outputMode("complete").start()
    val m = 60L * 1000000L
    // batch 1: a twice (head at 10m), b once (at 5m)
    in.addData((5 * m, "a"), (10 * m, "a"), (5 * m, "b"))
    q.processAllAvailable()
    // batch 2: a again LATER (count must add, max must advance), b older
    // event arriving late (max must NOT regress), c appears a day behind
    in.addData((2000 * m, "a"), (1 * m, "b"), (2 * m, "c"))
    q.processAllAvailable()
    val state = spark.table("fresh")
    val got = state.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // == one batch pass over all 6 rows
    assert(got == Set(("a", 3L, 2000 * m), ("b", 2L, 5 * m), ("c", 1L, 2 * m)),
      got.toString)
    // the downstream monitor read: head-lag verdicts over the state table
    val rep = graft.ops.ValidationOps.freshnessReport(state)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
    q.stop()
    assert(rep.toSet == Set(("a", 0L, false), ("b", 1995L, true),
      ("c", 1998L, true)), rep.mkString(", "))
  }

  test("dailyCountStream: stream-merged ledger == batch ledger across " +
      "micro-batches, including a day-boundary-straddling batch and the " +
      "null-day group") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    // sentinel ts_us < 0 → null timestamp (the corrupt-feed arm the
    // batch ledger keeps as its null-day group)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(when(col("ts_us") >= 0, expr("timestamp_micros(ts_us)"))
        .as("ts"), col("event_type"))
    val q = StreamOps.dailyCountStream(shape(in.toDF().toDF("ts_us", "event_type")))
      .writeStream.format("memory").queryName("daily_ledger")
      .outputMode("complete").start()
    val h = 3600L * 1000000L // one hour in micros; day 0 = 1970-01-01
    val b1 = Seq((10 * h, "a"), (11 * h, "a"), (23 * h, "b"))
    // batch 2 STRADDLES midnight: a late day-0 row and early day-1 rows
    // land in ONE micro-batch, plus a null-ts row
    val b2 = Seq((23 * h + 1800L * 1000000L, "a"), (24 * h + 1800L * 1000000L, "a"),
      (24 * h + 600L * 1000000L, "b"), (-1L, "c"))
    in.addData(b1)
    q.processAllAvailable()
    in.addData(b2)
    q.processAllAvailable()
    val got = spark.table("daily_ledger").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDate(1).toString, r.getLong(2)))
      .toSet
    q.stop()
    // the contract: == ONE batch pass over all rows through the SAME core
    val want = graft.ops.EventOps.dailyCountsFrom(
        shape((b1 ++ b2).toDF("ts_us", "event_type"))).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDate(1).toString, r.getLong(2)))
      .toSet
    assert(got == want, s"stream $got != batch $want")
    // and the fixture exercises what it claims: a straddled day pair
    // for both a and b, and the null-day group
    assert(want == Set(("a", "1970-01-01", 3L), ("a", "1970-01-02", 1L),
      ("b", "1970-01-01", 1L), ("b", "1970-01-02", 1L), ("c", null, 1L)),
      want.toString)
  }

  test("dailyCountStream: a downstream consumer (e_did) over the live " +
      "state table equals the batch query over the same rows") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val events = in.toDF().toDF("ts_us", "event_type")
      .select(expr("timestamp_micros(ts_us)").as("ts"), col("event_type"))
    val q = StreamOps.dailyCountStream(events)
      .writeStream.format("memory").queryName("did_ledger")
      .outputMode("complete").start()
    val day = 86400L * 1000000L
    // t lifts 1/day -> 4/day at the midpoint; c stays flat 2/day —
    // delivered across two micro-batches that split mid-period
    val rows = Seq(0L -> "t", day -> "t") ++
      Seq.fill(4)(2 * day -> "t") ++ Seq.fill(4)(3 * day -> "t") ++
      (0 until 4).flatMap(d => Seq.fill(2)(d * day -> "c"))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    in.addData(b1)
    q.processAllAvailable()
    in.addData(b2)
    q.processAllAvailable()
    val fromStream = graft.ops.EventOps.didFromDaily(spark.table("did_ledger"))
      .collect().map(_.toSeq).toSeq
    q.stop()
    val fromBatch = graft.ops.EventOps.didFromDaily(
        graft.ops.EventOps.dailyCountsFrom(
          rows.toDF("ts_us", "event_type")
            .select(expr("timestamp_micros(ts_us)").as("ts"),
              col("event_type"))))
      .collect().map(_.toSeq).toSeq
    assert(fromStream == fromBatch, s"$fromStream != $fromBatch")
    // and the fixture reads the hand-computed DiD (the R14InvariantSpec
    // scenario, now served off the LIVE ledger)
    assert(fromStream.map(r => (r(0), r(5))).toSet ==
      Set(("t", 3.0), ("c", -3.0)), fromStream.toString)
  }

  test("histogramSketchStream merges micro-batches into the batch histogram") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Double)]
    val events = in.toDF().toDF("event_type", "value")
    val q = StreamOps.histogramSketchStream(events)
      .writeStream.format("memory").queryName("hist")
      .outputMode("complete").start()
    in.addData(("a", 1.0), ("a", 3.0), ("b", 600.0))
    q.processAllAvailable()
    in.addData(("a", 3.5), ("b", 2.0))
    q.processAllAvailable()
    val rows = spark.table("hist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    // merged across both micro-batches == one batch pass over all 5 rows;
    // 600 caps into the overflow bin 255
    assert(rows == Set(("a", 0L, 1L), ("a", 1L, 2L),
      ("b", 1L, 1L), ("b", 255L, 1L)))
  }

  test("cmsCellStream merges micro-batches into the batch CMS grid on real docs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.ops.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.cmsCellStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      in.addData(b1.toSeq)
      q.processAllAvailable()
      in.addData(b2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cms_cells").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // the monoid proof: stream-merged grid == one batch pass over all docs
    val batch = graft.ops.TextOps.cmsCells(
      graft.ops.Tables.documents(spark, sf)
        .select(explode(split(col("text"), " ")).as("tok"))).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("enrichStream decorates a fact stream from a broadcast static dim") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Double)]
    val facts = in.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val q = StreamOps.enrichStream(facts, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    in.addData((1L, 10.0), (3L, 5.0))
    q.processAllAvailable()
    val rows = spark.table("enriched").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
      .sortBy(_._1)
    q.stop()
    // unknown key 3 survives with a NULL decoration (left join), and the
    // dim row for 2 contributes nothing — fact-driven, not dim-driven
    assert(rows.toSeq == Seq((1L, 10.0, Some("gold")), (3L, 5.0, None)))
  }

  test("sessionize emits a closed session when a new one starts after the gap") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(in.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    val min = 60L * 1000000L
    in.addData(
      StreamOps.Event(1L, 0L, "x", 1.0),
      StreamOps.Event(1L, 10 * min, "x", 1.0))
    q.processAllAvailable()
    // 40 min later -> previous session closes, new one opens
    in.addData(StreamOps.Event(1L, 50 * min, "x", 1.0))
    q.processAllAvailable()
    val rows = spark.table("sessions").as[StreamOps.SessionOut].collect()
    q.stop()
    assert(rows.toSeq == Seq(StreamOps.SessionOut(1L, 0L, 10 * min, 2L)))
  }

  test("sessionWindowStream: native session windows merge to the batch operator") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Long)] // (user_id, ts_us)
    val events = in.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), expr("timestamp_micros(ts_us)").as("ts"))
    val q = StreamOps.sessionWindowStream(events)
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("append").start()
    val m = 60L * 1000000L
    // user 1: two sessions (40-min gap); user 2: ONE session extended
    // ACROSS micro-batches — the engine-side state-merge case the
    // flatMapGroupsWithState spec can't show
    val b1 = Seq((1L, 0L), (1L, 10 * m), (2L, 5 * m))
    val b2 = Seq((2L, 25 * m), (1L, 120 * m))
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    in.addData((9L, 100000 * m)) // advance the watermark: close users 1, 2
    q.processAllAvailable()
    val got = spark.table("sess_win").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    q.stop()
    // the batch twin: the SAME operator over the same closed-user rows
    val want = (b1 ++ b2).toDF("user_id", "ts_us")
      .select(col("user_id"), expr("timestamp_micros(ts_us)").as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start"), col("sw.end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(want.nonEmpty && got == want,
      s"stream $got != batch $want")
    // the cross-batch extension really merged: user 2 is ONE session of 2
    assert(got.count(_._1 == 2L) == 1 && got.find(_._1 == 2L).get._4 == 2L)
  }

  test("attributionStream credits purchases to the last prior touch across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamOps.Event]
    val q = StreamOps.attributionStream(in.toDS())
      .writeStream.format("memory").queryName("touches")
      .outputMode("append").start()
    // batch 1: purchase before any touch -> 'none'; then view -> purchase
    in.addData(
      StreamOps.Event(1L, 10L, "purchase", 5.0),
      StreamOps.Event(1L, 20L, "view", 0.0),
      StreamOps.Event(1L, 30L, "purchase", 7.0))
    q.processAllAvailable()
    // batch 2: state persisted — the view still gets credit; then a click
    // supersedes it; same-instant touch beats the purchase (ts tie)
    in.addData(
      StreamOps.Event(1L, 40L, "purchase", 9.0),
      StreamOps.Event(1L, 50L, "click", 0.0),
      StreamOps.Event(1L, 50L, "purchase", 11.0))
    q.processAllAvailable()
    val rows = spark.table("touches").as[StreamOps.TouchOut].collect()
      .sortBy(_.purchaseTsMicros)
    q.stop()
    assert(rows.toSeq == Seq(
      StreamOps.TouchOut(1L, 10L, "none", 5.0),
      StreamOps.TouchOut(1L, 30L, "view", 7.0),
      StreamOps.TouchOut(1L, 40L, "view", 9.0),
      StreamOps.TouchOut(1L, 50L, "click", 11.0)))
  }

  test("attributionStream(lookback): stale touches expire across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val day = 86400L * 1000000L
    val in = MemoryStream[StreamOps.Event]
    val q = StreamOps.attributionStream(in.toDS(), lookbackDays = Some(7))
      .writeStream.format("memory").queryName("touches_wnd")
      .outputMode("append").start()
    // batch 1: click day 0, purchase day 1 -> credited
    in.addData(
      StreamOps.Event(1L, 0L, "click", 0.0),
      StreamOps.Event(1L, 1 * day, "purchase", 10.0))
    q.processAllAvailable()
    // batch 2: the SAME persisted touch is now 10 days old -> expired
    // (the batch e_attr_window CASE, applied to cross-batch state);
    // exactly-7-days still credits
    in.addData(
      StreamOps.Event(1L, 10 * day, "purchase", 20.0),
      StreamOps.Event(2L, 0L, "view", 0.0),
      StreamOps.Event(2L, 7 * day, "purchase", 40.0))
    q.processAllAvailable()
    val rows = spark.table("touches_wnd").as[StreamOps.TouchOut].collect()
      .sortBy(r => (r.userId, r.purchaseTsMicros))
    q.stop()
    assert(rows.toSeq == Seq(
      StreamOps.TouchOut(1L, 1 * day, "click", 10.0),
      StreamOps.TouchOut(1L, 10 * day, "expired", 20.0),
      StreamOps.TouchOut(2L, 7 * day, "view", 40.0)))
  }

  test("sessionize(idleTimeout) flushes an idle session without a successor event") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamOps.Event]
    // 500 ms processing-time timeout: the idle session must flush on the
    // engine's own re-triggering, with NO further input arriving
    val q = StreamOps.sessionize(in.toDS(), gapMinutes = 30,
        idleTimeout = true, idleFlushAfterMs = 500L)
      .writeStream.format("memory").queryName("idle_sessions")
      .outputMode("append").start()
    val min = 60L * 1000000L
    in.addData(
      StreamOps.Event(7L, 0L, "x", 1.0),
      StreamOps.Event(7L, 5 * min, "x", 1.0))
    // NO processAllAvailable(): with ProcessingTimeTimeout the engine
    // keeps triggering while a timeout is registered, so that call never
    // returns (verified by thread dump). Poll the sink instead — output
    // can only appear via the timeout flush, since no successor event is
    // ever added for this user.
    val deadline = System.currentTimeMillis() + 30000
    var rows = Seq.empty[StreamOps.SessionOut]
    while (rows.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      rows = spark.table("idle_sessions").as[StreamOps.SessionOut].collect().toSeq
    }
    q.stop()
    assert(rows == Seq(StreamOps.SessionOut(7L, 0L, 5 * min, 2L)),
      s"idle session not flushed by timeout, got $rows")
  }

  // NB: event times must sit ABOVE the initial watermark (epoch 0) — a row
  // stamped exactly 1970-01-01T00:00:00 is dropped as late before any
  // stateful op sees it. All streaming tests offset by a day.
  private val dayUs = 86400L * 1000000L

  test("dedupStream keeps first arrival per content hash within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Long, String)]
    val docs = in.toDF().toDF("doc_id", "ts_us", "text")
      .select(col("doc_id"), expr("timestamp_micros(ts_us)").as("ts"), col("text"))
    val q = StreamOps.dedupStream(docs, "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    val min = 60L * 1000000L
    in.addData((1L, dayUs, "same"))
    q.processAllAvailable()
    // second batch: arrival order is now defined — doc 2 is the duplicate
    in.addData((2L, dayUs + min, "same"), (3L, dayUs + 2 * min, "other"))
    q.processAllAvailable()
    val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 3L))
  }

  test("intervalJoinStream pairs clicks with views in the preceding interval") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val min = 60L * 1000000L
    val vIn = MemoryStream[(Long, Long, String)]
    val cIn = MemoryStream[(Long, Long, String)]
    def df(m: MemoryStream[(Long, Long, String)]) = m.toDF()
      .toDF("user_id", "ts_us", "item")
      .select(col("user_id"), expr("timestamp_micros(ts_us)").as("ts"), col("item"))
    val q = StreamOps.intervalJoinStream(df(vIn), df(cIn), "1 hour", 10)
      .writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    vIn.addData((1L, dayUs, "itemA"), (1L, dayUs + 30 * min, "itemB"),
      (2L, dayUs, "itemC"))
    cIn.addData((1L, dayUs + 5 * min, "itemA"), // 5 min after view A → joins
      (1L, dayUs + 45 * min, "itemA"))          // 15 min after view B → no match
    q.processAllAvailable()
    val rows = spark.table("ivj").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(4))).toSeq
    q.stop()
    assert(rows == Seq((1L, "itemA", "itemA")))
  }

  test("outer interval join emits unmatched views with nulls after the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val min = 60L * 1000000L
    val vIn = MemoryStream[(Long, Long, String)]
    val cIn = MemoryStream[(Long, Long, String)]
    def df(m: MemoryStream[(Long, Long, String)]) = m.toDF()
      .toDF("user_id", "ts_us", "item")
      .select(col("user_id"), expr("timestamp_micros(ts_us)").as("ts"), col("item"))
    val q = StreamOps.intervalJoinOuterStream(df(vIn), df(cIn), "1 hour", 10)
      .writeStream.format("memory").queryName("ivjo")
      .outputMode("append").start()
    try {
      vIn.addData((1L, dayUs, "itemA"), (2L, dayUs, "itemC"))
      cIn.addData((1L, dayUs + 5 * min, "itemA")) // within 10 min → joins
      q.processAllAvailable()
      // advance BOTH watermarks far past the interval + horizon so the
      // store must give up on user 2's view and emit it null-padded
      vIn.addData((9L, dayUs + 600 * min, "later"))
      cIn.addData((9L, dayUs + 600 * min, "later"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ivjo").collect()
      .map(r => (r.getLong(0), r.getString(2), Option(r.getString(4))))
      .toSet
    assert(rows.contains((1L, "itemA", Some("itemA"))), s"matched row missing: $rows")
    assert(rows.contains((2L, "itemC", None)), s"null-padded row missing: $rows")
  }

  test("watermarked tumbling counts agree with the batch dual on real events") {
    // batch/stream timestamp-semantics parity over the ADAPTIVE events
    // loader (Tables.events): both sides consume the exact same ts values,
    // so a loader change that shifted timestamp interpretation (the r7
    // nanos→NTZ regeneration) would break this parity, not just batch.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val batch = graft.ops.EventOps.qTumbling(spark, sf)
      .select(expr("unix_micros(hour_start)"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val evs = graft.ops.Tables.events(spark, sf)
      .select(expr("unix_micros(ts)"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val in = MemoryStream[(Long, String, Double)]
    val events = in.toDF().toDF("ts_us", "event_type", "value")
      .select(expr("timestamp_micros(ts_us)").as("ts"),
        col("event_type"), col("value"))
    val q = StreamOps.tumblingCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling_parity")
      .outputMode("append").start()
    try {
      in.addData(evs.toSeq)
      q.processAllAvailable()
      // a far-future sentinel advances the watermark past every real
      // window so append mode emits them all; its own window stays open
      in.addData((evs.map(_._1).max + 365L * 86400 * 1000000, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("tumbling_parity").collect()
      .map(r => (r.getTimestamp(0).getTime * 1000, r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("streaming sessionize agrees with the batch sessionize on real events") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // batch truth: (user, start_us, end_us, n) from the window-based query
    val batch = graft.ops.EventOps.qSessionize(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(session_start)"), expr("unix_micros(session_end)"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // feed the same events through the stateful streaming op; append-mode
    // sessions only emit when the user's next session opens, so a far-future
    // sentinel per user closes every real session
    val evs = graft.ops.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_type"), col("value"))
      .collect().map(r => StreamOps.Event(r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val farFuture = evs.map(_.tsMicros).max + 365L * 86400 * 1000000
    val sentinels = evs.map(_.userId).distinct
      .map(u => StreamOps.Event(u, farFuture, "sentinel", 0.0))
    val in = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(in.toDS()).writeStream
      .format("memory").queryName("sess_parity").outputMode("append").start()
    try {
      in.addData(evs.toSeq)
      q.processAllAvailable()
      in.addData(sentinels.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._2 < farFuture).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("manifestIngestStream dedups across micro-batches via the durable manifest") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpus = tmp("graft_corpus") + "/docs"
    val manifest = tmp("graft_manifest") + "/hashes"
    val ckpt = tmp("graft_mi_ckpt")
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamOps.manifestIngestStream(spark, docs, corpus, manifest, ckpt)
    try {
      // batch 1: one in-batch duplicate pair
      in.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate of "alpha" + one genuinely new doc
      in.addData((4L, "alpha"), (5L, "gamma"))
      q.processAllAvailable()
    } finally q.stop()
    val texts = spark.read.parquet(corpus).select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("alpha", "beta", "gamma"),
      s"corpus not deduped across batches: $texts")
    assert(spark.read.parquet(manifest).distinct().count() == 3)
  }

  test("manifest ingest batch retry is idempotent (batchId-scoped overwrite)") {
    import spark.implicits._
    val corpus = tmp("graft_corpus_r") + "/docs"
    val manifest = tmp("graft_manifest_r") + "/hashes"
    // a non-streaming call without an explicit runId must refuse loudly —
    // a shared default id would let unrelated backfills clobber each other
    intercept[IllegalArgumentException] {
      StreamOps.ingestBatch(spark,
        Seq((1L, "alpha")).toDF("doc_id", "text"), 0L, corpus, manifest)
    }
    val run = Some("backfill-1")
    // batch 0 lands fully
    StreamOps.ingestBatch(spark,
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"), 0L, corpus,
      manifest, run)
    // batch 1 "fails between the two writes" … and is retried whole: run
    // it twice under the SAME (runId, batchId) — the second run must
    // overwrite, not duplicate, and must not anti-join itself away either
    val b1 = Seq((3L, "gamma"), (4L, "alpha")).toDF("doc_id", "text")
    StreamOps.ingestBatch(spark, b1, 1L, corpus, manifest, run)
    StreamOps.ingestBatch(spark, b1, 1L, corpus, manifest, run)
    val texts = spark.read.parquet(corpus).select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("alpha", "beta", "gamma"),
      s"retry duplicated or dropped rows: $texts")
    assert(spark.read.parquet(manifest).select("content_hash").distinct().count() == 3)
    // a FRESH checkpoint restarts batch ids at 0 under a new query id —
    // its batch 0 must land beside, not on top of, the old run's batch 0
    val sc = spark.sparkContext
    sc.setLocalProperty("sql.streaming.queryId", "fresh-ckpt")
    try StreamOps.ingestBatch(spark,
      Seq((9L, "delta"), (10L, "alpha")).toDF("doc_id", "text"),
      0L, corpus, manifest) // streaming queryId present → no runId needed
    finally sc.setLocalProperty("sql.streaming.queryId", null)
    val after = spark.read.parquet(corpus).select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(after == Seq("alpha", "beta", "delta", "gamma"),
      s"fresh-checkpoint batch 0 clobbered or re-ingested: $after")
  }

  test("gated ingest stream drops gate-failing documents before the manifest") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val corpus = tmp("graft_corpus_g") + "/docs"
    val manifest = tmp("graft_manifest_g") + "/hashes"
    val ckpt = tmp("graft_gate_ckpt")
    // passes every rule: 40 tokens, mean token length 175/40 ∈ [4, 5],
    // all distinct, two stopwords, no heavy repetition
    val good = ((1 to 20).map(i => f"wd$i%02d") ++
      (1 to 18).map(i => f"wde$i%02d") ++ Seq("the", "of")).mkString(" ")
    val bad = "tiny doc" // fails the length rule (and others)
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamOps.gatedIngestStream(spark, docs, corpus, manifest, ckpt)
    try {
      in.addData((1L, good), (2L, bad))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(landed == Seq(1L), s"gate let through: $landed")
    assert(spark.read.parquet(manifest).count() == 1)
  }

  test("nb-scored ingest keeps exactly the batch classifier's keep set") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // train once (batch), serve the same corpus as a stream: the landed
    // set must equal the batch query's nb_keep set — the train/serve
    // parity proof (every stream token is in the training vocabulary, so
    // the OOV-drop rule cannot diverge the two paths here)
    val model = graft.ops.CorpusOps.nbModel(spark, sfDir).localCheckpoint()
    val batchKeep = graft.ops.CorpusOps.nbQuality(spark, sfDir)
      .filter(col("nb_keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val docsIn = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val corpus = tmp("graft_corpus_nb") + "/docs"
    val manifest = tmp("graft_manifest_nb") + "/hashes"
    val ckpt = tmp("graft_nb_ckpt")
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamOps.nbScoredIngestStream(spark, docs, model, corpus,
      manifest, ckpt)
    try {
      in.addData(docsIn: _*)
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed == batchKeep,
      s"stream kept ${landed.size} docs, batch classifier keeps " +
        s"${batchKeep.size}; diff=${(landed diff batchKeep) ++ (batchKeep diff landed)}")
    assert(batchKeep.nonEmpty, "vacuous parity: classifier kept nothing")
  }

  test("cell-occupancy monitor matches the batch balance report per cell") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val batch = graft.ops.SimilarityOps.cellBalance(spark, sfDir)
      .select("cell", "n_vecs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val in = MemoryStream[(Long, Seq[Float])]
    val emb = in.toDF().toDF("vec_id", "embedding")
    val q = StreamOps.cellOccupancyStream(emb)
      .writeStream.format("memory").queryName("cellocc")
      .outputMode("complete").start()
    try {
      // two batches: occupancy must accumulate across micro-batches
      val (a, b) = vecs.splitAt(vecs.length / 2)
      in.addData(a: _*)
      q.processAllAvailable()
      in.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cellocc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch,
      s"stream occupancy $streamed != batch report $batch")
    assert(batch.values.sum == vecs.length)
  }

  test("hll register stream merges to the batch sketch and its estimates") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val docsIn = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val in = MemoryStream[(String, String)]
    val docs = in.toDF().toDF("lang", "text")
    val q = StreamOps.hllRegisterStream(docs)
      .writeStream.format("memory").queryName("hllreg")
      .outputMode("complete").start()
    try {
      // two batches: max-merge across micro-batches must equal batch
      val (a, b) = docsIn.splitAt(docsIn.length / 2)
      in.addData(a: _*)
      q.processAllAvailable()
      in.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hllreg")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // estimates derived from the streamed registers equal the
    // oracle-checked batch query's (same sorted-bucket harmonic fold)
    val batchEst = graft.ops.DedupOps.hllByLang(spark, sfDir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val byLang = streamed.groupBy(_._1._1)
    assert(byLang.keySet == batchEst.keySet)
    byLang.foreach { case (lang, regs) =>
      val sorted = regs.toSeq.map { case ((_, b), m) => (b, m) }.sortBy(_._1)
      val harm = sorted.foldLeft(0.0) { case (acc, (_, m)) =>
        acc + 1.0 / (1L << m).toDouble
      }
      val est = 0.673 * 256.0 / (harm + (16 - sorted.length).toDouble * 1.0)
      val (nb, be) = batchEst(lang)
      assert(sorted.length == nb, s"$lang: ${sorted.length} buckets != $nb")
      assert(math.abs(est - be) < 1e-12,
        s"$lang: streamed-register estimate $est != batch $be")
    }
  }

  test("user-day hll stream merges to the batch sketch and its estimates") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val evIn = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("ts").cast("timestamp"), col("user_id"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val ev = in.toDF().toDF("ts", "user_id")
    val q = StreamOps.hllUserDayStream(ev)
      .writeStream.format("memory").queryName("hlluserday")
      .outputMode("complete").start()
    try {
      // two batches: max-merge across micro-batches must equal batch
      val (a, b) = evIn.splitAt(evIn.length / 2)
      in.addData(a: _*)
      q.processAllAvailable()
      in.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hlluserday")
      .collect().map(r => ((r.getDate(0).toString, r.getLong(1)), r.getLong(2)))
      .toMap
    // estimates derived from the streamed registers equal the
    // oracle-checked batch query's (same sorted-bucket harmonic fold)
    val batchEst = graft.ops.EventOps.qHllUsersDaily(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, (r.getLong(1), r.getDouble(2))))
      .toMap
    val byDay = streamed.groupBy(_._1._1)
    assert(byDay.keySet == batchEst.keySet)
    byDay.foreach { case (day, regs) =>
      val sorted = regs.toSeq.map { case ((_, b), m) => (b, m) }.sortBy(_._1)
      val harm = sorted.foldLeft(0.0) { case (acc, (_, m)) =>
        acc + 1.0 / (1L << m).toDouble
      }
      val est = 0.673 * 256.0 / (harm + (16 - sorted.length).toDouble * 1.0)
      val (nb, be) = batchEst(day)
      assert(sorted.length == nb, s"$day: ${sorted.length} buckets != $nb")
      assert(math.abs(est - be) < 1e-12,
        s"$day: streamed-register estimate $est != batch $be")
    }
  }

  test("readManifest startup edges: crashed-attempt dir is empty, flat layout rejects") {
    import spark.implicits._
    // 1) manifest dir exists but holds only a crashed first attempt's
    //    _temporary — no committed data files. The ingest must treat it as
    //    "no manifest yet" (schema inference fails → empty view), not die.
    val corpus = tmp("graft_corpus_c") + "/docs"
    val manifest = tmp("graft_manifest_c") + "/hashes"
    assert(new File(s"$manifest/_temporary/0").mkdirs())
    StreamOps.ingestBatch(spark,
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"), 0L, corpus,
      manifest, Some("crash-recovery"))
    assert(spark.read.parquet(corpus).count() == 2,
      "crashed-attempt manifest dir must not block the recovering ingest")
    // 2) a manifest in the old FLAT layout (parquet files directly in the
    //    dir, no query_id=/batch_id= partitions) must be rejected loudly —
    //    mixing layouts breaks partition discovery at first read.
    val flat = tmp("graft_manifest_f") + "/hashes"
    Seq("deadbeef").toDF("content_hash")
      .write.parquet(flat)
    val e = intercept[IllegalStateException] {
      StreamOps.ingestBatch(spark,
        Seq((3L, "gamma")).toDF("doc_id", "text"), 0L,
        tmp("graft_corpus_f") + "/docs", flat, Some("flat-check"))
    }
    assert(e.getMessage.contains("flat"), s"unexpected message: ${e.getMessage}")
  }

  test("pairDeltaStream: summed deltas == batch pairCounts, saturation included") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // maxDf = 3; "alpha beta gamma" is shared by all 5 docs (goes HOT
    // mid-stream and must net to zero via retraction); docs 1-2 and 3-4
    // each share one cold span that must survive with inter = 1
    def txt(i: Int, span: String) = s"alpha beta gamma u$i v$i $span"
    val docs = Map(
      1L -> txt(1, "delta eps zeta"), 2L -> txt(2, "delta eps zeta"),
      3L -> txt(3, "eta theta iota"), 4L -> txt(4, "eta theta iota"),
      5L -> txt(5, "solo five tail"))
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.pairDeltaStream(
        in.toDF().toDF("doc_id", "text"), maxDf = 3)
      .writeStream.format("memory").queryName("pairdelta")
      .outputMode("append").start()
    // batch 1: docs 1,2 → +1 pairs on BOTH shared shingles; batch 2:
    // doc 3 fills the hot shingle to the cap; batch 3: doc 4 crosses it
    // (retraction fires), doc 5 arrives after saturation (ignored)
    in.addData((1L, docs(1L)), (2L, docs(2L)))
    q.processAllAvailable()
    in.addData((3L, docs(3L)))
    q.processAllAvailable()
    in.addData((4L, docs(4L)), (5L, docs(5L)))
    q.processAllAvailable()
    val deltas = spark.table("pairdelta").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    q.stop()
    assert(deltas.exists(_._5 == -1L), "retraction path never fired")
    val merged = deltas
      .groupBy(d => (d._1, d._2, d._3, d._4))
      .map { case (k, ds) => (k._1, k._2, k._3, k._4, ds.map(_._5).sum) }
      .filter(_._5 > 0).toSet
    // batch truth over the same corpus through the same shingle def
    val dir = tmp("graft_pairstream")
    docs.toSeq.toDF("doc_id", "text").repartition(2)
      .write.parquet(s"$dir/documents.parquet")
    val batch = graft.ops.DedupOps.pairCounts(spark, dir, maxDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(merged == batch,
      s"stream-merged ${merged.toSeq.sorted} != batch ${batch.toSeq.sorted}")
    // and the cold spans did survive — the equality above is non-vacuous
    assert(batch.exists(p => p._1 == 1L && p._2 == 2L && p._5 == 1L))
    assert(batch.exists(p => p._1 == 3L && p._2 == 4L && p._5 == 1L))
  }

  test("pairDeltaStream on the RocksDB state store: merge == batch holds") {
    // r10 verdict #5: the production TTL/pair maintenance holds
    // shingle-domain state — executor-heap-hostile at 100 TB under the
    // default HDFS-backed (on-heap) provider. The knob must actually
    // take effect per-query AND preserve the retraction/merge semantics
    // bit-for-bit: same scenario as the default-provider spec above
    // (saturation wave included), run under RocksDB, compared to batch
    // pairCounts, with the engine's own rocksdb metrics proving the
    // provider was really in use.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def txt(i: Int, span: String) = s"alpha beta gamma u$i v$i $span"
    val docs = Map(
      1L -> txt(1, "delta eps zeta"), 2L -> txt(2, "delta eps zeta"),
      3L -> txt(3, "eta theta iota"), 4L -> txt(4, "eta theta iota"),
      5L -> txt(5, "solo five tail"))
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.withStateStoreProvider(
        spark, StreamOps.RocksDbStateStoreProvider) {
      StreamOps.pairDeltaStream(
          in.toDF().toDF("doc_id", "text"), maxDf = 3)
        .writeStream.format("memory").queryName("pairdelta_rocks")
        .outputMode("append").start()
    }
    in.addData((1L, docs(1L)), (2L, docs(2L)))
    q.processAllAvailable()
    in.addData((3L, docs(3L)))
    q.processAllAvailable()
    in.addData((4L, docs(4L)), (5L, docs(5L)))
    q.processAllAvailable()
    // the provider snapshot rides the query, not the (restored) session
    // conf — the state operator's custom metrics are rocksdb-prefixed
    // exactly when RocksDB is the store
    val metrics = q.lastProgress.stateOperators(0).customMetrics
    assert(metrics.keySet().toArray.exists(_.toString.startsWith("rocksdb")),
      s"query did not run on RocksDB; metrics: ${metrics.keySet()}")
    // conf.getOption reports the key's DEFAULT when unset, so "restored"
    // means "no longer RocksDB", not "empty"
    assert(!spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass").contains("RocksDB"),
      "withStateStoreProvider must restore the session conf")
    val deltas = spark.table("pairdelta_rocks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    q.stop()
    assert(deltas.exists(_._5 == -1L), "retraction path never fired")
    val merged = deltas
      .groupBy(d => (d._1, d._2, d._3, d._4))
      .map { case (k, ds) => (k._1, k._2, k._3, k._4, ds.map(_._5).sum) }
      .filter(_._5 > 0).toSet
    val dir = tmp("graft_pairstream_rocks")
    docs.toSeq.toDF("doc_id", "text").repartition(2)
      .write.parquet(s"$dir/documents.parquet")
    val batch = graft.ops.DedupOps.pairCounts(spark, dir, maxDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(merged == batch,
      s"RocksDB stream-merged ${merged.toSeq.sorted} != batch ${batch.toSeq.sorted}")
  }

  test("pairDeltaStreamTtl: expiry loses ONLY cross-horizon pairs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // Two epochs separated by a sleep LONGER than the TTL, so every
    // key's state is stale when epoch 2 arrives (staleness is checked
    // against the state's own last-touch stamp — deterministic given
    // sleep > ttl, independent of when the engine fires timeouts).
    // Shingle layout: every span's documents live in ONE epoch except
    // the deliberate cross-horizon span "ca cb cc" (docs 1,2 | 3), and
    // the epoch-2 hot span "h1 h2 h3" (docs 3,4,5,6 > maxDf 3) fires
    // the retraction wave inside the TTL arm.
    val epoch1 = Seq(
      1L -> "u1a ca cb cc u1b d1 d2 d3 u1c",
      2L -> "u2a ca cb cc u2b d1 d2 d3 u2c")
    val epoch2 = Seq(
      3L -> "u3a ca cb cc u3b e1 e2 e3 u3c h1 h2 h3 u3d",
      4L -> "u4a e1 e2 e3 u4b h1 h2 h3 u4c",
      5L -> "u5a h1 h2 h3 u5b x5 y5 z5",
      6L -> "u6a h1 h2 h3 u6b x6 y6 z6")
    val in = MemoryStream[(Long, String)]
    // started through the PRODUCTION path: data-sized state (the live
    // shingle domain) defaults to RocksDB (r11 verdict ask #7) — the
    // provider assertion below proves the default actually took
    val q = StreamOps.startDataSized(spark) {
      StreamOps.pairDeltaStreamTtl(
          in.toDF().toDF("doc_id", "text"), ttlMs = 400L, maxDf = 3)
        .writeStream.format("memory").queryName("pairttl")
        .outputMode("append").start()
    }
    // processAllAvailable() CANNOT be used under ProcessingTimeTimeout:
    // FlatMapGroupsWithStateExec.shouldRunAnotherBatch is always true
    // there (the engine keeps running no-data batches to fire timers),
    // so the no-new-data signal the call waits on never arrives. Poll
    // the sink for the hand-traced row count instead.
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 120L * 1000L * 1000 * 1000
      while (spark.table("pairttl").count() < n) {
        assert(System.nanoTime() < deadline,
          s"timed out at ${spark.table("pairttl").count()}/$n delta rows")
        Thread.sleep(100)
      }
      Thread.sleep(500) // and NO extra rows trickle in after the target
      assert(spark.table("pairttl").count() == n, "unexpected extra deltas")
    }
    in.addData(epoch1)
    awaitRows(2)       // (1,2) via the ca- and d-spans
    Thread.sleep(1500) // > ttl: epoch boundary
    in.addData(epoch2)
    awaitRows(2 + 7)   // e:+1; h: 3 credits then the 3-pair retraction
    // Provider + state-shape assertions (before stop — progress dies with
    // the query): rocksdb-prefixed custom metrics exist exactly when the
    // query really runs on RocksDB, and the state row count is bounded by
    // the SHINGLE DOMAIN of the corpus (one state row per live shingle
    // key — never per posting or per pair), the bound the provider choice
    // is about.
    val stateOp = q.lastProgress.stateOperators(0)
    assert(stateOp.customMetrics.keySet().toArray
        .exists(_.toString.startsWith("rocksdb")),
      s"TTL stream did not run on RocksDB; metrics: ${stateOp.customMetrics.keySet()}")
    val allShingles = graft.ops.DedupOps.shinglePostings(
        (epoch1 ++ epoch2).toDF("doc_id", "text"))
      .select("sh").distinct().count()
    // lastProgress may be a no-data batch AFTER the timers purged every
    // key (numRowsTotal 0 is the TTL working) — the bound to pin is the
    // HIGH-WATER mark across the run: ever >0, never above the domain
    val hwm = q.recentProgress.flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal).max
    assert(hwm > 0 && hwm <= allShingles,
      s"state-row high-water $hwm outside (0, $allShingles]")
    val deltas = spark.table("pairttl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    q.stop()
    // and the session conf is restored: the default stays HDFS-backed for
    // everything not started through startDataSized
    assert(!spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass").contains("RocksDB"),
      "startDataSized must restore the session default provider")
    assert(deltas.exists(_._5 == -1L), "retraction never fired in the TTL arm")
    val merged = deltas
      .groupBy(d => (d._1, d._2, d._3, d._4))
      .map { case (k, ds) => (k._1, k._2, k._3, k._4, ds.map(_._5).sum) }
      .filter(_._5 > 0).toSet
    // full batch truth over all six docs through the same shingle def
    val dir = tmp("graft_pairttl")
    (epoch1 ++ epoch2).toDF("doc_id", "text").repartition(2)
      .write.parquet(s"$dir/documents.parquet")
    val batch = graft.ops.DedupOps.pairCounts(spark, dir, maxDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val epoch1Ids = epoch1.map(_._1).toSet
    val (cross, within) = batch.partition(p =>
      epoch1Ids.contains(p._1) != epoch1Ids.contains(p._2))
    // the contract, exactly: the stream lost the cross-horizon pairs
    // and NOTHING else — a batch backfill of `cross` restores parity
    assert(cross.nonEmpty && within.nonEmpty, "fixture degenerate")
    assert(merged == within,
      s"stream ${merged.toSeq.sorted} != within-horizon ${within.toSeq.sorted}")
    assert((merged ++ cross) == batch, "stream + backfill != full batch")
  }

  test("streamed pair relation is a drop-in pairCounts for the *From consumers") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // the summed delta relation has pairCounts' exact (a_id, b_id, n_a,
    // n_b, inter) shape — so the whole batch consumer set (jaccardFrom,
    // dedupClustersFrom, ...) runs unchanged on pairs maintained by the
    // STREAM: near-dup clusters over streamed evidence == batch clusters.
    // Two near-identical 12-token pairs (one trailing-token edit →
    // Jaccard 9/11 ≥ 0.8) + one unrelated doc.
    def body(g: Int) = (1 to 11).map(k => s"g${g}t$k").mkString(" ")
    val docs = Map(
      1L -> s"${body(1)} end1a", 2L -> s"${body(1)} end1b",
      3L -> s"${body(2)} end2a", 4L -> s"${body(2)} end2b",
      5L -> (1 to 12).map(k => s"solo$k").mkString(" "))
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.pairDeltaStream(
        in.toDF().toDF("doc_id", "text"), maxDf = 3)
      .writeStream.format("memory").queryName("pairdropin")
      .outputMode("append").start()
    docs.toSeq.sortBy(_._1).grouped(2).foreach { b =>
      in.addData(b); q.processAllAvailable()
    }
    val streamedPairs = spark.table("pairdropin")
      .groupBy(col("aId").as("a_id"), col("bId").as("b_id"),
        col("nA").as("n_a"), col("nB").as("n_b"))
      .agg(sum(col("delta")).as("inter"))
      .filter(col("inter") > 0)
      .localCheckpoint()
    q.stop()
    val viaStream = graft.ops.DedupOps.dedupClustersFrom(
      graft.ops.DedupOps.jaccardFrom(streamedPairs)
        .select(col("a_id"), col("b_id"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = tmp("graft_pairdropin")
    docs.toSeq.toDF("doc_id", "text").repartition(2)
      .write.parquet(s"$dir/documents.parquet")
    val viaBatch = graft.ops.DedupOps.dedupClustersFrom(
      graft.ops.DedupOps.jaccardFrom(
        graft.ops.DedupOps.pairCounts(spark, dir, maxDf = 3))
        .select(col("a_id"), col("b_id"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStream == viaBatch && viaStream.nonEmpty,
      s"stream-fed clusters $viaStream != batch clusters $viaBatch")
  }

  test("pairDeltaStream property: merge == batch on random corpora and batch splits") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // The retraction state machine is the subtle part — exercise it on
    // seeded random corpora (small token alphabet → dense shingle
    // collisions → frequent cap crossings) with random micro-batch
    // splits and a tiny cap. Pinned seed: a failure replays exactly.
    val rnd = new scala.util.Random(1913)
    for (trial <- 1 to 6) {
      val nDocs = 5 + rnd.nextInt(5)
      val docs = (0 until nDocs).map { i =>
        val toks = Seq.fill(3 + rnd.nextInt(6))(s"w${rnd.nextInt(6)}")
        (i.toLong, toks.mkString(" "))
      }
      val maxDf = 2 + rnd.nextInt(2)
      val nBatches = 1 + rnd.nextInt(3)
      val batches = docs.groupBy(_ => rnd.nextInt(nBatches)).values.toSeq
      val in = MemoryStream[(Long, String)]
      val qname = s"pairfuzz$trial"
      val q = StreamOps.pairDeltaStream(
          in.toDF().toDF("doc_id", "text"), maxDf = maxDf)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val merged = spark.table(qname).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .groupBy(d => (d._1, d._2, d._3, d._4))
        .map { case (k, ds) => (k._1, k._2, k._3, k._4, ds.map(_._5).sum) }
        .filter(_._5 != 0).toSet
      q.stop()
      val dir = tmp(s"graft_pairfuzz$trial")
      docs.toDF("doc_id", "text").repartition(2)
        .write.parquet(s"$dir/documents.parquet")
      val batch = graft.ops.DedupOps.pairCounts(spark, dir, maxDf = maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(merged == batch,
        s"trial $trial (maxDf=$maxDf, ${batches.map(_.size).mkString("+")} " +
          s"batches, docs=$docs): stream ${merged.toSeq.sorted} != " +
          s"batch ${batch.toSeq.sorted}")
    }
  }

  test("growthStream: transitions roll up to the EXACT batch ledger, " +
    "churn identity included") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // users: 1 active wks 0,1,3; 2 active wks 0,2; 3 active wk 2 —
    // the R11ExtendSpec hand-traced fixture, split across THREE
    // micro-batches with a cross-batch retention (u1 wk1), a
    // cross-batch resurrection (u2 wk2), and a same-week repeat
    val day = 86400L * 1000000L
    def ev(u: Long, wkoff: Int): (Long, Long) = (u, wkoff * 7L * day)
    val in = MemoryStream[(Long, Long)]
    val events = in.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), expr("timestamp_micros(ts_us)").as("ts"))
    val q = StreamOps.growthStream(events)
      .writeStream.format("memory").queryName("growth")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 0), ev(2, 0), ev(1, 0)) // wk0 + same-week repeat
      q.processAllAvailable()
      in.addData(ev(1, 1), ev(3, 2))           // u1 retained, u3 new
      q.processAllAvailable()
      in.addData(ev(2, 2), ev(1, 3))           // u2 resurrected, u1 gap
      q.processAllAvailable()
      val transitions = spark.table("growth")
      val got = graft.ops.EventOps.growthReport(transitions).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      // == one batch pass over the same six (user, ts) rows
      val batchRows = Seq(ev(1, 0), ev(2, 0), ev(1, 0), ev(1, 1), ev(3, 2),
        ev(2, 2), ev(1, 3))
        .toDF("user_id", "ts_us")
        .select(col("user_id"), expr("timestamp_micros(ts_us)").as("ts"))
      val want = graft.ops.EventOps.growthAccountingFrom(batchRows).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(got.toSeq == want.toSeq, s"\n got: ${got.mkString(", ")}" +
        s"\nwant: ${want.mkString(", ")}")
      // and the fixture's hand-traced churn column survives end-to-end
      assert(got.map(_._6).toSeq == Seq(0L, 1L, 1L, 2L), got.mkString(", "))
    } finally q.stop()
  }

  test("zipLandingStream extracts newly-landed archives to parquet") {
    val landing = tmp("graft_landing")
    val out = tmp("graft_stream_out") + "/rows"
    val ckpt = tmp("graft_ckpt")
    val z = new File(landing, "in.zip")
    val zo = new ZipOutputStream(new FileOutputStream(z))
    zo.putNextEntry(new ZipEntry("a.txt")); zo.write("hi".getBytes); zo.closeEntry()
    zo.close()
    val q = StreamOps.zipLandingStream(spark, landing, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == 1)
    assert(back.collect()(0).getAs[String]("name") == "a.txt")
  }
}
