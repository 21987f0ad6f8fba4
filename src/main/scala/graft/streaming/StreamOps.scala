package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.zip.{ZipExtract, ZipToParquetConfig}

/** Structured Streaming surface (SURVEY.md §7.5 — the reference is a
  * bounded batch tool, §2.2 streaming = NO; these are fresh Spark-native
  * semantics, the streaming duals of the batch EventOps queries).
  *
  * All transforms are readStream-agnostic `DataFrame => DataFrame`
  * functions: the same code runs on a batch frame (tested against the
  * batch oracle) and on a streaming frame with watermarks. State scales
  * horizontally: both stateful ops key by user/entity id, so state is
  * hash-partitioned across executors and bounded by the watermark.
  */
object StreamOps {

  /** FQCN of Spark's RocksDB state store provider (ships in spark-sql).
    * The default HDFSBackedStateStoreProvider keeps every key's state
    * ON-HEAP in the executor — fine for the catalog-sized states here
    * (CMS grids, histogram bins, HLL registers) but the wrong shape for
    * [[pairDeltaStreamTtl]], whose state is the live SHINGLE DOMAIN of
    * the TTL horizon: at 100 TB that domain is executor-heap-hostile,
    * and RocksDB keeps it off-heap on local disk with changelog
    * checkpointing. */
  val RocksDbStateStoreProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val StateStoreProviderKey =
    "spark.sql.streaming.stateStore.providerClass"

  /** Run `body` with the session's state-store provider pinned to
    * `providerClass`, restoring the previous setting after. The provider
    * is captured PER QUERY at `.start()` (it rides the query's conf
    * snapshot and its checkpoint), so wrapping the code that starts the
    * stream is sufficient and already-running queries are untouched —
    * which also means a query must keep ONE provider for the life of a
    * checkpoint directory: flipping the knob on an existing checkpoint
    * is an engine error, not a silent migration. */
  def withStateStoreProvider[T](spark: SparkSession, providerClass: String)
      (body: => T): T = {
    val prev = spark.conf.getOption(StateStoreProviderKey)
    spark.conf.set(StateStoreProviderKey, providerClass)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(StateStoreProviderKey, v)
      case None => spark.conf.unset(StateStoreProviderKey)
    }
  }

  /** The PRODUCTION start path for streams whose state is DATA-sized —
    * keyed by a domain that scales with the corpus or the TTL horizon
    * ([[pairDeltaStream]]/[[pairDeltaStreamTtl]]'s live shingle domain,
    * [[dedupStream]]'s seen-hash set): wrap the `.start()` call so the
    * query is pinned to RocksDB (off-heap state on local disk, changelog
    * checkpointing) instead of the on-heap HDFS-backed default. This IS
    * the default for this stream class, not an option: at 100 TB the
    * horizon's shingle domain is executor-heap-hostile, and discovering
    * that as an executor OOM mid-stream is the failure mode this helper
    * removes. The catalog-sized monitors ([[cmsCellStream]] grids,
    * [[histogramSketchStream]] bins, HLL registers, IVF cell counts —
    * state ≤ a few thousand rows regardless of data volume) deliberately
    * KEEP the HDFS-backed provider: their state fits any heap and the
    * on-heap read path beats a RocksDB round-trip per update. */
  def startDataSized[T](spark: SparkSession)(startQuery: => T): T =
    withStateStoreProvider(spark, RocksDbStateStoreProvider)(startQuery)

  /** Event record for the typed stateful ops (micros since epoch). */
  case class Event(userId: Long, tsMicros: Long, eventType: String, value: Double)
  case class SessionOut(userId: Long, sessionStart: Long, sessionEnd: Long, nEvents: Long)
  /** Public: the state encoder's generated code must construct it. */
  case class SessionState(start: Long, last: Long, n: Long)

  /** Tumbling-window counts per event type with a watermark: the streaming
    * dual of EventOps.qTumbling. Late rows beyond `watermark` are dropped;
    * state per (window, type) is bounded. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming Count-Min-Sketch cell maintenance — the streaming arm of
    * [[graft.ops.TextOps.cmsTopk]]: the CmsDepth×CmsWidth counter grid
    * maintained incrementally over a document stream, ONE shared
    * definition with the batch sketch (TextOps.cmsCells), so heavy-hitter
    * estimates read off the streamed grid exactly as the batch query
    * documents. Per-cell counts are a commutative monoid — micro-batch
    * arrival order cannot change the result (spec proves stream-merged ==
    * batch-recomputed) — and state is ≤ Depth×Width rows: catalog-sized,
    * watermark-free, runs forever. */
  def cmsCellStream(docs: DataFrame): DataFrame =
    graft.ops.TextOps.cmsCells(
      docs.select(explode(split(col("text"), " ")).as("tok")))

  /** Streaming mergeable histogram sketch — the streaming arm of
    * ValidationOps.quantileSketch's production path: per (event_type,
    * bin) counts maintained incrementally (same 256-bin, width-2 grid).
    * Per-bin counts form a commutative monoid, so micro-batch arrival
    * order cannot change the result — the spec proves stream-merged ==
    * batch-recomputed over the same rows — and quantiles read off the
    * cumulative crossing bin exactly as quantileSketch documents. State
    * is ≤ 256 rows per type: catalog-sized, watermark-free, runs
    * forever. */
  def histogramSketchStream(events: DataFrame): DataFrame =
    events
      .withColumn("bin", expr(
        "least(CAST(floor(value / 2.0D) AS BIGINT), CAST(255 AS BIGINT))"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Streaming IVF cell-occupancy monitor — the index-maintenance arm of
    * [[graft.ops.SimilarityOps.cellBalance]]: as embedding vectors land,
    * maintain per-cell occupancy counts incrementally (the signal that a
    * cell has gone hot and the codebook needs retraining — caught DURING
    * ingest, not at the next full-corpus audit). The assignment is ONE
    * shared definition with the batch report
    * ([[graft.ops.SimilarityOps.assignCells]]), so the monitor cannot
    * skew from it; per-cell counts form a commutative monoid (the
    * [[histogramSketchStream]] argument), so micro-batch arrival order
    * cannot change the result. State is K rows — catalog-sized,
    * watermark-free, runs forever. */
  def cellOccupancyStream(emb: DataFrame): DataFrame =
    graft.ops.SimilarityOps.assignCells(emb)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"))

  /** Streaming per-language HLL cardinality monitor — the streaming arm
    * of DedupOps.hllByLang: maintain the 16 max-rho registers per
    * language incrementally as documents land. `max` per (lang, bucket)
    * is the sketch's native merge — a commutative, idempotent monoid —
    * so micro-batch arrival order (and even replayed batches) cannot
    * change the state, and the registers equal the batch sketch over the
    * same rows at every point in time. The register relation IS the
    * mergeable artifact a 100 TB dashboard stores; the estimate is the
    * same K-row harmonic fold hllByLang applies. State is 16 rows per
    * language — catalog-sized, watermark-free, runs forever. */
  def hllRegisterStream(docs: DataFrame): DataFrame =
    graft.ops.DedupOps.hllLangRegisters(docs)

  /** Streaming arm of EventOps.qHllUsersDaily: per-day user-cardinality
    * registers maintained incrementally as events land — the same
    * max-per-(day, bucket) monoid as [[hllRegisterStream]] (commutative
    * AND idempotent, so micro-batch order and replays cannot corrupt
    * the state), over the SAME shared register definition
    * (`EventOps.hllUserDayRegisters`), so the stream's state equals the
    * batch query's relation over the same rows at every point in time.
    * State is 16 rows per day — calendar-sized, runs forever; expire
    * closed days downstream if the horizon must be bounded. */
  def hllUserDayStream(events: DataFrame): DataFrame =
    graft.ops.EventOps.hllUserDayRegisters(events)

  /** Streaming arm of ValidationOps `v_freshness`: per-type event count
    * + newest event time maintained incrementally as events land — the
    * dead-producer monitor as a LIVE state table instead of a snapshot
    * query. count and max are mergeable monoids over the SAME shared
    * core definition (`ValidationOps.freshnessCore`), so the stream's
    * state equals the batch relation over the same rows at every point
    * in time (merge == batch spec-proven across micro-batches); the
    * head-lag/stale verdict is the downstream read
    * (`freshnessReport`) over the state table — one streaming query
    * cannot stack the second aggregation level, and a monitor polls the
    * state anyway. State is catalog-sized (one row per event type),
    * runs forever. */
  def freshnessStream(events: DataFrame): DataFrame =
    graft.ops.ValidationOps.freshnessCore(events)

  /** Streaming arm of the shared daily-count ledger
    * (`EventOps.dailyCountsFrom`) — (event_type, day, n) maintained
    * incrementally as events land. count is a commutative mergeable
    * monoid over the SAME shared core definition, so the stream's state
    * equals the batch ledger over the same rows at every point in time
    * (merge == batch spec-proven across micro-batches, including a
    * batch straddling a day boundary), which makes the whole anomaly
    * ensemble that consumes the ledger (raw z-score, MAD, STL/CUSUM,
    * Holt-Winters PI — all `*FromDaily` cores) servable LIVE: poll the
    * state table, feed the cores. Null timestamps keep their null-day
    * group exactly as the batch ledger does (calendar consumers drop it
    * downstream). State is catalog × active-days rows — calendar-sized,
    * watermark-free, runs forever; expire closed days downstream if the
    * horizon must be bounded. */
  def dailyCountStream(events: DataFrame): DataFrame =
    graft.ops.EventOps.dailyCountsFrom(events)

  /** Gap-based sessionization with explicit state: 30-minute inactivity
    * closes a session (streaming dual of EventOps.qSessionize). Keyed by
    * user — state is per-user, so memory is O(active users), not
    * O(events). A session is emitted when the next one for the same user
    * opens; with `idleTimeout=true` (production mode) idle sessions are
    * additionally flushed by a processing-time timeout — note that mode
    * keeps the micro-batch engine triggering while timeouts are pending,
    * so tests that drain with processAllAvailable() should leave it off
    * (or poll the sink, as the timeout spec does). `idleFlushAfterMs`
    * overrides the timeout duration (default: the gap itself) — the
    * production dial for "flush idle sessions sooner than the event-time
    * gap", and what makes the timeout branch drivable in a test. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      idleTimeout: Boolean = false, idleFlushAfterMs: Long = -1L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val flushMs = if (idleFlushAfterMs >= 0) idleFlushAfterMs
      else gapMinutes * 60L * 1000L
    // GroupState.setTimeoutDuration rejects non-positive durations at
    // runtime, per group — fail at construction with a clear message
    require(!idleTimeout || flushMs > 0,
      s"idleTimeout requires a positive flush duration, got $flushMs ms")

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(SessionOut(userId, s.start, s.last, s.n))
      }
      val sorted = rows.toSeq.sortBy(_.tsMicros)
      var out = List.empty[SessionOut]
      var st = state.getOption
      sorted.foreach { e =>
        st match {
          case Some(s) if e.tsMicros - s.last <= gapUs =>
            st = Some(s.copy(last = e.tsMicros, n = s.n + 1))
          case Some(s) =>
            out ::= SessionOut(userId, s.start, s.last, s.n)
            st = Some(SessionState(e.tsMicros, e.tsMicros, 1))
          case None =>
            st = Some(SessionState(e.tsMicros, e.tsMicros, 1))
        }
      }
      st.foreach { s =>
        state.update(s)
        if (idleTimeout) state.setTimeoutDuration(flushMs)
      }
      out.reverseIterator
    }

    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(update)
  }

  /** Native streaming session windows: the SAME `session_window`
    * operator [[graft.ops.EventOps.qSessionWindow]] runs in batch,
    * executed as a watermarked streaming aggregation — the literal "one
    * engine mechanism, two execution modes" the batch query's scaladoc
    * claims, now exercised in both. Complements [[sessionize]] (the
    * flatMapGroupsWithState formulation, which exists for CUSTOM session
    * state and timeout policy); when plain gap-session aggregates are all
    * that's needed the native operator is the right tool — the engine
    * maintains and MERGES open session state per user key (a session
    * extended across micro-batches is one output row, not two), and the
    * watermark both bounds state and decides emission (append mode: a
    * session emits once the watermark proves no event can reopen it).
    *
    * Scale: state is O(open sessions) keyed by the uniform user_id;
    * eviction is the engine's own watermark machinery — no custom
    * timeout bookkeeping to get wrong. */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  case class TouchOut(userId: Long, purchaseTsMicros: Long, touchType: String,
    value: Double)
  /** Public: the state encoder's generated code must construct it. */
  case class TouchState(touch: String, tsMicros: Long)

  /** Streaming last-touch attribution — the streaming dual of
    * EventOps.qAttribution: per-user state carries the most recent
    * non-purchase event type; each purchase is emitted immediately,
    * credited to it ('none' when the user has no prior touch). State is
    * ONE tiny row per active user (touch type + time), hash-partitioned
    * by the uniform user key — the same O(active users) bound as
    * [[sessionize]]. Within a micro-batch rows apply in event-time order
    * with purchases after touches at the same instant, matching the batch
    * window's (ts, is_p) sort.
    *
    * `lookbackDays` (the streaming dual of
    * [[graft.ops.EventOps]]'s `e_attr_window`): when set, a touch older
    * than the lookback at purchase time credits as 'expired' instead —
    * the same CASE the batch query applies, on the SAME state the
    * unlimited mode already carries (TouchState stores the touch
    * timestamp), so the windowed mode costs nothing extra. None keeps
    * the unlimited last-touch semantics. */
  def attributionStream(events: Dataset[Event],
      lookbackDays: Option[Int] = None): Dataset[TouchOut] = {
    import events.sparkSession.implicits._
    val winUs = lookbackDays.map(_ * 86400L * 1000000L)
    def credit(st: Option[TouchState], purchaseUs: Long): String =
      st match {
        case None => "none"
        case Some(t) => winUs match {
          case Some(w) if purchaseUs - t.tsMicros > w => "expired"
          case _ => t.touch
        }
      }
    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[TouchState]): Iterator[TouchOut] = {
      val sorted = rows.toSeq.sortBy(e =>
        (e.tsMicros, if (e.eventType == "purchase") 1 else 0))
      var st = state.getOption
      var out = List.empty[TouchOut]
      sorted.foreach { e =>
        if (e.eventType == "purchase")
          out ::= TouchOut(userId, e.tsMicros, credit(st, e.tsMicros), e.value)
        else st = Some(TouchState(e.eventType, e.tsMicros))
      }
      st.foreach(state.update)
      out.reverseIterator
    }
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  case class GrowthOut(userId: Long, wk: Long, status: String)
  /** Public: the state encoder's generated code must construct it. */
  case class GrowthState(lastWk: Long)

  /** Streaming growth accounting — the streaming dual of
    * [[graft.ops.EventOps.qGrowthAccounting]]'s per-user
    * classification: per-user state carries only the LAST active week;
    * each first-activity-in-a-week emits one transition row — "new"
    * (no state), "retained" (last week), "resurrected" (a gap) — so
    * every active (user, week) pair appears exactly once and the
    * downstream [[graft.ops.EventOps.growthReport]] rolls the
    * transitions up through the SAME ledger tail as the batch query
    * (merge == batch proven in the spec, churn identity included).
    *
    * Week buckets are the IDENTICAL integer days-since-epoch DIV 7
    * expression as the batch. State is ONE long per active user,
    * hash-partitioned on the uniform user key — the [[sessionize]]
    * O(active users) bound. Honest limitation: a week arriving LATE
    * (≤ the user's last seen week) emits nothing — the stream is
    * correct for per-user in-order feeds (event-time order within a
    * micro-batch is handled by the sort); retro-classification of
    * out-of-order history is the batch job's role. */
  def growthStream(events: DataFrame): Dataset[GrowthOut] = {
    val session = events.sparkSession
    import session.implicits._
    def update(userId: Long, rows: Iterator[(Long, Long)],
        state: GroupState[GrowthState]): Iterator[GrowthOut] = {
      val weeks = rows.map(_._2).toSeq.distinct.sorted
      var st = state.getOption
      var out = List.empty[GrowthOut]
      weeks.foreach { w =>
        st match {
          case None =>
            out ::= GrowthOut(userId, w, "new")
            st = Some(GrowthState(w))
          case Some(GrowthState(last)) if w == last + 1 =>
            out ::= GrowthOut(userId, w, "retained")
            st = Some(GrowthState(w))
          case Some(GrowthState(last)) if w > last + 1 =>
            out ::= GrowthOut(userId, w, "resurrected")
            st = Some(GrowthState(w))
          case _ => () // same week again, or late-arriving history
        }
      }
      st.foreach(state.update)
      out.reverseIterator
    }
    events
      .select(col("user_id").cast("long").as("user_id"),
        expr("datediff(to_date(ts), DATE '1970-01-01') div 7").as("wk"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming exact dedup — the streaming dual of DedupOps.exactDedup:
    * keep the first arrival per content hash, drop later duplicates. State
    * is keyed by the md5 hash (uniform — never skewed) and expired by the
    * watermark: at 100 TB/day the state store holds one tiny row per
    * distinct document seen within the dedup horizon, hash-partitioned
    * across executors, instead of an unbounded all-time set. Exactly the
    * trade a streaming pipeline wants: duplicates arriving further apart
    * than the horizon pass through (re-deduped by the batch job). */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** One (shingle → document) posting for the streaming pair state. */
  case class ShinglePosting(sh: String, docId: Long, n: Long)
  /** Signed near-dup candidate-pair increment: `delta` = +1 when a new
    * co-occurrence is observed on some shingle, −1 per retracted pair
    * when that shingle crosses the df cap. Summing deltas per
    * (aId, bId, nA, nB) reproduces batch [[graft.ops.DedupOps
    * .pairCounts]]'s `inter` exactly — hot shingles net to zero. */
  case class PairDelta(aId: Long, bId: Long, nA: Long, nB: Long, delta: Long)
  /** Public: the state encoder's generated code must construct it.
    * `saturated` shingles keep NO postings — the state row shrinks to
    * one boolean the moment the cap trips. */
  case class PostingListState(docIds: Seq[Long], ns: Seq[Long], saturated: Boolean)

  /** Streaming near-dup candidate-pair maintenance — the streaming arm
    * of [[graft.ops.DedupOps.pairCounts]] (the near-dup complement of
    * [[dedupStream]]'s exact-hash dedup): per-shingle capped posting
    * lists in keyed state, new candidate pairs emitted per micro-batch
    * as they co-occur. Shingling is the SAME
    * [[graft.ops.DedupOps.shinglePostings]] definition the batch query
    * compiles, so the two arms cannot drift.
    *
    * The df cap is handled by RETRACTION, not omission: when a
    * shingle's (maxDf+1)-th document arrives, the op emits delta=−1
    * for every pair it previously credited to that shingle and marks
    * the key saturated. Downstream `sum(delta)` per pair therefore
    * equals the batch relation EXACTLY — hot shingles net to zero,
    * just as the batch filter drops them — which is the spec's
    * merge==batch proof, saturation mid-stream included. (A
    * tolerate-overcount consumer can simply ignore negative deltas.)
    * Because the summed relation carries [[graft.ops.DedupOps
    * .pairCounts]]'s exact (a_id, b_id, n_a, n_b, inter) shape, the
    * whole batch consumer set (`jaccardFrom` → clusters / funnel /
    * graph passes) runs UNCHANGED on stream-maintained evidence —
    * spec-proven (stream-fed clusters == batch clusters).
    *
    * State/scale: per live shingle ≤ maxDf (docId, n) postings;
    * saturated keys collapse to one boolean forever (hot shingles are
    * the corpus's boilerplate — the aggregate state for them is O(1),
    * not O(df)). Keys are uniform shingle hashes across executors. Key
    * COUNT is the distinct-shingle domain — unbounded here ON PURPOSE
    * so the merge==batch parity is exact; the production deployment
    * runs [[pairDeltaStreamTtl]], which bounds keys with a
    * processing-time TTL at the documented cross-horizon cost. */
  def pairDeltaStream(docs: DataFrame,
      maxDf: Int = graft.ops.DedupOps.DefaultMaxDf): Dataset[PairDelta] = {
    import docs.sparkSession.implicits._

    def update(sh: String, rows: Iterator[ShinglePosting],
        state: GroupState[PostingListState]): Iterator[PairDelta] = {
      val (st, out) = advancePostings(
        state.getOption.getOrElse(PostingListState(Nil, Nil, false)),
        rows.map(r => (r.docId, r.n)).toSeq, maxDf)
      state.update(st)
      out.iterator
    }

    graft.ops.DedupOps.shinglePostings(docs)
      .select(col("sh"), col("doc_id").as("docId"), col("n")).as[ShinglePosting]
      .groupByKey(_.sh)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** The shared posting-list advance behind both pair-maintenance arms:
    * fold one micro-batch's postings for one shingle into the state,
    * crediting +1 per new co-occurrence and firing the −1 retraction
    * wave the moment the df cap trips. docId order within the batch
    * keeps emission deterministic regardless of shuffle arrival order.
    * A nested Serializable module, not an outer-object method — the
    * state-update closures ship to executors and must not drag the
    * whole (non-serializable) StreamOps object along. */
  private object advancePostings extends Serializable {
    /** rows are (docId, n) — the key-agnostic grain, so the SAME machine
      * serves the text arm (shingle keys, per-doc shingle counts) and
      * the audio arm (landmark-fingerprint keys, n unused = 0). */
    def apply(st0: PostingListState, rows: Seq[(Long, Long)],
        maxDf: Int): (PostingListState, List[PairDelta]) = {
      var st = st0
      val out = List.newBuilder[PairDelta]
      def pair(a: Long, na: Long, b: Long, nb: Long, d: Long): PairDelta =
        if (a < b) PairDelta(a, b, na, nb, d) else PairDelta(b, a, nb, na, d)
      rows.sortBy(_._1).foreach { case (docId, n) =>
        if (!st.saturated && !st.docIds.contains(docId)) {
          if (st.docIds.size + 1 > maxDf) {
            // cap crossed: retract every pair this shingle credited
            // (pairs with the new doc were never emitted — nothing to
            // retract)
            for (i <- st.docIds.indices; j <- (i + 1) until st.docIds.size)
              out += pair(st.docIds(i), st.ns(i), st.docIds(j), st.ns(j), -1L)
            st = PostingListState(Nil, Nil, saturated = true)
          } else {
            for (i <- st.docIds.indices)
              out += pair(st.docIds(i), st.ns(i), docId, n, 1L)
            st = PostingListState(st.docIds :+ docId, st.ns :+ n, false)
          }
        }
      }
      (st, out.result())
    }
  }

  /** One (fingerprint → clip) posting for the audio pair state. */
  case class FpPosting(fp: Long, docId: Long)
  /** Signed audio match-candidate increment — [[PairDelta]] without the
    * per-doc count payload (a landmark has no multiplicity): summing
    * `delta` per (aId, bId) reproduces batch
    * [[graft.ops.MultimodalOps.audioFprint]]'s `n_shared` exactly —
    * capped-away boilerplate landmarks net to zero. */
  case class AudioPairDelta(aId: Long, bId: Long, delta: Long)

  /** Streaming audio match-candidate maintenance — [[pairDeltaStream]]'s
    * retraction discipline instantiated over the landmark postings of
    * [[graft.ops.MultimodalOps.audioFprint]] (the constellation device),
    * so arriving audio clips surface match candidates live. Landmark
    * extraction is doc-local ([[graft.ops.Multimodal.landmarkFps]] over
    * [[graft.ops.Multimodal.windowEnergies]] over the SAME
    * [[graft.ops.Multimodal.audioSamples]] decode the batch arm runs): a
    * clip arrives whole in one row, and Structured Streaming cannot run
    * the batch arm's lag/lead windows — the pure core is spec-pinned
    * value-equal to the relational [[graft.ops.MultimodalOps
    * .audioMarksFrom]] so the arms cannot drift. The per-fingerprint
    * capped posting state and the −1 retraction wave at the df cap are
    * the SAME [[advancePostings]] machine the text arm runs, so
    * sum(delta) per pair == the batch report exactly, cap saturation
    * mid-stream included (spec-proven across micro-batches).
    *
    * State/scale: per live fingerprint ≤ maxDf clip ids; saturated keys
    * collapse to one boolean forever (boilerplate landmarks — tone
    * beeps, codec padding — cost O(1) state, not O(df)); keys are
    * uniform integer hashes across executors. Key COUNT is the live
    * fingerprint domain — unbounded here ON PURPOSE for exact
    * merge==batch parity; a production deployment bounds it with the
    * processing-time TTL epoch machine of [[pairDeltaStreamTtl]], which
    * shares [[advancePostings]] and instantiates over these postings
    * identically. */
  def audioPairStream(clips: DataFrame,
      maxDf: Long = graft.ops.MultimodalOps.FprintMaxDf): Dataset[AudioPairDelta] = {
    require(maxDf > 0 && maxDf <= Int.MaxValue,
      s"maxDf must be in (0, Int.MaxValue], got $maxDf")
    import clips.sparkSession.implicits._

    def update(fp: Long, rows: Iterator[FpPosting],
        state: GroupState[PostingListState]): Iterator[AudioPairDelta] = {
      val (st, out) = advancePostings(
        state.getOption.getOrElse(PostingListState(Nil, Nil, false)),
        rows.map(r => (r.docId, 0L)).toSeq, maxDf.toInt)
      state.update(st)
      out.iterator.map(p => AudioPairDelta(p.aId, p.bId, p.delta))
    }

    audioPostings(clips)
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** The (fp, docId) landmark posting stream both audio arms consume —
    * ONE extraction definition, so the exact and TTL arms cannot
    * drift. */
  private def audioPostings(clips: DataFrame): Dataset[FpPosting] = {
    import clips.sparkSession.implicits._
    clips
      .select(col("doc_id").cast("long").as("doc_id"), col("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, body) =>
        graft.ops.Multimodal.landmarkFps(
          graft.ops.Multimodal.windowEnergies(
            graft.ops.Multimodal.audioSamples(body)))
          .map(fp => FpPosting(fp, id))
      })
  }

  /** PRODUCTION arm of [[audioPairStream]]: the [[pairDeltaStreamTtl]]
    * processing-time TTL epoch machine instantiated over the audio
    * landmark postings — the fingerprint-domain key-count bound the
    * exact arm defers, so the audio tier has the same two-arm story as
    * the text tier. Same [[advancePostings]] machine, same horizon
    * trade, spec-proven exactly: a pair whose clips arrive more than
    * one horizon apart is LOST here and falls to the periodic batch
    * backfill — and ONLY those pairs (stream ∪ cross-horizon pairs ==
    * full batch [[graft.ops.MultimodalOps.audioFprint]]); the df cap
    * counts per epoch and the backfill re-caps globally. */
  def audioPairStreamTtl(clips: DataFrame, ttlMs: Long,
      maxDf: Long = graft.ops.MultimodalOps.FprintMaxDf): Dataset[AudioPairDelta] = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    require(maxDf > 0 && maxDf <= Int.MaxValue,
      s"maxDf must be in (0, Int.MaxValue], got $maxDf")
    import clips.sparkSession.implicits._

    def update(fp: Long, rows: Iterator[FpPosting],
        state: GroupState[PostingListStateTtl]): Iterator[AudioPairDelta] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val now = state.getCurrentProcessingTimeMs()
        val live = state.getOption
          .filter(s => now - s.lastMs <= ttlMs)
          .map(s => PostingListState(s.docIds, s.ns, s.saturated))
          .getOrElse(PostingListState(Nil, Nil, saturated = false))
        val (st, out) = advancePostings(live,
          rows.map(r => (r.docId, 0L)).toSeq, maxDf.toInt)
        state.update(PostingListStateTtl(st.docIds, st.ns, st.saturated, now))
        state.setTimeoutDuration(ttlMs)
        out.iterator.map(p => AudioPairDelta(p.aId, p.bId, p.delta))
      }
    }

    audioPostings(clips)
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout())(update)
  }

  /** [[PostingListState]] plus the epoch's last processing-time touch —
    * public for the state encoder, like [[PostingListState]]. */
  case class PostingListStateTtl(docIds: Seq[Long], ns: Seq[Long],
      saturated: Boolean, lastMs: Long)

  /** PRODUCTION arm of [[pairDeltaStream]]: the same retraction state
    * machine under a processing-time TTL, making the key-count bound
    * the exact arm defers mechanical. Two mechanisms, one horizon:
    *
    *   - a shingle whose state went untouched for `ttlMs` and receives
    *     NEW postings starts a FRESH epoch (stale postings dropped
    *     before the advance — checked against the state's own
    *     last-touch stamp, so expiry semantics do not depend on when
    *     the engine happens to fire timeouts);
    *   - a shingle that never receives data again is physically removed
    *     by the engine's ProcessingTimeTimeout — state size is bounded
    *     by the shingle domain of the LAST `ttlMs` of stream, not of
    *     the stream's lifetime.
    *
    * The trade is exactly [[dedupStream]]'s watermark trade: a pair
    * whose two documents arrive more than one horizon apart is LOST
    * here and falls to the periodic batch backfill — and ONLY those
    * pairs are lost. The spec pins it: with every shingle's documents
    * confined to one epoch except a deliberate cross-horizon span,
    * stream ∪ cross-horizon-pairs == full batch [[graft.ops.DedupOps
    * .pairCounts]]. One honest asymmetry is inherent to horizons: the
    * df cap counts per epoch, so a shingle whose documents straddle
    * epochs can stay under a cap it would cross globally — the backfill
    * job re-caps globally, which is why retention dials live there. */
  def pairDeltaStreamTtl(docs: DataFrame, ttlMs: Long,
      maxDf: Int = graft.ops.DedupOps.DefaultMaxDf): Dataset[PairDelta] = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    import docs.sparkSession.implicits._

    def update(sh: String, rows: Iterator[ShinglePosting],
        state: GroupState[PostingListStateTtl]): Iterator[PairDelta] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val now = state.getCurrentProcessingTimeMs()
        val live = state.getOption
          .filter(s => now - s.lastMs <= ttlMs)
          .map(s => PostingListState(s.docIds, s.ns, s.saturated))
          .getOrElse(PostingListState(Nil, Nil, saturated = false))
        val (st, out) = advancePostings(live,
          rows.map(r => (r.docId, r.n)).toSeq, maxDf)
        state.update(PostingListStateTtl(st.docIds, st.ns, st.saturated, now))
        state.setTimeoutDuration(ttlMs)
        out.iterator
      }
    }

    graft.ops.DedupOps.shinglePostings(docs)
      .select(col("sh"), col("doc_id").as("docId"), col("n")).as[ShinglePosting]
      .groupByKey(_.sh)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout())(update)
  }

  /** Stream-stream interval join: each click pairs with the same user's
    * view at most `intervalMinutes` earlier. Both sides carry watermarks
    * and the join condition bounds event time on both ends, so Spark can
    * expire buffered state on each side — without the time bounds a
    * stream-stream join buffers forever. Keyed by user id: state and the
    * join shuffle are hash-partitioned, no broadcast of an unbounded side. */
  def intervalJoinStream(views: DataFrame, clicks: DataFrame,
      watermark: String = "1 hour", intervalMinutes: Int = 10): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("view_ts"),
      col("item").as("view_item")).withWatermark("view_ts", watermark)
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"),
      col("item").as("click_item")).withWatermark("click_ts", watermark)
    c.join(v,
      col("c_user") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $intervalMinutes MINUTES"))
      .select(col("c_user").as("user_id"), col("click_ts"), col("click_item"),
        col("view_ts"), col("view_item"))
  }

  /** LEFT OUTER stream-stream interval join: every view, decorated with
    * the click that followed it within the interval — or nulls if none
    * ever came. The outer semantics are what the inner
    * [[intervalJoinStream]] cannot answer ("which impressions
    * converted, AND which didn't"): an unmatched view can only be
    * emitted once the watermark proves no matching click can still
    * arrive, so null-padded rows surface exactly one watermark horizon
    * after their interval closes. State is the same
    * interval-bounded window as the inner join — rows age out of the
    * store at the watermark, so it runs forever. */
  def intervalJoinOuterStream(views: DataFrame, clicks: DataFrame,
      watermark: String = "1 hour", intervalMinutes: Int = 10): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("view_ts"),
      col("item").as("view_item")).withWatermark("view_ts", watermark)
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"),
      col("item").as("click_item")).withWatermark("click_ts", watermark)
    v.join(c,
      col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $intervalMinutes MINUTES"),
      "leftOuter")
      .select(col("v_user").as("user_id"), col("view_ts"), col("view_item"),
        col("click_ts"), col("click_item"))
  }

  /** Stream-static dimension enrichment: left-join a streaming fact
    * frame to a static (catalog-sized) dimension with an explicit
    * broadcast hint — the standard "decorate events with account
    * metadata" pattern. Stateless: no watermark, no join state store —
    * the static side is re-planned and broadcast per micro-batch (so a
    * dim refresh on disk is picked up by the next batch), and the
    * stream stays in append mode. At 100 TB/day of facts the per-batch
    * cost is the bounded dim broadcast plus a narrow map over the
    * batch; facts never shuffle. */
  def enrichStream(facts: DataFrame, dim: DataFrame, key: String): DataFrame =
    facts.join(broadcast(dim), Seq(key), "left")

  /** Streaming corpus ingest with a DURABLE dedup manifest — the
    * cross-batch dual of DedupOps.incrementalDedup. [[dedupStream]] bounds
    * its state by the watermark horizon; when the horizon is "forever"
    * (a training corpus must never re-ingest a document), the state store
    * can't hold it but a parquet manifest table can. Each micro-batch:
    * in-batch dedup on content hash → anti-join the manifest → append the
    * survivors to the corpus AND their hashes to the manifest.
    *
    * Scale: the manifest carries 16-byte hashes only (a few GB per 100 TB
    * of corpus), and both the anti-join and the writes shuffle on the
    * uniform hash — bucket the manifest (ops/Bucketing) to make the join
    * exchange-free. The batch is persisted across its two sinks so the
    * anti-join runs once.
    *
    * Idempotence: each micro-batch writes to (query_id, batch_id)-scoped
    * partition directories with OVERWRITE. foreachBatch replays a failed
    * batch under the SAME batchId, so a retry — whether the failure hit
    * before, between, or after the two writes — overwrites its own
    * partial output instead of appending duplicates. The query id (from
    * the streaming query's local property, persisted in the checkpoint)
    * scopes the batch counter: batch ids restart at 0 when a stream gets
    * a FRESH checkpoint against the same output dirs, and without the
    * scope that restart would silently overwrite the old run's committed
    * batch-0 data. The duplicate window of the old two-append design is
    * gone; the periodic batch re-dedup (incrementalDedup) remains only as
    * belt-and-braces. Readers see `query_id`/`batch_id` as partition
    * columns of both tables. A manifest in the pre-partitioned flat
    * layout is rejected loudly with migration instructions — mixing
    * layouts would break partition discovery at first read. */
  def manifestIngestStream(spark: SparkSession, docs: DataFrame,
      corpusDir: String, manifestDir: String, checkpoint: String) =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, batchId, corpusDir, manifestDir)
      }
      .start()

  /** [[manifestIngestStream]] with the quality gate in front: each
    * micro-batch drops documents failing any CorpusOps.gateKept rule
    * BEFORE hashing/dedup, so junk never costs a manifest entry or a
    * corpus write. The gate is a narrow projection (no state, no
    * watermark), so it composes with the streaming plan unchanged — the
    * whole reason the batch rules were written shuffle-free. */
  def gatedIngestStream(spark: SparkSession, docs: DataFrame,
      corpusDir: String, manifestDir: String, checkpoint: String) =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, graft.ops.CorpusOps.gateKept(batch), batchId,
          corpusDir, manifestDir)
      }
      .start()

  /** NB-scored ingest — the SERVE side of the classifier's train/serve
    * loop: each micro-batch keeps only documents the batch-trained
    * [[graft.ops.CorpusOps.nbModel]] scores positive
    * ([[graft.ops.CorpusOps.nbKept]] — ONE shared definition with the
    * batch query, so the stream filter cannot skew from the trained
    * model). The per-batch work is a broadcast join of the vocabulary
    * model onto the batch's token explode plus a batch-local doc agg —
    * no state store, no watermark; pass a MATERIALIZED model
    * (localCheckpoint) so micro-batches broadcast it instead of
    * retraining. The upgrade path from [[gatedIngestStream]]'s rule
    * gate: same ingest contract, learned verdicts. */
  def nbScoredIngestStream(spark: SparkSession, docs: DataFrame,
      model: DataFrame, corpusDir: String, manifestDir: String,
      checkpoint: String) =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, graft.ops.CorpusOps.nbKept(batch, model), batchId,
          corpusDir, manifestDir)
      }
      .start()

  /** One ingest micro-batch (exposed so the retry contract is testable:
    * running the same (queryId, batchId) twice must be a no-op the second
    * time, whatever the first attempt managed to write).
    *
    * Non-streaming (backfill) invocations must pass an explicit `runId` —
    * a shared default would let two unrelated ad-hoc runs that reuse a
    * batchId silently OVERWRITE each other's committed partitions.
    * Retrying the same logical run IS the intended idempotent path: reuse
    * its runId; distinct runs must choose distinct ids. */
  private[streaming] def ingestBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, corpusDir: String, manifestDir: String,
      runId: Option[String] = None): Unit = {
    // An EXPLICIT runId wins over the ambient streaming queryId: local
    // properties are inherited by child threads, so a backfill launched
    // from a streaming thread would otherwise silently adopt the stream's
    // queryId and overwrite its committed partitions — the exact clobber
    // the explicit-id rule exists to prevent. The streaming path passes
    // runId=None and falls through to the checkpoint-stable queryId.
    val queryId = runId
      .orElse(Option(
        spark.sparkContext.getLocalProperty("sql.streaming.queryId")))
      .getOrElse(throw new IllegalArgumentException(
        "non-streaming ingestBatch requires an explicit runId: the " +
          "(run, batch) pair scopes the idempotent overwrite, and a shared " +
          "default would let two ad-hoc runs clobber each other's output"))
    val hashed = batch
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .dropDuplicates("content_hash")
    val manifestView = readManifest(spark, manifestDir, queryId, batchId)
    val fresh = manifestView
      .map(m => hashed.join(m, Seq("content_hash"), "left_anti"))
      .getOrElse(hashed).persist()
    try {
      fresh.drop("content_hash")
        .write.mode("overwrite").option("compression", "snappy")
        .parquet(s"$corpusDir/query_id=$queryId/batch_id=$batchId")
      fresh.select(col("content_hash"))
        .write.mode("overwrite").option("compression", "snappy")
        .parquet(s"$manifestDir/query_id=$queryId/batch_id=$batchId")
    } finally fresh.unpersist()
    ()
  }

  /** The manifest as an anti-join side, or None when nothing committed
    * yet. Handles the awkward startup states the naive read dies on:
    * a directory left behind by a crashed first write (no data files →
    * parquet schema inference fails → treat as empty), and a manifest in
    * the old flat layout (no partition columns → reject loudly: mixed
    * layouts break partition discovery the moment the first partitioned
    * write lands next to the flat files). */
  private def readManifest(spark: SparkSession, manifestDir: String,
      queryId: String, batchId: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val m =
      try spark.read.parquet(manifestDir)
      catch {
        // dir exists but holds no committed data files (e.g. only a
        // _temporary of a crashed attempt) — same as no manifest
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer schema") => return None
      }
    if (!(m.columns.contains("query_id") && m.columns.contains("batch_id")))
      throw new IllegalStateException(
        s"manifest at $manifestDir uses the flat (pre-partitioned) layout; " +
          "migrate its parquet files into a query_id=legacy/batch_id=0/ " +
          "subdirectory before running the partitioned ingest against it")
    // exclude THIS batch's own partition from the manifest view: a retry
    // must not anti-join its rows away against the half-written attempt
    // it is replacing
    Some(m
      .filter(!(col("query_id") === queryId && col("batch_id") === batchId))
      .select("content_hash"))
  }

  /** Watch a landing directory for new zip archives and append their
    * extracted entries to a parquet sink — the streaming version of the
    * reference's whole pipeline ("drop zips in, get rows out"). The file
    * source only lists new files; contents are read inside the same
    * per-archive extraction used in batch (pruned to `path`, so archive
    * bytes are never materialized in the stream itself). */
  def zipLandingStream(spark: SparkSession, landingDir: String, outDir: String,
      checkpoint: String, cfg: ZipToParquetConfig = ZipToParquetConfig(Nil)) = {
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema) // streaming sources require an explicit schema
      .option("pathGlobFilter", "*.zip")
      .load(landingDir)
      .select(col("path"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val paths = batch.collect().map(_.getString(0))
        if (paths.nonEmpty) {
          ZipExtract.entries(spark, cfg.copy(inputs = paths.toSeq))
            .write.mode("append")
            .option("compression", "snappy")
            .parquet(outDir)
        }
      }
      .start()
  }
}
