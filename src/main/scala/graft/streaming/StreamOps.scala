package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The batch pipeline is the north_rule scope (resumable checkpoints, not a
  * stream), but a crawl-ingest variant of the same engine is stream-shaped,
  * so the standard constructs are provided and tested with MemoryStream:
  * watermarked tumbling-window aggregation and custom sessionization state
  * via flatMapGroupsWithState.
  */
object StreamOps {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** tumbling 1-minute counts per event_type with a 2-minute watermark:
    * late data beyond the watermark is dropped, state is bounded. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

  /** per-user sessionization with an inactivity gap, implemented with
    * flatMapGroupsWithState (bounded state: one small record per active
    * user). Sessions close when a later event for the same user arrives
    * beyond the gap; a production deployment would add a timeout flush for
    * idle users (ProcessingTimeTimeout) — omitted here because pending
    * timeouts keep micro-batches firing, which makes deterministic
    * memory-sink testing impossible.
    *
    * Memory note: the per-group sort materializes ONE USER's micro-batch
    * slice (session semantics need time order, and the state iterator is
    * unordered). Unlike the source-quota case there is no bounded top-K
    * rewrite — every event affects the output — so the bound is the
    * trigger interval: per-user events per micro-batch, not per stream.
    * A user hot enough to overflow that (~10^7 events per trigger) is a
    * bot signature and belongs in a quota guard upstream. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var out = List.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastSeen <= gapMs =>
                cur = Some(SessionState(s.start, t, s.nEvents + 1))
              case Some(s) =>
                out ::= SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          out.reverseIterator
        })
  }

  /** streaming exact dedup for crawl ingest: keep the FIRST occurrence of
    * each text (by 8-byte xxhash64 key — never the full text as state), drop
    * re-crawls arriving within the watermark horizon. State is bounded:
    * `dropDuplicatesWithinWatermark` evicts keys older than the watermark,
    * so a 10^12-row stream holds state only for the dedup window, not
    * forever (the classic unbounded-state failure of plain dropDuplicates
    * on an infinite stream). Input needs (doc_id, ts, text). */
  def streamingDedup(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_hash", xxhash64(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** streaming twin of Dedup.incrementalExactDedup — the crawl-ingest
    * lifecycle as a stream: admit a document iff (a) its text hash is
    * ABSENT from the admitted-corpus key snapshot (the static 8-byte `h`
    * table written by `Dedup.exactKeySnapshot`), and (b) it is the first
    * occurrence within the stream's watermark horizon. The snapshot check
    * is a stream-static left-outer join + null filter (Structured
    * Streaming's supported left-anti shape; Catalyst broadcasts or
    * shuffles the static side exactly as in batch). Within-stream state
    * is watermark-bounded (`dropDuplicatesWithinWatermark`), never the
    * stream length. Admitted rows ARE the snapshot delta: the sink
    * appends their `text_hash` back to the snapshot table, closing the
    * same loop as the batch operator's `snapshotDelta`. Input needs
    * (doc_id, ts, text). */
  def streamingIncrementalDedup(
      docs: DataFrame,
      snapshot: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val snapKeys = snapshot.select(col("h").as("text_hash"), lit(true).as("in_corpus"))
    docs
      // same key definition as the batch twin (Dedup.textHashKey): NULL
      // text hashes like empty text — a bare xxhash64(text) would give
      // NULL keys that never join-match the snapshot (and would append
      // NULL delta keys the batch lifecycle can never match)
      .withColumn("text_hash", graft.ops.Dedup.textHashKey)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .join(snapKeys, Seq("text_hash"), "left_outer")
      .filter(col("in_corpus").isNull)
      .drop("in_corpus")
  }

  final case class DocIn(doc_id: Long, ts: Timestamp, source: String)
  final case class QuotaOut(doc_id: Long, source: String, rank: Long)

  /** streaming twin of CorpusOps.sourceQuota: admit at most `maxDocs`
    * documents per source ACROSS micro-batches — the ingest-time guard
    * against one domain flooding a crawl. State is one counter per source
    * (bounded by the domain universe, not the stream length); within a
    * batch rows are admitted in (ts, doc_id) order for determinism. */
  def streamingSourceQuota(docs: Dataset[DocIn], maxDocs: Long = 100L): Dataset[QuotaOut] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[DocIn], state: GroupState[Long]) => {
          var n = state.getOption.getOrElse(0L)
          val remaining = math.max(0L, maxDocs - n)
          if (remaining == 0L) {
            // quota exhausted: drain without buffering anything
            while (rows.hasNext) rows.next()
            Iterator.empty
          } else {
            // bounded top-K over the (ts, doc_id) key instead of
            // materializing+sorting the whole micro-batch group: a hot
            // source flooding one batch costs O(remaining) heap, not O(batch)
            implicit val ord: Ordering[DocIn] =
              Ordering.by((d: DocIn) => (d.ts.getTime, d.doc_id))
            val heap = scala.collection.mutable.PriorityQueue.empty[DocIn] // max-heap
            rows.foreach { d =>
              if (heap.size < remaining) heap.enqueue(d)
              else if (ord.lt(d, heap.head)) { heap.dequeue(); heap.enqueue(d) }
            }
            val drained: Seq[DocIn] = heap.dequeueAll
            val admitted = drained.reverse.map { d =>
              n += 1; QuotaOut(d.doc_id, source, n)
            }
            state.update(n)
            admitted.iterator
          }
        })
  }

  final case class FetchIn(url: String, fetch_ms: Long, content_hash: String)
  final case class RecrawlState(
      nFetches: Long, nChanges: Long, firstMs: Long, lastMs: Long, lastHash: String)
  final case class RecrawlOut(
      url: String, n_fetches: Long, n_changes: Long, span_ms: Long, last_ms: Long,
      est_change_interval_ms: Long, next_fetch_ms: Long)

  /** streaming twin of CorpusOps.recrawlSchedule: per-URL change-rate
    * state folded incrementally across micro-batches — the shape a live
    * crawler runs (the batch twin re-reads the whole fetch log). State is
    * one small record per URL; each batch emits the URL's UPDATED
    * schedule row (Append of the latest verdict — downstream keeps the
    * newest per url).
    *
    * Ordering contract: within a batch, rows fold in (fetch_ms,
    * content_hash) order (the batch twin's determinism rule); ACROSS
    * batches, state folds in arrival order. Equality with the batch twin
    * therefore holds when fetch history arrives time-ordered across
    * batches — true of a crawler's own fetch log; a backfill that
    * interleaves old fetches should use the batch op. */
  def streamingRecrawl(
      fetches: Dataset[FetchIn],
      defaultIntervalMs: Long = 86400000L): Dataset[RecrawlOut] = {
    require(defaultIntervalMs > 0, s"defaultIntervalMs must be > 0, got $defaultIntervalMs")
    import fetches.sparkSession.implicits._
    fetches
      // NULL url folds to '' like the batch twin — a raw key would give a
      // null-keyed state group (and a second group beside any ''-url
      // fetches), breaking the documented batch-twin equality
      .groupByKey(f => Option(f.url).getOrElse(""))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (url: String, rows: Iterator[FetchIn], state: GroupState[RecrawlState]) => {
          val sorted = rows.toSeq.sortBy(f => (f.fetch_ms, Option(f.content_hash).getOrElse("")))
          if (sorted.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(
              RecrawlState(0L, 0L, sorted.head.fetch_ms, sorted.head.fetch_ms, null))
            sorted.foreach { f =>
              val h = Option(f.content_hash).getOrElse("")
              if (st.nFetches > 0L && st.lastHash != h)
                st = st.copy(nChanges = st.nChanges + 1)
              st = st.copy(nFetches = st.nFetches + 1,
                firstMs = math.min(st.firstMs, f.fetch_ms),
                lastMs = math.max(st.lastMs, f.fetch_ms), lastHash = h)
            }
            state.update(st)
            val span = st.lastMs - st.firstMs
            val est = if (st.nChanges > 0) span / st.nChanges else 0L
            val next =
              if (st.nChanges > 0) st.lastMs + math.max(est, 1L)
              else st.lastMs + defaultIntervalMs
            Iterator.single(RecrawlOut(url, st.nFetches, st.nChanges, span,
              st.lastMs, est, next))
          }
        })
  }

  /** file-source ingestion: stream a directory of parquet page files into
    * the extraction kernel and append results — the streaming twin of
    * ExtractJob.extract (same kernel, same output schema). */
  def streamingExtract(spark: SparkSession, inputDir: String, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    val pages = spark.readStream.schema(schema).parquet(inputDir)
    val typed = pages.select(col("url"), col("warc_ts"), col("html"),
      coalesce(col("text"), lit("")).as("text"), coalesce(col("lang"), lit("")).as("lang"))
      .as[graft.pipeline.PageRow]
    typed.mapPartitions(graft.pipeline.ExtractKernel.runPartition _).toDF()
  }
}
