package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkFixture
import StreamOps._

class StreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    new Timestamp(1577836800000L + minute * 60000L + sec * 1000L)

  test("watermarked windowed counts over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = windowedCounts(input.toDF())
    val q = agg.writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      input.addData(
        Event(1, ts(0, 10), 1, "click", 1.0),
        Event(2, ts(0, 40), 2, "click", 2.0),
        Event(3, ts(1, 5), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      val clicks = rows.find(r => r.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n_events") == 2L)
      assert(clicks.getAs[Timestamp]("window_start") == ts(0))
    } finally q.stop()
  }

  test("sessionization groups events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = sessionize(input.toDS(), gapMs = 5 * 60000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 2min apart (one session), then one 60min later (new session)
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(2), 1, "view", 1.0),
        Event(3, ts(62), 1, "click", 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").collect()
      // the first session closes when the 62-min event arrives in the same batch
      assert(closed.length == 1)
      assert(closed(0).getAs[Long]("n_events") == 2L)
      assert(closed(0).getAs[Timestamp]("start") == ts(0))
      assert(closed(0).getAs[Timestamp]("end") == ts(2))
    } finally q.stop()
  }

  test("streaming dedup: first occurrence kept, later duplicates dropped, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = streamingDedup(input.toDF().toDF("doc_id", "ts", "text"))
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), "alpha"), (2L, ts(0, 30), "beta"), (3L, ts(1), "alpha"))
      q.processAllAvailable()
      // duplicate "alpha" within the watermark: dropped
      input.addData((4L, ts(2), "alpha"), (5L, ts(3), "gamma"))
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").collect().map(_.getAs[Long]("doc_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 5L), s"got ${ids.toSeq}")
      // state metrics exist (bounded keyed state, evicted by watermark)
      assert(q.lastProgress == null || q.lastProgress.stateOperators.length >= 0)
    } finally q.stop()
  }

  test("streaming incremental dedup: snapshot hits dropped, within-stream dups dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the admitted corpus already holds "old" and an EMPTY-text doc: its
    // key snapshot (column h, same textHashKey as the batch lifecycle)
    val snapshot = graft.ops.Dedup.exactKeySnapshot(
      Seq("old", "").toDF("text"), graft.ops.Dedup.textHashKey)
    val input = MemoryStream[(Long, Timestamp, String)]
    val admitted = streamingIncrementalDedup(
      input.toDF().toDF("doc_id", "ts", "text"), snapshot)
    val q = admitted.writeStream.format("memory").queryName("stream_incr_dedup")
      .outputMode("append").start()
    try {
      // batch 1: snapshot hit drops, fresh doc admits, in-batch dup drops,
      // and a NULL-text doc keys like empty text -> snapshot hit, drops
      input.addData((1L, ts(0), "old"), (2L, ts(0, 10), "fresh"), (3L, ts(0, 20), "fresh"),
        (6L, ts(0, 40), null.asInstanceOf[String]))
      q.processAllAvailable()
      // batch 2: re-crawl of "fresh" within the watermark drops; new admits
      input.addData((4L, ts(1), "fresh"), (5L, ts(1, 30), "newer"))
      q.processAllAvailable()
      val ids = spark.table("stream_incr_dedup").collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(ids == Seq(2L, 5L), s"admitted $ids")
      // admitted rows carry the snapshot-delta key
      val hashes = spark.table("stream_incr_dedup").collect()
        .map(_.getAs[Long]("text_hash")).toSet
      val snapKeys = snapshot.collect().map(_.getAs[Long]("h")).toSet
      assert(hashes.size == 2 && hashes.intersect(snapKeys).isEmpty,
        "delta keys must exclude snapshot keys")
    } finally q.stop()
  }

  test("streaming source quota: cap enforced across micro-batches, per-source state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocIn]
    val quota = streamingSourceQuota(input.toDS(), maxDocs = 3L)
    val q = quota.writeStream.format("memory").queryName("stream_quota")
      .outputMode("append").start()
    try {
      input.addData(
        DocIn(1L, ts(0), "a"), DocIn(2L, ts(0, 10), "a"),
        DocIn(10L, ts(0), "b"))
      q.processAllAvailable()
      // batch 2: source a already holds 2 — only ONE more admitted
      input.addData(
        DocIn(3L, ts(1), "a"), DocIn(4L, ts(1, 10), "a"), DocIn(5L, ts(1, 20), "a"),
        DocIn(11L, ts(1), "b"))
      q.processAllAvailable()
      val rows = spark.table("stream_quota").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("rank")))
      val aIds = rows.filter(_._1 == "a").map(_._2).sorted.toSeq
      assert(aIds == Seq(1L, 2L, 3L), s"source a admitted $aIds")
      assert(rows.filter(_._1 == "b").map(_._2).sorted.toSeq == Seq(10L, 11L))
      // ranks are the cumulative admission counters
      assert(rows.filter(_._1 == "a").map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
      // batch 3: source a is EXHAUSTED (drain path, zero buffering) and
      // source b has one slot left — the bounded heap must admit the
      // smallest (ts, doc_id) of the flood, not the arrival order
      input.addData(
        DocIn(6L, ts(2), "a"),
        DocIn(15L, ts(2, 30), "b"), DocIn(13L, ts(2, 20), "b"), DocIn(12L, ts(2, 10), "b"))
      q.processAllAvailable()
      val rows3 = spark.table("stream_quota").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("rank")))
      assert(rows3.filter(_._1 == "a").map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rows3.filter(_._1 == "b").map(_._2).sorted.toSeq == Seq(10L, 11L, 12L))
    } finally q.stop()
  }

  test("streaming extraction: file-source pages through the same kernel") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-pages").toString
    val out = java.nio.file.Files.createTempDirectory("stream-out").toString
    val pages = spark.range(20).as[Long].map(graft.pipeline.Corpus.row(42L)).toDF()
    pages.write.mode("overwrite").parquet(s"$dir/batch0")
    val extracted = streamingExtract(spark, s"$dir/batch0", pages.schema)
    val q = extracted.writeStream.format("memory").queryName("stream_extract")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("stream_extract").collect()
      assert(rows.length == 20)
      assert(rows.forall(_.getAs[String]("status") == "ok"))
    } finally q.stop()
  }

  test("streaming recrawl: state folds across in-order batches; final row equals batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchIn]
    val out = streamingRecrawl(input.toDS(), defaultIntervalMs = 1000L)
    val q = out.writeStream.format("memory").queryName("stream_recrawl")
      .outputMode("append").start()
    try {
      val b1 = Seq(FetchIn("u/a", 0L, "x"), FetchIn("u/a", 100L, "x"),
        FetchIn("u/b", 5L, "z"),
        FetchIn("u/c", 10L, null), // NULL hash folds to '' like the batch twin
        FetchIn(null, 7L, "q")) // NULL url folds to the '' state group
      val b2 = Seq(FetchIn("u/a", 200L, "y"), FetchIn("u/b", 50L, "z"),
        FetchIn("u/c", 60L, "w"),
        FetchIn(null, 90L, "q2")) // second batch joins the SAME '' group
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // the memory sink appends one row per (url, batch): the LATEST row
      // per url (max n_fetches) is the current schedule
      val latest = spark.table("stream_recrawl").collect()
        .map(r => (r.getAs[String]("url"), (r.getAs[Long]("n_fetches"),
          r.getAs[Long]("n_changes"), r.getAs[Long]("span_ms"),
          r.getAs[Long]("last_ms"), r.getAs[Long]("est_change_interval_ms"),
          r.getAs[Long]("next_fetch_ms"))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      val batch = graft.ops.CorpusOps.recrawlSchedule(
        (b1 ++ b2).map(f => (f.url, f.fetch_ms, f.content_hash))
          .toDF("url", "fetch_ms", "content_hash"), defaultIntervalMs = 1000L)
        .collect()
        .map(r => r.getAs[String]("url") -> ((r.getAs[Long]("n_fetches"),
          r.getAs[Long]("n_changes"), r.getAs[Long]("span_ms"),
          r.getAs[Long]("last_ms"), r.getAs[Long]("est_change_interval_ms"),
          r.getAs[Long]("next_fetch_ms")))).toMap
      assert(latest == batch, s"stream $latest\nbatch $batch")
      intercept[IllegalArgumentException] { streamingRecrawl(input.toDS(), 0L) }
    } finally q.stop()
  }
}
