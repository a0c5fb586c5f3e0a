package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Drives the window transforms through an actual streaming query
  * (MemoryStream source → complete-mode memory sink) to prove the
  * plans are streaming-executable, and cross-checks the result against
  * the identical batch transform.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumblingCounts runs incrementally and matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF().toDF("ts", "value")

    val q = StreamingOps.tumblingCounts(events, "1 hour")
      .writeStream.format("memory").queryName("tumble_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:10:00"), 1.0),
        (ts("2024-01-01 00:50:00"), 2.0),
        (ts("2024-01-01 01:10:00"), 4.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 01:40:00"), 8.0))
      q.processAllAvailable()

      val streamed = spark.table("tumble_test")
        .orderBy("win_start")
        .as[(Timestamp, Long, Double)].collect().toSeq
      val batch = StreamingOps.tumblingCounts(
          Seq((ts("2024-01-01 00:10:00"), 1.0), (ts("2024-01-01 00:50:00"), 2.0),
            (ts("2024-01-01 01:10:00"), 4.0), (ts("2024-01-01 01:40:00"), 8.0))
            .toDF("ts", "value"), "1 hour")
        .orderBy("win_start")
        .as[(Timestamp, Long, Double)].collect().toSeq
      assert(streamed == batch)
      assert(streamed.map(_._3) == Seq(3.0, 12.0))
    } finally q.stop()
  }

  test("intervalJoin matches right events within the bound, drops the rest") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, Double)]
    val rIn = MemoryStream[(Long, Timestamp)]
    val left = lIn.toDF().toDF("user_id", "ts", "value")
    val right = rIn.toDF().toDF("user_id", "ts")
      .withColumn("value", org.apache.spark.sql.functions.lit(0.0))

    val q = StreamingOps.intervalJoin(left, right, "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("ij_test")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData(
        (1L, ts("2024-01-01 00:00:00"), 10.0),
        (2L, ts("2024-01-01 00:00:00"), 20.0))
      rIn.addData(
        (1L, ts("2024-01-01 00:20:00")), // within 30m → match
        (2L, ts("2024-01-01 00:45:00")), // beyond 30m → dropped
        (3L, ts("2024-01-01 00:10:00"))) // no left side → dropped
      q.processAllAvailable()

      val rows = spark.table("ij_test")
        .as[(Long, Timestamp, Timestamp, Double)].collect().toSeq
      assert(rows == Seq((1L, ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:20:00"), 10.0)), rows)
    } finally q.stop()
  }

  test("left-outer intervalJoin emits unmatched left rows after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, Double)]
    val rIn = MemoryStream[(Long, Timestamp)]
    val left = lIn.toDF().toDF("user_id", "ts", "value")
    val right = rIn.toDF().toDF("user_id", "ts")
      .withColumn("value", org.apache.spark.sql.functions.lit(0.0))

    val q = StreamingOps.intervalJoin(left, right, "10 minutes", "30 minutes",
        joinType = "left_outer")
      .writeStream.format("memory").queryName("ij_outer_test")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData(
        (1L, ts("2024-01-01 00:00:00"), 10.0),  // will match
        (2L, ts("2024-01-01 00:00:00"), 20.0))  // never matches
      rIn.addData((1L, ts("2024-01-01 00:20:00")))
      q.processAllAvailable()
      // push both watermarks far past 00:00 + 30m bound + 10m wm so the
      // unmatched left row can be finalized as a null-padded emission
      lIn.addData((8L, ts("2024-01-01 03:00:00"), 1.0))
      rIn.addData((9L, ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      lIn.addData((8L, ts("2024-01-01 06:00:00"), 1.0))
      rIn.addData((9L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()

      val rows = spark.table("ij_outer_test").collect()
        .map(r => (r.getLong(0), Option(r.get(2)).isDefined)).toSet
      assert(rows.contains((1L, true)), s"matched row missing: ${rows.mkString(",")}")
      assert(rows.contains((2L, false)),
        s"unmatched left row not emitted with null right side: ${rows.mkString(",")}")
    } finally q.stop()
  }

  test("intervalJoin state is evicted once the watermark clears the bound") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, Double)]
    val rIn = MemoryStream[(Long, Timestamp)]
    val left = lIn.toDF().toDF("user_id", "ts", "value")
    val right = rIn.toDF().toDF("user_id", "ts")
      .withColumn("value", org.apache.spark.sql.functions.lit(0.0))

    val q = StreamingOps.intervalJoin(left, right, "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("ij_evict_test")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData((1L, ts("2024-01-01 00:00:00"), 10.0))
      rIn.addData((9L, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // advance both watermarks far past ts 00:00 + 30m bound + 10m wm
      lIn.addData((8L, ts("2024-01-01 03:00:00"), 1.0))
      rIn.addData((8L, ts("2024-01-01 03:00:01")))
      q.processAllAvailable()
      // a "late" click for user 1 behind the watermark: state for the
      // 00:00 impression is gone, so no match may be emitted
      rIn.addData((1L, ts("2024-01-01 00:20:00")))
      q.processAllAvailable()

      val rows = spark.table("ij_evict_test")
        .as[(Long, Timestamp, Timestamp, Double)].collect().toSeq
      assert(rows.map(_._1) == Seq(8L), rows)
      val progress = q.lastProgress
      assert(progress != null) // state metrics exist; eviction proven by no late match
    } finally q.stop()
  }

  test("streamingDedup emits each (user, event) once across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "event_id", "ts")

    val q = StreamingOps.streamingDedup(events)
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val t0 = ts("2024-01-01 00:00:00")
      input.addData((1L, 100L, t0), (1L, 101L, t0), (1L, 100L, t0), (2L, 100L, t0))
      q.processAllAvailable()
      val t1 = ts("2024-01-01 00:05:00")
      input.addData((1L, 100L, t1), (1L, 102L, t1), (2L, 100L, t1)) // repeats span batches
      q.processAllAvailable()
      val rows = spark.table("dedup_test")
        .orderBy("user_id", "event_id")
        .as[(Long, Long)].collect().toSeq
      assert(rows == Seq((1L, 100L), (1L, 101L), (1L, 102L), (2L, 100L)))
    } finally q.stop()
  }

  test("streamingDupWeights numbers duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")

    val q = StreamingOps.streamingDupWeights(docs)
      .writeStream.format("memory").queryName("dupw_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val t0 = ts("2024-01-01 00:00:00")
      input.addData((1L, "alpha", t0), (2L, "beta", t0), (3L, "alpha", t0))
      q.processAllAvailable()
      val t1 = ts("2024-01-01 00:05:00")
      input.addData((4L, "alpha", t1), (5L, "beta", t1)) // ordinals continue
      q.processAllAvailable()
      val rows = spark.table("dupw_test")
        .orderBy("doc_id")
        .as[(Long, Long, Double)].collect().toSeq
      // alpha arrives as ordinals 1,2,3 (docs 1,3,4); beta as 1,2
      assert(rows.map(r => (r._1, r._2)) ==
        Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 2L)))
      rows.foreach(r => assert(r._3 == 1.0 / r._2))
    } finally q.stop()
  }

  test("streamingDupWeights batch twin reconciles with ext_dedup_weights' " +
      "group sizes") {
    val batch = Seq(
      (1L, "x", ts("2024-01-01 00:00:00")),
      (2L, "x", ts("2024-01-01 00:01:00")),
      (3L, "y", ts("2024-01-01 00:02:00")))
      .toDF("doc_id", "text", "ts")
    val rows = StreamingOps.streamingDupWeights(batch)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // final ordinal per content = the batch key's n_copies
    assert(rows.map(_._2).max == 2L)
    assert(rows.map(r => (r._1, r._2)) == Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("streamingDedup also runs on a batch DataFrame (no watermark)") {
    val batch = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00")),
      (1L, 100L, ts("2024-01-01 00:01:00")),
      (1L, 101L, ts("2024-01-01 00:02:00")))
      .toDF("user_id", "event_id", "ts")
    val rows = StreamingOps.streamingDedup(batch)
      .orderBy("user_id", "event_id")
      .as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 100L), (1L, 101L)))
  }

  test("streamingDedup state is evicted once the watermark passes retention") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "event_id", "ts")

    // 10-minute watermark delay, 30-minute retention: user 1's id set
    // must be gone once the watermark clears 00:00 + 30min
    val q = StreamingOps.streamingDedup(
        events, watermark = "10 minutes", retentionMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("dedup_evict_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, 100L, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // advance the watermark past 00:30 via another user's traffic
      input.addData((9L, 900L, ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      // next batch processes user 1's timeout → state removed
      input.addData((9L, 901L, ts("2024-01-01 03:01:00")))
      q.processAllAvailable()
      // the same (user, event) arrives again → re-emitted, proving the
      // id set did NOT live forever
      input.addData((1L, 100L, ts("2024-01-01 03:02:00")))
      q.processAllAvailable()
      val emitted = spark.table("dedup_evict_test")
        .filter($"user_id" === 1L && $"event_id" === 100L).count()
      assert(emitted == 2L, s"expected re-emit after eviction, got $emitted")
    } finally q.stop()
  }

  test("runningUserStats accumulates typed state via transformWithState") {
    implicit val sqlCtx = spark.sqlContext
    // the arbitrary-state v2 API requires the RocksDB state store
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Double)]
    val events = input.toDF().toDF("user_id", "value")
    val q = StreamingOps.runningUserStats(events)
      .writeStream.format("memory").queryName("tws_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L, 10.0), (1L, 20.0), (2L, 5.0))
      q.processAllAvailable()
      input.addData((1L, 30.0))
      q.processAllAvailable()
      // update-mode sink: take each user's LAST emitted row
      val last = spark.table("tws_test")
        .as[(Long, Long, Double, Double)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(last(1L) == ((1L, 3L, 60.0, 20.0)))
      assert(last(2L) == ((2L, 1L, 5.0, 5.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("contaminatedStream flags benchmark-overlap docs once, stateless join") {
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq(
      (900L, "the held out benchmark passage that must never leak into training"))
      .toDF("doc_id", "text")
    val evalShingles = graft.ops.Dedup
      .hashedShingleSets(evalDocs, "doc_id", "text").select(
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col("sset")).as("s"))
      .distinct()

    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingOps.contaminatedStream(docs, evalShingles)
      .writeStream.format("memory").queryName("decontam_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val t0 = ts("2024-01-01 00:00:00")
      input.addData(
        (1L, "a training doc quoting the held out benchmark passage verbatim", t0),
        (2L, "perfectly clean content with no overlap whatsoever to worry about", t0),
        (1L, "a training doc quoting the held out benchmark passage verbatim", t0))
      q.processAllAvailable()
      input.addData(
        (3L, "more clean text arriving in a later micro batch entirely", t0))
      q.processAllAvailable()
      val flagged = spark.table("decontam_test")
        .select("doc_id").as[Long].collect().toSeq
      assert(flagged == Seq(1L), s"flagged $flagged")
    } finally q.stop()
  }

  test("sessionCounts assigns gap-separated sessions in a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")

    val q = StreamingOps.sessionCounts(events, gap = "30 minutes")
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L),
        (ts("2024-01-01 00:10:00"), 1L), // same session (gap < 30m)
        (ts("2024-01-01 02:00:00"), 1L), // new session
        (ts("2024-01-01 00:05:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .orderBy("user_id", "sess_start")
        .as[(Long, Timestamp, Long)].collect().toSeq
      assert(rows.map(r => (r._1, r._3)) == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("the curation gate and PII redaction run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.{functions => F}
    val cfg = graft.ops.Curation.Config()
    def gated(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Curation.qualityStats(df)
        .withColumn("gate", graft.ops.Curation.dropReason(cfg))
        .withColumn("red_text", F.regexp_replace(
          F.regexp_replace($"text", cfg.emailRe, "[EMAIL]"),
          cfg.phoneRe, "[PHONE]"))
        .select("doc_id", "gate", "n_tokens", "red_text")
    val rows = Seq(
      (1L, ("the a of and is good prose here today " * 4).trim),
      (2L, "too short"),
      (3L, "mail me at someone@example.org or 555-0000 " +
        "the a of and is plus enough words to pass the gate " * 2))
      .map { case (id, t) => (id, t, ts("2024-01-01 00:00:00")) }
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = gated(docs)
      .writeStream.format("memory").queryName("curate_stream_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("curate_stream_test")
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val batch = gated(rows.toDF("doc_id", "text", "ts"))
        .orderBy("doc_id").collect().map(_.toString).toSeq
      assert(streamed == batch, s"stream/batch divergence:\n$streamed\n$batch")
      assert(streamed.exists(_.contains("[EMAIL]")) &&
        streamed.exists(_.contains("[PHONE]")))
      assert(streamed.exists(_.contains("too_short")))
    } finally q.stop()
  }

  private val nearDupBase =
    "the quick brown fox jumps over the lazy dog while the band plays on"
  private val nearDupFresh =
    "completely unrelated prose about distributed query execution engines"

  test("streamingNearDup matches a later near-dup against an earlier batch's doc") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingOps.streamingNearDup(docs)
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, nearDupBase, ts("2024-01-01 00:00:00")),
        (2L, nearDupFresh, ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      // a mutated copy arrives in a LATER micro-batch: the match must
      // come from keyed state, not from within-batch comparison
      input.addData((3L, nearDupBase + "!", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      val pairs = spark.table("neardup_test")
        .select("doc_id", "dup_of").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs == Set((3L, 1L)), s"got $pairs")
      // the estimate is a real MinHash agreement fraction
      val est = spark.table("neardup_test")
        .select("sim_est").as[Double].collect()
      assert(est.forall(e => e >= 0.7 && e <= 1.0))
    } finally q.stop()
  }

  test("streamingNearDup on a batch frame agrees with the offline banding pairs") {
    val batch = Seq(
      (1L, nearDupBase, ts("2024-01-01 00:00:00")),
      (2L, nearDupFresh, ts("2024-01-01 00:00:10")),
      (3L, nearDupBase + "!", ts("2024-01-01 00:01:00")))
      .toDF("doc_id", "text", "ts")
    val streamed = StreamingOps.streamingNearDup(batch)
      .select("doc_id", "dup_of").distinct()
      .as[(Long, Long)].collect().toSet
      .map { p: (Long, Long) => (math.min(p._1, p._2), math.max(p._1, p._2)) }
    val offline = graft.ops.Dedup.minHashPairs(
        batch.select("doc_id", "text"), "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(streamed == offline, s"streamed $streamed vs offline $offline")
  }

  test("streamingNearDup evicts idle buckets behind the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingOps.streamingNearDup(docs,
        watermark = "10 minutes", retentionMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("neardup_evict_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, nearDupBase, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // push the watermark far past 00:00 + 30min, then let the
      // timeout fire on the following batch
      input.addData((8L, nearDupFresh, ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      input.addData((9L, nearDupFresh + " x", ts("2024-01-01 03:00:30")))
      q.processAllAvailable()
      // doc 1's buckets are gone: an identical copy finds NO match
      input.addData((10L, nearDupBase, ts("2024-01-01 03:01:00")))
      q.processAllAvailable()
      val vs1 = spark.table("neardup_evict_test")
        .filter($"dup_of" === 1L).count()
      assert(vs1 == 0L, s"state for doc 1 should have been evicted, got $vs1 matches")
    } finally q.stop()
  }

  test("streamingPacking carries fill state across batches; matches a replay") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val docs = input.toDF().toDF("doc_id", "n_toks")

    val q = StreamingOps.streamingPacking(docs, capacity = 1000L, groups = 2)
      .writeStream.format("memory").queryName("pack_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // group 0: ids 0,2,4..; group 1: ids 1,3,5..
      input.addData((0L, 400L), (1L, 900L), (2L, 500L))
      q.processAllAvailable()
      // batch 2 must CONTINUE group 0's fill (400+500=900; +200 > 1000
      // would roll -- 900+100 fits History: doc 4 (100) joins bin 0)
      input.addData((4L, 100L), (3L, 200L), (6L, 600L))
      q.processAllAvailable()
      val rows = spark.table("pack_test")
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
      // group 0 arrival order 0,2,4,6: 400 -> b0; +500=900 -> b0;
      // +100=1000 -> b0 (exactly at capacity); 600 -> b1
      // group 1 arrival order 1,3: 900 -> b0; +200 -> b1
      assert(rows == Seq(
        (0L, 0L, 0L, 400L), (1L, 1L, 0L, 900L), (2L, 0L, 0L, 500L),
        (3L, 1L, 1L, 200L), (4L, 0L, 0L, 100L), (6L, 0L, 1L, 600L)))
      // every bin within capacity unless a lone oversize doc
      val over = spark.table("pack_test").groupBy("grp", "bin")
        .agg(org.apache.spark.sql.functions.sum("toks").as("fill"),
          org.apache.spark.sql.functions.count("*").as("n"))
        .filter($"fill" > 1000L && $"n" > 1L).count()
      assert(over == 0L)
    } finally q.stop()
  }
}
