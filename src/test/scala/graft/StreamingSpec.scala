package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream
import graft.streaming.EventStream.Ev

/** Streaming twins (SURVEY §2 block C/H): the same operator logic must
  * hold over unbounded input — windowed agg through watermarks, and
  * sessionization through flatMapGroupsWithState + event-time timeout. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)

  test("streaming windowedAgg matches the batch plan on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = Seq(
      Ev(1L, ts(5), 10.0), Ev(1L, ts(20), 5.0),   // hour 0
      Ev(2L, ts(65), 7.0), Ev(1L, ts(70), 1.0))   // hour 1
    input.addData(events: _*)

    val streamed = EventStream.windowedAgg(
      input.toDF().withColumn("event_type", lit("e")))
    val q = streamed.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select($"hour", $"n_events", $"sum_value").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2))).toSet
      val batch = EventStream.windowedAgg(
        events.toDF().withColumn("event_type", lit("e")))
        .select($"hour", $"n_events", $"sum_value").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2))).toSet
      assert(got == batch && got.size == 2)
    } finally q.stop()
  }

  test("planWatermark closes the e39 audit → withWatermark loop; default-delay aggs pick up the knob") {
    import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
    val sfDir = TestSpark.sf
    val table = graft.queries.Events.e39WatermarkPlan(spark, sfDir).collect()
      .map(r => r.getAs[Long]("delay_s") ->
        ((r.getAs[Long]("drop_e6"), r.getAs[Long]("recommended")))).toMap
    try {
      val d = EventStream.planWatermark(spark, sfDir)
      assert(d.endsWith(" seconds"))
      val secs = d.stripSuffix(" seconds").toLong
      // the knob holds e39's recommended row: within budget, and every
      // smaller candidate over budget (that is what "recommended" means)
      assert(table(secs)._2 == 1L, s"knob $d is not the table's recommended row")
      assert(table(secs)._1 <= 10000L)
      table.keys.filter(_ < secs).foreach(s =>
        assert(table(s)._1 > 10000L, s"a smaller candidate ${s}s already met the budget"))
      assert(spark.conf.get(EventStream.WatermarkDelayKey) == d)
      // streaming twins constructed WITHOUT an explicit delay carry it
      implicit val sqlCtx = spark.sqlContext
      def delaysOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.queryExecution.analyzed.collect {
          case e: EventTimeWatermark => e.delay.microseconds }
      val in = MemoryStream[Ev]
      val streamDf = in.toDF().withColumn("event_type", lit("e"))
      assert(delaysOf(EventStream.windowedAgg(streamDf)) == Seq(secs * 1000000L),
        "windowedAgg did not pick up the configured delay")
      assert(delaysOf(EventStream.hoppingAgg(streamDf)) == Seq(secs * 1000000L))
      // an explicit caller choice still beats the conf — including one
      // that equals the built-in default (the old String-sentinel hole)
      assert(delaysOf(EventStream.windowedAgg(streamDf, Some("30 minutes"))) == Seq(30L * 60000000L))
      assert(delaysOf(EventStream.windowedAgg(streamDf,
        Some(EventStream.DefaultAggWatermark))) == Seq(2L * 3600000000L),
        "an explicit default-valued delay must beat the conf")
    } finally spark.conf.unset(EventStream.WatermarkDelayKey)
  }

  test("streaming hoppingAgg matches the batch plan; 4 windows per event") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = Seq(
      Ev(1L, ts(5), 10.0), Ev(1L, ts(20), 5.0),
      Ev(2L, ts(65), 7.0), Ev(1L, ts(70), 1.0))
    input.addData(events: _*)
    val streamed = EventStream.hoppingAgg(
      input.toDF().withColumn("event_type", lit("e")))
    val q = streamed.writeStream.format("memory").queryName("hop_agg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def shape(df: org.apache.spark.sql.DataFrame) =
        df.select($"w_start", $"n_events", $"sum_value").collect()
          .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2))).toSet
      val got = shape(spark.table("hop_agg"))
      val batch = shape(EventStream.hoppingAgg(
        events.toDF().withColumn("event_type", lit("e"))))
      assert(got == batch)
      assert(spark.table("hop_agg").agg(sum($"n_events")).head.getLong(0)
        == 4L * events.size)
    } finally q.stop()
  }

  test("file-source stream → windowed agg → file sink, end to end") {
    val in = java.nio.file.Files.createTempDirectory("graft-sin").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sout").toString
    // stage the real events table (ts normalized to TimestampType —
    // the raw file stores TIMESTAMP(NANOS)) as the streamed input
    graft.sources.Tables.events(spark, sf).coalesce(1)
      .write.mode("overwrite").parquet(in)
    val streamed = EventStream.windowedAgg(EventStream.readEventStream(spark, in))
    val q = streamed.writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(s"$out/data")
    // append mode only emits watermark-closed windows; all but the last
    // open window(s) must land in the sink
    assert(got.count() > 0)
    assert(got.columns.toSet == Set("hour", "event_type", "n_events", "sum_value"))
  }

  test("checkpoint recovery: a restarted query resumes past committed files, end state equals batch") {
    // The production restart contract: kill the query, more data
    // lands, restart with the SAME checkpoint — the file source must
    // skip every file its commit log already covers (no reprocessing,
    // proven via numInputRows) and the idempotent upsert target must
    // converge to exactly the batch answer over ALL data.
    val in = java.nio.file.Files.createTempDirectory("graft-rec-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-rec-wd").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    val first = ev.filter($"event_id" % 2 === 0)
    val second = ev.filter($"event_id" % 2 === 1)
    first.coalesce(1).write.mode("append").parquet(in)
    val run1 = EventStream.upsertSink(
      EventStream.readEventStream(spark, in),
      s"$wd/target", s"$wd/ckpt",
      keyCols = Seq("user_id"), versionCol = "ts", tieBreak = "value")
    try { run1.processAllAvailable() } finally run1.stop()
    val afterRun1 = spark.read.parquet(s"$wd/target")
      .select($"user_id").distinct().count()
    assert(afterRun1 == first.select($"user_id").distinct().count())
    // new files land while the query is DOWN
    second.coalesce(1).write.mode("append").parquet(in)
    val run2 = EventStream.upsertSink(
      EventStream.readEventStream(spark, in),
      s"$wd/target", s"$wd/ckpt",
      keyCols = Seq("user_id"), versionCol = "ts", tieBreak = "value")
    val processed = try {
      run2.processAllAvailable()
      run2.recentProgress.map(_.numInputRows).sum
    } finally run2.stop()
    // the restarted query read ONLY the second half — the checkpoint's
    // file log, not the target's content, is what prevents rework
    assert(processed == second.count(),
      s"restart reprocessed committed files: read $processed rows")
    // end state = the batch keep-latest over the FULL table
    val got = spark.read.parquet(s"$wd/target").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value"))).toMap
    val expect = graft.merge.MergeOps.upsertLatest(
        ev, Seq("user_id"), "ts", "value").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value"))).toMap
    assert(got == expect)
  }

  test("cdcSink: tombstones leave the snapshot; batch parity; stale-checkpoint replay converges") {
    val in = java.nio.file.Files.createTempDirectory("graft-cdc-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-cdc-wd").toString
    val target = s"$wd/target"
    def changes(rows: (Long, Long, String, Double)*) =
      rows.toSeq.toDF("user_id", "seq", "op", "value")
    val b1 = changes((1L, 1L, "u", 10.0), (2L, 1L, "u", 20.0), (3L, 1L, "u", 30.0))
    val b2 = changes((2L, 2L, "d", 0.0), (3L, 2L, "u", 31.0),
      (4L, 1L, "u", 40.0), (5L, 1L, "d", 0.0)) // 5 = tombstone for a key never held
    def run() = EventStream.cdcSink(
      spark.readStream.schema(b1.schema).parquet(in),
      target, s"$wd/ckpt", Seq("user_id"), Seq("seq"), "op")
    def snapshot(): Map[Long, Double] =
      graft.sources.AtomicSnapshot.readCurrent(spark, target).get.collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    b1.coalesce(1).write.mode("append").parquet(in)
    val q1 = run(); try q1.processAllAvailable() finally q1.stop()
    assert(snapshot() == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // stale checkpoint for the replay act
    def cp(s: java.io.File, d: java.io.File): Unit =
      if (s.isDirectory) { d.mkdirs(); s.listFiles.foreach(f => cp(f, new java.io.File(d, f.getName))) }
      else { java.nio.file.Files.copy(s.toPath, d.toPath); () }
    cp(new java.io.File(s"$wd/ckpt"), new java.io.File(s"$wd/ckpt-stale"))
    b2.coalesce(1).write.mode("append").parquet(in)
    val q2 = run()
    val processed = try { q2.processAllAvailable(); q2.recentProgress.map(_.numInputRows).sum }
      finally q2.stop()
    assert(processed == 4, s"restart reprocessed committed files: $processed")
    // user 2 DELETED (gone, not kept-at-last-version), 3 updated, 4
    // inserted, 5's tombstone for an unseen key is a no-op
    val expect = Map(1L -> 10.0, 3L -> 31.0, 4L -> 40.0)
    assert(snapshot() == expect)
    // batch parity: one cdcApply over the full log from an empty base
    val batchAll = graft.merge.MergeOps.cdcApply(
        b1.limit(0).drop("seq", "op"), b1.unionByName(b2),
        Seq("user_id"), Seq("seq"), "op")
      .filter($"outcome" =!= "deleted").drop("outcome").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    assert(batchAll == expect)
    // replay act: restart from the STALE checkpoint — batch 2 is
    // redelivered onto the post-apply snapshot and must change nothing
    val q3 = EventStream.cdcSink(
      spark.readStream.schema(b1.schema).parquet(in),
      target, s"$wd/ckpt-stale", Seq("user_id"), Seq("seq"), "op")
    val replayed = try { q3.processAllAvailable(); q3.recentProgress.map(_.numInputRows).sum }
      finally q3.stop()
    assert(replayed == 4, s"stale checkpoint should redeliver: $replayed")
    assert(snapshot() == expect, "replayed tombstones/upserts must be no-ops")
  }

  test("jdbcUpsertSink: live-Derby merge converges to batch; crash-replay is idempotent") {
    // the reference's real deployment shape: streaming merge into a
    // RUNNING database. Three acts: (1) normal run equals the batch
    // keep-latest; (2) restart with more data reads only new files;
    // (3) a crash-REPLAY (restart from a stale checkpoint copy — the
    // sanctioned way to force foreachBatch redelivery in Spark 4)
    // re-applies a committed micro-batch and the table STILL equals
    // the batch answer: newer-or-equal replacement = idempotence.
    val base = java.nio.file.Files.createTempDirectory("graft-jdbc-sink").toString
    System.setProperty("derby.system.home", base)
    val url = s"jdbc:derby:$base/sinkdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE latest_ev (
        |  user_id BIGINT NOT NULL PRIMARY KEY,
        |  ts TIMESTAMP, value DOUBLE, event_id BIGINT)""".stripMargin)
    conn.close()
    val in = java.nio.file.Files.createTempDirectory("graft-jdbc-in").toString
    val ckpt = s"$base/ckpt"
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"value", $"event_id")
    val first = ev.filter($"event_id" % 2 === 0)
    val second = ev.filter($"event_id" % 2 === 1)
    def table(): Map[Long, (Long, Double, Long)] = {
      val raw = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "latest_ev").load()
      raw.toDF(raw.columns.map(_.toLowerCase).toIndexedSeq: _*).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Double]("value"),
            r.getAs[Long]("event_id"))).toMap
    }
    def expect(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double, Long)] =
      graft.merge.MergeOps.upsertLatest(df, Seq("user_id"), "ts", "event_id")
        .collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Double]("value"),
            r.getAs[Long]("event_id"))).toMap
    def run() = EventStream.jdbcUpsertSink(
      spark.readStream.schema(ev.schema).parquet(in),
      url, "latest_ev", ckpt,
      keyCols = Seq("user_id"), versionCol = "ts", tieBreak = "event_id")
    // act 1: first half lands, table = batch keep-latest of it
    first.coalesce(1).write.mode("append").parquet(in)
    val q1 = run(); try q1.processAllAvailable() finally q1.stop()
    assert(table() == expect(first))
    // stale checkpoint copy taken at the committed point (act 3's fuel)
    val stale = s"$base/ckpt-stale"
    def cp(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) { dst.mkdirs(); src.listFiles.foreach(f => cp(f, new java.io.File(dst, f.getName))) }
      else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    cp(new java.io.File(ckpt), new java.io.File(stale))
    // act 2: second half lands while the query is down; restart reads
    // ONLY the new files and the table converges to the full answer
    second.coalesce(1).write.mode("append").parquet(in)
    val q2 = run()
    val processed = try { q2.processAllAvailable(); q2.recentProgress.map(_.numInputRows).sum }
      finally q2.stop()
    assert(processed == second.count(), s"restart reprocessed committed files: $processed")
    assert(table() == expect(ev))
    // act 3: crash-replay — restart from the STALE checkpoint so the
    // second half is REDELIVERED into the already-merged table
    val q3 = EventStream.jdbcUpsertSink(
      spark.readStream.schema(ev.schema).parquet(in),
      url, "latest_ev", stale,
      keyCols = Seq("user_id"), versionCol = "ts", tieBreak = "event_id")
    val replayed = try { q3.processAllAvailable(); q3.recentProgress.map(_.numInputRows).sum }
      finally q3.stop()
    assert(replayed == second.count(), s"stale checkpoint should redeliver: $replayed")
    assert(table() == expect(ev), "replay must be idempotent — table diverged")
  }

  test("JdbcUpsert binds NULL values through the statement's declared types") {
    val base = java.nio.file.Files.createTempDirectory("graft-jdbc-null").toString
    System.setProperty("derby.system.home", base)
    val url = s"jdbc:derby:$base/nulldb;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      "CREATE TABLE kv (k BIGINT NOT NULL PRIMARY KEY, v DOUBLE, note VARCHAR(20), ver BIGINT, tie BIGINT)")
    c.close()
    val df = Seq[(Long, Option[Double], Option[String], Long, Long)](
      (1L, Some(1.5), None, 1L, 1L),       // insert with a NULL string
      (2L, None, Some("x"), 1L, 1L),       // insert with a NULL double
      (1L, None, Some("upd"), 2L, 1L)      // update key 1 TO a null double
    ).toDF("k", "v", "note", "ver", "tie")
    graft.sources.JdbcUpsert.upsert(df, url, "kv", Seq("k"), "ver", "tie")
    val got = {
      val raw = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "kv").load()
      raw.toDF(raw.columns.map(_.toLowerCase).toIndexedSeq: _*).collect()
        .map(r => r.getAs[Long]("k") ->
          (Option(r.getAs[java.lang.Double]("v")), Option(r.getAs[String]("note")))).toMap
    }
    assert(got == Map(1L -> (None, Some("upd")), 2L -> (None, Some("x"))))
  }

  test("streaming near-dup ingest: batch-parity with d11, cross-batch dedup, replay converges") {
    import graft.streaming.DocStream
    val base = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val (in, idx, dec, ckpt) = (s"$base/in", s"$base/index", s"$base/decisions", s"$base/ckpt")
    val docs = graft.sources.Tables.read(spark, TestSpark.sf, "documents")
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val fresh = docs.filter($"doc_id" % 5 === 0)
    // one file per micro-batch: replay from a stale checkpoint must
    // re-deliver the SAME batch boundaries (ids 1, 2), not coalesce
    // both pending files into one batch
    def run(cp: String = ckpt) = DocStream.nearDupIngestSink(
      spark.readStream.option("maxFilesPerTrigger", 1).schema(docs.schema).parquet(in),
      idx, dec, cp)
    def decisions(b: Long) = spark.read.parquet(dec).filter($"ingest_batch" === b)

    // batch 0: the corpus lands against an EMPTY index — everything keeps
    corpus.coalesce(1).write.mode("append").parquet(in)
    val q0 = run(); try q0.processAllAvailable() finally q0.stop()
    assert(decisions(0).filter($"verdict" === "drop").count() == 0)
    assert(decisions(0).count() == corpus.count())

    // stale checkpoint copy (the pre-batch-1 crash point, cdcSink's pattern)
    val stale = s"$base/ckpt-stale"
    def cpDir(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) { dst.mkdirs(); src.listFiles.foreach(f => cpDir(f, new java.io.File(dst, f.getName))) }
      else { java.nio.file.Files.copy(src.toPath, dst.toPath); () }
    }
    cpDir(new java.io.File(ckpt), new java.io.File(stale))

    // batch 1: the %5=0 docs against the corpus index — EXACTLY d11
    fresh.coalesce(1).write.mode("append").parquet(in)
    val q1 = run(); try q1.processAllAvailable() finally q1.stop()
    assert(decisions(1).count() == fresh.count(), "every fresh doc gets a verdict")
    val got = decisions(1).filter($"verdict" === "drop")
      .select($"doc_id", $"n_corpus_matches", $"min_match_id", $"max_est")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val want = graft.dedup.Dedup.d11IncrementalNearDup(spark, TestSpark.sf)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(want.nonEmpty, "fixture must contain batch-vs-corpus near-dups")
    assert(got == want, "streaming verdicts diverged from batch d11")
    // the index holds exactly the kept signable docs of both batches
    val idxIds = spark.read.parquet(idx).select("doc_id", "ingest_batch")
    val keptSignable = spark.read.parquet(dec).filter($"verdict" === "keep")
      .join(graft.dedup.Dedup.signaturesOf(docs).select("doc_id"), Seq("doc_id"), "left_semi")
    assert(idxIds.count() == keptSignable.count())

    // batch 2: a near-copy of a KEPT batch-1 doc — cross-batch dedup
    // (the doc matches batch 1's index appends, not just batch 0's)
    val keptB1 = decisions(1).filter($"verdict" === "keep")
      .join(spark.read.parquet(idx).select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id").orderBy("doc_id").limit(1)
      .collect().headOption.map(_.getLong(0))
    assume(keptB1.nonEmpty, "need a kept signable batch-1 doc for the cross-batch case")
    docs.filter($"doc_id" === keptB1.get)
      .withColumn("doc_id", $"doc_id" + 1000000L)
      .coalesce(1).write.mode("append").parquet(in)
    val q2 = run(); try q2.processAllAvailable() finally q2.stop()
    val b2 = decisions(2).collect()
    assert(b2.length == 1 && b2.head.getAs[String]("verdict") == "drop",
      s"verbatim copy of a kept cross-batch doc must drop: ${b2.toSeq}")

    // replay: restart from the STALE checkpoint — batches 1 and 2 are
    // REDELIVERED; idempotent partition overwrites converge to the
    // same decisions and the same index
    val preDec = spark.read.parquet(dec).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val preIdx = spark.read.parquet(idx).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val qr = run(stale); try qr.processAllAvailable() finally qr.stop()
    val postDec = spark.read.parquet(dec).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val postIdx = spark.read.parquet(idx).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(postDec == preDec, "replay changed the decisions table")
    assert(postIdx == preIdx, "replay changed the corpus index")
  }

  test("JdbcUpsert compares across driver/Spark boxing differences (INTEGER column vs Long version)") {
    // the probe reads back java.lang.Integer where Spark holds Long —
    // raw Comparable.compareTo would throw ClassCastException; the
    // normalized comparison must instead decide newer/older correctly.
    // Also exercises the BATCHED probe across chunks (batchSize=2 over
    // 5 keys → 3 probe round trips) and timestamp tie-breaks.
    val base = java.nio.file.Files.createTempDirectory("graft-jdbc-mixed").toString
    System.setProperty("derby.system.home", base)
    val url = s"jdbc:derby:$base/mixeddb;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      "CREATE TABLE mx (k INTEGER NOT NULL PRIMARY KEY, v VARCHAR(10), ver INTEGER, tie TIMESTAMP)")
    c.createStatement().executeUpdate(
      "INSERT INTO mx VALUES (1, 'old', 1, TIMESTAMP('2024-01-01 00:00:00'))")
    c.createStatement().executeUpdate(
      "INSERT INTO mx VALUES (2, 'new', 9, TIMESTAMP('2024-01-01 00:00:00'))")
    c.close()
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val df = Seq(
      (1L, "upd", 2L, t0),   // newer version → replaces despite Integer-vs-Long boxing
      (2L, "los", 3L, t0),   // older than stored 9 → skipped
      (3L, "in3", 1L, t0), (4L, "in4", 1L, t0), (5L, "in5", 1L, t0) // chunked inserts
    ).toDF("k", "v", "ver", "tie")
    graft.sources.JdbcUpsert.upsert(df, url, "mx", Seq("k"), "ver", "tie", batchSize = 2)
    val got = {
      val raw = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "mx").load()
      raw.toDF(raw.columns.map(_.toLowerCase).toIndexedSeq: _*).collect()
        .map(r => r.getAs[Int]("k").toLong -> r.getAs[String]("v")).toMap
    }
    assert(got == Map(1L -> "upd", 2L -> "new", 3L -> "in3", 4L -> "in4", 5L -> "in5"))
  }

  test("streaming funnel emits stages in order, ignores out-of-order purchases") {
    implicit val sqlCtx = spark.sqlContext
    import EventStream.FEv
    val input = MemoryStream[FEv]
    val q = EventStream.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // user 1 completes across two batches; user 2 purchases before viewing
      input.addData(FEv(1L, ts(0), "view"), FEv(1L, ts(5), "click"),
        FEv(2L, ts(0), "purchase"), FEv(2L, ts(5), "view"))
      q.processAllAvailable()
      input.addData(FEv(1L, ts(10), "purchase"), FEv(2L, ts(20), "error"))
      q.processAllAvailable()
      val got = spark.table("funnel_stream").as[EventStream.StageOut].collect()
      val u1 = got.filter(_.user_id == 1L).map(_.stage).toSet
      assert(u1 == Set("view", "click", "purchase"))
      val u2 = got.filter(_.user_id == 2L).map(_.stage).toSet
      assert(u2 == Set("view"))  // premature purchase never counts
    } finally q.stop()
  }

  test("streaming dedup drops replayed ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // Ev has no id column; reuse (user_id, ts) as the dedup key
    val deduped = EventStream.dedupStream(input.toDF(), Seq("user_id", "ts"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(0), 1.0), Ev(2L, ts(1), 2.0))
      q.processAllAvailable()
      input.addData(Ev(1L, ts(0), 1.0))  // replay in a later batch
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
    } finally q.stop()
  }

  test("foreachBatch upsert sink keeps latest version per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val input = MemoryStream[Ev]
    val q = EventStream.upsertSink(input.toDF(), s"$dir/target", s"$dir/ckpt",
      keyCols = Seq("user_id"), versionCol = "ts", tieBreak = "value")
    try {
      input.addData(Ev(1L, ts(0), 1.0), Ev(2L, ts(1), 2.0))
      q.processAllAvailable()
      input.addData(Ev(1L, ts(5), 9.0))  // newer version for user 1
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/target").collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
      assert(got == Map(1L -> 9.0, 2L -> 2.0))
    } finally q.stop()
  }

  test("stream-static dimension join enriches events in flight") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(Ev(1L, ts(0), 1.0), Ev(2L, ts(1), 2.0), Ev(999L, ts(2), 3.0))
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val joined = input.toDF().join(dim, Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => r.getAs[Long]("user_id") -> Option(r.getAs[String]("tier"))).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> Some("silver"), 999L -> None))
    } finally q.stop()
  }

  test("stateful sessionize emits gap-closed and timeout-closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = EventStream.sessionize(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has two events 10 min apart (one open session)
      input.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(10), 2.0))
      q.processAllAvailable()
      // batch 2: event past the gap closes session 1 in-stream; the far
      // event advances the watermark so user 1's new session times out
      input.addData(Ev(1L, ts(60), 3.0), Ev(2L, ts(300), 4.0))
      q.processAllAvailable()
      // batch 3: push the watermark far enough to time out everything
      input.addData(Ev(3L, ts(1000), 0.0))
      q.processAllAvailable()

      val got = spark.table("sessions").as[EventStream.SessionOut].collect()
      val u1 = got.filter(_.user_id == 1L).sortBy(_.start_us)
      assert(u1.length == 2)
      assert(u1(0).n_events == 2 && u1(0).sum_value == 3.0)
      assert(u1(1).n_events == 1 && u1(1).sum_value == 3.0)
      assert(got.count(_.user_id == 2L) == 1)
    } finally q.stop()
  }

  test("a completed funnel is never reopened, even after the idle timeout passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.FEv]
    val q = EventStream.funnelStream(input.toDS(), idleTimeoutMinutes = 60)
      .writeStream.format("memory").queryName("funnel_done")
      .outputMode("append").start()
    try {
      // user 1 completes the funnel
      input.addData(EventStream.FEv(1L, ts(0), "view"),
        EventStream.FEv(1L, ts(1), "click"), EventStream.FEv(1L, ts(2), "purchase"))
      q.processAllAvailable()
      // push the watermark far past the idle timeout while user 1 is quiet
      input.addData(EventStream.FEv(2L, ts(500), "view"))
      q.processAllAvailable()
      // user 1 comes back: these must NOT open a second funnel
      input.addData(EventStream.FEv(1L, ts(600), "view"),
        EventStream.FEv(1L, ts(601), "click"), EventStream.FEv(1L, ts(602), "purchase"))
      q.processAllAvailable()
      val u1 = spark.table("funnel_done").as[EventStream.StageOut]
        .collect().filter(_.user_id == 1L)
      assert(u1.length == 3, s"duplicate funnel stages: ${u1.toSeq}")
      assert(u1.map(_.stage).sorted.toSeq == Seq("click", "purchase", "view"))
      // user 2's PARTIAL funnel does evict on idle: a fresh view after
      // the timeout re-emits (first-completion semantics restart)
      input.addData(EventStream.FEv(3L, ts(2000), "view"))
      q.processAllAvailable()
      input.addData(EventStream.FEv(2L, ts(2100), "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_done").as[EventStream.StageOut]
        .collect().count(_.user_id == 2L) == 2)
    } finally q.stop()
  }

  test("sessionize value guard matches the batch DECIMAL(18,4) range exactly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = EventStream.sessionize(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.format("memory").queryName("sessions_guard")
      .outputMode("append").start()
    try {
      // 5e14 is inside the old longValueExact bound (9e14) but OUTSIDE
      // DECIMAL(18,4)'s 14 integer digits — the batch cast NULLs it,
      // so the stream must contribute 0, not 5e14; 9.9e13 is in range
      // on both sides and must survive
      input.addData(Ev(1L, ts(0), 5e14), Ev(1L, ts(1), 2.5),
        Ev(2L, ts(0), 9.9e13))
      q.processAllAvailable()
      input.addData(Ev(3L, ts(5000), 0.0)) // watermark seal
      q.processAllAvailable()
      val got = spark.table("sessions_guard").as[EventStream.SessionOut]
        .collect().map(s => s.user_id -> s.sum_value).toMap
      assert(got(1L) == 2.5)
      assert(got(2L) == 9.9e13)
    } finally q.stop()
  }

  test("sessionize merges an in-watermark late event into a timeline-closed session") {
    // the append-mode divergence case: event A, then B past the gap
    // (A "closes" on the timeline), then a LATE event between them
    // still inside the watermark that bridges A and B — batch e2 sees
    // ONE session, and so must the stream (hold-until-sealed)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      input.addData(Ev(1L, ts(0), 1.0, 1L))
      q.processAllAvailable()
      input.addData(Ev(1L, ts(45), 2.0, 2L)) // 45 min > gap: A closes on the timeline
      q.processAllAvailable()
      input.addData(Ev(1L, ts(20), 4.0, 3L)) // late bridge, inside the 2h watermark
      q.processAllAvailable()
      input.addData(Ev(2L, ts(10000), 0.0, 4L)) // seal everything
      q.processAllAvailable()
      val u1 = spark.table("sess_late").as[EventStream.SessionOut]
        .collect().filter(_.user_id == 1L)
      assert(u1.length == 1, s"bridged session split: ${u1.toSeq}")
      assert(u1.head.n_events == 3 && u1.head.sum_value == 7.0)
      assert(u1.head.start_us == ts(0).getTime * 1000 &&
        u1.head.end_us == ts(45).getTime * 1000)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch plan; late right rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = EventStream.intervalJoinStream(
      clicks.toDF().withColumnRenamed("event_id", "click_id"),
      purchases.toDF().withColumnRenamed("event_id", "purchase_id"),
      key = "user_id", windowMinutes = 30, watermark = "10 minutes")
      .select($"click_id", $"purchase_id")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1L, ts(0), 0, 1L), Ev(1L, ts(100), 0, 2L), Ev(2L, ts(0), 0, 3L))
      purchases.addData(
        Ev(1L, ts(10), 0, 91L),   // within 30 min of click 1
        Ev(1L, ts(40), 0, 92L),   // past click 1's window, before click 2
        Ev(1L, ts(110), 0, 93L),  // within click 2's window
        Ev(3L, ts(10), 0, 94L))   // no matching user
      q.processAllAvailable()
      val got = spark.table("ivj").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
      assert(got == Set((1L, 91L), (2L, 93L)))
      // the SAME operator over batch frames gives the same pairs
      val batchPairs = EventStream.intervalJoinStream(
        Seq(Ev(1L, ts(0), 0, 1L), Ev(1L, ts(100), 0, 2L), Ev(2L, ts(0), 0, 3L))
          .toDF().withColumnRenamed("event_id", "click_id"),
        Seq(Ev(1L, ts(10), 0, 91L), Ev(1L, ts(40), 0, 92L),
          Ev(1L, ts(110), 0, 93L), Ev(3L, ts(10), 0, 94L))
          .toDF().withColumnRenamed("event_id", "purchase_id"),
        key = "user_id", windowMinutes = 30)
        .select($"click_id", $"purchase_id").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
      assert(batchPairs == got)
    } finally q.stop()
  }

  test("as-of: left emits only after the watermark passes it; rights buffer across batches") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[ARow]
    val rIn = MemoryStream[ARow]
    val q = EventStream.asofJoinStream(lIn.toDF(), rIn.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("asof_unit")
      .outputMode("append").start()
    try {
      lIn.addData(ARow(1L, ts(10), 91L))
      q.processAllAvailable()
      // watermark has not passed the left row — nothing may emit yet
      assert(spark.table("asof_unit").count() == 0)
      // the matching right arrives LATER in wall-clock but EARLIER in
      // event time (out-of-order within the watermark window)
      rIn.addData(ARow(1L, ts(5), 7L))
      q.processAllAvailable()
      assert(spark.table("asof_unit").count() == 0)
      // a far-future right pushes the watermark past the left row:
      // it flushes, matched to the buffered t5 click — NOT the later one
      rIn.addData(ARow(1L, ts(120), 8L))
      q.processAllAvailable()
      val got = spark.table("asof_unit").as[EventStream.AsofOut].collect()
      assert(got.toSeq == Seq(EventStream.AsofOut(
        1L, 91L, 1704067200000000L + 10L * 60000000L,
        Some(7L), Some(1704067200000000L + 5L * 60000000L))))
      // a left with NO preceding right emits a null match (left-join)
      lIn.addData(ARow(2L, ts(130), 92L))
      rIn.addData(ARow(-1L, ts(400), 0L))
      q.processAllAvailable()
      val u2 = spark.table("asof_unit").as[EventStream.AsofOut].collect()
        .filter(_.key == 2L)
      assert(u2.toSeq == Seq(EventStream.AsofOut(
        2L, 92L, 1704067200000000L + 130L * 60000000L, None, None)))
    } finally q.stop()
  }

  test("streaming as-of join is EXACTLY the batch e6 on real data, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("key"), $"ts", $"event_id".as("id")).as[ARow]
      .collect().sortBy(r => (r.ts.getTime, r.id))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("key"), $"ts", $"event_id".as("id")).as[ARow]
      .collect().sortBy(r => (r.ts.getTime, r.id))
    // three chronological phases over BOTH streams so the shared
    // union watermark advances coherently
    val cuts = Seq(0.33, 0.66, 1.01).map { f =>
      val all = (clicks ++ purchases).map(_.ts.getTime).sorted
      all((all.length * f).toInt.min(all.length - 1))
    }
    val lIn = MemoryStream[ARow]
    val rIn = MemoryStream[ARow]
    val q = EventStream.asofJoinStream(lIn.toDF(), rIn.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode("append").start()
    try {
      var prevCut = Long.MinValue
      cuts.foreach { cut =>
        val lc = purchases.filter(p => p.ts.getTime > prevCut && p.ts.getTime <= cut)
        val rc = clicks.filter(c => c.ts.getTime > prevCut && c.ts.getTime <= cut)
        if (lc.nonEmpty) lIn.addData(lc: _*)
        if (rc.nonEmpty) rIn.addData(rc: _*)
        q.processAllAvailable()
        prevCut = cut
      }
      rIn.addData(ARow(-1L, new java.sql.Timestamp(
        prevCut + 30L * 24 * 3600 * 1000), 0L))
      q.processAllAvailable()
      val streamed = spark.table("asof_parity").as[EventStream.AsofOut].collect()
        .filter(_.key >= 0)
        .map(o => (o.key, o.left_id, o.left_us, o.asof_right_id, o.right_us)).toSet
      val batch = graft.queries.Events.e6AsofJoin(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"),
          r.getAs[Long]("purchase_ts_us"),
          Option(r.getAs[java.lang.Long]("asof_click_id")).map(Long.unbox),
          Option(r.getAs[java.lang.Long]("click_ts_us")).map(Long.unbox))).toSet
      assert(streamed == batch,
        s"streaming-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming sessionize is EXACTLY the batch e2 on real data, across micro-batches") {
    // the twin claim, proven end-to-end: the full sf0.001 events table
    // fed through three chronological micro-batches + a watermark-
    // flushing sentinel must reproduce batch e2's sessions bit-for-bit
    // (same (ts, event_id) tie-break, same decimal-exact sums)
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"value", $"event_id").as[Ev]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    assert(evs.length > 100)
    val chunks = evs.grouped(math.max(1, evs.length / 3 + 1)).toSeq
    val sentinel = Ev(-1L, new java.sql.Timestamp(
      evs.last.ts.getTime + 30L * 24 * 3600 * 1000), 0.0)

    val input = MemoryStream[Ev]
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      input.addData(sentinel); q.processAllAvailable()
      val streamed = spark.table("sess_parity").as[EventStream.SessionOut].collect()
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, s.start_us, s.end_us, s.n_events, s.sum_value)).toSet
      val batch = graft.queries.Events.e2Sessionize(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))).toSet
      assert(streamed == batch,
        s"streaming-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("native session_window stream is EXACTLY the batch e14 on real data") {
    // same twin claim for the BUILT-IN sessionizer: identical
    // declarative plan both modes, so the full sf0.001 table through
    // chronological micro-batches must reproduce batch e14 bit-for-bit
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"value", $"event_id").as[Ev]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val chunks = evs.grouped(math.max(1, evs.length / 3 + 1)).toSeq
    val sentinel = Ev(-1L, new java.sql.Timestamp(
      evs.last.ts.getTime + 30L * 24 * 3600 * 1000), 0.0)

    val input = MemoryStream[Ev]
    val q = EventStream.sessionWindowAgg(input.toDS().toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sw_parity")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      input.addData(sentinel); q.processAllAvailable()
      val streamed = spark.table("sw_parity").collect()
        .filter(_.getAs[Long]("user_id") >= 0)
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("last_us"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))).toSet
      val batch = graft.queries.Events.e14SessionWindow(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("last_us"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))).toSet
      assert(streamed == batch,
        s"streaming-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming gap fill emits explicit zero rows for silent hours") {
    import graft.streaming.EventStream.GEv
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L // ts(0), an exact hour boundary
    def hourUs(k: Long) = (base + k * 3600000L) * 1000L
    val input = MemoryStream[GEv]
    val q = EventStream.gapFillStream(input.toDS())
      .writeStream.format("memory").queryName("gap_fill")
      .outputMode("append").start()
    try {
      // hours 0 and 3 carry data; 1, 2 are holes
      input.addData(GEv("e", ts(5), 10.0), GEv("e", ts(20), 2.5), GEv("e", ts(185), 4.0))
      q.processAllAvailable()
      // two advancer batches on a DIFFERENT key push the watermark
      // past hour 9; "e" flushes purely via its event-time timeout
      input.addData(GEv("adv", ts(605), 1.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(615), 1.0))
      q.processAllAvailable()
      val got = spark.table("gap_fill").filter($"event_type" === "e").collect()
        .map(r => (r.getAs[Long]("hour_us"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))).sortBy(_._1)
      val expected = (0L to 9L).map { k =>
        k match {
          case 0L => (hourUs(0), 2L, 12.5)
          case 3L => (hourUs(3), 1L, 4.0)
          case _  => (hourUs(k), 0L, 0.0)
        }
      }
      assert(got.toSeq == expected,
        s"got ${got.toSeq.map(x => (x._1 - hourUs(0)) / 3600000000L -> x._2)}")
      // non-zero rows match the batch twin's aggregation exactly
      val nonZero = got.filter(_._2 > 0).toSet
      assert(nonZero == Set((hourUs(0), 2L, 12.5), (hourUs(3), 1L, 4.0)))
    } finally q.stop()
  }

  test("gap fill counts same-batch events in hours before the first-seen event") {
    import graft.streaming.EventStream.GEv
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GEv]
    val q = EventStream.gapFillStream(input.toDS())
      .writeStream.format("memory").queryName("gap_fill_order")
      .outputMode("append").start()
    try {
      // the hour-5 event first, the hour-4 event second, ONE batch —
      // the frontier must initialize from the batch minimum
      input.addData(GEv("e", ts(305), 1.0), GEv("e", ts(245), 2.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(500), 1.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(510), 1.0))
      q.processAllAvailable()
      val got = spark.table("gap_fill_order").filter($"event_type" === "e").collect()
        .map(r => ((r.getAs[Long]("hour_us") / 3600000000L) % 100,
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).sortBy(_._1)
      // both hours present with their one event each — a first-seen
      // frontier would have dropped the hour-4 event (sum_value 2.0)
      assert(got.exists(h => h._2 == 1L && h._3 == 2.0) &&
        got.exists(h => h._2 == 1L && h._3 == 1.0),
        s"hour-4 event lost: ${got.toSeq}")
    } finally q.stop()
  }

  test("gap fill: one far-future event cannot flood zeros past the cap") {
    import graft.streaming.EventStream.GEv
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GEv]
    val q = EventStream.gapFillStream(input.toDS(), maxSilentHours = 3)
      .writeStream.format("memory").queryName("gap_fill_poison")
      .outputMode("append").start()
    try {
      input.addData(GEv("e", ts(5), 1.0))
      q.processAllAvailable()
      // bad-clock event ~10000 hours ahead jumps the watermark
      input.addData(GEv("e", ts(10000L * 60), 9.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(10010L * 60), 1.0))
      q.processAllAvailable()
      val r = spark.table("gap_fill_poison").filter($"event_type" === "e").collect()
      // two data rows + at most cap zeros PER GAP (before the poison
      // hour, and trailing after it) — never the ~10000 zero rows of
      // an uncapped fill
      val zeros = r.count(_.getAs[Long]("n_events") == 0L)
      assert(zeros <= 2 * 3 && r.length <= 2 + 2 * 3,
        s"zero flood: ${r.length} rows, $zeros zeros")
    } finally q.stop()
  }

  test("gap fill drops state after the silent-hour cap and resumes fresh") {
    import graft.streaming.EventStream.GEv
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GEv]
    val q = EventStream.gapFillStream(input.toDS(), maxSilentHours = 2)
      .writeStream.format("memory").queryName("gap_fill_cap")
      .outputMode("append").start()
    try {
      input.addData(GEv("e", ts(5), 1.0))
      q.processAllAvailable()
      // silence far beyond the cap, then the series resumes
      input.addData(GEv("adv", ts(100 * 60), 1.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(101 * 60), 1.0))
      q.processAllAvailable()
      input.addData(GEv("e", ts(120 * 60 + 5), 2.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(125 * 60), 1.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(126 * 60), 1.0))
      q.processAllAvailable()
      val hours = spark.table("gap_fill_cap").filter($"event_type" === "e").collect()
        .map(r => ((r.getAs[Long]("hour_us") / 3600000000L) -
          (1704067200000L / 3600000L), r.getAs[Long]("n_events"))).sortBy(_._1)
      // hour 0 (data), a few capped zeros (cap 2 → hours 1-3 at most),
      // then NOTHING until the series resumes at hour 120 — the
      // 100-hour silence is not back-filled
      assert(hours.exists(h => h._1 == 0L && h._2 == 1L))
      assert(hours.exists(h => h._1 == 120L && h._2 == 1L))
      assert(!hours.exists(h => h._1 > 3L && h._1 < 120L),
        s"silence was back-filled: $hours")
    } finally q.stop()
  }

  test("anomaly stream flags exactly the prefix-stats z-test over the gap-filled series") {
    import graft.streaming.EventStream.GEv
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def hourUs(k: Long) = (base + k * 3600000L) * 1000L
    val input = MemoryStream[GEv]
    val q = EventStream.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode("append").start()
    try {
      // hour counts per type "e": h0=2, h1=0 (hole), h2=1, h3=30 (spike)
      input.addData(Seq(GEv("e", ts(5), 1.0), GEv("e", ts(20), 1.0),
        GEv("e", ts(125), 1.0)) ++
        (0 until 30).map(i => GEv("e", ts(185 + (i % 10)), 1.0)): _*)
      q.processAllAvailable()
      // advancer batches on a different key push the watermark past h3
      input.addData(GEv("adv", ts(605), 1.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(615), 1.0))
      q.processAllAvailable()
      val got = spark.table("anom_stream").filter($"event_type" === "e").collect()
        .map(r => (r.getAs[Long]("hour_us"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_prior"), r.getAs[Boolean]("is_anomaly"))).sortBy(_._1)
      // driver-side prefix recomputation (the operator's contract);
      // the advancer watermark (min 614) also flushes the trailing
      // zero hours 4..9 — post-spike silence must NOT flag (the spike
      // inflates the prefix variance enough to cover zeros)
      val series = Seq(2L, 0L, 1L, 30L, 0L, 0L, 0L, 0L, 0L, 0L)
      val expected = series.zipWithIndex.map { case (x, i) =>
        val prior = series.take(i)
        val n = BigInt(prior.length); val s = prior.map(BigInt(_)).sum
        val qq = prior.map(v => BigInt(v) * v).sum
        val dev = n * x - s
        (hourUs(i), x, prior.length.toLong,
          prior.length >= 2 && dev * dev > 4 * (n * qq - s * s))
      }
      assert(got.toSeq == expected, s"got ${got.toSeq}")
      // the constructed spike IS flagged, and nothing before it is
      // (warm-up hours have < 2 priors; the hole and the 1-count hour
      // sit inside 2σ of their prefixes)
      assert(got.count(_._4) == 1 && got(3)._4,
        "exactly the planted spike must flag")
    } finally q.stop()
  }

  test("burst stream closes and emits exactly e38's trailing-window runs over the gap-filled series") {
    import graft.streaming.EventStream.GEv
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def hourUs(k: Long) = (base + k * 3600000L) * 1000L
    val input = MemoryStream[GEv]
    val q = EventStream.burstStream(input.toDS())
      .writeStream.format("memory").queryName("burst_stream")
      .outputMode("append").start()
    try {
      // hourly counts for "e": six warm-up hours (below minPrev no
      // flag is possible), a two-hour sustained burst, then cool-down
      // hours that close the run and get flushed by the advancer
      val series = Seq(2L, 2L, 2L, 2L, 2L, 2L, 10L, 12L, 1L, 2L, 2L)
      val evs = series.zipWithIndex.flatMap { case (n, h) =>
        (0L until n).map(i => GEv("e", ts(60 * h + i.toInt % 50), 1.0))
      }
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(GEv("adv", ts(60 * 12 + 5), 1.0))
      q.processAllAvailable()
      input.addData(GEv("adv", ts(60 * 12 + 15), 1.0))
      q.processAllAvailable()
      val got = spark.table("burst_stream").filter($"event_type" === "e").collect()
        .map(r => (r.getAs[Long]("run_start_us"), r.getAs[Long]("run_end_us"),
          r.getAs[Long]("n_hours"), r.getAs[Long]("peak"), r.getAs[Long]("total")))
        .sortBy(_._1)
      // driver recompute of e38's contract: trailing ≤24-hour window,
      // cross-multiplied 1.5× test, minPrev 6, maximal flagged runs
      val flagged = series.zipWithIndex.map { case (x, i) =>
        val prev = series.slice(math.max(0, i - 24), i)
        prev.length >= 6 && x * prev.length * 100L > 150L * prev.sum
      }
      val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      var run = List.empty[Int]
      (flagged.zipWithIndex :+ (false, series.length)).foreach {
        case (true, i)  => run = i :: run
        case (false, _) if run.nonEmpty =>
          val hs = run.reverse
          expected += ((hourUs(hs.head), hourUs(hs.last), hs.length.toLong,
            hs.map(series).max, hs.map(series).sum))
          run = Nil
        case _ =>
      }
      assert(expected.nonEmpty, "fixture must contain a burst")
      assert(got.toSeq == expected.toSeq, s"got ${got.toSeq} want $expected")
      // the planted burst: hours 6-7, peak 12, volume 22
      assert(got.head == ((hourUs(6), hourUs(7), 2L, 12L, 22L)))
    } finally q.stop()
  }

  test("streaming CMS grid equals the batch grid on the same data (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val rows = (1 to 200).map(i => Ev(i.toLong % 17, ts(i % 90), 1.0))
    input.addData(rows: _*)
    val q = EventStream.cmsGrid(input.toDF())
      .writeStream.format("memory").queryName("cms_grid")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cms_grid").collect()
        .map(r => (r.getAs[Int]("i"), r.getAs[Long]("j")) -> r.getAs[Long]("c")).toMap
      val batch = EventStream.cmsGrid(rows.toDF()).collect()
        .map(r => (r.getAs[Int]("i"), r.getAs[Long]("j")) -> r.getAs[Long]("c")).toMap
      assert(got == batch && got.nonEmpty)
      // the state bound: never more than d×w grid rows
      assert(got.size <= 4 * 64)
    } finally q.stop()
  }

  test("streaming KMV per-hour distinct sketch matches the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // 40 users across 2 hours, with repeats — k=8 caps the kept mins
    val rows = (1 to 120).map(i => Ev(i.toLong % 40, ts(if (i % 3 == 0) 10 else 70), 1.0))
    input.addData(rows: _*)
    val q = EventStream.kmvDistinctStream(input.toDF(), k = 8)
      .writeStream.format("memory").queryName("kmv_hours")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).getTime, r.getAs[Int]("n_distinct_capped"),
          r.getSeq[Long](2).toList)
      val got = spark.table("kmv_hours").collect().map(key).toSet
      val batch = EventStream.kmvDistinctStream(rows.toDF(), k = 8)
        .collect().map(key).toSet
      assert(got == batch && got.size == 2)
      // the bounded buffer really bounds: 40 distinct users, k=8 kept
      assert(got.forall(_._2 == 8))
    } finally q.stop()
  }

  test("streaming trigram featurization is EXACTLY e19's path frame on real data") {
    // e19's twin claim: the full sf0.001 table through chronological
    // micro-batches emits exactly the batch double-lead trigram
    // multiset — the 2-event bridge must carry windows across flush
    // boundaries without re-emission
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[EventStream.TEv]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val cuts = Seq(0.33, 0.66, 1.01)
      .map(f => evs((evs.length * f).toInt.min(evs.length - 1)).ts.getTime)
    val in = MemoryStream[EventStream.TEv]
    val q = EventStream.trigramStream(in.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("tri_parity")
      .outputMode("append").start()
    try {
      var prevCut = Long.MinValue
      cuts.foreach { cut =>
        val chunk = evs.filter(e => e.ts.getTime > prevCut && e.ts.getTime <= cut)
        if (chunk.nonEmpty) in.addData(chunk: _*)
        q.processAllAvailable()
        prevCut = cut
      }
      in.addData(EventStream.TEv(-1L,
        new java.sql.Timestamp(prevCut + 30L * 24 * 3600 * 1000), 0L, "x"))
      q.processAllAvailable()
      def hist(xs: Seq[(Long, String, String, String, Long)]) =
        xs.groupBy(identity).view.mapValues(_.size).toMap
      val streamed = spark.table("tri_parity").as[EventStream.TriOut]
        .collect().filter(_.user_id >= 0)
        .map(o => (o.user_id, o.t1, o.t2, o.t3, o.start_us))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val batch = graft.sources.Tables.events(spark, sfDir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("t2", lead($"event_type", 1).over(w))
        .withColumn("t3", lead($"event_type", 2).over(w))
        .filter($"t3".isNotNull)
        .select($"user_id", $"event_type", $"t2", $"t3", expr("unix_micros(ts)"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      assert(hist(streamed.toSeq) == hist(batch.toSeq),
        s"streamed ${streamed.length} vs batch ${batch.length}")
      // aggregated by path, the stream reproduces e19's counts (pre-top-k)
      val pStream = streamed.groupBy(t => s"${t._2}>${t._3}>${t._4}")
        .view.mapValues(_.size.toLong).toMap
      val e19 = graft.queries.Events.e19TopPaths(spark, sfDir).collect()
        .map(r => r.getAs[String]("path") -> r.getAs[Long]("n")).toMap
      e19.foreach { case (p, n) => assert(pStream(p) == n, s"path $p") }
    } finally q.stop()
  }

  test("streaming transition featurization is EXACTLY e15's bigrams on real data") {
    // e15's twin claim end-to-end: the full sf0.001 events table fed
    // through three chronological micro-batches + a watermark-flushing
    // sentinel must emit exactly the batch lead-bigram multiset —
    // order-of-arrival must not matter, only (ts, event_id) order
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[EventStream.TEv]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
    val cuts = Seq(0.33, 0.66, 1.01)
      .map(f => evs((evs.length * f).toInt.min(evs.length - 1)).ts.getTime)
    val in = MemoryStream[EventStream.TEv]
    val q = EventStream.transitionStream(in.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("trans_parity")
      .outputMode("append").start()
    try {
      var prevCut = Long.MinValue
      cuts.foreach { cut =>
        val chunk = evs.filter(e => e.ts.getTime > prevCut && e.ts.getTime <= cut)
        if (chunk.nonEmpty) in.addData(chunk: _*)
        q.processAllAvailable()
        prevCut = cut
      }
      in.addData(EventStream.TEv(-1L,
        new java.sql.Timestamp(prevCut + 30L * 24 * 3600 * 1000), 0L, "x"))
      q.processAllAvailable()
      def hist(xs: Seq[(Long, String, String, Long)]) =
        xs.groupBy(identity).view.mapValues(_.size).toMap
      val streamed = spark.table("trans_parity").as[EventStream.TransOut]
        .collect().filter(_.user_id >= 0)
        .map(o => (o.user_id, o.from_type, o.to_type, o.from_us))
      // batch twin: the same lead-bigram frame e15 aggregates
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val batch = graft.sources.Tables.events(spark, sfDir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .select($"user_id", $"event_type", $"to_type", expr("unix_micros(ts)"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(hist(streamed.toSeq) == hist(batch.toSeq),
        s"streamed ${streamed.length} vs batch ${batch.length}")
      // and the aggregated matrix reproduces e15's counts
      val mStream = streamed.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
      val mBatch = graft.queries.Events.e15Markov(spark, sfDir).collect()
        .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
          r.getAs[Long]("n")).toMap
      assert(mStream == mBatch)
    } finally q.stop()
  }

  test("disorderStream: the last snapshot per user equals e20's batch audit") {
    // the monitor's claim: fed the full table in the SAME arrival
    // order e20 models, the O(1) running-max state converges to the
    // batch audit exactly — across micro-batch boundaries
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    // the exact us the operator computes (testdata ts has sub-ms
    // precision — ms truncation here could flip an arrival tie)
    def arrUs(e: EventStream.TEv): Long =
      Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L +
        graft.functions.DetHash.md5Long60(e.event_id.toString) % 21600000000L
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[EventStream.TEv]
      .collect().sortBy(e => (arrUs(e), e.event_id))
    val in = MemoryStream[EventStream.TEv]
    val q = EventStream.disorderStream(in.toDS())
      .writeStream.format("memory").queryName("dis_parity")
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
      // snapshots are monotone in n_events; the last one is the max
      val streamed = spark.table("dis_parity").as[EventStream.DisOut]
        .collect().groupBy(_.user_id)
        .map { case (u, snaps) => u -> snaps.maxBy(_.n_events) }
      val batch = graft.queries.Events.e20DisorderAudit(spark, sfDir).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("n_late"),
            r.getAs[Long]("max_disorder_us")))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (u, o) =>
        val (n, late, maxD) = batch(u)
        assert(o.n_events == n, s"user $u n")
        assert(o.n_late == late, s"user $u late")
        assert(o.max_disorder_us == maxD, s"user $u maxD")
      }
      // non-vacuous: lateness must actually occur in the stream
      assert(streamed.values.map(_.n_late).sum > 0)
    } finally q.stop()
  }

  test("sesForecastStream: the final per-type emission is EXACTLY batch e31 on real data") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"event_type", $"ts").as[EventStream.FcEv]
      .collect().sortBy(_.ts.getTime)
    val lastDay = evs.map(e => e.ts.getTime / 86400000L).max
    // sentinel 5 days past the corpus: pushes the watermark so the
    // final real day closes for EVERY type (timeouts are global)
    val sentinel = EventStream.FcEv("click",
      new java.sql.Timestamp((lastDay + 5L) * 86400000L + 43200000L))
    val in = MemoryStream[EventStream.FcEv]
    val q = EventStream.sesForecastStream(in.toDS())
      .writeStream.format("memory").queryName("ses_parity")
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
      in.addData(sentinel)
      q.processAllAvailable()
      val streamed = spark.table("ses_parity").as[EventStream.SesOut].collect()
      val batch = graft.queries.Events.e31SesForecast(spark, sfDir).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n_days"), r.getAs[Long]("x_last"),
            r.getAs[Long]("ses_e6")))).toMap
      // the final REAL day's emission per type is the batch answer
      val finals = streamed.filter(_.day == lastDay).groupBy(_.event_type)
      assert(finals.keySet == batch.keySet)
      finals.foreach { case (t, rows) =>
        assert(rows.length == 1, s"type $t emitted ${rows.length} rows for the last day")
        val (n, xl, ses) = batch(t)
        assert(rows.head.n_days.toLong == n, s"type $t n_days")
        assert(rows.head.x == xl, s"type $t x_last")
        assert(rows.head.ses_e6 == ses, s"type $t ses")
      }
      // the post-corpus silent days zero-fill with decaying forecasts
      val tail = streamed.filter(s => s.day > lastDay && s.day < lastDay + 5L)
      assert(tail.nonEmpty && tail.forall(_.x == 0L))
      // every type emitted one row per closed day from its first day on
      streamed.groupBy(_.event_type).foreach { case (t, rows) =>
        val days = rows.map(_.day).sorted
        assert(days.distinct.length == days.length, s"type $t duplicate days")
        assert((days.head to days.last).forall(days.contains), s"type $t day gaps")
      }
    } finally q.stop()
  }

  test("sesForecastStream: state survives a checkpoint restart across the window boundary") {
    // kill the query mid-corpus, land the rest, restart with the SAME
    // checkpoint: emissions must stay exactly-once per (type, day) and
    // the final forecast must mix pre- and post-restart days through
    // the recovered SesState — the state-store round-trip proof
    val in = java.nio.file.Files.createTempDirectory("graft-ses-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-ses-wd").toString
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sfDir).select($"event_type", $"ts")
    val midDay = 19723L + 15L
    val lastDay = 19752L
    ev.filter(unix_micros($"ts") / 86400000000L < midDay)
      .coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(ev.schema).parquet(in).as[EventStream.FcEv]
      val q = EventStream.sesForecastStream(src)
        .writeStream.format("parquet")
        .option("path", s"$wd/out").option("checkpointLocation", s"$wd/ckpt")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val firstRows = spark.read.parquet(s"$wd/out").count()
    assert(firstRows > 0, "first run must close at least one day")
    // the rest of the corpus + a watermark pusher land while DOWN
    val sentinel = Seq(EventStream.FcEv("click",
      new java.sql.Timestamp((lastDay + 5L) * 86400000L + 43200000L))).toDS()
    ev.filter(unix_micros($"ts") / 86400000000L >= midDay).as[EventStream.FcEv]
      .unionByName(sentinel)
      .coalesce(1).write.mode("append").parquet(in)
    runOnce()
    val out = spark.read.parquet(s"$wd/out").as[EventStream.SesOut].collect()
    // exactly-once per (type, day) across the restart
    assert(out.map(s => (s.event_type, s.day)).distinct.length == out.length)
    // contiguous day coverage through the last real day — no gap or
    // replay at the kill point
    out.groupBy(_.event_type).foreach { case (t, rows) =>
      val days = rows.map(_.day).sorted
      assert((days.head to days.last).forall(days.contains), s"$t day gaps")
      assert(days.last >= lastDay, s"$t never closed the final day")
    }
    // the final real day's forecast equals batch e31 — the recovered
    // window carried the pre-restart days
    val batch = graft.queries.Events.e31SesForecast(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("ses_e6")).toMap
    out.filter(_.day == lastDay).foreach { s =>
      assert(s.ses_e6 == batch(s.event_type), s"${s.event_type} forecast")
    }
  }

  test("sesForecastStream: a silent stretch past the window resets state instead of zero-flooding") {
    implicit val sqlCtx = spark.sqlContext
    val day0 = 20000L
    def at(day: Long) = new java.sql.Timestamp(day * 86400000L + 3600000L)
    val in = MemoryStream[EventStream.FcEv]
    val q = EventStream.sesForecastStream(in.toDS())
      .writeStream.format("memory").queryName("ses_cap")
      .outputMode("append").start()
    try {
      in.addData(EventStream.FcEv("t", at(day0)))
      q.processAllAvailable()
      // 100 days of silence, then life resumes — and a pusher event a
      // safe distance later so the resumed day itself closes
      in.addData(EventStream.FcEv("t", at(day0 + 100L)))
      q.processAllAvailable()
      in.addData(EventStream.FcEv("t", at(day0 + 103L)))
      q.processAllAvailable()
      val rows = spark.table("ses_cap").as[EventStream.SesOut].collect()
        .sortBy(_.day)
      // day0 emitted, ≤32 decaying zero days, NOT 100 — then the fresh
      // restart at day0+100 with a window of 1
      assert(rows.head.day == day0 && rows.head.x == 1L)
      val zeros = rows.filter(r => r.day > day0 && r.day < day0 + 100L)
      assert(zeros.nonEmpty && zeros.length <= 32, s"zero rows: ${zeros.length}")
      assert(zeros.forall(_.x == 0L))
      val resumed = rows.find(_.day == day0 + 100L)
      assert(resumed.nonEmpty && resumed.get.n_days == 1 && resumed.get.x == 1L
        && resumed.get.ses_e6 == 1000000L, s"resumed: $resumed")
    } finally q.stop()
  }

  test("quality gate sink splits ingest exactly like the batch formula, with reasons, across replay") {
    import graft.streaming.DocStream
    import graft.text.TextAnalysis
    val in = java.nio.file.Files.createTempDirectory("graft-qg-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-qg-wd").toString
    def writeShard(name: String, lines: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
      ()
    }
    val longGood = (1 to 40).map(i => s"the word$i is here").mkString(" ") // 160 tokens, stopword-rich
    // "" and the mojibake-only line are the ADVICE zero-token cases: no
    // alphanumeric content at all — they must land in REJECTED (not
    // vanish from both outputs), with encoding still winning when the
    // t37 detector fires
    writeShard("shard1.txt", Seq(longGood, "zzzzzz", "", "Ã©Ã©Ã©", s"cafÃ© $longGood"))
    def run(ckpt: String) = DocStream.qualityGateSink(
      DocStream.readLinesStream(spark, in), s"$wd/kept", s"$wd/rej", ckpt)
    val r1 = run(s"$wd/ckpt"); try r1.processAllAvailable() finally r1.stop()
    // snapshot the checkpoint, then a second shard + restart
    val stale = s"$wd/ckpt-stale"
    locally {
      val src = java.nio.file.Paths.get(s"$wd/ckpt")
      java.nio.file.Files.walk(src).forEach { p =>
        val dst = java.nio.file.Paths.get(stale).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
        ()
      }
    }
    writeShard("shard2.txt", Seq(longGood + " again", "qqq"))
    val r2 = run(s"$wd/ckpt"); try r2.processAllAvailable() finally r2.stop()
    // crash-replay: batch re-delivers under the same id, dynamic
    // partition overwrite must absorb it
    val r3 = run(stale); try r3.processAllAvailable() finally r3.stop()
    val kept = spark.read.parquet(s"$wd/kept")
    val rej = spark.read.parquet(s"$wd/rej")
    // the split IS the batch formula: recompute over the whole dir
    val docs = graft.sources.Tables.documentsFromText(spark, in)
    // LEFT join + 0 backfill = the sink's zero-token contract
    val expect = docs
      .join(TextAnalysis.qualityOf(docs).select($"doc_id", $"quality_e6"),
        Seq("doc_id"), "left")
      .withColumn("quality_e6", coalesce($"quality_e6", lit(0L)))
      .withColumn("reason",
        when(TextAnalysis.encodingFlag($"text") === 1L, "encoding")
          .when($"quality_e6" < 300000L, "low_quality"))
      .collect().map(r => r.getAs[String]("text") ->
        (r.getAs[Long]("quality_e6"), Option(r.getAs[String]("reason")))).toMap
    assert(kept.count() + rej.count() == docs.count(), "nothing dropped silently")
    kept.collect().foreach { r =>
      val (q, reason) = expect(r.getAs[String]("text"))
      assert(reason.isEmpty && r.getAs[Long]("quality_e6") == q)
    }
    rej.collect().foreach { r =>
      val (q, reason) = expect(r.getAs[String]("text"))
      assert(reason.contains(r.getAs[String]("reason")) && r.getAs[Long]("quality_e6") == q)
    }
    // the fixture exercises all three outcomes, and replay didn't dup
    assert(kept.count() == 2L, "both long clean lines keep")
    assert(rej.filter($"reason" === "low_quality").count() == 3L,
      "zzzzzz, qqq AND the empty line reject as low_quality")
    assert(rej.filter($"reason" === "encoding").count() == 2L,
      "the mojibake-only zero-token line still gets its encoding verdict")
    val all = kept.select("doc_id").union(rej.select("doc_id"))
    assert(all.distinct().count() == all.count(), "replay duplicated doc_ids")
  }

  test("curated ingest sink: gate → near-dup → shard composes the batch stages, replay converges") {
    import graft.streaming.DocStream
    val in = java.nio.file.Files.createTempDirectory("graft-ci-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-ci-wd").toString
    def writeShard(name: String, lines: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
      ()
    }
    def run(ckpt: String) = DocStream.curatedIngestSink(
      DocStream.readLinesStream(spark, in),
      s"$wd/kept", s"$wd/rej", s"$wd/idx", ckpt)
    val longGood = (1 to 40).map(i => s"the word$i is here").mkString(" ")
    val longGood2 = (1 to 40).map(i => s"the token$i was found").mkString(" ")
    // batch 0: one clean doc, one junk line, one mojibake line
    writeShard("shard1.txt", Seq(longGood, "zzzzzz", s"cafÃ© $longGood"))
    val r1 = run(s"$wd/ckpt"); try r1.processAllAvailable() finally r1.stop()
    // stale checkpoint snapshot (the crash point before batch 1 commits)
    val stale = s"$wd/ckpt-stale"
    locally {
      val src = java.nio.file.Paths.get(s"$wd/ckpt")
      java.nio.file.Files.walk(src).forEach { p =>
        val dst = java.nio.file.Paths.get(stale).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
        ()
      }
    }
    // batch 1: an exact re-render of the kept batch-0 doc (must drop
    // as near_dup against the index), a fresh clean doc (keeps +
    // shards), more junk (gate), and an EMPTY line — the ADVICE
    // zero-token case: it must land in rejected, not vanish
    writeShard("shard2.txt", Seq(longGood, "", longGood2, "qqq"))
    val r2 = run(s"$wd/ckpt"); try r2.processAllAvailable() finally r2.stop()
    val kept = spark.read.parquet(s"$wd/kept")
    val rej = spark.read.parquet(s"$wd/rej")
    val docs = graft.sources.Tables.documentsFromText(spark, in)
    assert(kept.count() + rej.count() == docs.count(), "nothing dropped silently")
    assert(kept.collect().map(_.getAs[String]("text")).toSet == Set(longGood, longGood2),
      "kept set = the clean, novel docs")
    // gate/dedup reasons, in the t37/c1 precedence order
    val text = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val reasons = rej.collect()
      .map(r => text(r.getAs[Long]("doc_id")) -> r.getAs[String]("reason")).toMap
    assert(reasons(s"cafÃ© $longGood") == "encoding")
    assert(reasons("zzzzzz") == "low_quality" && reasons("qqq") == "low_quality")
    assert(reasons("") == "low_quality", "the empty line lands in rejected (score 0)")
    assert(reasons(longGood) == "near_dup", "the re-rendered copy must drop against the index")
    // shard parity with c6/t38's seeded digest slice, recomputed raw
    def shardOf(docId: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graft:$docId".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(12, 16), 16) % 16
    }
    kept.collect().foreach { r =>
      assert(r.getAs[Long]("shard") == shardOf(r.getAs[Long]("doc_id")),
        s"shard mismatch for doc ${r.getAs[Long]("doc_id")}")
    }
    // the signature index holds exactly the kept docs
    val idxIds = spark.read.parquet(s"$wd/idx")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idxIds == kept.collect().map(_.getAs[Long]("doc_id")).toSet)
    // crash-replay from the stale checkpoint: batch 1 re-delivers
    // under the same id — all three outputs must converge byte-for-byte
    def snap(p: String) = spark.read.parquet(p).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val (k0, rj0, i0) = (snap(s"$wd/kept"), snap(s"$wd/rej"), snap(s"$wd/idx"))
    val r3 = run(stale); try r3.processAllAvailable() finally r3.stop()
    assert(snap(s"$wd/kept") == k0 && snap(s"$wd/rej") == rj0 && snap(s"$wd/idx") == i0,
      "replay changed an output")
  }

  test("event-time curated ingest: late arrivals reject as 'late' through the full chain; replay converges") {
    import graft.streaming.{DocStream, EventStream}
    val in = java.nio.file.Files.createTempDirectory("graft-et-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-et-wd").toString
    def writeShard(name: String, lines: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
      ()
    }
    def mk(stem: String) = (1 to 40).map(i => s"the $stem$i is here").mkString(" ")
    val (gA, gB, gC, gD, gE) = (mk("alpha"), mk("bravo"), mk("clump"), mk("delta"), mk("extra"))
    val T0 = 1700000000000000L
    val H = 3600000000L // one hour in micros
    // the e39→knob loop: the delay arrives via the SAME conf key
    // planWatermark writes; the sink is constructed with delay = None
    spark.conf.set(EventStream.WatermarkDelayKey, "3600 seconds")
    try {
      def run(ckpt: String) = DocStream.eventTimeCuratedIngestSink(
        DocStream.readLinesStream(spark, in),
        s"$wd/kept", s"$wd/rej", s"$wd/idx", s"$wd/hwm", ckpt)
      // batch 0: two on-time docs; high watermark lands at T0+1h
      writeShard("s0.txt", Seq(s"$T0\t$gA", s"${T0 + H}\t$gB"))
      val r1 = run(s"$wd/ckpt"); try r1.processAllAvailable() finally r1.stop()
      val stale = s"$wd/ckpt-stale"
      locally {
        val src = java.nio.file.Paths.get(s"$wd/ckpt")
        java.nio.file.Files.walk(src).forEach { p =>
          val dst = java.nio.file.Paths.get(stale).resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
          else java.nio.file.Files.copy(p, dst)
          ()
        }
      }
      // batch 1: one doc a hair past the delay (late), one exactly AT
      // the boundary (kept — strict <, Spark's semantics), one at the
      // watermark (kept), junk (low_quality), and a tab-less line
      // (bad_ts) — every outcome lands somewhere
      writeShard("s1.txt", Seq(
        s"${T0 - 1000000L}\t$gC", // hwm T0+1h − delay 1h = T0; 1s older ⇒ late
        s"$T0\t$gE",              // exactly at the boundary ⇒ kept
        s"${T0 + H}\t$gD",
        s"${T0 + H}\tzzzzzz",
        "no timestamp on this line"))
      val r2 = run(s"$wd/ckpt"); try r2.processAllAvailable() finally r2.stop()
      val kept = spark.read.parquet(s"$wd/kept")
      val rej = spark.read.parquet(s"$wd/rej")
      assert(kept.count() + rej.count() == 7L, "nothing dropped silently")
      assert(kept.collect().map(_.getAs[String]("text")).toSet == Set(gA, gB, gD, gE),
        "kept = on-time clean docs, INCLUDING the exact-boundary one")
      // doc_id → raw text via the sink's own parsing, recomputed batch-side
      val parsed = graft.sources.Tables.text(spark, in)
        .withColumn("ts_us",
          org.apache.spark.sql.functions.expr(
            "TRY_CAST(substring(value, 1, instr(value, '\t') - 1) AS BIGINT)"))
        .withColumn("value", org.apache.spark.sql.functions
          .when($"ts_us".isNotNull,
            org.apache.spark.sql.functions.expr("substring(value, instr(value, '\t') + 1)"))
          .otherwise($"value"))
      val text = graft.sources.Tables.documentsFromLines(parsed)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      val reasons = rej.collect()
        .map(r => text(r.getAs[Long]("doc_id")) -> r.getAs[String]("reason")).toMap
      assert(reasons(gC) == "late", s"got $reasons")
      assert(reasons("zzzzzz") == "low_quality")
      assert(reasons("no timestamp on this line") == "bad_ts")
      // the watermark artifact: one row per batch, running max T0+1h
      val hwm = spark.read.parquet(s"$wd/hwm")
      assert(hwm.agg(org.apache.spark.sql.functions.max($"hwm_us")).head.getLong(0) == T0 + H)
      assert(hwm.count() == 2L)
      // crash-replay from the stale checkpoint: the late verdict reads
      // only STRICTLY OLDER hwm partitions, so batch 1 re-decides
      // identically and all four outputs converge
      def snap(p: String) = spark.read.parquet(p).collect()
        .map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val before = Seq(s"$wd/kept", s"$wd/rej", s"$wd/idx", s"$wd/hwm").map(snap)
      val r3 = run(stale); try r3.processAllAvailable() finally r3.stop()
      assert(Seq(s"$wd/kept", s"$wd/rej", s"$wd/idx", s"$wd/hwm").map(snap) == before,
        "replay changed an output")
    } finally spark.conf.unset(EventStream.WatermarkDelayKey)
  }

  test("event-time sink refuses a stale high watermark from a reset checkpoint instead of dropping on-time docs") {
    import graft.streaming.DocStream
    import org.apache.spark.sql.functions.lit
    val in = java.nio.file.Files.createTempDirectory("graft-hwm-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-hwm-wd").toString
    // a PRIOR incarnation's watermark survives at hwmPath (partition
    // ingest_batch=5, far-future hwm) while the checkpoint is fresh —
    // batch ids restart at 0, so serving that watermark would reject
    // every on-time doc as late; the sink must fail loudly instead
    Seq(9700000000000000L).toDF("hwm_us").withColumn("ingest_batch", lit(5L))
      .write.partitionBy("ingest_batch").parquet(s"$wd/hwm")
    java.nio.file.Files.write(java.nio.file.Paths.get(in, "s0.txt"),
      s"1700000000000000\t${(1 to 40).map(i => s"the word$i is here").mkString(" ")}"
        .getBytes("UTF-8"))
    val q = DocStream.eventTimeCuratedIngestSink(
      DocStream.readLinesStream(spark, in),
      s"$wd/kept", s"$wd/rej", s"$wd/idx", s"$wd/hwm", s"$wd/ckpt")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("checkpoint was reset")),
      s"expected the stale-hwm refusal, got: ${messages(err).mkString(" | ")}")
    // nothing landed: the guard fired BEFORE any verdict was served
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$wd/kept")))
  }

  test("event-time drop decisions ARE e39's lateness model: sink drops == the model on an events-derived stream") {
    import graft.streaming.DocStream
    // the candidate delay comes from e39's own decision table (900 s
    // is a table row with a nonzero drop rate on this corpus), and the
    // sink's drop rule must BE the table's model: max-seen event time
    // minus delay at arrival, advancing at batch boundaries. Feeding
    // ONE doc per micro-batch in arrival order makes batch-boundary
    // semantics coincide with e39's per-event formula exactly.
    val delayS = 900L
    // model identity on the FULL corpus: e39's n_dropped row equals a
    // driver fold of the same formula over all events
    val evAll = graft.sources.Tables.events(spark, sf)
      .select($"event_id", org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"))
      .withColumn("arr_us", $"ts_us" + org.apache.spark.sql.functions.pmod(
        graft.functions.DetHash.md5Long60Col($"event_id".cast("string")),
        org.apache.spark.sql.functions.lit(21600000000L)))
      .orderBy($"arr_us", $"event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("ts_us")))
    def lateSet(evs: Seq[(Long, Long)], delayUs: Long): Set[Long] = {
      var mx = Long.MinValue
      val out = scala.collection.mutable.Set.empty[Long]
      evs.foreach { case (id, ts) =>
        if (mx != Long.MinValue && mx - ts > delayUs) { out += id; () }
        mx = math.max(mx, ts)
      }
      out.toSet
    }
    val fullModel = lateSet(evAll.toIndexedSeq, delayS * 1000000L).size.toLong
    val e39row = graft.queries.Events.e39WatermarkPlan(spark, sf).collect()
      .find(_.getAs[Long]("delay_s") == delayS).get
    assert(e39row.getAs[Long]("n_dropped") == fullModel,
      "e39's table row and the driver fold disagree — the model drifted")
    // now the SINK, on the first 25 events by arrival, one per batch
    val slice = evAll.take(25).toIndexedSeq
    val expectLate = lateSet(slice, delayS * 1000000L)
    val in = java.nio.file.Files.createTempDirectory("graft-em-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-em-wd").toString
    val good = (1 to 40).map(i => s"the word$i is here").mkString(" ")
    val q = DocStream.eventTimeCuratedIngestSink(
      DocStream.readLinesStream(spark, in),
      s"$wd/kept", s"$wd/rej", s"$wd/idx", s"$wd/hwm", s"$wd/ckpt",
      delay = Some(s"$delayS seconds"))
    try {
      slice.zipWithIndex.foreach { case ((eid, ts), i) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(in, f"evt$i%03d.txt"),
          s"$ts\t$good event $eid".getBytes("UTF-8"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val rej = spark.read.parquet(s"$wd/rej")
    val lateDocs = rej.filter($"reason" === "late").count()
    assert(lateDocs == expectLate.size.toLong,
      s"sink dropped $lateDocs late docs, the e39 model says ${expectLate.size}")
    // and the RIGHT ones: recompute ids from the landed kept/rej split
    val kept = spark.read.parquet(s"$wd/kept")
    assert(kept.count() + rej.count() == slice.size.toLong, "nothing dropped silently")
    val keptTs = kept.collect().map(_.getAs[Long]("ts_us")).toSeq.sorted
    val expectOnTimeTs = slice.filterNot(e => expectLate(e._1)).map(_._2).sorted
    // near-dup may reject an on-time doc AFTER the late gate, so kept ⊆
    // on-time; late docs must never surface in kept
    assert(keptTs.toSet.subsetOf(expectOnTimeTs.toSet),
      "a late doc leaked into kept")
  }

  test("quality gate replay after a threshold retune rewrites BOTH sides (zero-row partition deleted)") {
    // the ADVICE-flagged divergence: attempt 1 keeps a doc, a retuned
    // attempt 2 rejects everything — the kept side then lands ZERO
    // rows for the replayed batch id, and dynamic partition overwrite
    // alone would leave the stale kept partition alive (the doc in
    // both outputs). landBatch's explicit delete must clear it.
    import graft.streaming.DocStream
    val in = java.nio.file.Files.createTempDirectory("graft-qg2-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-qg2-wd").toString
    val longGood = (1 to 40).map(i => s"the word$i is here").mkString(" ")
    java.nio.file.Files.write(java.nio.file.Paths.get(in, "s1.txt"),
      String.join("\n", longGood, "zzzzzz").getBytes("UTF-8"))
    // attempt 1: normal threshold — longGood keeps, zzzzzz rejects
    val r1 = DocStream.qualityGateSink(DocStream.readLinesStream(spark, in),
      s"$wd/kept", s"$wd/rej", s"$wd/ckpt1", minQualityE6 = 300000L)
    try r1.processAllAvailable() finally r1.stop()
    assert(spark.read.parquet(s"$wd/kept").count() == 1L)
    // attempt 2 = the same file batch REDELIVERED under batch id 0
    // (fresh checkpoint — the crash-then-retune shape) with an
    // impossible threshold: everything rejects, kept goes to zero
    val r2 = DocStream.qualityGateSink(DocStream.readLinesStream(spark, in),
      s"$wd/kept", s"$wd/rej", s"$wd/ckpt2", minQualityE6 = 2000000L)
    try r2.processAllAvailable() finally r2.stop()
    // the delete may leave the kept table with no data files at all —
    // an unreadable/schema-less path IS the success condition here
    val keptCount =
      try spark.read.parquet(s"$wd/kept").count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    assert(keptCount == 0L, "stale kept partition survived the zero-row replay")
    val rej = spark.read.parquet(s"$wd/rej")
    assert(rej.count() == 2L && rej.filter($"reason" === "low_quality").count() == 2L)
  }

  test("DocStream lands crawl shards as documents + chunks, equal to the batch ingest, across a restart") {
    import graft.streaming.DocStream
    val in = java.nio.file.Files.createTempDirectory("graft-doc-in").toString
    val wd = java.nio.file.Files.createTempDirectory("graft-doc-wd").toString
    def writeShard(name: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(in, name)
      java.nio.file.Files.write(p, String.join("\n", lines: _*).getBytes("UTF-8"))
      ()
    }
    // shard 1 repeats a line — the doc_id-uniqueness case the batch
    // ingest was hardened for must hold through the stream too
    writeShard("shard1.txt", Seq("alpha beta gamma", "repeated line",
      "repeated line", "x" * 450))
    val run1 = DocStream.docIngestSink(
      DocStream.readLinesStream(spark, in),
      s"$wd/docs", s"$wd/chunks", s"$wd/ckpt")
    try run1.processAllAvailable() finally run1.stop()
    // snapshot the post-batch-0 checkpoint — replayed later to
    // simulate a crash that lost batch 1's offset commit
    val stale = s"$wd/ckpt-stale"
    locally {
      val src = java.nio.file.Paths.get(s"$wd/ckpt")
      java.nio.file.Files.walk(src).forEach { p =>
        val dst = java.nio.file.Paths.get(stale).resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else java.nio.file.Files.copy(p, dst)
        ()
      }
    }
    // a second shard lands while the query is DOWN; restart resumes
    writeShard("shard2.txt", Seq("delta epsilon", "zeta"))
    val run2 = DocStream.docIngestSink(
      DocStream.readLinesStream(spark, in),
      s"$wd/docs", s"$wd/chunks", s"$wd/ckpt")
    val processed = try {
      run2.processAllAvailable()
      run2.recentProgress.map(_.numInputRows).sum
    } finally run2.stop()
    assert(processed == 2, s"restart reprocessed committed shards: read $processed lines")
    // simulate the crash that makes foreachBatch at-least-once: run
    // from the STALE checkpoint (batch 1's writes already landed, its
    // offset commit "lost") — batch 1 re-delivers under the SAME id,
    // and the dynamic ingest_batch partition overwrite must absorb
    // the replay without duplicating doc_ids
    val run3 = DocStream.docIngestSink(
      DocStream.readLinesStream(spark, in),
      s"$wd/docs", s"$wd/chunks", stale)
    try run3.processAllAvailable() finally run3.stop()
    // end state = the batch ingest over the whole directory, doc ids
    // distinct even for the repeated line and across the replay
    val got = spark.read.parquet(s"$wd/docs")
    val expect = graft.sources.Tables.documentsFromText(spark, in)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"))).toSet
    assert(got.count() == 6)
    assert(key(got) == key(expect))
    assert(got.select($"doc_id").distinct().count() == 6)
    // chunk table equals the stateless chunk transform of those docs
    val gotChunks = spark.read.parquet(s"$wd/chunks").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_no"),
        r.getAs[String]("chunk_text"))).toSet
    val expectChunks = graft.text.TextAnalysis.chunk(expect).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_no"),
        r.getAs[String]("chunk_text"))).toSet
    assert(gotChunks == expectChunks)
    // the 450-char line must have produced >1 overlapping chunk
    assert(gotChunks.groupBy(_._1).values.map(_.size).max > 1)
  }
}

/** Input row for the as-of join tests (top-level for a stable
  * product encoder under MemoryStream). */
case class ARow(key: Long, ts: java.sql.Timestamp, id: Long)
