package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Knn
import graft.queries.Events

class KnnEventsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("s1 brute-force knn: k per query, ranked by exact cosine") {
    val r = Knn.s1Brute(spark, sf).collect()
    val byQuery = r.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("s2 ivf returns bucket-correct cosines consistent with s1") {
    val exact = Knn.s1Brute(spark, sf, k = 1000000).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cos_sim"))
      .toMap
    val approx = Knn.s2Ivf(spark, sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(exact(key) == r.getAs[Double]("cos_sim"), s"cosine mismatch at $key")
    }
  }

  test("s2 multi-band recall: every planted near neighbor is found") {
    // queries (ids 0..9) are perturbed copies of corpus vectors
    // (ids 10..19): cos ≈ 0.997, where 8-band banding recalls with
    // P ≈ 1-(1-p^8)^8 ≈ 0.9992 per pair — the single-probe shape the
    // round-1 review flagged recalled these at only ~0.43 per pair.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(11)
    val base = (0 until 10).map(_ => Array.fill(64)(rng.nextGaussian().toFloat))
    val queries = base.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(x => x + 0.05f * rng.nextGaussian().toFloat)) }
    val corpus = base.zipWithIndex.map { case (v, i) => (10L + i, v) } ++
      (20 until 120).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-s2").toString
    (queries ++ corpus).toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val found = Knn.s2Ivf(spark, tmp, k = 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    (0 until 10).foreach { i =>
      assert(found.get(i.toLong).contains(10L + i),
        s"query $i: expected planted neighbor ${10 + i}, got ${found.get(i.toLong)}")
    }
  }

  test("s4 ann recall matches a driver-side intersection of s1 and s2") {
    val exact = Knn.s1Brute(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Knn.s2Ivf(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hits = exact.intersect(approx).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val r = Knn.s4AnnRecall(spark, sf).collect()
    // one row per query (operators return UNORDERED — the r9 contract)
    assert(r.map(_.getAs[Long]("query_id")).toSeq.sorted == (0L to 9L))
    r.foreach { x =>
      val q = x.getAs[Long]("query_id")
      assert(x.getAs[Long]("n_hits") == hits.getOrElse(q, 0L), s"query $q hit count")
      assert(x.getAs[Long]("recall_e6") == x.getAs[Long]("n_hits") * 200000L)
      assert(x.getAs[Long]("n_hits") <= 5L)
    }
  }

  test("s6 bucketed radius search is a subset of exact s5; recall audit is consistent") {
    val exact = Knn.s5Radius(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    val bucketed = Knn.s6RadiusBucketed(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    assert(bucketed.nonEmpty)
    // every bucketed hit is an exact hit with the identical cosine
    bucketed.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos), s"$pair not in exact radius set")
    }
    // the audit's integers agree with the two result sets
    val audit = Knn.s6RadiusRecallAudit(spark, sf).collect()
    val exactByQ = exact.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val foundByQ = bucketed.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(audit.map(_.getAs[Long]("query_id")).toSet == exactByQ.keySet)
    audit.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_exact") == exactByQ(q))
      assert(r.getAs[Long]("n_found") == foundByQ.getOrElse(q, 0L))
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_exact"))
    }
    // near pairs must be found: the band-collision curve is steep, so
    // recall over the high-similarity slice (cos >= 0.8) stays high
    val near = exact.filter(_._2 >= 0.8)
    if (near.nonEmpty) {
      val nearFound = near.keys.count(bucketed.contains)
      assert(nearFound.toDouble / near.size >= 0.8,
        s"near-pair recall $nearFound/${near.size}")
    }
  }

  test("s3 clustering covers all vectors with k clusters, deterministically") {
    val r1 = Knn.s3Cluster(spark, sf).collect()
    assert(r1.length == 8)
    assert(r1.map(_.getAs[Long]("n_vectors")).sum ==
      graft.sources.Tables.read(spark, sf, "embeddings").count())
    val r2 = Knn.s3Cluster(spark, sf).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  private lazy val evDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val rows = Seq(
      // user 1: two sessions split by a 45-min gap
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(10), 1L, "click", 2.0, "{}"),
      (3L, ts(55), 1L, "purchase", 3.0, "{}"),
      // user 2: one session, funnel out of order (purchase before view)
      (4L, ts(0), 2L, "purchase", 4.0, "{}"),
      (5L, ts(5), 2L, "view", 5.0, "{}"),
      (6L, ts(10), 2L, "click", 6.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("e2 sessionize splits on the 30-minute gap") {
    val r = Events.e2Sessionize(spark, evDir).collect()
    val u1 = r.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 2)
    assert(u1.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
    val u2 = r.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 1 && u2.head.getAs[Long]("n_events") == 3L)
  }

  test("e14 native session_window matches e2 including the exact-gap boundary") {
    // evDir's sessions reproduce (no exact-30-min gaps planted there)
    val r = Events.e14SessionWindow(spark, evDir).collect()
    val u1 = r.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 2 && u1.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
    // boundary: session_window MERGES an event at exactly last+gap
    // (despite the "[start, last+gap)" doc phrasing) — same strict->
    // split rule as e2; one minute past the gap splits in both
    val dir = java.nio.file.Files.createTempDirectory("graft-sw").toString
    def ts(m: Int) = new java.sql.Timestamp(3600000L * 24 * 1000 + m * 60000L)
    Seq((1L, ts(0), 9L, "view", 1.0, "{}"), (2L, ts(30), 9L, "click", 2.0, "{}"),
      (3L, ts(0), 8L, "view", 1.0, "{}"), (4L, ts(31), 8L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    def counts(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("user_id").count().collect()
      .map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("count")).toMap
    assert(counts(Events.e14SessionWindow(spark, dir)) == Map(9L -> 1L, 8L -> 2L))
    assert(counts(Events.e2Sessionize(spark, dir)) == Map(9L -> 1L, 8L -> 2L))
  }

  test("w5 cumulative users: monotone, ends at total distinct, firsts sum once") {
    val r = Events.w5CumeUsers(spark, sf).collect()
    val cume = r.map(_.getAs[Long]("cume_users"))
    assert(cume.zip(cume.tail).forall { case (a, b) => a <= b })
    val totalUsers = Events // cume must END at the corpus-wide distinct
      .w5CumeUsers(spark, sf).sparkSession.read
      .parquet(s"$sf/events.parquet").select("user_id").distinct().count()
    assert(cume.last == totalUsers)
    assert(r.map(_.getAs[Long]("new_users")).sum == totalUsers)
  }

  test("e3 funnel honors event ordering (purchase must follow click)") {
    val r = Events.e3Funnel(spark, evDir).collect()
      .map(x => x.getAs[Long]("user_id") -> x).toMap
    // user 1 completes the funnel
    assert(!r(1L).isNullAt(r(1L).fieldIndex("purchase_us")))
    // user 2's purchase predates the view → no funnel purchase
    assert(!r(2L).isNullAt(r(2L).fieldIndex("click_us")))
    assert(r(2L).isNullAt(r(2L).fieldIndex("purchase_us")))
  }

  test("asofJoin: latest right at-or-before, exact-tie matches, no-prior null, max tie-break") {
    import org.apache.spark.sql.functions._
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val right = Seq(
      (1L, t(10), 100L), (1L, t(20), 200L),   // user 1: clicks at 10, 20
      (2L, t(50), 500L), (2L, t(50), 501L)    // user 2: two clicks SAME ts
    ).toDF("user_id", "ts", "click_id").withColumn("click_ts", $"ts")
    val left = Seq(
      (1L, t(15), 9001L),  // between clicks → 100
      (1L, t(20), 9002L),  // exactly at click 200 → 200 (≤ semantics)
      (1L, t(5), 9003L),   // before any click → null
      (2L, t(60), 9004L)   // tie at t(50) → max click_id 501
    ).toDF("user_id", "ts", "event_id")
    val got = graft.operators.AsOf.asofJoin(left, right, Seq("user_id"),
        "ts", "ts", Seq("click_id", "click_ts"), "click_id")
      .select($"event_id", $"asof_click_id").collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(1)) -1L else r.getAs[Long]("asof_click_id"))).toMap
    assert(got == Map(9001L -> 100L, 9002L -> 200L, 9003L -> -1L, 9004L -> 501L))
  }

  test("asofJoin carries the matched right row ATOMICALLY (null fields never backfill)") {
    import org.apache.spark.sql.functions._
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val right = Seq(
      (1L, t(10), 1L, Some("x")),
      (1L, t(20), 2L, None)       // latest row has a NULL payload field
    ).toDF("user_id", "ts", "click_id", "ref")
    val left = Seq((1L, t(25), 9001L)).toDF("user_id", "ts", "event_id")
    val r = graft.operators.AsOf.asofJoin(left, right, Seq("user_id"),
      "ts", "ts", Seq("click_id", "ref"), "click_id").collect().head
    assert(r.getAs[Long]("asof_click_id") == 2L)
    // the OLD row's "x" must NOT leak into the newer match
    assert(r.isNullAt(r.fieldIndex("asof_ref")))
  }

  test("asofJoin never matches NULL keys (join equality, not window grouping)") {
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val right = Seq((Option.empty[Long], t(10), 1L))
      .toDF("user_id", "ts", "click_id").withColumn("ref", lit("x"))
    val left = Seq((Option.empty[Long], t(25), 9001L)).toDF("user_id", "ts", "event_id")
    val r = graft.operators.AsOf.asofJoin(left, right, Seq("user_id"),
      "ts", "ts", Seq("click_id", "ref"), "click_id").collect()
    // the null-keyed left row survives, with NO match
    assert(r.length == 1 && r.head.isNullAt(r.head.fieldIndex("asof_click_id")))
  }

  test("t8 balanced sample caps every stratum and is deterministic") {
    val r1 = graft.text.TextAnalysis.t8BalancedSample(spark, sf, cap = 7).collect()
    val byLang = r1.groupBy(_.getAs[String]("pred_lang"))
    byLang.foreach { case (lang, rows) =>
      assert(rows.length <= 7, s"$lang over cap")
      assert(rows.map(_.getAs[Long]("sample_rank")).sorted.toSeq ==
        (1L to rows.length).toSeq, s"$lang ranks not a prefix")
    }
    val r2 = graft.text.TextAnalysis.t8BalancedSample(spark, sf, cap = 7).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("rangeJoin: boundaries inclusive, multi-bin intervals, overlaps; plan has no BNLJ") {
    import org.apache.spark.sql.functions._
    val points = Seq(10L, 100L, 150L, 250L, 999L).toDF("t")
    val intervals = Seq(
      (100L, 150L, "a"),   // contains 100 (lo), 150 (hi) — inclusive bounds
      (90L, 260L, "b"),    // spans 3 bins of width 100; contains 100,150,250
      (400L, 500L, "c")    // empty
    ).toDF("lo", "hi", "name")
    val joined = graft.operators.RangeJoin.rangeJoin(points, intervals, "t", "lo", "hi", 100L)
    val got = joined.collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[String]("name"))).toSet
    assert(got == Set((100L, "a"), (150L, "a"), (100L, "b"), (150L, "b"), (250L, "b")))
    // structural dedup: exactly one row per (point, containing interval)
    assert(joined.count() == 5)
    val plan = graft.queries.Events.e7RangeJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("e1 windowed agg covers every event exactly once") {
    val total = Events.e1WindowedAgg(spark, sf)
      .agg(sum($"n_events")).head().getLong(0)
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("s5 radius search: superset of s1's qualifying top-k, all within radius") {
    val s5 = graft.similarity.Knn.s5Radius(spark, sf).collect()
    s5.foreach(r => assert(r.getAs[Double]("cos_sim") >= 0.30))
    val s5Pairs = s5.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // every s1 neighbor above the radius must be in the radius result
    graft.similarity.Knn.s1Brute(spark, sf).collect()
      .filter(_.getAs[Double]("cos_sim") >= 0.30)
      .foreach { r =>
        assert(s5Pairs.contains((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))), r)
      }
  }

  test("w4 gap stats: n_gaps = events - 1 per multi-event user; max >= avg") {
    val perUser = graft.sources.Tables.events(spark, sf)
      .groupBy($"user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    val w4 = Events.w4GapStats(spark, sf).collect()
    assert(w4.length == perUser.count(_._2 >= 2))
    w4.foreach { r =>
      assert(r.getAs[Long]("n_gaps") == perUser(r.getAs[Long]("user_id")) - 1)
      assert(r.getAs[Long]("max_gap_us") >= r.getAs[Long]("avg_gap_us"))
    }
  }

  test("e11 funnel latency matches a driver-side percentile recomputation") {
    val f = Events.e3Funnel(spark, sf).collect()
    def latencies(a: String, b: String): Seq[Long] = f.flatMap { r =>
      (Option(r.getAs[Any](a)), Option(r.getAs[Any](b))) match {
        case (Some(x), Some(y)) =>
          Some((y.asInstanceOf[Long] - x.asInstanceOf[Long]) / 1000000L)
        case _ => None
      }
    }.sorted.toSeq
    val got = Events.e11FunnelLatency(spark, sf).collect()
      .map(r => r.getAs[String]("stage") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("p50_s"),
          r.getAs[Long]("p90_s"), r.getAs[Long]("max_s")))).toMap
    for ((stage, a, b) <- Seq(("view_to_click", "view_us", "click_us"),
        ("view_to_purchase", "view_us", "purchase_us"),
        ("click_to_purchase", "click_us", "purchase_us"))) {
      val xs = latencies(a, b)
      val (n, p50, p90, mx) = got(stage)
      assert(n == xs.length.toLong, stage)
      assert(mx == xs.max, stage)
      // percentile_disc: smallest value with cumulative count >= ceil(p*n)
      def pick(p: Int) = xs(math.max(0, (p * xs.length + 99) / 100 - 1))
      assert(p50 == pick(50), s"$stage p50 $p50 vs ${pick(50)}")
      assert(p90 == pick(90), s"$stage p90 $p90 vs ${pick(90)}")
    }
    // q25's plan rule holds: the cumulative window consumes the
    // HISTOGRAM (Window above HashAggregate), never per-user rows
    val plan = Events.e11FunnelLatency(spark, sf).queryExecution.executedPlan.toString
    val winAt = plan.indexOf("Window ")
    assert(winAt >= 0 && plan.indexOf("HashAggregate", winAt) >= 0)
  }

  test("e10 gap fill: complete hour x type grid, totals preserved, real zeros") {
    val r = Events.e10GapFill(spark, sf).collect()
    val hours = r.map(_.getAs[String]("hour")).distinct.length
    val types = r.map(_.getAs[String]("event_type")).distinct.length
    assert(r.length == hours * types, "grid incomplete")
    assert(r.map(_.getAs[Long]("n_events")).sum ==
      graft.sources.Tables.events(spark, sf).count())
    assert(r.exists(_.getAs[Long]("n_events") == 0L), "no gap rows — fixture too dense")
    // the fact table is scanned EXACTLY once: bounds, the type
    // dimension, and the zero-fill all derive from the aggregate
    val scans = Events.e10GapFill(spark, sf).queryExecution.optimizedPlan
      .collect { case r: org.apache.spark.sql.execution.datasources.LogicalRelation
        if r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.exists(_.contains("events")) => r }
      .length
    assert(scans == 1, s"expected exactly 1 events scan, got $scans")
  }

  test("d11 incremental near-dup agrees with an orientation of the d2 pair set") {
    val pairs = graft.dedup.Dedup.d2MinhashLsh(spark, sf).collect()
      .map(x => (x.getAs[Long]("doc_id1"), x.getAs[Long]("doc_id2"), x.getAs[Double]("est_jaccard")))
    val expected = pairs.flatMap { case (a, b, e) =>
      if (a % 5 == 0 && b % 5 != 0) Some((a, b, e))
      else if (b % 5 == 0 && a % 5 != 0) Some((b, a, e))
      else None
    }.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.length.toLong, xs.map(_._2).min, xs.map(_._3).max))
    }
    val got = graft.dedup.Dedup.d11IncrementalNearDup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_corpus_matches"), r.getAs[Long]("min_match_id"),
          r.getAs[Double]("max_est")))).toMap
    assert(got == expected)
  }

  test("e8 retention: day-0 diagonal counts every user once; offsets bounded by cohort") {
    val r = Events.e8Retention(spark, sf).collect()
    val day0 = r.filter(_.getAs[Long]("day_offset") == 0L)
    // every user is active on their own first day → the day-0 column
    // partitions the user population by cohort
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(day0.map(_.getAs[Long]("active_users")).sum == nUsers)
    // no offset row can exceed its cohort's day-0 size, offsets >= 0
    val day0ByCohort = day0.map(x =>
      x.getAs[String]("cohort_date") -> x.getAs[Long]("active_users")).toMap
    r.foreach { x =>
      val off = x.getAs[Long]("day_offset")
      assert(off >= 0L)
      assert(x.getAs[Long]("active_users") <= day0ByCohort(x.getAs[String]("cohort_date")),
        s"retained > cohort at $x")
    }
  }

  test("s8 ivf-km: ranked exact cosines, audit matches driver intersection, deterministic") {
    val r8 = Knn.s8IvfKm(spark, sf).collect()
    r8.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.length <= 5, s"query $q overflow")
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sortBy(-_)), s"query $q not ranked")
    }
    // the re-rank is EXACT: any (query, neighbor) pair s8 shares with
    // the exact s1 top-k must carry the identical cosine
    val exactRows = Knn.s1Brute(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    r8.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exactRows.get(k).foreach(c => assert(c == r.getAs[Double]("cos_sim"), s"$k cosine"))
    }
    // s9 audit equals a driver-side set intersection (the s4 pattern)
    val approx = r8.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hits = exactRows.keySet.intersect(approx)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val audit = Knn.s8IvfRecallAudit(spark, sf).collect()
    assert(audit.map(_.getAs[Long]("query_id")).toSeq.sorted == (0L to 9L))
    audit.foreach { x =>
      val q = x.getAs[Long]("query_id")
      assert(x.getAs[Long]("n_hits") == hits.getOrElse(q, 0L), s"query $q hit count")
      assert(x.getAs[Long]("recall_e6") == x.getAs[Long]("n_hits") * 200000L)
    }
    // deterministic across invocations (plan-time centroids, no RNG)
    val r8b = Knn.s8IvfKm(spark, sf).collect()
    assert(r8.map(_.toString).toSeq.sorted == r8b.map(_.toString).toSeq.sorted)
  }

  test("s8 plan: codegen'd argmin kernel, hash joins only — the corpus never nested-loops") {
    val plan = Knn.s8IvfKm(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(8).mkString("\n"))
    assert(plan.contains("nearest_cent_e6"), "cell assignment must ride the loop-codegen kernel")
    assert(plan.contains("BroadcastHashJoin"), "probe/cell joins must be broadcast hash joins")
  }

  test("e12 anomaly flags match a driver-side BigInt recomputation over the gap-filled series") {
    val series = Events.e10GapFill(spark, sf).collect()
      .map(r => (r.getAs[String]("hour"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events")))
    val byType = series.groupBy(_._2)
    val expected = series.map { case (h, t, x) =>
      val xs = byType(t).map(_._3)
      val n = BigInt(xs.length)
      val s = xs.map(BigInt(_)).sum
      val q = xs.map(v => BigInt(v) * v).sum
      val dev = n * x - s
      ((h, t), if (dev * dev > 4 * (n * q - s * s)) 1 else 0)
    }.toMap
    val got = Events.e12Anomaly(spark, sf).collect()
    assert(got.length == series.length, "e12 must keep the full gap-filled grid")
    got.foreach { r =>
      val k = (r.getAs[String]("hour"), r.getAs[String]("event_type"))
      assert(r.getAs[Int]("is_anomaly") == expected(k), s"flag mismatch at $k")
    }
  }

  test("e38 burst runs match a driver-side trailing-window recomputation, single events scan") {
    // the gap-filled grid is complete and hourly, so within a type
    // consecutive index == consecutive hour: recompute the trailing
    // test and the island grouping positionally (no tz parsing)
    val byType = Events.e10GapFill(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("hour"),
        r.getAs[Long]("n_events")))
      .groupBy(_._1)
    val expected = byType.flatMap { case (t, rows) =>
      val xs = rows.sortBy(_._2).toVector
      val flagged = xs.zipWithIndex.filter { case ((_, _, x), i) =>
        val prev = xs.slice(math.max(0, i - 24), i).map(_._3)
        prev.length >= 6 && x * prev.length * 100L > 150L * prev.sum
      }
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[((String, String, Long), Int)]]
      flagged.foreach { f =>
        if (runs.nonEmpty && runs.last.last._2 + 1 == f._2)
          runs(runs.length - 1) = runs.last :+ f
        else runs += Vector(f)
      }
      runs.map { run =>
        val hs = run.map(_._1)
        (t, hs.head._2) ->
          ((hs.last._2, run.length.toLong, hs.map(_._3).max, hs.map(_._3).sum))
      }
    }
    val q = Events.e38BurstRuns(spark, sf)
    val got = q.collect()
    assert(got.length == expected.size, s"run count ${got.length} vs ${expected.size}")
    got.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("run_start"))
      val (end, nh, peak, total) = expected(k)
      assert(r.getAs[String]("run_end") == end, s"$k end")
      assert(r.getAs[Long]("n_hours") == nh, s"$k n_hours")
      assert(r.getAs[Long]("peak") == peak, s"$k peak")
      assert(r.getAs[Long]("total") == total, s"$k total")
    }
    // plan gate: rides e10's single-scan frame — the trailing windows
    // and island grouping must not re-read the fact table
    val scans = q.queryExecution.optimizedPlan
      .collect { case r: org.apache.spark.sql.execution.datasources.LogicalRelation
        if r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.exists(_.contains("events")) => r }
      .length
    assert(scans == 1, s"expected exactly 1 events scan, got $scans")
  }

  test("s10 PQ: codes and ADC ranking match a driver-side recomputation") {
    import graft.similarity.Knn
    val books = Knn.pqCodebooks(spark, sf)
    assert(books.length == 8 && books.forall(_._2.nonEmpty))
    // driver-side re-encode + ADC from the quantized vectors
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6).toLong).toArray).toMap
    def sub(v: Array[Long], s: Int) = v.slice(s * 8, s * 8 + 8)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def code(v: Array[Long], s: Int): Int =
      books(s)._2.minBy { case (cid, c) => (d2(sub(v, s), c), cid) }._1
    val queries = q.keys.filter(_ < 10).toSeq.sorted
    val corpus = q.keys.filter(_ >= 10).toSeq.sorted
    val expected = queries.flatMap { qid =>
      val dt = books.map { case (s, cs) =>
        s -> cs.map { case (cid, c) => cid -> d2(sub(q(qid), s), c) }.toMap }.toMap
      corpus.map { nid =>
        (qid, nid, (0 until 8).map(s => dt(s)(code(q(nid), s))).sum) }
        .sortBy { case (_, nid, d) => (d, nid) }.take(5)
    }.map { case (qid, nid, d) => (qid, nid) -> d }.toMap
    val got = Knn.s10PqAnn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(expected.get(k).contains(r.getAs[Long]("adist_e12")), s"pair $k")
    }
  }

  test("s10 PQ plans the broadcast equi-join, never a nested loop over codes") {
    val plan = graft.similarity.Knn.s10PqAnn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("s12 SQ8: top-k distances match a driver-side re-encode") {
    import graft.similarity.Knn
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6).toLong).toArray).toMap
    val dim = q.values.head.length
    val corpus = q.filter(_._1 >= 10)
    // codebook from corpus rows only; zero-span guard mirrors the impl
    val mins = (0 until dim).map(i => corpus.values.map(_(i)).min).toArray
    val spans = (0 until dim).map(i =>
      math.max(corpus.values.map(_(i)).max - mins(i), 1L)).toArray
    def enc(v: Array[Long]): Array[Long] = v.zipWithIndex.map { case (e, i) =>
      val n = (e - mins(i)) * 255L
      math.min(255L, math.max(0L, Math.floorDiv(2 * n + spans(i), 2 * spans(i))))
    }
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = q.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      corpus.keys.toSeq.sorted
        .map(nid => (qid, nid, d2(enc(q(qid)), enc(q(nid)))))
        .sortBy { case (_, nid, d) => (d, nid) }.take(5)
    }.map { case (qid, nid, d) => (qid, nid) -> d }.toMap
    val got = Knn.s12Sq8Ann(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(expected.get(k).contains(r.getAs[Long]("sq_dist")), s"pair $k")
    }
  }

  test("s12/s13: deliberate broadcast-queries shape; SQ8 recall clears the tier floor") {
    import graft.similarity.Knn
    // the exact-search family's one sanctioned BNLJ shape: build side
    // is the tiny broadcast query set, the coded corpus streams
    val plan = Knn.s12Sq8Ann(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
    val rec = Knn.s13Sq8Recall(spark, sf).collect()
    assert(rec.length == 10)
    // 255 levels/dim keeps SQ8 near-exact — far above PQ's 16-centroid
    // subspaces; the floor pins the storage-tier ordering
    assert(rec.forall(_.getAs[Long]("recall_e6") >= 600000L),
      rec.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("recall_e6"))).mkString(","))
  }

  test("s14 MRL: truncation recall collapses on non-Matryoshka embeddings (the audit's point)") {
    import graft.similarity.Knn
    val mrl = Knn.s14MrlRecall(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("recall_e6")).toMap
    assert(mrl.size == 10)
    assert(mrl.values.forall(v => v >= 0L && v <= 1000000L))
    // this corpus is i.i.d. per dim — no variance concentration in the
    // leading dims — so dropping 48/64 dims must destroy the ranking
    // while SQ8 (all dims at 8-bit) stays near-exact: the tier ordering
    // the decision table exists to expose
    val sq8 = Knn.s13Sq8Recall(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("recall_e6")).toMap
    assert(mrl.values.sum < sq8.values.sum,
      s"mrl=${mrl.values.sum} sq8=${sq8.values.sum}")
  }

  test("e13 CMS estimates match a driver-side sketch and never under-count") {
    val got = Events.e13HeavyHitters(spark, sf).collect()
    assert(got.nonEmpty)
    // driver-side CMS from scratch: same d×w grid, same md5 hashes
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id").as[Long].collect()
    def slot(i: Int, u: Long): Long =
      graft.functions.DetHash.md5Long60(s"cms:$i:$u") % 64
    val grid = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    users.foreach(u => (0 until 4).foreach(i => grid((i, slot(i, u))) += 1))
    val exact = users.groupBy(identity).map { case (u, xs) => u -> xs.length.toLong }
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val est = (0 until 4).map(i => grid((i, slot(i, u)))).min
      assert(r.getAs[Long]("cms_est") == est, s"user $u estimate")
      assert(r.getAs[Long]("exact_cnt") == exact(u), s"user $u exact")
      assert(r.getAs[Long]("overcount") >= 0L, s"user $u: CMS must never under-count")
    }
  }

  test("e15 markov: bigram mass conservation and row-stochastic probabilities") {
    val r = Events.e15Markov(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select($"user_id").distinct().count()
    // each user contributes (events − 1) transitions: total = N − U
    assert(r.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    // each row of the matrix is a probability distribution ×1e6
    r.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rows) =>
      val s = rows.map(_.getAs[Long]("p_e6")).sum
      assert(math.abs(s - 1000000L) <= rows.length / 2 + 1, s"$ft row sums to $s")
      rows.foreach(x => assert(x.getAs[Long]("p_e6") >= 0L))
    }
  }

  test("s15 incremental ANN: populations reconcile, drift sentinel only on empty cells") {
    val r = Knn.s15IncrementalAnn(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val oldTotal = emb.filter(pmod($"vec_id", lit(8)) =!= 7).count()
    val newTotal = emb.filter(pmod($"vec_id", lit(8)) === 7).count()
    assert(r.map(_.getAs[Long]("old_n")).sum == oldTotal)
    assert(r.map(_.getAs[Long]("new_n")).sum == newTotal,
      "every arriving vector must land in exactly one cell")
    r.foreach { row =>
      val (on, nn) = (row.getAs[Long]("old_n"), row.getAs[Long]("new_n"))
      assert(on > 0L)
      assert(row.getAs[Long]("growth_e6") ==
        Math.floorDiv(2 * nn * 1000000L + on, 2 * on))
      // −1 is the no-arrivals sentinel, never a real mean
      assert((nn == 0L) == (row.getAs[Long]("mean_new_dist_e6") == -1L))
    }
  }

  test("e18 stickiness: WAU is the exact 7-day sliding distinct; ratio bounded by 1") {
    val r = Events.e18Stickiness(spark, sf).collect()
    val pairs = graft.sources.Tables.events(spark, sf)
      .select($"user_id", to_date($"ts").as("day")).distinct().collect()
      .map(x => (x.getLong(0), x.getDate(1).toLocalDate))
    val days = pairs.map(_._2).distinct
    assert(r.length == days.length, "one row per active day")
    r.foreach { row =>
      val d = java.time.LocalDate.parse(row.getAs[String]("day"))
      val dau = pairs.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = pairs.filter(p => !p._2.isAfter(d) && !p._2.isBefore(d.minusDays(6)))
        .map(_._1).distinct.length.toLong
      assert(row.getAs[Long]("dau") == dau, s"$d dau")
      assert(row.getAs[Long]("wau") == wau, s"$d wau (sliding distinct)")
      val st = row.getAs[Long]("stickiness_e6")
      assert(st == Math.floorDiv(2 * dau * 1000000L + wau, 2 * wau), s"$d ratio")
      assert(st <= 1000000L && st > 0L, s"$d stickiness out of range")
    }
    // the window must actually slide: some day's WAU exceeds its DAU
    assert(r.exists(x => x.getAs[Long]("wau") > x.getAs[Long]("dau")))
  }

  test("w6 multi-touch: credits sum to the conversion, positions consistent, lookback respected") {
    val r = Events.w6MultiTouch(spark, sf).collect()
    assert(r.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", $"ts").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getTimestamp(3).getTime))
    val byConv = r.groupBy(_.getAs[Long]("conv_id"))
    val convTs = ev.filter(_._3 == "purchase").map(e => e._2 -> (e._1, e._4)).toMap
    byConv.foreach { case (cid, rows) =>
      val n = rows.length.toLong
      val credits = rows.map(_.getAs[Long]("credit_e6"))
      // half-up credits reconstruct the full conversion within rounding
      assert(math.abs(credits.sum - 1000000L) <= n / 2 + 1, s"conv $cid sums to ${credits.sum}")
      val pos = rows.map(_.getAs[String]("position"))
      if (n == 1) assert(pos.sameElements(Array("only")))
      else {
        assert(pos.count(_ == "first") == 1 && pos.count(_ == "last") == 1, s"conv $cid")
        assert(pos.count(_ == "middle") == n - 2)
      }
      val (cu, cts) = convTs(cid)
      rows.foreach { t =>
        assert(t.getAs[Long]("user_id") == cu, s"conv $cid crossed users")
        val tt = ev.find(_._2 == t.getAs[Long]("touch_id")).get
        assert(tt._4 < cts && tt._4 >= cts - 7L * 86400000L, s"conv $cid touch outside lookback")
        assert(Set("view", "click")(tt._3))
      }
    }
    // every purchase with an in-window touch is attributed
    val touches = ev.filter(e => e._3 == "view" || e._3 == "click")
    val expectConvs = convTs.filter { case (_, (u, ts)) =>
      touches.exists(t => t._1 == u && t._4 < ts && t._4 >= ts - 7L * 86400000L) }.keySet
    assert(byConv.keySet == expectConvs)
  }

  test("e17 pattern match: per-user counts reconcile with a driver-side regex scan") {
    val seqs = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._4)).toMap
    val r = Events.e17PatternMatch(spark, sf).collect()
      .map(x => x.getAs[Long]("user_id") -> x).toMap
    assert(r.keySet == seqs.keySet, "every user gets a pattern profile")
    val journey = "view,(?:click,)*purchase,".r
    val streak = "error,(?:error,)+".r
    var journeys = 0L
    r.foreach { case (u, row) =>
      val s = seqs(u).mkString("", ",", ",")
      assert(row.getAs[Long]("n_events") == seqs(u).length)
      assert(row.getAs[Long]("n_journeys") == journey.findAllIn(s).length, s"user $u")
      assert(row.getAs[Long]("n_error_streaks") == streak.findAllIn(s).length, s"user $u")
      journeys += row.getAs[Long]("n_journeys")
    }
    assert(journeys > 0L, "the pattern must actually occur in the corpus")
  }

  test("s16 filtered ANN: label constraint respected, audit exact side reconciles, no BNLJ") {
    val df = Knn.s16FilteredAnn(spark, sf)
    val r = df.collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getSeq[Float](2).toArray))
    val qLabels = emb.filter(_._1 < 10).map(e => e._1 -> e._2).toMap
    assert(r.map(_.getAs[Long]("query_id")).toSet == qLabels.keySet)
    r.foreach { row =>
      val q = row.getAs[Long]("query_id")
      assert(row.getAs[Int]("label") == qLabels(q), s"query $q label")
      val (ne, nh) = (row.getAs[Long]("n_exact"), row.getAs[Long]("n_hits"))
      assert(ne == 5L, s"query $q: filtered pool is ~50 vectors, top-5 must fill")
      assert(nh >= 0L && nh <= ne)
      assert(row.getAs[Long]("recall_e6") ==
        Math.floorDiv(2 * nh * 1000000L + ne, 2 * ne))
      // exact side parity: top-5 by cosine among SAME-LABEL corpus
      val qv = emb.find(_._1 == q).get._3.map(_.toDouble)
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val pool = emb.filter(e => e._1 >= 10 && e._2 == qLabels(q))
      assert(pool.length >= 5, s"query $q pool degenerate")
      val top = pool.map { case (id, _, v) =>
        val dv = v.map(_.toDouble)
        val cos = BigDecimal(qv.zip(dv).map { case (a, b) => a * b }.sum /
          (qn * math.sqrt(dv.map(x => x * x).sum)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        (id, cos)
      }.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
      // n_hits counts bucketed results inside this exact set — so the
      // exact set itself must be what the driver recomputes
      assert(top.size == 5, s"query $q")
    }
    // the label equi-key must upgrade every join: no nested loop anywhere
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "filtered search must plan as hash joins")
  }

  test("e16 sequence likelihood: every user reconciles with a driver-side rescore") {
    val m = Events.e15Markov(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("p_e6")).toMap
    val seqs = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._4).toList).toMap
    val r = Events.e16SeqLikelihood(spark, sf).collect()
      .map(x => x.getAs[Long]("user_id") -> x).toMap
    // exactly the users with ≥ 2 events are scored
    assert(r.keySet == seqs.filter(_._2.length >= 2).keySet)
    r.foreach { case (u, row) =>
      val ps = seqs(u).zip(seqs(u).tail).map(m)
      assert(row.getAs[Long]("n_trans") == ps.length)
      assert(row.getAs[Long]("min_p_e6") == ps.min)
      assert(row.getAs[Long]("mean_p_e6") ==
        Math.floorDiv(2 * ps.sum + ps.length, 2L * ps.length), s"user $u")
    }
  }

  test("s19 probe sweep: candidates and recall monotone in nprobe; p=2 row matches the s9 audit") {
    val r = Knn.s19ProbeSweep(spark, sf).collect()
      .map(x => x.getAs[Int]("nprobe") ->
        (x.getAs[Long]("n_cands"), x.getAs[Long]("hits"), x.getAs[Long]("recall_e6"))).toMap
    assert(r.keySet == Set(1, 2, 3, 4))
    // each added probe can only ADD candidates, and recall with them
    (1 to 3).foreach { p =>
      assert(r(p)._1 < r(p + 1)._1, s"n_cands not strictly increasing at $p")
      assert(r(p)._2 <= r(p + 1)._2, s"hits decreased at $p")
    }
    r.values.foreach { case (_, hits, rec) =>
      assert(hits <= 50L)
      assert(rec == Math.floorDiv(2 * hits * 1000000L + 50L, 100L))
    }
    // the p=2 configuration IS s8's default — its hit total must equal
    // the s9 recall audit's
    val s9hits = Knn.s8IvfRecallAudit(spark, sf).collect()
      .map(_.getAs[Long]("n_hits")).sum
    assert(r(2)._2 == s9hits, s"p=2 hits ${r(2)._2} != s9 total $s9hits")
  }

  test("s18 hard negatives: every edge crosses labels and matches a driver-side re-rank") {
    val r = Knn.s18HardNegatives(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getSeq[Float](2).toArray))
    val labels = emb.map(e => e._1 -> e._2).toMap
    assert(r.map(_.getAs[Long]("query_id")).distinct.length == 10)
    r.foreach { row =>
      val (q, n) = (row.getAs[Long]("query_id"), row.getAs[Long]("neighbor_id"))
      assert(row.getAs[Int]("q_label") == labels(q))
      assert(row.getAs[Int]("n_label") == labels(n))
      assert(labels(q) != labels(n), s"$q -> $n shares label ${labels(q)}")
    }
    // driver-side re-rank for one query: the top-5 wrong-label cosines
    val q0 = emb.find(_._1 == 0L).get
    val qv = q0._3.map(_.toDouble); val qn = math.sqrt(qv.map(x => x * x).sum)
    val expect = emb.filter(e => e._1 >= 10 && e._2 != q0._2).map { case (id, _, v) =>
      val dv = v.map(_.toDouble)
      val cos = BigDecimal(qv.zip(dv).map { case (a, b) => a * b }.sum /
        (qn * math.sqrt(dv.map(x => x * x).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, cos)
    }.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
    val got = r.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got == expect, s"got $got expect $expect")
  }

  test("e19 top paths: trigram counts reconcile with a driver-side sequence walk") {
    val r = Events.e19TopPaths(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 20)
    // driver-side recount from the raw sequences
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    val byUser = ev.groupBy(_._1).values.flatMap { es =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq
    val counts = byUser.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val total = counts.values.sum
    val expectTop = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(r.map(x => (x.getAs[String]("path"), x.getAs[Long]("n"))).toSeq == expectTop)
    r.foreach { row =>
      assert(row.getAs[Long]("share_e6") ==
        Math.floorDiv(2 * row.getAs[Long]("n") * 1000000L + total, 2 * total))
    }
    assert(r.map(_.getAs[Int]("rank")).toSeq == (1 to r.length))
  }

  test("s17 knn graph: ranked per-source edges, symmetric candidates, no nested loop") {
    val df = Knn.s17KnnGraph(spark, sf)
    val r = df.collect()
    assert(r.nonEmpty)
    // ranks are 1..k contiguous per source, ordered by (cos desc, id)
    r.groupBy(_.getAs[Long]("src_id")).foreach { case (s, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length),
        s"src $s ranks not contiguous")
      val byScore = sorted.map(x =>
        (-x.getAs[Double]("cos_sim"), x.getAs[Long]("neighbor_id")))
      assert(byScore.sorted.toSeq == byScore.toSeq, s"src $s not rank-ordered")
      assert(rows.length <= 3, s"src $s more than k edges")
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == s), s"src $s self-edge")
    }
    // band collision is symmetric: if (a,b) is a candidate edge, b also
    // saw a as a candidate — so every edge's reverse pair was scored,
    // and b's WORST kept score is >= its score of a only if a ranked out
    val edges = r.map(x => (x.getAs[Long]("src_id"),
      x.getAs[Long]("neighbor_id"), x.getAs[Double]("cos_sim"))).toSeq
    val kept = edges.map { case (s, n, _) => (s, n) }.toSet
    val worst = edges.groupBy(_._1).map { case (s, es) =>
      s -> (es.map(_._3).min, es.length) }
    edges.foreach { case (s, n, c) =>
      if (!kept.contains((n, s))) {
        val (wmin, cnt) = worst(n)
        assert(cnt == 3 && wmin >= c,
          s"edge $s->$n: reverse missing though $n kept a worse/shorter list")
      }
    }
    // r14-opt: every default-banding degree is a rank slice of the ONE
    // shared ranked-to-16 memo — pin slice-equivalence against a
    // direct per-degree build (same window, same (cos DESC, id) ties)
    for (deg <- Seq(3, 8)) {
      val sliced = Knn.s17KnnGraph(spark, sf, deg).collect()
        .map(x => (x.getAs[Long]("src_id"), x.getAs[Long]("neighbor_id"),
          x.getAs[Double]("cos_sim"), x.getAs[Int]("rank"))).toSet
      val direct = Knn.s17KnnGraphOn(spark, sf, deg, lit(true)).collect()
        .map(x => (x.getAs[Long]("src_id"), x.getAs[Long]("neighbor_id"),
          x.getAs[Double]("cos_sim"), x.getAs[Int]("rank"))).toSet
      assert(sliced == direct, s"degree-$deg slice != direct build")
    }

    // the self-join must ride the band-bucket hash keys, never a loop
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "knn graph must plan as a bucket hash self-join")
  }

  test("s20 MIPS top-k: driver recompute; dot order genuinely differs from cosine order") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val (queries, corpus) = vecs.partition(_._1 < 10)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      // the kernels' left-to-right double accumulation
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val expected = queries.map { case (qid, q) =>
      qid -> corpus.map { case (nid, c) =>
        (nid, BigDecimal(dot(q, c)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (nid, d) => (-d, nid) }.take(5).toSeq
    }.toMap
    val r = Knn.s20MipsTopk(spark, sf).collect()
    val got = r.groupBy(_.getAs[Long]("query_id")).map { case (q, rows) =>
      q -> rows.sortBy(_.getAs[Int]("rank"))
        .map(x => (x.getAs[Long]("neighbor_id"), x.getAs[Double]("dot"))).toSeq
    }
    assert(got.keySet == expected.keySet)
    got.foreach { case (q, rows) => assert(rows == expected(q), s"query $q") }
    // the objective is genuinely different — planted: a high-norm
    // "popular" item wins MIPS while the direction-matched unit item
    // wins cosine (the testdata's synthetic embeddings are
    // norm-uniform, so the two orders coincide there)
    val dir = java.nio.file.Files.createTempDirectory("graft-mips").toString
    Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (10L, Array(0.9f, 0f, 0f, 0f), 0),  // cos 1.0, dot 0.9
      (11L, Array(3f, 3f, 0f, 0f), 0))    // cos 0.707, dot 3.0
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val mipsTop = Knn.s20MipsTopk(spark, dir).collect()
      .filter(_.getAs[Int]("rank") == 1).map(_.getAs[Long]("neighbor_id")).head
    val cosTop1 = Knn.s1Brute(spark, dir).collect()
      .filter(_.getAs[Int]("rank") == 1).map(_.getAs[Long]("neighbor_id")).head
    assert(mipsTop == 11L, "MIPS must rank the high-norm item first")
    assert(cosTop1 == 10L, "cosine must rank the direction-matched item first")
  }

  test("z2 skip audit: driver recompute of cell pruning; skipping is real and sound") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id AS u",
        "unix_micros(date_trunc('hour', ts)) div 3600000000 AS h").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val h0 = ev.map(_._2).min
    val pts = ev.map { case (u, h) => (u, h - h0) }
    def spread(v: Long): Long = {
      var x = v & 0x7FFFFFFFL
      for ((s, m) <- Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L, 1 -> 0x5555555555555555L))
        x = (x | (x << s)) & m
      x
    }
    val byCell = pts.groupBy { case (u, ho) => (spread(u) | (spread(ho) << 1)) >> 8 }
    val mu = pts.map(_._1).max; val mh = pts.map(_._2).max
    val boxes = Seq((1L, 0L, mu / 10, 0L, mh), (2L, 0L, mu, 0L, mh / 10),
      (3L, mu / 4, mu / 2, mh / 4, mh / 2))
    val r = graft.queries.Events.z2SkipAudit(spark, sf).collect()
      .map(x => x.getAs[Long]("box_id") -> x).toMap
    boxes.foreach { case (id, lu, hu, lh, hh) =>
      val touched = byCell.values.filter { cs =>
        cs.map(_._1).max >= lu && cs.map(_._1).min <= hu &&
          cs.map(_._2).max >= lh && cs.map(_._2).min <= hh
      }
      val scanned = touched.map(_.length.toLong).sum
      val matched = pts.count { case (u, ho) =>
        u >= lu && u <= hu && ho >= lh && ho <= hh }.toLong
      val row = r(id)
      assert(row.getAs[Long]("n_cells") == byCell.size.toLong, s"box $id cells")
      assert(row.getAs[Long]("n_cells_touched") == touched.size.toLong, s"box $id touched")
      assert(row.getAs[Long]("rows_scanned") == scanned, s"box $id scanned")
      assert(row.getAs[Long]("rows_matched") == matched, s"box $id matched")
      // soundness: stats pruning may over-scan but never under-scan
      assert(scanned >= matched, s"box $id unsound")
    }
    // the layout must actually skip something for the stripe boxes —
    // that is the point of z-ordering both dimensions
    assert(r(1L).getAs[Long]("skip_e6") > 0, "user stripe skipped nothing")
    assert(r(2L).getAs[Long]("skip_e6") > 0, "time stripe skipped nothing")
  }

  test("z3 layout table: all three layouts recompute driver-side; each 1-D sort wins its own probe") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id AS u",
        "unix_micros(date_trunc('hour', ts)) div 3600000000 AS h").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val h0 = ev.map(_._2).min
    val pts = ev.map { case (u, h) => (u, h - h0) }
    def spread(v: Long): Long = {
      var x = v & 0x7FFFFFFFL
      for ((s, m) <- Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L, 1 -> 0x5555555555555555L))
        x = (x | (x << s)) & m
      x
    }
    val mu = pts.map(_._1).max; val mh = pts.map(_._2).max
    val layouts: Map[String, Iterable[Array[(Long, Long)]]] = Map(
      "by_user" -> pts.groupBy(p => p._1 / (mu / 64 + 1)).values,
      "by_time" -> pts.groupBy(p => p._2 / (mh / 64 + 1)).values,
      "zorder" -> pts.groupBy(p => (spread(p._1) | (spread(p._2) << 1)) >> 8).values)
    val boxes = Seq((1L, 0L, mu / 10, 0L, mh), (2L, 0L, mu, 0L, mh / 10),
      (3L, mu / 4, mu / 2, mh / 4, mh / 2))
    val r = graft.queries.Events.z3LayoutTable(spark, sf).collect()
      .map(x => (x.getAs[String]("layout"), x.getAs[Long]("box_id")) -> x).toMap
    layouts.foreach { case (tag, files) =>
      boxes.foreach { case (id, lu, hu, lh, hh) =>
        val touched = files.filter { cs =>
          cs.map(_._1).max >= lu && cs.map(_._1).min <= hu &&
            cs.map(_._2).max >= lh && cs.map(_._2).min <= hh
        }
        val scanned = touched.map(_.length.toLong).sum
        val row = r((tag, id))
        assert(row.getAs[Long]("n_files") == files.size.toLong, s"$tag/$id files")
        assert(row.getAs[Long]("files_touched") == touched.size.toLong, s"$tag/$id touched")
        assert(row.getAs[Long]("rows_scanned") == scanned, s"$tag/$id scanned")
        assert(row.getAs[Long]("skip_e6") ==
          (2 * (pts.length - scanned) * 1000000L + pts.length) / (2L * pts.length),
          s"$tag/$id skip")
      }
    }
    // the decision content: each 1-D sort dominates its own probe and
    // is blind to the orthogonal one; z-order skips on BOTH stripes
    def skip(tag: String, id: Long) = r((tag, id)).getAs[Long]("skip_e6")
    assert(skip("by_user", 1) > skip("by_time", 1), "by_user must win the user stripe")
    assert(skip("by_time", 2) > skip("by_user", 2), "by_time must win the time stripe")
    assert(skip("zorder", 1) > 0 && skip("zorder", 2) > 0,
      "zorder must skip on both stripes")
  }

  test("e39 watermark plan: drop counts recompute from the global arrival-order lateness") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "unix_micros(ts) AS ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byArrival = ev.map { case (id, ts) =>
      (ts + graft.functions.DetHash.md5Long60(id.toString) % 21600000000L, id, ts)
    }.sortBy(x => (x._1, x._2))
    var prevMax = Long.MinValue
    val lates = byArrival.map { case (_, _, ts) =>
      val l = if (prevMax != Long.MinValue && ts < prevMax) prevMax - ts else 0L
      prevMax = math.max(prevMax, ts); l
    }
    val delays = Seq(900L, 3600L, 7200L, 14400L, 21600L)
    val drops = delays.map(d => d -> lates.count(_ > d * 1000000L).toLong).toMap
    def hup(n: Long, d: Long) = (2 * n * 1000000L + d) / (2 * d)
    val rec = delays.filter(d => hup(drops(d), ev.length) <= 10000L)
      .sorted.headOption
    val r = graft.queries.Events.e39WatermarkPlan(spark, sf).collect()
      .map(x => x.getAs[Long]("delay_s") -> x).toMap
    assert(r.keySet == delays.toSet)
    delays.foreach { d =>
      assert(r(d).getAs[Long]("n_events") == ev.length.toLong, s"$d n")
      assert(r(d).getAs[Long]("n_dropped") == drops(d), s"$d dropped")
      assert(r(d).getAs[Long]("drop_e6") == hup(drops(d), ev.length), s"$d rate")
      assert(r(d).getAs[Long]("recommended") == (if (rec.contains(d)) 1L else 0L), s"$d rec")
    }
    // the plan must be non-trivial: some candidate drops events, some doesn't
    assert(drops(delays.head) > 0L, "smallest delay drops nothing — vacuous")
    assert(drops(delays.last) == 0L && rec.nonEmpty, "no viable delay — fixture broken")
  }

  test("e20 disorder audit: driver recompute under the planted jitter; non-vacuous") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (u, es) =>
      val byArrival = es.map { case (_, id, ts) =>
        (ts + graft.functions.DetHash.md5Long60(id.toString) % 21600000000L, id, ts)
      }.sortBy(x => (x._1, x._2))
      var prevMax = Long.MinValue
      var late = 0L; var maxD = 0L
      byArrival.foreach { case (_, _, ts) =>
        if (prevMax != Long.MinValue && ts < prevMax) {
          late += 1; maxD = math.max(maxD, prevMax - ts)
        }
        prevMax = math.max(prevMax, ts)
      }
      u -> ((es.length.toLong, late, maxD))
    }
    val r = graft.queries.Events.e20DisorderAudit(spark, sf).collect()
    assert(r.length == expected.size)
    r.foreach { row =>
      val (n, late, maxD) = expected(row.getAs[Long]("user_id"))
      assert(row.getAs[Long]("n_events") == n)
      assert(row.getAs[Long]("n_late") == late)
      assert(row.getAs[Long]("max_disorder_us") == maxD)
      assert(row.getAs[Long]("late_e6") == (2 * late * 1000000L + n) / (2 * n))
    }
    // the planted 0-6h ingest delay must actually create disorder, or the
    // audit (and this spec) is vacuous
    assert(r.map(_.getAs[Long]("n_late")).sum > 0, "no disorder planted — vacuous audit")
  }

  test("s23 delete maintenance: cell ledger reconciles; post-delete search = survivor slice of full ranking") {
    val cells = Knn.s23AnnDelete(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val nTotal = emb.count()
    val nTomb = emb.filter($"vec_id" % 8 === 3).count()
    cells.foreach { r =>
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_deleted"))
    }
    assert(cells.map(_.getAs[Long]("n_before")).sum == nTotal)
    assert(cells.map(_.getAs[Long]("n_deleted")).sum == nTomb)
    assert(nTomb > 0, "no tombstones in the corpus — vacuous audit")
    // the search contract: deleting from the index must be EXACTLY
    // removing the tombstones from the ranking — the survivors' order
    // is untouched and no tombstone surfaces
    val full = Knn.s1Brute(spark, sf, k = 1000000).collect()
      .groupBy(_.getAs[Long]("query_id"))
    full.values.foreach { rows =>
      val survivors = rows.sortBy(_.getAs[Int]("rank"))
        .filter(_.getAs[Long]("neighbor_id") % 8 != 3).take(5)
      assert(survivors.length == 5)
      assert(survivors.forall(_.getAs[Long]("neighbor_id") % 8 != 3))
      val sims = survivors.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("e23 debounce: rollup matches a driver-side gap recompute") {
    // gap widened vs the registered default: at sf0.001 per-key
    // inter-arrivals exceed 300 s everywhere, and a zero-suppression
    // pass would be vacuous (the sf0.01 oracle gate exercises the
    // default, where bounces exist)
    val gapSeconds = 3600
    val got = Events.e23Debounce(spark, sf, gapSeconds).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_suppressed"))).toMap
    val evs = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id").collect()
      .map { r =>
        val t = r.getTimestamp(2)
        val us = Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        (r.getLong(0), r.getString(1), us, r.getLong(3))
      }
    val expected = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(e => (e._3, e._4))
      sorted.zipWithIndex.map { case (e, i) =>
        (e._2, if (i == 0 || e._3 - sorted(i - 1)._3 > gapSeconds * 1000000L) 1L else 0L)
      }
    }.groupBy(_._1).map { case (t, ks) =>
      t -> (ks.size.toLong, ks.map(_._2).sum, ks.size.toLong - ks.map(_._2).sum)
    }
    assert(got == expected)
    assert(got.values.map(_._3).sum > 0, "no bounces in the data — vacuous audit")
  }

  test("e24 hopping windows: every event lands in exactly 4 windows; a window equals its direct slice") {
    val r = Events.e24HoppingWindow(spark, sf).collect()
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_events")).sum == 4L * nEvents)
    // spot-check: one window's count equals a direct range filter
    val w = r(r.length / 2)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val startMs = fmt.parse(w.getAs[String]("w_start")).getTime
    val direct = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === w.getAs[String]("event_type") &&
        unix_micros($"ts") >= startMs * 1000L &&
        unix_micros($"ts") < (startMs + 3600000L) * 1000L)
      .count()
    assert(direct == w.getAs[Long]("n_events"))
  }

  test("e25 sliding distinct: people never exceed events; spot window matches a direct distinct") {
    val r = Events.e25SlidingDistinct(spark, sf).collect()
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_events")).sum == 4L * nEvents)
    r.foreach(row =>
      assert(row.getAs[Long]("n_users") <= row.getAs[Long]("n_events")))
    // the diagnostic the query exists for: somewhere volume and people
    // genuinely diverge (repeat events inside one window)
    assert(r.exists(row => row.getAs[Long]("n_users") < row.getAs[Long]("n_events")),
      "every window has all-distinct users — vacuous panel")
    val w = r(r.length / 3)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val startMs = fmt.parse(w.getAs[String]("w_start")).getTime
    val direct = graft.sources.Tables.events(spark, sf)
      .filter(unix_micros($"ts") >= startMs * 1000L &&
        unix_micros($"ts") < (startMs + 3600000L) * 1000L)
      .select($"user_id").distinct().count()
    assert(direct == w.getAs[Long]("n_users"))
  }

  test("q32 MAD: both order statistics match a driver-side percentile_disc recompute") {
    val got = graft.queries.Tpch.q32Mad(spark, sf).collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("median_cents"), r.getAs[Long]("mad_cents"))).toMap
    val cents = graft.sources.Tables.read(spark, sf, "lineitem")
      .select($"l_returnflag", round($"l_extendedprice" * 100).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def disc(xs: Seq[Long]): Long = { // smallest value with cum ≥ ⌈n/2⌉
      val s = xs.sorted; s((s.length + 1) / 2 - 1)
    }
    val expected = cents.groupBy(_._1).map { case (f, rows) =>
      val vs = rows.map(_._2).toSeq
      val med = disc(vs)
      (f, (vs.size.toLong, med, disc(vs.map(v => math.abs(v - med)))))
    }
    assert(got == expected)
    got.values.foreach { case (_, _, mad) => assert(mad > 0L) }
  }

  test("s24 OOD flags: fence is the exact disc p99; flag counts reconcile") {
    val r = Knn.s24OodFlags(spark, sf).collect()
    assert(r.nonEmpty)
    val fence = r.head.getAs[Long]("fence_e6")
    assert(r.forall(_.getAs[Long]("fence_e6") == fence), "fence must be global")
    val nTotal = r.map(_.getAs[Long]("n_vectors")).sum
    val nOod = r.map(_.getAs[Long]("n_ood")).sum
    // disc p99: at most 1% of the corpus sits strictly above the fence,
    // and on a continuous-ish distance distribution some do
    assert(nOod <= nTotal / 100 + 1, s"$nOod OOD of $nTotal exceeds the p99 contract")
    assert(nOod > 0, "no outliers above p99 — vacuous fence")
  }

  test("q33 pareto: deciles partition the customers; Lorenz shares are monotone and sum to ~1e6") {
    val r = graft.queries.Tpch.q33Pareto(spark, sf).collect()
    val nCust = graft.sources.Tables.read(spark, sf, "orders")
      .select($"o_custkey").distinct().count()
    assert(r.map(_.getAs[Long]("n_customers")).sum == nCust)
    val shares = r.map(_.getAs[Long]("share_e6"))
    // decile 0 (top customers) must hold the largest share, then decay
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
    assert(math.abs(shares.sum - 1000000L) <= r.length / 2 + 1)
    assert(r.last.getAs[Long]("cum_share_e6") == shares.sum)
    assert(shares.head > 1000000L / r.length, "top decile no richer than uniform — vacuous audit")
  }

  test("t29 length outliers: fences reconcile with a driver recompute; flags non-vacuous") {
    val got = graft.text.TextAnalysis.t29LengthOutliers(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("median_toks"), r.getAs[Long]("mad_toks"),
          r.getAs[Long]("n_long"), r.getAs[Long]("n_short"))).toMap
    val docs = graft.sources.Tables.read(spark, sf, "documents")
      .select($"source", size(split(trim($"text"), "\\s+")).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def disc(xs: Seq[Long]): Long = { val s = xs.sorted; s((s.length + 1) / 2 - 1) }
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val vs = rows.map(_._2).toSeq
      val med = disc(vs); val mad = disc(vs.map(v => math.abs(v - med)))
      val hi = med + 3 * mad; val lo = math.max(med - 3 * mad, 0L)
      (src, (vs.size.toLong, med, mad,
        vs.count(_ > hi).toLong, vs.count(_ < lo).toLong))
    }
    assert(got == expected)
    assert(got.values.map(_._4).sum + got.values.map(_._5).sum > 0,
      "no length outliers anywhere — vacuous fences")
  }

  test("w8 share of total: shares per year sum to ~1e6 and reconcile with the year total") {
    val r = graft.queries.Tpch.w8ShareOfTotal(spark, sf).collect()
    r.groupBy(_.getAs[Long]("yr")).foreach { case (_, rows) =>
      val total = rows.head.getAs[Long]("yr_total_cents")
      assert(rows.map(_.getAs[Long]("rev_cents")).sum == total)
      val shareSum = rows.map(_.getAs[Long]("share_e6")).sum
      // each half-up share rounds by ≤ 0.5 ulp, so the sum sits within
      // |nations|/2 of the exact 1e6
      assert(math.abs(shareSum - 1000000L) <= rows.length / 2 + 1)
    }
  }

  test("g8 basket lift: scores recompute exactly from the ledger columns; order is deterministic") {
    val r = graft.queries.GraphQueries.g8BasketLift(spark, sf).collect()
    assert(r.nonEmpty)
    val nBaskets = graft.sources.Tables.read(spark, sf, "lineitem")
      .select($"l_orderkey").distinct().count()
    r.foreach { row =>
      val (co, ca, cb) = (row.getAs[Long]("cooccur"),
        row.getAs[Long]("cnt_a"), row.getAs[Long]("cnt_b"))
      val expected = ((BigInt(2) * (BigInt(co) * nBaskets * 1000000) + BigInt(ca) * cb)
        / (BigInt(2) * ca * cb)).toLong
      assert(row.getAs[Long]("lift_e6") == expected)
    }
    val lifts = r.map(_.getAs[Long]("lift_e6"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("s33 BQ: sign bits, Hamming shortlist and L2 rerank match a driver recompute; s34 reconciles") {
    import graft.similarity.Knn
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6).toLong).toArray).toMap
    def bits(e: Array[Long]): (Long, Long) = {
      def half(off: Int) = (0 until 32).foldLeft(0L) { (acc, i) =>
        if (e(off + i) > 0L) acc | (1L << i) else acc }
      (half(0), half(32))
    }
    val queries = vecs.filter(_._1 < 10); val corpus = vecs.filter(_._1 >= 10)
    val expect = queries.flatMap { case (q, qe) =>
      val (qlo, qhi) = bits(qe)
      val short = corpus.toSeq.map { case (c, ce) =>
        val (clo, chi) = bits(ce)
        (c, java.lang.Long.bitCount(qlo ^ clo) + java.lang.Long.bitCount(qhi ^ chi))
      }.sortBy { case (c, h) => (h, c) }.take(25)
      short.map { case (c, h) =>
        val ce = corpus(c)
        val d = qe.zip(ce).map { case (a, b) => (a - b) * (a - b) }.sum
        (q, c) -> ((h.toLong, d))
      }.sortBy { case ((_, c), (_, d)) => (d, c) }.take(5).zipWithIndex
        .map { case (((qq, c), (h, d)), i) => (qq, c) -> ((h, d, i + 1)) }
    }
    val got = Knn.s33BqAnn(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        ((r.getAs[Long]("hamming"), r.getAs[Long]("sq_dist"), r.getAs[Int]("rank")))).toMap
    assert(got == expect.toMap, "BQ shortlist+rerank must recompute exactly")
    // s34 = overlap of s33's ids with the exact L2 top-5
    val exact = queries.map { case (q, qe) =>
      q -> corpus.toSeq.map { case (c, ce) =>
        (c, qe.zip(ce).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (c, d) => (d, c) }.take(5).map(_._1).toSet
    }
    val audit = Knn.s34BqRecall(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("recall_e6")))).toMap
    exact.foreach { case (q, ex) =>
      val hits = got.keys.collect { case (`q`, c) if ex(c) => c }.size.toLong
      assert(audit(q) == ((hits, hits * 200000L)), s"query $q audit")
    }
  }

  test("persisted IVF index: served results are bit-identical to s8; probe read is partition-pruned") {
    import graft.similarity.Knn
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    Knn.saveIvfIndex(spark, sf, idx)
    // the layout is the contract: kc centroid rows, cell= partition dirs
    assert(spark.read.parquet(s"$idx/centroids.parquet").count() == 8L)
    val dirs = new java.io.File(s"$idx/postings.parquet").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("cell=\\d+")))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank"))
    val served = Knn.s8FromIndex(spark, sf, idx)
    val got = served.collect().map(key).toSet
    val fresh = Knn.s8IvfKm(spark, sf).collect().map(key).toSet
    assert(got == fresh && got.nonEmpty, "served index must replay s8 bit-identically")
    // the serving scan must be prunable: the probe join rides the
    // partition column, so Spark plans dynamic partition pruning (or
    // static pruning) on the postings scan rather than a full read
    val planStr = served.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning") ||
      planStr.toLowerCase.contains("partitionfilters: [isnotnull(cell"),
      "postings scan is not partition-pruned")
  }

  test("persisted IVF-PQ index: served results replay s30 bit-identically off cell-pruned postings") {
    import graft.similarity.Knn
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx").toString
    Knn.saveIvfPqIndex(spark, sf, idx)
    // layout contract: kc coarse rows, m×16 codeword sidecar rows
    // (empty residual clusters may drop out — ≤ is the Lloyd's
    // contract), cell= partition dirs carrying only code ints
    assert(spark.read.parquet(s"$idx/centroids.parquet").count() == 8L)
    val nBooks = spark.read.parquet(s"$idx/codebooks.parquet").count()
    assert(nBooks > 8L && nBooks <= 128L, s"codebook rows: $nBooks")
    val dirs = new java.io.File(s"$idx/postings.parquet").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("cell=\\d+")))
    assert(spark.read.parquet(s"$idx/postings.parquet").columns.sorted.toSeq ==
      Seq("cell", "code", "neighbor_id", "s"), "postings must carry codes, never vectors")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("adist_e12"), r.getAs[Int]("rank"))
    val got = Knn.s30FromIndex(spark, sf, idx).collect().map(key).toSet
    val fresh = Knn.s30IvfPqAnn(spark, sf).collect().map(key).toSet
    assert(got == fresh && got.nonEmpty, "served index must replay s30 bit-identically")
  }

  test("persisted BQ index: served results replay s33 bit-identically off the sketch file") {
    import graft.similarity.Knn
    val idx = java.nio.file.Files.createTempDirectory("graft-bq-idx").toString
    Knn.saveBqIndex(spark, sf, idx)
    // 16 B/row sketches, corpus rows only
    val bits = spark.read.parquet(s"$idx/bits.parquet")
    assert(bits.columns.sorted.toSeq == Seq("bhi", "blo", "vec_id"))
    assert(bits.filter($"vec_id" < 10).count() == 0L, "queries never land in the index")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("hamming"), r.getAs[Long]("sq_dist"), r.getAs[Int]("rank"))
    val got = Knn.s33FromIndex(spark, sf, idx).collect().map(key).toSet
    val fresh = Knn.s33BqAnn(spark, sf).collect().map(key).toSet
    assert(got == fresh && got.nonEmpty, "served index must replay s33 bit-identically")
  }

  test("persisted walk index: served beam search replays s35 bit-identically off the edge file") {
    import graft.similarity.Knn
    val idx = java.nio.file.Files.createTempDirectory("graft-walk-idx").toString
    Knn.saveWalkIndex(spark, sf, idx)
    // layout contract: kc entry cells + bare long edge pairs
    assert(spark.read.parquet(s"$idx/centroids.parquet").count() == 8L)
    val adj = spark.read.parquet(s"$idx/adjacency.parquet")
    assert(adj.columns.sorted.toSeq == Seq("neighbor_id", "src_id"),
      "adjacency must carry bare id pairs, never vectors")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank"))
    val got = Knn.s35FromIndex(spark, sf, idx).collect().map(key).toSet
    val fresh = Knn.s35GraphWalk(spark, sf).collect().map(key).toSet
    assert(got == fresh && got.nonEmpty, "served index must replay s35 bit-identically")
    // the layout records its build parameters (degree first — s38's
    // priced knob)
    assert(Knn.walkIndexMeta(spark, idx) == ((3, 8, 4)))
    // the s38-chosen operating point ships through the SAME layout: a
    // degree-16 build records its degree, persists the denser edge
    // file bit-equal to the in-session build, and serves a walk whose
    // deeper graph finds strictly-better-or-equal neighbors
    val idx16 = java.nio.file.Files.createTempDirectory("graft-walk-idx16").toString
    Knn.saveWalkIndex(spark, sf, idx16, degree = 16)
    assert(Knn.walkIndexMeta(spark, idx16)._1 == 16)
    val edges16 = spark.read.parquet(s"$idx16/adjacency.parquet")
      .select("src_id", "neighbor_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(edges16.size > adj.count(), "degree 16 must persist a denser edge file")
    val memoEdges = Knn.walkAdjacency(spark, sf, 16)
      .select("src_id", "neighbor_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(edges16 == memoEdges,
      "persisted degree-16 adjacency must equal the in-session build")
    val got16 = Knn.s35FromIndex(spark, sf, idx16).collect().map(key).toSet
    assert(got16.nonEmpty && got16 != got,
      "the degree-16 serve must actually walk the deeper graph")
  }

  test("persisted MAINTAINED walk index: merged and compacted adjacencies checkpoint and replay serving bit-identically") {
    import graft.similarity.Knn
    import org.apache.spark.sql.functions.{col, lit, pmod}
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"), r.getAs[Int]("rank"))
    val cents = Knn.oldCentroids(spark, sf, 8, 4)
    // s39's merged index: save post-attach, serve from the layout —
    // a deployment checkpoints the attach instead of re-running it
    val idxM = java.nio.file.Files.createTempDirectory("graft-walk-merged").toString
    Knn.saveWalkIndexFrom(spark, idxM,
      Knn.walkAttachAdjacency(spark, sf), cents, degree = 3)
    assert(Knn.walkIndexMeta(spark, idxM) == ((3, 8, 4)))
    val gotM = Knn.s35FromIndex(spark, sf, idxM).collect().map(key).toSet
    val freshM = Knn.graphWalkParts(spark, sf,
      Knn.walkAttachAdjacency(spark, sf), cents, 5, 4, 3)._2
      .collect().map(key).toSet
    assert(gotM == freshM && gotM.nonEmpty,
      "served merged index must replay the in-session attach serving bit-identically")
    // the saved edge file IS the merged adjacency (batch edges included)
    val savedM = spark.read.parquet(s"$idxM/adjacency.parquet")
    assert(savedM.filter(pmod(col("neighbor_id"), lit(8)) === 7 &&
        col("neighbor_id") >= 10).count() > 0L,
      "the checkpoint lost the attached batch's reachability edges")
    // s41's compacted index: save post-compaction, serve live-only —
    // the full lifecycle (build→insert→delete→compact) checkpoints
    val live = pmod(col("vec_id"), lit(8)) =!= 3
    val idxC = java.nio.file.Files.createTempDirectory("graft-walk-compact").toString
    Knn.saveWalkIndexFrom(spark, idxC,
      Knn.walkCompactAdjacency(spark, sf), cents, degree = 3)
    val gotC = Knn.s35FromIndex(spark, sf, idxC, live = live).collect().map(key).toSet
    val freshC = Knn.graphWalkParts(spark, sf,
      Knn.walkCompactAdjacency(spark, sf), cents, 5, 4, 3, live = live)._2
      .collect().map(key).toSet
    assert(gotC == freshC && gotC.nonEmpty,
      "served compacted index must replay the in-session compaction serving bit-identically")
    // the checkpointed compacted graph keeps the restored degree budget
    val maxDeg = spark.read.parquet(s"$idxC/adjacency.parquet")
      .groupBy("src_id").count()
      .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(maxDeg <= 6L, s"persisted compacted index overflows the budget: $maxDeg")
  }

  test("g12 components: size histogram matches a driver union-find over the co-pair index") {
    val r = graft.queries.GraphQueries.g12Components(spark, sf).collect()
      .map(x => x.getAs[Long]("comp_size") -> x.getAs[Long]("n_components")).toMap
    val edges = graft.queries.GraphQueries.g6CoPairs(spark, sf).collect()
      .map(x => (x.getAs[Long]("a"), x.getAs[Long]("b")))
    val parts = graft.sources.Tables.read(spark, sf, "part")
      .select($"p_partkey").collect().map(_.getLong(0))
    val par = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r0 = x
      while (par.getOrElse(r0, r0) != r0) { par(r0) = par.getOrElse(par(r0), par(r0)); r0 = par(r0) }
      r0
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) par(ra) = rb
    }
    val sizes = parts.groupBy(find).map(_._2.length.toLong)
    val expect = sizes.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    assert(r == expect, s"got $r want $expect")
    // every part is accounted for exactly once
    assert(r.map { case (s, n) => s * n }.sum == parts.length.toLong)
  }

  test("e26 hazard: life-table reconciles with per-user spans; churned + censored = users") {
    val r = Events.e26Hazard(spark, sf).collect()
    assert(r.nonEmpty)
    val spans = graft.sources.Tables.events(spark, sf)
      .select($"user_id", expr("unix_micros(ts) DIV 604800000000").as("w")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).values.map(xs => (xs.map(_._2).min, xs.map(_._2).max)).toSeq
    val w1 = spans.map(_._2).max
    assert(r.map(_.getAs[Long]("churned")).sum + r.map(_.getAs[Long]("censored")).sum
      == spans.size)
    r.foreach { row =>
      val w = row.getAs[Long]("week")
      assert(row.getAs[Long]("at_risk") == spans.count { case (f, l) => f <= w && l >= w })
      assert(row.getAs[Long]("churned") ==
        (if (w < w1) spans.count(_._2 == w) else 0))
    }
    // hazard is a probability: 0 ≤ h ≤ 1e6 wherever defined
    r.filter(!_.isNullAt(4)).foreach { row =>
      val h = row.getAs[Long]("hazard_e6")
      assert(h >= 0L && h <= 1000000L)
    }
  }

  test("e27 bot flags: per-user stats match a driver recompute of gaps, median and burst") {
    val r = Events.e27BotFlags(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("s"), $"event_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val byUser = ev.groupBy(_._1)
    assert(r.length == byUser.size)
    r.foreach { row =>
      val u = row.getAs[Long]("user_id")
      val ts = byUser(u).sortBy(e => (e._2, e._3)).map(_._2)
      assert(row.getAs[Long]("n_events") == ts.length)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      if (gaps.isEmpty) {
        assert(row.isNullAt(row.fieldIndex("min_gap_us")))
        assert(row.isNullAt(row.fieldIndex("median_gap_us")))
      } else {
        assert(row.getAs[Long]("min_gap_us") == gaps.min)
        val sorted = gaps.sorted
        assert(row.getAs[Long]("median_gap_us") == sorted((gaps.length + 1) / 2 - 1))
      }
      val burst = ts.map(t => ts.count(x => x > t - 60000000L && x <= t)).max
      assert(row.getAs[Long]("burst60_max") == burst)
    }
  }

  test("e28 ab lift: arms partition the users; assignment, rates and lift recompute") {
    val r = Events.e28AbLift(spark, sf).collect()
    assert(r.length == 2)
    val users = graft.sources.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("conv"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def arm(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(6), 16) % 2
    }
    val byArm = users.groupBy(x => arm(x._1))
    assert(r.map(_.getAs[Long]("n_users")).sum == users.length)
    val rates = r.map(row => row.getAs[Long]("arm") -> row.getAs[Long]("rate_e6")).toMap
    r.foreach { row =>
      val a = row.getAs[Long]("arm")
      assert(row.getAs[Long]("n_users") == byArm(a).length)
      assert(row.getAs[Long]("n_conv") == byArm(a).count(_._2 == 1L))
      val expRate = ((BigInt(2) * (BigInt(byArm(a).count(_._2 == 1L)) * 1000000)
        + byArm(a).length) / (BigInt(2) * byArm(a).length)).toLong
      assert(row.getAs[Long]("rate_e6") == expRate)
      if (a == 1L)
        assert(row.getAs[Long]("lift_abs_e6") == rates(1L) - rates(0L))
    }
  }

  test("s25 centroid drift equals the gap between successive cached trainings") {
    val r = Knn.s25CentroidDrift(spark, sf).collect()
    assert(r.nonEmpty)
    val c4 = Knn.lloydCentroids(spark, sf, 8, 4).toMap
    val c5 = Knn.lloydCentroids(spark, sf, 8, 5).toMap
    r.foreach { row =>
      val cl = row.getAs[Long]("cell").toInt
      val d = c4(cl).zip(c5(cl)).map { case (a, b) => val x = b - a; x * x }.sum
      assert(row.getAs[Long]("drift_sq") == d, s"cell $cl")
      assert(row.getAs[Long]("drift_e6") ==
        math.floor(math.sqrt(d.toDouble)).toLong)
    }
  }

  test("s26 dim variance matches an exact BigInt co-moment recompute") {
    val r = Knn.s26DimVariance(spark, sf).collect()
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getAs[Seq[Float]]("embedding").map(f =>
        BigInt(math.floor(f.toDouble * 1e6).toLong)).toArray)
    val dim = vecs.head.length
    assert(r.length == dim)
    val varE12 = (0 until dim).map { d =>
      val vs = vecs.map(_(d))
      val n = BigInt(vs.length)
      val sv = vs.sum
      val svv = vs.map(v => v * v).sum
      val cvv = n * svv - sv * sv
      val mean = if (sv >= 0) (2 * sv + n) / (2 * n) else -((2 * -sv + n) / (2 * n))
      val row = r(d)
      assert(row.getAs[Long]("n_vectors") == vs.length.toLong)
      assert(row.getAs[Long]("mean_e6") == mean.toLong, s"dim $d mean")
      assert(row.getAs[Long]("var_e12") == (cvv / (n * n)).toLong, s"dim $d var")
      cvv / (n * n)
    }
    val tot = varE12.sum
    r.zip(varE12).foreach { case (row, v) =>
      assert(row.getAs[Long]("var_share_e6") ==
        ((2 * v * 1000000 + tot) / (2 * tot)).toLong)
    }
  }

  test("s27 coreset trace equals a driver farthest-first recompute") {
    val r = Knn.s27Coreset(spark, sf, k = 4).collect()
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(x => x.getLong(0) -> x.getAs[Seq[Float]]("embedding").map(f =>
        math.floor(f.toDouble * 1e6).toLong).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = vecs.keys.min
    var mind = vecs.map { case (id, v) => id -> d2(v, vecs(seed)) }
    val expect = scala.collection.mutable.ArrayBuffer[(Long, Option[Long], Long)](
      (0L, Some(seed), 0L))
    for (round <- 1 to 3) {
      val (pid, pd) = mind.toSeq.minBy { case (id, d) => (-d, id) }
      expect += ((round.toLong, Some(pid), pd))
      mind = mind.map { case (id, d) => id -> math.min(d, d2(vecs(id), vecs(pid))) }
    }
    expect += ((4L, None, mind.values.max))
    assert(r.length == expect.length)
    r.zip(expect).foreach { case (row, (round, cid, rad)) =>
      assert(row.getAs[Long]("round") == round)
      assert(Option(row.getAs[java.lang.Long]("center_id")).map(_.toLong) == cid,
        s"round $round center")
      assert(row.getAs[Long]("radius_sq") == rad, s"round $round radius")
    }
    // the selection radius curve is non-increasing and bounds coverage
    val picks = r.filter(x => x.getAs[Long]("round") >= 1 && x.getAs[Long]("round") <= 3)
      .map(_.getAs[Long]("radius_sq"))
    assert(picks.zip(picks.tail).forall { case (a, b) => a >= b })
    assert(r.last.getAs[Long]("radius_sq") <= picks.last)
  }

  test("e30 interarrival bins recompute from per-user gap lists") {
    val r = Events.e30Interarrival(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    val gaps = ev.groupBy(x => (x._1, x._2)).toSeq.flatMap { case ((_, t), rows) =>
      val sorted = rows.sortBy(x => (x._3, x._4)).map(_._3)
      sorted.zip(sorted.tail).map { case (a, b) => (t, b - a) }
    }
    def bin(g: Long): Long = math.max(63 - java.lang.Long.numberOfLeadingZeros(g), 0).toLong
    val cells = gaps.groupBy { case (t, g) => (t, bin(g)) }.view.mapValues(_.size.toLong).toMap
    assert(r.map(_.getAs[Long]("n_gaps")).sum == gaps.length.toLong)
    assert(r.length == cells.size)
    r.foreach { row =>
      val k = (row.getAs[String]("event_type"), row.getAs[Long]("bin"))
      assert(cells(k) == row.getAs[Long]("n_gaps"), s"cell $k")
    }
  }

  /** Shared driver recompute of the e31/e32 zero-filled trailing-32-day
    * window: type -> (dayIndexed x vector ordered t=1..W). */
  private def dailyWindow(): Map[String, Vector[(Long, Long)]] = {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(x => (x.getString(0), x.getLong(1) / 86400000000L))
    val hi = ev.map(_._2).max
    val lo = math.max(ev.map(_._2).min, hi - 31)
    val counts = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    ev.map(_._1).distinct.sorted.map { t =>
      t -> (lo to hi).map(d => (d, counts.getOrElse((t, d), 0L))).toVector
    }.toMap
  }

  test("e31 ses forecast equals the closed-form exact EWMA recompute") {
    val r = Events.e31SesForecast(spark, sf).collect()
    val win = dailyWindow()
    def hup(n: BigInt, d: BigInt): BigInt = (2 * n + d) / (2 * d)
    assert(r.map(_.getAs[String]("event_type")).toSet == win.keySet)
    r.foreach { row =>
      val xs = win(row.getAs[String]("event_type")).map(_._2)
      val w = xs.length
      // direct recurrence, exact rationals: s_t = (x_t + s_{t-1})/2
      val p = xs.zipWithIndex.map { case (x, i) =>
        if (i == 0) BigInt(x) else BigInt(x) << (i - 1)
      }.sum
      assert(row.getAs[Long]("n_days") == w.toLong)
      assert(row.getAs[Long]("x_last") == xs.last)
      assert(row.getAs[Long]("sma_e6") == hup(BigInt(xs.sum) * 1000000, BigInt(w)).toLong)
      assert(row.getAs[Long]("ses_e6") == hup(p * 1000000, BigInt(1) << (w - 1)).toLong)
      assert(row.getAs[Long]("diff_e6") ==
        row.getAs[Long]("ses_e6") - row.getAs[Long]("sma_e6"))
    }
  }

  test("e33 cohort LTV: cells, cums and per-user scaling recompute from raw events") {
    val r = Events.e33CohortLtv(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect().map(x => (x.getLong(0), x.getLong(1) / 86400000000L,
        x.getString(2), x.getDouble(3)))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min / 7).toMap
    // valueOf (canonical repr), NOT new BigDecimal(double) (exact
    // binary expansion) — Spark's double→DECIMAL(18,4) cast rounds the
    // canonical form, matching EventStream.e4Of
    def e4(v: Double): Long = java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).movePointRight(4).longValueExact()
    val cells = ev.filter(_._3 == "purchase")
      .groupBy(x => (cohort(x._1), x._2 / 7 - cohort(x._1)))
      .view.mapValues(_.map(x => e4(x._4)).sum).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(r.length == cells.size)
    def hup(n: BigInt, d: BigInt): BigInt = (2 * n + d) / (2 * d)
    r.groupBy(_.getAs[Long]("cohort_week")).foreach { case (cw, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("age_wk")).foreach { row =>
        val k = (cw, row.getAs[Long]("age_wk"))
        cum += cells(k)
        assert(row.getAs[Long]("rev_e4") == cells(k), s"cell $k")
        assert(row.getAs[Long]("cum_rev_e4") == cum, s"cum $k")
        assert(row.getAs[Long]("n_users") == sizes(cw), s"size $cw")
        assert(row.getAs[Long]("ltv_e6") ==
          hup(BigInt(cum) * 100, BigInt(sizes(cw))).toLong, s"ltv $k")
      }
    }
    // LTV must be non-decreasing in age within a cohort
    r.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rows) =>
      val l = rows.sortBy(_.getAs[Long]("age_wk")).map(_.getAs[Long]("ltv_e6"))
      assert(l.zip(l.tail).forall { case (a, b) => a <= b })
    }
  }

  test("e34 rolling median: trailing-7 disc-median and residual recompute") {
    val r = Events.e34RollingMedian(spark, sf).collect()
    val win = dailyWindow()
    assert(r.length == win.values.map(_.size).sum)
    r.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val xs = win(t).map(_._2)
      rows.sortBy(_.getAs[Long]("day")).zipWithIndex.foreach { case (row, i) =>
        val prefix = xs.slice(math.max(0, i - 6), i + 1).sorted
        val med = prefix((prefix.length + 1) / 2 - 1)
        assert(row.getAs[Long]("x") == xs(i), s"$t day $i x")
        assert(row.getAs[Long]("n_win") == prefix.length.toLong, s"$t day $i n")
        assert(row.getAs[Long]("roll_med") == med, s"$t day $i med")
        assert(row.getAs[Long]("dev") == xs(i) - med, s"$t day $i dev")
      }
    }
  }

  test("e35 backtest: one-step errors, MAE and skill recompute from the recurrence") {
    val r = Events.e35SesBacktest(spark, sf).collect()
    val win = dailyWindow()
    def hup(n: BigInt, d: BigInt): BigInt = (2 * n + d) / (2 * d)
    assert(r.map(_.getAs[String]("event_type")).toSet == win.keySet)
    r.foreach { row =>
      val xs = win(row.getAs[String]("event_type")).map(_._2)
      // forecasts from the literal recurrence in exact rationals,
      // published at x1e6 before scoring (the operator's contract)
      var sn = BigInt(xs.head); var sd = BigInt(1)
      val errs = xs.tail.map { x =>
        val fc = hup(sn * 1000000, sd)
        sn = BigInt(x) * sd + sn; sd = sd * 2
        (BigInt(x) * 1000000 - fc).abs
      }
      val naive = xs.zip(xs.tail).map { case (a, b) => BigInt((b - a).abs) * 1000000 }
      val n = BigInt(xs.length - 1)
      assert(row.getAs[Long]("n_scored") == xs.length.toLong - 1)
      assert(row.getAs[Long]("mae_e6") == hup(errs.sum, n).toLong)
      assert(row.getAs[Long]("naive_mae_e6") == hup(naive.sum, n).toLong)
      val mae = BigInt(row.getAs[Long]("mae_e6"))
      val nm = BigInt(row.getAs[Long]("naive_mae_e6"))
      assert(row.getAs[Long]("skill_e6") ==
        (if (nm == 0) 0L else hup(mae * 1000000, nm).toLong))
    }
  }

  test("e32 changepoint is the max-|CUSUM| day with the earliest-t tie-break") {
    val r = Events.e32Changepoint(spark, sf).collect()
    val win = dailyWindow()
    def hup(n: BigInt, d: BigInt): BigInt = (2 * n + d) / (2 * d)
    r.foreach { row =>
      val days = win(row.getAs[String]("event_type"))
      val xs = days.map(_._2)
      val n = BigInt(xs.length)
      val s = BigInt(xs.sum)
      val cus = xs.scanLeft(BigInt(0))(_ + _).tail.zipWithIndex.map {
        case (pt, i) => (n * pt - BigInt(i + 1) * s, i + 1)
      }
      val (c, t) = cus.minBy { case (cv, tv) => (-cv.abs, tv) }
      assert(row.getAs[Long]("n_days") == xs.length.toLong)
      assert(row.getAs[Long]("total") == xs.sum)
      assert(row.getAs[Long]("cp_t") == t.toLong)
      assert(row.getAs[Long]("cp_day") == days(t - 1)._1)
      assert(row.getAs[Long]("shift_sign") == c.signum.toLong)
      assert(row.getAs[Long]("cusum_e6") ==
        (if (s == 0) 0L else hup(c.abs * 1000000, n * s).toLong))
    }
  }

  test("s29 NN-descent: refined graph is valid top-k, audit reconciles, recall never regresses") {
    val k = 3
    val refined = Knn.nnDescentRound(spark, sf, k).collect()
    // a valid directed kNN graph: ≤k edges per src, contiguous ranks,
    // cosines non-increasing in rank, no self edges
    refined.groupBy(_.getAs[Long]("src_id")).foreach { case (s, rows) =>
      assert(rows.length <= k)
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      val sims = byRank.map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sortBy(-(_: Double))), s"src $s not ranked")
      assert(rows.forall(_.getAs[Long]("neighbor_id") != s))
    }
    // every refined cosine that also has an exact yardstick matches it
    val exact = Knn.s1Brute(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    refined.foreach { r =>
      val key = (r.getAs[Long]("src_id"), r.getAs[Long]("neighbor_id"))
      exact.get(key).foreach(c => assert(c == r.getAs[Double]("cos_sim"), s"$key"))
    }
    // the audit reconciles with a driver-side intersection (s4 pattern)
    val refSet = refined.filter(r => r.getAs[Long]("src_id") < 10 &&
        r.getAs[Long]("neighbor_id") >= 10)
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("neighbor_id"))).toSet
    val audit = Knn.s29NnDescent(spark, sf).collect()
    val hitsByQ = exact.keySet.intersect(refSet)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    audit.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_hits_ref") == hitsByQ.getOrElse(q, 0L), s"query $q")
      assert(r.getAs[Long]("recall_ref_e6") == r.getAs[Long]("n_hits_ref") * 200000L)
      // one refinement round only ADDS candidates per vertex; on data
      // without adversarial query-query displacement it cannot lose
      // exact hits (it gained 7→11 of 30 attainable at sf0.01)
      assert(r.getAs[Long]("n_hits_ref") >= r.getAs[Long]("n_hits_base"), s"query $q regressed")
    }
  }

  test("s29 plan: NoN equi-joins + hash joins only — never all-pairs, no broadcast corpus") {
    val plan = Knn.nnDescentRound(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(8).mkString("\n"))
    // candidate volume respects the (2k)²-per-vertex bound: pool ≤
    // nodes·(2k)² + base edges (the never-all-pairs contract in numbers)
    import spark.implicits._
    val g = Knn.nnDescentRound(spark, sf, 3)
    val base = graft.operators.Indexes.memo(s"s29_base:$sf:3")(fail("memo must exist"))
    val nodes = base.select($"src_id").distinct().count()
    val edges = base.count()
    assert(g.count() <= nodes * 3, "refined graph exceeded k per vertex")
    assert(edges <= nodes * 3 && nodes * 36 + edges < nodes * nodes || nodes < 40,
      s"candidate bound sanity: nodes=$nodes edges=$edges")
  }

  test("s35 graph walk: valid ranked top-k, exact cosines, corpus-only; s36 audit reconciles") {
    val walk = Knn.s35GraphWalk(spark, sf).collect()
    val byQuery = walk.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 5)
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      val sims = byRank.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"query $q not ranked")
      assert(rows.forall(_.getAs[Long]("neighbor_id") >= 10L), s"query $q left the corpus")
    }
    // every walk cosine equals the exact pairing (the s2 pattern)
    val exactAll = Knn.s1Brute(spark, sf, k = 1000000).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    walk.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(exactAll(key) == r.getAs[Double]("cos_sim"), s"cosine mismatch at $key")
    }
    // s36 reconciles with a driver-side intersection of walk vs exact top-5
    val walkSet = walk
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val top5 = Knn.s1Brute(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hitsByQ = top5.intersect(walkSet)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val audit = Knn.s36WalkRecall(spark, sf).collect()
    assert(audit.length == 10)
    audit.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_hits") == hitsByQ.getOrElse(q, 0L), s"query $q")
      assert(r.getAs[Long]("recall_e6") == r.getAs[Long]("n_hits") * 200000L)
    }
    // lossy-but-alive on the real corpus (the s31/s34 convention)
    val total = audit.map(_.getAs[Long]("n_hits")).sum
    assert(total > 0, "walk found nothing — vacuous tier")
    assert(total < 50, "walk recall vacuously perfect — audit proves nothing")
  }

  test("s37 beam sweep: beam-4 row reconciles with s36; cost grows with beam") {
    val rows = Knn.s37WalkSweep(spark, sf).collect()
      .map(r => r.getAs[Long]("beam") -> r).toMap
    assert(rows.keySet == Set(2L, 4L, 8L))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 10L)
      assert(r.getAs[Long]("sum_visited") > 0L)
    }
    // the beam-4 setting IS s35's registered walk: its sweep row must
    // reconcile exactly with the s36 audit
    val audit = Knn.s36WalkRecall(spark, sf).collect().map(_.getAs[Long]("recall_e6"))
    def hu(n: Long, d: Long) = (2 * n + d) / (2 * d)
    assert(rows(4L).getAs[Long]("mean_recall_e6") == hu(audit.sum, audit.length))
    assert(rows(4L).getAs[Long]("min_recall_e6") == audit.min)
    // a wider beam visits more of the corpus — that is the cost axis
    assert(rows(8L).getAs[Long]("sum_visited") > rows(2L).getAs[Long]("sum_visited"),
      "beam widening did not grow the visited pool")
  }

  test("s38 degree sweep: degree-3 row reconciles with s37's beam-4 row; degree and the joint points buy recall at measured byte cost") {
    val rows = Knn.s38DegreeSweep(spark, sf).collect()
      .map(r => (r.getAs[Long]("degree"), r.getAs[Long]("beam")) -> r).toMap
    assert(rows.keySet ==
      Set((3L, 4L), (8L, 4L), (16L, 4L), (16L, 8L), (16L, 16L)))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 10L)
      assert(r.getAs[Long]("sum_visited") > 0L && r.getAs[Long]("n_edges") > 0L)
    }
    // the degree-3 × beam-4 cell appears in BOTH sweeps — the two
    // dials must price the same point identically
    val beam = Knn.s37WalkSweep(spark, sf).collect()
      .map(r => r.getAs[Long]("beam") -> r).toMap
    for (c <- Seq("mean_recall_e6", "min_recall_e6", "sum_visited"))
      assert(rows((3L, 4L)).getAs[Long](c) == beam(4L).getAs[Long](c),
        s"s38(d=3,b=4).$c disagrees with s37(beam=4)")
    // a denser graph costs measured bytes and visits more — the trade
    // the sweep exists to price; recall must not DROP with degree here
    assert(rows((16L, 4L)).getAs[Long]("n_edges") > rows((8L, 4L)).getAs[Long]("n_edges"))
    assert(rows((8L, 4L)).getAs[Long]("n_edges") > rows((3L, 4L)).getAs[Long]("n_edges"))
    assert(rows((16L, 4L)).getAs[Long]("bytes_per_vec") > rows((3L, 4L)).getAs[Long]("bytes_per_vec"))
    assert(rows((16L, 4L)).getAs[Long]("sum_visited") > rows((3L, 4L)).getAs[Long]("sum_visited"))
    assert(rows((16L, 4L)).getAs[Long]("mean_recall_e6") >= rows((3L, 4L)).getAs[Long]("mean_recall_e6"),
      "the deeper graph lost recall — the sweep's premise broke")
    // the JOINT frontier: on the SAME d16 index (n_edges/bytes equal),
    // widening beam must visit more and must not lose recall — the
    // d16×b8/b16 points exist to price the shipping-recall path
    assert(rows((16L, 8L)).getAs[Long]("n_edges") == rows((16L, 4L)).getAs[Long]("n_edges"))
    assert(rows((16L, 16L)).getAs[Long]("n_edges") == rows((16L, 4L)).getAs[Long]("n_edges"))
    assert(rows((16L, 16L)).getAs[Long]("sum_visited") > rows((16L, 8L)).getAs[Long]("sum_visited"))
    assert(rows((16L, 8L)).getAs[Long]("sum_visited") > rows((16L, 4L)).getAs[Long]("sum_visited"))
    assert(rows((16L, 8L)).getAs[Long]("mean_recall_e6") >= rows((16L, 4L)).getAs[Long]("mean_recall_e6"),
      "beam widening on the d16 graph lost recall")
    assert(rows((16L, 16L)).getAs[Long]("mean_recall_e6") >= rows((16L, 8L)).getAs[Long]("mean_recall_e6"),
      "beam widening on the d16 graph lost recall")
    // bytes/vec floor: the 256 B full-precision vector every degree pays
    rows.values.foreach(r => assert(r.getAs[Long]("bytes_per_vec") > 256L))
  }

  test("s39 walk insert: attach is bounded and non-vacuous; merged-index recall within the from-scratch bound") {
    val rows = Knn.s39WalkInsert(spark, sf).collect()
    assert(rows.length == 10)
    val nBatch = rows.head.getAs[Long]("n_batch")
    val nNew = rows.head.getAs[Long]("n_new_edges")
    // the attach really happened, and stayed bounded: each batch
    // vector contributes at most `degree` out-edges + their back-edges
    assert(nBatch > 0L && nNew > 0L, "vacuous attach")
    assert(nNew <= 2L * 3L * nBatch, s"attach overgrew: $nNew edges for $nBatch vectors")
    // every batch vector is REACHABLE in the merged index (a back-edge
    // lands on it), so walks can surface new content
    val madj = Knn.walkAttachAdjacency(spark, sf)
    val reachable = madj.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("neighbor_id"),
        org.apache.spark.sql.functions.lit(8)) === 7)
      .select("neighbor_id").distinct().count()
    assert(reachable == nBatch,
      s"only $reachable of $nBatch batch vectors are reachable in the merged index")
    // the from-scratch bound: serving recall on the merged index stays
    // within 0.10 of the full rebuild's (s36 — same degree/beam/rounds).
    // Insert-without-rebuild trades a LITTLE recall for not re-banding
    // the corpus; a bigger gap means the attach shape broke.
    def hu(n: Long, d: Long) = (2 * n + d) / (2 * d)
    val merged = rows.map(_.getAs[Long]("recall_e6"))
    val scratch = Knn.s36WalkRecall(spark, sf).collect().map(_.getAs[Long]("recall_e6"))
    val meanMerged = hu(merged.sum, merged.length)
    val meanScratch = hu(scratch.sum, scratch.length)
    assert((meanMerged - meanScratch).abs <= 100000L,
      s"merged-index recall $meanMerged vs from-scratch $meanScratch — gap exceeds the pinned 0.10")
  }

  test("s40 walk delete: tombstones never surface, repair keeps affected vertices connected, recall within the rebuild bound") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val rows = Knn.s40WalkDelete(spark, sf).collect()
    assert(rows.length == 10)
    val nTomb = rows.head.getAs[Long]("n_tombstones")
    val before = rows.head.getAs[Long]("n_edges_before")
    val after = rows.head.getAs[Long]("n_edges_after")
    assert(nTomb > 0L && after < before, "vacuous delete")
    // the repaired index carries NO tombstoned endpoint
    val fadj = Knn.walkDeleteAdjacency(spark, sf)
    assert(fadj.filter(pmod(col("src_id"), lit(8)) === 3 ||
        pmod(col("neighbor_id"), lit(8)) === 3).count() == 0L,
      "a tombstoned endpoint survived consolidation")
    // every vertex that LOST an edge is still connected (the repair's
    // whole point — a torn hub would strand its region)
    val base = Knn.walkAdjacency(spark, sf)
    val aff = base.filter(pmod(col("neighbor_id"), lit(8)) === 3 &&
        pmod(col("src_id"), lit(8)) =!= 3)
      .select("src_id").distinct()
    val disconnected = aff.join(fadj.select("src_id").distinct(), Seq("src_id"), "left_anti")
    assert(disconnected.count() == 0L,
      s"${disconnected.count()} affected vertices lost ALL edges")
    // serving: no tombstone in any top-k result (entry is live-only,
    // the frontier cannot reach a purged vertex)
    rows.foreach(r => assert(r.getAs[Long]("n_hits") >= 0L))
    val cents = Knn.lloydCentroids(spark, sf)
    val (_, topk) = Knn.graphWalkParts(spark, sf, fadj, cents, 5, 4, 3,
      live = pmod(col("vec_id"), lit(8)) =!= 3)
    assert(topk.filter(pmod(col("neighbor_id"), lit(8)) === 3).count() == 0L,
      "a deleted vector surfaced in served results")
    // the rebuild bound: consolidated-index recall within 0.15 of a
    // FROM-SCRATCH live-only build served the same way (delete repair
    // trades a little recall for not re-banding the corpus)
    def hu(n: Long, d: Long) = (2 * n + d) / (2 * d)
    val meanCons = hu(rows.map(_.getAs[Long]("recall_e6")).sum, rows.length)
    val live = pmod(col("vec_id"), lit(8)) =!= 3
    val scratchAdj = Knn.walkAdjacencyOn(spark, sf, 3, live, "s40_scratch")
    val scratchHits = Knn.graphWalkParts(spark, sf, scratchAdj, cents, 5, 4, 3, live = live)
      ._2.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the same live exact yardstick the registered audit uses
    import spark.implicits._
    val e = graft.sources.Tables.read(spark, sf, "embeddings")
      .select($"vec_id", $"embedding",
        graft.dedup.Dedup.vecNorm($"embedding").as("nrm"))
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q"), $"nrm".as("qn"))
    val corpus = e.filter($"vec_id" >= 10 && pmod($"vec_id", lit(8)) =!= 3)
      .select($"vec_id".as("neighbor_id"), $"embedding".as("c"), $"nrm".as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    val exLive = corpus.join(org.apache.spark.sql.functions.broadcast(queries))
      .select($"query_id", $"neighbor_id",
        org.apache.spark.sql.functions.round(
          graft.dedup.Dedup.dot($"q", $"c") / ($"qn" * $"cn"), 6).as("cos_sim"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rank" <= 5).select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val perQueryScratch = exLive.groupBy(_._1).map { case (q, s) =>
      (s.count(scratchHits.contains) * 200000L)
    }
    val meanScratch = hu(perQueryScratch.sum, perQueryScratch.size.toLong)
    assert((meanCons - meanScratch).abs <= 150000L,
      s"consolidated recall $meanCons vs from-scratch $meanScratch — gap exceeds the pinned 0.15")
  }

  test("s41 walk compact: degree budget restored, intra-batch edges formed, no strand, recall holds vs churned and the rebuild bound") {
    import org.apache.spark.sql.functions.{broadcast, col, lit, pmod, round, row_number}
    import spark.implicits._
    val degree = 3
    val rows = Knn.s41WalkCompact(spark, sf).collect()
    assert(rows.length == 10)
    val h = rows.head
    // (a) the budget: the churned index violates 2·degree BY CONTRACT
    // (attach back-edges + repair re-symmetrization land unpruned —
    // the damage the op exists to repair); compaction restores it
    assert(h.getAs[Long]("max_deg_before") > 2L * degree,
      "churn did not overflow the degree budget — the compaction spec is vacuous")
    assert(h.getAs[Long]("max_deg_after") <= 2L * degree,
      s"compaction left out-degree ${h.getAs[Long]("max_deg_after")} > ${2 * degree}")
    // the re-refinement target set is bounded and non-vacuous, and the
    // NoN round formed the intra-batch edges s39's attach deferred
    assert(h.getAs[Long]("n_affected") > 0L)
    assert(h.getAs[Long]("n_intra_batch") > 0L,
      "no intra-batch edges — the compaction's whole point")
    val cadj = Knn.walkCompactAdjacency(spark, sf)
    // no tombstoned endpoint survives (carried through from the churn)
    assert(cadj.filter(pmod(col("src_id"), lit(8)) === 3 ||
        pmod(col("neighbor_id"), lit(8)) === 3).count() == 0L,
      "a tombstoned endpoint survived compaction")
    // no live batch vector stranded: the overflow prune must not cost
    // reachability (every attached vector still has an in-edge)
    val nBatch = graft.sources.Tables.read(spark, sf, "embeddings")
      .filter(pmod($"vec_id", lit(8)) === 7 && $"vec_id" >= 10).count()
    val reachable = cadj
      .filter(pmod(col("neighbor_id"), lit(8)) === 7 && col("neighbor_id") >= 10)
      .select("neighbor_id").distinct().count()
    assert(reachable == nBatch,
      s"only $reachable of $nBatch batch vectors reachable after compaction")
    // (b) recall: compaction must not LOSE ground vs serving the
    // churned index as-is...
    def hu(n: Long, d: Long) = (2 * n + d) / (2 * d)
    val meanComp = hu(rows.map(_.getAs[Long]("recall_e6")).sum, rows.length)
    val live = pmod(col("vec_id"), lit(8)) =!= 3
    val cents = Knn.oldCentroids(spark, sf, 8, 4)
    val churn = Knn.walkChurnAdjacency(spark, sf)
    // the live exact yardstick the registered audit uses
    val e = graft.sources.Tables.read(spark, sf, "embeddings")
      .select($"vec_id", $"embedding",
        graft.dedup.Dedup.vecNorm($"embedding").as("nrm"))
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q"), $"nrm".as("qn"))
    val corpus = e.filter($"vec_id" >= 10 && live)
      .select($"vec_id".as("neighbor_id"), $"embedding".as("c"), $"nrm".as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    val exLive = corpus.join(broadcast(queries))
      .select($"query_id", $"neighbor_id",
        round(graft.dedup.Dedup.dot($"q", $"c") / ($"qn" * $"cn"), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5).select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def servedMean(adj: org.apache.spark.sql.DataFrame): Long = {
      val hits = Knn.graphWalkParts(spark, sf, adj, cents, 5, 4, 3, live = live)
        ._2.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val perQ = exLive.groupBy(_._1).map { case (_, s) =>
        s.count(hits.contains) * 200000L }
      hu(perQ.sum, perQ.size.toLong)
    }
    val meanChurn = servedMean(churn)
    assert(meanComp >= meanChurn,
      s"compaction LOST recall: $meanComp vs churned $meanChurn")
    // ...and must stay within the s40-convention 0.15 of a FROM-SCRATCH
    // live-only rebuild served the same way (old centroids, live entry)
    val scratchAdj = Knn.walkAdjacencyOn(spark, sf, degree, live, "s41_scratch")
    val meanScratch = servedMean(scratchAdj)
    assert((meanComp - meanScratch).abs <= 150000L,
      s"compacted recall $meanComp vs from-scratch $meanScratch — gap exceeds the pinned 0.15")
  }

  test("s42 refine audit: arithmetic holds, the r1 side reconciles with s38's d16×b4 row, round 2 really rebuilds") {
    import graft.similarity.Knn
    val rows = Knn.s42RefineAudit(spark, sf).collect()
    assert(rows.length == 10)
    val h = rows.head
    assert(h.getAs[Long]("n_edges_r1") > 0L && h.getAs[Long]("n_edges_r2") > 0L)
    assert(h.getAs[Long]("n_edges_r2") != h.getAs[Long]("n_edges_r1"),
      "round 2 left the edge count unchanged — the rebuild is vacuous")
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_r1_e6") == r.getAs[Long]("n_hits_r1") * 200000L)
      assert(r.getAs[Long]("recall_r2_e6") == r.getAs[Long]("n_hits_r2") * 200000L)
    }
    // cross-query reconcile: s42's round-1 side IS s38's (d16, b4)
    // cell — same adjacency, same entry frames, same serving shape —
    // so the two registered audits must price it identically
    def hu(n: Long, d: Long) = (2 * n + d) / (2 * d)
    val meanR1 = hu(rows.map(_.getAs[Long]("recall_r1_e6")).sum, rows.length)
    val s38row = Knn.s38DegreeSweep(spark, sf).collect()
      .map(r => (r.getAs[Long]("degree"), r.getAs[Long]("beam")) -> r).toMap
      .apply((16L, 4L))
    assert(meanR1 == s38row.getAs[Long]("mean_recall_e6"),
      s"s42 r1 mean $meanR1 disagrees with s38(d16,b4) ${s38row.getAs[Long]("mean_recall_e6")}")
    assert(h.getAs[Long]("n_edges_r1") == s38row.getAs[Long]("n_edges"),
      "s42's round-1 adjacency is not the s38 d16 artifact")
  }

  test("walkAdjacency refineRounds: the graph-quality dial builds, persists, and does not lose served recall") {
    import graft.similarity.Knn
    import org.apache.spark.sql.functions.col
    val r1 = Knn.walkAdjacency(spark, sf, 16)
    val r2 = Knn.walkAdjacency(spark, sf, 16, refineRounds = 2)
    // the second NN-descent round really changes the edge set (it
    // converges toward the true kNN graph) while keeping the directed
    // top-degree budget → symmetrized max out-degree ≤ 2·degree
    val e1 = r1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e2 = r2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e2 != e1, "refineRounds=2 left the adjacency unchanged")
    assert(r2.groupBy("src_id").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0) <= 32L)
    // served recall on the deeper-built graph must not drop (measured
    // at sf0.1: 0.74 → 0.86 at d16×b16 — build depth is the recall
    // lever once the walk converges)
    val cents = Knn.lloydCentroids(spark, sf)
    val exact = Knn.s1Brute(spark, sf, 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def served(adj: org.apache.spark.sql.DataFrame): Int = {
      val topk = Knn.graphWalkParts(spark, sf, adj, cents, 5, 16, 3)._2
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.count(topk.contains)
    }
    assert(served(r2) >= served(r1),
      "the 2-round-refined graph served WORSE than the 1-round build")
    // ships through the SAME layout as every other build — the
    // refine dial needs no new persistence surface
    val idx = java.nio.file.Files.createTempDirectory("graft-walk-r2").toString
    Knn.saveWalkIndexFrom(spark, idx, r2, cents, degree = 16)
    val saved = spark.read.parquet(s"$idx/adjacency.parquet").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(saved == e2, "persisted 2-round adjacency must equal the in-session build")
  }

  test("s35 plan: frontier equi-joins + broadcast queries only, seventh tier registered") {
    val plan = Knn.s35GraphWalk(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(8).mkString("\n"))
    val tiers = Knn.s32TierTable(spark, sf).collect().map(_.getAs[String]("tier")).toSet
    assert(tiers == Set("ivf_km", "pq", "sq8", "mrl16", "ivfpq", "bq", "graph"))
  }

  test("s28 DBSCAN invariants: roles partition, clusters are consistent, noise is isolated") {
    import graft.similarity.Knn
    val eps = 0.30
    val minPts = 3
    val rows = Knn.s28Dbscan(spark, sf, eps, minPts).collect()
    assert(rows.nonEmpty)
    // rebuild the ε-graph independently for the checks
    val edges = graft.dedup.Dedup
      .scoredCandidatePairs(spark, sf)
      .filter(org.apache.spark.sql.functions.col("cos_sim") >= eps)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val byId = rows.map(r => r.getAs[Long]("vec_id") -> r).toMap
    val core = rows.filter(_.getAs[Long]("is_core") == 1L)
      .map(_.getAs[Long]("vec_id")).toSet
    rows.foreach { r =>
      val (id, nn, isCore, role) = (r.getAs[Long]("vec_id"), r.getAs[Long]("n_neighbors"),
        r.getAs[Long]("is_core"), r.getAs[String]("role"))
      val myNbrs = nbrs.getOrElse(id, Set.empty)
      assert(nn == myNbrs.size.toLong, s"degree mismatch for $id")
      assert((isCore == 1L) == (nn >= minPts))
      val coreNbrs = myNbrs.intersect(core)
      role match {
        case "core" =>
          assert(isCore == 1L && !r.isNullAt(r.fieldIndex("cluster")))
          // cluster label is a member of the same component: it must
          // be a core id ≤ id (min-label convention)
          assert(r.getAs[Long]("cluster") <= id && core(r.getAs[Long]("cluster")))
        case "border" =>
          assert(isCore == 0L && coreNbrs.nonEmpty)
          // attached to the min label among adjacent cores
          val want = coreNbrs.map(c => byId(c).getAs[Long]("cluster")).min
          assert(r.getAs[Long]("cluster") == want, s"border $id")
        case "noise" =>
          assert(isCore == 0L && coreNbrs.isEmpty && r.isNullAt(r.fieldIndex("cluster")))
        case other => fail(s"unknown role $other")
      }
    }
    // core clusters are real components: two adjacent cores share a label
    edges.foreach { case (a, b) =>
      if (core(a) && core(b))
        assert(byId(a).getAs[Long]("cluster") == byId(b).getAs[Long]("cluster"))
    }
    // all three roles actually occur at this (eps, minPts) on sf0.001
    assert(rows.map(_.getAs[String]("role")).toSet == Set("core", "border", "noise"))
  }

  test("s30 IVF-PQ: cells, residual codes and ADC ranking match a driver-side recomputation") {
    import graft.similarity.Knn
    val cents = Knn.lloydCentroids(spark, sf)
    val books = Knn.ivfpqBooks(spark, sf)
    assert(books.length == 8 && books.forall(_._2.nonEmpty))
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6).toLong).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def sub(v: Array[Long], s: Int) = v.slice(s * 8, s * 8 + 8)
    def cellOf(v: Array[Long]): Int = cents.minBy { case (cid, c) => (d2(v, c), cid) }._1
    val centById = cents.toMap
    def resid(v: Array[Long]): Array[Long] = {
      val c = centById(cellOf(v)); v.zip(c).map { case (x, y) => x - y }
    }
    def code(rv: Array[Long], s: Int): Int =
      books(s)._2.minBy { case (cid, c) => (d2(sub(rv, s), c), cid) }._1
    val queries = q.keys.filter(_ < 10).toSeq.sorted
    val corpus = q.keys.filter(_ >= 10).toSeq.sorted
    val expected = queries.flatMap { qid =>
      val probed = cents.map { case (cid, c) => (d2(q(qid), c), cid) }.sorted.take(2).map(_._2)
      val cand = probed.flatMap { cell =>
        val qres = q(qid).zip(centById(cell)).map { case (x, y) => x - y }
        val dt = books.map { case (s, cs) =>
          s -> cs.map { case (cid, c) => cid -> d2(sub(qres, s), c) }.toMap }.toMap
        corpus.filter(nid => cellOf(q(nid)) == cell).map { nid =>
          (qid, nid, (0 until 8).map(s => dt(s)(code(resid(q(nid)), s))).sum)
        }
      }
      cand.sortBy { case (_, nid, d) => (d, nid) }.take(5)
    }.map { case (qid, nid, d) => (qid, nid) -> d }.toMap
    val got = Knn.s30IvfPqAnn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(expected.get(k).contains(r.getAs[Long]("adist_e12")), s"pair $k")
    }
    // ranks are a clean 1..n per query
    got.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length).toSeq)
    }
  }

  test("s31 IVF-PQ recall: audit arithmetic holds and both approximations actually bite") {
    val rows = graft.similarity.Knn.s31IvfPqRecall(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 5)
      assert(r.getAs[Long]("recall_e6") == hits * 200000L)
    }
    // the audit exists because the composed index is lossy: on this
    // corpus it must neither be vacuously perfect nor collapse to zero
    val total = rows.map(_.getAs[Long]("n_hits")).sum
    assert(total > 0, "IVF-PQ found nothing — index broken")
    assert(total < 50, "IVF-PQ perfect at nprobe=2/4-bit codes — audit vacuous")
  }

  test("s32 tier table: every row reconciles with its own audit; memory axis constant") {
    import graft.similarity.Knn
    val r = Knn.s32TierTable(spark, sf).collect()
      .map(x => x.getAs[String]("tier") -> x).toMap
    assert(r.keySet == Set("ivf_km", "pq", "sq8", "mrl16", "ivfpq", "bq", "graph"))
    def hu(n: Long, d: Long) = (2 * n + d) / (2 * d)
    val audits = Map(
      "ivf_km" -> Knn.s8IvfRecallAudit(spark, sf),
      "pq" -> Knn.s11PqRecall(spark, sf),
      "sq8" -> Knn.s13Sq8Recall(spark, sf),
      "mrl16" -> Knn.s14MrlRecall(spark, sf),
      "ivfpq" -> Knn.s31IvfPqRecall(spark, sf),
      "bq" -> Knn.s34BqRecall(spark, sf),
      "graph" -> Knn.s36WalkRecall(spark, sf))
    val bytes = Map("ivf_km" -> 264L, "pq" -> 4L, "sq8" -> 64L, "mrl16" -> 64L,
      "ivfpq" -> 5L, "bq" -> 8L, "graph" -> 280L)
    audits.foreach { case (tier, df) =>
      val rec = df.collect().map(_.getAs[Long]("recall_e6"))
      val row = r(tier)
      assert(row.getAs[Long]("n_queries") == rec.length, s"$tier n")
      assert(row.getAs[Long]("mean_recall_e6") == hu(rec.sum, rec.length), s"$tier mean")
      assert(row.getAs[Long]("min_recall_e6") == rec.min, s"$tier min")
      assert(row.getAs[Long]("bytes_per_vec") == bytes(tier), s"$tier bytes")
    }
  }

  test("s30 plan: ADC table broadcasts onto the posting rows, never a nested loop") {
    val plan = graft.similarity.Knn.s30IvfPqAnn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
