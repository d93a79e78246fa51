package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.BinnedRangeJoinRule

/** Pins the conf-gated optimizer rewrite of naive interval joins
  * ([[graft.plans.BinnedRangeJoinRule]]): same rows as the nested
  * loop, binned equi-join plan. */
class RangeJoinRuleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def withRule[A](binWidth: Long = 10L)(f: => A): A = {
    spark.conf.set(BinnedRangeJoinRule.EnabledKey, "true")
    spark.conf.set(BinnedRangeJoinRule.BinWidthKey, binWidth.toString)
    try f finally {
      spark.conf.set(BinnedRangeJoinRule.EnabledKey, "false")
      spark.conf.unset(BinnedRangeJoinRule.BinWidthKey)
    }
  }

  private lazy val points =
    Seq((1L, 5L), (2L, 17L), (3L, 42L), (4L, -13L), (5L, 0L)).toDF("pid", "t")
  private lazy val intervals = Seq(
    (10L, 0L, 20L),    // catches 5, 17, 0
    (20L, 40L, 60L),   // catches 42
    (30L, -20L, -5L),  // negative range: catches -13
    (40L, 50L, 30L)    // inverted: catches nothing
  ).toDF("iid", "lo", "hi")

  private def naive: DataFrame =
    points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").orderBy("pid", "iid")

  test("rewrite fires: no nested loop, binned equi-join, identical rows") {
    // pin the rule OFF for the baseline — other suites may have run e9,
    // which enables it sticky on the shared session
    spark.conf.set(BinnedRangeJoinRule.EnabledKey, "false")
    val baseline = naive.collect().toSeq // rule off: the BNLJ plan
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    withRule() {
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("__graft_bin"), plan)
      assert(naive.collect().toSeq == baseline)
      assert(baseline.map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 10L), (2L, 10L), (5L, 10L), (3L, 20L), (4L, 30L)))
    }
  }

  test("points side on the right and strict bounds both keep semantics") {
    // def, not val: a DataFrame caches its queryExecution, which would
    // freeze the rule-off plan
    def flipped = intervals.join(points, $"t" > $"lo" && $"t" < $"hi")
      .select($"pid", $"iid").orderBy("pid", "iid")
    val expected = flipped.collect().toSeq
    withRule() {
      val plan = flipped.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(flipped.collect().toSeq == expected)
      // strict: t=5 no longer matches [.., lo=0? no — 5 > 0 ok]; pin one
      // boundary case explicitly: t=0 on lo=0 must NOT match under >
      assert(!expected.map(r => (r.getLong(0), r.getLong(1))).contains((5L, 10L)))
    }
  }

  test("equi-conjunct joins are left alone (already hash-partitioned)") {
    val withKey = points.withColumn("k", $"pid" % 2)
      .join(intervals.withColumn("k", $"iid" % 2), Seq("k"))
      .filter($"t" >= $"lo" && $"t" <= $"hi")
    withRule() {
      assert(!withKey.queryExecution.executedPlan.toString.contains("__graft_bin"))
    }
  }

  test("e9 driver query: the naive BETWEEN join plans BNLJ-free through the rule") {
    try {
      val df = graft.queries.Events.e9AutoRangeJoin(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("__graft_bin"), plan)
      // and it is row-identical to e7's explicit operator pipeline
      assert(df.collect().toSeq ==
        graft.queries.Events.e7RangeJoin(spark, sf).collect().toSeq)
    } finally spark.conf.set(BinnedRangeJoinRule.EnabledKey, "false")
  }

  test("e9 scopes its conf to a cloned session; the caller session is untouched") {
    spark.conf.set(BinnedRangeJoinRule.EnabledKey, "false")
    spark.conf.unset(BinnedRangeJoinRule.BinWidthKey)
    graft.queries.Events.e9AutoRangeJoin(spark, sf).collect()
    assert(spark.conf.get(BinnedRangeJoinRule.EnabledKey) == "false")
    assert(spark.conf.getOption(BinnedRangeJoinRule.BinWidthKey).isEmpty)
  }

  test("agrees with the explicit RangeJoin operator on real event data at sf") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(unix_micros($"ts").as("t_us"), $"value")
    val windows = graft.sources.Tables.events(spark, sf)
      .select(unix_micros(date_trunc("hour", $"ts")).as("h_us")).distinct()
      .select(($"h_us" + 600000000L).as("lo_us"), ($"h_us" + 2400000000L).as("hi_us"))
    val viaOperator = graft.operators.RangeJoin
      .rangeJoin(ev, windows, "t_us", "lo_us", "hi_us", 1800000000L)
      .groupBy($"lo_us").count().orderBy("lo_us").collect().toSeq
    withRule(1800000000L) {
      val viaRule = ev.join(windows, $"t_us" >= $"lo_us" && $"t_us" <= $"hi_us")
        .groupBy($"lo_us").count().orderBy("lo_us").collect().toSeq
      assert(viaRule == viaOperator)
    }
  }

  test("an interval spanning more bins than the cap fails loudly, naming the knob") {
    // the mis-unitted-binWidth disease (seconds conf on microsecond
    // data): each interval explodes into millions of bins and dies as
    // an opaque OOM — the cap converts that into an actionable error
    withRule(binWidth = 10L) {
      spark.conf.set(BinnedRangeJoinRule.MaxBinsKey, "3")
      try {
        val wide = Seq((1L, 0L, 1000L)).toDF("iid", "lo", "hi") // 101 bins > 3
        val ex = intercept[Exception] {
          points.join(wide, $"t" >= $"lo" && $"t" <= $"hi").collect()
        }
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
        assert(messages(ex).exists(_.contains("maxBinsPerInterval")), ex.getMessage)
        // narrow intervals under the same cap still work
        assert(naive.collect().length == withRule(10L) {
          spark.conf.set(BinnedRangeJoinRule.MaxBinsKey, "1000")
          points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi").count().toInt
        })
      } finally spark.conf.unset(BinnedRangeJoinRule.MaxBinsKey)
    }
  }
}
