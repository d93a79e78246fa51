package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsofJoinRule

/** Pins the conf-gated optimizer rewrite of the naive as-of idiom
  * ([[graft.plans.AsofJoinRule]]): `row_number() = 1` over an exploded
  * history join becomes the union+window plan — same rows, no join. */
class AsofJoinRuleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.conf.set(AsofJoinRule.EnabledKey, "true")
    try f finally spark.conf.set(AsofJoinRule.EnabledKey, "false")
  }

  // quotes (right): per key, a price history with a deliberate
  // duplicate timestamp (tie broken by qid) and an unmatched key 9
  private lazy val quotes = Seq(
    (1L, 10L, 100L, 1.0), (1L, 20L, 101L, 2.0), (1L, 20L, 102L, 3.0),
    (1L, 40L, 103L, 4.0),
    (2L, 15L, 200L, 5.0),
    (9L, 5L, 900L, 9.0)
  ).toDF("qk", "qt", "qid", "price")
  // trades (left): k=1 at t=20 (boundary: ties), t=25, t=5 (no quote
  // yet), k=2 at 15 (boundary), k=3 never quoted
  private lazy val trades = Seq(
    (1L, 20L, 11L), (1L, 25L, 12L), (1L, 5L, 13L),
    (2L, 15L, 21L), (3L, 50L, 31L)
  ).toDF("tk", "tt", "tid")

  private def naive(strict: Boolean = false): DataFrame = {
    val joined =
      if (strict) trades.join(quotes, $"tk" === $"qk" && $"qt" < $"tt")
      else trades.join(quotes, $"tk" === $"qk" && $"qt" <= $"tt")
    joined
      .withColumn("rn", row_number().over(
        Window.partitionBy($"tid").orderBy($"qt".desc, $"qid".desc)))
      .filter($"rn" === 1).drop("rn")
      .select($"tid", $"tt", $"qid", $"price").orderBy("tid")
  }

  test("rewrite fires: join gone, union+window plan, identical rows") {
    spark.conf.set(AsofJoinRule.EnabledKey, "false")
    val baseline = naive().collect().toSeq
    // sanity on the fixture itself: ≤ includes the boundary, max-qid
    // wins the t=20 tie, unmatched trades (13, 31) are dropped
    assert(baseline.map(r => (r.getLong(0), r.getLong(2))) ==
      Seq((11L, 102L), (12L, 102L), (21L, 200L)))
    assert(naive().queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty, "baseline should be the exploded join")
    withRule {
      val df = naive()
      assert(df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty, "the exploded join must be gone")
      assert(df.queryExecution.executedPlan.toString.contains("__asof_carried"))
      assert(df.collect().toSeq == baseline)
    }
  }

  test("strict bound: a quote exactly at the trade time does not match") {
    spark.conf.set(AsofJoinRule.EnabledKey, "false")
    val baseline = naive(strict = true).collect().toSeq
    // t=20 trade now takes the t=10 quote; t=15 trade loses its only quote
    assert(baseline.map(r => (r.getLong(0), r.getLong(2))) ==
      Seq((11L, 100L), (12L, 102L)))
    withRule {
      val df = naive(strict = true)
      assert(df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty)
      assert(df.collect().toSeq == baseline)
    }
  }

  test("history on the LEFT join side rewrites too (orientation from the partition spec)") {
    spark.conf.set(AsofJoinRule.EnabledKey, "false")
    def flipped = quotes.join(trades, $"tk" === $"qk" && $"qt" <= $"tt")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"tid").orderBy($"qt".desc, $"qid".desc)))
      .filter($"rn" === 1).drop("rn")
      .select($"tid", $"tt", $"qid", $"price").orderBy("tid")
    val baseline = flipped.collect().toSeq
    // same matches as the probe-left spelling
    assert(baseline.map(r => (r.getLong(0), r.getLong(2))) ==
      Seq((11L, 102L), (12L, 102L), (21L, 200L)))
    withRule {
      val df = flipped
      assert(df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty, "flipped orientation must also plan join-free")
      assert(df.collect().toSeq == baseline)
    }
  }

  test("pure SQL-text spelling rewrites too (the literal naive-user-SQL claim)") {
    quotes.createOrReplaceTempView("quotes_v")
    trades.createOrReplaceTempView("trades_v")
    val sql =
      """SELECT tid, tt, qid, price FROM (
        |  SELECT t.tid, t.tt, q.qid, q.price,
        |         ROW_NUMBER() OVER (PARTITION BY t.tid
        |                            ORDER BY q.qt DESC, q.qid DESC) AS rn
        |  FROM trades_v t JOIN quotes_v q
        |    ON t.tk = q.qk AND q.qt <= t.tt)
        |WHERE rn = 1 ORDER BY tid""".stripMargin
    spark.conf.set(AsofJoinRule.EnabledKey, "false")
    val baseline = spark.sql(sql).collect().toSeq
    withRule {
      val df = spark.sql(sql)
      assert(df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty, "SQL-text spelling must plan join-free")
      assert(df.collect().toSeq == baseline)
    }
  }

  test("null history timestamps never match (inner join drops them; so must the rewrite)") {
    // k=1 has a NULL-ts quote that would sort NULLS FIRST in the union
    // window and get carried to EVERY k=1 trade if not filtered out;
    // k=4's ONLY quote is null-ts, so its trade must vanish entirely
    val nullQuotes = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, java.lang.Double)](
      (1L, null, 104L, 9.9), (1L, 10L, 100L, 1.0),
      (4L, null, 400L, 4.4)
    ).toDF("qk", "qt", "qid", "price")
    val nullTrades = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 20L, 11L), (1L, 5L, 13L), (4L, 50L, 41L),
      (1L, null, 14L) // null PROBE time matches nothing either
    ).toDF("tk", "tt", "tid")
    def q: DataFrame = nullTrades.join(nullQuotes, $"tk" === $"qk" && $"qt" <= $"tt")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"tid").orderBy($"qt".desc, $"qid".desc)))
      .filter($"rn" === 1).drop("rn")
      .select($"tid", $"qid", $"price").orderBy("tid")
    spark.conf.set(AsofJoinRule.EnabledKey, "false")
    val baseline = q.collect().toSeq
    assert(baseline.map(r => (r.getLong(0), r.getLong(1))) == Seq((11L, 100L)),
      "inner join must drop null-ts quotes and null-ts/unmatched trades")
    withRule {
      val df = q
      assert(df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty, "null-ts fixture must still rewrite join-free")
      assert(df.collect().toSeq == baseline)
    }
  }

  test("rewrite is idempotent: a second pass leaves the plan unchanged") {
    withRule {
      val once = naive().queryExecution.optimizedPlan
      assert(AsofJoinRule(once).canonicalized == once.canonicalized)
    }
  }

  test("non-matching shapes are left alone") {
    def joins(df: DataFrame) = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    withRule {
      // extra CROSS-SIDE residual conjunct: the latest-pick could not
      // honor it (a single-side predicate would just be pushed below
      // the join by the optimizer, where the rewrite remains valid)
      val residual = trades.join(quotes,
          $"tk" === $"qk" && $"qt" <= $"tt" && $"price" * 10 > $"tt")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"tid").orderBy($"qt".desc)))
        .filter($"rn" === 1)
      assert(joins(residual).nonEmpty)
      // ascending order wants the EARLIEST row — not this rewrite
      val asc = trades.join(quotes, $"tk" === $"qk" && $"qt" <= $"tt")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"tid").orderBy($"qt".asc)))
        .filter($"rn" === 1)
      assert(joins(asc).nonEmpty)
      // partition keyed by a RIGHT column: groups span right rows
      val rightPart = trades.join(quotes, $"tk" === $"qk" && $"qt" <= $"tt")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"qid").orderBy($"qt".desc)))
        .filter($"rn" === 1)
      assert(joins(rightPart).nonEmpty)
      // no equi key at all (pure inequality): not an as-of join
      val noKey = trades.join(quotes, $"qt" <= $"tt")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"tid").orderBy($"qt".desc)))
        .filter($"rn" === 1)
      assert(joins(noKey).nonEmpty)
    }
  }

  test("matches AsOf.asofJoin and the e6 oracle shape on real events data") {
    // e6's workload spelled the naive way: every purchase joined to
    // the user's whole click history, winnowed by row_number — the
    // rule must produce exactly Events.e6AsofJoin's rows (which the
    // driver hash-checks against DuckDB's native ASOF JOIN)
    val expected = graft.queries.Events.e6AsofJoin(spark, sf).collect().toSeq
    withRule {
      val ev = graft.sources.Tables.events(spark, sf)
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id".as("c_user"), $"ts".as("click_ts"))
        .agg(max($"event_id").as("click_id"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id")
      val df = purchases.join(clicks,
          $"user_id" === $"c_user" && $"click_ts" <= $"ts")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"event_id").orderBy($"click_ts".desc, $"click_id".desc)))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id".as("purchase_id"),
          unix_micros($"ts").as("purchase_ts_us"),
          $"click_id".as("asof_click_id"),
          unix_micros($"click_ts").as("click_ts_us"))
        .orderBy("user_id", "purchase_id")
      assert(df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.isEmpty, "the naive spelling must plan join-free")
      // e6 is a LEFT as-of (keeps clickless purchases); the naive
      // inner idiom drops them — compare on the matched subset
      val matched = expected.filter(!_.isNullAt(3))
      assert(df.collect().toSeq == matched)
    }
  }
}
