package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Tpch

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each `queries` entry is one operator/capability; `oracleSql` holds
  * the DuckDB-equivalent SQL the driver uses for the correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> (Tpch.q1 _),
    "q3_shipping_priority" -> (Tpch.q3 _),
    "q4_order_priority"    -> (Tpch.q4 _),
    "q5_local_supplier"    -> (Tpch.q5 _),
    "q6_forecast_revenue"  -> (Tpch.q6 _),
    "q18_large_orders"     -> (Tpch.q18 _),
    "w1_topk_per_group"    -> (Tpch.w1TopkPerGroup _),
    "w2_running_total"     -> (Tpch.w2RunningTotal _),
  )

  /** DuckDB oracle SQL per query (same parquet tables, bare names). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> Tpch.q1Sql,
    "q3_shipping_priority" -> Tpch.q3Sql,
    "q4_order_priority"    -> Tpch.q4Sql,
    "q5_local_supplier"    -> Tpch.q5Sql,
    "q6_forecast_revenue"  -> Tpch.q6Sql,
    "q18_large_orders"     -> Tpch.q18Sql,
    "w1_topk_per_group"    -> Tpch.w1Sql,
    "w2_running_total"     -> Tpch.w2Sql,
  )
}
