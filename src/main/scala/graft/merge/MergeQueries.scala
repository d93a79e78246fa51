package graft.merge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver-facing wrappers for the A-block merge operators (SURVEY §2).
  *
  * beehive merges two live OpenMRS instances; the testdata is one star
  * schema, so the two instances are simulated deterministically:
  * `src` = customers with c_custkey % 3 ≠ 0, `dest` = c_custkey % 2 = 0.
  * The overlap (keys ≡ 2,4 mod 6) plays the role of records present in
  * both instances — exactly the condition beehive's consolidation,
  * uuid-collision, and exclusion logic exists to handle.
  * `uuid` is simulated as md5(c_name) so it is identical across
  * instances for overlapping rows, like real OpenMRS uuids.
  */
object MergeQueries {

  private def cust(spark: SparkSession, dir: String) = Tables.read(spark, dir, "customer")
  private def srcCust(spark: SparkSession, dir: String) =
    cust(spark, dir).filter(col("c_custkey") % 3 =!= 0)
  private def destCust(spark: SparkSession, dir: String) =
    cust(spark, dir).filter(col("c_custkey") % 2 === 0)

  /** m1: metadata dedup-merge by natural key → id map. */
  def m1Consolidate(spark: SparkSession, dir: String): DataFrame =
    MergeOps.consolidate(srcCust(spark, dir), destCust(spark, dir), Seq("c_name"), "c_custkey")

  val m1Sql: String =
    """WITH srcc AS (SELECT * FROM customer WHERE c_custkey % 3 <> 0),
      |destc AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
      |destk AS (SELECT c_name, min(c_custkey) AS dest_id FROM destc GROUP BY c_name),
      |mx AS (SELECT coalesce(max(c_custkey), 0) AS m FROM destc)
      |SELECT s.c_custkey AS src_id, k.dest_id AS dest_id, 0 AS is_new
      |FROM srcc s JOIN destk k ON s.c_name = k.c_name
      |UNION ALL
      |SELECT s.c_custkey, (SELECT m FROM mx) + row_number() OVER (ORDER BY s.c_custkey), 1
      |FROM srcc s WHERE NOT EXISTS (SELECT 1 FROM destk k WHERE k.c_name = s.c_name)
      |ORDER BY src_id""".stripMargin

  /** m2: FK rewrite of src-instance orders through the m1 id map. */
  def m2RemapFk(spark: SparkSession, dir: String): DataFrame = {
    val idMap = MergeOps.consolidate(srcCust(spark, dir), destCust(spark, dir), Seq("c_name"), "c_custkey")
    val srcOrders = Tables.read(spark, dir, "orders").filter(col("o_custkey") % 3 =!= 0)
    MergeOps.remapFk(srcOrders, "o_custkey", idMap, "new_custkey")
      .select(col("o_orderkey"), col("o_custkey").as("old_custkey"), col("new_custkey"))
  }

  val m2Sql: String =
    """WITH srcc AS (SELECT * FROM customer WHERE c_custkey % 3 <> 0),
      |destc AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
      |destk AS (SELECT c_name, min(c_custkey) AS dest_id FROM destc GROUP BY c_name),
      |mx AS (SELECT coalesce(max(c_custkey), 0) AS m FROM destc),
      |idmap AS (
      |  SELECT s.c_custkey AS src_id, k.dest_id FROM srcc s JOIN destk k ON s.c_name = k.c_name
      |  UNION ALL
      |  SELECT s.c_custkey, (SELECT m FROM mx) + row_number() OVER (ORDER BY s.c_custkey)
      |  FROM srcc s WHERE NOT EXISTS (SELECT 1 FROM destk k WHERE k.c_name = s.c_name))
      |SELECT o.o_orderkey, o.o_custkey AS old_custkey, i.dest_id AS new_custkey
      |FROM orders o JOIN idmap i ON o.o_custkey = i.src_id
      |WHERE o.o_custkey % 3 <> 0
      |ORDER BY o.o_orderkey""".stripMargin

  /** m3: uuid-collision repair — deterministic replacement uuids. */
  def m3UuidCollision(spark: SparkSession, dir: String): DataFrame = {
    val s = srcCust(spark, dir).withColumn("uuid", md5(col("c_name")))
    val d = destCust(spark, dir).withColumn("uuid", md5(col("c_name")))
    MergeOps.uuidCollisions(s, d, "c_custkey", "uuid")
  }

  val m3Sql: String =
    """WITH srcc AS (SELECT c_custkey, md5(c_name) AS uuid FROM customer WHERE c_custkey % 3 <> 0),
      |destc AS (SELECT md5(c_name) AS uuid FROM customer WHERE c_custkey % 2 = 0),
      |coll AS (SELECT s.c_custkey, s.uuid FROM srcc s
      |         WHERE EXISTS (SELECT 1 FROM destc d WHERE d.uuid = s.uuid)),
      |remap AS (SELECT c_custkey, uuid, md5('graft-remap:' || uuid) AS h FROM coll)
      |SELECT c_custkey AS src_id, uuid AS old_uuid,
      |  concat_ws('-', substring(h,1,8), substring(h,9,4), substring(h,13,4),
      |            substring(h,17,4), substring(h,21,12)) AS new_uuid
      |FROM remap ORDER BY src_id""".stripMargin

  /** m4: referential-integrity orphan scan across the schema's FK
    * relations, plus one deliberately-narrowed relation (orders →
    * dest-instance customers) that yields real orphans. */
  def m4OrphanCheck(spark: SparkSession, dir: String): DataFrame = {
    val customer = cust(spark, dir)
    val orders = Tables.read(spark, dir, "orders")
    val li = Tables.read(spark, dir, "lineitem")
    val nation = Tables.read(spark, dir, "nation")
    val region = Tables.read(spark, dir, "region")
    val supplier = Tables.read(spark, dir, "supplier")
    val part = Tables.read(spark, dir, "part")
    MergeOps.orphanCheck(Seq(
      ("customer->nation", customer, "c_nationkey", nation, "n_nationkey"),
      ("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
      ("lineitem->part", li, "l_partkey", part, "p_partkey"),
      ("lineitem->supplier", li, "l_suppkey", supplier, "s_suppkey"),
      ("nation->region", nation, "n_regionkey", region, "r_regionkey"),
      ("orders->customer", orders, "o_custkey", customer, "c_custkey"),
      ("orders->customer_dest", orders, "o_custkey", destCust(spark, dir), "c_custkey"),
      ("supplier->nation", supplier, "s_nationkey", nation, "n_nationkey")
    )).orderBy("relation")
  }

  val m4Sql: String =
    """SELECT 'customer->nation' AS relation, count(*) AS orphan_count FROM customer WHERE c_nationkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
      |UNION ALL SELECT 'lineitem->orders', count(*) FROM lineitem WHERE l_orderkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |UNION ALL SELECT 'lineitem->part', count(*) FROM lineitem WHERE l_partkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
      |UNION ALL SELECT 'lineitem->supplier', count(*) FROM lineitem WHERE l_suppkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
      |UNION ALL SELECT 'nation->region', count(*) FROM nation WHERE n_regionkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey)
      |UNION ALL SELECT 'orders->customer', count(*) FROM orders WHERE o_custkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |UNION ALL SELECT 'orders->customer_dest', count(*) FROM orders WHERE o_custkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_custkey % 2 = 0)
      |UNION ALL SELECT 'supplier->nation', count(*) FROM supplier WHERE s_nationkey IS NOT NULL AND NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = s_nationkey)
      |ORDER BY relation""".stripMargin

  /** m5: "already moved" exclusion — composite natural key OR uuid,
    * driven from the same declarative `TableSpec` the N-table
    * orchestrator consumes (preparation.js reads these rules from
    * config, not code). */
  def m5ExcludeMoved(spark: SparkSession, dir: String): DataFrame = {
    val s = srcCust(spark, dir).withColumn("uuid", md5(col("c_name")))
    val d = destCust(spark, dir).withColumn("uuid", md5(col("c_name")))
    val spec = Orchestrator.TableSpec("customer", "c_custkey",
      Seq("c_nationkey", "c_mktsegment"), Orchestrator.MergeMode.Move,
      uuidCol = Some("uuid"))
    Orchestrator.excludedIds(s, d, spec)
      .withColumnRenamed("c_custkey", "excluded_id")
  }

  val m5Sql: String =
    """WITH srcc AS (SELECT *, md5(c_name) AS uuid FROM customer WHERE c_custkey % 3 <> 0),
      |destc AS (SELECT *, md5(c_name) AS uuid FROM customer WHERE c_custkey % 2 = 0)
      |SELECT DISTINCT s.c_custkey AS excluded_id FROM srcc s
      |WHERE EXISTS (SELECT 1 FROM destc d
      |              WHERE d.c_nationkey = s.c_nationkey AND d.c_mktsegment = s.c_mktsegment)
      |   OR EXISTS (SELECT 1 FROM destc d WHERE d.uuid = s.uuid)
      |ORDER BY excluded_id""".stripMargin

  /** m6: per-table audit counts. */
  def m6AuditCounts(spark: SparkSession, dir: String): DataFrame =
    MergeOps.auditCounts(Tables.names.map(n => n -> Tables.read(spark, dir, n)))
      .orderBy("table_name")

  val m6Sql: String = Tables.names.sorted
    .map(n => s"SELECT '$n' AS table_name, count(*) AS n_rows FROM $n")
    .mkString("", "\nUNION ALL ", "\nORDER BY table_name")

  /** m8: keep-latest upsert per (user_id, event_type). */
  def m8UpsertLatest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    MergeOps.upsertLatest(ev, Seq("user_id", "event_type"), "ts", "event_id")
      .select(col("user_id"), col("event_type"), col("event_id").as("latest_event_id"),
        unix_micros(col("ts")).as("ts_us"), round(col("value"), 4).as("value"))
  }

  val m8Sql: String =
    """SELECT user_id, event_type, event_id AS latest_event_id,
      |  epoch_us(ts) AS ts_us, round(value, 4) AS value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** m9: contiguous id assignment (AUTO_INCREMENT semantics). */
  def m9SeqAssign(spark: SparkSession, dir: String): DataFrame =
    MergeOps.assignSequentialIds(
      cust(spark, dir).select(col("c_custkey")), "c_custkey", "new_id", 1000000L)

  val m9Sql: String =
    """SELECT c_custkey, 1000000 + row_number() OVER (ORDER BY c_custkey) AS new_id
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** m11: two-phase self-referential FK handling (reference
    * person-users.js:307 — users.changed_by / obs.obs_group_id /
    * location.parent_location): phase 1 consolidates the entity and
    * yields the id map; phase 2 rewrites the SELF-referencing column
    * through that same, now-complete map. The self-FK is synthesized
    * deterministically (previous src custkey within the nation — the
    * lag window mirrors parent-pointer chains). */
  def m11SelfRefRemap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
    val src = srcCust(spark, dir)
      .withColumn("referred_by", lag(col("c_custkey"), 1).over(w))
    val idMap = MergeOps.consolidate(srcCust(spark, dir), destCust(spark, dir), Seq("c_name"), "c_custkey")
    // phase 1: primary key through the map (left: preserve-all view)
    val phase1 = MergeOps.remapFk(src, "c_custkey", idMap, "new_id", joinType = "left")
    // phase 2: self-FK through the SAME map — LEFT join is the
    // semantics here: a null/unmapped self-reference means "no parent"
    // and the row must survive with a null new_referred_by
    MergeOps.remapFk(phase1, "referred_by", idMap, "new_referred_by", joinType = "left")
      .select(col("c_custkey").as("src_id"), col("new_id"),
        col("referred_by"), col("new_referred_by"))
  }

  val m11Sql: String =
    """WITH srcc AS (SELECT * FROM customer WHERE c_custkey % 3 <> 0),
      |destc AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
      |destk AS (SELECT c_name, min(c_custkey) AS dest_id FROM destc GROUP BY c_name),
      |mx AS (SELECT coalesce(max(c_custkey), 0) AS m FROM destc),
      |idmap AS (
      |  SELECT s.c_custkey AS src_id, k.dest_id FROM srcc s JOIN destk k ON s.c_name = k.c_name
      |  UNION ALL
      |  SELECT s.c_custkey, (SELECT m FROM mx) + row_number() OVER (ORDER BY s.c_custkey)
      |  FROM srcc s WHERE NOT EXISTS (SELECT 1 FROM destk k WHERE k.c_name = s.c_name)),
      |withref AS (
      |  SELECT c_custkey, lag(c_custkey) OVER (
      |    PARTITION BY c_nationkey ORDER BY c_custkey) AS referred_by
      |  FROM srcc)
      |SELECT w.c_custkey AS src_id, i1.dest_id AS new_id,
      |  w.referred_by, i2.dest_id AS new_referred_by
      |FROM withref w
      |LEFT JOIN idmap i1 ON w.c_custkey = i1.src_id
      |LEFT JOIN idmap i2 ON w.referred_by = i2.src_id
      |ORDER BY src_id""".stripMargin

  /** m12: consolidation through a MAPPED comparison column (reference
    * utils.js:74-103). Simulation: the destination instance numbers
    * nations +100, so matching src customers by (c_name, nationkey)
    * only works after the nation id map rewrites src's c_nationkey —
    * exactly the `mapped`/`mappedValueMap` behavior. */
  def m12ConsolidateMapped(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.read(spark, dir, "nation")
    val nationMap = nation.select(
      col("n_nationkey").cast("long").as("src_id"),
      (col("n_nationkey") + 100).cast("long").as("dest_id"))
    val dest = destCust(spark, dir)
      .withColumn("c_nationkey", col("c_nationkey") + 100)
    MergeOps.consolidateMapped(srcCust(spark, dir), dest,
        Seq("c_name"), "c_nationkey", nationMap, "c_custkey")
  }

  val m12Sql: String =
    """WITH srcc AS (
      |  SELECT c_custkey, c_name, c_nationkey + 100 AS c_nationkey
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |destc AS (
      |  SELECT c_custkey, c_name, c_nationkey + 100 AS c_nationkey
      |  FROM customer WHERE c_custkey % 2 = 0),
      |destk AS (SELECT c_name, c_nationkey, min(c_custkey) AS dest_id
      |          FROM destc GROUP BY c_name, c_nationkey),
      |mx AS (SELECT coalesce(max(c_custkey), 0) AS m FROM destc)
      |SELECT s.c_custkey AS src_id, k.dest_id, 0 AS is_new
      |FROM srcc s JOIN destk k ON s.c_name = k.c_name AND s.c_nationkey = k.c_nationkey
      |UNION ALL
      |SELECT s.c_custkey, (SELECT m FROM mx) + row_number() OVER (ORDER BY s.c_custkey), 1
      |FROM srcc s WHERE NOT EXISTS (
      |  SELECT 1 FROM destk k WHERE k.c_name = s.c_name AND k.c_nationkey = s.c_nationkey)
      |ORDER BY src_id""".stripMargin

  /** m10: set-union merge of association pairs (INSERT IGNORE). */
  def m10SetUnion(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.read(spark, dir, "orders")
    val a = orders.filter(col("o_custkey") % 3 =!= 0).select("o_custkey", "o_orderpriority")
    val b = orders.filter(col("o_custkey") % 2 === 0).select("o_custkey", "o_orderpriority")
    MergeOps.setUnionMerge(a, b)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_pairs"))
      .orderBy("o_orderpriority")
  }

  val m10Sql: String =
    """SELECT o_orderpriority, count(*) AS n_pairs FROM (
      |  SELECT DISTINCT o_custkey, o_orderpriority FROM (
      |    SELECT o_custkey, o_orderpriority FROM orders WHERE o_custkey % 3 <> 0
      |    UNION ALL
      |    SELECT o_custkey, o_orderpriority FROM orders WHERE o_custkey % 2 = 0) u) p
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** m17: SEQUENTIAL multi-source merge — the reference's actual
    * deployment mode (one clinic instance after another into the same
    * destination; `_merge_sources` registry, preparation.js:53): srcA
    * consolidates into dest, then srcB consolidates into the UPDATED
    * destination — srcB rows matching names srcA just added map to
    * srcA's newly-assigned ids, and srcB's fresh ids continue PAST
    * srcA's (id continuity across merges, the AUTO_INCREMENT
    * contract over time).
    *
    * Instances: dest = %2=0, srcA = %3≠0, srcB = %5≠0 (overlaps
    * both). Between stages the merged destination is dest ∪ (srcA's
    * new rows under their new ids) — in production that's the
    * published table of stage 1 (MergeMain's persist), here one
    * union. Output = both id maps tagged by source. */
  def m17MultiSource(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer").select(col("c_custkey"), col("c_name"))
    val dest0 = cust.filter(col("c_custkey") % 2 === 0)
    val srcA = cust.filter(col("c_custkey") % 3 =!= 0)
    val srcB = cust.filter(col("c_custkey") % 5 =!= 0)
    val mapA = MergeOps.consolidate(srcA, dest0, Seq("c_name"), "c_custkey")
    val newA = mapA.filter(col("is_new") === 1)
      .join(srcA, mapA("src_id") === srcA("c_custkey"))
      .select(col("dest_id").as("c_custkey"), col("c_name"))
    val destA = dest0.unionAll(newA)
    val mapB = MergeOps.consolidate(srcB, destA, Seq("c_name"), "c_custkey")
    mapA.withColumn("merge_source", lit("srcA"))
      .unionAll(mapB.withColumn("merge_source", lit("srcB")))
      .select(col("merge_source"), col("src_id"), col("dest_id"), col("is_new"))
  }

  val m17Sql: String =
    """WITH srca AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 <> 0),
      |srcb AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 5 <> 0),
      |dest0 AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0),
      |d0k AS (SELECT c_name, min(c_custkey) AS dest_id FROM dest0 GROUP BY c_name),
      |mx0 AS (SELECT coalesce(max(c_custkey), 0) AS m FROM dest0),
      |mapa AS (
      |  SELECT s.c_custkey AS src_id, k.dest_id, 0 AS is_new
      |  FROM srca s JOIN d0k k ON s.c_name = k.c_name
      |  UNION ALL
      |  SELECT s.c_custkey, (SELECT m FROM mx0) + row_number() OVER (ORDER BY s.c_custkey), 1
      |  FROM srca s WHERE NOT EXISTS (SELECT 1 FROM d0k k WHERE k.c_name = s.c_name)),
      |desta AS (
      |  SELECT c_custkey, c_name FROM dest0
      |  UNION ALL
      |  SELECT m.dest_id, s.c_name FROM mapa m
      |  JOIN srca s ON m.src_id = s.c_custkey AND m.is_new = 1),
      |dak AS (SELECT c_name, min(c_custkey) AS dest_id FROM desta GROUP BY c_name),
      |mxa AS (SELECT coalesce(max(c_custkey), 0) AS m FROM desta),
      |mapb AS (
      |  SELECT s.c_custkey AS src_id, k.dest_id, 0 AS is_new
      |  FROM srcb s JOIN dak k ON s.c_name = k.c_name
      |  UNION ALL
      |  SELECT s.c_custkey, (SELECT m FROM mxa) + row_number() OVER (ORDER BY s.c_custkey), 1
      |  FROM srcb s WHERE NOT EXISTS (SELECT 1 FROM dak k WHERE k.c_name = s.c_name))
      |SELECT 'srcA' AS merge_source, src_id, dest_id, is_new FROM mapa
      |UNION ALL
      |SELECT 'srcB', src_id, dest_id, is_new FROM mapb
      |ORDER BY merge_source, src_id""".stripMargin

  /** m18: SCD2 (type-2 slowly-changing-dimension) history build — the
    * warehouse dual of m8's keep-latest upsert: instead of collapsing
    * versions to the newest row, EVERY version becomes an interval
    * row [valid_from, valid_to) with a version number and a current
    * flag — the standard shape for as-of joins against dimension
    * history (e6 then probes it by time). The reference keeps only
    * latest state (beehive upserts audit columns, person-users.js:307);
    * SCD2 is what a warehouse builds from the same versioned feed
    * when history must stay queryable.
    *
    * Shape: one shuffle on the entity key; lead + row_number ride the
    * SAME window spec, so Spark plans a single Window operator over
    * one sort — no per-version self-join (the naive SCD2 build), no
    * second exchange. Deterministic tie-break (date, then key). */
  def m18Scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    def fmt(c: org.apache.spark.sql.Column) =
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    Tables.read(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_ts", lead($"o_orderdate", 1).over(w))
      .select($"o_custkey", $"o_orderkey", $"version",
        fmt($"o_orderdate").as("valid_from"),
        fmt($"valid_to_ts").as("valid_to"),
        $"valid_to_ts".isNull.cast("int").as("is_current"))
  }

  val m18Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(row_number() OVER w AS BIGINT) AS version,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
      |  CAST(CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, version""".stripMargin

  /** m19: incremental (delta/CDC) merge — the scale path the
    * reference's full re-merge lacks: only rows changed since the
    * last merge watermark re-enter the pipeline, classified into the
    * production action set against the already-merged destination:
    * `insert` (natural key unseen), `update` (key matched but the
    * compared column drifted), `noop` (key matched, nothing changed).
    * At 100 TB a nightly OpenMRS-style sync re-merges a per-mille
    * delta, not the corpus — work here is ∝ |delta| through exactly
    * the m1 consolidation machinery (delta-scoped id allocation), and
    * the destination contributes only its natural-key index and the
    * compared columns, the frames a production dest keeps indexed
    * anyway.
    *
    * Delta stand-in: `c_custkey % 5 < 2` (the `date_changed > T`
    * slice, the m-block synthesis convention); dest drift: every 7th
    * row's mktsegment differs, so all three action classes are
    * non-empty on real data. */
  def m19DeltaMerge(spark: SparkSession, dir: String): DataFrame = {
    val delta = srcCust(spark, dir).filter(col("c_custkey") % 5 < 2)
    val dest = destCust(spark, dir).withColumn("c_mktsegment",
      when(col("c_custkey") % 7 === 0, lit("MOVED"))
        .otherwise(col("c_mktsegment")))
    val idMap = MergeOps.consolidate(delta, dest, Seq("c_name"), "c_custkey")
    val destSeg = dest.select(col("c_custkey").as("dest_id"),
      col("c_mktsegment").as("dest_segment"))
    delta.select(col("c_custkey").as("src_id"), col("c_mktsegment"))
      .join(idMap, "src_id")
      .join(destSeg, Seq("dest_id"), "left")
      .select(col("src_id"), col("dest_id"),
        when(col("is_new") === 1, "insert")
          .when(col("c_mktsegment") =!= col("dest_segment"), "update")
          .otherwise("noop").as("action"))
  }

  /** m19 oracle: m2's idmap chain scoped to the delta slice, plus the
    * drift comparison. */
  val m19Sql: String =
    """WITH srcc AS (
      |  SELECT * FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey % 5 < 2),
      |destc AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey % 2 = 0),
      |destk AS (SELECT c_name, min(c_custkey) AS dest_id FROM destc GROUP BY c_name),
      |mx AS (SELECT coalesce(max(c_custkey), 0) AS m FROM destc),
      |idmap AS (
      |  SELECT s.c_custkey AS src_id, k.dest_id, 0 AS is_new
      |  FROM srcc s JOIN destk k ON s.c_name = k.c_name
      |  UNION ALL
      |  SELECT s.c_custkey, (SELECT m FROM mx) + row_number() OVER (ORDER BY s.c_custkey), 1
      |  FROM srcc s WHERE NOT EXISTS (SELECT 1 FROM destk k WHERE k.c_name = s.c_name))
      |SELECT i.src_id, i.dest_id,
      |  CASE WHEN i.is_new = 1 THEN 'insert'
      |       WHEN s.c_mktsegment <> d.c_mktsegment THEN 'update'
      |       ELSE 'noop' END AS action
      |FROM idmap i
      |JOIN srcc s ON s.c_custkey = i.src_id
      |LEFT JOIN destc d ON d.c_custkey = i.dest_id
      |ORDER BY src_id""".stripMargin

  /** m20: SCHEMA-DRIFT consolidation — the reconciliation a real
    * multi-instance merge hits first: instances run different schema
    * VERSIONS of the same table (beehive assumes identical OpenMRS
    * schemas on both sides; fleet reality is a staggered rollout).
    * Simulated drift: the source runs v2 (has `c_mktsegment`, never
    * had `c_acctbal`), the destination runs v1 (the reverse). The
    * reconciled table is the union column set: rows present in BOTH
    * instances merge column-wise (each side fills the column the
    * other lacks), single-side rows carry nulls for the columns
    * their schema version lacks, and every row is tagged with its
    * origin + missing-column count — the audit the migration team
    * reads before backfilling.
    *
    * Scale shape: ONE co-partitioned full-outer hash join on the
    * primary key — the minimal possible plan for column-wise
    * reconciliation; everything else is a codegen'd projection. No
    * unionByName-then-dedup double scan of the overlap. */
  def m20SchemaDrift(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.read(spark, dir, "customer")
    val src = c.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    val dest = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
    src.as("s").join(dest.as("d"),
        col("s.c_custkey") === col("d.c_custkey"), "full_outer")
      .select(
        coalesce(col("d.c_custkey"), col("s.c_custkey")).as("c_custkey"),
        coalesce(col("d.c_name"), col("s.c_name")).as("c_name"),
        coalesce(col("d.c_nationkey"), col("s.c_nationkey")).as("c_nationkey"),
        col("d.c_acctbal").as("c_acctbal"),
        col("s.c_mktsegment").as("c_mktsegment"),
        when(col("s.c_custkey").isNotNull && col("d.c_custkey").isNotNull, "both")
          .when(col("s.c_custkey").isNotNull, "src_only")
          .otherwise("dest_only").as("origin"),
        (col("d.c_acctbal").isNull.cast("long") +
          col("s.c_mktsegment").isNull.cast("long")).as("n_missing"))
  }

  /** m20 oracle: the same versioned projections and full-outer
    * column-wise coalesce. */
  val m20Sql: String =
    """WITH s AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |d AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal
      |  FROM customer WHERE c_custkey % 2 = 0)
      |SELECT coalesce(d.c_custkey, s.c_custkey) AS c_custkey,
      |  coalesce(d.c_name, s.c_name) AS c_name,
      |  coalesce(d.c_nationkey, s.c_nationkey) AS c_nationkey,
      |  d.c_acctbal AS c_acctbal,
      |  s.c_mktsegment AS c_mktsegment,
      |  CASE WHEN s.c_custkey IS NOT NULL AND d.c_custkey IS NOT NULL THEN 'both'
      |       WHEN s.c_custkey IS NOT NULL THEN 'src_only'
      |       ELSE 'dest_only' END AS origin,
      |  CAST((CASE WHEN d.c_acctbal IS NULL THEN 1 ELSE 0 END)
      |     + (CASE WHEN s.c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      |FROM s FULL OUTER JOIN d ON s.c_custkey = d.c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** m21: K-ANONYMITY / l-diversity audit — the privacy gate a merged
    * registry must pass before anyone exports it (beehive's domain is
    * OpenMRS MEDICAL records; a merge that consolidates instances
    * also concentrates re-identification risk — Sweeney's k-anonymity
    * and the Machanavajjhala l-diversity refinement are the standard
    * release criteria). Quasi-identifier = (nation, market segment);
    * sensitive attribute = the account-balance band. Every
    * equivalence class gets its size (k), its count of distinct
    * sensitive values (l), and the two risk flags: k < 5 (linkage
    * attack: the class is small enough to single someone out) and
    * l < 2 (homogeneity attack: the class is unique-size-proof but
    * everyone in it shares the sensitive value anyway).
    *
    * Scale shape: two-level aggregation — (QI, sens) partials
    * map-side combine, then one re-agg to the ≤|QI-space| class
    * frame; the distinct-count never goes through a count-DISTINCT
    * Expand (the d12 convention). One shuffle, output bounded by the
    * QI domain, not the table. */
  def m21KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.read(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("sens"))
    c.groupBy(col("c_nationkey"), col("c_mktsegment"), col("sens"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("l_diversity"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_rows"),
        col("l_diversity"),
        (col("n_rows") < 5).as("risky_k"), (col("l_diversity") < 2).as("risky_l"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** m21 oracle: the same two-level aggregation (floor on a double
    * division is correctly-rounded IEEE in both engines). */
  val m21Sql: String =
    """WITH s AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sens
      |  FROM customer),
      |g AS (
      |  SELECT c_nationkey, c_mktsegment, sens, count(*) AS n
      |  FROM s GROUP BY 1, 2, 3)
      |SELECT c_nationkey, c_mktsegment,
      |  CAST(sum(n) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS l_diversity,
      |  (sum(n) < 5) AS risky_k, (count(*) < 2) AS risky_l
      |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** m22: merge CONFLICT report — natural-key matches whose NON-key
    * attributes disagree between the instances. The reference's
    * consolidation silently keeps the destination row
    * (utils.js:83 — src rows with a key match simply map to the dest
    * id); this emits what that policy hides: the review queue a data
    * steward works through after a merge (which rows disagreed, on
    * what fields, and what the precedence policy resolved to). The
    * simulated drift mirrors m20's idiom: the destination carries a
    * stale whole-unit ledger copy (`floor(c_acctbal)`), so matched
    * pairs with a fractional source balance conflict.
    *
    * Shape: the dest side collapses to one row per natural key
    * (min_by on the id — m1's deterministic min-id survivor), then
    * ONE equi-join on the key and a codegen'd field-compare
    * projection; conflicts only (the steward's queue, not the full
    * match set). Resolution policy here: higher-precision-wins
    * (source), recorded per row — a policy column, not a silent
    * overwrite. */
  def m22ConflictReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = srcCust(spark, dir)
      .select(col("c_custkey").as("src_id"), col("c_name"),
        col("c_acctbal").as("src_acctbal"), col("c_nationkey").as("src_nation"))
    val dest = destCust(spark, dir)
      .select(col("c_custkey"), col("c_name"),
        floor(col("c_acctbal")).as("d_acctbal"), col("c_nationkey").as("d_nation"))
      .groupBy(col("c_name"))
      .agg(min(col("c_custkey")).as("dest_id"),
        min_by(col("d_acctbal"), col("c_custkey")).as("dest_acctbal"),
        min_by(col("d_nation"), col("c_custkey")).as("dest_nation"))
    src.join(dest, Seq("c_name"))
      .withColumn("acctbal_conflict", col("src_acctbal") =!= col("dest_acctbal"))
      .withColumn("nation_conflict", col("src_nation") =!= col("dest_nation"))
      .filter(col("acctbal_conflict") || col("nation_conflict"))
      .select(col("c_name"), col("src_id"), col("dest_id"),
        col("src_acctbal"), col("dest_acctbal").cast("double").as("dest_acctbal"),
        col("acctbal_conflict"), col("nation_conflict"),
        col("src_acctbal").as("resolved_acctbal"))
  }

  /** m22 oracle: the same min-id survivor per name and field compare. */
  val m22Sql: String =
    """WITH srcc AS (
      |  SELECT c_custkey AS src_id, c_name, c_acctbal AS src_acctbal,
      |         c_nationkey AS src_nation
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |destc AS (
      |  SELECT c_name, min(c_custkey) AS dest_id,
      |    min_by(floor(c_acctbal), c_custkey) AS dest_acctbal,
      |    min_by(c_nationkey, c_custkey) AS dest_nation
      |  FROM customer WHERE c_custkey % 2 = 0 GROUP BY c_name)
      |SELECT s.c_name, s.src_id, d.dest_id, s.src_acctbal,
      |  CAST(d.dest_acctbal AS DOUBLE) AS dest_acctbal,
      |  (s.src_acctbal <> d.dest_acctbal) AS acctbal_conflict,
      |  (s.src_nation <> d.dest_nation) AS nation_conflict,
      |  s.src_acctbal AS resolved_acctbal
      |FROM srcc s JOIN destc d USING (c_name)
      |WHERE s.src_acctbal <> d.dest_acctbal OR s.src_nation <> d.dest_nation
      |ORDER BY s.src_id""".stripMargin

  /** m24: ID-SPACE DENSITY AUDIT — per fixed-size id block of the
    * orders table, how many ids are actually present and how many of
    * the block's slots are missing (interior gaps = deleted rows,
    * failed inserts, or a migration that skipped ranges). The
    * id-hygiene companion to m9's sequential allocation and the
    * reference's max(id)-based seeding (beehive allocates past
    * max(id) — a gappy id space silently wastes the range this audit
    * quantifies; a DENSE map also tells m9's planner the next block
    * is safe). Only blocks the table touches appear; the final
    * (partial) block reports missing slots up to the observed max id,
    * not the block edge, and the FIRST block symmetrically starts at
    * the observed min id — no phantom gaps past either end of the
    * table's actual keyspace (ids below the first key are not deletes).
    *
    * Scale shape: ONE map-side-combined aggregation to ≤ max_id/block
    * rows — never a sort, never a window over fact rows; the
    * max-id scalar rides the same blocks frame (1-row broadcast). */
  def m24IdDensity(spark: SparkSession, dir: String, block: Long = 1000L)
  : DataFrame = {
    import spark.implicits._
    val blocks = Tables.read(spark, dir, "orders")
      .groupBy(expr(s"o_orderkey DIV $block").as("block_id"))
      .agg(count(lit(1)).as("n_present"),
        min($"o_orderkey").as("min_in_block"),
        max($"o_orderkey").as("max_in_block"))
    val maxF = blocks.agg(min($"min_in_block").as("min_id"),
      max($"max_in_block").as("max_id"))
    // the head block caps at the observed MIN id exactly as the tail
    // block caps at the max: ids below the table's first key (e.g. a
    // keyspace starting at 1, or an instance seeded at an offset) are
    // not "missing" — without the mirror cap n_missing overstates
    // front-of-range waste
    blocks.crossJoin(broadcast(maxF))
      .select($"block_id",
        greatest($"block_id" * block, $"min_id").as("id_lo"),
        least(($"block_id" + 1L) * block - 1L, $"max_id").as("id_hi"),
        $"n_present",
        (least(($"block_id" + 1L) * block - 1L, $"max_id")
          - greatest($"block_id" * block, $"min_id") + 1L
          - $"n_present").as("n_missing"))
  }

  /** m24 oracle: same block rollup + capped-final-block arithmetic. */
  val m24Sql: String =
    """WITH b AS (
      |  SELECT o_orderkey // 1000 AS block_id, count(*) AS n_present,
      |         min(o_orderkey) AS min_in_block,
      |         max(o_orderkey) AS max_in_block
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT min(min_in_block) AS min_id,
      |              max(max_in_block) AS max_id FROM b)
      |SELECT b.block_id,
      |  CAST(greatest(b.block_id * 1000, mx.min_id) AS BIGINT) AS id_lo,
      |  CAST(least((b.block_id + 1) * 1000 - 1, mx.max_id) AS BIGINT) AS id_hi,
      |  CAST(b.n_present AS BIGINT) AS n_present,
      |  CAST(least((b.block_id + 1) * 1000 - 1, mx.max_id)
      |    - greatest(b.block_id * 1000, mx.min_id) + 1 - b.n_present AS BIGINT) AS n_missing
      |FROM b, mx
      |ORDER BY b.block_id""".stripMargin

  /** m26: delete-impact blast radius over the customer → orders →
    * lineitem FK chain — [[MergeOps.cascadeImpact]] with seeds =
    * every 97th customer (a deterministic erasure batch). See the
    * operator scaladoc for the DAG walk and checkpoint rationale. */
  def m26CascadeImpact(spark: SparkSession, dir: String): DataFrame = {
    import Orchestrator.{MergeMode, TableSpec}
    val specs = Seq(
      TableSpec("customer", "c_custkey", Seq("c_name"), MergeMode.Consolidate),
      TableSpec("orders", "o_orderkey", Nil, MergeMode.Move,
        fks = Map("o_custkey" -> "customer")),
      TableSpec("lineitem", "l_orderkey", Nil, MergeMode.Move,
        fks = Map("l_orderkey" -> "orders")))
    val frames = specs.map(s => s.name -> Tables.read(spark, dir, s.name)).toMap
    val seeds = frames("customer")
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
    MergeOps.cascadeImpact(specs, frames, "customer", seeds)
  }

  /** m26 oracle: chained EXISTS semi-joins, parents first. */
  val m26Sql: String =
    """WITH seedc AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |io AS (
      |  SELECT o_orderkey FROM orders o
      |  WHERE EXISTS (SELECT 1 FROM seedc s WHERE s.c_custkey = o.o_custkey)),
      |il AS (
      |  SELECT 1 FROM lineitem l
      |  WHERE EXISTS (SELECT 1 FROM io WHERE io.o_orderkey = l.l_orderkey))
      |SELECT 'customer' AS table_name, (SELECT count(*) FROM seedc) AS n_impacted
      |UNION ALL
      |SELECT 'lineitem', (SELECT count(*) FROM il)
      |UNION ALL
      |SELECT 'orders', (SELECT count(*) FROM io)
      |ORDER BY table_name""".stripMargin

  /** m27: FK FAN-OUT audit — per parent-child relation in the star
    * schema: referencing parents, total children, max and disc-p99
    * fan-out, mean ×1e6. This is the merge planner's skew map: m2's
    * remap join and m9's batched moves shuffle on exactly these keys,
    * so the max/p99 gap tells which relation needs j1's salting
    * (a 10⁶-child parent key is one reducer's whole day), and the
    * reference's batch-size knob should be sized off p99, not mean.
    * Same diagnostic family as g9 (degree view of a graph), here over
    * the FK DAG m13's orchestrator walks.
    *
    * Scale shape: the (relation, parent, fanout) frame is memoized
    * (3 child-table scans total — one per lineitem FK — would
    * otherwise re-derive per consumer); the p99 rides a relation-
    * PARTITIONED window over the (relation, fanout)-histogram
    * (bounded by distinct fan-out values, never parent-sized in the
    * window's partition count); aggregates map-side-combine to 4
    * rows. */
  def m27FkFanout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val halfUp = graft.functions.IntMath.halfUpDiv _
    val fan = graft.operators.Indexes.memo(s"m27_fan:$dir") {
      def rel(table: String, key: String, name: String): DataFrame =
        Tables.read(spark, dir, table)
          .groupBy(col(key).as("parent"))
          .agg(count(lit(1)).as("fanout"))
          .select(lit(name).as("relation"), $"parent", $"fanout")
      rel("orders", "o_custkey", "orders->customer")
        .unionAll(rel("lineitem", "l_orderkey", "lineitem->orders"))
        .unionAll(rel("lineitem", "l_partkey", "lineitem->part"))
        .unionAll(rel("lineitem", "l_suppkey", "lineitem->supplier"))
    }
    val hist = fan.groupBy($"relation", $"fanout").agg(count(lit(1)).as("np"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"relation").orderBy($"fanout")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = hist.groupBy($"relation".as("rel2"))
      .agg(sum($"np").as("n_parents"), sum($"fanout" * $"np").as("n_children"),
        max($"fanout").as("max_fanout"))
    hist.withColumn("cum", sum($"np").over(w))
      .join(broadcast(tot), $"relation" === $"rel2")
      .groupBy($"relation")
      .agg(max($"n_parents").as("n_parents"), max($"n_children").as("n_children"),
        max($"max_fanout").as("max_fanout"),
        min(when($"cum" >= expr("(99 * n_parents + 99) DIV 100"), $"fanout"))
          .as("p99_fanout"))
      .withColumn("mean_e6", halfUp($"n_children" * 1000000L, $"n_parents"))
      .orderBy("relation")
  }

  /** m27 oracle: the same per-relation rollup, histogram cum p99 and
    * half-up mean. */
  val m27Sql: String =
    """WITH fan AS (
      |  SELECT 'orders->customer' AS relation, o_custkey AS parent, count(*) AS fanout
      |    FROM orders GROUP BY 2
      |  UNION ALL
      |  SELECT 'lineitem->orders', l_orderkey, count(*) FROM lineitem GROUP BY 2
      |  UNION ALL
      |  SELECT 'lineitem->part', l_partkey, count(*) FROM lineitem GROUP BY 2
      |  UNION ALL
      |  SELECT 'lineitem->supplier', l_suppkey, count(*) FROM lineitem GROUP BY 2),
      |h AS (SELECT relation, fanout, count(*) AS np FROM fan GROUP BY 1, 2),
      |c AS (
      |  SELECT relation, fanout, np,
      |    sum(np) OVER (PARTITION BY relation ORDER BY fanout) AS cum
      |  FROM h),
      |t AS (
      |  SELECT relation AS rel2, sum(np) AS n_parents,
      |    sum(fanout * np) AS n_children, max(fanout) AS max_fanout
      |  FROM h GROUP BY 1)
      |SELECT c.relation,
      |  CAST(max(t.n_parents) AS BIGINT) AS n_parents,
      |  CAST(max(t.n_children) AS BIGINT) AS n_children,
      |  CAST(max(t.max_fanout) AS BIGINT) AS max_fanout,
      |  CAST(min(CASE WHEN c.cum >= (99 * t.n_parents + 99) // 100
      |               THEN c.fanout END) AS BIGINT) AS p99_fanout,
      |  CAST((2 * (max(t.n_children) * 1000000) + max(t.n_parents))
      |       // (2 * max(t.n_parents)) AS BIGINT) AS mean_e6
      |FROM c JOIN t ON t.rel2 = c.relation
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** m28: FIELD-LEVEL SURVIVORSHIP — the master-data-management
    * record-merge step the reference's consolidation skips entirely
    * (utils.js:83 keeps the destination row verbatim; m22 reports
    * what that hides). Here matched records MERGE per field under
    * declared per-column rules — the survivorship matrix of MDM
    * (Talend/Informatica's "survivorship rules", Bleiholder &
    * Naumann's fusion functions): balance takes MAX (recency proxy),
    * segment takes the first NON-NULL with source priority, nation is
    * MUST-AGREE (disagreement keeps dest and raises a conflict, never
    * silently overwrites an identity field). Per matched key the
    * output carries each survivor AND its provenance
    * ('src'/'dest'/'equal') — the audit trail that makes a field
    * merge reviewable.
    *
    * Simulated drift (fixture, m20/m22's idiom): dest holds a stale
    * whole-unit ledger copy and an 'UNKNOWN' segment for keys
    * ≡ 0 (mod 11); src lost its segment for keys ≡ 0 (mod 5) and
    * drifted nation for keys ≡ 0 (mod 7).
    *
    * Shape: dest collapses to one row per natural key (min-id
    * survivor, m1's convention) in ONE map-side-combined agg; one
    * equi-join on the key; every rule is a codegen'd projection —
    * integer cents and string compares only, so the whole matrix is
    * hash-checkable. */
  def m28FieldSurvivorship(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = srcCust(spark, dir).select(
      col("c_custkey").as("src_id"), col("c_name"),
      round(col("c_acctbal") * 100).cast("long").as("s_bal_cents"),
      when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("c_mktsegment")).as("s_seg"),
      (col("c_nationkey") + when(col("c_custkey") % 7 === 0, 1).otherwise(0))
        .cast("long").as("s_nation"))
    val dest = destCust(spark, dir).select(
      col("c_custkey"), col("c_name"),
      (floor(col("c_acctbal")).cast("long") * 100L).as("d_bal"),
      when(col("c_custkey") % 11 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("d_seg0"),
      col("c_nationkey").cast("long").as("d_nat0"))
      .groupBy(col("c_name"))
      .agg(min(col("c_custkey")).as("dest_id"),
        min_by(col("d_bal"), col("c_custkey")).as("d_bal_cents"),
        min_by(col("d_seg0"), col("c_custkey")).as("d_seg"),
        min_by(col("d_nat0"), col("c_custkey")).as("d_nation"))
    def from(s: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column,
             winner: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(s <=> d, "equal").when(winner <=> s, "src").otherwise("dest")
    val balWin = greatest(col("s_bal_cents"), col("d_bal_cents"))
    val segWin = coalesce(col("s_seg"), col("d_seg"))
    src.join(dest, Seq("c_name"))
      .select(col("c_name"), col("src_id"), col("dest_id"),
        balWin.as("bal_cents"), from(col("s_bal_cents"), col("d_bal_cents"), balWin).as("bal_from"),
        segWin.as("segment"), from(col("s_seg"), col("d_seg"), segWin).as("seg_from"),
        col("d_nation").as("nation"),
        (col("s_nation") =!= col("d_nation")).cast("long").as("nation_conflict"))
  }

  /** m28 oracle: same drift fixture, min-id dest survivor, rule
    * projections (null-safe equality spelled IS NOT DISTINCT FROM). */
  val m28Sql: String =
    """WITH srcc AS (
      |  SELECT c_custkey AS src_id, c_name,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS s_bal_cents,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS s_seg,
      |    CAST(c_nationkey + CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS BIGINT) AS s_nation
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |destc AS (
      |  SELECT c_name, min(c_custkey) AS dest_id,
      |    min_by(CAST(floor(c_acctbal) AS BIGINT) * 100, c_custkey) AS d_bal_cents,
      |    min_by(CASE WHEN c_custkey % 11 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END,
      |           c_custkey) AS d_seg,
      |    min_by(CAST(c_nationkey AS BIGINT), c_custkey) AS d_nation
      |  FROM customer WHERE c_custkey % 2 = 0 GROUP BY c_name)
      |SELECT s.c_name, s.src_id, d.dest_id,
      |  greatest(s.s_bal_cents, d.d_bal_cents) AS bal_cents,
      |  CASE WHEN s.s_bal_cents IS NOT DISTINCT FROM d.d_bal_cents THEN 'equal'
      |       WHEN greatest(s.s_bal_cents, d.d_bal_cents) IS NOT DISTINCT FROM s.s_bal_cents THEN 'src'
      |       ELSE 'dest' END AS bal_from,
      |  coalesce(s.s_seg, d.d_seg) AS segment,
      |  CASE WHEN s.s_seg IS NOT DISTINCT FROM d.d_seg THEN 'equal'
      |       WHEN coalesce(s.s_seg, d.d_seg) IS NOT DISTINCT FROM s.s_seg THEN 'src'
      |       ELSE 'dest' END AS seg_from,
      |  d.d_nation AS nation,
      |  CAST(CASE WHEN s.s_nation <> d.d_nation THEN 1 ELSE 0 END AS BIGINT) AS nation_conflict
      |FROM srcc s JOIN destc d ON d.c_name = s.c_name
      |ORDER BY d.dest_id""".stripMargin

  /** m29: CDC APPLY over an ordered change stream with DELETES —
    * the modern sync the reference's nightly full re-merge (and m19's
    * delete-free delta) stops short of: a Debezium-style log of
    * upserts and tombstones materialized onto a base snapshot
    * ([[MergeOps.cdcApply]]). Synthesized per the m-block convention
    * from events: the base snapshot is each EVEN user's first event
    * ("the table as of the sync watermark; odd users registered
    * later"), the change log is everything after — `error` events are
    * deletions (account closed), everything else an upsert of the
    * profile value; users ≡ 0 (mod 3) have no post-watermark changes
    * (the m-block mod-slice convention), so every outcome class is
    * non-empty on real data: `unchanged` (no log entries), `updated`,
    * `deleted` (last op is a tombstone), `inserted` (odd users, never
    * in base); deleted keys keep their last base value for the audit
    * trail.
    *
    * Scale: one (ts, event_id)-ordered window over the log partitioned
    * by user (work ∝ |changes|) + one key-equi full-outer join with
    * the base — the log-compaction shape, never a full re-merge. */
  def m29CdcApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"))
    val w0 = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val seqd = ev.withColumn("__rn", row_number().over(w0))
    val base = seqd.filter(col("__rn") === 1 && col("user_id") % 2 === 0)
      .select(col("user_id"), col("value"))
    val log = seqd.filter(!(col("__rn") === 1 && col("user_id") % 2 === 0))
      .filter(col("user_id") % 3 =!= 0)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", "d").otherwise("u").as("op"),
        col("value"))
    MergeOps.cdcApply(base, log, Seq("user_id"), Seq("ts", "event_id"), "op")
  }

  /** m29 oracle: the same first-event base / later-log split, last op
    * per key, full-join outcome matrix. */
  val m29Sql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type, round(value, 4) AS value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |base AS (SELECT user_id, value FROM ev WHERE rn = 1 AND user_id % 2 = 0),
      |lg AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op, value
      |  FROM ev WHERE NOT (rn = 1 AND user_id % 2 = 0) AND user_id % 3 <> 0),
      |last AS (
      |  SELECT user_id, op, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS r FROM lg) WHERE r = 1),
      |j AS (
      |  SELECT coalesce(b.user_id, l.user_id) AS user_id,
      |    b.user_id IS NOT NULL AS inb, l.op, b.value AS bv, l.value AS lv
      |  FROM base b FULL JOIN last l ON l.user_id = b.user_id),
      |o AS (
      |  SELECT user_id,
      |    CASE WHEN op IS NULL THEN 'unchanged'
      |         WHEN op = 'd' AND inb THEN 'deleted'
      |         WHEN op = 'd' THEN 'noop'
      |         WHEN NOT inb THEN 'inserted'
      |         ELSE 'updated' END AS outcome,
      |    CASE WHEN op = 'u' THEN lv ELSE bv END AS value
      |  FROM j)
      |SELECT user_id, outcome, value FROM o
      |WHERE outcome <> 'noop' ORDER BY user_id""".stripMargin
}
