package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import graft.merge.{MergeConfig, OrchestratorQueries}
import graft.sources.{AtomicSnapshot, Tables}

/** LIVE-JDBC end-to-end merge: the reference is a MySQL-to-MySQL tool
  * (connection.js:1, utils.js:161), so the JDBC read path is its
  * entire I/O surface. This spec drives the full config-driven merge
  * (MergeConfig.fromJson → execute: consolidate + move + self-FK +
  * uuid report + dry-run + `_merge_sources` guard) against two
  * embedded Derby databases seeded with the SAME simulated sf0.01
  * instances the m13 parquet path uses, and asserts the merged
  * outputs are row-identical between the two transports.
  *
  * The databases are seeded the real-world way: unquoted DDL (an
  * application-created schema — identifiers stored case-insensitively,
  * as in MySQL) + Spark JDBC appends. `jdbcTableAuto` then reads with
  * unquoted names and lowercases columns on the way in.
  */
class JdbcMergeSpec extends AnyFunSuite {
  import TestSpark._

  private val sf01 = "/root/testdata/sf0.01"
  private val names = Seq("customer", "orders", "lineitem")

  private def ddlFor(df: DataFrame, table: String): String = {
    val cols = df.schema.fields.map { f =>
      val t = f.dataType match {
        case LongType    => "BIGINT"
        case IntegerType => "INTEGER"
        case StringType  => "VARCHAR(256)"
        case other       => fail(s"unmapped fixture type $other")
      }
      s"${f.name} $t"
    }.mkString(", ")
    s"CREATE TABLE $table ($cols)"
  }

  private def runDdl(url: String, ddl: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    // execute(), not executeUpdate(): DuckDB's CHECKPOINT returns a
    // result set, which executeUpdate rejects
    try conn.createStatement().execute(ddl)
    finally conn.close()
  }

  // customer carries a deterministic uuid so the uuid-report path runs
  private def withUuid(name: String, df: DataFrame): DataFrame =
    if (name == "customer")
      df.withColumn("c_uuid", md5(concat(lit("cust-"), col("c_custkey"))))
    else df

  /** Seed once: two Derby DBs + the parquet twin dirs, same frames. */
  private lazy val env: (String, String, String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft-jdbc").toString
    System.setProperty("derby.system.home", base) // derby.log stays out of the repo
    val srcUrl = s"jdbc:derby:$base/dbB;create=true"
    val destUrl = s"jdbc:derby:$base/dbA;create=true"
    val (srcDir, destDir) = (s"$base/src", s"$base/dest")
    names.foreach { n =>
      val s = withUuid(n, OrchestratorQueries.instance(spark, sf01, isSrc = true)(n))
      val d = withUuid(n, OrchestratorQueries.instance(spark, sf01, isSrc = false)(n))
      s.write.mode("overwrite").parquet(s"$srcDir/$n.parquet")
      d.write.mode("overwrite").parquet(s"$destDir/$n.parquet")
      runDdl(srcUrl, ddlFor(s, n))
      runDdl(destUrl, ddlFor(d, n))
      Tables.JdbcSink(srcUrl, n).save(s, "append")
      Tables.JdbcSink(destUrl, n).save(d, "append")
    }
    (base, srcUrl, destUrl, srcDir, destDir)
  }

  private def configJson(src: String, dest: String, out: String): String =
    s"""{
       |  "source": {"path": "$src", "location": "instanceB"},
       |  "destination": {"path": "$dest"},
       |  "output": "$out",
       |  "generateNewUuids": false,
       |  "tables": [
       |    {"name": "customer", "idCol": "c_custkey", "mode": "consolidate",
       |     "naturalKey": ["c_name"], "selfFks": ["referred_by"], "uuidCol": "c_uuid"},
       |    {"name": "orders", "idCol": "o_orderkey", "mode": "move",
       |     "naturalKey": ["o_orderkey"], "fks": {"o_custkey": "customer"}},
       |    {"name": "lineitem", "idCol": "l_lineid", "mode": "move",
       |     "naturalKey": ["l_orderkey", "l_linenumber"], "fks": {"l_orderkey": "orders"}}
       |  ]
       |}""".stripMargin

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("jdbcTableAuto reads a live Derby table range-partitioned, columns lowercased") {
    val (_, srcUrl, _, _, _) = env
    val df = Tables.jdbcTableAuto(spark, srcUrl, "customer", Some("c_custkey"), numPartitions = 8)
    assert(df.columns.toSeq == Seq("c_custkey", "c_name", "referred_by", "c_uuid"))
    assert(df.rdd.getNumPartitions == 8, "bounds discovered → range-partitioned scan")
    val expected = withUuid("customer", OrchestratorQueries.instance(spark, sf01, isSrc = true)("customer"))
    assert(rows(df) == rows(expected))
  }

  test("dry-run over live JDBC equals the parquet dry-run") {
    val (base, srcUrl, destUrl, srcDir, destDir) = env
    val viaJdbc = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcUrl, destUrl, s"$base/outdry_j")), dryRun = true)
    val viaParquet = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcDir, destDir, s"$base/outdry_p")), dryRun = true)
    assert(rows(viaJdbc) == rows(viaParquet))
    assert(viaJdbc.count() == 3) // one rehearsal row per table
  }

  test("full config-driven merge over live JDBC row-equals the parquet path") {
    val (base, srcUrl, destUrl, srcDir, destDir) = env
    val (outJ, outP) = (s"$base/out_j", s"$base/out_p")
    val repJ = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcUrl, destUrl, outJ)), dryRun = false)
    val repP = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcDir, destDir, outP)), dryRun = false)
    assert(rows(repJ) == rows(repP))
    for (n <- names) {
      val j = AtomicSnapshot.readCurrent(spark, s"$outJ/$n.parquet")
        .getOrElse(fail(s"no published $n via jdbc"))
      val p = AtomicSnapshot.readCurrent(spark, s"$outP/$n.parquet")
        .getOrElse(fail(s"no published $n via parquet"))
      assert(j.columns.toSeq == p.columns.toSeq, n)
      assert(rows(j) == rows(p), s"merged $n diverged between transports")
    }
    // the uuid report published on both transports, identically
    val uj = AtomicSnapshot.readCurrent(spark, s"$outJ/customer__uuid_report.parquet").get
    val up = AtomicSnapshot.readCurrent(spark, s"$outP/customer__uuid_report.parquet").get
    assert(rows(uj) == rows(up))

    // source-once guard holds on the JDBC transport too
    val again = intercept[IllegalStateException] {
      MergeConfig.execute(spark,
        MergeConfig.fromJson(configJson(srcUrl, destUrl, outJ)), dryRun = false)
    }
    assert(again.getMessage.contains("already processed"))
  }

  test("FK auto-discovery: zero-declaration config merges identically to the declared one") {
    // a second pair of Derby DBs carrying REAL FK constraints — the
    // reference never asks the user for relations, it reads them from
    // information_schema (integrity-checks.js:66-75); here the same
    // zero-declaration config must work via getImportedKeys
    val (base, _, _, _, destDir0) = env
    val srcUrl = s"jdbc:derby:$base/dbB_fk;create=true"
    val destUrl = s"jdbc:derby:$base/dbA_fk;create=true"
    for (url <- Seq(srcUrl, destUrl); isSrc = url == srcUrl) {
      names.foreach { n =>
        val df = withUuid(n, OrchestratorQueries.instance(spark, sf01, isSrc = isSrc)(n))
        runDdl(url, ddlFor(df, n))
        Tables.JdbcSink(url, n).save(df, "append")
      }
      // constraints AFTER load (Derby validates existing rows at ALTER
      // time — insert order is then irrelevant); PK columns first
      Seq("customer" -> "c_custkey", "orders" -> "o_orderkey", "lineitem" -> "l_lineid")
        .foreach { case (t, id) =>
          runDdl(url, s"ALTER TABLE $t ALTER COLUMN $id NOT NULL")
          runDdl(url, s"ALTER TABLE $t ADD CONSTRAINT pk_$t PRIMARY KEY ($id)")
        }
      runDdl(url, "ALTER TABLE customer ADD CONSTRAINT fk_cust_self " +
        "FOREIGN KEY (referred_by) REFERENCES customer (c_custkey)")
      runDdl(url, "ALTER TABLE orders ADD CONSTRAINT fk_ord_cust " +
        "FOREIGN KEY (o_custkey) REFERENCES customer (c_custkey)")
      runDdl(url, "ALTER TABLE lineitem ADD CONSTRAINT fk_li_ord " +
        "FOREIGN KEY (l_orderkey) REFERENCES orders (o_orderkey)")
    }
    // discovery itself surfaces exactly the declared relations
    val bare = MergeConfig.fromJson(noFkConfigJson(srcUrl, destUrl, s"$base/x")).tables
    val disc = MergeConfig.discoverFks(srcUrl, bare)
    assert(disc.find(_.name == "customer").get.selfFks == Seq("referred_by"))
    assert(disc.find(_.name == "customer").get.fks.isEmpty)
    assert(disc.find(_.name == "orders").get.fks == Map("o_custkey" -> "customer"))
    assert(disc.find(_.name == "lineitem").get.fks == Map("l_orderkey" -> "orders"))
    // an explicit declaration always wins: specs that already declare
    // relations come back untouched (intent — deferred/salted FKs —
    // must never be overwritten by catalog metadata)
    val declared = MergeConfig.fromJson(configJson(srcUrl, destUrl, s"$base/y")).tables
    assert(MergeConfig.discoverFks(srcUrl, declared) == declared)
    // and the zero-declaration merge is row-identical to the declared
    // parquet-path merge
    val (outD, outRef) = (s"$base/out_disc", s"$base/out_declref")
    MergeConfig.execute(spark,
      MergeConfig.fromJson(noFkConfigJson(srcUrl, destUrl, outD)), dryRun = false)
    MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(s"$base/src", destDir0, outRef)), dryRun = false)
    for (n <- names) {
      val d = AtomicSnapshot.readCurrent(spark, s"$outD/$n.parquet").get
      val r = AtomicSnapshot.readCurrent(spark, s"$outRef/$n.parquet").get
      assert(d.columns.toSeq == r.columns.toSeq, n)
      assert(rows(d) == rows(r), s"discovered-FK merge diverged on $n")
    }
  }

  /** the declared config minus every fks/selfFks entry */
  private def noFkConfigJson(src: String, dest: String, out: String): String =
    s"""{
       |  "source": {"path": "$src", "location": "instanceB"},
       |  "destination": {"path": "$dest"},
       |  "output": "$out",
       |  "generateNewUuids": false,
       |  "tables": [
       |    {"name": "customer", "idCol": "c_custkey", "mode": "consolidate",
       |     "naturalKey": ["c_name"], "uuidCol": "c_uuid"},
       |    {"name": "orders", "idCol": "o_orderkey", "mode": "move",
       |     "naturalKey": ["o_orderkey"]},
       |    {"name": "lineitem", "idCol": "l_lineid", "mode": "move",
       |     "naturalKey": ["l_orderkey", "l_linenumber"]}
       |  ]
       |}""".stripMargin

  test("jdbc output: full DB-to-DB merge writes live tables, registry guard, parquet parity") {
    val (base, srcUrl, destUrl, srcDir, destDir) = env
    val outUrl = s"jdbc:derby:$base/dbOut;create=true"
    val rep = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcUrl, destUrl, outUrl)), dryRun = false)
    assert(rep.count() == 3)
    val outP = s"$base/out_parity"
    MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcDir, destDir, outP)), dryRun = false)
    // Spark's JDBC writer creates tables with UNQUOTED names (Derby
    // stores them case-insensitively), so plain names read back
    def readOut(name: String) = spark.read.format("jdbc")
      .option("url", outUrl).option("dbtable", name).load()
    for (n <- names) {
      val j = readOut(n)
      val p = AtomicSnapshot.readCurrent(spark, s"$outP/$n.parquet").get
      assert(j.columns.map(_.toLowerCase).toSeq == p.columns.toSeq, n)
      assert(rows(j) == rows(p), s"live-DB merged $n diverged from the parquet transport")
    }
    assert(readOut("customer__uuid_report").count() > 0)
    assert(rows(readOut("graft_merge_sources")) == Seq(Seq("instanceB")))
    // the registry lives IN the output database and guards re-merges
    val again = intercept[IllegalStateException] {
      MergeConfig.execute(spark,
        MergeConfig.fromJson(configJson(srcUrl, destUrl, outUrl)), dryRun = false)
    }
    assert(again.getMessage.contains("already processed"))
  }

  test("MergeMain CLI argv surface drives a DB-to-DB dry run end-to-end") {
    val (base, srcUrl, destUrl, _, _) = env
    val cfgPath = s"$base/cli_config.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath),
      configJson(srcUrl, destUrl, s"$base/out_cli"))
    val lines = graft.merge.MergeMain.run(Array(cfgPath, "--dry-run"), spark)
    assert(lines.length == 3) // one rehearsal line per table
    assert(lines.forall(_.split("\t").length >= 3))
    // dry run wrote nothing
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/out_cli")))
    // a bad config aborts with the reference's aggregated error list
    val badPath = s"$base/cli_bad.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(badPath),
      """{"source": {"path": "/x"}, "tables": []}""")
    val err = intercept[IllegalArgumentException] {
      graft.merge.MergeMain.run(Array(badPath, "--dry-run"), spark)
    }
    assert(err.getMessage.contains("location not specified"))
    assert(err.getMessage.contains("generateNewUuids"))
  }

  test("JdbcSink writes merged output back to a live database, round-trip intact") {
    val (base, _, destUrl, srcDir, destDir) = env
    val out = s"$base/out_sink"
    MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcDir, destDir, out)), dryRun = false)
    val merged = AtomicSnapshot.readCurrent(spark, s"$out/customer.parquet").get
      // CLOB-safe narrow projection with the lineage columns included
      .select(col("c_custkey").cast(LongType), col("c_name"), col("c_uuid"),
        col("instance"), col("merge_source"))
    runDdl(destUrl, ddlFor(merged, "customer_merged"))
    Tables.JdbcSink(destUrl, "customer_merged", batchSize = 200).save(merged, "append")
    val back = Tables.jdbcTableAuto(spark, destUrl, "customer_merged", Some("c_custkey"))
    assert(rows(back) == rows(merged))
  }

  test("second live dialect: full merge over DuckDB row-equals the Derby and parquet paths") {
    // The reference deploys against a live MySQL (connection.js:1); the
    // graft JDBC surface claims dialect-genericity but was E2E-proven
    // on Derby only. DuckDB rides Spark's DEFAULT dialect (no built-in
    // DuckDBDialect) — a different quoting/type-mapping code path and a
    // different engine entirely, all offline. The driver jar comes off
    // the local coursier cache via build.sbt's unmanagedJars glob;
    // cancel (don't fail) when it isn't there.
    assume(
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: ClassNotFoundException => false },
      "duckdb_jdbc not on the test classpath")
    val (base, _, _, srcDir, destDir) = env
    val srcUrl = s"jdbc:duckdb:$base/duck_src.db"
    val destUrl = s"jdbc:duckdb:$base/duck_dest.db"
    // PIN one connection per database BEFORE any other access and hold
    // it for the whole test: duckdb_jdbc (1.0.x) shares the in-process
    // instance only while ≥1 connection is open — under full
    // open/close churn the eviction/boot cycle races concurrent Spark
    // tasks and connections land on stale instances (observed: "Table
    // with name lineitem does not exist" on an executor scan, scans
    // returning 0 rows, native "Serialization Error" — 10/10 reps in
    // the bad interleavings, 0/30 with the pins). A server engine
    // (the reference's deployment) has no such lifecycle to race.
    val pins = Seq(srcUrl, destUrl).map(java.sql.DriverManager.getConnection)
    try {
    names.foreach { n =>
      val s = withUuid(n, OrchestratorQueries.instance(spark, sf01, isSrc = true)(n))
      val d = withUuid(n, OrchestratorQueries.instance(spark, sf01, isSrc = false)(n))
      runDdl(srcUrl, ddlFor(s, n))
      runDdl(destUrl, ddlFor(d, n))
      // DuckDB is single-writer per database: seed one partition at a
      // time (the merge itself only READS these DBs)
      Tables.JdbcSink(srcUrl, n).save(s.coalesce(1), "append")
      Tables.JdbcSink(destUrl, n).save(d.coalesce(1), "append")
    }
    // the auto reader range-partitions DuckDB like any other engine
    val probe = Tables.jdbcTableAuto(spark, srcUrl, "customer", Some("c_custkey"), numPartitions = 4)
    assert(probe.columns.toSeq == Seq("c_custkey", "c_name", "referred_by", "c_uuid"))
    assert(probe.rdd.getNumPartitions == 4, "bounds discovered → range-partitioned scan")
    // dry-run parity across all three transports
    val dryDuck = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcUrl, destUrl, s"$base/outdry_duck")), dryRun = true)
    val dryParquet = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcDir, destDir, s"$base/outdry_p2")), dryRun = true)
    assert(rows(dryDuck) == rows(dryParquet))
    // full merge parity: DuckDB source/dest, parquet output
    val (outD, outP) = (s"$base/out_duck", s"$base/out_duckref")
    val repD = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcUrl, destUrl, outD)), dryRun = false)
    val repP = MergeConfig.execute(spark,
      MergeConfig.fromJson(configJson(srcDir, destDir, outP)), dryRun = false)
    assert(rows(repD) == rows(repP))
    for (n <- names) {
      val dd = AtomicSnapshot.readCurrent(spark, s"$outD/$n.parquet")
        .getOrElse(fail(s"no published $n via duckdb"))
      val pp = AtomicSnapshot.readCurrent(spark, s"$outP/$n.parquet").get
      assert(dd.columns.toSeq == pp.columns.toSeq, n)
      // SCHEMA (name, type) equality too: without graft's DuckDbDialect
      // the driver's blanket isSigned=false widened BIGINT scans to
      // decimal(20,0). Field metadata is excluded — the JDBC scan
      // annotates provenance (jdbcClientType etc.), which is fine.
      assert(dd.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        pp.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"merged $n schema diverged: ${dd.schema.simpleString}")
      assert(rows(dd) == rows(pp), s"merged $n diverged between DuckDB and parquet transports")
    }
    } finally pins.foreach(_.close())
  }

  test("dialect quoting: per-URL resolution and the MySQL spellings, no live server needed") {
    // identifier quoting and type mapping ride Spark's own JdbcDialects
    // registry — the graft surface must pick the URL's dialect, never
    // hard-code one engine's spelling. MySQL (the reference's engine,
    // connection.js:1) backticks; Derby and the default dialect use
    // ANSI double quotes.
    assert(Tables.quoteIdent("jdbc:mysql://host/db", "order") == "`order`")
    assert(Tables.quoteIdent("jdbc:derby:memory:x", "order") == "\"order\"")
    // quoted=true embeds the dialect-quoted name in the dbtable option
    assert(Tables.JdbcSource("jdbc:mysql://h/db", "order", "id", 0, 10, 4,
      quoted = true).options("dbtable") == "`order`")
    assert(Tables.JdbcSink("jdbc:mysql://h/db", "order", quoted = true)
      .options("dbtable") == "`order`")
    assert(Tables.JdbcSink("jdbc:derby:memory:x", "order", quoted = true)
      .options("dbtable") == "\"order\"")
    // type mapping is the dialect's too (the sink never hand-maps):
    // spot-pin MySQL's divergent definitions so a regression to the
    // generic mapping cannot land silently
    val mysql = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:mysql://h/db")
    import org.apache.spark.sql.types.{BooleanType, StringType => SStr}
    assert(mysql.getJDBCType(SStr).map(_.databaseTypeDefinition).contains("LONGTEXT"))
    assert(mysql.getJDBCType(BooleanType).map(_.databaseTypeDefinition).contains("BIT(1)"))
  }

  test("reserved-word table survives end to end: quoted sink DDL + auto-reader quoting fallback") {
    import spark.implicits._
    val (base, _, _, _, _) = env
    val url = s"jdbc:derby:$base/dbQuoted;create=true"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload")
    // `order` is reserved in Derby (and MySQL): the unquoted spelling
    // is a syntax error, so the sink must pass the dialect-quoted name
    // and Spark's writer creates it with quoted (case-exact) columns
    Tables.JdbcSink(url, "order", quoted = true).save(df, "overwrite")
    // the auto reader gets the LOGICAL name; its unquoted bounds query
    // fails (reserved word AND case-exact columns), so the documented
    // fallback re-issues it dialect-quoted and still range-partitions
    val back = Tables.jdbcTableAuto(spark, url, "order", Some("id"), numPartitions = 3)
    // >1 proves the range-partitioned path (the no-bounds fallback is
    // single-partition); Spark clamps the count on a tiny id range
    assert(back.rdd.getNumPartitions > 1, "quoting fallback lost the parallel read")
    assert(back.columns.toSeq == Seq("id", "payload"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
