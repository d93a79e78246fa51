package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink layer.
  *
  * The reference engine reads its tables over JDBC from two MySQL
  * instances (/root/reference/connection.js:1, orchestrator.js:49) and
  * writes with batched INSERTs. Here every table is a columnar source:
  * parquet first (pushdown + pruning for free), with csv/json/jdbc
  * paths for parity. Readers return plain DataFrames so every operator
  * stays declarative and Catalyst-optimizable.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one star-schema table from an sf directory. */
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` normalized to TimestampType. The file stores
    * TIMESTAMP(NANOS), which Spark only reads as long nanos
    * (spark.sql.legacy.parquet.nanosAsLong=true); truncate to micros —
    * same precision DuckDB keeps, so oracles agree. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Parallel JDBC read, the scale-path for the reference's MySQL
    * source (no MySQL in this environment; options builder is
    * unit-tested, execution path exercised only against real DBs).
    * Partitioned on a numeric key so 1 executor isn't a straw through
    * which 100 TB must pass — mirrors `batchSize` paging in
    * reference utils.js:161 but reads N ranges concurrently.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int, props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .jdbc(url, table, props)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
