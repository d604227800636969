package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test layout (TESTDATA.md).
  *
  * Each driver table is a single parquet file `dir/name.parquet`. At
  * production scale the same call reads a partitioned directory tree
  * (e.g. `orders/date=2024-01-01/part-0.parquet`) and Catalyst partition-prunes
  * on the `date`/`name` predicates the downstream operators push; none
  * of the operator code needs to change.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` carries TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read the nanos as raw longs (legacy conf)
    * and truncate to microsecond timestamps — the same truncation DuckDB
    * applies when it coerces nanos to its micros TIMESTAMP, so both
    * engines see identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
