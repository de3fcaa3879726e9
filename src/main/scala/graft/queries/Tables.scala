package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet; predicate/projection pushdown into the
  * scan is free via the parquet DSv2 source. At 100 TB these would be
  * partitioned directories — the loaders keep the access path behind one
  * function so partition-pruned layouts can be swapped in without touching
  * query code.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects; read the nanos as raw longs (callers do exact integer
    * microsecond math — see EventQueries). Set here so EVERY events
    * consumer is safe regardless of call order. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Register all tables as temp views so queries can be written in SQL
    * (shared dialect with the DuckDB oracle where possible). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "events", "documents", "embeddings")
      .foreach(n => t(s, d, n).createOrReplaceTempView(n))
  }
}
