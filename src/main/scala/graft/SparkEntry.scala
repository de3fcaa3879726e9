package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY.md §2 plus the training-data pipeline ops);
  * `oracleSql` carries a DuckDB-executable twin for every query whose
  * semantics are ANSI-SQL-expressible. Names and column aliases match
  * 1:1 between the two maps (the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ EventQueries.queries ++ PipelineQueries.queries ++
      ExtendedQueries.queries ++ CurationQueries.queries ++ MiningQueries.queries ++
      AuditQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ EventQueries.oracle ++ PipelineQueries.oracle ++
      ExtendedQueries.oracle ++ CurationQueries.oracle ++ MiningQueries.oracle ++
      AuditQueries.oracle
}
