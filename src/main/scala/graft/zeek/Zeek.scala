package graft.zeek

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Convenience entry point mirroring the reference's `read_zeek(path,
  * named_params...)` call shape (reference: src/zeek_scanner.cpp:913-925)
  * for users who prefer a function over the format string. */
object Zeek {
  def read(spark: SparkSession, path: String,
      filename: Boolean = false,
      replacePeriods: Boolean = true,
      inet: Boolean = true,
      unionByName: Boolean = false,
      ignoreFileErrors: Boolean = false): DataFrame =
    spark.read.format("zeek")
      .option("filename", filename.toString)
      .option("replace_periods", replacePeriods.toString)
      .option("inet", inet.toString)
      .option("union_by_name", unionByName.toString)
      .option("ignore_file_errors", ignoreFileErrors.toString)
      .load(path)
}
