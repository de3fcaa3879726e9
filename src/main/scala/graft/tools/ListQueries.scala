package graft.tools

/** Prints every contract query name, one per line — lets shell-side
  * sweep tooling (scripts/verify_sharded.sh) shard the driver contract
  * without hardcoding the inventory. No Spark session: the queries map
  * holds unevaluated lambdas. */
object ListQueries {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
