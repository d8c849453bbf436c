package graft

/** Print the dial-aware q_knn_join oracle SQL for a corpus with `n`
  * embeddings (tools/spot_check patches it into oracle_sql.json before
  * running the DuckDB compare on ScaleGen corpora — the static entry
  * carries the 4-plane gate chain). No Spark session needed. */
object SpotOracle {
  def main(args: Array[String]): Unit =
    println(SparkEntry.knnJoinOracleSqlFor(args(0).toLong,
      if (args.length > 1) args(1).toInt else 1))
}
