package graft

/** Print the dial-aware q_knn_join oracle SQL for a corpus with `n`
  * embeddings (tools/spot_check patches it into oracle_sql.json before
  * running the DuckDB compare on ScaleGen corpora — the static entry
  * carries the 4-plane gate chain). No Spark session needed. */
object SpotOracle {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val kind = if (args.length > 1) args(1) else "1"
    println(kind match {
      case "filtered"      => SparkEntry.knnFilteredOracleSqlFor(n)
      // n = the PARTITION's row count (label = 7), not the corpus'
      case "filtered_part" => SparkEntry.knnFilteredPartOracleSqlFor(n)
      case "incr"          => SparkEntry.knnIncrOracleSqlFor(n)
      // n = the BOOTSTRAP partition's row count (label = 7 at v0)
      case "part_incr"     => SparkEntry.knnPartIncrOracleSqlFor(n)
      case p               => SparkEntry.knnJoinOracleSqlFor(n, p.toInt)
    })
  }
}
