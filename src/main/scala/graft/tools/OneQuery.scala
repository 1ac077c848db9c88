package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run a single SparkEntry query by name. Usage: OneQuery <name> <sfDir>. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.show(5, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
