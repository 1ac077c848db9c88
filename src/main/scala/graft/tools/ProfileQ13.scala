package graft.tools

import org.apache.spark.sql.SparkSession

/** q13 (TPC-H Q1) head-to-head: nimble scan vs a layout-matched parquet
  * control, warm repeats — isolates format decode cost in the heaviest
  * full-scan aggregate. */
object ProfileQ13 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sql = """SELECT l_returnflag, l_linestatus,
      sum(l_quantity) AS sum_qty, sum(l_extendedprice) AS sum_base,
      sum(l_extendedprice * (1 - l_discount)) AS sum_disc,
      avg(l_quantity) AS avg_qty, avg(l_discount) AS avg_disc, count(1) AS cnt
      FROM %s GROUP BY l_returnflag, l_linestatus"""
    val nd = graft.Tables.nimbleDir(spark, sfDir, "lineitem")
    spark.read.format("nimble").load(nd).createOrReplaceTempView("li_n")
    // layout-matched parquet control (same partitioning as the nimble write)
    val pqDir = s"${System.getProperty("java.io.tmpdir")}/pq13-control"
    graft.Tables.parquet(spark, sfDir, "lineitem")
      .repartitionByRange(cpus.toInt, org.apache.spark.sql.functions.col("l_orderkey"))
      .sortWithinPartitions("l_orderkey").write.mode("overwrite").parquet(pqDir)
    spark.read.parquet(pqDir).createOrReplaceTempView("li_p")
    for (t <- Seq("li_n", "li_p"); r <- 1 to 4) {
      val t0 = System.nanoTime()
      spark.sql(sql.format(t)).collect()
      println(f"$t run$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
