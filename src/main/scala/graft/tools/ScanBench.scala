package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-only microbench: repeated full-scan aggregation over the nimble
  * connector vs parquet on the same data (pre-converted). */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 10
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val nimbleLi = s"${System.getProperty("java.io.tmpdir")}/graft-bench/lineitem"
    if (!new java.io.File(nimbleLi).isDirectory ||
        !new java.io.File(nimbleLi).listFiles().exists(_.getName.endsWith(".gft")))
      li.repartition(cpus.toInt).write.format("nimble").mode("overwrite").save(nimbleLi)
    val nb = spark.read.format("nimble").load(nimbleLi)

    def fullScan(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(sum("l_extendedprice"), sum("l_quantity"), count(lit(1))).collect()

    val pq32Dir = s"${System.getProperty("java.io.tmpdir")}/graft-bench/lineitem-parquet"
    if (!new java.io.File(pq32Dir).isDirectory)
      li.repartition(cpus.toInt).write.mode("overwrite").parquet(pq32Dir)
    val pq32 = spark.read.parquet(pq32Dir)

    for (label <- Seq("nimble", "parquet1", "parquet32")) {
      val df = label match {
        case "nimble" => nb; case "parquet1" => li; case _ => pq32
      }
      println(s"$label partitions=${df.rdd.getNumPartitions}")
      fullScan(df); fullScan(df) // warm
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); fullScan(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-9s min=${times.min}%.4f med=${times.sorted.apply(iters / 2)}%.4f max=${times.max}%.4f")
    }
    spark.stop()
  }
}
