package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10M-row scale smoke: bounded-memory write (multi-chunk, multi-stripe),
  * stripe-granular splits on read, pruned scans. Single-node stand-in for
  * the 100 TB shape — per-stripe behavior here is what each of 1000
  * executors would see. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-scale"

    val df = spark.range(rows).toDF("id")
      .withColumn("bucket", col("id") % 1000)
      .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double") / 1000.0)
      .withColumn("tag", concat(lit("tag_"), (col("id") % 97).cast("string")))
      .withColumn("payload", md5(col("id").cast("string")))

    val t0 = System.nanoTime()
    df.repartition(8).write.format("nimble").mode("overwrite").save(dir)
    val wSec = (System.nanoTime() - t0) / 1e9
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gft"))
    var stripes = 0
    var fileBytes = 0L
    for (f <- files) {
      stripes += graft.spark.NimbleSource.footerOf(f.getPath).stripes.length
      fileBytes += f.length()
    }
    println(f"write: $rows rows in $wSec%.1f s (${rows / wSec / 1e6}%.2f Mrows/s), " +
      f"${files.length} files, $stripes stripes, ${fileBytes / 1e6}%.1f MB on disk")

    val nb = spark.read.format("nimble").load(dir)
    println(s"scan partitions: ${nb.rdd.getNumPartitions}")
    val t1 = System.nanoTime()
    val cnt = nb.agg(count(lit(1)), sum("v")).collect()(0).getLong(0)
    println(f"full scan+agg: ${(System.nanoTime() - t1) / 1e9}%.2f s ($cnt rows)")
    val t2 = System.nanoTime()
    val k = nb.filter(col("bucket") === 7).agg(count(lit(1))).collect()(0).getLong(0)
    println(f"filtered scan: ${(System.nanoTime() - t2) / 1e9}%.2f s ($k rows)")
    assert(cnt == rows)
    spark.stop()
  }
}
