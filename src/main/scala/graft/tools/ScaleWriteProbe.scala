package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated repro of the bench's scale-block write (8M scrambled string keys
  * + composite value columns) to separate real write-path regressions from
  * co-tenant load in the full bench run: times the indexed and unindexed
  * writes twice each (first = JIT warmup). */
object ScaleWriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaleDf = spark.range(8000000L).toDF("id")
      .withColumn("skey", md5(concat(lit("k"), col("id").cast("string"))))
      .withColumn("v", (col("id") * 2654435761L % 1000003).cast("double"))
      .repartition(4).cache()
    scaleDf.count()
    val tmp = System.getProperty("java.io.tmpdir")
    for (round <- 1 to 2; idx <- Seq("index", "bloom", "both", "none")) {
      val t0 = System.nanoTime()
      val w = scaleDf.write.format("nimble").option("rowsPerChunk", "16384")
      val w2 = idx match { case "index" => w.option("indexColumns", "skey"); case "bloom" => w.option("bloomFilterColumns", "skey"); case "both" => w.option("indexColumns", "skey").option("bloomFilterColumns", "skey"); case _ => w }
      w2.mode("overwrite").save(s"$tmp/swp-$idx")
      println(f"round=$round idx=$idx ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
