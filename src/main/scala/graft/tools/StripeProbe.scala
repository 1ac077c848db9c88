package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stripe/chunk geometry of a small struct-fixture write. */
object StripeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(60000).select(col("id"),
      struct(col("id").as("a"), concat(lit("v"), col("id")).as("b")).as("st"))
    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    df.coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite")
      .option("stripeBytes", "65536").option("rowsPerChunk", "2048").save(dir)
    val fs = graft.spark.NimbleSource.listFiles(dir)
    println(s"files=${fs.length}")
    for (f <- fs) {
      val ft = graft.spark.NimbleSource.footerOf(f)
      println(s"  $f stripes=${ft.stripes.length} rows=${ft.rowCount} keys=${ft.streamKeys.length}")
    }
    spark.stop()
  }
}
