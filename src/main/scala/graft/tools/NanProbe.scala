package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NanProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("sql literal: " + spark.sql("SELECT double('NaN') = double('NaN')").collect()(0))
    val df = spark.sql("SELECT CASE WHEN id = 1 THEN double('NaN') ELSE double(id) END AS d FROM range(4)")
    println("filter === NaN count: " + df.filter(col("d") === lit(Double.NaN)).count())
    println("filter <=> NaN count: " + df.filter(col("d") <=> lit(Double.NaN)).count())
    println("filter > 1e9 count: " + df.filter(col("d") > 1e9).count())
    df.filter(col("d") === lit(Double.NaN)).explain(false)
    // runtime-only: materialize to parquet so nothing constant-folds
    val dir = java.nio.file.Files.createTempDirectory("nanprobe").toString
    df.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    println("parquet === NaN count: " + pq.filter(col("d") === lit(Double.NaN)).count())
    println("parquet > 1e9 count: " + pq.filter(col("d") > 1e9).count())
    val cached = df.cache(); cached.count()
    println("cached === NaN count: " + cached.filter(col("d") === lit(Double.NaN)).count())
    spark.stop()
  }
}
