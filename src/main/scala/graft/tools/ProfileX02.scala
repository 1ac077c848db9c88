package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage profiler for the x02 near-dup pipeline (r21: timed against the
  * CURRENT ngramJaccardPairs shape — shingle hash, inverted index, df
  * counts, window-ranked PPJoin prefix, candidate join, exact verify). */
object ProfileX02 {
  private def time[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

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

    val docsDf = graft.Tables.nimble(spark, sfDir, "documents")
    docsDf.count() // warm the conversion

    val n = 3; val threshold = 0.8
    graft.functions.ShingleHashes.register(spark)
    val docs = docsDf.select(col("doc_id").as("doc"),
        call_function("graft_shingle_hashes", col("text"), lit(n)).as("sh"))
      .withColumn("sz", size(col("sh")))

    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      time("shingle+hash only")(docs.agg(sum("sz")).collect())
      val inv0 = docs.select(col("doc"), col("sz"), explode(col("sh")).as("s"))
      time("inv0 explode")(inv0.agg(count(lit(1))).collect())
      val dfCounts = inv0.groupBy("s").agg(count(lit(1)).as("df"))
      time("dfCounts groupBy")(dfCounts.agg(count(lit(1))).collect())
      val withDf = inv0.join(dfCounts, Seq("s"))
      time("withDf join")(withDf.agg(count(lit(1))).collect())
      val minSz = docs.agg(min(col("sz")).as("lmin"))
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy("doc").orderBy(col("df"), col("s"))
      val ranked = withDf
        .withColumn("pos", row_number().over(byRarity) - 1)
        .crossJoin(broadcast(minSz))
        .withColumn("omin",
          ceil(lit(threshold / (1 + threshold)) *
            (col("sz") + greatest(col("lmin"), ceil(lit(threshold) * col("sz"))))))
        .withColumn("plen", greatest(col("sz") - col("omin") + 1, lit(1)).cast("int"))
        .filter(col("pos") < col("plen"))
        .select(col("doc"), col("sz"), col("pos"), col("s"), col("df"))
      time("ranked prefix (window)")(ranked.agg(count(lit(1))).collect())
      val a = ranked.select(col("s"), col("doc").as("a"), col("sz").as("sza"), col("pos").as("pa"))
      val b = ranked.select(col("s"), col("doc").as("b"), col("sz").as("szb"), col("pos").as("pb"))
      val candidates = a.join(b, Seq("s"))
        .filter(col("a") < col("b"))
        .filter((lit(1) + least(col("sza") - col("pa") - 1, col("szb") - col("pb") - 1)) >=
          ceil(lit(threshold / (1 + threshold)) * (col("sza") + col("szb"))))
        .select("a", "b").distinct()
      time("candidates join")(candidates.agg(count(lit(1))).collect())
      val buckets = ranked.groupBy("s")
        .agg(collect_list(struct(col("doc"), col("sz"), col("pos"))).as("ps"))
        .filter(size(col("ps")) >= 2)
      val candB = buckets
        .select(explode(col("ps")).as("x"), col("ps"))
        .select(col("x"), explode(col("ps")).as("y"))
        .filter(col("x.doc") < col("y.doc"))
        .filter((lit(1) + least(col("x.sz") - col("x.pos") - 1, col("y.sz") - col("y.pos") - 1)) >=
          ceil(lit(threshold / (1 + threshold)) * (col("x.sz") + col("y.sz"))))
        .select(col("x.doc").as("a"), col("y.doc").as("b")).distinct()
      time("candidates bucket")(candB.agg(count(lit(1))).collect())
      val full = time("full pipeline")(
        Dedup.ngramJaccardPairs(docsDf, "doc_id", "text", n = 3, threshold = 0.8).count())
      println(s"pairs=$full")
    }
    spark.stop()
  }
}
