package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway stage profiler for the x02 near-dup pipeline. */
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
    val docs = docsDf.select(col("doc_id").as("doc"),
        array_distinct(transform(Dedup.shingles(col("text"), n), s => xxhash64(s))).as("sh"))
      .withColumn("sz", size(col("sh")))

    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      time("shingle+hash only")(docs.agg(sum("sz")).collect())
      val inv0 = docs.select(col("doc"), col("sz"), explode(col("sh")).as("s"))
      time("inv0 explode")(inv0.count())
      val dfTab = inv0.groupBy("s").agg(count(lit(1)).as("df"))
      time("dfTab groupBy")(dfTab.count())
      val minSz = docs.agg(min(col("sz")).as("lmin"))
      val ranked = inv0.join(dfTab, Seq("s"))
        .groupBy("doc", "sz")
        .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ordered"))
        .crossJoin(broadcast(minSz))
        .withColumn("omin",
          ceil(lit(threshold / (1 + threshold)) *
            (col("sz") + greatest(col("lmin"), ceil(lit(threshold) * col("sz"))))))
        .withColumn("plen", greatest(col("sz") - col("omin") + 1, lit(1)).cast("int"))
        .select(col("doc"), col("sz"),
          posexplode(slice(col("ordered"), lit(1), col("plen"))).as(Seq("pos", "p")))
        .select(col("doc"), col("sz"), col("pos"), col("p.s").as("s"), col("p.df").as("df"))
      time("ranked prefix")(ranked.count())
      val a = ranked.select(col("s"), col("doc").as("a"), col("sz").as("sza"), col("pos").as("pa"))
      val b = ranked.select(col("s"), col("doc").as("b"), col("sz").as("szb"), col("pos").as("pb"))
      val candidates = a.join(b, Seq("s"))
        .filter(col("a") < col("b"))
        .filter((lit(1) + least(col("sza") - col("pa") - 1, col("szb") - col("pb") - 1)) >=
          ceil(lit(threshold / (1 + threshold)) * (col("sza") + col("szb"))))
        .select("a", "b").distinct()
      time("candidates join")(candidates.count())
      val full = time("full pipeline")(
        Dedup.ngramJaccardPairs(docsDf, "doc_id", "text", n = 3, threshold = 0.8).count())
      println(s"pairs=$full")
    }
    spark.stop()
  }
}
