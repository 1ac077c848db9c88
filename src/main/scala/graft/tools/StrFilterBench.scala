package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench for low-cardinality string predicates (the q04 shape) — the
  * workload dictionary-preserving filter evaluation targets: predicates on
  * DICT-coded columns should cost alphabet-size compares per chunk, not
  * row-count compares. */
object StrFilterBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-bench/lineitem-strbench"
    li.repartition(cpus.toInt).write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    def timeMedian(label: String)(body: => Long): Unit = {
      body; body // warm
      val ts = Array.fill(7) {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      java.util.Arrays.sort(ts)
      println(f"$label%-28s ${ts(3)}%8.1f ms (median of 7)")
    }

    timeMedian("str_eq (returnflag=A)") {
      nb.filter(col("l_returnflag") === "A").agg(count(lit(1))).collect()(0).getLong(0)
    }
    timeMedian("str_in (returnflag 2-of-3)") {
      nb.filter(col("l_returnflag").isin("A", "R"))
        .agg(count(lit(1))).collect()(0).getLong(0)
    }
    timeMedian("str_and_proj (q04 shape)") {
      nb.filter(col("l_returnflag") === "N" && col("l_linestatus") === "O")
        .select("l_orderkey", "l_linestatus").agg(count(lit(1))).collect()(0).getLong(0)
    }
    spark.stop()
  }
}
