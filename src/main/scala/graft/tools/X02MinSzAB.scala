package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** In-JVM A/B that MEASURED AND REJECTED the r21 x02 "min-size fusion"
  * idea. `oldPairs` replicates the FUSED shape inline (Lmin folded into the
  * df-count aggregate — `min(sz)` riding `groupBy(s)`, hoping for exchange
  * reuse with the join-back); `newPairs` is the shipped `ngramJaccardPairs`
  * (Lmin from its own `docs.agg(min(sz))` corpus pass). Finding: column
  * pruning strips the folded min from the join-back branch, the two
  * aggregate subtrees canonicalize differently, exchange reuse never fires
  * (runtime AQE executed plan: Reused=0), and the "shared" pass re-runs the
  * whole explode+shuffle — warm A/B shipped 1.06 s vs fused 1.16 s at
  * sf0.1. The pair sets are asserted IDENTICAL (checksum over a, b, inter,
  * rounded jaccard), so the rejection is purely a performance verdict. */
object X02MinSzAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = ProbeEnv.cpus
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docsDf = graft.Tables.nimble(spark, sfDir, "documents")
    docsDf.count()
    val n = 3; val threshold = 0.8

    // the REJECTED fused shape: Lmin rides the df-count aggregate
    def oldPairs() = {
      graft.functions.ShingleHashes.register(spark)
      val docs = docsDf.select(col("doc_id").as("doc"),
          call_function("graft_shingle_hashes", col("text"), lit(n)).as("sh"))
        .withColumn("sz", size(col("sh")))
      val inv0 = docs.select(col("doc"), col("sz"), explode(col("sh")).as("s"))
      val dfCounts = inv0.groupBy("s").agg(count(lit(1)).as("df"), min("sz").as("msz"))
      val withDf = inv0.join(dfCounts.select(col("s"), col("df")), Seq("s"))
      val minSz = dfCounts.agg(min(col("msz")).as("lmin"))
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
      val buckets = ranked.groupBy("s")
        .agg(collect_list(struct(col("doc"), col("sz"), col("pos"))).as("ps"))
        .filter(size(col("ps")) >= 2)
      val candidates = buckets
        .select(explode(col("ps")).as("x"), col("ps"))
        .select(col("x"), explode(col("ps")).as("y"))
        .filter(col("x.doc") < col("y.doc"))
        .filter((lit(1) + least(col("x.sz") - col("x.pos") - 1, col("y.sz") - col("y.pos") - 1)) >=
          ceil(lit(threshold / (1 + threshold)) * (col("x.sz") + col("y.sz"))))
        .select(col("x.doc").as("a"), col("y.doc").as("b")).distinct()
      val sets = docs.select(col("doc"), col("sh"), col("sz"))
      candidates
        .join(sets.select(col("doc").as("a"), col("sh").as("sha"), col("sz").as("sza")), Seq("a"))
        .join(sets.select(col("doc").as("b"), col("sh").as("shb"), col("sz").as("szb")), Seq("b"))
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sza") + col("szb") - col("inter")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("a"), col("b"), col("inter"), col("jaccard"))
    }

    def newPairs() =
      Dedup.ngramJaccardPairs(docsDf, "doc_id", "text", n = n, threshold = threshold)

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.withColumn("h",
          xxhash64(col("a"), col("b"), col("inter"), round(col("jaccard"), 9)))
        .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    locally { // runtime (AQE-final) plan: does the df-count exchange get reused?
      val df = oldPairs() // the fused shape — the reuse hypothesis under test
      df.count()
      val ep = df.queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(ep).length
      println(s"executed-plan nodes: Exchange=${c("Exchange")} Reused=${c("ReusedExchange|ReusedQueryStage|reused")} scans=${c("BatchScan|Scan nimble")}")
    }
    val co = checksum(oldPairs()); val cn = checksum(newPairs())
    println(s"old pairs=$co new pairs=$cn identical=${co == cn}")
    require(co == cn, "pair sets differ!")

    def t(body: => Long): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    newPairs().count(); oldPairs().count() // warm both
    var i = 0
    while (i < passes) {
      val tn = t(newPairs().count())
      val to = t(oldPairs().count())
      println(f"pass $i fused=$to%.3f s shipped=$tn%.3f s")
      i += 1
    }
    spark.stop()
  }
}
