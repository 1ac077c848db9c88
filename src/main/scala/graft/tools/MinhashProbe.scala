package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level A/B of the minhash signature build (old crossJoin+two-agg
  * shape vs the r21 single-agg column-wise shape) in one JVM, so bursty
  * co-tenant load hits both sides alike. */
object MinhashProbe {
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
    def time(name: String)(body: => Any): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-24s $s%.3f s")
      s
    }
    val numPerms = 32; val bands = 32; val rows = numPerms / bands
    val p = 4294967311L
    val perms = (0 until numPerms).map(j => (j, 2L * j + 1L, (j * 12582917L + 3L) % p))
    graft.functions.ShingleHashes.register(spark)
    val df = graft.Tables.nimble(spark, sfDir, "documents")
    val docs = df.select(col("doc_id").as("doc"),
      call_function("graft_shingle_hashes", col("text"), lit(3)).as("sh"))
    val ids = docs.select(col("doc"), explode(col("sh")).as("s"))
      .withColumn("h", col("s").bitwiseAND(lit(0xffffffffL)))
    val permDf = spark.createDataFrame(perms).toDF("j", "pa", "pb")

    def oldSigs = {
      val mh = ids.crossJoin(broadcast(permDf))
        .groupBy("doc", "j")
        .agg(min((col("pa") * col("h") + col("pb")) % p).as("mh"))
        .withColumn("band", (col("j") / rows).cast("int"))
      mh.groupBy("doc", "band")
        .agg(concat_ws(",", sort_array(collect_list(concat_ws(":", col("j"), col("mh"))))).as("sig"))
    }
    def newMh = {
      val mhCols = perms.map { case (j, pa, pb) =>
        min((lit(pa) * col("h") + lit(pb)) % p).as(s"mh$j") }
      ids.groupBy("doc").agg(mhCols.head, mhCols.tail: _*)
    }
    def newSigs = {
      val sigOf = (b: Int) => concat_ws(",", sort_array(array(
        (b * rows until (b + 1) * rows).map(j =>
          concat_ws(":", lit(j), col(s"mh$j"))): _*)))
      newMh.select(col("doc"), explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), sigOf(b).as("sig"))): _*)).as("bs"))
        .select(col("bs.band").as("band"), col("bs.sig").as("sig"), col("doc"))
    }
    def candCount(sigs: org.apache.spark.sql.DataFrame): Long = {
      val l = sigs.select(col("band"), col("sig"), col("doc").as("a"))
      val r = sigs.select(col("band"), col("sig"), col("doc").as("b"))
      l.join(r, Seq("band", "sig")).filter(col("a") < col("b"))
        .select("a", "b").distinct().count()
    }
    def bucketCands = {
      val sigs = newSigs
      sigs.groupBy("band", "sig")
        .agg(collect_list(col("doc")).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(col("ds")).as("a"), col("ds"))
        .select(col("a"), explode(col("ds")).as("b"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
    }
    val sets = docs.select(col("doc"), col("sh"))
    def verifyTwoJoin(c: org.apache.spark.sql.DataFrame): Long =
      c.join(sets.withColumnRenamed("doc", "a").withColumnRenamed("sh", "sha"), Seq("a"))
        .join(sets.withColumnRenamed("doc", "b").withColumnRenamed("sh", "shb"), Seq("b"))
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .filter(col("inter") > 0).count()
    def verifyOneJoin(c: org.apache.spark.sql.DataFrame, hint: Boolean): Long = {
      val cv0 = c.select(col("a"), col("b"),
        explode(array(col("a"), col("b"))).as("doc"))
      val cv = if (hint) broadcast(cv0) else cv0
      cv.join(sets, Seq("doc"))
        .groupBy("a", "b")
        .agg(max(when(col("doc") === col("a"), col("sh"))).as("sha"),
          max(when(col("doc") === col("b"), col("sh"))).as("shb"))
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .filter(col("inter") > 0).count()
    }
    // warm
    ids.agg(count(lit(1))).collect()
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      time("bucket cands")(bucketCands.count())
      time("verify two-join")(verifyTwoJoin(bucketCands))
      time("verify one-join")(verifyOneJoin(bucketCands, hint = false))
      time("verify one-join hint")(verifyOneJoin(bucketCands, hint = true))
    }
    spark.stop()
  }
}
