package graft

import org.apache.spark.sql.functions._

/** Pushed TopN (ORDER BY + LIMIT) over per-file-sorted tablets: the scan
  * plans only head/tail stripes per file (row-range skipping analog), gated
  * on the footer's declared sortColumns. Covers all four direction/null-
  * ordering combinations (the null-dependent two plan by file null counts),
  * multi-stripe tail skips, and every refusal path (undeclared sort,
  * pushed filters, misdeclared order). */
class TopNSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** 2 files x many small stripes, sorted by k ASC NULLS FIRST within each
    * file; k is null every 500th row; payload resists compression so
    * stripeBytes yields a predictable stripe fan-out. */
  private lazy val sortedDir: String = {
    val dir = tmpDir("topn_sorted")
    spark.range(40000)
      .selectExpr("CASE WHEN id % 500 = 0 THEN NULL ELSE id END AS k",
        "md5(CAST(id AS STRING)) AS s")
      .repartitionByRange(2, col("k"))
      .sortWithinPartitions("k")
      .write.format("nimble")
      .option("sortColumns", "k")
      .option("stripeBytes", "65536").option("rowsPerChunk", "1024")
      .mode("overwrite").save(dir)
    dir
  }

  private def nb = spark.read.format("nimble").load(sortedDir)
  private def totalStripes: Int =
    graft.spark.NimbleSource.listFiles(sortedDir)
      .map(f => graft.spark.NimbleSource.footerOf(f).stripes.length).sum

  test("ASC top-n pushes, reads only head stripes, nulls come first") {
    val q = nb.orderBy("k").limit(7)
    val p = plan(q)
    assert(p.contains("topN=[k ASC NULLS FIRST limit 7]"), s"topN not pushed:\n$p")
    val got = q.collect()
    // capture before any later full scan of the same path overwrites it
    val stats = graft.spark.NimbleSource.lastPlanStats(sortedDir).get
    // ASC NULLS FIRST: 80 nulls exist, so the top 7 rows are all null-keyed
    assert(got.length == 7)
    assert(got.forall(_.isNullAt(0)), "ASC NULLS FIRST top rows must be the nulls")
    // head-stripe pruning actually happened (2 files, n=7 rows each -> 1 head stripe per file)
    assert(stats.stripesPlanned == 2, s"expected 2 file-head plans: $stats")
    assert(stats.stripesPruned > 0 && stats.stripesPruned == totalStripes - 2,
      s"expected all non-head stripes pruned: $stats of $totalStripes")
  }

  test("ASC top-n values match a full sort once past the nulls") {
    val q = nb.orderBy("k").limit(200)
    val got = q.collect().map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    val exp = nb.collect().map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
      .sortBy(v => if (v == null) Long.MinValue else v.longValue()).take(200)
    assert(got.sameElements(exp), s"got ${got.take(10).mkString(",")}")
  }

  test("DESC NULLS LAST top-n pushes with a tail skip and matches truth") {
    val q = nb.orderBy(desc("k")).limit(5) // desc default = NULLS LAST
    val p = plan(q)
    assert(p.contains("topN=[k DESC NULLS LAST limit 5]"), s"topN not pushed:\n$p")
    val got = q.collect().map(_.getLong(0))
    // capture before the full truth scan overwrites the recorded plan
    val stats = graft.spark.NimbleSource.lastPlanStats(sortedDir).get
    val exp = nb.collect().filterNot(_.isNullAt(0)).map(_.getLong(0)).sorted.reverse.take(5)
    assert(got.sameElements(exp), s"got ${got.mkString(",")} exp ${exp.mkString(",")}")
    // n=5 is far smaller than the last stripe: the tail partition skips rows
    assert(stats.stripesPlanned == 2 && stats.stripesPruned == totalStripes - 2,
      s"expected one tail stripe per file: $stats of $totalStripes")
  }

  test("DESC tail skip spanning multiple stripes stays correct") {
    // n larger than one stripe's rows: tail partition chains 2+ stripes,
    // skip lands inside the first of them
    val n = 3000
    val q = nb.orderBy(desc("k")).limit(n)
    assert(plan(q).contains(s"topN=[k DESC NULLS LAST limit $n]"))
    val got = q.collect().map(_.getLong(0))
    val exp = nb.collect().filterNot(_.isNullAt(0)).map(_.getLong(0)).sorted.reverse.take(n)
    assert(got.sameElements(exp))
  }

  test("ASC NULLS LAST pushes via file null counts and matches truth") {
    val q = nb.orderBy(asc_nulls_last("k")).limit(5)
    val p = plan(q)
    assert(p.contains("topN=[k ASC NULLS LAST limit 5]"), s"topN not pushed:\n$p")
    val got = q.collect().map(_.getLong(0))
    // still head-run planning: nulls (file head) + the 5 smallest non-nulls
    val stats = graft.spark.NimbleSource.lastPlanStats(sortedDir).get
    assert(stats.stripesPruned > 0, s"expected stripe pruning: $stats of $totalStripes")
    val expNl = nb.collect().filterNot(_.isNullAt(0)).map(_.getLong(0)).sorted.take(5)
    assert(got.sameElements(expNl), s"got ${got.mkString(",")}")
  }

  test("DESC NULLS FIRST pushes (null head + value tail) and matches truth") {
    // 80 nulls exist; n=100 needs the 80 nulls AND the 20 largest values —
    // exercising BOTH the head (nulls) and tail (values) runs per file
    val q = nb.orderBy(desc_nulls_first("k")).limit(100)
    val p = plan(q)
    assert(p.contains("topN=[k DESC NULLS FIRST limit 100]"), s"topN not pushed:\n$p")
    val got = q.collect().map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    val stats = graft.spark.NimbleSource.lastPlanStats(sortedDir).get
    assert(stats.stripesPruned > 0, s"expected stripe pruning: $stats of $totalStripes")
    assert(got.count(_ == null) == 80, "all 80 nulls lead under DESC NULLS FIRST")
    val expVals = nb.collect().filterNot(_.isNullAt(0)).map(_.getLong(0))
      .sorted.reverse.take(20)
    assert(got.drop(80).map(_.longValue()).sameElements(expVals))
  }

  test("pushed filter refuses TopN (top-n of a filtered set is not the physical head)") {
    val q = nb.filter(col("k") > 1000).orderBy("k").limit(5)
    val p = plan(q)
    assert(!p.contains("topN="), s"filter + topN must not push:\n$p")
    val got = q.collect().map(_.getLong(0))
    assert(got.sameElements(Array(1001L, 1002L, 1003L, 1004L, 1005L)))
  }

  test("undeclared sort refuses the pushdown") {
    val dir = tmpDir("topn_unsorted")
    spark.range(1000).selectExpr("id AS k", "md5(CAST(id AS STRING)) AS s")
      .coalesce(1).sortWithinPartitions("k")
      .write.format("nimble").mode("overwrite").save(dir) // no sortColumns declared
    val q = spark.read.format("nimble").load(dir).orderBy("k").limit(3)
    assert(!plan(q).contains("topN="))
    assert(q.collect().map(_.getLong(0)).sameElements(Array(0L, 1L, 2L)))
  }

  test("misdeclared sort order is fenced by stripe-stats monotonicity") {
    val dir = tmpDir("topn_misdeclared")
    // a FOREIGN writer's file falsely declaring sortColumns over shuffled
    // data (the Spark write path can no longer produce this — its
    // requiredOrdering sorts the rows — so forge it with the Tablet API:
    // stripe [min,max] ranges overlap and the fence must refuse)
    locally {
      import graft.format.{Tablet, LongsCol, PhysType}
      val schemaJson = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))).json
      val w = new Tablet.Writer(s"$dir/forged.gft", schemaJson, Array("k"),
        sortColumns = Seq("k"))
      val rnd = new scala.util.Random(7)
      for (_ <- 0 until 4) { // 4 stripes of shuffled keys: ranges overlap
        w.writeChunk(0, LongsCol(Array.fill(1024)(rnd.nextLong() % 100000L), PhysType.I64))
        w.addRows(1024L)
        w.flushStripe()
      }
      w.close()
    }
    val df = spark.read.format("nimble").load(dir)
    val q = df.orderBy("k").limit(3)
    assert(!plan(q).contains("topN="), "stats contradict the declaration; must refuse")
    val got = q.collect().map(_.getLong(0))
    val exp = df.collect().map(_.getLong(0)).sorted.take(3)
    assert(got.sameElements(exp))
  }

  test("DESC tail skip fetches sparse: only post-skip chunk ranges load") {
    // one fat single-stripe file: the tail partition's skipRows resolves to
    // whole leading chunks straight from the v13 directory row counts, so
    // the fetch drops them — the r14 gate (sparse OFF whenever skipRows>0)
    // is lifted by the directory (VERDICT r14 #7)
    val dir = tmpDir("topn_sparse")
    spark.range(60000).toDF("k")
      .withColumn("payload", org.apache.spark.sql.functions.expr(
        "concat(md5(cast(k as string)), md5(cast(k+1 as string)))"))
      .coalesce(1).write.format("nimble")
      .option("sortColumns", "k").option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val t = spark.read.format("nimble").load(dir)

    graft.spark.BlockCache.clear()
    val full0 = graft.spark.NimbleSource.streamBytesFetched.get()
    assert(t.select("payload").collect().length == 60000)
    val fullBytes = graft.spark.NimbleSource.streamBytesFetched.get() - full0

    val q = t.orderBy(desc("k")).limit(20).select("k", "payload")
    assert(plan(q).contains("topN=[k DESC NULLS LAST limit 20]"), plan(q))
    graft.spark.BlockCache.clear()
    val probe0 = graft.spark.NimbleSource.streamBytesFetched.get()
    val got = q.collect().map(_.getLong(0))
    val probeBytes = graft.spark.NimbleSource.streamBytesFetched.get() - probe0
    assert(got.sameElements((59980L until 60000L).reverse))
    // ~30 chunks/stream, the tail needs the last one: byte counts must be
    // candidate ranges, not whole streams
    assert(probeBytes > 0)
    assert(probeBytes < fullBytes / 8,
      s"tail fetched $probeBytes of $fullBytes full-scan bytes — TopN skip did not go sparse")
  }

  test("sorted lineitem table pushes TopN end-to-end vs parquet truth") {
    val q = Tables.nimble(spark, sf(), "lineitem")
      .orderBy(desc("l_orderkey")).limit(10).select("l_orderkey")
    assert(plan(q).contains("topN=[l_orderkey DESC NULLS LAST limit 10]"), plan(q))
    val got = q.collect().map(_.getLong(0))
    val exp = Tables.parquet(spark, sf(), "lineitem")
      .orderBy(desc("l_orderkey")).limit(10).select("l_orderkey").collect().map(_.getLong(0))
    assert(got.sameElements(exp))
  }
}
