package graft

import org.apache.spark.sql.functions._

/** Footer-stats aggregate pushdown (SURVEY.md §2.3 aggregation hook, §2.6):
  * results must equal full-scan answers; the plan must show the stats scan. */
class AggPushdownSpec extends SparkTestBase {

  test("count/min/max answered from footer stats match full computation") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("aggpd")
    pq.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    val agg = nb.agg(
      count(lit(1)).as("cnt"),
      min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"),
      min("l_quantity").as("min_q"),
      min("l_returnflag").as("min_rf"), max("l_returnflag").as("max_rf"))
    val expected = pq.agg(
      count(lit(1)), min("l_orderkey"), max("l_orderkey"),
      min("l_quantity"), min("l_returnflag"), max("l_returnflag")).collect()(0)
    val got = agg.collect()(0)
    assert(got.toSeq == expected.toSeq, s"$got vs $expected")
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"aggregate not pushed (expected LocalTableScan from the stats LocalScan):\n$plan")
  }

  test("max(double) with NaN degrades to the mid-scan fold; all-null column answered null") {
    import spark.implicits._
    val df = Seq((1L, Double.NaN, null: java.lang.Long), (2L, 1.5, null: java.lang.Long)).toDF("id", "d", "n")
    val dir = tmpDir("aggnan")
    df.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    // max(d) must be NaN (Spark sorts NaN greatest) — footer stats can't
    // answer exactly, so the UNFILTERED pushdown folds decoded values
    // mid-scan instead of falling back to a materializing scan
    val dec0 = graft.spark.AggScan.aggChunksDecoded.get()
    val r = nb.agg(max("d"), min("d"), max("n")).collect()(0)
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1) == 1.5)
    assert(r.isNullAt(2))
    assert(graft.spark.AggScan.aggChunksDecoded.get() > dec0,
      "stats-refused unfiltered aggregate must take the mid-scan fold")
  }

  test("filtered aggregate with mixed stripes aggregates during the scan (ValueHook)") {
    val pq = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val dir = tmpDir("aggfil")
    pq.write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    // l_quantity is uniform within stripes: no stripe is all-match, so every
    // surviving stripe runs the mid-scan accumulator path
    val dec0 = graft.spark.AggScan.aggChunksDecoded.get()
    val agg = nb.filter(col("l_quantity") > 45)
      .agg(count(lit(1)).as("cnt"), min("l_orderkey").as("mn"),
        max("l_extendedprice").as("mx"), min("l_returnflag").as("mc"))
    val exp = pq.filter(col("l_quantity") > 45)
      .agg(count(lit(1)), min("l_orderkey"), max("l_extendedprice"), min("l_returnflag")).collect()(0)
    assert(agg.collect()(0).toSeq == exp.toSeq)
    assert(graft.spark.AggScan.aggChunksDecoded.get() > dec0,
      "mixed stripes must flow through the mid-scan agg reader")
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"mixed stripes are not a stats-only answer:\n$plan")
    // the mid-scan agg scan surfaces its skipped-decode counters in the UI
    // (descend into AQE query stages — collect() does not traverse them)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Some(b)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => findScan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScan(q.plan)
      case other => other.children.iterator.flatMap(findScan).nextOption()
    }
    val scan = findScan(agg.queryExecution.executedPlan).get
    assert(scan.metrics.contains("aggChunksDecoded"), scan.metrics.keys.mkString(","))
    assert(scan.metrics("aggChunksDecoded").value > 0)
    for (m <- scan.scan.supportedCustomMetrics())
      assert(m.getClass.getDeclaredConstructor().newInstance().name() == m.name())
  }

  test("mid-scan agg: interior chunks answer from chunk stats, boundaries decode, outside skips") {
    // one file, ascending id, 4096-row chunks: a range filter cut mid-chunk
    // classifies interior chunks all-match (fold stats, zero decode),
    // boundary chunks decode+select, outside chunks skip entirely
    val dir = tmpDir("aggvh")
    spark.range(40960).select(col("id"),
        (col("id") % 7).cast("double").as("d"),
        concat(lit("s"), lpad(col("id").cast("string"), 8, "0")).as("s"))
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "4096")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val statsC0 = graft.spark.AggScan.aggChunksStatsAnswered.get()
    val decC0 = graft.spark.AggScan.aggChunksDecoded.get()
    val skip0 = graft.spark.NimbleSource.chunksSkipped.get()
    val r = nb.filter(col("id") >= 6000L && col("id") < 30000L)
      .agg(count(lit(1)).as("cnt"), count("d").as("cd"), min("id").as("mn"),
        max("id").as("mx"), max("d").as("md"), min("s").as("ms"), max("s").as("mxs"))
      .collect()(0)
    assert(r.toSeq == Seq(24000L, 24000L, 6000L, 29999L, 6.0, "s00006000", "s00029999"),
      s"got $r")
    val statsAnswered = graft.spark.AggScan.aggChunksStatsAnswered.get() - statsC0
    val decoded = graft.spark.AggScan.aggChunksDecoded.get() - decC0
    val skipped = graft.spark.NimbleSource.chunksSkipped.get() - skip0
    // 10 chunks total: [6000,30000) covers chunks 1..7 fully (all-match),
    // cuts chunk 1(6000..8191) and 7(28672..29999)... boundaries decode,
    // interiors fold from stats, chunks 0,8,9 skip
    assert(statsAnswered >= 4, s"interior chunks must answer from stats: $statsAnswered")
    assert(decoded <= 3, s"only boundary chunks may decode: $decoded")
    assert(skipped >= 2, s"outside chunks must skip: $skipped")
  }

  test("mid-scan agg: a zero-survivor non-prunable chunk between surviving chunks stays aligned") {
    // chunk A has survivors, chunk B brackets the equality value with zero
    // matches (stats cannot prune it), chunk C has survivors again. The
    // aggregate column must not fall a chunk behind after B (r9 regression:
    // readChunkDiscard consumed the stale pending instead of skipping)
    val dir = tmpDir("aggdesync")
    spark.range(3000).selectExpr(
        "id",
        """CASE WHEN id < 1000 THEN (CASE WHEN id % 10 = 0 THEN 5 ELSE 1 END)
                WHEN id < 2000 THEN (CASE WHEN id % 2 = 0 THEN 4 ELSE 6 END)
                ELSE (CASE WHEN id % 10 = 0 THEN 5 ELSE 9 END) END AS v""",
        "id * 10 AS w")
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "1000")
      .mode("overwrite").save(dir)
    val r = spark.read.format("nimble").load(dir).filter(col("v") === 5L)
      .agg(count(lit(1)).as("cnt"), min("w").as("mn"), max("w").as("mx")).collect()(0)
    // survivors: ids 0,10,..,990 and 2000,2010,..,2990 (100 + 100)
    assert(r.toSeq == Seq(200L, 0L, 29900L), s"got $r")
  }

  test("mid-scan agg: NaN max and all-null columns stay exact on mixed/degraded stripes") {
    import spark.implicits._
    // id filter is all-match for the whole (single-stripe) file, but
    // max(d) cannot answer from stats (NaN possible) -> the stripe DEGRADES
    // to the decode path and folds the exact NaN; n is all-null
    val df = Seq((1L, Double.NaN, null: java.lang.Long), (2L, 1.5, null: java.lang.Long),
      (3L, -7.25, null: java.lang.Long)).toDF("id", "d", "n")
    val dir = tmpDir("aggvhnan")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val dec0 = graft.spark.AggScan.aggChunksDecoded.get()
    val r = nb.filter(col("id") >= 1L)
      .agg(max("d"), min("d"), max("n"), count("n"), count(lit(1))).collect()(0)
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1) == -7.25)
    assert(r.isNullAt(2) && r.getLong(3) == 0L && r.getLong(4) == 3L)
    assert(graft.spark.AggScan.aggChunksDecoded.get() > dec0,
      "NaN-poisoned stats must degrade to the decode fold")
  }

  test("filtered count/min/max answered from stats when stripes align (ValueHook-lite)") {
    // four files with disjoint id ranges [0,10k) ... [30k,40k): a boundary-
    // aligned filter classifies every stripe all-match or none-match and the
    // aggregate stays O(metadata)
    val base = spark.range(40000).select(
      col("id"),
      when(col("id") % 10 =!= 0, col("id") % 997).as("v"),
      when(col("id") < 20000, lit("A")).otherwise(lit("B")).as("letter"))
    val dir = tmpDir("aggfilpd")
    for (b <- 0 until 4)
      base.filter(col("id") >= b * 10000L && col("id") < (b + 1) * 10000L)
        .coalesce(1).write.format("nimble")
        .mode(if (b == 0) "overwrite" else "append").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    val agg = nb.filter(col("id") >= 20000L)
      .agg(count(lit(1)).as("cnt"), count("v").as("cnt_v"),
        min("v").as("min_v"), max("id").as("max_id"), min("letter").as("min_l"))
    val expected = base.filter(col("id") >= 20000L)
      .agg(count(lit(1)), count("v"), min("v"), max("id"), min("letter")).collect()(0)
    assert(agg.collect()(0).toSeq == expected.toSeq)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"aligned filtered aggregate not answered from stats:\n$plan")

    // equality on a per-file-constant string column pushes too
    val aggEq = nb.filter(col("letter") === "B").agg(count(lit(1)), max("id"))
    val expEq = base.filter(col("letter") === "B").agg(count(lit(1)), max("id")).collect()(0)
    assert(aggEq.collect()(0).toSeq == expEq.toSeq)
    assert(aggEq.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // an unaligned filter has one mixed stripe: its partial folds during the
    // scan while the aligned files still answer from stats — correct either way
    val aggMix = nb.filter(col("id") >= 15000L).agg(count(lit(1)), min("v"))
    val expMix = base.filter(col("id") >= 15000L).agg(count(lit(1)), min("v")).collect()(0)
    assert(aggMix.collect()(0).toSeq == expMix.toSeq)
    assert(!aggMix.queryExecution.executedPlan.toString.contains("LocalTableScan"))

    // none-match everywhere: zero count, null min, still O(metadata)
    val aggNone = nb.filter(col("id") < 0L).agg(count(lit(1)), min("v"))
    val r = aggNone.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
    assert(aggNone.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("nested struct-leaf aggregates push down: stats answer, decode fold, null semantics") {
    // struct leaves are row-aligned (children pad under null ancestors), so
    // min/max/count/sum on st.* answer from the leaf stream exactly like a
    // top-level column — including rows where st itself is null
    val df = spark.sql("""
      SELECT id,
        CASE WHEN id % 10 = 9 THEN CAST(NULL AS STRUCT<a: BIGINT, q: DOUBLE>)
             WHEN id % 10 = 8 THEN named_struct('a', CAST(NULL AS BIGINT), 'q', CAST(id AS DOUBLE))
             ELSE named_struct('a', id * 3, 'q', CAST(id AS DOUBLE) / 2)
        END AS st
      FROM range(50000)""")
    val dir = tmpDir("aggnested")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    // unfiltered: O(metadata) LocalScan from footer stats
    val agg = nb.agg(count(col("st.a")).as("cnt"), min(col("st.a")).as("mn"),
      max(col("st.a")).as("mx"), max(col("st.q")).as("mq"))
    val exp = df.agg(count(col("st.a")), min(col("st.a")), max(col("st.a")),
      max(col("st.q"))).collect()(0)
    assert(agg.collect()(0).toSeq == exp.toSeq)
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      s"nested stats agg must plan the LocalScan:\n${agg.queryExecution.executedPlan}")

    // sum(st.a): decode fold (stats carry no sums) with the overflow bound
    val sumAgg = nb.agg(sum(col("st.a")).as("s"), avg(col("st.q")).as("m"))
    val sumExp = df.agg(sum(col("st.a")), avg(col("st.q"))).collect()(0)
    assert(sumAgg.collect()(0).toSeq == sumExp.toSeq)

    // filtered by a top-level pushed predicate: the mid-scan fold decodes
    // the nested leaf through its row-aligned stream
    val fAgg = nb.filter(col("id") % 100L < 50L)
      .agg(count(col("st.a")).as("cnt"), min(col("st.a")).as("mn"), max(col("st.q")).as("mx"))
    val fExp = df.filter(col("id") % 100L < 50L)
      .agg(count(col("st.a")), min(col("st.a")), max(col("st.q"))).collect()(0)
    assert(fAgg.collect()(0).toSeq == fExp.toSeq)

    // GROUP BY a nested string leaf rides the grouped mid-scan fold
    val gdf = spark.range(20000).select(col("id"),
      struct(concat(lit("g"), (col("id") % 5).cast("string")).as("g"),
        col("id").as("v")).as("st"))
    val gdir = tmpDir("aggnestedgrp")
    gdf.coalesce(1).write.format("nimble").mode("overwrite").save(gdir)
    val gnb = spark.read.format("nimble").load(gdir)
    val gAgg = gnb.groupBy(col("st.g")).agg(count(lit(1)).as("cnt"), max(col("st.v")).as("mx"))
    val gExp = gdf.groupBy(col("st.g")).agg(count(lit(1)), max(col("st.v")))
      .collect().map(_.toSeq.toList).sortBy(_.toString()).toList
    assert(gAgg.collect().map(_.toSeq.toList).sortBy(_.toString()).toList == gExp)

    // array paths refuse (not row-aligned): falls back to a normal scan
    val arr = spark.range(100).select(col("id"), array(col("id")).as("ar"))
    val adir = tmpDir("aggarr")
    arr.write.format("nimble").mode("overwrite").save(adir)
    val anb = spark.read.format("nimble").load(adir)
    val aAgg = anb.agg(min(element_at(col("ar"), 1)))
    assert(aAgg.collect()(0).getLong(0) == 0L)
    assert(!aAgg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }
}
