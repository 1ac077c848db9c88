package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions: the plans must be the ones we want at 100 TB —
  * pushdown reaching the scan, columnar batches feeding codegen, broadcast
  * joins for small dims, stats-aggregates skipping data entirely. */
class PlanSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters and projection reach the nimble scan node") {
    val p = plan(SparkEntry.queries("q03_filter_num")(spark, sf()))
    assert(p.contains("nimble"), p)
    assert(p.contains("GreaterThan(l_quantity"), s"filter not pushed:\n$p")
    val p2 = plan(SparkEntry.queries("q02_projection")(spark, sf()))
    assert(!p2.contains("l_extendedprice"), s"projection leaked columns:\n$p2")
  }

  test("scan is columnar (batches feed whole-stage codegen)") {
    val p = plan(SparkEntry.queries("q01_scan_full")(spark, sf()))
    assert(p.contains("ColumnarToRow") || p.contains("WholeStageCodegen"), p)
  }

  test("join of orders with customer broadcasts the small side") {
    val p = plan(SparkEntry.queries("q15_join_agg")(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("stats aggregate produces the metadata-only scan") {
    val dir = Tables.nimbleDir(spark, sf(), "lineitem")
    val nb = spark.read.format("nimble").load(dir)
    val p = plan(nb.agg(count(lit(1)), min("l_orderkey")))
    assert(p.contains("LocalTableScan"), s"aggregate not answered from stats (expected LocalTableScan):\n$p")
  }

  test("limit lands in the scan description") {
    val dir = Tables.nimbleDir(spark, sf(), "lineitem")
    val nb = spark.read.format("nimble").load(dir)
    val p = plan(nb.limit(42))
    assert(p.contains("limit=42"), s"limit not pushed:\n$p")
  }

  test("small files bin-pack into few scan tasks; a big table still fans out") {
    import spark.implicits._
    val dir = tmpDir("binpack")
    // 24 tiny files — must NOT cost 24 tasks
    spark.range(24000).toDF("id").repartition(24)
      .write.format("nimble").mode("overwrite").save(dir)
    val parts = spark.read.format("nimble").load(dir).rdd.getNumPartitions
    assert(parts <= 4, s"24 tiny files should share tasks, got $parts partitions")
    val stats = graft.spark.NimbleSource.lastPlanStats(dir).get
    assert(stats.stripesPlanned == 24, s"all stripes planned: $stats")
  }

  test("driver entry smoke: flagship query returns rows at sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
  }

  test("pair operators never plan a cartesian (x13/x15 regression guard)") {
    // The bucketed/banded forms exist precisely so no task ever sees the
    // all-pairs space; one refactor to a theta-join and Spark silently plans
    // CartesianProduct/BroadcastNestedLoopJoin, which dies at 100 TB.
    for (name <- Seq("x13_embed_neardup", "x15_simhash_pairs")) {
      val p = plan(SparkEntry.queries(name)(spark, sf()))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested-loop join:\n$p")
    }
  }

  test("x02 document frequency aggregates partially; no window over the inverted index") {
    // df must come from groupBy(s).count() (map-side combine + AQE-splittable
    // join-back); a count().over(Window.partitionBy(s)) pins a corpus-hot
    // shingle's entire posting list on one reducer at 100 TB. The only
    // window allowed is the per-doc rarity rank (bounded by doc length).
    val p = plan(SparkEntry.queries("x02_neardup_jaccard")(spark, sf()))
    assert(!p.matches("(?s).*windowspecdefinition\\(s#\\d+.*"),
      s"window partitioned by shingle:\n$p")
    assert("(?m)HashAggregate.*count\\(1\\)".r.findFirstIn(p).isDefined ||
      "partial_count".r.findFirstIn(p).isDefined, s"no partial count aggregate:\n$p")
  }

  test("partial aggregation is map-side (no raw-row shuffle for q13)") {
    val p = plan(SparkEntry.queries("q13_tpch_q1")(spark, sf()))
    // HashAggregate appears twice: partial before exchange, final after
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("x18 decontamination broadcasts the benchmark side (no corpus shuffle for the join)") {
    val p = plan(SparkEntry.queries("x18_decontaminate")(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), s"bench set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$p")
  }

  test("x19 stratified sample is a pure narrow filter (zero exchanges)") {
    val p = plan(SparkEntry.queries("x19_stratified_sample")(spark, sf()))
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
  }

  test("x14 IVF assignment is a zero-shuffle per-row fold (no window, no hash exchange)") {
    val p = plan(SparkEntry.queries("x14_ivf_assign")(spark, sf()))
    assert(!p.contains("Exchange hashpartitioning"),
      s"corpus cell assignment must not shuffle:\n$p")
    assert(!p.contains("Window"), s"argmax must fold, not rank:\n$p")
  }

  test("x33/x34 kmeans: assignment folds shuffle-free; pair join shuffles on cluster only") {
    // the x33 result is a persisted assignment — its PRODUCING plan is what
    // matters: the unpersisted x34 pipeline embeds it (labeled.unpersist()
    // runs before return), so its executed plan shows the real shape
    val q = graft.ops.Similarity.semanticNearDupPairs(
      spark.read.parquet(s"${sf()}/embeddings.parquet"),
      "vec_id", "embedding", threshold = 0.4, k = 8, iters = 2)
    val p = plan(q)
    assert(!p.contains("Window"), s"argmin must fold, not rank:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs blowup:\n$p")
    // every hash exchange in the plan keys on the cluster id — the corpus
    // never re-shuffles on the row id (no join-back to recover vectors)
    val exchanges = "Exchange hashpartitioning\\(([a-zA-Z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.forall(_.startsWith("cluster")),
      s"unexpected non-cluster shuffle keys $exchanges:\n$p")
    // the pair join keys on the cluster id (broadcast at this scale; a hash
    // exchange on cluster at corpus scale) — never an id join-back
    assert(p.contains("Join [cluster"), s"pair join must key on cluster:\n$p")
  }

  test("DSv2 custom scan metrics: stripesRead / chunksSkipped surface on the scan node") {
    import spark.implicits._
    val dir = tmpDir("metrics")
    spark.range(100000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .coalesce(1).sortWithinPartitions("k")
      .write.format("nimble").mode("overwrite")
      .option("sortColumns", "k").option("rowsPerChunk", "2048").save(dir)
    val df = spark.read.format("nimble").load(dir).filter(col("k") === 50000L)
    assert(df.count() == 1)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scan = plan.collectWithSubqueries {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.headOption.orElse(plan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collectFirst {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }.get
    }).get
    assert(scan.metrics.contains("stripesRead"), scan.metrics.keys.mkString(","))
    assert(scan.metrics.contains("chunksSkipped"), scan.metrics.keys.mkString(","))
    assert(scan.metrics.contains("streamBytesRead"), scan.metrics.keys.mkString(","))
    assert(scan.metrics("stripesRead").value >= 1, scan.metrics("stripesRead").value)
    // r15: the sparse/deferred fetch savings are UI-visible per task
    assert(scan.metrics("streamBytesRead").value > 0, "no stream bytes accounted")
    // point filter on a sorted 49-chunk stripe: most chunks must chunk-skip
    assert(scan.metrics("chunksSkipped").value > 10, scan.metrics("chunksSkipped").value)
    // Spark's SQLAppStatusListener re-instantiates each metric class
    // reflectively (0-arg ctor) to aggregate for the UI — a parameterized
    // class makes the UI silently drop the metric with a load warning
    for (m <- scan.scan.supportedCustomMetrics()) {
      val fresh = m.getClass.getDeclaredConstructor().newInstance()
      assert(fresh.name() == m.name(), s"reflective re-instantiation of ${m.getClass}")
    }
  }

  test("x27 sequence packing: corpus cumsum windows per bucket, never one partition") {
    val q = SparkEntry.queries("x27_seq_pack")(spark, sf())
    q.collect()
    val p = q.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    assert(p.contains("hashpartitioning(_bucket"),
      s"corpus running sum must window per id-range bucket:\n$p")
    // the only single-partition stage is the bucket-count-sized offsets frame
    // (grouped BEFORE its exchange, so partial aggregation bounds it)
    assert(p.contains("BroadcastHashJoin"), s"bucket offsets must broadcast back:\n$p")
  }

  test("x26 IVF top-k: corpus side folds shuffle-free; probe join broadcasts") {
    val p = plan(SparkEntry.queries("x26_ivf_topk")(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), s"probe list must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the cell join:\n$p")
  }

  test("scan statistics expose per-column min/max/nullCount to the CBO") {
    val dir = Tables.nimbleDir(spark, sf(), "orders")
    val schema = spark.read.format("nimble").load(dir).schema
    val scan = new graft.spark.NimbleScan(dir, schema, schema, Array.empty)
    val stats = scan.estimateStatistics()
    assert(stats.numRows().getAsLong == 1500L)
    val cs = stats.columnStats()
    val key = cs.keySet().toArray.map(_.toString)
    assert(key.contains("o_custkey"), s"columns with stats: ${key.mkString(",")}")
    val ck = cs.entrySet().stream().filter(_.getKey.toString == "o_custkey").findFirst().get().getValue
    assert(ck.nullCount().getAsLong == 0L)
    assert(ck.min().get() == java.lang.Long.valueOf(0L))
    assert(ck.max().get() == java.lang.Long.valueOf(149L))
    // strings carry no (truncated) bounds
    assert(!key.contains("o_orderstatus") ||
      !cs.entrySet().stream().filter(_.getKey.toString == "o_orderstatus")
        .findFirst().get().getValue.min().isPresent)
  }

  test("mixed-stripe filtered aggregate plans the mid-scan agg scan (one partial row per task)") {
    val dir = Tables.nimbleDir(spark, sf(), "lineitem")
    val agg = spark.read.format("nimble").load(dir)
      .filter(col("l_quantity") > 45)
      .agg(count(lit(1)), min("l_orderkey"), max("l_extendedprice"))
    agg.collect() // finalize the adaptive plan
    // AQE wraps scans in leaf QueryStage nodes, so assert on the rendered
    // final plan (scan descriptions print inside the BatchScan node)
    val planStr = agg.queryExecution.executedPlan.toString
    assert(planStr.contains("mid-scan-agg"),
      s"expected the mid-scan agg scan in the final plan:\n$planStr")
    assert(!planStr.contains("LocalTableScan"), "mixed stripes are not stats-only")
    // the scan emits bounded partial rows, not data rows: plan it directly
    val files = graft.spark.NimbleSource.listFiles(dir)
    val schema = spark.read.format("nimble").load(dir).schema
    val ops: Array[graft.spark.AggScan.AggOp] = Array(graft.spark.AggScan.CountStarOp())
    val filters: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.GreaterThan("l_quantity", 45.0))
    val Some((partials, mixed)) = graft.spark.AggScan.plan(ops, schema, files, filters)
    val scan = new graft.spark.NimbleAggBatchScan(dir, schema, new org.apache.spark.sql.types.StructType(),
      ops, filters, partials, mixed)
    val parts = scan.planInputPartitions()
    assert(parts.nonEmpty && parts.length < 64, s"partials should be task-count-bounded: ${parts.length}")
  }

  test("sum/avg aggregates plan the mid-scan agg scan; overflow-risk sums refuse") {
    val dir = Tables.nimbleDir(spark, sf(), "lineitem")
    val agg = spark.read.format("nimble").load(dir)
      .filter(col("l_quantity") > 45)
      .agg(sum("l_suppkey").as("ss"), avg("l_quantity").as("aq"), count(lit(1)).as("c"))
    agg.collect()
    val planStr = agg.queryExecution.executedPlan.toString
    assert(planStr.contains("mid-scan-agg"),
      s"expected sum to ride the mid-scan agg scan:\n$planStr")
    // values must equal the un-pushed compute
    val exp = spark.read.format("nimble").load(dir).filter(col("l_quantity") > 45)
      .withColumn("l_suppkey", col("l_suppkey") + 0) // +0 blocks agg pushdown shape
      .agg(sum("l_suppkey"), avg("l_quantity"), count(lit(1))).collect()(0)
    assert(agg.collect()(0) == exp, s"pushed sum diverged: ${agg.collect()(0)} vs $exp")

    // a long column whose stats bound can overflow Long on summation must
    // refuse the pushdown (Spark casts partials back to the child type; a
    // wrapped partial would be silently wrong) and fall back to a plain scan
    // alternating ±2^62: the |max|*count bound overflows Long (→ refusal)
    // but the true sum is 0, so the fallback scan computes fine even under
    // ANSI's throwing sum
    val big = spark.range(5000).selectExpr("id",
      "CASE WHEN id % 2 = 0 THEN 4611686018427387000 ELSE -4611686018427387000 END AS big")
    val bdir = tmpDir("sum-overflow")
    big.write.format("nimble").mode("overwrite").save(bdir)
    val bagg = spark.read.format("nimble").load(bdir).agg(sum("big"))
    bagg.collect()
    val bplan = bagg.queryExecution.executedPlan.toString
    assert(!bplan.contains("mid-scan-agg") && !bplan.contains("stats-agg"),
      s"overflow-risk sum must not push down:\n$bplan")
  }

  test("grouped aggregate pushdown: GROUP BY strings ride the mid-scan fold, values exact") {
    val dir = Tables.nimbleDir(spark, sf(), "lineitem")
    val nb = spark.read.format("nimble").load(dir)
    def gq(df: org.apache.spark.sql.DataFrame, block: Boolean) = {
      // `+ 0` blocks the aggregate pushdown shape for the reference compute
      val q = if (block) df.withColumn("l_quantity", col("l_quantity") + 0) else df
      q.filter(col("l_discount") < 0.05)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("c"), sum("l_quantity").as("sq"),
          avg("l_extendedprice").as("ap"), max("l_quantity").as("mq"))
        .orderBy("l_returnflag", "l_linestatus")
    }
    val pushed = gq(nb, block = false)
    pushed.collect()
    val planStr = pushed.queryExecution.executedPlan.toString
    assert(planStr.contains("mid-scan-agg") && planStr.contains("groupBy=l_returnflag,l_linestatus"),
      s"expected the grouped mid-scan agg scan:\n$planStr")
    // doubles round to 1e-9 relative precision: the pushed and un-pushed
    // plans merge partials in different orders (same hazard AggFuzzSpec's
    // norm() guards against)
    def norm(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[Any]] =
      rows.toSeq.map(_.toSeq.map {
        case d: Double => math.round(d * 1e9)
        case v => v
      })
    assert(norm(pushed.collect()) == norm(gq(nb, block = true).collect()),
      "grouped pushdown diverged from the un-pushed compute")
    // >2 group columns or a numeric group column: shape refused, normal scan
    val refused = nb.groupBy("l_orderkey").agg(sum("l_quantity"))
    refused.collect()
    assert(!refused.queryExecution.executedPlan.toString.contains("mid-scan-agg"),
      "numeric group-by must fall back to the vectorized scan")
    // near-unique strings lose dictionary selection: the plan-time probe
    // must refuse the pushdown (generic per-row hash fold would regress
    // against Spark's codegen'd aggregate)
    val hc = spark.range(20000).selectExpr("md5(CAST(id AS STRING)) AS k", "id AS v")
    val hcDir = tmpDir("groupagg-highcard")
    hc.write.format("nimble").mode("overwrite").save(hcDir)
    val hcAgg = spark.read.format("nimble").load(hcDir).groupBy("k").agg(sum("v"))
    hcAgg.collect()
    assert(!hcAgg.queryExecution.executedPlan.toString.contains("mid-scan-agg"),
      "high-cardinality string group-by must fall back to the vectorized scan")
  }

  test("low-card string scan surfaces a vector dictionary (ids, not per-row bytes)") {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.types.StringType
    // unit contract: a dict chunk sets the dictionary; a later plain chunk
    // into the SAME reused vector clears it
    val alphabet = graft.format.BytesCol(Array(0, 1, 2), "ab".getBytes)
    val dict = graft.format.DictBytesCol(alphabet, Array(1, 0, 1, 1))
    val vec = new OnHeapColumnVector(16, StringType)
    assert(graft.format.Fields.fillVector(vec, StringType, dict, null) == 4)
    assert(vec.hasDictionary, "dict chunk must surface a vector dictionary")
    assert((0 until 4).map(vec.getUTF8String(_).toString) == Seq("b", "a", "b", "b"))
    vec.reset()
    val plain = graft.format.BytesCol(Array(0, 1, 3), "xyz".getBytes)
    assert(graft.format.Fields.fillVector(vec, StringType, plain, null) == 2)
    assert(!vec.hasDictionary, "plain chunk must clear a stale dictionary")
    assert(vec.getUTF8String(0).toString == "x" && vec.getUTF8String(1).toString == "yz")

    // end-to-end: a real scan of a low-cardinality string column reports a
    // dictionary on the first batch's vector
    val dir = Tables.nimbleDir(spark, sf(), "lineitem")
    val full = spark.read.format("nimble").load(dir).schema
    val proj = org.apache.spark.sql.types.StructType(full.fields.filter(_.name == "l_returnflag"))
    val scan = new graft.spark.NimbleScan(dir, full, proj, Array.empty)
    val factory = scan.createReaderFactory()
    val reader = factory.createColumnarReader(scan.planInputPartitions()(0))
    try {
      assert(reader.next(), "scan must produce a batch")
      val col = reader.get().column(0)
        .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
      assert(col.hasDictionary, "l_returnflag (3 distinct) must scan dictionary-backed")
    } finally reader.close()
  }
}
