package graft

import org.apache.spark.sql.functions._

/** Hash-bucketed tables + storage-partitioned joins: the write declares
  * bucket(n, k) and Spark clusters rows so partition id == bucket id; the
  * catalog resolves the bucket transform; a join of two co-bucketed tables
  * on the bucket key runs with zero shuffle on either side. */
class BucketingSpec extends SparkTestBase {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CTAS layout properties: indexColumns/bloomFilterColumns ride the spec into the first write") {
    val wh = tmpDir("ctas_wh")
    withConfs(
      "spark.sql.catalog.gctas" -> classOf[graft.spark.NimbleCatalog].getName,
      "spark.sql.catalog.gctas.warehouse" -> wh) {
      spark.range(30000).selectExpr("id",
        "md5(CAST(id AS STRING)) AS skey", "CAST(id % 7 AS DOUBLE) AS v")
        .writeTo("gctas.t_idx")
        .tableProperty("sortColumns", "id")
        .tableProperty("indexColumns", "skey")
        .tableProperty("bloomFilterColumns", "skey")
        .create()
      val f = graft.spark.NimbleSource.listFiles(s"$wh/t_idx").head
      val r = new graft.format.Tablet.Reader(f)
      try {
        assert(r.footer.sortColumns == Seq("id"), "sortColumns lost in CTAS")
        assert(r.footer.streamKeys.exists(_.startsWith("#idx:skey")),
          "indexColumns table property must reach the first write")
        val sid = r.keyId("skey")
        assert((0 until r.footer.stripes.length).exists(s => r.streamBloom(s, sid).nonEmpty),
          "bloomFilterColumns table property must reach the first write")
      } finally r.close()
    }
  }

  test("plain append preserves per-file-local layout (index/bloom), not sort/bucket claims") {
    val dir = tmpDir("append_layout")
    spark.range(20000).selectExpr("id", "md5(CAST(id AS STRING)) AS skey")
      .repartitionByRange(1, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("indexColumns", "skey").option("bloomFilterColumns", "skey")
      .mode("overwrite").save(dir)
    val before = graft.spark.NimbleSource.listFiles(dir).toSet
    // plain append, NO layout options: new files must keep index + blooms
    // (per-file-local structures) but must NOT claim the sort order
    spark.range(20000, 25000).selectExpr("id", "md5(CAST(id AS STRING)) AS skey")
      .write.format("nimble").mode("append").save(dir)
    val appended = graft.spark.NimbleSource.listFiles(dir).filterNot(before)
    assert(appended.nonEmpty)
    for (f <- appended) {
      val r = new graft.format.Tablet.Reader(f)
      try {
        assert(r.footer.streamKeys.exists(_.startsWith("#idx:skey")),
          s"appended file $f lost the hash index")
        val sid = r.keyId("skey")
        assert((0 until r.footer.stripes.length).exists(s => r.streamBloom(s, sid).nonEmpty),
          s"appended file $f lost its blooms")
        assert(r.footer.sortColumns.isEmpty,
          s"an unsorted append must not claim sortColumns: $f")
      } finally r.close()
    }
    // lookups keep working across old and new files
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("23000".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val (rows, m) = graft.format.Lookup.pointLookupMetered(dir, "skey", hex)
    assert(rows.length == 1 && rows.head("id") == 23000L)
    assert(m.indexProbes > 0, "appended rows must be index-served")
    // an overwrite does NOT inherit the doomed files' layout
    spark.range(100).selectExpr("id", "md5(CAST(id AS STRING)) AS skey")
      .write.format("nimble").mode("overwrite").save(dir)
    val fresh = graft.spark.NimbleSource.listFiles(dir).head
    val r2 = new graft.format.Tablet.Reader(fresh)
    try assert(!r2.footer.streamKeys.exists(_.startsWith("#idx:")),
      "overwrite must not inherit the previous contents' index layout")
    finally r2.close()
  }

  test("bucketed write: one file per bucket, footers declare the spec, rows round-trip") {
    val dir = tmpDir("bkt_write")
    val df = spark.range(10000).selectExpr("id AS k", "md5(CAST(id AS STRING)) AS s")
    df.write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "8")
      .mode("overwrite").save(dir)
    val files = graft.spark.NimbleSource.listFiles(dir)
    assert(files.length == 8, s"expected 8 bucket files, got ${files.length}")
    val footers = files.map(graft.spark.NimbleSource.footerOf)
    assert(footers.forall(f => f.numBucketsSpec == 8 && f.bucketColumns == Seq("k")))
    assert(footers.map(_.bucketId).sorted == (0 until 8), "distinct bucket ids 0..7")
    assert(graft.spark.NimbleSource.bucketSpecOf(files).contains((Seq("k"), 8)))
    val back = spark.read.format("nimble").load(dir).collect()
    assert(back.length == 10000)
    assert(back.map(_.getLong(0)).sorted.sameElements(0L until 10000L))
  }

  test("bucket placement matches Spark's own hash partitioning formula") {
    val dir = tmpDir("bkt_hash")
    spark.range(5000).selectExpr("id AS k", "CAST(id AS STRING) AS s")
      .write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "16")
      .mode("overwrite").save(dir)
    // every row's file-declared bucket equals pmod(hash(k), 16) computed by
    // Spark SQL itself — the write-side per-row check enforced this, so the
    // cross-check is that reading agrees file by file
    for (f <- graft.spark.NimbleSource.listFiles(dir)) {
      val b = graft.spark.NimbleSource.footerOf(f).bucketId
      val got = spark.read.format("nimble").load(f)
        .select(expr("pmod(hash(k), 16)").cast("int").as("b")).distinct().collect()
      assert(got.forall(_.getInt(0) == b), s"file $f declares bucket $b but holds ${got.mkString(",")}")
    }
  }

  test("bucketed + sorted write: Spark sorts within buckets (no manual pre-sort)") {
    val dir = tmpDir("bkt_sorted")
    spark.range(20000).selectExpr("CAST(hash(id) AS BIGINT) AS k", "id AS v")
      .write.format("nimble")
      .option("bucketColumns", "v").option("numBuckets", "4")
      .option("sortColumns", "k")
      .option("stripeBytes", "32768").option("rowsPerChunk", "512")
      .mode("overwrite").save(dir)
    val files = graft.spark.NimbleSource.listFiles(dir)
    assert(files.forall(f => graft.spark.NimbleSource.footerOf(f).sortColumns == Seq("k")))
    // requiredOrdering sorted each bucket: stripe stats must be monotone
    assert(files.forall(f => graft.spark.NimbleSource.stripeStatsMonotone(f, "k")))
  }

  test("storage-partitioned join via the catalog: zero shuffles, rows match") {
    val wh = tmpDir("bkt_wh")
    withConfs(
      "spark.sql.catalog.gcat" -> classOf[graft.spark.NimbleCatalog].getName,
      "spark.sql.catalog.gcat.warehouse" -> wh,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val left = spark.range(20000).selectExpr("id % 997 AS k", "id AS v1")
      val right = spark.range(5000).selectExpr("id % 997 AS k", "id * 3 AS v2")
      left.writeTo("gcat.t_left").partitionedBy(bucket(8, col("k"))).create()
      right.writeTo("gcat.t_right").partitionedBy(bucket(8, col("k"))).create()

      val j = spark.table("gcat.t_left").join(spark.table("gcat.t_right"), "k")
        .selectExpr("k", "v1", "v2")
      val got = j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"SPJ must not shuffle either side:\n$p")
      val exp = left.join(right, "k").selectExpr("k", "v1", "v2").collect()
      assert(got.length == exp.length)
      assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
        .sameElements(exp.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted))
    }
  }

  test("SPJ survives a pruned side (empty buckets still line up)") {
    val wh = tmpDir("bkt_wh2")
    withConfs(
      "spark.sql.catalog.gcat2" -> classOf[graft.spark.NimbleCatalog].getName,
      "spark.sql.catalog.gcat2.warehouse" -> wh,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.range(8000).selectExpr("id AS k", "id AS v1")
        .writeTo("gcat2.a").partitionedBy(bucket(4, col("k"))).create()
      spark.range(8000).selectExpr("id AS k", "id * 7 AS v2")
        .writeTo("gcat2.b").partitionedBy(bucket(4, col("k"))).create()
      val j = spark.table("gcat2.a").filter(col("k") < 100)
        .join(spark.table("gcat2.b"), "k").selectExpr("k", "v1", "v2")
      val got = j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"filtered SPJ must still avoid shuffles:\n$p")
      assert(got.length == 100)
      assert(got.forall(r => r.getLong(2) == r.getLong(0) * 7))
    }
  }

  test("scan parallelism: bucket-grouped only when SPJ is on; bin-packed otherwise") {
    val dir = tmpDir("bkt_par")
    spark.range(10000).selectExpr("id AS k", "CAST(id AS STRING) AS s")
      .write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "6")
      .mode("overwrite").save(dir)
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      assert(spark.read.format("nimble").load(dir).rdd.getNumPartitions == 6)
    }
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") {
      // 6 tiny files bin-pack into fewer tasks, proving the grouped path is off
      assert(spark.read.format("nimble").load(dir).rdd.getNumPartitions < 6)
    }
  }

  test("a plain append voids the bucket declaration (joins fall back to shuffles, stay correct)") {
    val dir = tmpDir("bkt_mixed")
    spark.range(1000).selectExpr("id AS k", "id AS v")
      .write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "4")
      .mode("overwrite").save(dir)
    spark.range(1000, 1200).selectExpr("id AS k", "id AS v")
      .coalesce(1).write.format("nimble").mode("append").save(dir)
    val files = graft.spark.NimbleSource.listFiles(dir)
    assert(graft.spark.NimbleSource.bucketSpecOf(files).isEmpty,
      "mixed bucketed + plain files must void the table-level spec")
    assert(spark.read.format("nimble").load(dir).count() == 1200)
  }

  test("q31 driver query: SPJ join plans zero exchanges when broadcast is off") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("q31_spj_join")(spark, sf())
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"q31 must run shuffle-free end-to-end:\n$p")
    }
  }

  test("bucketed + sorted tables merge-join with zero shuffles AND zero sorts") {
    val wh = tmpDir("bkt_wh3")
    withConfs(
      "spark.sql.catalog.gcat3" -> classOf[graft.spark.NimbleCatalog].getName,
      "spark.sql.catalog.gcat3.warehouse" -> wh,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.sorting.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.range(30000).selectExpr("id % 4999 AS k", "id AS v1")
        .writeTo("gcat3.sl").partitionedBy(bucket(8, col("k")))
        .tableProperty("sortColumns", "k").create()
      spark.range(9000).selectExpr("id % 4999 AS k", "id * 11 AS v2")
        .writeTo("gcat3.sr").partitionedBy(bucket(8, col("k")))
        .tableProperty("sortColumns", "k").create()
      val j = spark.table("gcat3.sl").join(spark.table("gcat3.sr"), "k")
        .selectExpr("k", "v1", "v2")
      val got = j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"no shuffles expected:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected a merge join:\n$p")
      assert(!p.contains("Sort ["), s"scan-reported ordering must elide SortExec:\n$p")
      val exp = spark.range(30000).selectExpr("id % 4999 AS k", "id AS v1")
        .join(spark.range(9000).selectExpr("id % 4999 AS k", "id * 11 AS v2"), "k")
        .selectExpr("k", "v1", "v2").collect()
      assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
        .sameElements(exp.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted))
    }
  }

  test("one-side shuffle: a plain side shuffles BY the catalog bucket function to meet a bucketed side") {
    val wh = tmpDir("bkt_wh4")
    withConfs(
      "spark.sql.catalog.gcat4" -> classOf[graft.spark.NimbleCatalog].getName,
      "spark.sql.catalog.gcat4.warehouse" -> wh,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.range(20000).selectExpr("id % 3001 AS k", "id AS v1")
        .writeTo("gcat4.big").partitionedBy(bucket(8, col("k"))).create()
      val plain = spark.range(3001).selectExpr("id AS k", "id * 5 AS w")
      val j = spark.table("gcat4.big").join(plain, "k").selectExpr("k", "v1", "w")
      val got = j.collect()
      // result equality is the real pin: if the catalog's bucket function
      // disagreed with the write placement, matching rows would silently
      // land in different partitions and vanish from the join
      assert(got.length == 20000)
      assert(got.forall(r => r.getLong(2) == r.getLong(0) * 5))
      val p = j.queryExecution.executedPlan.toString
      // the only exchange is the plain side's, BY the bucket function — no
      // hash shuffle anywhere (the bucketed side stays in place)
      assert(!p.contains("Exchange hashpartitioning"), s"no hash shuffle expected:\n$p")
      assert(p.contains("Exchange keygroupedpartitioning"),
        s"plain side must shuffle by the catalog bucket function:\n$p")
    }
  }

  test("empty append into a bucketed table no-ops instead of crashing") {
    val dir = tmpDir("bkt_empty")
    val df = spark.range(1000).selectExpr("id AS k", "id AS v")
    df.write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "4")
      .mode("overwrite").save(dir)
    // Spark collapses an empty child to one dummy partition (SPARK-23271);
    // the writer-factory partition-count fence must let it through
    df.filter(expr("false")).write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "4")
      .mode("append").save(dir)
    assert(spark.read.format("nimble").load(dir).count() == 1000)
  }

  test("multi-column bucket: reads fine, falls back to bin-packed splits (no SPJ in Spark 4.1)") {
    val wh = tmpDir("bkt_wh5")
    withConfs(
      "spark.sql.catalog.gcat5" -> classOf[graft.spark.NimbleCatalog].getName,
      "spark.sql.catalog.gcat5.warehouse" -> wh,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      spark.sql(
        "CREATE TABLE gcat5.mc (a BIGINT, b BIGINT, v BIGINT) PARTITIONED BY (bucket(8, a, b))")
      spark.range(10000).selectExpr("id % 97 AS a", "id % 31 AS b", "id AS v")
        .writeTo("gcat5.mc").append()
      // plain read must not crash on the 3-arg bucket function bind
      assert(spark.table("gcat5.mc").count() == 10000)
      // Spark 4.1 SPJ cannot resolve multi-arg bucket transforms (probed:
      // the join shuffles regardless), so the scan must NOT cap its
      // parallelism at numBuckets — bin-packed splits instead
      assert(spark.table("gcat5.mc").rdd.getNumPartitions < 8,
        "multi-col bucketed scan must fall back to bin-packed splits")
      val t = spark.table("gcat5.mc")
      val j = t.join(t.selectExpr("a", "b", "v AS v2"), Seq("a", "b"))
      val exp = spark.range(10000).selectExpr("id % 97 AS a", "id % 31 AS b", "id AS v")
      assert(j.count() == exp.join(exp.selectExpr("a", "b", "v AS v2"), Seq("a", "b")).count())
    }
  }

  test("SPJ is on by default (Spark's registered default, no conf set)") {
    val dir = tmpDir("bkt_dflt")
    spark.range(5000).selectExpr("id AS k", "id AS v")
      .write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "5")
      .mode("overwrite").save(dir)
    val old = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    try assert(spark.read.format("nimble").load(dir).rdd.getNumPartitions == 5,
      "an unset conf must inherit Spark's registered default (true), not a hand-rolled false")
    finally old.foreach(spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
  }

  test("bucket pruning: a point lookup on the bucket key scans one bucket's file") {
    val dir = tmpDir("bkt_prune")
    spark.range(40000).selectExpr("id AS k", "md5(CAST(id AS STRING)) AS s")
      .write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "8")
      .mode("overwrite").save(dir)
    val totalStripes = graft.spark.NimbleSource.listFiles(dir)
      .map(f => graft.spark.NimbleSource.footerOf(f).stripes.length).sum
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") { // pruning is conf-independent
      // collect() (not count()) so the plain scan plans — count would ride
      // the agg-pushdown scan, which records no plan stats
      val one = spark.read.format("nimble").load(dir).filter(col("k") === 12345L).collect()
      assert(one.length == 1)
      val stats = graft.spark.NimbleSource.lastPlanStats(dir).get
      assert(stats.stripesPlanned < totalStripes,
        s"expected other buckets' files pruned: $stats of $totalStripes")
      // In-filter: union of the named values' buckets only
      val in = spark.read.format("nimble").load(dir)
        .filter(col("k").isin(5L, 17L, 23456L)).collect()
      assert(in.length == 3)
      // a non-key filter must not prune by bucket
      assert(spark.read.format("nimble").load(dir)
        .filter(col("s").startsWith("00")).count() > 0L)
    }
  }

  test("null bucket keys hash like Spark (seed bucket) and round-trip") {
    val dir = tmpDir("bkt_null")
    spark.range(1000)
      .selectExpr("CASE WHEN id % 10 = 0 THEN NULL ELSE id END AS k", "id AS v")
      .write.format("nimble")
      .option("bucketColumns", "k").option("numBuckets", "8")
      .mode("overwrite").save(dir)
    val back = spark.read.format("nimble").load(dir)
    assert(back.count() == 1000)
    assert(back.filter(col("k").isNull).count() == 100)
  }
}
