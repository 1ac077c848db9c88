package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder
import graft.spark.NimbleSource

/** OPTIMIZE ZORDER: the Morton-curve rewrite keeps data value-identical,
  * never declares a false sort, and makes stripe-stats pruning effective on
  * EVERY clustered column — the property a single-column sort cannot give. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("ZInterleave: bit-exact Morton interleave, round-robin from LSB") {
    graft.functions.ZOrderKey.register(spark)
    val r = spark.range(1).select(
      call_function("graft_zinterleave", lit(1), lit(0)).as("a"),       // bit0 of col0 -> bit0
      call_function("graft_zinterleave", lit(0), lit(1)).as("b"),       // bit0 of col1 -> bit1
      call_function("graft_zinterleave", lit(255), lit(255)).as("c"),   // 16 bits set
      call_function("graft_zinterleave", lit(2), lit(1)).as("d")        // 0b0110
    ).head()
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 0xffffL)
    assert(r.getLong(3) == 6L)
  }

  test("ZBucket: boundary counting, nulls to bucket 0, strings ordered") {
    graft.functions.ZOrderKey.register(spark)
    val df = Seq[Option[Int]](Some(5), Some(10), Some(15), Some(25), None).toDF("v")
      .select(call_function("graft_zbucket", col("v"),
        array(lit(10), lit(20))).as("b"))
    assert(df.as[Int].collect().toSeq == Seq(0, 1, 1, 2, 0))
    val sdf = Seq("apple", "melon", "zebra").toDF("s")
      .select(call_function("graft_zbucket", col("s"), array(lit("banana"), lit("peach"))).as("b"))
    assert(sdf.as[Int].collect().toSeq == Seq(0, 1, 2))
  }

  test("zorder rewrite: values identical, both filter columns prune stripes, no sort declared") {
    // two independent uniform dimensions: a linear sort on `a` gives `b`
    // zero pruning power; the z-curve must give both real pruning
    val n = 200000
    // NB: b must be NON-LINEAR in id — any `id*c % m` is a function of
    // `id % m` and would correlate perfectly with a, faking z-order wins
    val df = spark.range(n).select(
      (col("id") % 512).cast("int").as("a"),
      pmod(hash(col("id")), lit(512)).as("b"),
      col("id").as("payload"))

    val sortedDir = tmpDir("zo-sorted")
    df.repartitionByRange(4, col("a")).sortWithinPartitions("a")
      .write.format("nimble").mode("overwrite")
      .option("stripeBytes", "65536").option("rowsPerChunk", "2048")
      .option("sortColumns", "a")
      .save(sortedDir)

    val zDir = tmpDir("zo-z")
    // zorder reads the sorted table and rewrites on the curve over (a, b);
    // fine stripes make stripe counts comparable with the sorted fixture
    val rep = ZOrder.zorder(spark, sortedDir, zDir, Seq("a", "b"),
      targetFileBytes = 1L << 30,
      extraOptions = Map("stripeBytes" -> "65536", "rowsPerChunk" -> "2048"))
    assert(rep.rows == n)
    assert(!rep.writerOptions.contains("sortColumns"),
      "curve order must not masquerade as a column sort (TopN/range probes would lie)")

    // value-identical rewrite
    val z = spark.read.format("nimble").load(zDir)
    assert(z.count() == n)
    assert(z.exceptAll(df).isEmpty && df.exceptAll(z).isEmpty)

    def prunedFrac(dir: String, pred: org.apache.spark.sql.Column): Double = {
      val d = spark.read.format("nimble").load(dir)
      d.filter(pred).select("payload").rdd.getNumPartitions // plan the scan
      val st = NimbleSource.lastPlanStats(dir).get
      st.stripesPruned.toDouble / (st.stripesPruned + st.stripesPlanned)
    }

    val aSorted = prunedFrac(sortedDir, col("a") === 7)
    val bSorted = prunedFrac(sortedDir, col("b") === 7)
    val aZ = prunedFrac(zDir, col("a") === 7)
    val bZ = prunedFrac(zDir, col("b") === 7)
    info(s"pruned fraction: sorted a=$aSorted b=$bSorted | zorder a=$aZ b=$bZ")
    assert(aSorted > 0.7, s"sorted table should prune on its sort col: $aSorted")
    assert(bSorted < 0.2, s"sorted table cannot prune on b: $bSorted")
    assert(aZ > 0.4, s"z-ordered table should prune on a: $aZ")
    assert(bZ > 0.4, s"z-ordered table should prune on b: $bZ")
  }

  test("two-stage rewrite (parallelism > output files) stitches curve-ordered parts " +
      "to targetFileBytes: values, file count, pruning and index all match the direct write") {
    val n = 200000
    val df = spark.range(n).select(
      (col("id") % 512).cast("int").as("a"),
      pmod(hash(col("id")), lit(512)).as("b"),
      col("id").as("payload"))
    val srcDir = tmpDir("zo2-src")
    df.repartitionByRange(4, col("a")).sortWithinPartitions("a")
      .write.format("nimble").mode("overwrite")
      .option("stripeBytes", "65536").option("rowsPerChunk", "2048")
      .option("sortColumns", "a").save(srcDir)
    // minTaskBytes = 1 forces nPart = defaultParallelism >> nOut = 1, so the
    // shuffle writes many sorted parts and the concat stage must stitch them
    val out = tmpDir("zo2-out")
    val rep = ZOrder.zorder(spark, srcDir, out, Seq("a", "b"),
      targetFileBytes = 1L << 30,
      extraOptions = Map("stripeBytes" -> "65536", "rowsPerChunk" -> "2048"),
      minTaskBytes = 1L)
    assert(rep.rows == n)
    assert(rep.filesAfter == 1, s"concat must bin-pack to targetFileBytes: $rep")
    val z = spark.read.format("nimble").load(out)
    assert(z.exceptAll(df).isEmpty && df.exceptAll(z).isEmpty)
    // stitched file still prunes on BOTH curve dimensions from stripe stats
    def prunedFrac(pred: org.apache.spark.sql.Column): Double = {
      z.filter(pred).select("payload").rdd.getNumPartitions
      val st = NimbleSource.lastPlanStats(out).get
      st.stripesPruned.toDouble / (st.stripesPruned + st.stripesPlanned)
    }
    assert(prunedFrac(col("a") === 7) > 0.4)
    assert(prunedFrac(col("b") === 7) > 0.4)

    // index/bloom layouts survive the two-stage path (concat is raw-stripe)
    val iDir = tmpDir("zo2-idx")
    spark.range(10000).select(col("id").as("k"), (col("id") % 97).cast("int").as("v"))
      .write.format("nimble").mode("overwrite")
      .option("indexColumns", "k").option("bloomFilterColumns", "v").save(iDir)
    val iOut = tmpDir("zo2-idx-out")
    val iRep = ZOrder.zorder(spark, iDir, iOut, Seq("k", "v"), minTaskBytes = 1L)
    assert(iRep.writerOptions.get("indexColumns").contains("k"))
    val got = spark.read.format("nimble").load(iOut).filter(col("k") === 1234L)
      .select("v").as[Int].collect().toSeq
    assert(got == Seq((1234 % 97)))
  }

  test("zorder refuses bucketed tables and preserves index/bloom layout") {
    val df = spark.range(10000).select(
      col("id").as("k"), (col("id") % 97).cast("int").as("v"))
    val bDir = tmpDir("zo-bucketed")
    df.write.format("nimble").mode("overwrite")
      .option("bucketColumns", "k").option("numBuckets", "4").save(bDir)
    val e = intercept[IllegalArgumentException] {
      ZOrder.zorder(spark, bDir, tmpDir("zo-bucketed-out"), Seq("k", "v"))
    }
    assert(e.getMessage.contains("bucketed"))

    val iDir = tmpDir("zo-indexed")
    df.write.format("nimble").mode("overwrite")
      .option("indexColumns", "k").option("bloomFilterColumns", "v")
      .option("sortColumns", "k").save(iDir)
    val out = tmpDir("zo-indexed-out")
    val rep = ZOrder.zorder(spark, iDir, out, Seq("k", "v"))
    assert(rep.writerOptions.get("indexColumns").contains("k"))
    assert(rep.writerOptions.get("bloomFilterColumns").contains("v"))
    assert(!rep.writerOptions.contains("sortColumns"))
    // indexed point probe still answers correctly on the rewritten table
    val got = spark.read.format("nimble").load(out).filter(col("k") === 1234L)
      .select("v").as[Int].collect().toSeq
    assert(got == Seq((1234 % 97)))
  }

  test("fuzz: random types x null/NaN mixes x clustered-column subsets rewrite value-identically (seeded)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(1142)
    for (trial <- 0 until 5) {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("lv", LongType, nullable = true),
        StructField("dv", DoubleType, nullable = true),
        StructField("sv", StringType, nullable = true),
        StructField("dt", DateType, nullable = true)))
      val n = 300 + rnd.nextInt(700)
      val rows = (0 until n).map { i =>
        Row(i.toLong,
          if (rnd.nextInt(7) == 0) null else rnd.nextLong() % 100000L,
          rnd.nextInt(9) match {
            case 0 => null
            case 1 => Double.NaN
            case _ => rnd.nextDouble() * 1000 - 500
          },
          if (rnd.nextInt(6) == 0) null else rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString,
          if (rnd.nextInt(8) == 0) null else java.sql.Date.valueOf(s"20${10 + rnd.nextInt(15)}-0${1 + rnd.nextInt(9)}-1${rnd.nextInt(9)}"))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2 + rnd.nextInt(4)), schema)
      val dir = tmpDir(s"zo-fuzz$trial"); val out = tmpDir(s"zo-fuzz$trial-out")
      df.write.format("nimble").mode("overwrite")
        .option("stripeBytes", "16384").save(dir)
      val all = Seq("lv", "dv", "sv", "dt", "id")
      val cols = rnd.shuffle(all).take(2 + rnd.nextInt(3))
      val rep = graft.ops.ZOrder.zorder(spark, dir, out, cols,
        targetFileBytes = if (rnd.nextBoolean()) 1L << 30 else 16L << 10,
        buckets = Seq(4, 16, 256)(rnd.nextInt(3)))
      assert(rep.rows == n, s"trial $trial cols=$cols: $rep")
      val want = df.toJSON.collect().sorted
      val got = spark.read.format("nimble").load(out).toJSON.collect().sorted
      assert(want.toSeq == got.toSeq, s"trial $trial cols=$cols: value drift")
    }
  }

  test("zorder of an all-null clustered column degrades to a constant bucket, values intact") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, Option.empty[Long], i % 7))
      .toDF("id", "nul", "v")
    val dir = tmpDir("zo-nul"); val out = tmpDir("zo-nul-out")
    df.write.format("nimble").mode("overwrite").save(dir)
    val rep = graft.ops.ZOrder.zorder(spark, dir, out, Seq("nul", "v"))
    assert(rep.rows == 5000)
    val back = spark.read.format("nimble").load(out)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("review guards: __zkey data column survives; bad buckets/types/sortColumns refused") {
    import spark.implicits._
    // a real column named __zkey must come back untouched
    val df = (0L until 2000L).map(i => (i, i * 3, (i % 13).toInt)).toDF("id", "__zkey", "v")
    val dir = tmpDir("zo-guard"); val out = tmpDir("zo-guard-out")
    df.write.format("nimble").mode("overwrite").save(dir)
    graft.ops.ZOrder.zorder(spark, dir, out, Seq("id", "v"))
    val back = spark.read.format("nimble").load(out)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "__zkey data column must survive the rewrite byte-identically")

    // curve ids are 8-bit: buckets outside [2,256] must refuse, not wrap
    intercept[IllegalArgumentException] {
      graft.ops.ZOrder.zorder(spark, dir, tmpDir("zo-g2"), Seq("id"), buckets = 1024)
    }
    // unsupported clustered-column type refuses up front (no mid-sample crash)
    val bdir = tmpDir("zo-guard-bin")
    (0L until 100L).map(i => (i, Array(i.toByte))).toDF("id", "bin")
      .write.format("nimble").mode("overwrite").save(bdir)
    val e = intercept[IllegalArgumentException] {
      graft.ops.ZOrder.zorder(spark, bdir, tmpDir("zo-g3"), Seq("bin"))
    }
    assert(e.getMessage.contains("not supported"))
    // extraOptions cannot smuggle a false sort declaration back in
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.ZOrder.zorder(spark, dir, tmpDir("zo-g4"), Seq("id"),
        extraOptions = Map("sortColumns" -> "id"))
    }
    assert(e2.getMessage.contains("sortColumns"))
  }
}
