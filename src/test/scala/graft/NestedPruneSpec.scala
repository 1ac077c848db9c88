package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested struct-leaf predicate pruning: filters on `st.a` prune stripes
  * from the leaf stream's stats (parquet nested-predicate-pushdown analog)
  * while Spark still evaluates the predicate row-wise — the scan only ever
  * proves none-match, so results must be identical with pruning on. */
class NestedPruneSpec extends SparkTestBase {

  private def planStats(dir: String) = graft.spark.NimbleSource.lastPlanStats(dir).get

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val as = a.collect().map(_.toString).sorted.toSeq
    val bs = b.collect().map(_.toString).sorted.toSeq
    assert(as == bs, s"rows differ: ${as.take(3)} vs ${bs.take(3)} (${as.length}/${bs.length})")
  }

  test("point + range filters on a sorted struct leaf prune stripes, values exact") {
    val df = spark.range(60000).select(col("id"),
      struct(col("id").as("a"), md5(col("id").cast("string")).as("b")).as("st"))
    val dir = tmpDir("nested-prune")
    df.coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite")
      .option("stripeBytes", "4096").option("rowsPerChunk", "2048").save(dir)
    val nFiles = graft.spark.NimbleSource.listFiles(dir)
    val stripes = graft.spark.NimbleSource.footerOf(nFiles.head).stripes.length
    assert(stripes >= 4, s"fixture needs several stripes, got $stripes")

    val nb = spark.read.format("nimble").load(dir)
    val point = nb.filter(col("st.a") === 12345L)
    assert(point.count() == 1)
    val ps = planStats(dir)
    assert(ps.stripesPruned >= stripes - 2, s"point filter pruned ${ps.stripesPruned} of $stripes stripes")
    // the nested predicate is prune-only: never claimed as pushed
    val desc = point.queryExecution.executedPlan.toString
    assert(desc.contains("pruneOnly=["), s"expected pruneOnly in scan description:\n$desc")

    assertSameRows(df.filter(col("st.a").between(100L, 200L)),
      nb.filter(col("st.a").between(100L, 200L)))
    assert(planStats(dir).stripesPruned >= stripes - 2)

    // none-match range: every stripe drops
    assert(nb.filter(col("st.a") < -1L).count() == 0)
    assert(planStats(dir).stripesPruned == stripes)
  }

  test("null semantics: struct-null and leaf-null rows filter identically under pruning") {
    // three clusters in write order: a present / a null under a present
    // struct / struct itself null — the writer pads child streams under a
    // null parent, so leaf stats must mirror Spark's st.a semantics exactly
    val df = spark.sql("""
      SELECT id,
        CASE WHEN id < 10000 THEN named_struct('a', id, 'k', md5(CAST(id AS STRING)))
             WHEN id < 20000 THEN named_struct('a', CAST(NULL AS BIGINT), 'k', md5(CAST(-id AS STRING)))
             ELSE CAST(NULL AS STRUCT<a: BIGINT, k: STRING>)
        END AS st
      FROM range(30000)""")
    val dir = tmpDir("nested-nulls")
    df.coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite")
      .option("stripeBytes", "2048").option("rowsPerChunk", "1024").save(dir)
    val stripes = graft.spark.NimbleSource
      .footerOf(graft.spark.NimbleSource.listFiles(dir).head).stripes.length
    assert(stripes >= 6, s"fixture needs several stripes, got $stripes")
    val nb = spark.read.format("nimble").load(dir)

    // st.a IS NULL matches BOTH the leaf-null and struct-null clusters
    assert(nb.filter(col("st.a").isNull).count() == 20000)
    assertSameRows(df.filter(col("st.a").isNull), nb.filter(col("st.a").isNull))
    // ... and prunes the all-present cluster's stripes
    assert(planStats(dir).stripesPruned > 0, "IS NULL should prune the null-free stripes")

    assert(nb.filter(col("st.a").isNotNull).count() == 10000)
    assertSameRows(df.filter(col("st.a").isNotNull), nb.filter(col("st.a").isNotNull))
    assert(planStats(dir).stripesPruned > 0, "IS NOT NULL should prune the all-null stripes")

    // comparison never matches null rows; pruning must agree
    assertSameRows(df.filter(col("st.a") > 5000L), nb.filter(col("st.a") > 5000L))
    assert(planStats(dir).stripesPruned > 0)
  }

  test("two-level nesting and string leaves prune; array paths never do") {
    val df = spark.range(40000).select(col("id"),
      struct(struct(format_string("k%08d", col("id")).as("s")).as("inner"),
        md5(col("id").cast("string")).as("pad")).as("st"),
      array(col("id")).as("arr"))
    val dir = tmpDir("nested-deep")
    df.coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite")
      .option("stripeBytes", "4096").option("rowsPerChunk", "2048").save(dir)
    val stripes = graft.spark.NimbleSource
      .footerOf(graft.spark.NimbleSource.listFiles(dir).head).stripes.length
    assert(stripes >= 4)
    val nb = spark.read.format("nimble").load(dir)

    val q = nb.filter(col("st.inner.s") === "k00012345")
    assert(q.count() == 1)
    assert(planStats(dir).stripesPruned >= stripes - 2,
      s"string leaf prune: ${planStats(dir).stripesPruned} of $stripes")

    // an array-element predicate must not plan any stats-only pruning
    val aq = nb.filter(element_at(col("arr"), 1) === 5L)
    assert(aq.count() == 1)
    val adesc = aq.queryExecution.executedPlan.toString
    assert(!adesc.contains("pruneOnly=["), s"array path must not prune:\n$adesc")
  }

  test("index-candidate chunk restriction works under nested projections") {
    // unsorted key + hash index: stats ranges overlap every chunk, so only
    // the index can restrict the candidate set — and the projection
    // includes a struct, which used to disable index chunk selection
    val df = spark.range(80000).select(
      pmod(hash(col("id")), lit(1000000)).cast("long").as("k"),
      struct(col("id").as("a"), md5(col("id").cast("string")).as("b")).as("st"))
    val dir = tmpDir("nested-idx")
    df.coalesce(1).write.format("nimble").mode("overwrite")
      .option("indexColumns", "k").option("rowsPerChunk", "2048").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val probe = df.select("k").collect()(12345).getLong(0)
    def skippedDuring(f: => Unit): Long = {
      val before = graft.spark.NimbleSource.chunksSkipped.get()
      f
      graft.spark.NimbleSource.chunksSkipped.get() - before
    }
    var got: Array[org.apache.spark.sql.Row] = null
    val skipped = skippedDuring {
      got = nb.filter(col("k") === probe).select(col("st.a")).collect()
    }
    assert(got.nonEmpty)
    assert(skipped > 20,
      s"hash index should restrict candidate chunks under a nested projection, skipped=$skipped")
    // values intact when candidates interleave with decoded chunks
    assert(nb.filter(col("k") === probe).select(col("st.b")).collect().length == got.length)
  }

  test("hash index on a nested leaf: equality probes chunk-restrict via statsOnly") {
    // indexColumns=st.a builds the hash index on the row-aligned leaf
    // stream; the probe arrives as a residual (stats-only) filter, which
    // now feeds the candidate selection — Spark re-evaluates rows, so the
    // restriction only ever skips provably matchless chunks
    val df = spark.range(60000).select(col("id").as("rid"),
      struct(pmod(hash(col("id")), lit(400000)).cast("long").as("a"),
        md5(col("id").cast("string")).as("b")).as("st"))
    val dir = tmpDir("nested-leaf-idx")
    df.coalesce(1).write.format("nimble").mode("overwrite")
      .option("indexColumns", "st.a").option("rowsPerChunk", "2048").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val probe = df.select(col("st.a")).collect()(23456).getLong(0)
    val want = df.filter(col("st.a") === probe).select("rid")
      .collect().map(_.getLong(0)).sorted.toSeq
    def skippedDuring(f: => Unit): Long = {
      val before = graft.spark.NimbleSource.chunksSkipped.get()
      f
      graft.spark.NimbleSource.chunksSkipped.get() - before
    }
    var got: Seq[Long] = null
    val skipped = skippedDuring {
      got = nb.filter(col("st.a") === probe).select("rid")
        .collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(got == want, s"$got vs $want")
    assert(skipped > 20,
      s"nested-leaf index should restrict candidate chunks, skipped=$skipped")
    // misses skip everything
    assert(nb.filter(col("st.a") === -1L).count() == 0)
  }

  test("NaN rows survive stats pruning: NaN sorts greatest and equals itself") {
    // sorted doubles with one NaN planted mid-file: min/max stats exclude
    // NaN, so pruning `d > huge` on max alone would drop the NaN row — in
    // Spark NaN > v is TRUE for every v and NaN = NaN is TRUE
    val df = spark.sql("""
      SELECT id,
        CASE WHEN id = 123 THEN CAST('NaN' AS DOUBLE) ELSE CAST(id AS DOUBLE) END AS d,
        named_struct('x', CASE WHEN id = 123 THEN CAST('NaN' AS DOUBLE)
                               ELSE CAST(id AS DOUBLE) END,
                     'pad', md5(CAST(id AS STRING))) AS st
      FROM range(60000)""")
    val dir = tmpDir("nan-prune")
    df.coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite")
      .option("stripeBytes", "65536").option("rowsPerChunk", "2048").save(dir)
    assert(graft.spark.NimbleSource
      .footerOf(graft.spark.NimbleSource.listFiles(dir).head).stripes.length >= 3)
    val nb = spark.read.format("nimble").load(dir)

    // pushed top-level filter: the one NaN row must come back
    assert(nb.filter(col("d") > 1e9).count() == 1)
    assert(nb.filter(col("d") >= 1e9).select("id").collect().map(_.getLong(0)).toSeq == Seq(123L))
    // nested stats-only pruning path: same contract
    assert(nb.filter(col("st.x") > 1e9).count() == 1)
    // equality against NaN matches exactly the NaN row
    assert(nb.filter(col("d") === Double.NaN).count() == 1)
    assert(nb.filter(col("st.x") === Double.NaN).count() == 1)
    // < never matches NaN: pruning on min stays aggressive and correct
    assert(nb.filter(col("d") < 100.0).count() == 100)

    // all-NaN stripe region: EqualTo(NaN) must not prune it away
    val df2 = spark.sql("""
      SELECT id, CASE WHEN id < 10000 THEN CAST('NaN' AS DOUBLE)
                      ELSE CAST(id AS DOUBLE) END AS d,
             md5(CAST(id AS STRING)) AS pad
      FROM range(40000)""")
    val dir2 = tmpDir("nan-allchunk")
    df2.coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite")
      .option("stripeBytes", "32768").option("rowsPerChunk", "2048").save(dir2)
    val nb2 = spark.read.format("nimble").load(dir2)
    assert(nb2.filter(col("d") === Double.NaN).count() == 10000)
    assert(nb2.filter(col("d") > 1e9).count() == 10000) // NaN > anything
  }

  test("stripe blooms on a nested leaf prune unsorted equality probes") {
    // blooms are stream-keyed, so `bloomFilterColumns=st.b` hangs a bloom
    // off the leaf stream; an equality probe for an absent value then
    // prunes every stripe even though min/max ranges all overlap
    val df = spark.range(40000).select(col("id"),
      struct(md5(col("id").cast("string")).as("b"), col("id").as("a")).as("st"))
    val dir = tmpDir("nested-bloom")
    // NOT sorted by st.b: stats ranges overlap across stripes, only the
    // bloom can prove absence
    df.coalesce(1).write.format("nimble").mode("overwrite")
      .option("stripeBytes", "262144").option("rowsPerChunk", "2048")
      .option("bloomFilterColumns", "st.b").save(dir)
    val stripes = graft.spark.NimbleSource
      .footerOf(graft.spark.NimbleSource.listFiles(dir).head).stripes.length
    assert(stripes >= 3, s"fixture needs several stripes, got $stripes")
    val nb = spark.read.format("nimble").load(dir)

    assert(nb.filter(col("st.b") === "not-a-real-md5-value").count() == 0)
    assert(planStats(dir).stripesPruned == stripes,
      s"bloom should prune all $stripes stripes, pruned ${planStats(dir).stripesPruned}")

    // a real value still matches (bloom false-positive-only contract)
    val probe = df.selectExpr("st.b").collect()(12345).getString(0)
    assert(nb.filter(col("st.b") === probe).count() == 1)
  }

  test("chunk-granular skipping works under nested projections") {
    // one stripe, many chunks: stripe pruning can't help, chunk stats must.
    // The writer flushes every stream at the same row boundaries (FlatMap
    // keys backfill absent chunks), so whole-chunk skips stay aligned for
    // any projection shape.
    val df = spark.range(100000).select(col("id"),
      struct(col("id").as("a"), md5(col("id").cast("string")).as("b")).as("st"))
    val dir = tmpDir("nested-chunkskip")
    df.coalesce(1).sortWithinPartitions("id")
      .write.format("nimble").mode("overwrite")
      .option("rowsPerChunk", "2048").save(dir)
    assert(graft.spark.NimbleSource
      .footerOf(graft.spark.NimbleSource.listFiles(dir).head).stripes.length == 1)
    val nb = spark.read.format("nimble").load(dir)

    def skippedDuring(f: => Unit): Long = {
      val before = graft.spark.NimbleSource.chunksSkipped.get()
      f
      graft.spark.NimbleSource.chunksSkipped.get() - before
    }

    // top-level filter with the struct projected: previously the nested
    // projection disabled ALL chunk skipping; now most of the ~49 chunks skip
    val top = nb.filter(col("id") === 54321L)
    val sTop = skippedDuring { assert(top.count() == 1) }
    assert(sTop > 30, s"expected most chunks skipped for a point filter, got $sTop")
    assert(top.select(col("st.b")).collect().length == 1)

    // nested-leaf filter (stats-only): the leaf stream is projected, so its
    // chunk stats drive the same whole-chunk skip
    val leaf = nb.filter(col("st.a").between(10000L, 12000L))
    val sLeaf = skippedDuring {
      assert(leaf.collect().length == 2001)
    }
    assert(sLeaf > 30, s"expected most chunks skipped for a leaf range, got $sLeaf")

    // values stay exact when chunks interleave skip/decode
    val mixed = nb.filter(col("st.a") % 20000L === 0L || col("id") < 3L)
    assert(mixed.count() == df.filter(col("id") % 20000L === 0L || col("id") < 3L).count())
  }
}
