package graft

import graft.format.Lookup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Randomized cross-check of every index probe surface — Lookup API and the
  * in-scan candidate selection — against Spark-computed truth on a table
  * with nulls, skew, shared-dict-able strings, several files and many small
  * chunks. Seeded: failures reproduce. */
class IndexFuzzSpec extends SparkTestBase {

  test("random point/range/composite probes equal Spark answers (seeded)") {
    val rnd = new scala.util.Random(123)
    val n = 20000
    val schema = StructType(Seq(
      StructField("rid", LongType, nullable = false),
      StructField("k1", LongType, nullable = true),
      StructField("k2", StringType, nullable = true),
      StructField("k3", LongType, nullable = false)))
    val rows = (0 until n).map { i =>
      Row(i.toLong,
        if (rnd.nextInt(11) == 0) null else (rnd.nextInt(500) - 250).toLong,
        if (rnd.nextInt(13) == 0) null else s"g${rnd.nextInt(20)}",
        rnd.nextLong() % 100000)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 3), schema)
    val dir = tmpDir("idxfuzz")
    df.write.format("nimble")
      .option("indexColumns", "k3,k2+k1")
      .option("bloomFilterColumns", "k3")
      .option("rowsPerChunk", "512")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val data = rows // driver-side truth

    def ids(rs: Seq[Map[String, Any]]): Seq[Long] =
      rs.map(_("rid").asInstanceOf[Long]).sorted

    for (trial <- 0 until 25) {
      // point probe on the scrambled hash-indexed column (hit or miss)
      val v3 =
        if (rnd.nextBoolean()) data(rnd.nextInt(n)).getLong(3)
        else rnd.nextLong() % 100000
      val wantP = data.filter(r => r.getLong(3) == v3).map(_.getLong(0)).sorted
      assert(ids(Lookup.pointLookup(dir, "k3", v3)) == wantP, s"trial $trial point k3=$v3")
      val sqlP = nb.filter(col("k3") === v3).select("rid").collect().map(_.getLong(0)).sorted
      assert(sqlP.toSeq == wantP, s"trial $trial SQL point k3=$v3")

      // range probe (narrow, so the gate usually accepts; results exact
      // either way)
      val base = data(rnd.nextInt(n)).getLong(3)
      val (lo, hi) = (base - rnd.nextInt(2000), base + rnd.nextInt(2000))
      val wantR = data.filter(r => r.getLong(3) >= lo && r.getLong(3) <= hi)
        .map(_.getLong(0)).sorted
      assert(ids(Lookup.rangeLookup(dir, "k3", lo, hi)) == wantR, s"trial $trial range [$lo,$hi]")
      val sqlR = nb.filter(col("k3") >= lo && col("k3") <= hi)
        .select("rid").collect().map(_.getLong(0)).sorted
      assert(sqlR.toSeq == wantR, s"trial $trial SQL range [$lo,$hi]")

      // composite probe: eq on k2, range on k1 (nullable members — rows with
      // null k2/k1 never match, in both the index and Spark)
      val s2 = s"g${rnd.nextInt(22)}" // sometimes a missing group
      val (l1, h1) = { val a = rnd.nextInt(500) - 250; (a.toLong - rnd.nextInt(30), a.toLong + rnd.nextInt(30)) }
      val wantC = data.filter { r =>
        !r.isNullAt(2) && r.getString(2) == s2 &&
          !r.isNullAt(1) && r.getLong(1) >= l1 && r.getLong(1) <= h1
      }.map(_.getLong(0)).sorted
      assert(ids(Lookup.compositeLookup(dir, Seq("k2", "k1"), Seq(s2), Some((l1, h1)))) == wantC,
        s"trial $trial composite k2=$s2 k1 in [$l1,$h1]")
      val sqlC = nb.filter(col("k2") === s2 && col("k1").between(l1, h1))
        .select("rid").collect().map(_.getLong(0)).sorted
      assert(sqlC.toSeq == wantC, s"trial $trial SQL composite k2=$s2 k1 in [$l1,$h1]")

      // prefix-only probe: unconstrained trailing member — rows with k1 null
      // MUST appear (SQL semantics; regression for null-skipping writer)
      val wantPfx = data.filter(r => !r.isNullAt(2) && r.getString(2) == s2)
        .map(_.getLong(0)).sorted
      assert(ids(Lookup.compositeLookup(dir, Seq("k2", "k1"), Seq(s2), None)) == wantPfx,
        s"trial $trial composite prefix k2=$s2")
      val sqlPfx = nb.filter(col("k2") === s2).select("rid").collect().map(_.getLong(0)).sorted
      assert(sqlPfx.toSeq == wantPfx, s"trial $trial SQL prefix k2=$s2")
    }
  }

  test("index-assisted probes stay exact under nested projections (seeded)") {
    // the index candidate restriction now runs for any projection shape —
    // probes that ALSO materialize a struct must return identical rows
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(777)
    val n = 30000
    val src = spark.range(n).select(
      pmod(hash(col("id")), lit(500000)).cast("long").as("k"),
      col("id").as("rid"),
      struct(col("id").as("a"), md5(col("id").cast("string")).as("b")).as("st"))
    val dir = tmpDir("idxfuzz-nested")
    src.coalesce(2).write.format("nimble")
      .option("indexColumns", "k").option("rowsPerChunk", "1024")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val keys = src.select("k", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val byKey = keys.groupBy(_._1)
    for (trial <- 0 until 15) {
      val probe =
        if (rnd.nextBoolean()) keys(rnd.nextInt(n))._1
        else rnd.nextLong() % 500000
      val want = byKey.getOrElse(probe, Array.empty).map(_._2).sorted.toSeq
      val got = nb.filter(col("k") === probe)
        .select(col("rid"), col("st.a"), col("st.b"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"trial $trial k=$probe: $got vs $want")
    }
  }
}
