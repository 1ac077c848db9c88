package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.spark.{DecimalNarrowing, RoundedShiftRight}

/** Stats-proven decimal aggregate narrowing (DecimalNarrowing): the rewrite
  * must be bit-exact against the unrewritten decimal plan — on adversarial
  * values, not just TPC-H-shaped cents — fire only when footer stats prove
  * no overflow anywhere, and actually produce long-typed partial sums. */
class DecimalNarrowingSpec extends SparkTestBase {

  private def withRule[A](on: Boolean)(body: => A): A = {
    spark.conf.set("spark.graft.decimalNarrowing", on.toString)
    try body finally spark.conf.set("spark.graft.decimalNarrowing", "true")
  }

  private def rows(df: DataFrame): Seq[String] = df.collect().map(_.toString).sorted.toSeq

  private def nimbleOf(df: DataFrame, name: String): DataFrame = {
    DecimalNarrowing.install(spark)
    val dir = tmpDir(name)
    df.write.format("nimble").mode("overwrite").save(dir)
    spark.read.format("nimble").load(dir)
  }

  test("RoundedShiftRight matches BigDecimal HALF_UP on adversarial longs") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(0L, 5L, -5L, 15L, -15L, 49L, 50L, 51L, -49L, -50L, -51L,
      999999999999999995L, -999999999999999995L) ++
      Seq.fill(5000)(rnd.nextLong() % 1000000000000L)
    for (x <- cases; d <- Seq(10L, 100L, 1000000L)) {
      val got = RoundedShiftRight(
        org.apache.spark.sql.catalyst.expressions.Literal(x), d).eval(null)
      val want = java.math.BigDecimal.valueOf(x)
        .divide(java.math.BigDecimal.valueOf(d), 0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
      assert(got == want, s"x=$x d=$d got=$got want=$want")
    }
  }

  test("narrowed sums are bit-exact vs the decimal plan on hostile doubles") {
    import spark.implicits._
    // .5-cent boundaries (shortest-repr HALF_UP hazards), negatives, nulls,
    // many decimals, tiny and large magnitudes — the values where a naive
    // round(x*100) would diverge from Spark's cast
    val vals: Seq[java.lang.Double] = Seq[java.lang.Double](
      0.615, -0.615, 1.005, -1.005, 2.675, 0.125, -0.125, 99999.995,
      -99999.995, 0.004999999, 123.456789, -987.654321, 0.0, -0.0,
      1e-9, -1e-9, 54321.125, null, null, 77777.77) ++
      Seq.tabulate(2000)(i => java.lang.Double.valueOf((i * 7919 % 100000) / 100.0 - 250.0)) ++
      Seq.tabulate(500)(i => java.lang.Double.valueOf(math.sin(i) * 1000.0))
    val df = vals.zipWithIndex.map { case (v, i) =>
      val b: java.lang.Double = if (v == null) null else java.lang.Double.valueOf(-v / 3.0)
      (i % 7, v, b)
    }.toDF("g", "a", "b")
    val nb = nimbleOf(df, "narrow-hostile")
    nb.createOrReplaceTempView("hostile")
    val q = """SELECT g,
      sum(CAST(a AS DECIMAL(18,2))) s1,
      sum(CAST(a AS DECIMAL(18,2)) * (1 - CAST(b AS DECIMAL(18,2)))) s2,
      sum(CAST(a AS DECIMAL(18,2)) * (1 - CAST(b AS DECIMAL(18,2))) * (1 + CAST(a AS DECIMAL(18,2)))) s3,
      sum(CAST(a AS DECIMAL(18,4)) - CAST(b AS DECIMAL(18,4))) s4,
      sum(- CAST(a AS DECIMAL(12,3))) s5
      FROM hostile GROUP BY g"""
    val off = withRule(on = false)(rows(spark.sql(q)))
    val before = DecimalNarrowing.rewrites.get()
    val on = withRule(on = true)(rows(spark.sql(q)))
    // s3's per-row bound (~3e20) exceeds 2^62, so it must DECLINE; the other
    // four sums narrow
    assert(DecimalNarrowing.rewrites.get() - before >= 4, "rule did not fire")
    assert(on == off)
  }

  test("integral casts and literal arithmetic narrow exactly") {
    import spark.implicits._
    val df = Seq.tabulate(500)(i => (i % 3, (i * 31 % 2001) - 1000, (i * 17 % 97).toLong))
      .toDF("g", "i", "l")
    val nb = nimbleOf(df, "narrow-int")
    nb.createOrReplaceTempView("narrowint")
    val q = """SELECT g,
      sum(CAST(i AS DECIMAL(18,2)) * 3) s1,
      sum(CAST(l AS DECIMAL(10,0)) + CAST(i AS DECIMAL(10,0))) s2
      FROM narrowint GROUP BY g"""
    val off = withRule(on = false)(rows(spark.sql(q)))
    val on = withRule(on = true)(rows(spark.sql(q)))
    assert(on == off)
  }

  test("partial sums are long-typed in the narrowed physical plan") {
    val nb = Tables.nimble(spark, sf(), "lineitem")
    nb.createOrReplaceTempView("dn_lineitem")
    val p = spark.sql(
      """SELECT l_returnflag, sum(CAST(l_quantity AS DECIMAL(18,2))) s
         FROM dn_lineitem GROUP BY 1""").queryExecution.executedPlan.toString
    assert(p.contains("UnscaledValue"), s"narrowing did not fire:\n$p")
    // the partial aggregate's buffer attribute must be long-typed (the #..L
    // suffix) — that IS the win: no Decimal buffer in the hot loop
    assert(p.contains("partial_sum(UnscaledValue"), s"partial sum not narrowed:\n$p")
  }

  test("narrows through joins on the sound cartesian row bound") {
    val orders = Tables.nimble(spark, sf(), "orders")
    val cust = Tables.nimble(spark, sf(), "customer")
    orders.createOrReplaceTempView("dn_orders")
    cust.createOrReplaceTempView("dn_customer")
    val q = """SELECT c_mktsegment,
      sum(CAST(o_totalprice AS DECIMAL(18,2))) total, count(1) n
      FROM dn_orders JOIN dn_customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment"""
    val off = withRule(on = false)(rows(spark.sql(q)))
    val on = withRule(on = true)(rows(spark.sql(q)))
    assert(on == off)
    val p = spark.sql(q).queryExecution.executedPlan.toString
    assert(p.contains("UnscaledValue"),
      s"join aggregate should narrow (|L|*|R| bound provable at test scale):\n$p")
  }

  test("narrows through UNION ALL (row counts add, per-attr bounds max)") {
    import spark.implicits._
    val a = Seq.tabulate(700)(i => (i % 4, (i * 13 % 5000) / 100.0 - 20.0)).toDF("g", "v")
    val b = Seq.tabulate(900)(i => (i % 4, (i * 7 % 9000) / 100.0 - 40.0)).toDF("g", "v")
    val na = nimbleOf(a, "narrow-union-a"); na.createOrReplaceTempView("dn_ua")
    val nb = nimbleOf(b, "narrow-union-b"); nb.createOrReplaceTempView("dn_ub")
    val q = """SELECT g, sum(CAST(v AS DECIMAL(18,2))) s, count(1) n FROM
      (SELECT * FROM dn_ua UNION ALL SELECT * FROM dn_ub) GROUP BY g"""
    val off = withRule(on = false)(rows(spark.sql(q)))
    val before = DecimalNarrowing.rewrites.get()
    val on = withRule(on = true)(rows(spark.sql(q)))
    assert(on == off)
    assert(DecimalNarrowing.rewrites.get() > before, "rule did not fire through Union")
    val p = spark.sql(q).queryExecution.executedPlan.toString
    assert(p.contains("partial_sum(UnscaledValue"), s"union aggregate not narrowed:\n$p")
    // three-way union with a FILTERED arm still narrows (Filter under Union)
    val q3 = """SELECT sum(CAST(v AS DECIMAL(18,2))) s FROM
      (SELECT * FROM dn_ua UNION ALL SELECT * FROM dn_ub
       UNION ALL SELECT * FROM dn_ua WHERE g = 2)"""
    assert(withRule(on = true)(rows(spark.sql(q3))) == withRule(on = false)(rows(spark.sql(q3))))
    assert(spark.sql(q3).queryExecution.executedPlan.toString.contains("UnscaledValue"))
  }

  test("stored decimal columns narrow via the raw unscaled stream") {
    import spark.implicits._
    // Decimal(<=18) is stored as an unscaled I64 stream, so the narrowed
    // plan reads longs straight off the file — no Decimal objects at all
    val df = Seq.tabulate(3000)(i => (i % 5, BigDecimal(i * 37 % 10000) / 100))
      .toDF("g", "d").select(col("g"), col("d").cast("decimal(12,2)").as("d"))
    val nb = nimbleOf(df, "narrow-stored")
    nb.createOrReplaceTempView("narrowstored")
    // s3 pins the Cast(storedDecimalAttr -> decimal) shape: the r12 review
    // caught the catch-all swallowing attribute children there
    val q = "SELECT g, sum(d) s, sum(d * 3) s2, " +
      "sum(CAST(d AS DECIMAL(16,4))) s3 FROM narrowstored GROUP BY g"
    val off = withRule(on = false)(rows(spark.sql(q)))
    val on = withRule(on = true)(rows(spark.sql(q)))
    assert(on == off)
    val p = spark.sql(q).queryExecution.executedPlan.toString
    assert(p.contains("UnscaledValue"), s"stored-decimal sum should narrow:\n$p")
    // ALL THREE sums narrowed: decimal Sum buffers carry an isEmpty slot,
    // long sums don't — any surviving decimal buffer would show up here
    assert(!p.contains("isEmpty"), s"some sum kept a decimal buffer:\n$p")
    // schema evolution: a second file WITHOUT the column (reads as null)
    // must not break the bound walk — absent files contribute nothing
    val dir2 = tmpDir("narrow-stored-evo")
    df.write.format("nimble").mode("overwrite").save(dir2)
    Seq((99, 1.0)).toDF("g", "other").write.format("nimble").mode("append").save(dir2)
    val evo = spark.read.format("nimble").option("mergeSchema", "true").load(dir2)
    evo.createOrReplaceTempView("narrowevo")
    val qe = "SELECT sum(d) s FROM narrowevo"
    val offE = withRule(on = false)(rows(spark.sql(qe)))
    val onE = withRule(on = true)(rows(spark.sql(qe)))
    assert(onE == offE)
  }

  test("declines when stats cannot prove the sum fits a long") {
    import spark.implicits._
    // values near 1e16: unscaled at scale 2 is ~1e18 per ROW — the total
    // bound blows 10^18 instantly, so the rule must leave decimal math alone
    val df = Seq.tabulate(50)(i => (i % 2, 9.0e15 + i * 1.0e12)).toDF("g", "big")
    val nb = nimbleOf(df, "narrow-decline")
    nb.createOrReplaceTempView("narrowbig")
    val q = "SELECT g, sum(CAST(big AS DECIMAL(38,2))) s FROM narrowbig GROUP BY g"
    val p = spark.sql(q).queryExecution.executedPlan.toString
    assert(!p.contains("UnscaledValue"), s"must decline on unprovable bounds:\n$p")
    // and the decimal result is still produced (sanity)
    assert(spark.sql(q).collect().length == 2)
  }

  test("declines high-precision casts whose unscaled values exceed long range") {
    import spark.implicits._
    // x ~ 1e10 at scale 10: the ORIGINAL plan casts fine (unscaled ~1e20
    // fits decimal(38,10)) but UnscaledValue would throw — the leaf bound
    // must refuse to clamp past 2^62, so the rule declines even when a
    // later scale reduction would shrink the bound (r12 review finding)
    val df = Seq.tabulate(40)(i => (i % 2, 9.0e9 + i * 1e6)).toDF("g", "x")
    val nb = nimbleOf(df, "narrow-wide")
    nb.createOrReplaceTempView("narrowwide")
    val q = """SELECT g, sum(CAST(CAST(x AS DECIMAL(38,10)) AS DECIMAL(18,2))) s
               FROM narrowwide GROUP BY g"""
    val p = spark.sql(q).queryExecution.executedPlan.toString
    assert(!p.contains("UnscaledValue"), s"must decline unscaled-beyond-long leaves:\n$p")
    val off = withRule(on = false)(rows(spark.sql(q)))
    val on = withRule(on = true)(rows(spark.sql(q)))
    assert(on == off)
  }

  test("huge decimal literals decline instead of crashing the optimizer") {
    import spark.implicits._
    val df = Seq((1, 2.5), (1, 3.5), (2, 4.5)).toDF("g", "v")
    val nb = nimbleOf(df, "narrow-hugelit")
    nb.createOrReplaceTempView("narrowhugelit")
    // literal decimal(21,1): unscaled 1.2e20 > Long.MaxValue — toUnscaledLong
    // would throw; the rule must return None and leave the decimal plan alone
    val q = "SELECT g, sum(CAST(v AS DECIMAL(18,2)) * 12345678901234567890.5BD) s " +
      "FROM narrowhugelit GROUP BY g"
    val off = withRule(on = false)(rows(spark.sql(q)))
    val on = withRule(on = true)(rows(spark.sql(q)))
    assert(on == off)
  }

  test("declines off nimble relations (no stats source)") {
    import spark.implicits._
    val df = Seq((1, 2.5), (1, 3.5), (2, 4.5)).toDF("g", "v")
    df.createOrReplaceTempView("narrowmem")
    val p = spark.sql("SELECT g, sum(CAST(v AS DECIMAL(18,2))) s FROM narrowmem GROUP BY g")
      .queryExecution.executedPlan.toString
    assert(!p.contains("MakeDecimal(sum(UnscaledValue"), p)
  }

  test("NaN and whole-file-null columns keep exact parity") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Double)](
      (1, 1.25), (1, Double.NaN), (2, 3.75), (2, null), (3, null))
      .toDF("g", "v")
    val nb = nimbleOf(df, "narrow-nan")
    nb.createOrReplaceTempView("narrownan")
    // NaN casts throw under ANSI in BOTH plans; TRY-mode tolerates in both.
    val q = "SELECT g, sum(TRY_CAST(v AS DECIMAL(18,2))) s FROM narrownan GROUP BY g"
    val off = withRule(on = false)(rows(spark.sql(q)))
    val on = withRule(on = true)(rows(spark.sql(q)))
    assert(on == off)
  }
}
