package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Randomized cross-check of the filtered-aggregate pushdown surfaces (stats
  * partials, mid-scan mixed-stripe folding, degradation on NaN/truncation)
  * against the same query over the source parquet-side DataFrame. Seeded:
  * failures reproduce. Data deliberately mixes nulls, NaN, duplicate and
  * boundary values, short/long strings, several files and small chunks so
  * stripes classify every way (all-match, none-match, mixed). */
class AggFuzzSpec extends SparkTestBase {

  test("random filters x aggregates equal Spark answers (seeded)") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260813L)
    val rnd = new scala.util.Random(seed)
    val n = 12000

    val src = spark.range(n).selectExpr(
      "id",
      // clustered-ish long: stripes/chunks get tight ranges, so range
      // filters produce all three stripe classifications
      "CAST(id / 37 AS BIGINT) * 37 + id % 5 AS a",
      // nullable long with duplicates
      "CASE WHEN id % 17 = 0 THEN NULL ELSE id % 251 END AS b",
      // double with NaN pockets and negatives
      "CASE WHEN id % 997 = 0 THEN CAST('NaN' AS DOUBLE) ELSE CAST(id % 1000 AS DOUBLE) / 8 - 50 END AS d",
      // strings: low-cardinality + occasional 70-char (truncated-stats) values
      """CASE WHEN id % 23 = 0 THEN NULL
              WHEN id % 301 = 0 THEN concat('zzz_', lpad(CAST(id AS STRING), 66, '7'))
              ELSE concat('s', CAST(id % 40 AS STRING)) END AS s""")
      .cache()
    src.count()
    val dir = tmpDir("aggfuzz")
    src.repartition(3).write.format("nimble").option("rowsPerChunk", "512")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    val aggs: Seq[(String, Column)] = Seq(
      "cnt" -> count(lit(1)), "cb" -> count(col("b")), "cs" -> count(col("s")),
      "mina" -> min("a"), "maxa" -> max("a"), "minb" -> min("b"), "maxb" -> max("b"),
      "mind" -> min("d"), "maxd" -> max("d"), "mins" -> min("s"), "maxs" -> max("s"),
      // sum/avg: decode-fold only (stats carry no sums); d mixes NaN pockets
      // in, which must poison the sum exactly like Spark's own fold
      "suma" -> sum("a"), "sumb" -> sum("b"), "sumd" -> sum("d"),
      "avgb" -> avg("b"), "avgd" -> avg("d"))

    def filterOf(r: scala.util.Random): Column = r.nextInt(7) match {
      case 0 => col("a") >= r.nextInt(n)
      case 1 => col("a") >= r.nextInt(n) && col("a") < r.nextInt(n)
      case 2 => col("b") === r.nextInt(260).toLong
      case 3 => col("s") === s"s${r.nextInt(44)}"
      case 4 => col("d") > (r.nextInt(120) - 60).toDouble
      case 5 => col("b").isNull || col("a") < r.nextInt(n)
      case 6 => lit(true) // unfiltered: stats path or its mid-scan degradation
    }

    def norm(row: org.apache.spark.sql.Row): Seq[Any] = row.toSeq.map {
      // NaN must stay distinguishable from 0.0 (math.round(NaN) is 0): the
      // fuzz exists partly to catch a wrong NaN-degradation answer
      case dd: Double if dd.isNaN => "NaN"
      case dd: Double => math.round(dd * 1e9)
      case other => other
    }

    for (trial <- 0 until 60) {
      val f = filterOf(rnd)
      val picked = rnd.shuffle(aggs).take(1 + rnd.nextInt(aggs.length))
      val cols = picked.map { case (alias, c) => c.as(alias) }
      if (trial % 3 == 2) {
        // grouped arm: GROUP BY the string column (nullable, low-card with
        // occasional 66-char outliers) — the grouped mid-scan fold must
        // match Spark's groupBy over the parquet source exactly
        def run(df: DataFrame) = df.filter(f).groupBy("s")
          .agg(cols.head, cols.tail: _*).collect()
          .map(r => norm(r)).sortBy(_.toString)
        val got = run(nb)
        val exp = run(src)
        assert(got.toSeq == exp.toSeq,
          s"seed=$seed trial=$trial GROUPED filter=$f aggs=${picked.map(_._1)}\n" +
            s" got=${got.take(5).mkString("; ")}\n exp=${exp.take(5).mkString("; ")}")
      } else {
        val got = nb.filter(f).agg(cols.head, cols.tail: _*).collect()(0)
        val exp = src.filter(f).agg(cols.head, cols.tail: _*).collect()(0)
        assert(norm(got) == norm(exp),
          s"seed=$seed trial=$trial filter=$f aggs=${picked.map(_._1)}\n got=$got\n exp=$exp")
      }
    }
    src.unpersist()
  }

  test("random aggregates over nested struct leaves equal Spark answers (seeded)") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L)
    val rnd = new scala.util.Random(seed)
    val n = 12000

    // same value shapes as the flat fuzz, packed into a struct — with
    // whole-struct-null rows interleaved, the exact case where leaf-stream
    // null padding must mirror Spark's field-extraction semantics
    val src = spark.range(n).selectExpr(
      "id",
      """CASE WHEN id % 13 = 11 THEN CAST(NULL AS STRUCT<a: BIGINT, b: BIGINT, d: DOUBLE, s: STRING>)
         ELSE named_struct(
           'a', CAST(id / 37 AS BIGINT) * 37 + id % 5,
           'b', CASE WHEN id % 17 = 0 THEN CAST(NULL AS BIGINT) ELSE id % 251 END,
           'd', CASE WHEN id % 997 = 0 THEN CAST('NaN' AS DOUBLE) ELSE CAST(id % 1000 AS DOUBLE) / 8 - 50 END,
           's', CASE WHEN id % 23 = 0 THEN CAST(NULL AS STRING)
                     WHEN id % 301 = 0 THEN concat('zzz_', lpad(CAST(id AS STRING), 66, '7'))
                     ELSE concat('s', CAST(id % 40 AS STRING)) END)
         END AS st""").cache()
    src.count()
    val dir = tmpDir("aggfuzznested")
    src.repartition(3).write.format("nimble").option("rowsPerChunk", "512")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    val aggs: Seq[(String, Column)] = Seq(
      "cnt" -> count(lit(1)), "cb" -> count(col("st.b")), "cs" -> count(col("st.s")),
      "mina" -> min(col("st.a")), "maxa" -> max(col("st.a")),
      "minb" -> min(col("st.b")), "maxb" -> max(col("st.b")),
      "mind" -> min(col("st.d")), "maxd" -> max(col("st.d")),
      "mins" -> min(col("st.s")), "maxs" -> max(col("st.s")),
      "suma" -> sum(col("st.a")), "sumb" -> sum(col("st.b")), "sumd" -> sum(col("st.d")),
      "avgb" -> avg(col("st.b")))

    // filters on the top-level id push; nested filters stay residual (they
    // block agg pushdown entirely — Spark aggregates the filtered scan, a
    // fallback arm worth covering too)
    def filterOf(r: scala.util.Random): Column = r.nextInt(5) match {
      case 0 => col("id") >= r.nextInt(n)
      case 1 => col("id") >= r.nextInt(n) && col("id") < r.nextInt(n)
      case 2 => col("st.b") === r.nextInt(260).toLong
      case 3 => col("st.s") === s"s${r.nextInt(44)}"
      case 4 => lit(true)
    }

    def norm(row: org.apache.spark.sql.Row): Seq[Any] = row.toSeq.map {
      case dd: Double if dd.isNaN => "NaN"
      case dd: Double => math.round(dd * 1e9)
      case other => other
    }

    for (trial <- 0 until 40) {
      val f = filterOf(rnd)
      val picked = rnd.shuffle(aggs).take(1 + rnd.nextInt(aggs.length))
      val cols = picked.map { case (alias, c) => c.as(alias) }
      if (trial % 4 == 3) {
        def run(df: DataFrame) = df.filter(f).groupBy(col("st.s"))
          .agg(cols.head, cols.tail: _*).collect()
          .map(r => norm(r)).sortBy(_.toString)
        val got = run(nb)
        val exp = run(src)
        assert(got.toSeq == exp.toSeq,
          s"seed=$seed trial=$trial NESTED GROUPED filter=$f aggs=${picked.map(_._1)}\n" +
            s" got=${got.take(5).mkString("; ")}\n exp=${exp.take(5).mkString("; ")}")
      } else {
        val got = nb.filter(f).agg(cols.head, cols.tail: _*).collect()(0)
        val exp = src.filter(f).agg(cols.head, cols.tail: _*).collect()(0)
        assert(norm(got) == norm(exp),
          s"seed=$seed trial=$trial NESTED filter=$f aggs=${picked.map(_._1)}\n got=$got\n exp=$exp")
      }
    }
    src.unpersist()
  }
}
