package graft

/** NimbleDSL-analog REPL (reference: dwio/nimble/tools/NimbleDslVm.h). */
class DslSpec extends SparkTestBase {
  test("SELECT ... WHERE ... LIMIT over a tablet file") {
    import spark.implicits._
    val dir = tmpDir("dsl")
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "name", "v").coalesce(1)
      .write.format("nimble").mode("overwrite").save(dir)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.tools.NimbleDsl.execute(s"SELECT id,name,v FROM $dir WHERE v >= 20 LIMIT 2")
    }
    val lines = out.toString.trim.split("\n")
    assert(lines(0) == "id\tname\tv")
    assert(lines(1) == "2\tb\t20.0" && lines(2) == "3\tc\t30.0", lines.mkString("|"))
    assert(lines.length == 3)
  }

  private def run(stmt: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { graft.tools.NimbleDsl.execute(stmt) }
    out.toString
  }

  test("SHOW NDV: per-column distinct estimates from the v10 sketches") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("dsl_ndv")
    spark.range(20000).select(col("id"), (col("id") % 25).as("g"))
      .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val out = run(s"SHOW NDV $dir")
    assert(out.contains("id"), out)
    val gLine = out.linesIterator.find(_.trim.startsWith("g ")).getOrElse(fail(out))
    val est = gLine.split("ndv~")(1).trim.toLong
    assert(math.abs(est - 25) <= 4, s"g ndv estimate off: $gLine")
  }

  test("SHOW HISTOGRAM: encoding distribution with counts and storage share") {
    val dir = tmpDir("dsl_hist")
    // a constant column (Constant codec) + an increasing id: known buckets
    spark.range(10000).selectExpr("id", "42L AS c")
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "2000")
      .mode("overwrite").save(dir)
    val full = run(s"SHOW HISTOGRAM $dir")
    // 10000 rows / 2000-row chunks = 5 chunks of the constant column
    val constLine = full.linesIterator.find(_.trim.startsWith("Constant")).getOrElse(
      fail(s"no Constant bucket in:\n$full"))
    assert("instances=\\s*(\\d+)".r.findFirstMatchIn(constLine).get.group(1).toInt >= 5, constLine)
    assert(full.contains("%"), "storage percentage column missing")
    // TOP restricts to chunk roots: every instance count is then <= chunk count
    val top = run(s"SHOW HISTOGRAM TOP $dir")
    assert(top.trim.nonEmpty && top.contains("instances="))
    // STRIPE filter parses and produces output for stripe 0
    assert(run(s"SHOW HISTOGRAM TOP STRIPE 0 $dir").contains("instances="))
  }

  test("SHOW HISTOGRAM and `encoding` skip raw index streams (not chunk-framed)") {
    val dir = tmpDir("dsl_hist_idx")
    // composite + hash index: #idx:/#cidx: streams are int count +
    // fixed-width payload — parsing them as chunks threw or misattributed
    spark.range(5000).selectExpr("id", "xxhash64(id) AS k", "CAST(id AS STRING) AS s")
      .coalesce(1).write.format("nimble")
      .option("indexColumns", "k,s+id").option("rowsPerChunk", "1000")
      .mode("overwrite").save(dir)
    val full = run(s"SHOW HISTOGRAM $dir")
    assert(full.contains("instances="), s"histogram must render on an indexed file:\n$full")
    val top = run(s"SHOW HISTOGRAM TOP $dir")
    assert(top.contains("instances="), s"TOP histogram must render on an indexed file:\n$top")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.tools.NimbleDump.main(Array("encoding", dir))
    }
    assert(out.toString.contains("chunks"), s"encoding walk must render:\n$out")
  }

  test("chunkdir: the v14 directory renders offsets/rows/min-max, footer-only") {
    val dir = tmpDir("dsl_cdir")
    spark.range(50000).selectExpr("id", "CAST(id AS STRING) AS s")
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "1000")
      .mode("overwrite").save(dir)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.tools.NimbleDump.main(Array("chunkdir", dir, "id"))
    }
    val txt = out.toString
    assert(txt.contains("stream id"), s"chunkdir must render the stream:\n$txt")
    assert(txt.contains("rows=  1000"), s"chunkdir must show per-frame row counts:\n$txt")
    assert(txt.contains("min=0 max=999"), s"chunkdir must show v14 per-chunk min/max:\n$txt")
  }

  test("sizes: metadata/data split renders and adds up (r16)") {
    val dir = tmpDir("dsl_sizes")
    spark.range(50000).selectExpr("id", "CAST(id AS STRING) AS s")
      .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.tools.NimbleDump.main(Array("sizes", dir))
    }
    val txt = out.toString
    val m = "total=(\\d+) data=(\\d+) meta=(\\d+) ndv=(\\d+) ndv_zstd=(\\d+)".r
      .findFirstMatchIn(txt).getOrElse(fail(s"sizes must render the split:\n$txt"))
    val (total, data, meta, ndv) = (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong, m.group(4).toLong)
    assert(total == data + meta, s"split must add up: $txt")
    assert(data > 0 && meta > 0 && ndv > 0, s"non-trivial file must have all parts: $txt")
    assert(ndv < meta, s"ndv is part of the metadata: $txt")
  }

  test("SHOW INDEX: index columns, regions, entry counts, bloom inventory") {
    val dir = tmpDir("dsl_idx")
    spark.range(5000).selectExpr("id", "xxhash64(id) AS k")
      .coalesce(1).write.format("nimble")
      .option("indexColumns", "k").option("bloomFilterColumns", "id")
      .option("rowsPerChunk", "1000").mode("overwrite").save(dir)
    val out = run(s"SHOW INDEX $dir")
    assert(out.contains("#idx:k (hash)"), s"missing hash index line:\n$out")
    assert(out.contains("entries=5000"), s"missing entry count:\n$out")
    assert("region=\\[\\d+, \\+\\d+\\)".r.findFirstIn(out).isDefined, s"missing region:\n$out")
    assert(out.contains("bloomColumns=id"), s"missing bloom inventory:\n$out")
    // a plain table reports no indexes
    val dir2 = tmpDir("dsl_noidx")
    spark.range(10).coalesce(1).write.format("nimble").mode("overwrite").save(dir2)
    assert(run(s"SHOW INDEX $dir2").contains("(no index streams)"))
  }
}
