package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The reference's raison d'être: very wide ML tables — "thousands of
  * columns or streams" (reference: README.md:18-20). A 1000-column table
  * must round-trip, and projecting 3 columns must fetch only 3 streams. */
class WideTableSpec extends SparkTestBase {

  test("1000-column table: round-trip + narrow projection") {
    val nCols = 1000
    val nRows = 5000
    val schema = StructType((0 until nCols).map { i =>
      StructField(s"c$i", i % 4 match {
        case 0 => LongType
        case 1 => DoubleType
        case 2 => StringType
        case _ => IntegerType
      })
    })
    val rdd = spark.sparkContext.parallelize(0 until nRows, 4).map { r =>
      Row.fromSeq((0 until nCols).map { i =>
        i % 4 match {
          case 0 => (r.toLong * 31 + i)
          case 1 => r * 0.5 + i
          case 2 => s"v${(r + i) % 50}"
          case _ => (r + i) % 1000
        }
      })
    }
    val df = spark.createDataFrame(rdd, schema)
    val dir = tmpDir("wide")
    df.write.format("nimble").mode("overwrite").save(dir)

    val nb = spark.read.format("nimble").load(dir)
    assert(nb.count() == nRows)
    // narrow projection: correctness + only the 3 streams are in the plan
    val proj = nb.select("c0", "c501", "c998")
    val expected = df.select("c0", "c501", "c998").collect().map(_.toString).sorted
    val got = proj.collect().map(_.toString).sorted
    assert(got.sameElements(expected))
    val scanLine = proj.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("read=")).getOrElse("")
    assert(scanLine.contains("c0:bigint") && !scanLine.contains("c1:"), scanLine)
    // footer holds 1000 streams; metadata stays cheap to read
    val files = graft.spark.NimbleSource.listFiles(dir)
    val footer = graft.spark.NimbleSource.footerOf(files.head)
    assert(footer.streamKeys.length == nCols)
    // aggregate over one column answered from stats (no data read)
    val agg = nb.agg(min("c0"), max("c0"), count(lit(1)))
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val r = agg.collect()(0)
    assert(r.getLong(2) == nRows)
  }
}
