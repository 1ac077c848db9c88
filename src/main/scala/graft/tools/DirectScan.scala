package graft.tools

import org.apache.spark.sql.types._
import graft.spark.{NimbleChainReader, NimbleStripePartition}

/** Times the connector's reader path (stream read -> decode -> vector fill)
  * with no Spark job around it: the full per-task scan cost. */
object DirectScan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft-bench/lineitem")
    val cols = if (args.length > 1) args(1).split(",") else Array("l_extendedprice", "l_quantity")
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gft")).sortBy(_.getName)
    val dataSchema = DataType.fromJson(
      graft.spark.NimbleSource.footerOf(files.head.getPath).schemaJson).asInstanceOf[StructType]
    val required = StructType(cols.map(c => dataSchema(c)))
    val items = files.flatMap { f =>
      val footer = graft.spark.NimbleSource.footerOf(f.getPath)
      footer.stripes.indices.map(s => NimbleStripePartition(f.getPath, s))
    }
    for (pass <- 1 to 5) {
      val t0 = System.nanoTime()
      val r = new NimbleChainReader(items, dataSchema, required, Array.empty)
      var rows = 0L
      while (r.next()) rows += r.get().numRows()
      r.close()
      println(f"pass $pass: $rows rows, ${cols.length} cols in ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
  }
}
