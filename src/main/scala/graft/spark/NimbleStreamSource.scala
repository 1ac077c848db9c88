package graft.spark

import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import scala.collection.mutable

/** Micro-batch streaming source over a nimble directory: each batch = the
  * tablet files that appeared since the last offset (files are immutable and
  * append-only — the format's model, SURVEY.md §1.4 — so a file set IS a
  * valid offset). `maxFilesPerTrigger` / `maxBytesPerTrigger` rate-limit
  * ingestion via Spark's admission control (same knobs as the built-in file
  * source; bytes admit at least one file so a jumbo file can't stall the
  * stream). Pairs with
  * [[NimbleStreamingWrite]] for readStream -> transform -> writeStream
  * pipelines. */
class NimbleMicroBatchStream(path: String, dataSchema: StructType,
    required: StructType, filters: Array[Filter], maxFilesPerTrigger: Int = -1,
    unsignedCols: Set[String] = Set.empty, maxBytesPerTrigger: Long = -1L)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def currentFiles: Seq[String] = NimbleSource.listFiles(path)

  override def initialOffset(): Offset = NimbleFilesOffset(Nil)
  override def latestOffset(): Offset = NimbleFilesOffset(currentFiles)

  override def getDefaultReadLimit: ReadLimit = {
    val limits = Seq(
      if (maxFilesPerTrigger > 0) Some(ReadLimit.maxFiles(maxFilesPerTrigger)) else None,
      if (maxBytesPerTrigger > 0) Some(ReadLimit.maxBytes(maxBytesPerTrigger)) else None).flatten
    limits match {
      case Nil => ReadLimit.allAvailable()
      case one :: Nil => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[NimbleFilesOffset].files.toSet
    val fresh = currentFiles.filterNot(seen).sorted
    def admit(fs: Seq[String], l: ReadLimit): Seq[String] = l match {
      case m: ReadMaxFiles => fs.take(m.maxFiles())
      case b: ReadMaxBytes =>
        // admit files until the byte budget is spent; always at least one
        // (bytes-per-trigger is a rate knob, not a hard gate — the built-in
        // file source admits the same way)
        var budget = b.maxBytes()
        fs.takeWhile { f =>
          val sz = graft.format.GraftIO.status(f).length
          val ok = budget >= sz || budget == b.maxBytes()
          if (ok) budget -= sz
          ok
        }
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.foldLeft(fs)(admit)
      case _ => fs
    }
    val taken = admit(fresh, limit)
    NimbleFilesOffset((seen ++ taken).toSeq)
  }
  override def deserializeOffset(json: String): Offset =
    NimbleFilesOffset(json.split('\n').toSeq.filter(_.nonEmpty))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[NimbleFilesOffset].files.toSet
    val batchFiles = end.asInstanceOf[NimbleFilesOffset].files.filterNot(seen)
    val parts = mutable.ArrayBuffer[InputPartition]()
    for (f <- batchFiles) {
      val footer = NimbleSource.footerOf(f)
      var s = 0
      while (s < footer.stripes.length) {
        parts += NimbleMultiPartition(Array(NimbleStripePartition(f, s)))
        s += 1
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NimbleReaderFactory(dataSchema, required, filters,
      hadoopConf = graft.format.GraftIO.broadcastConf(), unsignedCols = unsignedCols)
}

case class NimbleFilesOffset(files: Seq[String]) extends Offset {
  override def json(): String = files.sorted.mkString("\n")
}
