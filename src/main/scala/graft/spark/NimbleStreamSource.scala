package graft.spark

import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import scala.collection.mutable

/** Micro-batch streaming source over a nimble directory: each batch = the
  * tablet files that appeared since the last offset (files are immutable and
  * append-only — the format's model, SURVEY.md §1.4 — so a file set IS a
  * valid offset). `maxFilesPerTrigger` rate-limits ingestion via Spark's
  * admission control (same knob as the built-in file source). Pairs with
  * [[NimbleStreamingWrite]] for readStream -> transform -> writeStream
  * pipelines. */
class NimbleMicroBatchStream(path: String, dataSchema: StructType,
    required: StructType, filters: Array[Filter], maxFilesPerTrigger: Int = -1,
    unsignedCols: Set[String] = Set.empty)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def currentFiles: Seq[String] = NimbleSource.listFiles(path)

  override def initialOffset(): Offset = NimbleFilesOffset(Nil)
  override def latestOffset(): Offset = NimbleFilesOffset(currentFiles)

  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger) else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[NimbleFilesOffset].files.toSet
    val fresh = currentFiles.filterNot(seen).sorted
    val taken = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
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
