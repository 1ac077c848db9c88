package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Access shim for `private[sql]` session internals (the standard Spark
  * ecosystem pattern for them). Single use today: iterative operators cut
  * their per-round logical plan at the InternalRow level —
  * `Dataset.rdd` + `createDataFrame` would bounce every row through the
  * Row encoder both ways, a 2x per-row conversion tax the plan cut never
  * needs (`graft.ops.Dedup.dedupClusters`). */
object GraftShims {
  /** Wrap an InternalRow RDD as a DataFrame (a `LogicalRDD` leaf plan). */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
