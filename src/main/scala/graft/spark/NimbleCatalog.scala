package graft.spark

import java.util

import scala.jdk.CollectionConverters._

import graft.format.GraftIO
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Directory-warehouse catalog for nimble tables — the piece that turns
  * path-based tablets into named tables Spark can plan storage-partitioned
  * joins over (reads through a TableCatalog are the only ones whose bucket
  * transforms Spark resolves, via this catalog's FunctionCatalog `bucket`).
  *
  * ```
  * spark.sql.catalog.gr           = graft.spark.NimbleCatalog
  * spark.sql.catalog.gr.warehouse = /data/warehouse
  * df.writeTo("gr.db.t").partitionedBy(bucket(16, $"k")).create()
  * spark.table("gr.db.t1").join(spark.table("gr.db.t2"), "k") // zero shuffle
  * ```
  *
  * Identifier `gr.ns1.t` maps to directory `<warehouse>/ns1/t`. Table
  * metadata lives in the data files' own footers (schema, sort, bucket
  * spec); the only catalog-side state is a tiny `_table.json` written by
  * createTable so an empty (pre-first-write) table remembers its schema and
  * bucket spec — after the first write the footers are authoritative.
  * Reference for the surface (not the design): the reference engine is
  * file-based the same way (dwio/nimble/tablet/TabletReader.h:23 — all
  * metadata in-file; no separate catalog service). */
class NimbleCatalog extends TableCatalog with FunctionCatalog with SupportsNamespaces
    with ProcedureCatalog {

  /** `CALL cat.system.{compact, compact_small, zorder}(...)` — table
    * maintenance as SQL (see [[NimbleProcedures]]). */
  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    NimbleProcedures.load(ident, dirOf, catName)
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system"))) NimbleProcedures.list()
    else Array.empty

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"nimble catalog '$name': set spark.sql.catalog.$name.warehouse")
  }
  override def name(): String = catName

  private def dirOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).foldLeft(warehouse)(GraftIO.child)
  private def specPath(dir: String): String = GraftIO.child(dir, "_table.json")

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(GraftIO.child)
    if (!GraftIO.exists(dir)) throw new NoSuchNamespaceException(namespace)
    GraftIO.listDirs(dir)
      .filter(d => NimbleSource.listFiles(d).nonEmpty || GraftIO.exists(specPath(d)))
      .map(d => Identifier.of(namespace, d.substring(d.lastIndexOf('/') + 1)))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    val files = NimbleSource.listFiles(dir)
    if (files.isEmpty && !GraftIO.exists(specPath(dir))) throw new NoSuchTableException(ident)
    val spec = readSpec(dir)
    val schema =
      if (files.nonEmpty)
        DataType.fromJson(NimbleSource.footerOf(files.head).schemaJson).asInstanceOf[StructType]
      else DataType.fromJson(spec("schema")).asInstanceOf[StructType]
    // bucket/sort props: prefer the files' own declaration (authoritative —
    // bucketSpecOf refuses when any file disagrees), fall back to the
    // created-but-empty table's pending spec
    val props: Map[String, String] =
      NimbleSource.bucketSpecOf(files) match {
        case Some((cols, n)) =>
          Map("bucketColumns" -> cols.mkString(","), "numBuckets" -> n.toString) ++ sortProp(files)
        case None if files.isEmpty =>
          spec.view.filterKeys(k => k == "bucketColumns" || k == "numBuckets" ||
            LayoutPropKeys(k)).toMap
        case None => sortProp(files)
      }
    // unsignedColumns is a READ-semantics property — it is never
    // materialized in footers (the files store the signed narrow domain),
    // so it rides the spec for the table's whole life. The surfaced schema
    // widens only once files exist: the CREATE-time write (CTAS) validates
    // against the STORED narrow schema, so data always lands in the stored
    // domain (r20; appends after that are refused by NimbleTable's write
    // guard — they would arrive widened).
    val unsignedProp = spec.collectFirst {
      case (k, v) if k.equalsIgnoreCase("unsignedColumns") && v.trim.nonEmpty => v }
    val uCols = unsignedProp.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val outSchema =
      if (files.isEmpty || uCols.isEmpty) schema
      else StructType(schema.fields.map(f =>
        if (uCols(f.name)) f.copy(dataType = graft.format.Fields.unsignedWidened(f.dataType))
        else f))
    new NimbleTable(dir, outSchema,
      props ++ unsignedProp.map("unsignedColumns" -> _))
  }

  /** Physical-layout table properties a CREATE TABLE may declare — they
    * ride the `_table.json` spec until the first write materializes them
    * into footers (after which the files are authoritative, same contract
    * as sortColumns/bucket). */
  private val LayoutPropKeys: Set[String] = Set("sortColumns", "indexColumns",
    "bloomFilterColumns", "flatMapColumns", "timestampNanosColumns",
    "dictionaryArrayColumns", "deduplicatedMapColumns", "rowsPerChunk",
    "stripeBytes")

  private def sortProp(files: Seq[String]): Map[String, String] =
    files.headOption.map(f => NimbleSource.footerOf(f).sortColumns) match {
      case Some(cols) if cols.nonEmpty &&
        files.forall(f => NimbleSource.footerOf(f).sortColumns == cols) =>
        Map("sortColumns" -> cols.mkString(","))
      case _ => Map.empty
    }

  private def readSpec(dir: String): Map[String, String] = {
    val p = specPath(dir)
    if (!GraftIO.exists(p)) return Map.empty
    val txt = new String(GraftIO.readAll(p), "UTF-8")
    org.json4s.jackson.JsonMethods.parse(txt) match {
      case o: org.json4s.JObject => o.values.collect { case (k, v: String) => (k, v) }
      case _ => Map.empty
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (NimbleSource.listFiles(dir).nonEmpty || GraftIO.exists(specPath(dir)))
      throw new TableAlreadyExistsException(ident)
    // accepted transforms: bucket(n, cols...) only — identity/date
    // partitioning is a different layout (directory-per-value) this format
    // does not implement; reject loudly instead of silently ignoring
    val bucket: Option[(Seq[String], Int)] = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "bucket" =>
        val n = t.arguments.collectFirst { case l: Literal[_] => l.value.toString.toInt }
        val cols = t.arguments.collect { case r: NamedReference => r.fieldNames.mkString(".") }
        require(n.nonEmpty && cols.nonEmpty, s"nimble: malformed bucket transform $t")
        Some((cols.toSeq, n.get))
      case other => throw new UnsupportedOperationException(
        s"nimble: unsupported partitioning ${other.mkString(", ")} (only bucket(n, cols...))")
    }
    val props = properties.asScala.toMap
    // unsignedColumns validates at CREATE: every named column must exist
    // and widen (integral stored type) — fail here, not at first read
    props.collectFirst { case (k, v) if k.equalsIgnoreCase("unsignedColumns") => v }
      .foreach { v =>
        v.split(",").map(_.trim).filter(_.nonEmpty).foreach { c =>
          val f = schema.fields.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(
              s"nimble: unsignedColumns: no such column $c"))
          graft.format.Fields.unsignedWidened(f.dataType) // throws on non-integral
        }
      }
    val spec = Map("schema" -> schema.json) ++
      bucket.map { case (c, n) => Map("bucketColumns" -> c.mkString(","),
        "numBuckets" -> n.toString) }.getOrElse(Map.empty) ++
      props.view.filterKeys(k => LayoutPropKeys(k) ||
        k.equalsIgnoreCase("unsignedColumns")).toMap
    GraftIO.mkdirs(dir)
    val json = org.json4s.jackson.JsonMethods.compact(
      org.json4s.JObject(spec.map { case (k, v) => (k, org.json4s.JString(v)) }.toList))
    GraftIO.writeAll(specPath(dir), json.getBytes("UTF-8"))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("nimble: ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (NimbleSource.listFiles(dir).isEmpty && !GraftIO.exists(specPath(dir))) false
    else { GraftIO.delete(dir, recursive = true); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent); val to = dirOf(newIdent)
    if (NimbleSource.listFiles(from).isEmpty && !GraftIO.exists(specPath(from)))
      throw new NoSuchTableException(oldIdent)
    if (NimbleSource.listFiles(to).nonEmpty || GraftIO.exists(specPath(to)))
      throw new TableAlreadyExistsException(newIdent)
    require(GraftIO.rename(from, to), s"nimble: rename $from -> $to failed")
  }

  // ---------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    GraftIO.listDirs(warehouse)
      .filter(d => NimbleSource.listFiles(d).isEmpty && !GraftIO.exists(specPath(d)))
      .map(d => Array(d.substring(d.lastIndexOf('/') + 1))).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    GraftIO.exists(namespace.foldLeft(warehouse)(GraftIO.child))
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    GraftIO.mkdirs(namespace.foldLeft(warehouse)(GraftIO.child))
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("nimble: ALTER NAMESPACE is not supported")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = namespace.foldLeft(warehouse)(GraftIO.child)
    if (!GraftIO.exists(dir)) return false
    // non-cascade drop of a non-empty namespace must raise, not silently
    // report success while File.delete() fails on the non-empty directory
    if (!cascade && GraftIO.listDirs(dir).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        namespace, s"namespace has tables; use CASCADE")
    GraftIO.delete(dir, recursive = cascade)
  }

  // ----------------------------------------------------------- functions

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") NimbleCatalog.BucketFunction
    else throw new NoSuchFunctionException(ident)
}

object NimbleCatalog {
  /** The catalog's `bucket(numBuckets, key)` — the transform both sides of
    * a storage-partitioned join resolve. Semantics are EXACTLY
    * [[NimbleSource.bucketHash]] (= Spark HashPartitioning's placement), so
    * with `spark.sql.sources.v2.bucketing.shuffle.enabled` Spark can even
    * shuffle a non-bucketed join side BY THIS FUNCTION and join it against
    * a bucketed side that never moves. */
  object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, key): pmod(murmur3_32(key, seed 42), numBuckets)"
    override def bind(inputType: StructType): BoundFunction = {
      // graceful refusals only: Spark's function resolution swallows
      // UnsupportedOperationException (falls back to no SPJ) but NOT
      // require's IllegalArgumentException, which would make a readable
      // table crash every scan whenever the bucketing conf is on
      if (inputType.fields.length < 2) throw new UnsupportedOperationException(
        s"nimble bucket(numBuckets, keys...) takes >= 2 arguments, got ${inputType.fields.length}")
      val keyTypes = inputType.fields.drop(1).map(_.dataType)
      keyTypes.foreach {
        case ByteType | ShortType | IntegerType | LongType | DateType |
             TimestampType | TimestampNTZType | StringType | BinaryType | BooleanType => ()
        case dt => throw new UnsupportedOperationException(
          s"nimble bucket: unsupported key type ${dt.simpleString}")
      }
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String =
          s"nimble.bucket(${keyTypes.map(_.catalogString).mkString(",")})"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): Integer = {
          val n = input.getInt(0)
          // fold across key columns exactly like the write side (= Spark
          // HashPartitioning over the same column list)
          var h = 42
          var i = 0
          while (i < keyTypes.length) {
            if (!input.isNullAt(i + 1))
              h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
                .hash(input.get(i + 1, keyTypes(i)), keyTypes(i), h.toLong).toInt
            i += 1
          }
          Integer.valueOf(NimbleSource.pmod(h, n))
        }
      }
    }
  }
}
