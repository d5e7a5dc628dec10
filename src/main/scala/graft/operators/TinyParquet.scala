package graft.operators

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.SparkSession

/** Driver-side reader for the tiny `_meta`-style parquet sidecars every
  * layout carries (a handful of rows of primitive geometry — window,
  * bucket modulus, codebook). `spark.read.parquet(...).head()` costs TWO
  * scheduled Spark jobs per call (distributed footer/schema inference
  * plus the head collect) — pure fixed overhead on every layout open,
  * append, and probe, including the per-trigger latency path of the
  * streaming gates. This reads the same files through parquet-hadoop's
  * Group API in the driver thread: no job, no scheduler round trip,
  * byte-identical values.
  *
  * Only for metadata sidecars: everything is materialized on the driver,
  * so callers must know the directory is O(rows) tiny by contract.
  */
private[graft] object TinyParquet {

  /** All rows under `dir` (non-hidden files), each as fieldName → value.
    * Values decode as Int / Long / Double / Boolean / String plus
    * Seq[Double] / Seq[Long] for LIST columns (the codebook shape).
    * A field null in a row is ABSENT from its map — `contains` is the
    * schema-evolution check, same as the `df.columns.contains` idiom.
    */
  def rows(spark: SparkSession, dir: String): Seq[Map[String, Any]] = {
    val f = Dedup.fsFor(spark, dir)
    val files = f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .sortBy(_.getPath.getName)
    val out = mutable.ArrayBuffer.empty[Map[String, Any]]
    files.foreach { st =>
      val reader: ParquetReader[Group] = ParquetReader
        .builder(new GroupReadSupport(), st.getPath)
        .withConf(spark.sparkContext.hadoopConfiguration)
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          out += groupToMap(g)
          g = reader.read()
        }
      } finally reader.close()
    }
    out.toSeq
  }

  /** The one-row form every `_meta` reader wants; loud on empty. */
  def row(spark: SparkSession, dir: String): Map[String, Any] = {
    val rs = rows(spark, dir)
    require(rs.nonEmpty, s"$dir holds no rows — not a meta sidecar")
    rs.head
  }

  /** Top-level field names of the directory's parquet schema — the
    * `spark.read.parquet(dir).schema.fieldNames` guard-check shape
    * without the distributed schema-inference job. The UNION over every
    * data file's footer (first-seen order), so a multi-file sidecar
    * whose files were written by different builds (schema evolution —
    * e.g. a later file adding `hash_ver`) reports fields that exist in
    * ANY file, matching what a mergeSchema read would surface; the
    * files are O(rows) tiny by the sidecar contract, so the extra
    * footers cost microseconds, and [[rows]] reads them all anyway.
    */
  def fieldNames(spark: SparkSession, dir: String): Seq[String] = {
    val f = Dedup.fsFor(spark, dir)
    val files = f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && {
        val n = s.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .sortBy(_.getPath.getName)
    require(files.nonEmpty, s"$dir holds no data files — not a sidecar")
    val seen = mutable.LinkedHashSet.empty[String]
    files.foreach { st =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(st.getPath, spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .foreach(fld => seen += fld.getName)
      } finally r.close()
    }
    seen.toSeq
  }

  /** Driver-side WRITER twin of [[rows]] for the same tiny sidecars.
    *
    * Every Spark write of an O(rows) sidecar costs one or two scheduled
    * jobs plus the committer's directory dance — pure fixed overhead on
    * build/maintenance paths whose sidecar contents are already
    * driver-local (collected centroid samples, geometry scalars). This
    * writes the identical logical content through parquet-hadoop's
    * Group API in the driver thread: no job, and the file reads back
    * byte-identically through BOTH consumers (Spark scans — the LIST
    * encoding is Spark's standard 3-level `list`/`element` shape, the
    * string annotation UTF8 — and [[rows]]).
    *
    * `fields` declares the schema as (name, type) with types
    * `int | long | double | boolean | string | list<double> | list<long>`
    * — exactly the sidecar shapes. A field absent from a row's map
    * writes as null. The directory is REPLACED (Spark
    * `mode("overwrite")` semantics); the single data file is staged
    * under a dot-prefixed name (invisible to readers) and committed by
    * an atomic rename, so a reader never lists a torn file. Only for
    * O(rows)-tiny sidecars, like [[rows]].
    */
  def write(
      spark: SparkSession,
      dir: String,
      fields: Seq[(String, String)],
      rowMaps: Seq[Map[String, Any]]): Unit = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Types
    val b = Types.buildMessage()
    fields.foreach { case (name, t) =>
      t match {
        case "int" => b.optional(INT32).named(name)
        case "long" => b.optional(INT64).named(name)
        case "double" => b.optional(DOUBLE).named(name)
        case "boolean" => b.optional(BOOLEAN).named(name)
        case "string" => b.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(name)
        case "list<double>" =>
          b.optionalList().requiredElement(DOUBLE).named(name)
        case "list<long>" =>
          b.optionalList().requiredElement(INT64).named(name)
        case other => sys.error(s"TinyParquet.write: unsupported type " +
          s"$other for field $name")
      }
    }
    val schema = b.named("sidecar")
    val f = Dedup.fsFor(spark, dir)
    val dirPath = new Path(dir)
    if (f.exists(dirPath))
      require(f.delete(dirPath, true),
        s"TinyParquet.write: could not clear $dir")
    require(f.mkdirs(dirPath), s"TinyParquet.write: could not create $dir")
    val tmp = new Path(dir, ".part-00000.parquet.tmp")
    val conf = spark.sparkContext.hadoopConfiguration
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(tmp, conf))
      .withType(schema)
      .withConf(conf)
      .build()
    try {
      val gf = new org.apache.parquet.example.data.simple.SimpleGroupFactory(
        schema)
      rowMaps.foreach { m =>
        val g = gf.newGroup()
        fields.foreach { case (name, t) =>
          m.get(name).foreach { v =>
            t match {
              case "int" => g.add(name, v.asInstanceOf[Int])
              case "long" => g.add(name, v.asInstanceOf[Long])
              case "double" => g.add(name, v.asInstanceOf[Double])
              case "boolean" => g.add(name, v.asInstanceOf[Boolean])
              case "string" => g.add(name, v.asInstanceOf[String])
              case "list<double>" =>
                val lg = g.addGroup(name)
                v.asInstanceOf[Seq[Double]].foreach(d =>
                  lg.addGroup("list").add("element", d))
              case "list<long>" =>
                val lg = g.addGroup(name)
                v.asInstanceOf[Seq[Long]].foreach(l =>
                  lg.addGroup("list").add("element", l))
            }
          }
        }
        writer.write(g)
      }
    } finally writer.close()
    require(f.rename(tmp, new Path(dir, "part-00000.parquet")),
      s"TinyParquet.write: commit rename failed under $dir")
  }

  private def groupToMap(g: Group): Map[String, Any] = {
    val t = g.getType
    val b = Map.newBuilder[String, Any]
    (0 until t.getFieldCount).foreach { i =>
      if (g.getFieldRepetitionCount(i) > 0) {
        val field = t.getType(i)
        val name = field.getName
        field match {
          case p: PrimitiveType => b += name -> primitive(g, i, 0, p)
          case gt: GroupType
              if gt.getLogicalTypeAnnotation ==
                LogicalTypeAnnotation.listType() =>
            b += name -> listValues(g.getGroup(i, 0))
          case _ => () // nested structs are not meta-sidecar shapes
        }
      }
    }
    b.result()
  }

  private def primitive(g: Group, i: Int, j: Int, p: PrimitiveType): Any =
    p.getPrimitiveTypeName match {
      case PrimitiveType.PrimitiveTypeName.INT32 => g.getInteger(i, j)
      case PrimitiveType.PrimitiveTypeName.INT64 => g.getLong(i, j)
      case PrimitiveType.PrimitiveTypeName.DOUBLE => g.getDouble(i, j)
      case PrimitiveType.PrimitiveTypeName.FLOAT => g.getFloat(i, j)
      case PrimitiveType.PrimitiveTypeName.BOOLEAN => g.getBoolean(i, j)
      case PrimitiveType.PrimitiveTypeName.BINARY => g.getString(i, j)
      case other =>
        sys.error(s"meta sidecar field ${p.getName}: unsupported $other")
    }

  /** Decode a parquet LIST column (Spark's 3-level encoding, or the
    * 2-level legacy repeated-primitive form) into the leaf values.
    */
  private def listValues(listGroup: Group): Seq[Any] = {
    val n = listGroup.getFieldRepetitionCount(0)
    listGroup.getType.getType(0) match {
      case p: PrimitiveType => // 2-level legacy: repeated primitive
        (0 until n).map(j => primitive(listGroup, 0, j, p))
      case _ => // 3-level: repeated element group holding one leaf
        (0 until n).map { j =>
          val el = listGroup.getGroup(0, j)
          el.getType.getType(0) match {
            case p: PrimitiveType => primitive(el, 0, 0, p)
            case other =>
              sys.error(s"meta sidecar list: unsupported element $other")
          }
        }
    }
  }
}
