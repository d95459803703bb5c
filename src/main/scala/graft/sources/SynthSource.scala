package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** DataSource V2 implementation — the Spark analog of the reference's
  * Hadoop `InputFormat` surface (SURVEY §2.1 S3/S5: `getSplits` →
  * per-split `RecordReader`, reference input/HiveApiInputFormat.java:
  * 185-214, 312-337). Real tables use Spark's built-in parquet source;
  * this source demonstrates the custom-split path with a deterministic
  * synthetic generator (the role of the reference's benchmark data
  * writer, cmdline output/OutputCmd.java): rows are derived from
  * (seed, id) via splitmix64, so any slice of the table is reproducible
  * on any executor with no data movement — `planInputPartitions` is the
  * `getSplits` analog, `createReader` the `RecordReader`.
  *
  * Pushdown surface (the part the reference does metastore-side,
  * HiveApiInputFormat.java:290-309 + HiveUtils.java:232-249):
  *  - column pruning (`SupportsPushDownRequiredColumns`) — readers emit
  *    only requested fields;
  *  - id-range filter pushdown (`SupportsPushDownFilters`) — =, <, <=,
  *    >, >= on `id` shrink the generated range BEFORE split planning,
  *    so out-of-range splits are never created (split elimination, not
  *    row filtering).
  *
  * Usage:
  *   spark.read.format("graft.sources.SynthSource")
  *     .option("rows", 10000).option("partitions", 8).option("seed", 42)
  *     .load()
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    def num(key: String, default: String): Long = {
      val v = properties.getOrDefault(key, default)
      try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"SynthSource option '$key' must be an integer, got '$v'")
      }
    }
    val rows = num("rows", "1000")
    val partitions = num("partitions", "4")
    if (rows < 0) throw new IllegalArgumentException(s"SynthSource 'rows' must be >= 0, got $rows")
    if (partitions < 1)
      throw new IllegalArgumentException(s"SynthSource 'partitions' must be >= 1, got $partitions")
    new SynthTable(rows, partitions.toInt, num("seed", "42"))
  }
}

object SynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

class SynthTable(rows: Long, partitions: Int, seed: Long) extends Table with SupportsRead {
  override def name(): String = s"synth($rows rows, $partitions splits, seed $seed)"
  override def schema(): StructType = SynthSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScan(rows, partitions, seed)
}

class SynthScan(rows: Long, partitions: Int, seed: Long)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var requiredSchema: StructType = SynthSource.Schema
  private var lower: Long = 0L         // inclusive id bound
  private var upper: Long = rows       // exclusive id bound
  private var pushed: Array[Filter] = Array.empty

  override def build(): Scan = this
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  override def pruneColumns(s: StructType): Unit = requiredSchema = s

  /** Exact id-range pushdown: accepted filters shrink [lower, upper)
    * before split planning, so they need NO post-scan re-evaluation —
    * the returned residual excludes them. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def asLong(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    // saturating increment: x + 1 at Long.MaxValue would wrap negative and
    // turn an always-true bound into an empty scan. Ids are < rows, so
    // saturating at MaxValue keeps the bound exact.
    def inc(x: Long): Long = if (x == Long.MaxValue) x else x + 1
    val residual = filters.filter {
      case EqualTo("id", v) => asLong(v) match {
        case Some(x) => lower = math.max(lower, x); upper = math.min(upper, inc(x)); false
        case None => true
      }
      case GreaterThan("id", v) => asLong(v) match {
        case Some(x) => lower = math.max(lower, inc(x)); false
        case None => true
      }
      case GreaterThanOrEqual("id", v) => asLong(v) match {
        case Some(x) => lower = math.max(lower, x); false
        case None => true
      }
      case LessThan("id", v) => asLong(v) match {
        case Some(x) => upper = math.min(upper, x); false
        case None => true
      }
      case LessThanOrEqual("id", v) => asLong(v) match {
        case Some(x) => upper = math.min(upper, inc(x)); false
        case None => true
      }
      case _ => true
    }
    pushed = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** getSplits analog: contiguous id ranges over the (possibly
    * filter-shrunk) span — eliminated splits are never planned. */
  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, upper - lower)
    if (span == 0) return Array.empty
    // split size is fixed by the table geometry (rows/partitions), so a
    // range filter ELIMINATES splits rather than re-slicing the remainder
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    val splits = ((span + per - 1) / per).toInt
    (0 until splits).map { p =>
      SynthPartition(lower + p * per, math.min(lower + (p + 1) * per, upper), seed,
        requiredSchema.fieldNames): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = SynthReaderFactory
}

case class SynthPartition(start: Long, end: Long, seed: Long,
                          fields: Array[String]) extends InputPartition

object SynthReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        val h = SynthSource.mix(p.seed ^ id)
        // fields drawn from disjoint bit ranges so they are uncorrelated
        val values: Array[Any] = p.fields.map {
          case "id" => id
          case "grp" => ((h >>> 33) & 0x7fffffff).toInt % 10
          case "value" => ((h >>> 11) & 0xfffff).toDouble / 1048576.0
          case "tag" => UTF8String.fromString(if ((h & 1) == 0) "even" else "odd")
        }
        InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
      }
      override def close(): Unit = ()
    }
  }
}
