package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = SynthSource.Schema
  override def toBatch: Batch = this

  /** getSplits analog: contiguous id ranges, one per partition. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).map { p =>
      SynthPartition(p * per, math.min((p + 1) * per, rows), seed): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = SynthReaderFactory
}

case class SynthPartition(start: Long, end: Long, seed: Long) extends InputPartition

object SynthReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        val h = SynthSource.mix(p.seed ^ id)
        // fields drawn from disjoint bit ranges so they are uncorrelated
        InternalRow(id, ((h >>> 33) & 0x7fffffff).toInt % 10,
          ((h >>> 11) & 0xfffff).toDouble / 1048576.0,
          UTF8String.fromString(if ((h & 1) == 0) "even" else "odd"))
      }
      override def close(): Unit = ()
    }
  }
}
