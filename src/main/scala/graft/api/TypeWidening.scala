package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Widening-only write-assignment semantics, mirroring the reference's
  * `HiveType.checkAndUpgrade` (hive-io-exp-core common/HiveType.java:249
  * and the per-type accept lists at :38-232): writes may widen a narrower
  * integral/floating value into the declared column type; narrowing
  * throws. Verified against the reference's TypeUpgradeTest semantics
  * (output/TypeUpgradeTest.java:60-200).
  */
object TypeWidening {

  /** Rank in the widening lattice; -1 = not a widening-ordered type. */
  private def rank(dt: DataType): Int = dt match {
    case ByteType => 0
    case ShortType => 1
    case IntegerType => 2
    case LongType => 3
    case FloatType => 4
    case DoubleType => 5
    case _ => -1
  }

  /** True iff a value of `from` may be stored in a column of `to`
    * (identical types, or a strictly-widening numeric step — the
    * reference accepts any narrower integral into LONG/FLOAT/DOUBLE and
    * any Number into DOUBLE, HiveType.java:104-143). */
  def canWiden(from: DataType, to: DataType): Boolean =
    from == to || (rank(from) >= 0 && rank(to) >= 0 && rank(from) < rank(to))

  /** Validate a frame against a target schema by column name; cast
    * widening columns up, throw on any narrowing or unknown column —
    * the Spark analog of the reference throwing IllegalArgumentException
    * from checkAndUpgrade on downgrade. */
  def widenTo(df: DataFrame, target: StructType, allowNew: Boolean = false): DataFrame = {
    val targetByName = target.fields.map(f => f.name -> f).toMap
    val cols = df.schema.fields.map { f =>
      targetByName.get(f.name) match {
        case None if allowNew => col(f.name) // opt-in schema evolution
        case None =>
          throw new IllegalArgumentException(
            s"Column ${f.name} not present in target schema ${target.simpleString}")
        case Some(t) =>
          if (f.dataType == t.dataType) col(f.name)
          else if (canWiden(f.dataType, t.dataType)) col(f.name).cast(t.dataType).as(f.name)
          else throw new IllegalArgumentException(
            s"Cannot downgrade column ${f.name}: ${f.dataType.simpleString} -> " +
              s"${t.dataType.simpleString} (widening-only writes)")
      }
    }
    // missing columns in df (present in target) are an arity error, as in
    // the reference's serializer which walks the full inspector — except
    // in schema-evolution mode, where an old-schema writer may omit
    // later-added columns (the files simply lack them; a mergeSchema
    // read null-fills)
    val missing = target.fieldNames.toSet -- df.schema.fieldNames.toSet
    if (missing.nonEmpty && !allowNew)
      throw new IllegalArgumentException(s"Missing columns for write: $missing")
    df.select(cols.toIndexedSeq: _*)
  }
}
