package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hive `UNIONTYPE<t0, t1, …>` mapping — the last SURVEY §1.2 type with
  * no Catalyst twin (reference hive-io-exp-core
  * common/HiveType.java:219 carries UNION as an opaque collection).
  * Spark has no tagged-union type, so the standard encoding (also what
  * Parquet's own Hive bindings do) is a struct of a small `tag` plus
  * one NULLABLE slot per member, exactly one of which is set:
  *
  *   UNIONTYPE<BIGINT, STRING>  ⇒  STRUCT<tag: INT, u0: BIGINT, u1: STRING>
  *
  * This keeps the columnar layout honest at scale: each member slot is
  * its own parquet column chunk (nulls compress to nothing), predicates
  * on `tag` push down, and projecting one member reads one chunk.
  */
object UnionType {

  /** The struct schema for `UNIONTYPE<members…>`. */
  def schema(members: DataType*): StructType =
    StructType(
      StructField("tag", IntegerType, nullable = false) +:
        members.zipWithIndex.map { case (m, i) =>
          StructField(s"u$i", m, nullable = true)
        })

  /** Construct a union value: `value` occupies slot `tag`, every other
    * slot is a typed NULL. Fails fast on an out-of-range tag or a value
    * that cannot widen into the member type (same discipline as
    * [[TypeWidening.widenTo]]). */
  def create(tag: Int, value: Column, members: DataType*): Column = {
    require(tag >= 0 && tag < members.size,
      s"union tag $tag out of range for ${members.size} members")
    val slots = members.zipWithIndex.map { case (m, i) =>
      (if (i == tag) value.cast(m) else lit(null).cast(m)).as(s"u$i")
    }
    struct((lit(tag).as("tag") +: slots): _*)
  }

  /** The member at slot `i` (NULL when the union holds another tag). */
  def extract(union: Column, i: Int): Column = union.getField(s"u$i")

  /** The active tag of a union value. */
  def tagOf(union: Column): Column = union.getField("tag")

  /** True iff the union value holds member `i`. */
  def isTag(union: Column, i: Int): Column = tagOf(union) === lit(i)
}
