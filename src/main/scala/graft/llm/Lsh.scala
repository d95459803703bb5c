package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared LSH candidate generation.
  *
  * A naive bucket self-join re-evaluates the whole upstream pipeline
  * (scan → shingle/signature → banding) once per join leg; profiled at
  * sf0.1 that recomputation dominated (12s of 16s). Instead: group ids
  * per bucket and expand in-bucket pairs — upstream runs ONCE and the
  * only exchange is the groupBy on the bucket key. Bucket sizes are
  * bounded by LSH design (that's the point of banding), so the per-group
  * pair expansion is small; at 100 TB the shuffle carries (key, id)
  * pairs only, never signatures or shingle sets. */
private[llm] object Lsh {

  /** Distinct ordered candidate pairs (aName < bName) from rows of
    * (bucket key columns ++ an `id` column). */
  def bucketPairs(banded: DataFrame, keys: Seq[String],
                  aName: String, bName: String): DataFrame =
    banded.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as(aName), y.as(bName)))))).as("p"))
      .select(col(s"p.$aName"), col(s"p.$bName"))
      .dropDuplicates(aName, bName)
}
