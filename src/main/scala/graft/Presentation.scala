package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The final deterministic ORDER BY every query carries exists for the
  * driver's DuckDB-oracle hash compare (sorted rows → stable hash), not
  * for the operator's semantics. In library mode a caller composing these
  * results into further transforms pays a pointless global range exchange
  * for it (SCALE.md caveat 1) — `spark.graft.presentationSort=false`
  * elides the sort on the row-level-output family (q26, q70, q71, q75)
  * where the cost is O(full result), while oracle runs keep the default.
  * PlanSpec pins both modes: zero range exchanges under the flag, the
  * sort present without it.
  */
object Presentation {
  val Key = "spark.graft.presentationSort"

  def sort(df: DataFrame, cols: String*): DataFrame =
    if (df.sparkSession.conf.get(Key, "true").toBoolean)
      df.orderBy(cols.map(col): _*)
    else df
}
