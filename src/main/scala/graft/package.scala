package object graft {
  /** A named engine query: (session, scale-factor dir) => result frame.
    * Results are made deterministic (stable ORDER BY, rounded double
    * aggregates) so the driver's DuckDB-oracle hash compare is exact. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
