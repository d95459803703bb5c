package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture up-scaler (dev tool): writes an N× copy of a TESTDATA sf
  * directory by unioning `mult` key-offset copies of every table —
  * foreign keys stay consistent (lineitem.l_orderkey tracks
  * orders.o_orderkey, l_partkey tracks p_partkey, o_custkey tracks
  * c_custkey, events.user_id tracks the user id space), the tiny
  * nation/region dims are copied once, and embeddings get a
  * deterministic per-copy float perturbation (`x + copy·0.001`) so
  * nearest-neighbor distances keep a strict order instead of 10-way
  * exact ties (rank ties would make top-k row_number nondeterministic
  * in BOTH engines and break the hash compare for no real reason).
  * Everything is a pure column transform of the driver fixture —
  * deterministic, no RNG — so the sf1 oracle point is reproducible:
  *
  * {{{ sbt "runMain graft.SfGen /root/testdata/sf0.1 /tmp/sf1 10" }}}
  *
  * then `runMain graft.Verify /tmp/sf1 /tmp/verify_sf1` and
  * `tools/check_oracle.py /tmp/verify_sf1 /tmp/sf1` (minus the
  * quadratic-oracle exclusions listed in the verify skill).
  */
object SfGen {
  /** Key offset per copy — far above any sf0.1 key, far below overflow
    * at any plausible mult. */
  val KeyOff = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val mult = args(2).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[sfgen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    /** `mult` unioned copies, each transformed with its key offset. */
    def copies(df: DataFrame)(f: (DataFrame, Long) => DataFrame): DataFrame =
      (0 until mult).map(i => f(df, i * KeyOff)).reduce(_ unionByName _)
    def off(df: DataFrame, o: Long, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(o)))

    // `embeddings-verbatim` mode writes ONLY the embeddings table, with
    // NO per-copy perturbation — bit-identical vectors under offset ids,
    // the re-encode/duplication shape the collapse ladders measure
    // (round-13's /tmp/sf10e was this corpus built by hand; the flag
    // makes the construction reproducible). Symlink the other tables
    // from a same-mult drift corpus when a probe needs a full dir.
    if (args.lift(3).contains("embeddings-verbatim")) {
      write("embeddings", copies(t("embeddings"))(off(_, _, "vec_id")))
      spark.stop(); return
    }

    write("region", t("region"))
    write("nation", t("nation"))
    // c_name/s_name are key-derived in the fixture (Customer#%09d) —
    // regenerate them from the OFFSET key, otherwise ten copies share
    // one name and every name-grouped / name-tie-broken query changes
    // meaning (first sf1 run: q132's top-supplier tie flipped on it)
    write("customer", copies(t("customer")) { (df, o) =>
      off(df, o, "c_custkey")
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
    })
    write("supplier", copies(t("supplier")) { (df, o) =>
      off(df, o, "s_suppkey")
        .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
    })
    write("part", copies(t("part"))(off(_, _, "p_partkey")))
    write("orders", copies(t("orders"))(off(_, _, "o_orderkey", "o_custkey")))
    write("lineitem", copies(t("lineitem"))(
      off(_, _, "l_orderkey", "l_partkey", "l_suppkey")))
    write("events", copies(t("events"))(off(_, _, "event_id", "user_id")))
    write("documents", copies(t("documents"))(off(_, _, "doc_id")))
    write("embeddings", copies(t("embeddings")) { (df, o) =>
      val i = (o / KeyOff).toFloat
      off(df, o, "vec_id")
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(i * 0.001f)))
    })
    spark.stop()
  }
}
