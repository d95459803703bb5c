package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH bucket-distribution audit (dev tool, SCALE.md evidence): prints
  * the candidate-bucket size distribution and total pair mass for the
  * q33 (simhash 4×16-bit block) and q32 (minhash banding) families on a
  * corpus — the number that decides whether the grouped pair expansion
  * is safe to evaluate per-bucket in memory or must stream. The
  * round-11 sf10 probe killed the executor with a heartbeat-starved GC
  * spiral inside q33's candidate stage; this tool separates "the corpus
  * really holds quadratic pair mass" (expected: SfGen sf10 is 100
  * verbatim copies of every doc) from "one degenerate bucket holds the
  * whole corpus" (a plan bug). Usage: LshProbe <sfDir> */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.t(spark, dir, "documents")

    def report(label: String, banded: org.apache.spark.sql.DataFrame,
               keys: Seq[String]): Unit = {
      val sizes = banded.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n")).select(col("n"))
      val agg = sizes.agg(
        count(lit(1)).as("buckets"),
        max("n").as("max_n"),
        sum(col("n") * (col("n") - 1) / 2).as("pair_mass"),
        sum(when(col("n") > 1000, 1).otherwise(0)).as("gt1k"),
        sum(when(col("n") > 10000, 1).otherwise(0)).as("gt10k")).collect()(0)
      val top = sizes.orderBy(desc("n")).limit(10)
        .collect().map(_.getLong(0)).mkString(", ")
      println(s"[lshprobe] $label buckets=${agg.get(0)} max=${agg.get(1)} " +
        s"pair_mass=${agg.get(2)} buckets_gt1k=${agg.get(3)} " +
        s"buckets_gt10k=${agg.get(4)} top10=[$top]")
    }

    // q33's banding: 4×16-bit simhash blocks (md5 token hash — the
    // oracle-replayable registry variant)
    val fp33 = docs.select(col("doc_id").as("id"),
      graft.llm.Dedup.md5SimhashBlocks(col("text")).as("blocks"))
    val banded33 = fp33.select(col("id"),
      posexplode(col("blocks"))).select(col("id"),
      col("pos").as("band"), col("col").as("bv"))
    report("q33-simhash", banded33, Seq("band", "bv"))

    // q32's banding: 32 bands × 4-row minhash over 3-shingles
    val banded32 = docs
      .select(col("doc_id").as("id"),
        graft.llm.TextOps.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), posexplode(graft.functions.Hashing.minhashBands(
        col("sh"), 32, 4)))
      .select(col("id"), col("pos").as("band"), col("col").as("bh"))
    report("q32-minhash", banded32, Seq("band", "bh"))

    spark.stop()
  }
}
