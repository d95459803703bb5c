package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup cell-granularity probe (dev tool, SCALE.md evidence): the
  * within-cell pair stage of [[graft.llm.Similarity.semDedupClusters]]
  * is Σ|cell|² — quadratic in CELL SIZE, linear in corpus only when
  * `nlist` grows with the corpus (the IVF discipline). This main
  * measures, for each requested nlist on a real corpus, the actual
  * pair mass Σ n_c·(n_c−1)/2 from the live assignment (a map-side
  * kernel + one tiny aggregate — seconds at any scale), and optionally
  * times the full clusters query at the LAST nlist (`time` as the
  * final arg) — the measured demonstration that re-granting cells
  * restores linear growth where a fixed nlist explodes.
  *
  * Usage: `runMain graft.SemDedupScale <corpusDir> <nlist1,nlist2,...>
  * [time]` */
object SemDedupScale {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nlists = args(1).split(',').map(_.trim.toInt)
    val timeLast = args.length > 2 && args(2) == "time"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    nlists.foreach { nl =>
      val cents = graft.llm.Similarity.firstNCentroids(emb, nl)
      val hist = graft.llm.Similarity.assignCells(
          emb.select(col("vec_id").as("id"),
            col("embedding").cast("array<double>").as("v")), cents, "v")
        .groupBy("cell").agg(count(lit(1)).as("nc"))
        .agg(sum(expr("nc * (nc - 1) / 2")).as("pairs"),
          max("nc").as("max_cell"), count(lit(1)).as("cells"))
        .collect()(0)
      println(s"SEMSCALE|$dir|n=$n|nlist=$nl|cells=${hist.getLong(2)}|" +
        s"max_cell=${hist.getLong(1)}|pairs=${hist.getDouble(0).toLong}")
    }
    if (timeLast) {
      val nl = nlists.last
      val t0 = System.nanoTime()
      val rows = graft.llm.Similarity
        .semDedupClusters(emb, nlist = nl)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SEMSCALE-TIME|$dir|nlist=$nl|rows=$rows|sec=$sec%.2f")
    }
    spark.stop()
  }
}
