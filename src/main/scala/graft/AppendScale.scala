package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-append probe (dev tool, SCALE.md evidence): measures the
  * partition-local [[graft.operators.GraphArtifact.append]] cost model
  * on a real corpus — one full build, then appends of growing batch
  * sizes, each reporting wall time and the bucket footprint the batch
  * actually touched. The claim under test: append cost tracks the
  * BATCH (plus its touched buckets' rows), not the corpus — so a tiny
  * daily batch against a huge base must cost a small fraction of the
  * build, and the fraction must track touched-buckets/total-buckets.
  *
  * Bucket count matters here exactly as the scaladoc says: with the
  * local default (32) any realistic batch hashes into every bucket, so
  * the probe builds with a deployment-shaped count (512 default) where
  * partition pruning has something to prune.
  *
  * Usage: `runMain graft.AppendScale <corpusDir> [buckets] [batchOrders...]`
  */
object AppendScale {

  /** ANN leg: `runMain graft.AppendScale ann <corpusDir> [nlist] [batchSizes...]`
    * — same experiment against [[graft.llm.AnnIndex.append]]'s
    * touched-cell dynamic partition overwrite. */
  private def annMain(args: Array[String]): Unit = {
    val dir = args(0)
    val nlist = if (args.length > 1) args(1).toInt else 64
    val batchSizes =
      if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 100, 10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, dir, "embeddings").localCheckpoint(true)
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-scale")
      .toString
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, buildS) = timed(
      graft.llm.AnnIndex.build(emb, idx, nlist = nlist, codes = nlist))
    val n = spark.read.parquet(s"$idx/index").count()
    println(f"ANNAPPEND|$dir|nlist=$nlist|build_s=$buildS%.2f|rows=$n")
    var nextId = emb.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    batchSizes.foreach { k =>
      // k new ids re-carrying existing vectors (frozen-model ingest)
      val batch = emb.limit(k)
        .select((col("vec_id") + lit(nextId)).as("vec_id"), col("embedding"))
      nextId += k
      val (_, appendS) = timed(
        graft.llm.AnnIndex.append(batch, idx, nlist = nlist, codes = nlist))
      val cells = spark.read.parquet(s"$idx/index")
        .where(col("id") >= nextId - k).select("cell").distinct().count()
      println(f"ANNAPPEND|$dir|batch=$k|touched_cells=$cells/$nlist|" +
        f"append_s=$appendS%.2f|vs_build=${appendS / buildS}%.3f")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "ann") { annMain(args.drop(1)); return }
    val dir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 512
    val batchSizes =
      if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(20, 200, 2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.conf.set(graft.operators.GraphArtifact.BucketsKey, buckets.toString)

    val items = graft.operators.GraphArtifact.itemsInline(spark, dir)
      .localCheckpoint(true)
    val clicks = graft.operators.GraphArtifact.clickEdgesInline(spark, dir)
      .localCheckpoint(true)
    val art = java.nio.file.Files.createTempDirectory("graft-append-scale")
      .resolve("graph").toString

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (_, buildS) =
      timed(graft.operators.GraphArtifact.buildFrom(spark, items, clicks, art))
    val nRows = spark.read.parquet(s"$art/copurchase_support").count()
    println(f"APPEND|$dir|buckets=$buckets|build_s=$buildS%.2f|support_rows=$nRows")

    var maxO = items.agg(max("o")).collect()(0).getLong(0)
    val noClicks = Seq.empty[(Long, Long)].toDF("u", "v")
    batchSizes.foreach { n =>
      // n new orders x 4 parts each, deterministic part draws — the
      // daily-ingest shape (orders strictly beyond the base key space)
      val batch = (1 to n).flatMap { i =>
        (1 to 4).map(j => (maxO + i, (i.toLong * 2654435761L + j * 40503L)
          .abs % 20000))
      }.toDF("o", "p")
      maxO += n
      val touched = graft.operators.GraphArtifact.supportFromItems(batch)
        .select(pmod(hash(col("a"), col("b")), lit(buckets)).as("bkt"))
        .distinct().count()
      val (_, appendS) = timed(
        graft.operators.GraphArtifact.append(spark, batch, noClicks, art))
      println(f"APPEND|$dir|batch_orders=$n|touched_buckets=$touched/" +
        f"$buckets|append_s=$appendS%.2f|vs_build=${appendS / buildS}%.3f")
    }
    spark.stop()
  }
}
