package graft.common

/** Typed registry of the engine's configuration surface — parity with
  * the reference's option registry + `hiveio conf-options` command
  * (hive-io-exp-core conf/AllOptions.java:40-70 collects every
  * AbstractConfOption and prints them grouped by type;
  * hive-io-exp-cmdline cmdline/ConfOptionsCmd.java:28-33 exposes it).
  *
  * The analog differs in substance because Spark subsumes most of the
  * reference's Hadoop conf keys: what remains configurable here are the
  * API-level knobs (TableSpec/WriteSpec fields, operator parameters) and
  * the few Spark confs the engine itself sets or assumes.
  */
object ConfOptions {

  final case class ConfOption(group: String, key: String, typ: String,
                              default: String, description: String)

  val all: Seq[ConfOption] = Seq(
    ConfOption("input", "TableSpec.table", "string", "(required)",
      "table name under <warehouse>/<database>/"),
    ConfOption("input", "TableSpec.database", "string", "default",
      "database (warehouse subdirectory)"),
    ConfOption("input", "TableSpec.columns", "list<string>", "[] (all)",
      "column projection pushed to the parquet scan"),
    ConfOption("input", "TableSpec.partitionFilter", "Column", "none",
      "partition predicate; prunes directories at plan time"),
    ConfOption("input", "TableSpec.numSplits", "int", "none",
      "split-count hint: table bytes / n becomes maxPartitionBytes on the scan (no shuffle)"),
    ConfOption("output", "WriteSpec.partitionValues", "map<string,string>", "{}",
      "static partition values; empty writes an unpartitioned table"),
    ConfOption("output", "WriteSpec.dropExistingPartition", "boolean", "false",
      "overwrite an existing target partition instead of failing"),
    ConfOption("retry", "Backoff.Policy.maxTries", "int", "5",
      "driver-side metadata-op retries (reference BackoffRetryTask parity)"),
    ConfOption("retry", "Backoff.Policy.initialDelayMs", "long", "100",
      "first retry delay; doubles per attempt with deterministic jitter"),
    ConfOption("dedup", "minhashLsh.shingleK", "int", "3",
      "word-shingle width for MinHash signatures"),
    ConfOption("dedup", "minhashLsh.bands/rowsPerBand", "int/int", "32/4",
      "LSH banding; catch probability 1-(1-j^r)^b at jaccard j"),
    ConfOption("dedup", "minhashLsh.threshold", "double", "0.8",
      "exact-Jaccard verification threshold on candidates"),
    ConfOption("dedup", "simhashPairs.maxHamming", "int", "3",
      "pair radius; 4x16-bit block LSH is complete for <= 3"),
    ConfOption("dedup", "simhashPairs.tokenHash", "string", "xxh64",
      "xxh64 (fastest) or md5 (replayable by external SQL engines)"),
    ConfOption("dedup", "spark.graft.lsh.maxBucket", "int", "unset (uncapped)",
      "opt-in degenerate-bucket cap (recommended 1000 in production); " +
        "drops counted in accumulator graft.lsh.droppedBuckets"),
    ConfOption("similarity", "lshBucketedPairs.bits/tables", "int/int", "12/4",
      "SRP hyperplanes per table / independent tables"),
    ConfOption("similarity", "ivfTopK.nlist/nprobe", "int/int", "16/4",
      "IVF cells / cells probed per query"),
    ConfOption("similarity", "trainCentroids.sampleN/iters", "int/int", "4096/5",
      "k-means sample size (driver-side) and Lloyd iterations"),
    ConfOption("similarity", "pqTopK.m/codes", "int/int", "8/16",
      "PQ blocks per vector / codebook size per block"),
    ConfOption("similarity", "ivfPqTopK.nlist/nprobe/m", "int/int/int", "16/4/8",
      "composed IVF pruning + PQ scoring parameters"),
    ConfOption("maintenance", "Merge.upsert keys", "seq", "-",
      "row-replace upsert join keys; updates must be key-unique"),
    ConfOption("maintenance", "ZOrder.writeZOrdered files", "int", "-",
      "output file count for the Morton-curve layout rewrite"),
    ConfOption("streaming", "upsertSink.seqCol", "string", "-",
      "in-batch last-writer-wins resolution column"),
    ConfOption("streaming", "nearDupAlerts.threshold", "double", "0.8",
      "exact-Jaccard alert threshold against the static LSH index"),
    ConfOption("session", "spark.sql.shuffle.partitions", "int", "#cores",
      "set to the core count on local[N]; cluster deployments size to data"),
    ConfOption("session", "spark.sql.adaptive.enabled", "boolean", "true",
      "AQE assumed on: skew-join split + partition coalescing"),
    ConfOption("session", "spark.sql.legacy.parquet.nanosAsLong", "boolean", "true",
      "required by Tables.t for TIMESTAMP(NANOS) parquet columns"),
    ConfOption("cli", "SPARK_GRAFT_SF_DIR", "env", "/root/testdata/sf0.1",
      "data directory for Bench"),
    ConfOption("cli", "SPARK_GRAFT_CPUS", "env", "4",
      "local[N] parallelism for Bench/Tail"))

  /** Grouped, aligned rendering (AllOptions.allOptionsString shape). */
  def render: String = {
    val sb = new StringBuilder("All Options:\n")
    for ((group, opts) <- all.groupBy(_.group).toSeq.sortBy(_._1)) {
      sb.append(group).append(":\n")
      for (o <- opts.sortBy(_.key))
        sb.append(f"  ${o.key}%-42s ${o.typ}%-18s default: ${o.default}%-22s ${o.description}%n")
    }
    sb.toString
  }
}

/** `hiveio conf-options` CLI parity: print the option registry. */
object ConfOptionsCmd {
  def main(args: Array[String]): Unit = print(ConfOptions.render)
}
