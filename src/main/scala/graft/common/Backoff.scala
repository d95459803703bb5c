package graft.common

/** Fault-tolerant metadata-op retry — parity with the reference's
  * `BackoffRetryTask` (hive-io-exp-core common/BackoffRetryTask.java:
  * 41-138: 5 tries, randomized exponential backoff from an initial
  * delay). Spark handles task-level retries itself; this wraps
  * driver-side metadata operations (catalog lookups, warehouse IO) the
  * way the reference wrapped Thrift metastore calls.
  *
  * Deterministic jitter (hash of the attempt number) keeps tests
  * reproducible — the reference used Random, cited behavior is "around
  * the exponential curve", not a specific sequence.
  */
object Backoff {

  final case class Policy(maxTries: Int = 5, initialDelayMs: Long = 100)

  /** Run `op`, retrying on exception up to policy.maxTries with
    * exponential backoff; rethrows the last failure (reference throws
    * IOException after exhausting tries, BackoffRetryTask.java:118-129). */
  def retry[T](policy: Policy = Policy())(op: => T): T = {
    var attempt = 0
    var delay = policy.initialDelayMs
    while (true) {
      attempt += 1
      try return op
      catch {
        case e: Exception if attempt < policy.maxTries =>
          // deterministic jitter in [0.5, 1.5) of the nominal delay
          val jitter = 0.5 + (java.lang.Long.hashCode(attempt * 2654435761L) & 0xffff) / 65536.0
          Thread.sleep(math.max(1L, (delay * jitter).toLong))
          delay *= 2
        case e: Exception => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
