package graft.common

import org.apache.hadoop.fs.{FileSystem, Path}

/** Exclusive single-writer lease for the persisted-state operators
  * ([[graft.operators.GraphArtifact]], [[graft.llm.AnnIndex]],
  * [[graft.Compact]]). Their crash protocols (WAL pending markers,
  * staged swaps) make every MUTATION atomic against readers and against
  * a retry of the SAME writer — but two SIMULTANEOUS writers would
  * interleave renames undetected; until round 10 that contract lived in
  * scaladoc only. The lease makes it enforced: acquisition is an atomic
  * create-without-overwrite of a marker file (atomic on HDFS-like
  * stores; the local FS's exists+create window is accepted for dev use),
  * the loser FAILS FAST with the holder's identity, and the file
  * carries `{owner, acquired_ms, ttl_ms}` so a crashed holder's lease
  * is reclaimable:
  *
  *  - the SAME owner re-acquires immediately (a retried append in the
  *    same process — the documented repair path — is never blocked);
  *  - a DIFFERENT owner breaks the lease only once `ttl_ms` has
  *    elapsed (default 10 min), then acquires;
  *  - otherwise acquisition throws; the caller retries after the TTL,
  *    or the operator's `repair()` runs once no writer is live.
  *
  * The lease file lives OUTSIDE the renamed trees (a sibling `.lease`
  * for GraphArtifact, whose live dir itself is swapped; a `_writer.
  * lease` inside the state dir for AnnIndex/Compact, whose roots are
  * stable), so no crash-recovery rename can move the lock out from
  * under its holder. Released in `finally` — an in-process failure
  * (including the crash-injection failpoints) releases immediately;
  * only a process death leaves the lease for TTL reclamation.
  */
object WriterLease {

  /** Default time after which a dead holder's lease may be broken. */
  val DefaultTtlMs: Long = 10 * 60 * 1000L

  /** Stable for the calling thread (pid@host#tid), distinct across
    * processes AND across threads of one JVM — two in-process writers
    * fence each other too. Reclaim-by-same-owner is only ever needed
    * after a PROCESS death (in-process failures release the lease in
    * `finally`), where the retry comes from a fresh process and waits
    * out the TTL like any other contender. */
  def processOwner: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
      "#" + Thread.currentThread().getId

  private def tryCreate(fs: FileSystem, path: Path, owner: String,
                        ttlMs: Long): Boolean =
    try {
      val out = fs.create(path, false) // atomic create-no-overwrite
      try out.write(
        s"""{"owner":"$owner","acquired_ms":${System.currentTimeMillis()},"ttl_ms":$ttlMs}"""
          .getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  /** Acquire the lease at `path` or throw. See object doc for the
    * reclaim rules. */
  def acquire(fs: FileSystem, path: Path, owner: String = processOwner,
              ttlMs: Long = DefaultTtlMs): Unit = {
    if (tryCreate(fs, path, owner, ttlMs)) return
    // held: readable content decides reclaim; an unreadable/vanished
    // lease (holder released between our create and read) → one retry
    val (holder, stale) = try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(readFully(fs, path))
      val acq = node.path("acquired_ms").asLong(0L)
      val ttl = node.path("ttl_ms").asLong(DefaultTtlMs)
      (node.path("owner").asText(""),
        System.currentTimeMillis() - acq > ttl)
    } catch { case _: java.io.IOException => ("", true) }
    if (holder == owner || stale) {
      fs.delete(path, false)
      if (tryCreate(fs, path, owner, ttlMs)) return
    }
    throw new IllegalStateException(
      s"writer lease at $path is held by '$holder' — the artifact is " +
        "single-writer: two concurrent mutations would interleave " +
        "renames undetected. Retry after the holder finishes (or after " +
        "its TTL if it crashed).")
  }

  def release(fs: FileSystem, path: Path): Unit = { fs.delete(path, false); () }

  /** Run `body` under the lease, releasing it on every in-process exit. */
  def withLease[T](fs: FileSystem, path: Path, owner: String = processOwner,
                   ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    acquire(fs, path, owner, ttlMs)
    try body finally release(fs, path)
  }

  private def readFully(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }
}
