package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.ConcurrentLinkedQueue

/** Streaming observer-hook parity (the streaming half of
  * [[graft.common.ScanMetrics]] — the reference's observer surface is
  * hive-io-exp-core input/HiveApiInputObserver.java:29-56, batch-only;
  * this engine extends the same idea to continuous queries): a
  * `StreamingQueryListener` that collects per-micro-batch progress —
  * input rows, processing rate, and keyed state size — with no
  * per-record hooks, so observation is free at any scale (the numbers
  * come from the progress events Spark already emits).
  */
class StreamMetrics(maxRetained: Int = 1024) extends StreamingQueryListener {

  final case class BatchStats(queryName: String, batchId: Long,
      inputRows: Long, processedRowsPerSec: Double, stateRows: Long)

  // bounded ring: a continuous query emits progress forever, so retention
  // must be O(maxRetained), not O(uptime); totals are kept as aggregates
  private val log = new ConcurrentLinkedQueue[BatchStats]()
  private val totals = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val state = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    val name = Option(p.name).getOrElse("")
    log.add(BatchStats(name, p.batchId,
      p.numInputRows, p.processedRowsPerSecond, state))
    while (log.size > maxRetained) log.poll()
    totals.computeIfAbsent(name,
      _ => new java.util.concurrent.atomic.AtomicLong())
      .addAndGet(p.numInputRows)
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def stats: Seq[BatchStats] = {
    val it = log.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[BatchStats]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  /** Total input rows observed across ALL batches of `queryName` —
    * maintained as a running aggregate, immune to ring eviction. */
  def totalInputRows(queryName: String): Long =
    Option(totals.get(queryName)).map(_.get()).getOrElse(0L)
}
