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
class StreamMetrics extends StreamingQueryListener {

  final case class BatchStats(queryName: String, batchId: Long,
      inputRows: Long, processedRowsPerSec: Double, stateRows: Long)

  private val log = new ConcurrentLinkedQueue[BatchStats]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val state = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    log.add(BatchStats(Option(p.name).getOrElse(""), p.batchId,
      p.numInputRows, p.processedRowsPerSecond, state))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def stats: Seq[BatchStats] = {
    val it = log.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[BatchStats]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  /** Total input rows observed across all batches of `queryName`. */
  def totalInputRows(queryName: String): Long =
    stats.filter(_.queryName == queryName).map(_.inputRows).sum
}
