package graft.common

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue

/** Observer-hook parity: the reference exposes `HiveApiInputObserver` /
  * `HiveApiOutputObserver` (hive-io-exp-core input/HiveApiInputObserver
  * .java:29-56, output/HiveApiOutputObserver.java:28-67) purely for
  * metrics (benchmark/MetricsObserver.java). The Spark analog is a
  * `QueryExecutionListener`: per-query rows/bytes/time from the executed
  * plan's SQL metrics, no per-row hooks needed (and none that would
  * survive codegen anyway).
  */
class ScanMetrics extends QueryExecutionListener {

  final case class QueryStats(name: String, durationNs: Long,
                              outputRows: Long, scanBytes: Long)

  private val log = new ConcurrentLinkedQueue[QueryStats]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val leaves = qe.executedPlan.collectLeaves()
    // rows read at the scans (root numOutputRows is rarely populated)
    val rows = leaves.flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
    val bytes = leaves.flatMap(_.metrics.get("filesSize").map(_.value)).sum
    log.add(QueryStats(funcName, durationNs, rows, bytes))
  }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
    log.add(QueryStats(s"$funcName!failed", -1L, -1L, -1L))

  def stats: Seq[QueryStats] = {
    val it = log.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[QueryStats]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  def clear(): Unit = log.clear()
}

object ScanMetrics {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): ScanMetrics = {
    val m = new ScanMetrics
    spark.listenerManager.register(m)
    m
  }
}
