package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.common.{Backoff, ScanMetrics}

/** Parity specs for the reference's fault-tolerance + observer machinery
  * (FaultyCheckOutputSpecsTest / MetricsObserver shapes). */
class CommonSpec extends AnyFunSuite {
  import TestSpark._

  test("backoff retry succeeds within budget, counting attempts") {
    var calls = 0
    val got = Backoff.retry(Backoff.Policy(maxTries = 5, initialDelayMs = 1)) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(got === 42); assert(calls === 3)
  }

  test("backoff retry exhausts budget and rethrows, counting attempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Backoff.retry(Backoff.Policy(maxTries = 4, initialDelayMs = 1)) {
        calls += 1
        throw new RuntimeException(s"always-fails-$calls")
      }
    }
    assert(calls === 4)
    assert(e.getMessage === "always-fails-4")
  }

  test("no retry on first-try success") {
    var calls = 0
    Backoff.retry() { calls += 1 }
    assert(calls === 1)
  }

  test("query execution listener observes scan rows and bytes") {
    val m = ScanMetrics.attach(spark)
    try {
      Tables.t(spark, sf, "nation").collect()
      // listener events deliver asynchronously; poll briefly
      var waited = 0
      while (m.stats.isEmpty && waited < 50) { Thread.sleep(100); waited += 1 }
      assert(m.stats.nonEmpty, "listener should have observed the collect")
      assert(m.stats.exists(_.scanBytes > 0), m.stats.toString)
    } finally spark.listenerManager.unregister(m)
  }

  // InputTest.checkGets parity (reference input/InputTest.java:175-190):
  // wrong-typed access must throw, not silently coerce
  test("wrong-typed dataset access fails at analysis") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Tables.t(spark, sf, "nation").as[(Long, Long, Long)].collect() // n_name is a string
    }
    assert(e.getMessage.contains("n_name") || e.getMessage.toLowerCase.contains("cannot up cast"))
  }

  // conf-options CLI parity (reference conf/AllOptions.java:40-70 +
  // cmdline/ConfOptionsCmd.java:28-33)
  test("conf-options registry is unique-keyed and renders grouped") {
    import graft.common.ConfOptions
    val keys = ConfOptions.all.map(o => s"${o.group}.${o.key}")
    assert(keys.distinct.size === keys.size, "duplicate option keys")
    val out = ConfOptions.render
    assert(out.startsWith("All Options:"))
    for (g <- ConfOptions.all.map(_.group).distinct)
      assert(out.contains(s"$g:\n"), s"missing group $g")
    assert(out.contains("TableSpec.numSplits"))
  }

  // Bench stdout contract: the driver parses the JSON line from a
  // 2000-char stdout tail, so the query map must stay under its budget
  // no matter how many queries are registered
  test("bench compact query map respects the tail budget at any registry size") {
    val small = (1 to 20).map(i => f"q$i%02d_name" -> i * 0.01).toMap
    val smallOut = Bench.compactQueries(small)
    assert(smallOut.length <= 1700)
    assert(!smallOut.contains("omitted_sec"), "small registries keep all keys")
    assert(smallOut.contains("\"q07\":0.07"))
    val big = (1 to 400).map(i => f"q$i%03d_long_query_name" -> i * 0.013).toMap
    val bigOut = Bench.compactQueries(big)
    assert(bigOut.length <= 1700, s"len=${bigOut.length}")
    assert(bigOut.contains("omitted_sec"), "oversized registries fold the fast tail")
    assert(bigOut.contains("\"q400\":5.20"), "slowest query always reported")
    // total is reconstructible: kept values + omitted_sec == full sum
    val kvs = bigOut.stripPrefix("{").stripSuffix("}").split(",")
      .map(_.split(":")).map(a => a(0).replaceAll("\"", "") -> a(1).toDouble).toMap
    assert(math.abs(kvs.values.sum - big.values.sum) < 0.01 * big.size)
    // live registry: within budget, and if the fold engages it may only
    // shave the fastest tail — nearly all queries stay individually
    // reported and the sum stays reconstructible
    val current = SparkEntry.queries.keys.map(_ -> 1.234).toMap
    val curOut = Bench.compactQueries(current)
    assert(curOut.length <= 1700, s"len=${curOut.length}")
    val kept = curOut.stripPrefix("{").stripSuffix("}").split(",")
      .count(!_.startsWith("\"omitted_sec\""))
    assert(kept >= math.min(current.size, 135),
      s"fold dropped too much: $kept entries for ${current.size} queries")
  }

  // reference tailer/Stats.java:48-110 meters rows/s + MB/s and
  // TailerArgs.java:62-66 appends the line to a stats file
  test("tail --append-stats-to accretes parseable stats lines") {
    val line = Tail.statsLine("lineitem", 20L, 2000L, 0.5)
    assert(line.contains("20 rows in 0.50 s"))
    assert(line.contains("40.00 rows/s"))
    assert(line.contains("0.00 MB/s")) // 2 KB / 0.5 s rounds to 0.00 MB/s
    val f = java.nio.file.Files.createTempFile("tail-stats", ".log")
    Tail.appendStats(f.toString, line)
    Tail.appendStats(f.toString, Tail.statsLine("orders", 5L, 500L, 0.25))
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size === 2, "append mode must accrete, not truncate")
    assert(lines.get(0) === line)
    assert(lines.get(1).startsWith("[tail] orders: 5 rows"))
  }

  test("WriterLease: exclusion, same-owner reclaim, TTL break, release-on-throw") {
    import graft.common.WriterLease
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val lease = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("lease").toString, "w.lease")
    // exclusion: a fresh foreign lease fences a second writer out
    WriterLease.acquire(fs, lease, owner = "a@host")
    val ex = intercept[IllegalStateException] {
      WriterLease.acquire(fs, lease, owner = "b@host")
    }
    assert(ex.getMessage.contains("a@host"), "the loser learns the holder")
    assert(fs.exists(lease), "a failed acquire must not break a live lease")
    // same-owner reclaim: a retried writer in the same process proceeds
    WriterLease.acquire(fs, lease, owner = "a@host")
    WriterLease.release(fs, lease)
    // TTL break: an expired lease (crashed holder) yields to anyone
    WriterLease.acquire(fs, lease, owner = "dead@host", ttlMs = -1)
    WriterLease.acquire(fs, lease, owner = "b@host")
    assert(fs.exists(lease))
    // withLease releases on BOTH exits — normal and thrown
    WriterLease.release(fs, lease)
    assert(WriterLease.withLease(fs, lease)(42) === 42)
    assert(!fs.exists(lease))
    intercept[RuntimeException] {
      WriterLease.withLease(fs, lease)(throw new RuntimeException("boom"))
    }
    assert(!fs.exists(lease), "an in-process failure must release the lease")
  }
}
