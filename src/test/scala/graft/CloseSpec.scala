package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-close ritual plumbing (graft.Close): the doc-count rewriter
  * must report the last MEASURED hash-match numerator — never silently
  * upgrade a partial-match report to a full-match claim — and must read
  * it from the newest CORRECTNESS round artifact. */
class CloseSpec extends AnyFunSuite {

  test("fixCounts keeps the measured numerator, resizes the denominator") {
    val in = "all 300 queries green; the 300-query registry; " +
      "298/300 hash-match at sf0.01; for all 300 registered queries; " +
      "300-row plan inventory"
    val out = Close.fixCounts(in, n = 303, passes = 301)
    assert(out.contains("all 303 queries"))
    assert(out.contains("303-query"))
    assert(out.contains("301/303 hash-match"),
      "a partial pass count must survive the rewrite")
    assert(out.contains("for all 303 registered queries"))
    assert(out.contains("303-row plan inventory"))
  }

  test("fixCounts clamps an over-counted numerator to the registry size") {
    assert(Close.fixCounts("12/300 hash-match at sf0.01", n = 10, passes = 99)
      .contains("10/10 hash-match at sf0.01"))
  }

  test("fixCounts rewrites ONLY the sf0.01-gate phrase — other tiers untouched") {
    // The round-9 close clobbered README's measured sf1 count (296/296)
    // with the sf0.01 gate's 303/303. The rewrite is now scoped to the
    // "at sf0.01" suffix; tier-distinct wording survives verbatim.
    val in = "gate: 298/300 hash-match at sf0.01; " +
      "sf1: **296/303 DuckDB hash-matches** there; " +
      "bare 50/60 hash-match with no tier suffix"
    val out = Close.fixCounts(in, n = 303, passes = 301)
    assert(out.contains("301/303 hash-match at sf0.01"))
    assert(out.contains("**296/303 DuckDB hash-matches** there"),
      "an sf1-tier measured count must never be rewritten to gate numbers")
    assert(out.contains("bare 50/60 hash-match with no tier suffix"),
      "an untiered count is not the gate's to rewrite")
    // bold-wrapped gate phrase (README style) is still matched
    assert(Close.fixCounts("**290/300 hash-match** at sf0.01", 303, 301)
      .contains("**301/303 hash-match** at sf0.01"))
  }

  test("latestPassCount sorts rounds numerically, not lexicographically") {
    val d = java.nio.file.Files.createTempDirectory("close-numeric")
    def w(name: String, body: String) =
      java.nio.file.Files.writeString(d.resolve(name), body)
    // lexicographic sort would pick r99 as newest; numeric must pick r100
    w("CORRECTNESS_r99.json", """{"a":{"hash_match":true},"b":{"hash_match":true}}""")
    w("CORRECTNESS_r100.json", """{"a":{"hash_match":true}}""")
    assert(Close.latestPassCount(99, d) === 1)
  }

  test("latestPassCount reads hash_match from the NEWEST round artifact") {
    val d = java.nio.file.Files.createTempDirectory("close-arts")
    def w(name: String, body: String) =
      java.nio.file.Files.writeString(d.resolve(name), body)
    w("CORRECTNESS_r02.json",
      """{"a":{"hash_match":true},"b":{"hash_match":true}}""")
    w("CORRECTNESS_r10.json", // r10 sorts AFTER r02 (zero-padded scheme)
      """{"a":{"hash_match":true},"b":{"hash_match":false},"c":{"hash_match":true}}""")
    w("BENCH_r10.json", """{"metric":"x"}""") // must be ignored
    assert(Close.latestPassCount(99, d) === 2)
  }

  test("latestPassCount falls back to n when no artifact exists") {
    val d = java.nio.file.Files.createTempDirectory("close-empty")
    assert(Close.latestPassCount(7, d) === 7)
  }

  test("latestPassCount ignores an UNTRACKED artifact in a git tree (post-close driver drop)") {
    // the round-12 judge window: Close regenerates the README against
    // the artifacts committed at close time, then the driver drops a
    // NEWER untracked CORRECTNESS_r*.json into the tree — the pin and
    // Close must keep reading the same (tracked) set or the suite
    // reddens between every driver gate and the next Close run
    val d = java.nio.file.Files.createTempDirectory("close-git")
    def sh(cmd: String*): Unit = {
      val p = new ProcessBuilder(cmd: _*).directory(d.toFile)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed:\n$out")
    }
    def w(name: String, body: String) =
      java.nio.file.Files.writeString(d.resolve(name), body)
    sh("git", "init", "-q")
    sh("git", "-c", "user.email=t@t", "-c", "user.name=t", "commit",
      "-q", "--allow-empty", "-m", "root")
    w("CORRECTNESS_r05.json",
      """{"a":{"hash_match":true},"b":{"hash_match":true}}""")
    sh("git", "add", "CORRECTNESS_r05.json")
    sh("git", "-c", "user.email=t@t", "-c", "user.name=t", "commit",
      "-q", "-m", "close artifacts")
    w("CORRECTNESS_r06.json", // newer, but untracked — the driver drop
      """{"a":{"hash_match":true},"b":{"hash_match":true},"c":{"hash_match":true}}""")
    assert(Close.latestPassCount(99, d) === 2,
      "must read the newest TRACKED artifact, not the driver's drop")
    // once the next round-open commits it, the fresh artifact governs
    sh("git", "add", "CORRECTNESS_r06.json")
    sh("git", "-c", "user.email=t@t", "-c", "user.name=t", "commit",
      "-q", "-m", "round open: track driver artifacts")
    assert(Close.latestPassCount(99, d) === 3)
  }

  test("sf1Staleness flags missing or src-predating sf1 artifacts; fresh passes") {
    import java.nio.file.{Files => F}
    import java.nio.file.attribute.FileTime
    val d = F.createTempDirectory("close-sf1")
    F.createDirectories(d.resolve("src/main/scala/graft"))
    val src = d.resolve("src/main/scala/graft/X.scala")
    F.writeString(src, "object X")
    // both artifacts missing
    val whyMissing = Close.sf1Staleness(d)
    assert(whyMissing.exists(w => w.contains("TRUTHCHECK_sf1.json is missing")
      && w.contains("BENCH_sf1.json is missing")))
    // artifacts OLDER than the newest src file → stale
    F.writeString(d.resolve("TRUTHCHECK_sf1.json"), "{}")
    F.writeString(d.resolve("BENCH_sf1.json"), "{}")
    val t0 = System.currentTimeMillis()
    F.setLastModifiedTime(d.resolve("TRUTHCHECK_sf1.json"),
      FileTime.fromMillis(t0 - 60000))
    F.setLastModifiedTime(d.resolve("BENCH_sf1.json"),
      FileTime.fromMillis(t0 + 60000))
    F.setLastModifiedTime(src, FileTime.fromMillis(t0))
    val whyOld = Close.sf1Staleness(d)
    assert(whyOld.exists(_.contains("TRUTHCHECK_sf1.json predates")))
    assert(whyOld.forall(!_.contains("BENCH_sf1.json")))
    // both at-or-after the newest src change → fresh
    F.setLastModifiedTime(d.resolve("TRUTHCHECK_sf1.json"),
      FileTime.fromMillis(t0 + 60000))
    assert(Close.sf1Staleness(d).isEmpty)
  }
}
