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
    assert(Close.fixCounts("12/300 hash-match", n = 10, passes = 99)
      .contains("10/10 hash-match"))
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
}
