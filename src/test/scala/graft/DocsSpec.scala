package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI-style doc-drift gate: the generated/maintained docs must agree
  * with the live registry size. When a registry change lands, run
  * `sbt "runMain graft.Close"` to regenerate — these tests stay red
  * until the docs are current (the recurring staleness class every
  * round-close used to fix by hand). */
class DocsSpec extends AnyFunSuite {

  private val n = SparkEntry.queries.size
  private def read(p: String) =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      "UTF-8")

  test("QUERIES.md carries one row per registered query") {
    val rows = read("QUERIES.md").linesIterator.count(_.matches("\\| q\\d.*"))
    assert(rows === n,
      s"QUERIES.md has $rows rows for $n queries - run `sbt \"runMain graft.Close\"`")
  }

  test("SCALE.md mechanical inventory covers the whole registry") {
    val md = read("SCALE.md")
    val sec = md.substring(md.indexOf("## Mechanical plan inventory"))
    val rows = sec.linesIterator.count(_.matches("\\| q\\d.*"))
    assert(rows === n,
      s"SCALE.md inventory has $rows rows for $n queries - run graft.Close")
  }

  test("README/SCALE registry-count references match the registry") {
    val readme = read("README.md")
    assert(readme.contains(s"all $n queries"), "README 'all N queries'")
    assert(readme.contains(s"$n-query"), "README 'N-query'")
    assert(readme.contains(s"$n/$n hash-match"), "README 'N/N hash-match'")
    assert(read("SCALE.md").contains(s"for all $n registered quer"),
      "SCALE.md 'for all N registered queries'")
  }
}
