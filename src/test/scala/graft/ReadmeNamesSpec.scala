package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Documentation can't drift from the registry: every backticked query
  * name README.md cites must resolve in `SparkEntry.queries` (round 4
  * shipped a README row citing `op_bloom_semi` for a query registered as
  * `op_bloom_join` — a user grepping by the documented name found
  * nothing). */
class ReadmeNamesSpec extends AnyFunSuite with Matchers {

  private val QueryFamilies = Set("cdc", "rel", "adv", "op", "dedup", "sim",
    "text", "corpus", "mm", "gen", "wh", "ts", "analytics", "graph", "curate")

  test("every README-cited query name resolves in the registry") {
    val readme = new String(
      Files.readAllBytes(Paths.get("README.md")), StandardCharsets.UTF_8)
    val cited = "`([a-z]+_[a-z0-9_]+)`".r.findAllMatchIn(readme)
      .map(_.group(1))
      .filter(n => QueryFamilies(n.takeWhile(_ != '_')))
      .toSet
    cited should not be empty
    val unknown = cited.diff(SparkEntry.queries.keySet)
    withClue(s"README cites unregistered query names: ") {
      unknown shouldBe empty
    }
  }
}
