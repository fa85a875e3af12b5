package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Committed benchmark artifacts can't go stale against the registry:
  * round 14 shipped a `bench_metric.json` from the PREVIOUS round
  * (224 queries timed against a 233-query registry) because the
  * metric line is captured from stdout in a separate step from
  * `bench_detail.json` — an artifact-refresh omission nothing
  * enforced. Now the suite does (the ReadmeNamesSpec pattern): a
  * snapshot whose metric line was not regenerated for the current
  * registry fails here instead of shipping. */
class ArtifactConsistencySpec extends AnyFunSuite with Matchers {

  private def queriesRun(file: String): Long = {
    val txt = new String(
      Files.readAllBytes(Paths.get(file)), StandardCharsets.UTF_8)
    """"queries_run"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
      .fold(fail(s"$file: no queries_run field"))(_.group(1).toLong)
  }

  test("bench_metric.json was generated against the current registry") {
    queriesRun("bench_metric.json") shouldBe SparkEntry.queries.size.toLong
  }

  test("bench_detail.json times every registered query") {
    val txt = new String(Files.readAllBytes(Paths.get("bench_detail.json")),
      StandardCharsets.UTF_8)
    val missing = SparkEntry.queries.keySet
      .filterNot(n => txt.contains("\"" + n + "\""))
    withClue("bench_detail.json is missing registered queries: ") {
      missing shouldBe empty
    }
  }

}
