package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate-registry hygiene: the driver contract merges four query maps
  * with `++`, where a duplicated name would SILENTLY override another
  * registry's gate — a correctness gate could vanish without any test
  * noticing. Same for oracle entries pointing at queries that no longer
  * exist (the driver would flag them as missing output dirs, burning a
  * round on a typo). */
class RegistrySpec extends AnyFunSuite {
  import graft.queries._

  private val queryMaps = Seq(
    "ParityQueries" -> ParityQueries.queries.keySet,
    "ScalarQueries" -> ScalarQueries.queries.keySet,
    "ExtensionQueries" -> ExtensionQueries.queries.keySet,
    "IngestQueries" -> IngestQueries.queries.keySet)
  private val oracleMaps = Seq(
    "ParityQueries" -> ParityQueries.oracleSql.keySet,
    "ScalarQueries" -> ScalarQueries.oracleSql.keySet,
    "ExtensionQueries" -> ExtensionQueries.oracleSql.keySet,
    "IngestQueries" -> IngestQueries.oracleSql.keySet)

  test("no query name collides across registries") {
    for {
      (na, a) <- queryMaps; (nb, b) <- queryMaps if na < nb
      k <- a intersect b
    } fail(s"query '$k' defined in both $na and $nb — one silently wins")
  }

  test("no oracle entry collides or orphans") {
    for {
      (na, a) <- oracleMaps; (nb, b) <- oracleMaps if na < nb
      k <- a intersect b
    } fail(s"oracle '$k' defined in both $na and $nb")
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every bench headline name resolves to a query") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"stale headline entries: $missing")
  }
}
