package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every oracle has a query, names are
  * unique across the merged registries, and the flagship entry returns
  * rows — the failure modes that would silently weaken the gate (an
  * orphaned oracle key is just dropped; a duplicate name shadows an
  * operator's coverage). */
class ContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("registry names never collide across query groups") {
    import graft.queries._
    val groups = Seq(
      "parity" -> ParityQueries.queries.keySet,
      "scalar" -> ScalarQueries.queries.keySet,
      "extension" -> ExtensionQueries.queries.keySet,
      "ingest" -> IngestQueries.queries.keySet)
    for {
      (na, a) <- groups; (nb, b) <- groups if na < nb
    } assert((a & b).isEmpty, s"$na and $nb both define: ${a & b}")
  }

  test("flagship entry returns rows on the smoke corpus") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
