package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Driver-contract invariants that must hold for EVERY query — cheap
  * structural checks that catch wiring drift before the oracle gate
  * does (no SparkSession needed). */
class ContractSpec extends AnyFlatSpec with Matchers {

  behavior of "SparkEntry contract"

  it should "give every query a DuckDB oracle and every oracle a query" in {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    withClue("queries without an oracle (driver would fall back to a " +
      "weaker rows-only check): ") { (q -- o) shouldBe empty }
    withClue("oracles without a query (dead SQL the driver never runs): ") {
      (o -- q) shouldBe empty
    }
    q.size should be >= 128 // the round-7 floor — growth only
  }

  it should "use lowercase snake_case names throughout" in {
    all(SparkEntry.queries.keys.toSeq) should fullyMatch regex "[a-z0-9_]+"
  }
}
