package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the twin-oracle derivation guard (round-16 ADVICE fix): a slice
  * pattern that stops matching its base oracle must fail loudly at
  * oracle-map construction, never silently ship an unsliced twin that
  * only surfaces at sf10 as an oracle resource blow-up.
  */
class TwinSqlSpec extends AnyFunSuite {
  test("subst rewrites a matching pattern") {
    assert(TwinSql.subst("t", "SELECT * FROM documents", "FROM documents",
      "FROM (SELECT * FROM documents WHERE doc_id < 5)") ===
      "SELECT * FROM (SELECT * FROM documents WHERE doc_id < 5)")
  }

  test("subst fails loudly when the pattern does not match") {
    val e = intercept[IllegalArgumentException] {
      TwinSql.subst("t", "SELECT * FROM  documents", "FROM documents", "X")
    }
    assert(e.getMessage.contains("t"))
    assert(e.getMessage.contains("FROM documents"))
  }

  test("subst fails loudly on a PARTIAL miss (reference count drifted)") {
    // the round-16 hardening: a base edit that adds or renames ONE of
    // several table references must fail the derivation, not ship a
    // half-sliced twin that only surfaces at sf10
    val base = "SELECT * FROM documents UNION ALL SELECT * FROM documents"
    val e = intercept[IllegalArgumentException] {
      TwinSql.subst("t", base, "FROM documents", "X", expected = 3)
    }
    assert(e.getMessage.contains("occurs 2"))
    // and the correct pinned count passes
    assert(TwinSql.subst("t", base, "FROM documents", "X", expected = 2) ===
      "SELECT * X UNION ALL SELECT * X")
  }

  test("every contract twin oracle derives without throwing and is sliced") {
    // forces all five lazy oracle maps (the guard runs at construction);
    // each *_sliced entry must differ from SOME base entry only by
    // having at least one sliced-subquery marker in it
    val all = graft.SparkEntry.oracleSql
    val twins = all.keys.filter(_.endsWith("_sliced"))
    assert(twins.size === 29)
    twins.foreach { t =>
      assert(all(t).contains("(SELECT * FROM "), s"$t: no slice subquery in derived SQL")
    }
  }
}
