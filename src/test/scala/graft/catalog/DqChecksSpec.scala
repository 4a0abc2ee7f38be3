package graft.catalog

import graft.SparkSpec

/** Pins [[Extras.dqChecks]]'s report shape and the rules the synthetic
  * corpus is KNOWN to satisfy/violate (the oracle compare attests exact
  * counts; this pins semantics a corpus regen would silently change).
  */
class DqChecksSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dq_checks: one row per rule; FK rules have null n_checked") {
    val rows = Extras.dqChecks(spark, dir).collect()
    assert(rows.length === 7)
    val byRule = rows.map(r => r.getString(0) -> r).toMap
    assert(byRule.keySet === Set(
      "lineitem.quantity_in_1_50", "lineitem.price_positive",
      "lineitem.orderkey_resolves", "orders.custkey_resolves",
      "orders.totalprice_positive", "events.value_not_nan",
      "documents.text_nonempty"))
    Seq("lineitem.orderkey_resolves", "orders.custkey_resolves").foreach { r =>
      assert(byRule(r).isNullAt(1), s"$r reports orphans only")
    }
    // the generated warehouse is referentially intact and range-clean
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(r.getLong(2) === 0L, s"rule ${r.getString(0)} unexpectedly fires")
    }
  }
}
