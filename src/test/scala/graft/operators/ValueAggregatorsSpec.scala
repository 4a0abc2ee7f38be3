package graft.operators

import org.apache.spark.sql.{Encoders, functions => F}

import graft.SparkSpec

class ValueAggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("UniqValueCount is exact below the cap") {
    val uniq = F.udaf(ValueAggregators.UniqValueCount(10), Encoders.STRING)
    val r = Seq("a", "b", "a", "c").toDF("v").agg(uniq($"v")).head().getStruct(0)
    assert(r.getLong(0) == 3L)
    assert(r.getString(1) == "a|b|c")
  }

  test("UniqValueCount caps at maxItems keeping the smallest values") {
    val uniq = F.udaf(ValueAggregators.UniqValueCount(3), Encoders.STRING)
    val vals = Seq("e", "d", "c", "b", "a", "e", "d")
    val r = vals.toDF("v").agg(uniq($"v")).head().getStruct(0)
    assert(r.getLong(0) == 3L)
    assert(r.getString(1) == "a|b|c")
  }

  test("UniqValueCount cap is merge-order independent (partitioned input)") {
    val uniq = F.udaf(ValueAggregators.UniqValueCount(3), Encoders.STRING)
    val vals = (1 to 100).map(i => f"v${(i * 37) % 20}%s")
    val r = spark.createDataset(vals).repartition(7).toDF("v")
      .agg(uniq($"v")).head().getStruct(0)
    val expected = vals.distinct.sorted.take(3)
    assert(r.getLong(0) == 3L)
    assert(r.getString(1) == expected.mkString("|"))
  }

  test("ValueHistogram report: odd distinct count") {
    // freqs: a->3, b->2, c->1 → n=3 min=1 med=2 max=3 avg=2 stddev=sqrt(2/3)
    val hist = F.udaf(ValueAggregators.ValueHistogram(2), Encoders.STRING)
    val r = Seq("a", "a", "a", "b", "b", "c").toDF("v")
      .agg(hist($"v")).head().getStruct(0)
    assert(r.getLong(0) == 3L)       // n_distinct
    assert(r.getLong(1) == 1L)       // min_freq
    assert(r.getDouble(2) == 2.0)    // median_freq
    assert(r.getLong(3) == 3L)       // max_freq
    assert(r.getDouble(4) == 2.0)    // avg_freq
    assert(math.abs(r.getDouble(5) - 0.816497) < 1e-9) // stddev_pop rounded
    assert(r.getString(6) == "a:3|b:2")
  }

  test("ValueHistogram median of even distinct count is the middle mean") {
    val hist = F.udaf(ValueAggregators.ValueHistogram(3), Encoders.STRING)
    // freqs: a->1, b->2, c->4, d->8 → median (2+4)/2 = 3.0
    val vals = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(4)("c") ++ Seq.fill(8)("d")
    val r = vals.toDF("v").agg(hist($"v")).head().getStruct(0)
    assert(r.getDouble(2) == 3.0)
    assert(r.getString(6) == "d:8|c:4|b:2")
  }

  test("ValueHistogram top-items ties break by value ascending") {
    val hist = F.udaf(ValueAggregators.ValueHistogram(3), Encoders.STRING)
    val r = Seq("z", "y", "x", "w").toDF("v").agg(hist($"v")).head().getStruct(0)
    assert(r.getString(6) == "w:1|x:1|y:1")
  }

  test("user-registered aggregator types dispatch through the framework") {
    // the UserDefinedValueAggregatorDescriptor plugin hook
    ValueAggregators.define("LongValueSpread",
      c => F.max(c.cast("long")) - F.min(c.cast("long")))
    assert(ValueAggregators.registered.contains("LongValueSpread"))
    val entries = Seq(
      ("LongValueSpread", "a", 10L), ("LongValueSpread", "a", 3L),
      ("LongValueSum", "b", 5L), ("LongValueSum", "b", 7L))
      .toDF("agg_type", "id", "value")
    val got = graft.catalog.AggregateFramework
      .runAggregators(entries, Seq("LongValueSpread", "LongValueSum"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("LongValueSpread", "a", 7L), ("LongValueSum", "b", 12L)))
    intercept[IllegalArgumentException] {
      graft.catalog.AggregateFramework
        .runAggregators(entries, Seq("NoSuchType"))
    }
  }
}
