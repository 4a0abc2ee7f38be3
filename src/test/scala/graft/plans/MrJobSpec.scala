package graft.plans

import scala.util.Random

import graft.SparkSpec

class MrJobSpec extends SparkSpec {

  test("values arrive at the reducer sorted by the sort key — every group, any partitioning") {
    val rnd = new Random(13)
    val data = (1 to 500).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
    val input = spark.sparkContext.parallelize(data, 9).map { case (k, v) => (k, v) }
    val out = MrJob.run[Long, Long, Long, Long, Long, Long, Long, Boolean](
      input,
      mapper = (k, v) => Iterator.single(k -> v),
      reducer = (k, values) => {
        val vs = values.toSeq
        Iterator.single(k -> (vs == vs.sorted))
      },
      numReduces = 5,
      sortKey = identity[Long],
      groupKey = identity[Long],
    ).collect()
    assert(out.length == data.map(_._1).distinct.size)
    assert(out.forall(_._2), "some group saw unsorted values")
  }

  test("combiner changes nothing observable (wordcount with/without)") {
    val words = Seq("a b a", "c a b", "b b c a")
    val input = spark.sparkContext.parallelize(words, 3).map(s => (0L, s))
    def run(withCombiner: Boolean) =
      MrJob.run[Long, String, String, Long, Long, String, String, Long](
        input,
        mapper = (_, s) => s.split(" ").iterator.map(_ -> 1L),
        reducer = (w, cs) => Iterator.single(w -> cs.sum),
        combiner = if (withCombiner) Some((_, cs: Iterator[Long]) =>
          Iterator.single(cs.sum)) else None,
        numReduces = 4,
        sortKey = identity[Long],
        groupKey = identity[String],
      ).collect().toSet
    val expected = Set("a" -> 4L, "b" -> 4L, "c" -> 2L)
    assert(run(withCombiner = true) == expected)
    assert(run(withCombiner = false) == expected)
  }

  test("grouping key coarser than the sort key groups contiguously") {
    // sort by (k, v); group by k % 3 is INVALID (not coarser than k within a
    // partition order) — the valid coarse case: K2 is a pair, group by _1
    val data = Seq(((1L, "x"), 10L), ((1L, "y"), 20L), ((2L, "z"), 30L), ((1L, "x"), 5L))
    val input = spark.sparkContext.parallelize(data, 2)
    val out = MrJob.run[(Long, String), Long, (Long, String), Long, Long, Long,
        Long, Seq[Long]](
      input,
      mapper = (k, v) => Iterator.single(k -> v),
      reducer = (g, vs) => Iterator.single(g -> vs.toSeq),
      numReduces = 3,
      sortKey = identity[Long],
      groupKey = (k: (Long, String)) => k._1,
      partition = (k: (Long, String), n: Int) => (k._1.hashCode & Int.MaxValue) % n,
    ).collect().toMap
    // group 1 spans sub-keys (1,x) and (1,y); values sorted within sub-key
    assert(out(1L) == Seq(5L, 10L, 20L))
    assert(out(2L) == Seq(30L))
  }

  test("reducer may abandon a group's values without corrupting the next group") {
    val data = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L))
    val input = spark.sparkContext.parallelize(data, 1)
    val out = MrJob.run[Long, Long, Long, Long, Long, Long, Long, Long](
      input,
      mapper = (k, v) => Iterator.single(k -> v),
      reducer = (k, vs) => Iterator.single(k -> vs.next()), // takes ONE value only
      numReduces = 1,
      sortKey = identity[Long],
      groupKey = identity[Long],
    ).collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 5L))
  }
}
