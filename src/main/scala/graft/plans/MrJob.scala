package graft.plans

import scala.reflect.ClassTag

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD

/** The MapReduce job algebra as a façade over Spark — the reference's
  * `JobConf` contract (mapper, combiner, reducer, partitioner, output-key
  * comparator, grouping comparator, numReduces;
  * reference: mapred/JobConf.java:539-887) compiled to Spark operations
  * that keep its one non-obvious guarantee: **the reducer sees each group's
  * values in sort order** (the secondary-sort contract,
  * reference: mapred/ReduceTask.java:225-251 ReduceValuesIterator +
  * examples/SecondarySort.java:145-163).
  *
  * Compilation:
  *   - mapper → `flatMap`;
  *   - combiner → per-partition hash-grouped pre-reduce (the reference runs
  *     it per spill, MapTask.java:1271 — same algebraic requirement:
  *     commutative+associative on (K2, V2));
  *   - shuffle+sort → `repartitionAndSortWithinPartitions` on the composite
  *     (K2, V2-sort-key): partition by K2 only, order by (K2, sortKey) —
  *     exactly partitioner + output-key comparator;
  *   - group+reduce → a streaming iterator over each sorted partition that
  *     cuts groups where the GROUPING key changes (the grouping-comparator
  *     semantic: group coarser than the sort), feeding the reducer a lazy,
  *     ordered value iterator — never materializing a group in memory.
  *
  * Plain `groupByKey.flatMapGroups` gives NO value ordering — that's why
  * this façade exists (SURVEY §7 "hard parts"). Declarative DataFrame ops
  * beat this for anything expressible; MrJob is the escape hatch for
  * genuinely order-dependent imperative reducers, at RDD cost (no codegen,
  * no AQE) — which is also the honest statement of what the reference
  * itself always paid.
  */
object MrJob {

  /** Hadoop-style hash partitioning: (hash & MaxInt) % n
    * (reference: mapred/lib/HashPartitioner.java:34). Placement-only —
    * result sets never depend on which partition a key lands in.
    */
  private final class HashPart[K2](n: Int, pf: (K2, Int) => Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = {
      val (k2, _) = key.asInstanceOf[(K2, Any)]
      pf(k2, n)
    }
  }

  def defaultPartition[K2](k: K2, n: Int): Int = (k.hashCode() & Int.MaxValue) % n

  /** Run a full map→[combine]→shuffle/sort→group→reduce job.
    *
    * @param sortKey   value sort key within a key's group (the output-key
    *                  comparator's secondary component); groups arrive at
    *                  the reducer ordered by it
    * @param groupKey  grouping projection of K2 (the grouping comparator);
    *                  defaults to K2 identity. Must be COARSER than or equal
    *                  to K2, and consistent with the partitioner.
    */
  def run[K1, V1, K2: ClassTag: Ordering, V2: ClassTag, S: Ordering, G, K3, V3](
      input: RDD[(K1, V1)],
      mapper: (K1, V1) => IterableOnce[(K2, V2)],
      reducer: (G, Iterator[V2]) => IterableOnce[(K3, V3)],
      combiner: Option[(K2, Iterator[V2]) => IterableOnce[V2]] = None,
      numReduces: Int = 32,
      sortKey: V2 => S,
      groupKey: K2 => G,
      partition: (K2, Int) => Int = defaultPartition[K2] _): RDD[(K3, V3)] = {

    val mapped: RDD[(K2, V2)] = input.flatMap { case (k, v) => mapper(k, v) }

    val combined: RDD[(K2, V2)] = combiner match {
      case None => mapped
      case Some(c) =>
        mapped.mapPartitions { it =>
          // map-side pre-reduce: hash-group this partition's spill
          val buf = scala.collection.mutable.HashMap.empty[K2, List[V2]]
          it.foreach { case (k, v) => buf.update(k, v :: buf.getOrElse(k, Nil)) }
          buf.iterator.flatMap { case (k, vs) =>
            c(k, vs.reverseIterator).iterator.map(k -> _)
          }
        }
    }

    // composite key (K2, sortKey): partition by K2, sort by both
    implicit val compositeOrd: Ordering[(K2, S)] =
      Ordering.Tuple2(implicitly[Ordering[K2]], implicitly[Ordering[S]])
    val keyed: RDD[((K2, S), V2)] =
      combined.map { case (k, v) => ((k, sortKey(v)), v) }
    val sorted = keyed.repartitionAndSortWithinPartitions(
      new HashPart[K2](numReduces, partition))

    sorted.mapPartitions { it =>
      new GroupedIterator(it.map { case ((k2, _), v) => (k2, v) }, groupKey)
        .flatMap { case (g, values) => reducer(g, values).iterator }
    }
  }

  /** Streams (groupKey, sorted-value-iterator) pairs off a sorted partition
    * without buffering a group (the reference's ReduceValuesIterator
    * contract). A group's value iterator left un-exhausted by the reducer
    * is drained automatically before the next group starts.
    */
  private final class GroupedIterator[K2, V2, G](
      underlying: Iterator[(K2, V2)], groupKey: K2 => G)
      extends Iterator[(G, Iterator[V2])] {
    private val in = underlying.buffered
    private var current: Iterator[V2] = Iterator.empty
    def hasNext: Boolean = {
      while (current.hasNext) current.next() // skip any abandoned tail
      in.hasNext
    }
    def next(): (G, Iterator[V2]) = {
      if (!hasNext) throw new NoSuchElementException
      val g = groupKey(in.head._1)
      current = new Iterator[V2] {
        def hasNext: Boolean = in.hasNext && groupKey(in.head._1) == g
        def next(): V2 = in.next()._2
      }
      (g, current)
    }
  }
}
