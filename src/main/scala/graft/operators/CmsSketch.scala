package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Md5Hash48, PortableHash}

/** Count-min sketch: point-frequency estimation in bounded space — the
  * fourth member of the attestable-sketch family (distinct-count
  * [[KmvSketch]], frequency rank `approx_topk`, value rank
  * [[Quantiles]]). Where `heavy_hitters` answers "which tokens are
  * frequent", the CMS answers "how frequent is THIS token" without ever
  * materializing the vocabulary: the only data-sized operation is a
  * `groupBy(row, col)` count whose output is capped at depth·width
  * OCCUPIED cells (map-side combine does the heavy lifting), so the
  * shuffle volume is a constant however large the corpus. Probes then
  * read depth cells each and take the min — the classic
  * never-underestimates bound (Cormode & Muthukrishnan 2005).
  *
  * All counters are exact integers and the row hashes are the engine's
  * portable seeded [[PortableHash.h48]], so a central replay (the DuckDB
  * oracle) reproduces every cell — and therefore every estimate —
  * bit-identically: an ATTESTED approximate operator, not a rows-only one.
  *
  * Reference analog: the aggregate library's capped/approximate members
  * (`UniqValueCount`'s maxNumItems cap,
  * src/core/org/apache/hadoop/mapred/lib/aggregate/UniqValueCount.java) —
  * bounded-memory summaries standing in for exact global state.
  */
object CmsSketch {

  /** The depth × width counter table over `tokens` (a one-column "word"
    * frame): one output row per OCCUPIED cell `(r, c, cnt)`. The
    * posexplode fans each token into its `depth` (row, col) coordinates
    * in-stage; partial aggregation collapses each task's fan-out to at
    * most depth·width cells before anything moves, so the exchange
    * carries a sketch, never the corpus.
    */
  def cells(tokens: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth×$width")
    val coords = (0 until depth).map(r => PortableHash.h48(col("word"), r) % width)
    tokens
      .select(posexplode(array(coords: _*)).as(Seq("r", "c")))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Driver-side replica of the seeded portable hash — same digest and
    * "seed:value" framing as the engine's `md5_hash48` over
    * `concat_ws(':', seed, value)`, so probe coordinates computed here
    * land on exactly the cells the distributed pass populated.
    */
  def h48(seed: Int, value: String): Long =
    Md5Hash48.hash(UTF8String.fromString(s"$seed:$value"))

  /** Point-frequency estimates for `probes`: per probe, min over the
    * depth rows of its counter cell, 0 for an unoccupied cell. The probe
    * coordinate table is depth·|probes| LITERAL rows built driver-side
    * (the sketch's whole point is that lookups never touch the data), so
    * the join against the bounded cell table is trivially broadcastable
    * and the result is exact-or-overestimate, never under.
    */
  def pointEstimates(
      cellTable: DataFrame,
      probes: Seq[String],
      depth: Int,
      width: Int): DataFrame = {
    require(probes.nonEmpty, "need at least one probe word")
    val spark = cellTable.sparkSession
    import spark.implicits._
    val coords = for { w <- probes; r <- 0 until depth }
      yield (w, r, h48(r, w) % width)
    coords.toDF("word", "r", "c")
      .join(cellTable, Seq("r", "c"), "left")
      .groupBy(col("word"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_freq"))
  }
}
