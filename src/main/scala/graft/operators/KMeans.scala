package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over the embedding corpus — the clustering
  * pass a curation pipeline uses for topic balancing / mixture analysis
  * (group docs by embedding, then sample per cluster).
  *
  * Determinism contract (same policy as [[VectorOps]]): vectors quantize to
  * integers (floor(x·10⁶)); squared-L2 distances are EXACT integer sums, so
  * the argmin (tie-break: lower cluster id) is bit-identical in any engine;
  * centroid updates are floor(intSum / count) through one exact double
  * division. Init = the first k vectors ORDERED BY id (cluster j = seed
  * rank j — robust to non-contiguous id spaces), iterations fixed — the
  * whole run is a pure function of the input, reproducible anywhere, and
  * the DuckDB oracle replays it move for move.
  *
  * Scale shape (the MLlib pattern): ASSIGNMENT is map-only — k·dim centroid
  * literals broadcast inside one codegen expression (array_sort over
  * (dist, id) structs; no join, no shuffle). UPDATE is posexplode →
  * groupBy(cluster, dim) with map-side partial aggregation, so the shuffle
  * carries k·dim rows per partition, not n·dim; the k·dim sum table
  * (~512 longs here) is the ONLY thing the driver ever collects. The
  * quantized corpus is materialized once ([[graft.core.Materialize]]) and rescanned
  * per iteration — iterations × one-scan, the optimal exact-Lloyd I/O.
  */
object KMeans {

  /** @return (vec_id, cluster, sq_dist) after `iters` centroid updates and
    *         a final assignment.
    */
  def cluster(emb: DataFrame, idCol: String, vecCol: String, k: Int,
              iters: Int): DataFrame = {
    val v = graft.core.Materialize(emb.select(col(idCol).as("vec_id"),
        VectorOps.quantize(col(vecCol)).as("qv")))
    // seeds = the first k rows ORDERED BY id (TakeOrderedAndProject — not
    // filter(id < k), which silently under-seeds when ids aren't 0-based
    // contiguous); cluster j = rank j among seeds
    var cents: Array[Array[Long]] = v.orderBy(col("vec_id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(cents.length == k,
      s"k-means init needs ≥ $k vectors, corpus has only ${cents.length}")
    for (_ <- 0 until iters) {
      val sums = assign(v, cents).join(v, "vec_id")
        .select(col("cluster"), posexplode(col("qv")).as(Seq("i", "x")))
        .groupBy(col("cluster"), col("i"))
        .agg(sum(col("x")).as("sv"), count(lit(1)).as("cnt"))
        .collect()
      val next = cents.map(_.clone) // empty cluster keeps its centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
      }
      cents = next
    }
    assign(v, cents)
  }

  /** Map-only nearest-centroid assignment: centroids enter the plan as
    * array literals; sq-dist uses the norm expansion |x|² − 2x·c + |c|²
    * (exact integers, so algebraically interchangeable with Σ(xᵢ−cᵢ)² —
    * the oracle uses the latter).
    */
  private def assign(v: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val dot = (a: Column, b: Column) => call_function("dot_q", a, b)
    val nx = dot(col("qv"), col("qv"))
    val entries = cents.zipWithIndex.map { case (c, j) =>
      val nc = c.map(x => x * x).sum
      struct((nx - lit(2L) * dot(col("qv"), typedLit(c.toSeq)) + lit(nc)).as("d"),
        lit(j).as("j"))
    }
    val best = element_at(array_sort(array(entries.toIndexedSeq: _*)), 1)
    v.select(col("vec_id"), best.getField("j").as("cluster"),
      best.getField("d").as("sq_dist"))
  }

  /** DuckDB twin: replays init, `iters` assign/update rounds, and the final
    * assignment as chained CTEs (dist as Σ(xᵢ−cᵢ)², update as
    * floor(sum/count) with empty clusters keeping their centroid via the
    * LEFT JOIN coalesce).
    */
  def clusterSql(table: String, id: String, vec: String, k: Int, iters: Int,
                 dim: Int): String = {
    val rounds = (0 until iters).map { t =>
      s"""d$t AS (
         |  SELECT vi.vec_id, c.cid, sum((vi.x - c.cv) * (vi.x - c.cv))::BIGINT AS d
         |  FROM vi JOIN c$t c ON c.i = vi.i GROUP BY vi.vec_id, c.cid
         |), a$t AS (
         |  SELECT vec_id, cid AS cluster, d FROM d$t
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
         |), s$t AS (
         |  SELECT a.cluster AS cid, vi.i, sum(vi.x)::BIGINT AS sv, count(*) AS cnt
         |  FROM a$t a JOIN vi ON vi.vec_id = a.vec_id GROUP BY a.cluster, vi.i
         |), c${t + 1} AS (
         |  SELECT c.cid, c.i,
         |    coalesce(floor(s.sv::DOUBLE / s.cnt)::BIGINT, c.cv) AS cv
         |  FROM c$t c LEFT JOIN s$t s ON s.cid = c.cid AND s.i = c.i
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (
       |  SELECT $id AS vec_id, ${VectorOps.quantizeSql(vec)} AS qv FROM $table
       |), vi AS (
       |  SELECT vec_id, r.i, qv[r.i] AS x FROM v CROSS JOIN range(1, ${dim + 1}) r(i)
       |), seeds AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
       |  FROM v ORDER BY vec_id LIMIT $k
       |), c0 AS (
       |  SELECT s.cid, vi.i, vi.x AS cv FROM vi JOIN seeds s USING (vec_id)
       |),
       |$rounds,
       |dF AS (
       |  SELECT vi.vec_id, c.cid, sum((vi.x - c.cv) * (vi.x - c.cv))::BIGINT AS d
       |  FROM vi JOIN c$iters c ON c.i = vi.i GROUP BY vi.vec_id, c.cid
       |)
       |SELECT vec_id, cid::INTEGER AS cluster, d AS sq_dist FROM dF
       |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1""".stripMargin
  }
}
