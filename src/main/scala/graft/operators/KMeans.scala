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
    val v = quantized(emb, idCol, vecCol)
    assign(v, fit(v, k, iters))
  }

  /** The quantized (vec_id, qv) projection WITHOUT the internal
    * checkpoint — for callers that materialize/memoize it themselves
    * ([[graft.catalog.LlmPipeline]] shares ONE copy across the cluster,
    * silhouette and every downstream consumer instead of each paying its
    * own quantize + checkpoint).
    */
  def quantizedFrame(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"),
      VectorOps.quantize(col(vecCol)).as("qv"))

  /** Simplified silhouette audit of the SAME deterministic Lloyd run as
    * [[cluster]]: per point, a = distance to its own (nearest) centroid
    * and b = distance to the second-nearest — because assignment IS
    * nearest-centroid, a ≤ b always and s = (b−a)/b ∈ [0, 1): near 1 =
    * well inside its cluster, near 0 = on a boundary. Reported per
    * cluster as the truncating-integer mean of per-point s·1000 — the
    * "is this clustering worth sampling from" audit next to
    * `label_separation`'s label-side check. Map-only serve: both
    * distances fall out of ONE sorted literal-centroid distance array per
    * point (no join, no second pass); at scale the centroid table comes
    * from the training job and this is a single scan.
    */
  def silhouette(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                 iters: Int): DataFrame = {
    val v = quantized(emb, idCol, vecCol)
    silhouetteFrom(v, fit(v, k, iters))
  }

  /** The silhouette readout given an already-quantized frame and the
    * fitted centroids — the serve half of the prepare/serve split: one
    * map-only distance pass + a k-bounded aggregate, no Lloyd re-run.
    */
  def silhouetteFrom(v: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val dot = (a: Column, b: Column) => call_function("dot_q", a, b)
    val nx = dot(col("qv"), col("qv"))
    val entries = cents.zipWithIndex.map { case (c, j) =>
      val nc = c.map(x => x * x).sum
      struct((nx - lit(2L) * dot(col("qv"), typedLit(c.toSeq)) + lit(nc)).as("d"),
        lit(j).as("j"))
    }
    val sorted = array_sort(array(entries.toIndexedSeq: _*))
    val near = element_at(sorted, 1)
    val second = element_at(sorted, 2)
    v.select(col("vec_id"), near.getField("j").as("cluster"),
        near.getField("d").as("a"), second.getField("d").as("b"))
      .withColumn("s_milli", expr("(1000 * (b - a)) div greatest(b, 1)"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"), sum(col("s_milli")).as("ss"))
      .withColumn("mean_s_milli", expr("ss div n_points"))
      .select(col("cluster"), col("n_points"), col("mean_s_milli"))
  }

  private def quantized(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.core.Materialize(emb.select(col(idCol).as("vec_id"),
      VectorOps.quantize(col(vecCol)).as("qv")))

  /** The Lloyd iteration loop: seeds = the first k rows ORDERED BY id
    * (TakeOrderedAndProject — not filter(id < k), which silently
    * under-seeds when ids aren't 0-based contiguous); cluster j = rank j
    * among seeds; `iters` assign/update rounds. The k·dim sum table is
    * the ONLY driver collect.
    */
  def fit(v: DataFrame, k: Int, iters: Int): Array[Array[Long]] = {
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
    cents
  }

  /** Map-only nearest-centroid assignment: centroids enter the plan as
    * array literals; sq-dist uses the norm expansion |x|² − 2x·c + |c|²
    * (exact integers, so algebraically interchangeable with Σ(xᵢ−cᵢ)² —
    * the oracle uses the latter).
    */
  def assign(v: DataFrame, cents: Array[Array[Long]]): DataFrame = {
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
                 dim: Int): String =
    s"""${chainSql(table, id, vec, k, iters, dim)}
       |SELECT vec_id, cid::INTEGER AS cluster, d AS sq_dist FROM dF
       |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1""".stripMargin

  /** DuckDB twin of [[silhouette]]: ranks the SAME dF distance table that
    * [[clusterSql]] argmins — rank 1 is the assignment (a), rank 2 the
    * runner-up (b).
    */
  def silhouetteSql(table: String, id: String, vec: String, k: Int,
                    iters: Int, dim: Int): String =
    s"""${chainSql(table, id, vec, k, iters, dim)}
       |, r2 AS (
       |  SELECT vec_id, cid, d,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
       |  FROM dF
       |), ab AS (
       |  SELECT a.vec_id, a.cid AS cluster, a.d AS da, b.d AS db
       |  FROM r2 a JOIN r2 b ON a.vec_id = b.vec_id AND a.rk = 1 AND b.rk = 2
       |), sil AS (
       |  SELECT cluster, (1000 * (db - da)) // greatest(db, 1) AS s_milli
       |  FROM ab
       |)
       |SELECT cluster::INTEGER AS cluster, count(*)::BIGINT AS n_points,
       |  CAST(sum(s_milli) // count(*) AS BIGINT) AS mean_s_milli
       |FROM sil GROUP BY cluster""".stripMargin

  /** Shared CTE chain: quantize, seed, `iters` assign/update rounds, and
    * the FULL final distance table `dF` (every (vec, centroid) pair —
    * both the assignment argmin and the silhouette runner-up read it).
    */
  private def chainSql(table: String, id: String, vec: String, k: Int,
                       iters: Int, dim: Int): String = {
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
       |)""".stripMargin
  }
}
