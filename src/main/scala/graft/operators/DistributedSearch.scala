package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed backtracking search — the reference's puzzle-driver family
  * (reference: examples/dancing/DistributedPentomino.java, Sudoku.java:
  * enumerate search prefixes, ship each prefix's subtree to a mapper,
  * solve imperatively, collect solutions).
  *
  * The same decomposition on Spark: the driver enumerates the valid
  * assignments of the first `prefixDepth` empty cells (a few hundred
  * branches), parallelizes them, and each task exhausts its subtree with a
  * plain backtracking solver. Compute-only: no shuffle at all until the
  * final (tiny) solution collect. Scaling knob = prefix depth, exactly the
  * reference's `pent.depth`.
  */
object DistributedSearch {

  /** All solutions of a 9×9 sudoku (81-char string, '0' = empty). */
  def solveSudoku(spark: SparkSession, puzzle: String,
                  prefixDepth: Int = 2): DataFrame = {
    import spark.implicits._
    require(puzzle.length == 81)
    // driver side: expand the first `prefixDepth` empty cells
    var prefixes = Seq(puzzle)
    for (_ <- 0 until prefixDepth)
      prefixes = prefixes.flatMap(expandFirstEmpty)
    val n = math.max(1, prefixes.size)
    spark.sparkContext.parallelize(prefixes, n.min(64))
      .flatMap(solveAll)
      .toDF("solution")
      .orderBy("solution")
  }

  /** One-step expansion: every valid digit for the first empty cell. */
  private def expandFirstEmpty(g: String): Seq[String] = {
    val i = g.indexOf('0')
    if (i < 0) Seq(g)
    else ('1' to '9').collect {
      case d if valid(g, i, d) => g.updated(i, d)
    }
  }

  private def valid(g: String, i: Int, d: Char): Boolean = {
    val (r, c) = (i / 9, i % 9)
    (0 until 81).forall { j =>
      g(j) != d ||
        !(j / 9 == r || j % 9 == c || (j / 27 == r / 3 && (j % 9) / 3 == c / 3))
    }
  }

  /** Exhaustive backtracking over one subtree (runs inside a task). */
  private def solveAll(g: String): Seq[String] = {
    val i = g.indexOf('0')
    if (i < 0) Seq(g)
    else ('1' to '9').toSeq.collect {
      case d if valid(g, i, d) => solveAll(g.updated(i, d))
    }.flatten
  }
}
