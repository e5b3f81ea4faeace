package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Hilbert transform's defining properties, checked exhaustively on
  * small grids: BIJECTIVITY (every cell gets a distinct index covering
  * the full range) and CONTINUITY (consecutive indexes are grid-adjacent
  * — unit Manhattan distance — the property Morton interleaving lacks
  * and the reason Hilbert files cover tighter windows at seam
  * boundaries). */
class HilbertSpec extends AnyFunSuite {

  /** 2-D check needs fixed grid bits, not 64/k — drive the core through
    * padded higher-dim arrays is wrong; instead scale coordinates into
    * the top of the 64/k grid? No: the core's b derives from k, so for
    * an exhaustive walk we test k=2 with coordinates in [0, 2^32) but
    * only exercise a small sub-grid via the LOW bits — which is exactly
    * how the curve recurses: the low-bit sub-grid IS a complete Hilbert
    * curve of its own order composed with the (constant) high-bit walk,
    * so adjacency/bijectivity within it hold iff the transform is
    * right. */
  private def idx(vs: Long*): Long = HilbertN.index(vs.toArray)

  test("2-D: bijective and continuous over the full 16x16 low-bit grid") {
    val side = 16
    val cells = for (x <- 0 until side; y <- 0 until side)
      yield (x, y, idx(x.toLong, y.toLong))
    val byIdx = cells.map { case (x, y, i) => i -> (x, y) }.toMap
    assert(byIdx.size == side * side, "indexes must be distinct")
    val sorted = cells.map(_._3).sorted
    // the low-bit sub-grid occupies one contiguous curve segment
    assert(sorted.last - sorted.head == side * side - 1,
      s"sub-grid must be contiguous on the curve: ${sorted.head}..${sorted.last}")
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(b == a + 1)
      val (x1, y1) = byIdx(a)
      val (x2, y2) = byIdx(b)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"consecutive indexes $a,$b map to non-adjacent cells " +
          s"($x1,$y1) vs ($x2,$y2)")
    }
  }

  test("3-D: bijective and continuous over the full 8x8x8 low-bit grid") {
    val side = 8
    val cells = for (x <- 0 until side; y <- 0 until side; z <- 0 until side)
      yield ((x, y, z), idx(x.toLong, y.toLong, z.toLong))
    val byIdx = cells.map { case (c, i) => i -> c }.toMap
    assert(byIdx.size == side * side * side)
    val sorted = cells.map(_._2).sorted
    assert(sorted.last - sorted.head == side * side * side - 1)
    sorted.sliding(2).foreach { case Seq(a, b) =>
      val (x1, y1, z1) = byIdx(a)
      val (x2, y2, z2) = byIdx(b)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"3-D continuity broken between $a and $b")
    }
  }

  test("the scratch array is caller-owned: repeated calls stay deterministic") {
    val a = Array(5L, 9L)
    val i1 = HilbertN.index(a.clone())
    val i2 = HilbertN.index(a.clone())
    assert(i1 == i2)
  }
}
