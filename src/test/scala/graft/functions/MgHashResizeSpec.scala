package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Regression pin for the 2.13 HashMap resize-during-foreach hazard the
  * MG prune hit: a value-only update can grow the table mid-iteration
  * (put0 grows preemptively), so the sketch ops iterate snapshots. This
  * pins the merge prune at the exact size (11 entries, 16-slot table,
  * threshold 12) where the unpatched loop skipped entries. */
class MgHashResizeSpec extends AnyFunSuite {
  test("merge prune caps size at k even at the table-growth threshold") {
    val agg = MisraGriesTopK(org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val m = mutable.HashMap.empty[UTF8String, Long]
    Seq("b" -> 36L, "a" -> 30L, "c" -> 17L, "m15" -> 2L, "m17" -> 2L,
      "r384" -> 1L, "m5" -> 1L, "r1940" -> 1L, "m19" -> 1L, "m4" -> 1L,
      "r1369" -> 1L).foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    val out = agg.merge(m, mutable.HashMap.empty[UTF8String, Long])
    assert(out.size <= 8, s"prune left ${out.size} entries: $out")
    val got = out.map { case (k, v) => k.toString -> v }.toMap
    // cut = 9th largest = 1; survivors are exactly the c > 1 entries, -1
    assert(got == Map("b" -> 35L, "a" -> 29L, "c" -> 16L, "m15" -> 1L, "m17" -> 1L))
  }
}
