package graft.queries

import graft.SparkSpec

/** Unit coverage for the SearchQueries helpers that the sf0.01 oracle
  * gate cannot stress: the connected-components loop on graphs whose
  * diameter forces multiple propagation rounds (the testdata near-dup
  * graph is small cliques, converged in one round).
  */
class SearchSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val pairs = edges.toDF("a", "b")
    val undirected = pairs.select($"a".as("src"), $"b".as("dst"))
      .union(pairs.select($"b".as("src"), $"a".as("dst")))
    SearchQueries.connectedComponents(undirected)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph converges to the min id across its full diameter") {
    // 0-1-2-3-4-5-6-7: min-label needs ~diameter rounds to reach the tail
    val chain = (0L until 7L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got == (0L to 7L).map(_ -> 0L).toMap)
  }

  test("disjoint components keep separate labels") {
    val got = components(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("cycle and bridge merge into one component") {
    // cycle 1-2-3-1 bridged to chain 3-4-5; plus unrelated pair
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (9L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      8L -> 8L, 9L -> 8L))
  }

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 4): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val pairs = edges.toDF("a", "b")
    val undirected = pairs.select($"a".as("src"), $"b".as("dst"))
      .union(pairs.select($"b".as("src"), $"a".as("dst")))
    SearchQueries.pageRank(undirected, iters)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("pr")).toMap
  }

  test("pagerank: hub of a star graph outranks every leaf") {
    val star = (1L to 6L).map(leaf => (0L, leaf))
    val pr = ranks(star)
    assert((1L to 6L).forall(l => pr(0L) > pr(l)))
    // leaves are symmetric -> identical ranks
    assert((1L to 6L).map(pr).distinct.size == 1)
  }

  test("pagerank: mass conserved up to truncation loss") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L), (4L, 0L))
    val pr = ranks(edges)
    val total = pr.values.sum
    val unit = 1000000000000L
    val n = pr.size
    val e = edges.size * 2
    // each truncating div leaks < 1 unit per operand per iteration
    assert(total <= unit && total >= unit - 4L * (n + e + 2),
      s"mass $total outside tolerance of $unit")
  }

  test("pagerank: symmetric ring is uniform at every iteration count") {
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    for (it <- Seq(1, 3)) {
      val pr = ranks(ring, it)
      assert(pr.values.toSeq.distinct.size == 1, s"ring not uniform at $it iters")
    }
  }
}
