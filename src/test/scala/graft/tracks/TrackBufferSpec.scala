package graft.tracks

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the bounded sorted dedup buffer (reference semantics:
  * SimpleFeatureTrack + MaxFeaturesPerTrackPurger, SURVEY.md §2 K5/K6,
  * W3/W4). Properties run through plain ScalaCheck (the scalatest bridge
  * artifact is not in the offline cache). */
class TrackBufferSpec extends AnyFunSuite {
  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
  private val cap = 10
  private def ev(ts: Long, id: Long = 0): TrackEv = TrackEv(ts, id, "t", 1.0)

  private val evGen: Gen[TrackEv] = for {
    ts <- Gen.choose(0L, 30L) // narrow range to force collisions
    id <- Gen.choose(0L, 1000L)
  } yield TrackEv(ts, id, "t", ts.toDouble)

  private val evsGen: Gen[List[TrackEv]] = Gen.listOf(evGen)

  test("add keeps buffer sorted, deduped, capped") {
    check(Prop.forAll(evsGen) { evs =>
      val buf = evs.foldLeft(Vector.empty[TrackEv])(TrackBuffer.add(_, _, cap))
      val sorted = buf.map(_.tsMicros) == buf.map(_.tsMicros).sorted
      val dedup = buf.map(_.tsMicros).distinct.size == buf.size
      val capped = buf.size <= cap
      sorted && dedup && capped
    })
  }

  test("fold keeps the newest cap distinct timestamps") {
    check(Prop.forAll(evsGen) { evs =>
      val buf = evs.foldLeft(Vector.empty[TrackEv])(TrackBuffer.add(_, _, cap))
      val expected = evs.map(_.tsMicros).distinct.sorted.takeRight(cap)
      buf.map(_.tsMicros).toList == expected
    })
  }

  test("same-ts add is refused (first-arrival wins)") {
    val b0 = TrackBuffer.add(Vector.empty, ev(5, id = 1), cap)
    val b1 = TrackBuffer.add(b0, ev(5, id = 2), cap)
    assert(b1.map(_.eventId) == Vector(1L))
  }

  test("eviction drops oldest beyond cap") {
    val buf = (1L to 15L).foldLeft(Vector.empty[TrackEv])((b, t) => TrackBuffer.add(b, ev(t), cap))
    assert(buf.map(_.tsMicros) == (6L to 15L).toVector)
  }

  test("merge is commutative and matches the fold semantics on timestamps") {
    check(Prop.forAll(evsGen, evsGen) { (xs, ys) =>
      val a = xs.foldLeft(Vector.empty[TrackEv])(TrackBuffer.add(_, _, cap))
      val b = ys.foldLeft(Vector.empty[TrackEv])(TrackBuffer.add(_, _, cap))
      val m1 = TrackBuffer.merge(a, b, cap)
      val m2 = TrackBuffer.merge(b, a, cap)
      val expectedTs = (a.map(_.tsMicros) ++ b.map(_.tsMicros)).distinct.sorted.takeRight(cap)
      m1 == m2 && m1.map(_.tsMicros).toList == expectedTs.toList
    })
  }

  test("partition-split fold + merge == sequential fold (distribution safety)") {
    // the Aggregator's correctness at scale: however events are split
    // across partitions, partial folds merged together must keep the
    // same timestamps as one sequential fold
    val gen = for {
      evs <- evsGen
      nParts <- Gen.choose(1, 5)
    } yield (evs, nParts)
    check(Prop.forAll(gen) { case (evs, nParts) =>
      val direct = evs.foldLeft(Vector.empty[TrackEv])(TrackBuffer.add(_, _, cap))
      val parts = evs.zipWithIndex.groupBy(_._2 % nParts).values
        .map(_.map(_._1).foldLeft(Vector.empty[TrackEv])(TrackBuffer.add(_, _, cap)))
      val merged = parts.foldLeft(Vector.empty[TrackEv])(TrackBuffer.merge(_, _, cap))
      merged.map(_.tsMicros) == direct.map(_.tsMicros)
    })
  }

  test("merge breaks ts ties by smaller eventId (deterministic)") {
    val m = TrackBuffer.merge(Vector(ev(5, 9)), Vector(ev(5, 3)), cap)
    assert(m.map(_.eventId) == Vector(3L))
  }

  test("previous: all-or-nothing guard (>= n predecessors)") {
    val buf = (1L to 5L).map(t => ev(t)).toVector
    assert(TrackBuffer.previous(buf, 4, 3).map(_.tsMicros) == Vector(1L, 2L, 3L))
    assert(TrackBuffer.previous(buf, 3, 3).isEmpty) // only 2 predecessors
    assert(TrackBuffer.previous(buf, 6, 5).map(_.tsMicros) == (1L to 5L).toVector)
  }

  test("next: all-or-nothing guard (>= n successors, self excluded)") {
    val buf = (1L to 5L).map(t => ev(t)).toVector
    assert(TrackBuffer.next(buf, 2, 3).map(_.tsMicros) == Vector(3L, 4L, 5L))
    assert(TrackBuffer.next(buf, 3, 3).isEmpty) // only 2 successors
    assert(TrackBuffer.next(buf, 0, 5).map(_.tsMicros) == (1L to 5L).toVector)
  }
}
