package graft.tracks

/** A track event: timestamps are epoch MICROSECONDS (long) end-to-end —
  * no java.sql.Timestamp in state encoders, so state rows stay flat and
  * cheap to serialize (SURVEY.md §7 risk 4: no per-key object graphs).
  */
case class TrackEv(tsMicros: Long, eventId: Long, eventType: String, value: Double)

/** The reference's per-key track semantics (SURVEY.md §2 K5/K6, reference
  * SimpleFeatureTrack.scala:17-37 + SimpleFeatureTrackPurger.scala:7-12),
  * re-expressed as pure functions over an immutable sorted Vector:
  *
  *  - chronologically sorted (time asc; the TreeSet comparator)
  *  - AT MOST ONE event per timestamp: an event whose ts already exists is
  *    refused (TreeSet `add` returns false on comparator-equal elements)
  *  - bounded at `cap`: after insert, evict the OLDEST until size <= cap
  *
  * "Keep the cap newest distinct timestamps" is an order-insensitive fold
  * (a bounded top-k by ts), so streaming arrival order cannot change the
  * final state — except which payload survives a ts collision. The
  * reference keeps the first-arrived (arrival order); distributed merges
  * have no arrival order, so `merge` breaks ts ties deterministically by
  * smaller eventId. Collisions don't occur in the driver testdata; the
  * divergence is covered by unit tests.
  */
object TrackBuffer {
  val DefaultCap = 10

  /** Insert preserving sort/dedup/cap. O(log n) search + O(n) vector copy,
    * n <= cap (10): effectively constant, no boxing TreeSet. */
  def add(buf: Vector[TrackEv], e: TrackEv, cap: Int = DefaultCap): Vector[TrackEv] =
    addBy(buf, e, cap)(_.tsMicros)

  /** Merge two tracks (for Aggregator partial merges): sorted merge, dedup
    * by ts (tie -> smaller eventId wins, deterministic), keep newest cap. */
  def merge(a: Vector[TrackEv], b: Vector[TrackEv], cap: Int = DefaultCap): Vector[TrackEv] = {
    val out = Vector.newBuilder[TrackEv]
    var i = 0; var j = 0
    while (i < a.length || j < b.length) {
      if (j >= b.length) { out += a(i); i += 1 }
      else if (i >= a.length) { out += b(j); j += 1 }
      else {
        val x = a(i); val y = b(j)
        if (x.tsMicros < y.tsMicros) { out += x; i += 1 }
        else if (y.tsMicros < x.tsMicros) { out += y; j += 1 }
        else { out += (if (x.eventId <= y.eventId) x else y); i += 1; j += 1 }
      }
    }
    val merged = out.result()
    if (merged.length > cap) merged.drop(merged.length - cap) else merged
  }

  /** Generic form of `add` for any record type with an event-time key —
    * the flights port (graft.flights) folds with this, keeping the exact
    * same sorted/dedup/capped semantics as the events track. */
  def addBy[T](buf: Vector[T], e: T, cap: Int)(ts: T => Long): Vector[T] = {
    val target = ts(e)
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ts(buf(mid)) < target) lo = mid + 1 else hi = mid
    }
    if (lo < buf.length && ts(buf(lo)) == target) buf
    else {
      val inserted = (buf.take(lo) :+ e) ++ buf.drop(lo)
      if (inserted.length > cap) inserted.drop(inserted.length - cap) else inserted
    }
  }

  /** First index whose ts >= target (binary search). */
  private def lowerBound(buf: Vector[TrackEv], ts: Long): Int = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid).tsMicros < ts) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Reference W3 (SimpleFeatureTrack.scala:67-87): the n events strictly
    * before `ts`, all-or-nothing — empty unless >= n predecessors exist. */
  def previous(buf: Vector[TrackEv], ts: Long, n: Int): Vector[TrackEv] = {
    val i = lowerBound(buf, ts)
    if (i >= n) buf.slice(i - n, i) else Vector.empty
  }

  /** Reference W4 (SimpleFeatureTrack.scala:89-110): the n events strictly
    * after `ts`, all-or-nothing — empty unless >= n successors exist. */
  def next(buf: Vector[TrackEv], ts: Long, n: Int): Vector[TrackEv] = {
    var i = lowerBound(buf, ts)
    if (i < buf.length && buf(i).tsMicros == ts) i += 1
    if (buf.length - i >= n) buf.slice(i, i + n) else Vector.empty
  }
}
