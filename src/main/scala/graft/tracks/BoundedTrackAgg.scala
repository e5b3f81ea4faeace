package graft.tracks

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The reference's SimpleFeatureTrack as a first-class typed UDAF
  * (SURVEY.md §7 "custom Aggregator"): per key, collect the bounded
  * (cap=10), chronologically sorted, ts-deduplicated event buffer.
  *
  * `reduce` is the reference's `track.add` (first-in wins a ts tie within
  * a partition's fold); `merge` combines partial tracks from different
  * partitions order-insensitively (ts tie -> smaller eventId). Because the
  * buffer is a bounded top-k by ts, partial aggregation is map-side
  * combinable: each partition ships at most `cap` rows per key to the
  * shuffle — constant-size partials at any data scale.
  */
class BoundedTrackAgg(cap: Int) extends Aggregator[EventRaw, Vector[TrackEv], Seq[TrackEv]] {
  override def zero: Vector[TrackEv] = Vector.empty

  override def reduce(b: Vector[TrackEv], e: EventRaw): Vector[TrackEv] =
    TrackBuffer.add(b, TrackEv(e.tsMicros, e.event_id, e.eventType, e.value), cap)

  override def merge(a: Vector[TrackEv], b: Vector[TrackEv]): Vector[TrackEv] =
    TrackBuffer.merge(a, b, cap)

  override def finish(r: Vector[TrackEv]): Seq[TrackEv] = r

  override def bufferEncoder: Encoder[Vector[TrackEv]] = ExpressionEncoder[Vector[TrackEv]]()
  override def outputEncoder: Encoder[Seq[TrackEv]] = ExpressionEncoder[Seq[TrackEv]]()
}

object BoundedTrackAgg {
  def apply(cap: Int = TrackBuffer.DefaultCap): BoundedTrackAgg = new BoundedTrackAgg(cap)
}
