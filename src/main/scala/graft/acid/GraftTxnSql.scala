package graft.acid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL face for READ-SIDE multi-table transaction consistency — the
  * consumer-side twin of `COMMIT ATOMIC`'s write-side atomicity
  * (reference semantics: cross-table snapshot reads; the Delta-style
  * txn-pinned read a raw+stats pair needs):
  *
  * {{{
  *   SELECT * FROM snapshot_at_txn('cat.ns.t', '<txn marker>')   -- TVF
  *   DESCRIBE TXN '<txn marker>'            -- participant discovery
  * }}}
  *
  * The TVF pins ONE participant table at the exact version its
  * participant committed in the transaction — so two TVF calls over the
  * same marker compose into a join that can never observe a split txn,
  * with no API code anywhere. Version pinning is ordinary time travel:
  * O(1) manifest resolution per call, no data I/O beyond the query.
  * The first argument is a graft-catalog identifier (`cat.ns.t`) or a
  * raw table-root path; the second the txn marker id returned by
  * `COMMIT ATOMIC` / [[GraftTable.commitAtomicTxn]] (also listed in
  * DESCRIBE HISTORY's txn column).
  */
object GraftTxnSql {

  private def constStr(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(v, StringType) if v != null => v.toString
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be a non-null string literal")
    }

  /** A table reference as the TVF accepts it: a graft-catalog
    * identifier resolved through the session's catalog config, or a
    * raw root path (anything containing a path separator). */
  private[acid] def resolveRoot(spark: SparkSession, ref: String): String = {
    if (ref.contains("/")) return ref
    val parts =
      try spark.sessionState.sqlParser.parseMultipartIdentifier(ref)
      catch {
        case _: org.apache.spark.sql.catalyst.parser.ParseException =>
          throw new IllegalArgumentException(
            s"graft TVF: '$ref' is neither a path nor a parseable " +
              "catalog identifier")
      }
    val conf = spark.conf
    require(parts.length >= 2 &&
      conf.getOption(s"spark.sql.catalog.${parts.head}")
        .contains(classOf[GraftCatalog].getName),
      s"graft TVF: '$ref' must name a graft-catalog table " +
        "(cat.ns.t with spark.sql.catalog.<cat> = GraftCatalog) or a " +
        "table-root path")
    conf.getOption(s"spark.sql.catalog.${parts.head}.root")
      .map(root => parts.tail.foldLeft(
        new org.apache.hadoop.fs.Path(root))(
        new org.apache.hadoop.fs.Path(_, _)).toString)
      .getOrElse(throw new IllegalArgumentException(
        s"graft TVF: catalog '${parts.head}' has no configured root"))
  }

  /** TVF builder for `snapshot_at_txn(tableRef, txnMarker)`. */
  def snapshotAtTxnPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2,
      "snapshot_at_txn(tableRef, txnMarker) takes exactly two arguments")
    val spark = SparkSession.active
    val ref = constStr(exprs.head, "snapshot_at_txn", "tableRef")
    val txn = constStr(exprs(1), "snapshot_at_txn", "txnMarker")
    val root = resolveRoot(spark, ref)
    val parts = GraftTable.txnParticipants(spark, txn).toMap
    val v = parts.getOrElse(root, throw new IllegalArgumentException(
      s"snapshot_at_txn: table at $root is not a participant of txn " +
        s"$txn (participants: ${parts.keys.mkString(", ")})"))
    GraftTable.load(spark, root).snapshot(Some(v)).queryExecution.logical
  }

  /** `DESCRIBE TXN '<marker>'`: one row per participant —
    * (table_root, version) — the discovery step before pinned reads. */
  def participantsDF(spark: SparkSession, txnId: String): DataFrame = {
    import spark.implicits._
    GraftTable.txnParticipants(spark, txnId)
      .toDF("table_root", "version")
  }

  /** A timestamp argument as the TVFs accept it: a bare digit string =
    * epoch millis; else any SQL timestamp literal, parsed in the
    * SESSION timezone (`spark.sql.session.timeZone`) — the same
    * convention as the batch reader's `timestampAsOf`
    * ([[TableStream]]); java.sql.Timestamp.valueOf would silently use
    * the JVM default zone and shift the wall-clock window by the zone
    * offset whenever the two disagree. Zone-suffixed literals
    * (`...T12:00:00Z`, `+02:00`) carry their own zone. */
  private[acid] def parseTsMillis(s: String, fn: String,
                                  spark: SparkSession): Long =
    if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
    else {
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      val zone = DateTimeUtils.getZoneId(
        spark.sessionState.conf.sessionLocalTimeZone)
      DateTimeUtils.stringToTimestamp(
        org.apache.spark.unsafe.types.UTF8String.fromString(s.trim), zone)
        .map(micros => Math.floorDiv(micros, 1000L))
        .getOrElse(throw new IllegalArgumentException(
          s"$fn: cannot parse '$s' as a timestamp (epoch millis or a " +
            "SQL timestamp literal, session-timezone)"))
    }

  /** A range bound: Left = version number (integer literal), Right =
    * epoch millis (string-literal timestamp, the Delta table_changes
    * dual-form contract). */
  private def constBound(e: Expression, fn: String, arg: String,
                         spark: SparkSession): Either[Long, Long] =
    e match {
      case Literal(v: Int, _)  => Left(v.toLong)
      case Literal(v: Long, _) => Left(v)
      case Literal(s, StringType) if s != null =>
        Right(parseTsMillis(s.toString, fn, spark))
      case _ => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer version literal or a string " +
          "timestamp literal")
    }

  /** Both bounds resolved to a `(fromV, toV]` version window: two
    * versions pass through; two timestamps resolve through the
    * monotone-`ts=` mapping ([[GraftTable.versionWindowByTimestamp]]).
    * Mixed forms refuse loudly. */
  private def versionWindow(t: GraftTable, fn: String,
                            a: Either[Long, Long],
                            b: Either[Long, Long]): (Long, Long) =
    (a, b) match {
      case (Left(f), Left(to))   => (f, to)
      case (Right(f), Right(to)) => t.versionWindowByTimestamp(f, to)
      case _ => throw new IllegalArgumentException(
        s"$fn: from/to must both be versions or both be timestamps")
    }

  /** TVF builder for `table_changes(tableRef, from, to)` — the Delta
    * `table_changes` read face as a composable relation: the table's
    * net row-level diff over `(fromV, toV]`, each row tagged `_change`
    * (insert/delete), servable from persisted change files when
    * write-side CDF is on. `from`/`to` are version numbers, or (both)
    * string timestamp literals — wall-clock windows resolve through
    * the in-commit monotone `ts=` stamps, exact under writer clock
    * skew. Unlike `DESCRIBE CHANGES` (a statement), this composes
    * inside any SELECT — join it, aggregate it, feed a mirror from SQL
    * alone. */
  def tableChangesPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3,
      "table_changes(tableRef, from, to) takes exactly three arguments")
    val spark = SparkSession.active
    val ref = constStr(exprs.head, "table_changes", "tableRef")
    val t = GraftTable.load(spark, resolveRoot(spark, ref))
    val (fromV, toV) = versionWindow(t, "table_changes",
      constBound(exprs(1), "table_changes", "from", spark),
      constBound(exprs(2), "table_changes", "to", spark))
    t.changeFeed(fromV, toV).queryExecution.logical
  }

  /** TVF builder for `table_changes_by_version(tableRef, from, to)` —
    * the per-commit attributed form (`_commit_version` /
    * `_commit_timestamp` columns), [[GraftTable.changeFeedByVersion]]
    * as a composable relation. Accepts the same dual version/timestamp
    * bounds as `table_changes`. */
  def tableChangesByVersionPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3,
      "table_changes_by_version(tableRef, from, to) takes exactly " +
        "three arguments")
    val spark = SparkSession.active
    val ref = constStr(exprs.head, "table_changes_by_version", "tableRef")
    val t = GraftTable.load(spark, resolveRoot(spark, ref))
    val (fromV, toV) = versionWindow(t, "table_changes_by_version",
      constBound(exprs(1), "table_changes_by_version", "from", spark),
      constBound(exprs(2), "table_changes_by_version", "to", spark))
    t.changeFeedByVersion(fromV, toV).queryExecution.logical
  }
}
