package graft.acid

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating SQL parser adding the lakehouse MAINTENANCE statements the
  * ANSI grammar lacks — the surface Delta ships as its SQL extension,
  * re-derived over the graft commit log:
  *
  * {{{
  *   OPTIMIZE <table> [TARGET <n> FILES] [ZORDER BY (a, b)] [INCREMENTAL]
  *   VACUUM <table> [RETAIN <n> VERSIONS]
  *   RESTORE [TABLE] <table> TO VERSION AS OF <v>
  *   REORG [TABLE] <table> APPLY (PURGE)
  *   CONVERT TO GRAFT '<path>' [STATS BY col] [BLOOM BY col]
  *   CLONE <table> TO <table | '<path>'> [VERSION AS OF <v>]
  *   DESCRIBE HISTORY <table>
  *   DESCRIBE DETAIL <table>
  *   DESCRIBE CHANGES <table> FROM <v> TO <v>   -- the change feed as SQL
  * }}}
  *
  * `<table>` is a graft-catalog identifier (`cat.ns.t` where
  * `spark.sql.catalog.<cat>` is [[GraftCatalog]]); the statement resolves
  * the table root from the catalog's configured root. Every other
  * statement delegates verbatim to Spark's parser — this parser adds
  * grammar, it never changes any.
  *
  * Install via `GraftExtensions` (`injectParser`). DESCRIBE HISTORY
  * returns [[GraftTable.historyDF]]'s plan (a real result set); the
  * mutating statements plan through the same
  * [[GraftRowLevelCommand]] / [[GraftRowCommandStrategy]] pair as SQL
  * UPDATE/MERGE.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Optimize =
    """(?is)\s*OPTIMIZE\s+(.+?)(?:\s+TARGET\s+(\d+)\s+FILES)?(?:\s+ZORDER\s+BY\s*\(([\w`\s,]+)\))?(?:\s+(INCREMENTAL))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?(.+?)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val Reorg =
    """(?is)\s*REORG\s+(?:TABLE\s+)?(.+?)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(.+?)\s*;?\s*""".r
  private val Convert =
    """(?is)\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'(?:\s+STATS\s+BY\s+(\w+))?(?:\s+BLOOM\s+BY\s+(\w+))?\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+(.+?)\s*;?\s*""".r
  private val Changes =
    """(?is)\s*DESCRIBE\s+CHANGES\s+(.+?)\s+FROM\s+(\d+)\s+TO\s+(\d+)\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CLONE\s+(.+?)\s+TO\s+(?:'([^']+)'|([\w`.]+))(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r

  private def spark = SparkSession.active

  /** Resolve `cat.ns.t` to the GraftTable at the catalog's root; None if
    * the first name part is not a configured graft catalog (the
    * statement then falls through to Spark's parser and its error). */
  private def resolve(tableRef: String): Option[GraftTable] = {
    // a near-miss the regex over-captured (e.g. `VACUUM t RETAIN 7
    // DAYS` captures `t RETAIN 7 DAYS`) is not an identifier: fall
    // through to the delegate parser's own error, don't throw here
    val parts =
      try delegate.parseMultipartIdentifier(tableRef)
      catch { case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        return None }
    if (parts.length < 2) return None
    val cat = parts.head
    val conf = spark.conf
    if (!conf.getOption(s"spark.sql.catalog.$cat")
        .contains(classOf[GraftCatalog].getName)) return None
    conf.getOption(s"spark.sql.catalog.$cat.root").map { root =>
      GraftTable.load(spark, (parts.tail.foldLeft(
        new org.apache.hadoop.fs.Path(root))(new org.apache.hadoop.fs.Path(_, _))).toString)
    }
  }

  /** The ROOT PATH a graft-catalog identifier maps to — for statements
    * (CLONE ... TO dest) whose target does not exist yet. */
  private def resolvePath(tableRef: String): Option[String] = {
    val parts =
      try delegate.parseMultipartIdentifier(tableRef)
      catch { case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        return None }
    if (parts.length < 2) return None
    val conf = spark.conf
    if (!conf.getOption(s"spark.sql.catalog.${parts.head}")
        .contains(classOf[GraftCatalog].getName)) return None
    conf.getOption(s"spark.sql.catalog.${parts.head}.root").map(root =>
      parts.tail.foldLeft(new org.apache.hadoop.fs.Path(root))(
        new org.apache.hadoop.fs.Path(_, _)).toString)
  }

  private def strip(id: String) = id.replace("`", "")

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Optimize(ref, target, zcols, incr) =>
      resolve(ref).map { t =>
        val n = Option(target).map(_.toInt)
          .getOrElse(spark.sessionState.conf.numShufflePartitions)
        val label = s"OPTIMIZE ${ref.trim}"
        val cols = Option(zcols).toSeq
          .flatMap(_.split(',')).map(c => strip(c.trim)).filter(_.nonEmpty)
        // ... ZORDER BY (a, b) INCREMENTAL: re-cluster only the
        // unclustered tail (O(tail) scan+rewrite from manifest windows)
        if (cols.size >= 2 && incr != null)
          GraftRowLevelCommand(label,
            () => { t.compactZOrderIncremental(cols, n); () })
        else if (cols.size >= 2)
          GraftRowLevelCommand(label,
            () => { t.compactZOrderN(cols, n); () })
        else if (cols.size == 1)
          GraftRowLevelCommand(label,
            () => { t.compact(n, clusterBy = cols); () })
        else
          GraftRowLevelCommand(label, () => { t.compact(n); () })
      }.getOrElse(delegate.parsePlan(sqlText))
    case Vacuum(ref, retain, unit) =>
      resolve(ref).map { t =>
        // RETAIN n VERSIONS = count-based; RETAIN n HOURS = the
        // production time-based retention (vacuumOlderThan); bare
        // VACUUM keeps only the latest
        GraftRowLevelCommand(s"VACUUM ${ref.trim}", () => {
          (Option(retain).map(_.toInt), Option(unit).map(_.toUpperCase)) match {
            case (Some(n), Some("HOURS")) =>
              t.vacuumOlderThan(System.currentTimeMillis() - n * 3600000L)
            case (Some(n), _) => t.vacuum(n)
            case _ => t.vacuum(1)
          }
          ()
        })
      }.getOrElse(delegate.parsePlan(sqlText))
    case Restore(ref, v) =>
      resolve(ref).map { t =>
        GraftRowLevelCommand(s"RESTORE ${ref.trim}",
          () => { t.restore(v.toLong); () })
      }.getOrElse(delegate.parsePlan(sqlText))
    // REORG TABLE t APPLY (PURGE): materialize deletion vectors — the
    // compliance step between a merge-on-read DELETE and VACUUM
    case Reorg(ref) =>
      resolve(ref).map { t =>
        GraftRowLevelCommand(s"REORG ${ref.trim}",
          () => { t.reorg(); () })
      }.getOrElse(delegate.parsePlan(sqlText))
    // CONVERT TO GRAFT '<path>' [STATS BY col] [BLOOM BY col]: adopt an
    // existing parquet directory in place (zero rewrite) — the
    // lake-to-lakehouse migration statement
    case Convert(path, scol, bcol) =>
      GraftRowLevelCommand(s"CONVERT TO GRAFT $path",
        () => { GraftTable.convert(spark, path,
          statsCol = Option(scol), bloomCol = Option(bcol)); () })
    // CLONE src TO dest [VERSION AS OF n]: zero-copy shallow clone — the
    // dest is a catalog identifier (lands under the catalog root, so it
    // is immediately SELECTable) or a quoted filesystem path
    case Clone(srcRef, destPath, destRef, ver) =>
      resolve(srcRef).flatMap { t =>
        Option(destPath).orElse(Option(destRef).flatMap(resolvePath)).map {
          dest =>
            GraftRowLevelCommand(s"CLONE ${srcRef.trim}",
              () => { t.cloneTo(dest,
                Option(ver).map(_.toLong)); () })
        }
      }.getOrElse(delegate.parsePlan(sqlText))
    case Changes(ref, fromV, toV) =>
      resolve(ref).map(_.changeFeed(fromV.toLong, toV.toLong)
          .queryExecution.logical)
        .getOrElse(delegate.parsePlan(sqlText))
    case Detail(ref) =>
      resolve(ref).map(_.detailDF.queryExecution.logical)
        .getOrElse(delegate.parsePlan(sqlText))
    case History(ref) =>
      resolve(ref).map(_.historyDF.queryExecution.logical)
        .getOrElse(delegate.parsePlan(sqlText))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
