package graft.acid

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.trees.Origin
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating SQL parser adding the lakehouse MAINTENANCE statements the
  * ANSI grammar lacks — the surface Delta ships as its SQL extension,
  * re-derived over the graft commit log:
  *
  * {{{
  *   OPTIMIZE <table> [TARGET <n> FILES] [ZORDER BY (a, b)] [INCREMENTAL]
  *   VACUUM <table> [RETAIN <n> (VERSIONS | HOURS)] [DRY RUN]
  *   RESTORE [TABLE] <table> TO VERSION AS OF <v>
  *   REORG [TABLE] <table> APPLY (PURGE)
  *   CONVERT TO GRAFT '<path>' [STATS BY col] [BLOOM BY col]
  *   CLONE <table> TO <table | '<path>'> [VERSION AS OF <v>]
  *   DESCRIBE HISTORY <table> [LIMIT <n>]
  *   DESCRIBE DETAIL <table>
  *   DESCRIBE FILES <table>                     -- per-file manifest metadata
  *   DESCRIBE CHANGES <table> FROM <v> TO <v>   -- the change feed as SQL
  * }}}
  *
  * `<table>` is a graft-catalog identifier (`cat.ns.t` where
  * `spark.sql.catalog.<cat>` is [[GraftCatalog]]); the statement resolves
  * the table root from the catalog's configured root. Every other
  * statement delegates verbatim to Spark's parser — this parser adds
  * grammar, it never changes any.
  *
  * PARSING, not pattern-matching: statements go through a real tokenizer
  * + recursive-descent grammar. A statement whose HEAD matches and whose
  * table resolves to a graft catalog is parsed STRICTLY to the end — a
  * malformed tail (`VACUUM t RETAIN 7 DAYS`, `OPTIMIZE t INCREMENTAL`
  * with no ZORDER BY) fails with a loud [[ParseException]] naming what
  * was expected, instead of a regex over- or under-capture silently
  * running the wrong maintenance action. Non-graft targets (and heads we
  * don't own) fall through to the delegate untouched.
  *
  * Install via `GraftExtensions` (`injectParser`). DESCRIBE HISTORY
  * returns [[GraftTable.historyDF]]'s plan (a real result set); the
  * mutating statements plan through the same
  * [[GraftRowLevelCommand]] / [[GraftRowCommandStrategy]] pair as SQL
  * UPDATE/MERGE.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def spark = SparkSession.active

  // ---------------------------------------------------------------- lexer

  /** Token stream over a maintenance statement: quoted strings (`'...'`)
    * and backquoted identifier parts survive as single tokens, `(`, `)`
    * and `,` are their own tokens, everything else splits on whitespace.
    * Trailing semicolons drop. Returns None for text the lexer cannot
    * own (unterminated quote) — the delegate then reports it. */
  private def tokenize(sql: String): Option[Vector[String]] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sql.length) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '`') {
        val j = sql.indexOf(c, i + 1)
        if (j < 0) return None
        out += sql.substring(i, j + 1); i = j + 1
      } else if (c == '(' || c == ')' || c == ',' || c == ';') {
        out += c.toString; i += 1
      } else {
        val start = i
        while (i < sql.length && !sql(i).isWhitespace &&
               !"(),;'`".contains(sql(i))) i += 1
        out += sql.substring(start, i)
      }
    }
    val ts = out.result()
    Some(ts.reverse.dropWhile(_ == ";").reverse)
  }

  /** Cursor over the token stream with loud, position-naming errors. */
  private final class Toks(val sql: String, ts: Vector[String]) {
    private var i = 0
    def peek: Option[String] = ts.lift(i)
    def peekIsKw(kw: String): Boolean = peek.exists(_.equalsIgnoreCase(kw))
    def takeKw(kw: String): Boolean =
      if (peekIsKw(kw)) { i += 1; true } else false
    def expectKw(kw: String): Unit =
      if (!takeKw(kw)) throw err(s"expected '$kw'")
    def expectLong(what: String): Long = peek.flatMap(_.toLongOption) match {
      case Some(n) => i += 1; n
      case None => throw err(s"expected $what (a number)")
    }
    def expectInt(what: String): Int = {
      val n = expectLong(what)
      if (n < Int.MinValue || n > Int.MaxValue) throw err(s"$what out of range")
      n.toInt
    }
    /** A (possibly multipart, possibly backquoted) identifier: adjacent
      * tokens joined while dots connect them (`cat.`/`` `my ns` ``/`.t`). */
    def expectIdent(what: String): String = {
      var cur = peek.getOrElse(throw err(s"expected $what"))
      if (cur.startsWith("'") || "(),".contains(cur)) throw err(s"expected $what")
      i += 1
      var joined = cur
      while (peek.exists(n => joined.endsWith(".") || n.startsWith(".") ||
             (joined.endsWith("`") && n == "."))) {
        joined += ts(i); i += 1
      }
      joined
    }
    /** A quoted `'path'` literal, unquoted. */
    def takeString(): Option[String] = peek.filter(_.startsWith("'")).map { s =>
      i += 1; s.substring(1, s.length - 1)
    }
    def expectString(what: String): String =
      takeString().getOrElse(throw err(s"expected $what (a '...' string)"))
    def expectEnd(): Unit =
      peek.foreach(t => throw err(s"unexpected trailing input at '$t'"))
    /** Everything left, re-joined — for sub-grammars the delegate parses
      * (the OPTIMIZE ... WHERE predicate). */
    def rest(): String = {
      val s = ts.drop(i).mkString(" ")
      i = ts.length
      s
    }
    def err(msg: String): ParseException = {
      val around = ts.slice(math.max(0, i - 2), i + 2).mkString(" ")
      new ParseException(Some(sql), Origin(), "PARSE_SYNTAX_ERROR",
        Map("error" -> s"'$around' ($msg)", "hint" -> ""))
    }
  }

  // ----------------------------------------------------------- resolution

  /** Resolve `cat.ns.t` to the GraftTable at the catalog's root; None if
    * the first name part is not a configured graft catalog (the
    * statement then falls through to Spark's parser and its error). */
  private def resolve(tableRef: String): Option[GraftTable] =
    resolvePath(tableRef).map(GraftTable.load(spark, _))

  /** The ROOT PATH a graft-catalog identifier maps to — for statements
    * (CLONE ... TO dest) whose target does not exist yet. */
  private def resolvePath(tableRef: String): Option[String] = {
    val parts =
      try delegate.parseMultipartIdentifier(tableRef)
      catch { case _: ParseException => return None }
    if (parts.length < 2) return None
    val conf = spark.conf
    if (!conf.getOption(s"spark.sql.catalog.${parts.head}")
        .contains(classOf[GraftCatalog].getName)) return None
    conf.getOption(s"spark.sql.catalog.${parts.head}.root").map(root =>
      parts.tail.foldLeft(new org.apache.hadoop.fs.Path(root))(
        new org.apache.hadoop.fs.Path(_, _)).toString)
  }

  // ------------------------------------------------------------- grammar

  /** OPTIMIZE <t> [TARGET n FILES] [ZORDER BY (a, b, ...)] [INCREMENTAL] */
  private def parseOptimize(t: Toks): Option[LogicalPlan] = {
    t.expectKw("OPTIMIZE")
    val ref = t.expectIdent("a table")
    resolve(ref).map { table =>
      val target =
        if (t.takeKw("TARGET")) {
          val n = t.expectInt("the file target")
          t.expectKw("FILES"); Some(n)
        } else None
      val zcols =
        if (t.takeKw("ZORDER")) {
          t.expectKw("BY"); t.expectKw("(")
          val cols = Vector.newBuilder[String]
          cols += stripTicks(t.expectIdent("a zorder column"))
          while (t.takeKw(","))
            cols += stripTicks(t.expectIdent("a zorder column"))
          t.expectKw(")")
          cols.result()
        } else Vector.empty[String]
      val incremental = t.takeKw("INCREMENTAL")
      if (incremental && zcols.size < 2)
        throw t.err("OPTIMIZE ... INCREMENTAL requires ZORDER BY " +
          "(a, b, ...) with at least two columns")
      // OPTIMIZE ... WHERE <pred>: predicate-scoped compaction — only
      // files whose manifest windows/blooms intersect the predicate
      // rewrite. Exclusive with ZORDER (a scoped rewrite would strip
      // the very layout tags a zorder pass establishes).
      val where =
        if (t.takeKw("WHERE")) {
          if (zcols.nonEmpty || incremental)
            throw t.err("OPTIMIZE ... WHERE composes with plain " +
              "compaction only, not ZORDER BY / INCREMENTAL")
          val predText = t.rest()
          if (predText.isEmpty) throw t.err("expected a predicate after WHERE")
          Some(org.apache.spark.sql.GraftPlanBridge.column(
            delegate.parseExpression(predText)))
        } else None
      t.expectEnd()
      val n = target.getOrElse(spark.sessionState.conf.numShufflePartitions)
      val label = s"OPTIMIZE $ref"
      if (incremental)
        GraftRowLevelCommand(label,
          () => { table.compactZOrderIncremental(zcols, n); () })
      else if (zcols.size >= 2)
        GraftRowLevelCommand(label, () => { table.compactZOrderN(zcols, n); () })
      else if (zcols.size == 1)
        GraftRowLevelCommand(label,
          () => { table.compact(n, clusterBy = zcols); () })
      else where match {
        case Some(pred) =>
          GraftRowLevelCommand(label, () => { table.compactWhere(pred, n); () })
        case None =>
          GraftRowLevelCommand(label, () => { table.compact(n); () })
      }
    }
  }

  /** VACUUM <t> [RETAIN n (VERSIONS | HOURS)] [DRY RUN] — DRY RUN
    * returns the would-delete file list as a result set instead of
    * deleting (the operator's pre-flight before an irreversible cut). */
  private def parseVacuum(t: Toks): Option[LogicalPlan] = {
    t.expectKw("VACUUM")
    val ref = t.expectIdent("a table")
    resolve(ref).map { table =>
      // Left = retain n versions, Right = retain n hours
      val retain: Either[Int, Int] =
        if (t.takeKw("RETAIN")) {
          val n = t.expectInt("the retention count")
          if (t.takeKw("HOURS")) Right(n)
          else if (t.takeKw("VERSIONS")) Left(n)
          else throw t.err("expected VERSIONS or HOURS after RETAIN n")
        } else Left(1)
      val dry = if (t.takeKw("DRY")) { t.expectKw("RUN"); true } else false
      t.expectEnd()
      // both paths defer to EXECUTION time (the hour cutoff and the
      // dry-run listing are computed when the statement runs, so EXPLAIN
      // is side-effect-free and a re-executed cached plan stays fresh)
      if (dry) {
        GraftStringsCommand(s"VACUUM $ref DRY RUN", "would_delete",
          () => retain match {
            case Left(n)  => table.vacuumDryRun(n)
            case Right(h) => table.vacuumOlderThanDryRun(
              System.currentTimeMillis() - h * 3600000L)
          })
      } else GraftRowLevelCommand(s"VACUUM $ref", () => retain match {
        case Left(n)  => { table.vacuum(n); () }
        case Right(h) => { table.vacuumOlderThan(
          System.currentTimeMillis() - h * 3600000L); () }
      })
    }
  }

  /** RESTORE [TABLE] <t> TO VERSION AS OF <v> */
  private def parseRestore(t: Toks): Option[LogicalPlan] = {
    t.expectKw("RESTORE"); t.takeKw("TABLE")
    val ref = t.expectIdent("a table")
    resolve(ref).map { table =>
      t.expectKw("TO"); t.expectKw("VERSION"); t.expectKw("AS"); t.expectKw("OF")
      val v = t.expectLong("a version")
      t.expectEnd()
      GraftRowLevelCommand(s"RESTORE $ref", () => { table.restore(v); () })
    }
  }

  /** REORG [TABLE] <t> APPLY (PURGE) */
  private def parseReorg(t: Toks): Option[LogicalPlan] = {
    t.expectKw("REORG"); t.takeKw("TABLE")
    val ref = t.expectIdent("a table")
    resolve(ref).map { table =>
      t.expectKw("APPLY"); t.expectKw("("); t.expectKw("PURGE"); t.expectKw(")")
      t.expectEnd()
      GraftRowLevelCommand(s"REORG $ref", () => { table.reorg(); () })
    }
  }

  /** CONVERT TO GRAFT '<path>' [STATS BY col] [BLOOM BY col] */
  private def parseConvert(t: Toks): Option[LogicalPlan] = {
    t.expectKw("CONVERT"); t.expectKw("TO"); t.expectKw("GRAFT")
    val path = t.expectString("a parquet directory path")
    var scol: Option[String] = None
    var bcol: Option[String] = None
    while (t.peek.isDefined) {
      if (t.takeKw("STATS")) {
        t.expectKw("BY"); scol = Some(stripTicks(t.expectIdent("a column")))
      } else if (t.takeKw("BLOOM")) {
        t.expectKw("BY"); bcol = Some(stripTicks(t.expectIdent("a column")))
      } else throw t.err("expected STATS BY or BLOOM BY")
    }
    Some(GraftRowLevelCommand(s"CONVERT TO GRAFT $path",
      () => { GraftTable.convert(spark, path,
        statsCol = scol, bloomCol = bcol); () }))
  }

  /** CLONE <t> TO <t | '<path>'> [VERSION AS OF <v>] */
  private def parseClone(t: Toks): Option[LogicalPlan] = {
    t.expectKw("CLONE")
    val srcRef = t.expectIdent("a source table")
    resolve(srcRef).map { src =>
      t.expectKw("TO")
      // a non-graft destination identifier errors HERE, loudly — falling
      // through to Spark's parser would surface an unrelated syntax error
      // for a statement whose head we own
      val dest = t.takeString().getOrElse {
        val destRef = t.expectIdent("a destination table or '<path>'")
        resolvePath(destRef).getOrElse(throw t.err(
          s"CLONE destination '$destRef' must be a graft-catalog table " +
            "(cat.ns.t with spark.sql.catalog.<cat> = GraftCatalog) or a " +
            "'<path>' string"))
      }
      val ver = if (t.takeKw("VERSION")) {
        t.expectKw("AS"); t.expectKw("OF")
        Some(t.expectLong("a version"))
      } else None
      t.expectEnd()
      GraftRowLevelCommand(s"CLONE $srcRef", () => { src.cloneTo(dest, ver); () })
    }
  }

  /** DESCRIBE (HISTORY [LIMIT n] | DETAIL | CHANGES ... FROM a TO b) */
  private def parseDescribe(t: Toks): Option[LogicalPlan] = {
    t.expectKw("DESCRIBE")
    if (t.takeKw("HISTORY")) {
      val ref = t.expectIdent("a table")
      resolve(ref).map { table =>
        val limit = if (t.takeKw("LIMIT"))
          Some(t.expectInt("the history limit")) else None
        t.expectEnd()
        table.historyDF(limit).queryExecution.logical
      }
    } else if (t.takeKw("DETAIL")) {
      val ref = t.expectIdent("a table")
      resolve(ref).map { table =>
        t.expectEnd(); table.detailDF.queryExecution.logical
      }
    } else if (t.takeKw("FILES")) {
      val ref = t.expectIdent("a table")
      resolve(ref).map { table =>
        t.expectEnd(); table.filesDF().queryExecution.logical
      }
    } else if (t.takeKw("CHANGES")) {
      val ref = t.expectIdent("a table")
      resolve(ref).map { table =>
        t.expectKw("FROM")
        val fromV = t.expectLong("a version")
        t.expectKw("TO")
        val toV = t.expectLong("a version")
        t.expectEnd()
        table.changeFeed(fromV, toV).queryExecution.logical
      }
    } else None // plain DESCRIBE <table> etc. — Spark's own statement
  }

  private def stripTicks(id: String) = id.replace("`", "")

  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = tokenize(sqlText).flatMap { ts =>
      val t = new Toks(sqlText, ts)
      ts.headOption.map(_.toUpperCase).flatMap {
        case "OPTIMIZE" => parseOptimize(t)
        case "VACUUM"   => parseVacuum(t)
        case "RESTORE"  => parseRestore(t)
        case "REORG"    => parseReorg(t)
        case "CLONE"    => parseClone(t)
        case "CONVERT" if ts.lift(1).exists(_.equalsIgnoreCase("TO")) &&
            ts.lift(2).exists(_.equalsIgnoreCase("GRAFT")) => parseConvert(t)
        case "DESCRIBE" => parseDescribe(t)
        case _ => None
      }
    }
    plan.getOrElse(delegate.parsePlan(sqlText))
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
