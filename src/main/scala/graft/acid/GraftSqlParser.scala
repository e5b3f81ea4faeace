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
  *   OPTIMIZE <table> [TARGET <n> FILES] HILBERT BY (a, b, ...)
  *   VACUUM <table> [RETAIN <n> (VERSIONS | HOURS)] [DRY RUN]
  *   RESTORE [TABLE] <table> TO VERSION AS OF <v>
  *   REORG [TABLE] <table> APPLY (PURGE)
  *   CONVERT TO GRAFT '<path>' [STATS BY col] [BLOOM BY col]
  *   CLONE <table> TO <table | '<path>'> [VERSION AS OF <v>]
  *   DESCRIBE HISTORY <table> [LIMIT <n>]
  *   DESCRIBE DETAIL <table>
  *   DESCRIBE FILES <table>                     -- per-file manifest metadata
  *   DESCRIBE CHANGES <table> FROM <v> TO <v> [KEYED BY (k, ...)]
  *   DESCRIBE TXN '<marker>'                    -- multi-table txn participants
  *   COMMIT ATOMIC ( <stmt>; <stmt>; ... )      -- multi-table atomic txn
  *   INSERT INTO <table> REPLACE WHERE <pred> <query>  -- selective overwrite
  *   APPLY CHANGES INTO <mirror> FROM CHANGES <src> FROM <a> TO <b>
  *     KEY (k) [SUM (c, ...)] [TXN '<w>' EPOCH <n>]    -- mirror maintenance
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
        val j = closeQuote(sql, i) // escape-aware: \' and doubled quotes
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
    /** Consume and return the next token whatever it is — for
      * sub-grammars that scan to a boundary token themselves (the
      * REPLACE WHERE predicate/query split). */
    def takeAny(): Option[String] = peek.map { tok => i += 1; tok }
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
      def colList(what: String): Vector[String] = {
        t.expectKw("BY"); t.expectKw("(")
        val cols = Vector.newBuilder[String]
        cols += stripTicks(t.expectIdent(what))
        while (t.takeKw(","))
          cols += stripTicks(t.expectIdent(what))
        t.expectKw(")")
        cols.result()
      }
      val zcols =
        if (t.takeKw("ZORDER")) colList("a zorder column")
        else Vector.empty[String]
      // HILBERT BY (a, b, ...): the Hilbert-curve layout twin — same
      // grammar shape, no INCREMENTAL/WHERE composition (its own tag)
      val hcols =
        if (zcols.isEmpty && t.takeKw("HILBERT")) colList("a hilbert column")
        else Vector.empty[String]
      if (hcols.nonEmpty) {
        if (hcols.size < 2)
          throw t.err("HILBERT BY needs at least two columns")
        t.expectEnd()
        val n0 = target.getOrElse(spark.sessionState.conf.numShufflePartitions)
        GraftRowLevelCommand(s"OPTIMIZE $ref",
          () => { table.compactHilbertN(hcols, n0); () })
      } else {
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
  /** REORG [TABLE] <t> APPLY ( PURGE | COMPACT DVS ): PURGE physically
    * erases masked rows (rewrites only DV-carrying files); COMPACT DVS
    * is the mask-merge-only mode — fold every live deletion vector into
    * one fresh sidecar, zero data files written. */
  private def parseReorg(t: Toks): Option[LogicalPlan] = {
    t.expectKw("REORG"); t.takeKw("TABLE")
    val ref = t.expectIdent("a table")
    resolve(ref).map { table =>
      t.expectKw("APPLY"); t.expectKw("(")
      val compactDvs =
        if (t.takeKw("COMPACT")) { t.expectKw("DVS"); true }
        else { t.expectKw("PURGE"); false }
      t.expectKw(")")
      t.expectEnd()
      GraftRowLevelCommand(s"REORG $ref",
        () => { if (compactDvs) table.reorgCompactDvs() else table.reorg(); () })
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

  /** COMMIT ATOMIC ( <stmt>; <stmt>; ... ) — a MULTI-TABLE atomic
    * transaction from plain SQL: every statement inside the parens
    * becomes one [[GraftTable.commitAtomic]] participant (INSERT INTO →
    * staged append, DELETE FROM [WHERE] → staged merge-on-read delete,
    * UPDATE ... SET ... [WHERE] → staged merge-on-read update,
    * MERGE INTO ... USING ... ON ... WHEN ... → staged full-semantics
    * merge ([[GraftTable.AtomicMergeInto]]) — the ANSI MERGE grammar
    * parses through the delegate and converts through the same
    * [[GraftSqlRowOps]] rewrite as the standalone statement, so the
    * partition-scoped canonical-upsert detection applies inside a txn
    * too), published all-or-nothing through the shared decision marker.
    * Inner queries/predicates parse through the DELEGATE at parse time
    * (loud errors now) and build their DataFrames at execution;
    * non-graft participants error here with the real reason. */
  /** Index of the CLOSING quote of the literal opening at `i` (`s(i)` is
    * `'` or a backtick), honoring the two escape forms Spark's lexer
    * accepts — backslash escapes inside `'...'` (`'it\'s'`) and SQL
    * doubled-quote escaping (`''` / doubled backticks) — so the raw-text
    * scanners below never mistake an escaped quote for the terminator.
    * Returns -1 when unterminated. */
  private def closeQuote(s: String, i: Int): Int = {
    val q = s(i)
    var j = i + 1
    while (j < s.length) {
      val c = s(j)
      if (c == '\\' && q == '\'' && j + 1 < s.length) j += 2
      else if (c == q) {
        if (j + 1 < s.length && s(j + 1) == q) j += 2
        else return j
      } else j += 1
    }
    -1
  }

  private def parseCommitAtomic(sql: String, t: Toks): Option[LogicalPlan] = {
    t.expectKw("COMMIT")
    if (!t.takeKw("ATOMIC")) return None // plain COMMIT: Spark's error
    val open = sql.indexOf('(')
    if (open < 0) throw t.err("expected '(' after COMMIT ATOMIC")
    // raw-text body extraction: the inner statements carry their own
    // parens and quoted strings, so match the CLOSING paren by scan
    var depth = 0
    var i = open
    var close = -1
    while (i < sql.length && close < 0) {
      sql(i) match {
        case '\'' | '`' =>
          val j = closeQuote(sql, i)
          if (j < 0) throw t.err("unterminated quote inside COMMIT ATOMIC")
          i = j
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ => ()
      }
      i += 1
    }
    if (close < 0) throw t.err("missing ')' closing COMMIT ATOMIC")
    val tail = sql.substring(close + 1).trim
    if (tail.nonEmpty && tail != ";")
      throw t.err(s"unexpected trailing input after ')': '$tail'")
    // split the body on TOP-LEVEL semicolons (quote- and paren-aware)
    val body = sql.substring(open + 1, close)
    val stmts = Vector.newBuilder[String]
    var d = 0; var start = 0; var k = 0
    while (k < body.length) {
      body(k) match {
        case '\'' | '`' =>
          val j = closeQuote(body, k)
          k = if (j < 0) body.length - 1 else j
        case '(' => d += 1
        case ')' => d -= 1
        case ';' if d == 0 =>
          stmts += body.substring(start, k); start = k + 1
        case _ => ()
      }
      k += 1
    }
    stmts += body.substring(start)
    val parts = stmts.result().map(_.trim).filter(_.nonEmpty)
      .map(parseParticipant)
    if (parts.isEmpty)
      throw t.err("COMMIT ATOMIC needs at least one statement")
    Some(GraftRowLevelCommand("COMMIT ATOMIC",
      () => { GraftTable.commitAtomic(parts.map(_())); () }))
  }

  /** One COMMIT ATOMIC participant → a thunk building its staged op at
    * execution time. Identifiers resolve (and inner SQL parses) NOW so a
    * malformed or non-graft participant errors at parse. */
  private def parseParticipant(stmt: String): () => GraftTable.AtomicOp = {
    val ts = tokenize(stmt).getOrElse(throw new ParseException(Some(stmt),
      Origin(), "PARSE_SYNTAX_ERROR",
      Map("error" -> s"'$stmt' (unparseable COMMIT ATOMIC participant)",
          "hint" -> "")))
    val t = new Toks(stmt, ts)
    def graftTable(ref: String): GraftTable = resolve(ref).getOrElse(
      throw t.err(s"COMMIT ATOMIC participant '$ref' must be a " +
        "graft-catalog table (cat.ns.t with spark.sql.catalog.<cat> = " +
        "GraftCatalog)"))
    if (t.takeKw("INSERT")) {
      t.expectKw("INTO")
      val table = graftTable(t.expectIdent("a graft table"))
      val queryText = t.rest()
      if (queryText.trim.isEmpty)
        throw t.err("expected a query (VALUES ... or SELECT ...) after " +
          "INSERT INTO <table>")
      delegate.parseQuery(queryText) // loud syntax errors at parse time
      () => {
        val df0 = org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
          delegate.parseQuery(queryText))
        // positional column alignment, the INSERT INTO contract (a
        // VALUES query names its columns col1, col2, ...)
        val declared = table.tableSchema.orElse(
          table.latestVersion.map(v => table.snapshot(Some(v)).schema))
        val df = declared.fold(df0) { s =>
          require(df0.columns.length == s.fields.length,
            s"INSERT INTO ${table.root}: ${df0.columns.length} columns " +
              s"for a ${s.fields.length}-column table")
          // positional rename + cast to the table's types — the work the
          // analyzer does for a catalog INSERT
          df0.toDF(s.fieldNames.toIndexedSeq: _*)
            .select(s.fields.toIndexedSeq.map(f =>
              org.apache.spark.sql.functions.col(f.name)
                .cast(f.dataType).as(f.name)): _*)
        }
        GraftTable.AtomicAppend(table, df)
      }
    } else if (t.takeKw("DELETE")) {
      t.expectKw("FROM")
      val table = graftTable(t.expectIdent("a graft table"))
      val predText =
        if (t.takeKw("WHERE")) {
          val p = t.rest()
          if (p.trim.isEmpty) throw t.err("expected a predicate after WHERE")
          delegate.parseExpression(p) // loud now
          Some(p)
        } else { t.expectEnd(); None }
      () => GraftTable.AtomicDelete(table, predText.fold(
        org.apache.spark.sql.functions.lit(true))(p =>
          org.apache.spark.sql.GraftPlanBridge.column(
            delegate.parseExpression(p))))
    } else if (t.takeKw("UPDATE")) {
      val table = graftTable(t.expectIdent("a graft table"))
      t.expectKw("SET")
      val rest = t.rest()
      // split `a = e1, b = e2 [WHERE pred]` on the TOP-LEVEL (depth-0,
      // unquoted, word-bounded) WHERE, then top-level commas — the
      // expressions may carry their own parens/commas/WHEREs inside
      // subqueries
      val upper = rest.toUpperCase
      var wIdx = -1
      var d0 = 0; var ix = 0
      while (ix < rest.length && wIdx < 0) {
        rest(ix) match {
          case '\'' | '`' =>
            val j = closeQuote(rest, ix)
            ix = if (j < 0) rest.length - 1 else j
          case '(' => d0 += 1
          case ')' => d0 -= 1
          case _ if d0 == 0 && upper.startsWith("WHERE", ix) &&
              (ix == 0 || rest(ix - 1).isWhitespace) &&
              (ix + 5 >= rest.length || rest(ix + 5).isWhitespace) =>
            wIdx = ix
          case _ => ()
        }
        ix += 1
      }
      val (assignsText, predText) =
        if (wIdx < 0) (rest, None)
        else (rest.substring(0, wIdx),
              Some(rest.substring(wIdx + 5).trim).filter(_.nonEmpty)
                .orElse(throw t.err("expected a predicate after WHERE")))
      // top-level comma split of the assignment list
      val parts = Vector.newBuilder[String]
      var d1 = 0; var st = 0; var k1 = 0
      while (k1 < assignsText.length) {
        assignsText(k1) match {
          case '\'' | '`' =>
            val j = closeQuote(assignsText, k1)
            k1 = if (j < 0) assignsText.length - 1 else j
          case '(' => d1 += 1
          case ')' => d1 -= 1
          case ',' if d1 == 0 =>
            parts += assignsText.substring(st, k1); st = k1 + 1
          case _ => ()
        }
        k1 += 1
      }
      parts += assignsText.substring(st)
      val assigns = parts.result().map(_.trim).filter(_.nonEmpty).map { a =>
        a.split("=", 2) match {
          case Array(n, e) if n.trim.nonEmpty && e.trim.nonEmpty =>
            delegate.parseExpression(e.trim) // loud now
            (stripTicks(n.trim), e.trim)
          case _ => throw t.err(
            s"malformed assignment '$a' (expected column = expression)")
        }
      }
      if (assigns.isEmpty)
        throw t.err("expected at least one assignment after SET")
      predText.foreach(delegate.parseExpression) // loud now
      () => GraftTable.AtomicUpdate(table,
        predText.fold(org.apache.spark.sql.functions.lit(true))(p =>
          org.apache.spark.sql.GraftPlanBridge.column(
            delegate.parseExpression(p))),
        assigns.map { case (n, e) =>
          n -> org.apache.spark.sql.GraftPlanBridge.column(
            delegate.parseExpression(e)) }.toMap)
    } else if (t.peekIsKw("MERGE")) {
      // ANSI MERGE INTO: the DELEGATE owns the grammar (loud syntax
      // errors at parse time); target resolution is checked NOW so a
      // non-graft participant errors with the real reason, and the
      // analyzed plan converts at EXECUTION through the same
      // GraftSqlRowOps rewrite as a standalone MERGE — one semantics,
      // txn-staged publish
      val parsed = MergeStarTag.stamp(delegate.parsePlan(stmt))
      val merge = parsed match {
        case mm: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable => mm
        case _ => throw t.err("expected MERGE INTO <table> USING ...")
      }
      val targetRef = merge.targetTable.collectFirst {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          u.multipartIdentifier.mkString(".")
      }.getOrElse(throw t.err(
        "COMMIT ATOMIC MERGE INTO needs a plain table target"))
      graftTable(targetRef) // loud non-graft error at parse time
      () => {
        // analyze-only (never ofRows: Dataset construction EXECUTES a
        // command plan eagerly — the merge must publish via the txn)
        val analyzed = org.apache.spark.sql.GraftPlanBridge
          .analyze(spark, parsed)
        analyzed match {
          case am: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
            GraftSqlRowOps.convertMergeAtomic(am).getOrElse(throw t.err(
              "this MERGE INTO shape cannot participate in COMMIT ATOMIC " +
                "(subqueries in conditions and nested-field assignments " +
                "are not convertible)"))
          case _ => throw t.err(
            "MERGE INTO participant did not analyze to a merge command")
        }
      }
    } else throw t.err(
      "COMMIT ATOMIC supports INSERT INTO, DELETE FROM, UPDATE and " +
        "MERGE INTO participants")
  }

  /** DESCRIBE (HISTORY [LIMIT n] | DETAIL | CHANGES ... FROM a TO b) */
  /** INSERT INTO <t> REPLACE WHERE <pred> <query> — the selective-
    * overwrite SQL face ([[GraftTable.replaceWhere]], Delta's
    * `replaceWhere`): atomically replace exactly the predicate's rows
    * with the query's result, which must all satisfy the predicate.
    * Plain INSERT (no REPLACE after the table name) falls through to
    * Spark's own statement untouched. The predicate runs to the first
    * TOP-LEVEL (paren-depth-0) query head keyword (SELECT / VALUES /
    * WITH / TABLE / FROM / MAP / REDUCE) — a scalar subquery inside the
    * predicate is not supported here; state it on the query side. */
  private def parseInsertReplaceWhere(t: Toks): Option[LogicalPlan] = {
    if (!t.takeKw("INSERT") || !t.takeKw("INTO")) return None
    val ref =
      try t.expectIdent("a table")
      catch { case _: ParseException => return None }
    if (!t.takeKw("REPLACE")) return None // plain INSERT — Spark's own
    // from here the statement is OURS: parse strictly, fail loudly
    t.expectKw("WHERE")
    val table = resolve(ref).getOrElse(throw t.err(
      s"INSERT INTO ... REPLACE WHERE targets a graft-catalog table " +
        s"(cat.ns.t with spark.sql.catalog.<cat> = GraftCatalog); " +
        s"'$ref' is not one"))
    val queryHeads = Set("SELECT", "VALUES", "WITH", "TABLE", "FROM",
      "MAP", "REDUCE")
    val predToks = Vector.newBuilder[String]
    var depth = 0
    var n = 0
    while (t.peek.exists(tok => depth > 0 ||
        !queryHeads.contains(tok.toUpperCase))) {
      val tok = t.takeAny().get
      if (tok == "(") depth += 1 else if (tok == ")") depth -= 1
      predToks += tok
      n += 1
    }
    val predText = predToks.result().mkString(" ")
    if (n == 0) throw t.err("expected a predicate after REPLACE WHERE")
    val queryText = t.rest()
    if (queryText.trim.isEmpty)
      throw t.err("expected a source query (SELECT ... / VALUES ...) " +
        "after the REPLACE WHERE predicate")
    val pred = org.apache.spark.sql.GraftPlanBridge.column(
      delegate.parseExpression(predText))
    delegate.parseQuery(queryText) // loud syntax errors at parse time
    Some(GraftRowLevelCommand(s"INSERT INTO $ref REPLACE WHERE", () => {
      val df0 = org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
        delegate.parseQuery(queryText))
      // positional column alignment, the INSERT INTO contract — minus a
      // row-tracking table's `_row_id` (minted by replaceWhere itself)
      val declared = table.tableSchema.orElse(
          table.latestVersion.map(v => table.snapshot(Some(v)).schema))
        .map(s => if (!table.rowTracking) s
          else StructType(s.fields.filterNot(
            _.name.equalsIgnoreCase("_row_id"))))
      val df = declared.fold(df0) { s =>
        require(df0.columns.length == s.fields.length,
          s"INSERT INTO ${table.root} REPLACE WHERE: " +
            s"${df0.columns.length} columns for a " +
            s"${s.fields.length}-column table")
        df0.toDF(s.fieldNames.toIndexedSeq: _*)
          .select(s.fields.toIndexedSeq.map(f =>
            org.apache.spark.sql.functions.col(f.name)
              .cast(f.dataType).as(f.name)): _*)
      }
      table.replaceWhere(pred, df)
      ()
    }))
  }

  /** APPLY CHANGES INTO <mirror> FROM CHANGES <src> FROM <a> TO <b>
    * KEY (k) [SUM (c, ...)] [TXN '<writer>' EPOCH <n>] — the SQL face
    * of incremental mirror maintenance (r15 gap #4: `applyChangesAgg`
    * was API-only, so a SQL-only deployment could not maintain a
    * mirror). KEY alone routes to [[GraftTable.applyChangesKeyed]] (a
    * row-state mirror: one live row per key, O(touched files) per
    * apply); KEY + SUM to [[GraftTable.applyChangesAgg]] (an aggregate
    * mirror: one row per group holding `n` + exact `sum_<c>`
    * DECIMAL(28,6) columns, folded as ±deltas). Bounds follow the
    * table_changes dual form — numbers are versions, quoted strings
    * are timestamps resolved through the monotone `ts=` headers. TXN
    * '<writer>' EPOCH <n> makes the fold idempotent under replay (the
    * Delta txn action): an epoch at or below the writer's last
    * recorded one is a no-op — a SQL scheduler re-running a failed
    * step cannot double-apply. */
  private def parseApplyChanges(t: Toks): Option[LogicalPlan] = {
    t.expectKw("APPLY"); t.expectKw("CHANGES"); t.expectKw("INTO")
    val mirRef = t.expectIdent("a mirror table")
    resolvePath(mirRef).map { mirRoot =>
      def bound(what: String): Either[Long, Long] = t.takeString() match {
        case Some(s) =>
          Right(GraftTxnSql.parseTsMillis(s, "APPLY CHANGES", spark))
        case None    => Left(t.expectLong(what))
      }
      t.expectKw("FROM"); t.expectKw("CHANGES")
      val srcRef = t.expectIdent("a source table")
      val src = resolve(srcRef).getOrElse(throw t.err(
        s"APPLY CHANGES: source '$srcRef' must be a graft-catalog table"))
      t.expectKw("FROM")
      val from = bound("the FROM version")
      t.expectKw("TO")
      val to = bound("the TO version")
      t.expectKw("KEY"); t.expectKw("(")
      val key = stripTicks(t.expectIdent("a key column"))
      t.expectKw(")")
      val sums =
        if (t.takeKw("SUM")) {
          t.expectKw("(")
          val cs = Vector.newBuilder[String]
          cs += stripTicks(t.expectIdent("a sum column"))
          while (t.takeKw(","))
            cs += stripTicks(t.expectIdent("a sum column"))
          t.expectKw(")")
          cs.result()
        } else Vector.empty[String]
      val txn =
        if (t.takeKw("TXN")) {
          val w = t.expectString("the writer id")
          t.expectKw("EPOCH")
          Some((w, t.expectLong("the epoch")))
        } else None
      t.expectEnd()
      GraftRowLevelCommand(s"APPLY CHANGES INTO $mirRef", () => {
        val (f, v) = (from, to) match {
          case (Left(a), Left(b))   => (a, b)
          case (Right(a), Right(b)) => src.versionWindowByTimestamp(a, b)
          case _ => throw new IllegalArgumentException(
            "APPLY CHANGES: FROM/TO must both be versions or both " +
              "be timestamps")
        }
        val mir = GraftTable.load(spark, mirRoot)
        val feed = src.changeFeed(f, v)
        if (sums.isEmpty) mir.applyChangesKeyed(feed, key)
        else mir.applyChangesAgg(feed, key, sums, txn)
        ()
      })
    }
  }

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
        // bounds follow the table_changes dual form: numbers are
        // versions, quoted strings are timestamps resolved through the
        // monotone ts= headers (mixed forms refuse)
        def bound(what: String): Either[Long, Long] = t.takeString() match {
          case Some(s) =>
            Right(GraftTxnSql.parseTsMillis(s, "DESCRIBE CHANGES", spark))
          case None => Left(t.expectLong(what))
        }
        t.expectKw("FROM")
        val from = bound("a version")
        t.expectKw("TO")
        val to = bound("a version")
        val (fromV, toV) = (from, to) match {
          case (Left(f), Left(v))   => (f, v)
          case (Right(f), Right(v)) => table.versionWindowByTimestamp(f, v)
          case _ => throw t.err(
            "DESCRIBE CHANGES: FROM/TO must both be versions or both " +
              "be timestamps")
        }
        // KEYED BY (k1, k2): the classified CDC form — update pairs for
        // keys present on both sides of the diff (changeFeedKeyed)
        val keys =
          if (t.takeKw("KEYED")) {
            t.expectKw("BY"); t.expectKw("(")
            val ks = Vector.newBuilder[String]
            ks += stripTicks(t.expectIdent("a key column"))
            while (t.takeKw(",")) ks += stripTicks(t.expectIdent("a key column"))
            t.expectKw(")")
            ks.result()
          } else Vector.empty[String]
        // BY VERSION: the per-commit attributed form — each version's
        // own net diff tagged _commit_version/_commit_timestamp
        // (changeFeedByVersion, the Delta table_changes shape)
        val byVersion = t.takeKw("BY") && { t.expectKw("VERSION"); true }
        t.expectEnd()
        (if (byVersion) {
           require(keys.isEmpty,
             "DESCRIBE CHANGES: KEYED BY and BY VERSION are exclusive")
           table.changeFeedByVersion(fromV, toV)
         } else if (keys.nonEmpty) table.changeFeedKeyed(fromV, toV, keys)
         else table.changeFeed(fromV, toV)).queryExecution.logical
      }
    } else if (t.takeKw("TXN")) {
      // DESCRIBE TXN '<marker>': one row per participant table of a
      // committed multi-table txn — (table_root, version), the
      // discovery step before snapshot_at_txn() pinned reads
      val marker = t.takeString().getOrElse(
        throw t.err("expected a quoted txn marker after DESCRIBE TXN"))
      t.expectEnd()
      Some(GraftTxnSql.participantsDF(spark, marker)
        .queryExecution.logical)
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
        case "COMMIT" if ts.lift(1).exists(_.equalsIgnoreCase("ATOMIC")) =>
          parseCommitAtomic(sqlText, t)
        case "INSERT" if ts.exists(_.equalsIgnoreCase("REPLACE")) =>
          parseInsertReplaceWhere(t)
        case "APPLY" if ts.lift(1).exists(_.equalsIgnoreCase("CHANGES")) =>
          parseApplyChanges(t)
        case _ => None
      }
    }
    // MERGE star-action bits are a PARSER fact the analyzer erases
    // (star actions expand to full assignment lists during resolution)
    // — stamp them on every delegate-parsed plan so the schema-
    // evolution conversion reads the written syntax, not an inference
    // over the expanded shape (r16 directive #7)
    plan.getOrElse(MergeStarTag.stamp(delegate.parsePlan(sqlText)))
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
