package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `graft` TableCatalog: named ACID tables reachable from plain SQL —
  * SELECT, INSERT INTO/OVERWRITE, VERSION/TIMESTAMP AS OF — sharing one
  * write path (commit log, CHECK, clustering) with the Scala API. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = graft.TempDirs.create("graft_catalog_wh")
  private def enableCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.acid.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", warehouse)
  }

  test("SQL reads a Scala-API table; INSERT INTO round-trips through the log") {
    enableCatalog()
    // table created via the Scala API at the catalog's root...
    val t = new GraftTable(spark, s"$warehouse/users")
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v"))
    // ...is immediately visible to SQL by name
    assert(spark.sql("SELECT id, name FROM graft.users ORDER BY id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    // SQL INSERT INTO appends through the SAME commit log
    spark.sql("INSERT INTO graft.users VALUES (3, 'c', 3.0)")
    assert(t.versions == Seq(1L, 2L), "the INSERT must be commit v2")
    assert(t.history().last.op == "append")
    assert(spark.sql("SELECT sum(id) AS s FROM graft.users").as[Long].head() == 6L)
    // INSERT OVERWRITE replaces content as one atomic commit
    spark.sql("INSERT OVERWRITE graft.users VALUES (9, 'z', 9.0)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.users").as[Long].head() == 1L)
    assert(t.snapshot(Some(2L)).count() == 3L, "old versions stay readable")
  }

  test("VERSION AS OF and TIMESTAMP AS OF reach time travel from SQL") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/tt")
    t.append(Seq((1L, "a")).toDF("id", "name"))          // v1
    Thread.sleep(5)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(5)
    t.append(Seq((2L, "b")).toDF("id", "name"))          // v2
    assert(spark.sql("SELECT count(*) AS n FROM graft.tt VERSION AS OF 1")
      .as[Long].head() == 1L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.tt VERSION AS OF 2")
      .as[Long].head() == 2L)
    val tsLit = new java.sql.Timestamp(betweenMs).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.tt TIMESTAMP AS OF '$tsLit'")
      .as[Long].head() == 1L,
      "timestamp between v1 and v2 must resolve to v1")
  }

  test("CREATE TABLE declares an empty queryable table; first INSERT commits v1") {
    enableCatalog()
    spark.sql("CREATE TABLE graft.fresh (id BIGINT, name STRING)")
    assert(spark.sql("SELECT * FROM graft.fresh").isEmpty)
    spark.sql("INSERT INTO graft.fresh VALUES (1, 'x'), (2, 'y')")
    assert(spark.sql("SELECT count(*) AS n FROM graft.fresh").as[Long].head() == 2L)
    assert(new GraftTable(spark, s"$warehouse/fresh").versions == Seq(1L))
    // SHOW TABLES sees every table under the root
    val names = spark.sql("SHOW TABLES IN graft").select("tableName")
      .as[String].collect().toSet
    assert(Set("fresh").subsetOf(names), s"got $names")
  }

  test("SQL DELETE routes through the commit log; small deletes land as DVs") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/del", partitionCol = Some("day"))
    t.append((1L to 40L).map(i => (i, i % 4, s"n$i")).toDF("id", "day", "name"))
    // small DELETE: a zero-rewrite deletion-vector commit — the active
    // paths are untouched, only dv tags move, and every SQL read below
    // goes through the planner-injected mask
    val before = t.activeFiles(t.latestVersion.get).toSet
    spark.sql("DELETE FROM graft.del WHERE day = 2 AND id <= 20")
    assert(spark.sql("SELECT count(*) AS n FROM graft.del").as[Long].head() == 35L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.del WHERE day = 2").as[Long].head() == 5L)
    val after = t.activeFiles(t.latestVersion.get).toSet
    assert(after == before, "a partial DV delete must not touch any data file")
    assert(t.entries(t.latestVersion.get).exists(_.dvRef.isDefined),
      "the SQL DELETE must land as a deletion-vector commit")
    assert(t.history().last.op.contains("delete"))
    // arbitrary-predicate DELETE still works
    spark.sql("DELETE FROM graft.del WHERE id > 35")
    assert(spark.sql("SELECT max(id) AS m FROM graft.del").as[Long].head() <= 35L)
    // DELETE against a time-travel snapshot is rejected
    val err = intercept[Throwable] {
      spark.sql("DELETE FROM graft.del VERSION AS OF 1 WHERE id = 1")
    }
    assert(err != null)
  }

  test("SQL UPDATE applies old-row semantics; small updates land merge-on-read") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/upd", partitionCol = Some("day"))
    t.append((1L to 40L).map(i => (i, i % 4, i * 1.0)).toDF("id", "day", "v"))
    val before = t.activeFiles(t.latestVersion.get).toSet
    spark.sql("UPDATE graft.upd SET v = v + 100 WHERE day = 2 AND id <= 20")
    val after = t.activeFiles(t.latestVersion.get).toSet
    assert(before.subsetOf(after), "DV update: old files stay, masked")
    assert((after -- before).nonEmpty, "the updated copies append as new files")
    assert(t.entries(t.latestVersion.get).exists(_.dvRef.isDefined),
      "the SQL UPDATE must land merge-on-read")
    assert(spark.sql("SELECT sum(v) AS s FROM graft.upd WHERE day = 2")
      .as[Double].head() == (2.0 + 6 + 10 + 14 + 18 + 22 + 26 + 30 + 34 + 38) + 500.0)
    assert(spark.sql("SELECT sum(v) AS s FROM graft.upd WHERE day = 1")
      .as[Double].head() == 1.0 + 5 + 9 + 13 + 17 + 21 + 25 + 29 + 33 + 37)
    assert(t.history().last.op == "update")
    // every RHS evaluates against the OLD row: SET a = b, b = a swaps
    val sw = new GraftTable(spark, s"$warehouse/swp")
    sw.append(Seq((1L, 2L)).toDF("a", "b"))
    spark.sql("UPDATE graft.swp SET a = b, b = a")
    assert(spark.sql("SELECT a, b FROM graft.swp").as[(Long, Long)].head() == (2L, 1L))
  }

  test("SQL MERGE INTO: conditioned update/delete/insert and partition-scoped upsert") {
    enableCatalog()
    // canonical upsert, ON pinning the partition column → scoped rewrite
    val t = new GraftTable(spark, s"$warehouse/mrg", partitionCol = Some("day"))
    t.append((1L to 40L).map(i => (i, i % 4, i * 1.0)).toDF("id", "day", "v"))
    val before = t.activeFiles(t.latestVersion.get).toSet
    spark.sql("""MERGE INTO graft.mrg t
      USING (SELECT CAST(2 AS BIGINT) AS mid, CAST(2 AS BIGINT) AS mday, 999.0 AS mv
             UNION ALL SELECT 99, 2, 123.0) s
      ON t.id = s.mid AND t.day = s.mday
      WHEN MATCHED THEN UPDATE SET v = s.mv
      WHEN NOT MATCHED THEN INSERT (id, day, v) VALUES (s.mid, s.mday, s.mv)""")
    val after = t.activeFiles(t.latestVersion.get).toSet
    assert((before & after).nonEmpty, "only day-2 files rewrite on a pinned merge")
    assert(spark.sql("SELECT count(*) AS n FROM graft.mrg").as[Long].head() == 41L)
    assert(spark.sql("SELECT v FROM graft.mrg WHERE id = 2").as[Double].head() == 999.0)
    assert(spark.sql("SELECT v FROM graft.mrg WHERE id = 99").as[Double].head() == 123.0)
    assert(t.history().last.op == "merge")
    // general actions: matched DELETE + NOT MATCHED BY SOURCE UPDATE
    val g = new GraftTable(spark, s"$warehouse/mrg2")
    g.append(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"))
    spark.sql("""MERGE INTO graft.mrg2 t
      USING (SELECT CAST(2 AS BIGINT) AS id UNION ALL SELECT 9) s
      ON t.id = s.id
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v * 2""")
    assert(spark.sql("SELECT id, v FROM graft.mrg2 ORDER BY id")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 20.0), (3L, 60.0)))
  }

  test("SQL reads a DV'd table without reorg: mask applied, pushdown kept") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/dvr", statsCol = Some("id"))
    t.append((1L to 1000L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartitionByRange(4, $"id"))
    t.delete($"id" === 7L)   // API-side DV commit
    t.delete($"id" === 500L) // second mask, different file
    assert(t.entries(t.latestVersion.get).exists(_.dvRef.isDefined),
      "fixture must carry deletion vectors")
    // plain SELECTs apply the mask — no reorg needed
    assert(spark.sql("SELECT count(*) AS n FROM graft.dvr").as[Long].head() == 998L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.dvr WHERE id = 7")
      .as[Long].head() == 0L)
    assert(spark.sql(
      "SELECT sum(id) AS s FROM graft.dvr WHERE id BETWEEN 1 AND 10")
      .as[Long].head() == 55L - 7L)
    // time travel: the DV'd version masks, the pre-delete version doesn't
    assert(spark.sql("SELECT count(*) AS n FROM graft.dvr VERSION AS OF 2")
      .as[Long].head() == 999L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.dvr VERSION AS OF 1")
      .as[Long].head() == 1000L)
    // the replacement plan still prunes + pushes down: a range read on the
    // clustered stats column scans a file subset and parquet sees filters
    val narrow = spark.sql("SELECT id FROM graft.dvr WHERE id BETWEEN 1 AND 10")
    val exec = narrow.queryExecution.executedPlan.toString
    assert(exec.contains("PushedFilters: [") && exec.contains("GreaterThanOrEqual"),
      s"pushed filters must reach the parquet scan:\n$exec")
    assert(narrow.count() == 9L)
    // joins/aggregates compose over the masked relation
    assert(spark.sql(
      """SELECT count(*) AS n FROM graft.dvr a JOIN graft.dvr b ON a.id = b.id
        |WHERE a.id <= 8""".stripMargin).as[Long].head() == 7L)
    // caching materializes THROUGH the mask (the rewrite runs inside the
    // cache's optimization), and views expand to the masked relation
    spark.sql("CACHE TABLE graft.dvr")
    try assert(spark.sql("SELECT count(*) AS n FROM graft.dvr")
      .as[Long].head() == 998L)
    finally spark.sql("UNCACHE TABLE graft.dvr")
    spark.sql("CREATE OR REPLACE TEMP VIEW dvr_v AS SELECT id FROM graft.dvr WHERE id < 100")
    assert(spark.sql("SELECT count(*) AS n FROM dvr_v").as[Long].head() == 98L)
  }

  test("INSERT INTO ... SELECT from a DV'd table reads through the mask") {
    enableCatalog()
    // the DML command's QUERY side holds the DV scan (its own TARGET
    // relation must stay raw for write planning) — the rewrite must
    // descend into exactly the query side
    val src = new GraftTable(spark, s"$warehouse/dvsrc")
    src.append((1L to 100L).map(i => (i, i * 2)).toDF("id", "v"))
    src.delete($"id" === 50L)
    assert(src.entries(src.latestVersion.get).exists(_.dvRef.isDefined))
    spark.sql("CREATE TABLE graft.dvdst (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.dvdst SELECT id, v FROM graft.dvsrc")
    assert(spark.sql("SELECT count(*) AS n FROM graft.dvdst").as[Long].head() == 99L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.dvdst WHERE id = 50")
      .as[Long].head() == 0L, "the masked row leaked through an INSERT-SELECT")
  }

  test("filter pushdown and pruning reach the parquet scan through the catalog") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/scan")
    t.append((1L to 100L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "v"))
    val df = spark.sql("SELECT name FROM graft.scan WHERE id = 7")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.get
    val desc = scan.scan.description()
    assert(desc.contains("PushedFilters") && desc.contains("id"),
      s"the id filter must push into the parquet scan:\n$desc")
    assert(scan.scan.readSchema().fieldNames.toSet == Set("id", "name"),
      "unreferenced columns must prune out of the scan")
    assert(df.as[String].collect().toSeq == Seq("n7"))
  }

  test("SQL WHERE prunes files through the manifest index") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/mskip", statsCol = Some("k"))
    t.append((0L to 99L).map(k => (k, k * 2)).toDF("k", "v"))
    t.append((100L to 199L).map(k => (k, k * 2)).toDF("k", "v"))
    t.append((200L to 299L).map(k => (k, k * 2)).toDF("k", "v"))
    val allFiles = t.activeFiles(t.latestVersion.get).size
    val df = spark.sql("SELECT k, v FROM graft.mskip WHERE k BETWEEN 120 AND 150")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.get
    // the scan covers ONLY the files whose manifest window overlaps —
    // decided from metadata, with row-group pushdown still negotiated.
    // (Dataset.inputFiles is blind to non-FileTable V2 relations — the
    // scan's own static file list is the real witness.)
    val kept = scan.scan
      .asInstanceOf[org.apache.spark.sql.GraftStatsScan].staticFiles.size
    assert(kept < allFiles,
      s"expected a manifest-pruned scan, got $kept of $allFiles files")
    assert(scan.scan.description().contains("PushedFilters"),
      "parquet pushdown must survive the manifest pruning wrapper")
    assert(df.count() == 31L)
    assert(spark.sql("SELECT sum(v) AS s FROM graft.mskip").as[Double].head() ==
      (0L to 299L).map(_ * 2.0).sum)
  }

  test("SQL string predicates prune files through string windows") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/strskip",
      indexCols = Seq("doc_id"))
    def docs(p: Char, n: Int) =
      (0 until n).map(i => (f"$p$i%05d", i.toLong)).toDF("doc_id", "v")
    t.append(docs('a', 100)); t.append(docs('m', 100)); t.append(docs('z', 100))
    val allFiles = t.activeFiles(t.latestVersion.get).size
    val df = spark.sql("SELECT v FROM graft.strskip WHERE doc_id = 'm00042'")
    val kept = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.scan.asInstanceOf[org.apache.spark.sql.GraftStatsScan].staticFiles.size
    }.get
    assert(kept < allFiles,
      s"string equality must prune: $kept of $allFiles files")
    assert(df.as[Long].collect().toSeq == Seq(42L))
  }

  test("parquet footer-stats aggregate pushdown survives the pruning wrapper") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/aggpd")
    t.append((1L to 1000L).map(i => (i, i * 3)).toDF("id", "v"))
    spark.conf.set("spark.sql.parquet.aggregatePushDown", "true")
    try {
      val df = spark.sql("SELECT count(*) AS n, min(id) AS lo, max(id) AS hi " +
        "FROM graft.aggpd")
      assert(df.as[(Long, Long, Long)].head() == (1000L, 1L, 1000L))
      // AQE wraps the agg plan; the final executed plan's scan node
      // carries the PushedAggregation marker when footers answered it
      val planStr = df.queryExecution.executedPlan.toString
      assert(planStr.contains("PushedAggregation"),
        s"count/min/max must push into the parquet footers:\n$planStr")
    } finally spark.conf.set("spark.sql.parquet.aggregatePushDown", "false")
  }

  test("unfiltered COUNT(*) answers from manifest row counts, zero file opens") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/metacount")
    t.append((1L to 800L).toDF("id"))
    t.append((801L to 1000L).toDF("id"))
    val df = spark.sql("SELECT count(*) AS n FROM graft.metacount")
    assert(df.as[Long].head() == 1000L)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("ManifestAggScan") || planStr.contains("LocalTableScan"),
      s"count(*) must resolve from the manifest, not a parquet scan:\n$planStr")
    assert(df.inputFiles.isEmpty, "a manifest count must open no data files")
    // a filtered count still scans (and is exact)
    assert(spark.sql("SELECT count(*) AS n FROM graft.metacount WHERE id <= 10")
      .as[Long].head() == 10L)
    // mutations keep the metadata count honest
    spark.sql("DELETE FROM graft.metacount WHERE id > 900")
    assert(spark.sql("SELECT count(*) AS n FROM graft.metacount").as[Long].head() == 900L)
  }

  test("unfiltered MIN/MAX on windowed columns answer from manifest windows") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/metaminmax",
      statsCol = Some("k"), indexCols = Seq("x"))
    t.append((1L to 800L).map(i => (i, i % 97)).toDF("k", "x"))
    t.append((801L to 1000L).map(i => (i, i % 97)).toDF("k", "x"))
    val df = spark.sql(
      "SELECT min(k) AS mn, max(k) AS mx, max(x) AS mxx, count(*) AS n " +
        "FROM graft.metaminmax")
    assert(df.as[(Long, Long, Long, Long)].head() == ((1L, 1000L, 96L, 1000L)))
    assert(df.inputFiles.isEmpty,
      "manifest-served extrema must open no data files")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan") ||
      df.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    // an UNWINDOWED column cannot serve: the query still answers, from
    // the scan (parquet footer stats or full agg)
    val t2 = new GraftTable(spark, s"$warehouse/metaminmax2")
    t2.append((1L to 50L).toDF("id"))
    assert(spark.sql("SELECT min(id) AS mn FROM graft.metaminmax2")
      .as[Long].head() == 1L)
    // a filter disqualifies the shortcut but stays exact
    assert(spark.sql(
      "SELECT max(k) AS mx FROM graft.metaminmax WHERE k <= 123")
      .as[Long].head() == 123L)
    // DELETION VECTORS disqualify extrema (the mask may have removed the
    // extremum row) — the masked scan answers, exactly
    spark.sql("DELETE FROM graft.metaminmax WHERE k = 1000")
    val after = spark.sql(
      "SELECT max(k) AS mx, count(*) AS n FROM graft.metaminmax")
    assert(after.as[(Long, Long)].head() == ((999L, 999L)),
      "a masked extremum must never resurrect through the shortcut")
  }

  test("TBLPROPERTIES declare the physical config: stats/bloom/index/CHECK") {
    enableCatalog()
    spark.sql("""CREATE TABLE graft.conf (k BIGINT, id BIGINT, x BIGINT, y BIGINT,
      v DOUBLE) TBLPROPERTIES ('statsCol'='k', 'bloomCol'='id',
      'indexCols'='x,y', 'check.positive'='v >= 0')""")
    spark.sql("INSERT INTO graft.conf SELECT id AS k, id, id % 7 AS x, " +
      "id % 11 AS y, id * 0.5 AS v FROM range(100)")
    val t = GraftTable.load(spark, s"$warehouse/conf")
    // the first INSERT recorded the whole config in the log
    assert(t.fastCount() == 100L)
    assert(t.filesForPredicate($"id" === 5L).nonEmpty)
    assert(t.snapshotRangeOn("x", 0L, 3L).count() ==
      (0L until 100L).count(_ % 7 <= 3))
    // the CHECK from TBLPROPERTIES rejects violating SQL INSERTs
    val err = intercept[Exception] {
      spark.sql("INSERT INTO graft.conf VALUES (1, 1, 1, 1, -5.0)")
    }
    assert(err.getMessage != null)
    assert(t.fastCount() == 100L, "a violating INSERT must commit nothing")
    // unknown properties are rejected loudly, not silently dropped
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.badprop (id BIGINT) " +
        "TBLPROPERTIES ('zorderBy'='id')")
    }
  }

  test("CREATE TABLE PARTITIONED BY wires the partition column into the log") {
    enableCatalog()
    spark.sql("CREATE TABLE graft.parted (id BIGINT, day BIGINT, v DOUBLE) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO graft.parted SELECT id, id % 4 AS day, id * 1.5 " +
      "FROM range(40)")
    // the first INSERT recorded pcol in the log: a plain load recovers it
    val t = GraftTable.load(spark, s"$warehouse/parted")
    assert(t.partitionColName.contains("day"))
    // and a partition-pinned SQL DELETE rewrites only intersecting files
    val before = t.snapshot().inputFiles.toSet
    spark.sql("DELETE FROM graft.parted WHERE day = 2")
    val after = GraftTable.load(spark, s"$warehouse/parted").snapshot().inputFiles.toSet
    assert((before intersect after).nonEmpty, "untouched partitions must carry over")
    assert(spark.sql("SELECT count(*) AS n FROM graft.parted").as[Long].head() == 30L)
    // DESCRIBE surfaces the partitioning
    val desc = spark.sql("DESCRIBE TABLE graft.parted").collect().map(_.getString(0))
    assert(desc.contains("# Partition Information"), s"got ${desc.toSeq}")
    // non-identity partition transforms are rejected loudly
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.bad (id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (days(ts))")
    }
  }

  test("multi-column PARTITIONED BY: either column's pin scopes the rewrite") {
    enableCatalog()
    spark.sql("CREATE TABLE graft.multi (id BIGINT, a BIGINT, b BIGINT, v DOUBLE) " +
      "PARTITIONED BY (a, b)")
    // disjoint (a, b) bands per insert → narrow per-file windows for BOTH
    (0 until 3).foreach { band =>
      spark.sql(s"INSERT INTO graft.multi SELECT id, $band AS a, " +
        s"${10 + band} AS b, CAST(id AS DOUBLE) AS v " +
        "FROM range(100)")
    }
    val t = GraftTable.load(spark, s"$warehouse/multi")
    val before = t.snapshot().inputFiles.toSet
    // pin on the LEADING partition column → partition-scoped rewrite
    spark.sql("DELETE FROM graft.multi WHERE a = 1")
    val afterA = GraftTable.load(spark, s"$warehouse/multi").snapshot().inputFiles.toSet
    assert((before intersect afterA).nonEmpty, "a-pin must carry files over")
    // pin on the SECOND partition column → window-scoped rewrite through
    // its recorded per-file windows (indexCols mapping)
    val t2 = GraftTable.load(spark, s"$warehouse/multi")
    val pruned = t2.filesForPredicate(col("b") === 12L)
    assert(pruned.size < t2.activeFiles(t2.latestVersion.get).size,
      "the second partition column must prune through its windows")
    spark.sql("DELETE FROM graft.multi WHERE b = 12")
    val afterB = GraftTable.load(spark, s"$warehouse/multi").snapshot().inputFiles.toSet
    assert((afterA intersect afterB).nonEmpty, "b-pin must carry files over")
    assert(spark.sql("SELECT count(*) AS n FROM graft.multi").as[Long].head() == 100L)
  }

  test("namespaces: CREATE/SHOW/DROP NAMESPACE and tables inside them") {
    enableCatalog()
    spark.sql("CREATE NAMESPACE graft.raw")
    val ns = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0))
    assert(ns.contains("raw"), s"got ${ns.toSeq}")
    // a table in the namespace round-trips by its qualified name
    spark.sql("CREATE TABLE graft.raw.docs (id BIGINT, body STRING)")
    spark.sql("INSERT INTO graft.raw.docs VALUES (1, 'x'), (2, 'y')")
    assert(spark.sql("SELECT count(*) AS n FROM graft.raw.docs")
      .as[Long].head() == 2L)
    val tables = spark.sql("SHOW TABLES IN graft.raw").collect()
      .map(_.getString(1))
    assert(tables.contains("docs"), s"got ${tables.toSeq}")
    // a TABLE directory is not a namespace
    assert(!spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("raw.docs"))
    // dropping a non-empty namespace without CASCADE refuses; CASCADE works
    intercept[Exception] { spark.sql("DROP NAMESPACE graft.raw") }
    spark.sql("DROP NAMESPACE graft.raw CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).contains("raw"))
  }

  test("a scoped merge pays ONE planning scan (no second distinct-count job)") {
    enableCatalog()
    val root = graft.TempDirs.create("graft_jobcount")
    val t = new GraftTable(spark, root, partitionCol = Some("pid"))
    t.append((0L until 64L).map(i => (i, i % 8, s"v$i")).toDF("id", "pid", "name"))
    val updates = Seq((3L, 3L, "updated")).toDF("id", "pid", "name")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      t.merge(updates, Seq("id"), Seq(col("name").asc)) // "updated" < "v3"
      Thread.sleep(300) // let the listener bus drain
    } finally spark.sparkContext.removeSparkListener(listener)
    // planning scan (touchedPartitions) + rewrite write (AQE stages) +
    // CHECK/stats passes: 7 observed with the fold; the pre-fold shape
    // paid one MORE distinct().count() job per mutation — a regression
    // here means a second planning scan crept back in
    assert(jobs.get() <= 7,
      s"scoped merge ran ${jobs.get()} jobs — an extra planning scan crept in")
    assert(t.snapshot().filter(col("name") === "updated").count() == 1L)
  }

  test("runtime file pruning: a star join's dim keys prune fact files at execution") {
    enableCatalog()
    // fact clustered on k (disjoint per-file windows), dim tiny — the
    // broadcast dimension's surviving join keys arrive at the fact scan
    // as a runtime IN filter and re-prune the FILE LIST through the
    // manifest windows: dynamic partition pruning with zero
    // directory-layout requirements
    val fact = new GraftTable(spark, s"$warehouse/dppfact", statsCol = Some("k"))
    fact.append((0L to 99L).map(k => (k, k * 2)).toDF("k", "v").coalesce(1))
    fact.append((100L to 199L).map(k => (k, k * 2)).toDF("k", "v").coalesce(1))
    fact.append((200L to 299L).map(k => (k, k * 2)).toDF("k", "v").coalesce(1))
    val dim = new GraftTable(spark, s"$warehouse/dppdim")
    dim.append(Seq((5L, "hot"), (150L, "cold"), (250L, "cold")).toDF("k", "cat"))
    val df = spark.sql(
      """SELECT f.k, f.v FROM graft.dppfact f JOIN graft.dppdim d ON f.k = d.k
        |WHERE d.cat = 'hot'""".stripMargin)
    // execute THIS dataset (.as[] would wrap a fresh QueryExecution and
    // the inspected scan instance would never run)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((5L, 10L)))
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // AQE wraps stages in QueryStageExec LEAF nodes — descend explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.flatMap {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case _ => Nil
      }
    val factScans = scans(finalPlan).filter(b =>
      b.scan.isInstanceOf[org.apache.spark.sql.GraftStatsScan] &&
        b.runtimeFilters.nonEmpty)
    assert(factScans.nonEmpty,
      s"expected a runtime-filtered graft scan in the final plan:\n$finalPlan")
    val s = factScans.head.scan.asInstanceOf[org.apache.spark.sql.GraftStatsScan]
    assert(s.runtimeKeptFiles.exists(_ < s.staticFiles.size),
      s"runtime filter kept ${s.runtimeKeptFiles} of ${s.staticFiles.size} files")
    // the prune surfaces as scan driver metrics (Spark UI observability)
    val dm = s.reportDriverMetrics().map(m => m.name() -> m.value()).toMap
    assert(dm.get("graftRuntimeKeptFiles").contains(1L) &&
      dm.get("graftRuntimeStaticFiles").contains(3L),
      s"runtime-prune driver metrics: $dm")
    // an anti-selective dim (no 'hot' rows at all) empties the scan
    val none = spark.sql(
      """SELECT f.k FROM graft.dppfact f JOIN graft.dppdim d ON f.k = d.k
        |WHERE d.cat = 'missing'""".stripMargin)
    assert(none.count() == 0L)
  }

  test("runtime file pruning serves STRING join keys through string windows") {
    enableCatalog()
    // the doc_id shape: a string-keyed fact clustered by key prefix —
    // the dim's surviving string keys must prune through the truncated
    // STRING windows at execution time
    val fact = new GraftTable(spark, s"$warehouse/dppsfact",
      indexCols = Seq("doc_id"))
    def docs(p: Char, n: Int) =
      (0 until n).map(i => (f"$p$i%05d", i.toLong)).toDF("doc_id", "v")
    fact.append(docs('a', 200).coalesce(1))
    fact.append(docs('m', 200).coalesce(1))
    fact.append(docs('z', 200).coalesce(1))
    val dim = new GraftTable(spark, s"$warehouse/dppsdim")
    dim.append(Seq(("m00042", "hot"), ("a00001", "cold"))
      .toDF("doc_id", "cat"))
    val df = spark.sql(
      """SELECT f.doc_id, f.v FROM graft.dppsfact f
        |JOIN graft.dppsdim d ON f.doc_id = d.doc_id
        |WHERE d.cat = 'hot'""".stripMargin)
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("m00042", 42L)))
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.flatMap {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case _ => Nil
      }
    val s = scans(finalPlan)
      .filter(b => b.scan.isInstanceOf[org.apache.spark.sql.GraftStatsScan] &&
        b.runtimeFilters.nonEmpty)
      .map(_.scan.asInstanceOf[org.apache.spark.sql.GraftStatsScan])
      .find(_.runtimeKeptFiles.isDefined)
    assert(s.exists(x => x.runtimeKeptFiles.exists(_ < x.staticFiles.size)),
      s"string-key runtime filter did not prune: " +
        s"${s.map(x => (x.runtimeKeptFiles, x.staticFiles.size))}")
  }

  test("DROP/RENAME of a path-addressed table are refused; the data survives") {
    enableCatalog()
    // an EXTERNAL table: a graft root outside the warehouse, addressed
    // by absolute path — one SQL statement must never delete it
    val ext = graft.TempDirs.create("graft_catalog_external")
    val t = new GraftTable(spark, s"$ext/payments")
    t.append(Seq((1L, "a")).toDF("id", "name"))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`$ext/payments`")
      .as[Long].head() == 1L, "path reads must keep working")
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"DROP TABLE graft.`$ext/payments`")
    }
    assert(e.getMessage.contains("external"), e.getMessage)
    val fs = new org.apache.hadoop.fs.Path(ext)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$ext/payments/_log")),
      "DROP on a path table must not touch the directory")
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(
        s"ALTER TABLE graft.`$ext/payments` RENAME TO graft.stolen")
    }
    assert(e2.getMessage.contains("external"), e2.getMessage)
    assert(t.snapshot().count() == 1L, "the table is untouched")
  }

}
