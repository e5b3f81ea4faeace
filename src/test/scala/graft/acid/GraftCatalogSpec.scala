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

  test("SQL DELETE routes through the commit log with partition scoping") {
    enableCatalog()
    val t = new GraftTable(spark, s"$warehouse/del", partitionCol = Some("day"))
    t.append((1L to 40L).map(i => (i, i % 4, s"n$i")).toDF("id", "day", "name"))
    // partition-pinned DELETE: only day-2 files rewrite
    val before = t.activeFiles(t.latestVersion.get).toSet
    spark.sql("DELETE FROM graft.del WHERE day = 2")
    assert(spark.sql("SELECT count(*) AS n FROM graft.del").as[Long].head() == 30L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.del WHERE day = 2").as[Long].head() == 0L)
    val after = t.activeFiles(t.latestVersion.get).toSet
    assert((before -- after).nonEmpty, "day-2 files replaced")
    assert((before & after).nonEmpty,
      "untouched partitions' files must carry over (scoped rewrite)")
    assert(t.history().last.op.contains("delete"))
    // arbitrary-predicate DELETE still works (full copy-on-write path)
    spark.sql("DELETE FROM graft.del WHERE id > 35")
    assert(spark.sql("SELECT max(id) AS m FROM graft.del").as[Long].head() <= 35L)
    // DELETE against a time-travel snapshot is rejected
    val err = intercept[Throwable] {
      spark.sql("DELETE FROM graft.del VERSION AS OF 1 WHERE id = 1")
    }
    assert(err != null)
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
}
