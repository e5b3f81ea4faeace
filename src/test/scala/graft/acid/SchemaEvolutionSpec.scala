package graft.acid

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution on the commit-log table: ALTER TABLE ADD COLUMNS as a
  * metadata-only commit, mergeSchema appends, per-version schema time
  * travel, and the evolution-aware read/rewrite paths (snapshot, scoped
  * rewrites, change feed, SQL catalog). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): GraftTable =
    new GraftTable(spark, graft.TempDirs.create("graft_evo_spec"))

  private def rows(n: Int, off: Int = 0) =
    (1 to n).map(i => (i.toLong + off, s"u${i + off}", i * 1.5)).toDF("id", "name", "v")

  test("addColumn is metadata-only: files carry over, old rows read NULL") {
    val t = freshTable()
    t.append(rows(3))
    val filesBefore = t.activeFiles(1L).toSet
    t.addColumn("score", DoubleType)
    assert(t.activeFiles(2L).toSet == filesBefore, "add_column must not rewrite data")
    val snap = t.snapshot()
    assert(snap.columns.toSeq == Seq("id", "name", "v", "score"))
    assert(snap.filter($"score".isNull).count() == 3)
    // the pre-evolution version time-travels with ITS schema
    assert(t.snapshot(Some(1L)).columns.toSeq == Seq("id", "name", "v"))
  }

  test("appends after evolution: missing columns fill NULL, new files carry values") {
    val t = freshTable()
    t.append(rows(2))
    t.addColumn("score", DoubleType)
    // a post-evolution append WITHOUT the new column still conforms
    t.append(rows(2, 10))
    // and one WITH it writes real values
    t.append(Seq((100L, "x", 9.0, 0.5)).toDF("id", "name", "v", "score"))
    val snap = t.snapshot()
    assert(snap.count() == 5)
    assert(snap.filter($"score".isNotNull).select($"id").as[Long].collect().toSeq == Seq(100L))
  }

  test("mergeSchema append evolves; without it extra columns are rejected") {
    val t = freshTable()
    t.append(rows(2), mergeSchema = true) // starts schema tracking
    assert(t.tableSchema.map(_.fieldNames.toSeq).contains(Seq("id", "name", "v")))
    intercept[IllegalArgumentException] {
      t.append(Seq((5L, "y", 1.0, "en")).toDF("id", "name", "v", "lang"))
    }
    t.append(Seq((5L, "y", 1.0, "en")).toDF("id", "name", "v", "lang"),
      mergeSchema = true)
    val snap = t.snapshot()
    assert(snap.columns.toSeq == Seq("id", "name", "v", "lang"))
    assert(snap.filter($"lang".isNull).count() == 2)
    assert(snap.filter($"lang" === "en").count() == 1)
  }

  test("delete/update/compact carry the evolved schema forward") {
    val t = freshTable()
    t.append(rows(4))
    t.addColumn("tag", StringType)
    t.update($"id" === 2L, Map("tag" -> lit("hot")))
    t.delete($"id" === 3L)
    t.compact(targetFiles = 1)
    val snap = t.snapshot()
    assert(snap.columns.toSeq == Seq("id", "name", "v", "tag"))
    assert(snap.count() == 3)
    assert(snap.filter($"tag" === "hot").select($"id").as[Long].collect().toSeq == Seq(2L))
    assert(t.tableSchema.map(_.fieldNames.toSeq).contains(Seq("id", "name", "v", "tag")))
  }

  test("change feed across an evolution boundary states old rows in the new schema") {
    val t = freshTable()
    t.append(rows(2))                       // v1
    t.addColumn("score", DoubleType)        // v2 (metadata only)
    t.append(Seq((10L, "z", 2.0, 7.5)).toDF("id", "name", "v", "score")) // v3
    val feed = t.changeFeed(1L, 3L)
    assert(feed.columns.toSeq == Seq("id", "name", "v", "score", "_change"))
    // pure append across the boundary: one insert, zero deletes
    assert(feed.filter($"_change" === "delete").count() == 0)
    val ins = feed.filter($"_change" === "insert")
    assert(ins.count() == 1 && ins.select($"score").as[Double].head() == 7.5)
  }

  test("partition-scoped rewrite on an evolved table keeps untouched files byte-identical") {
    val root = graft.TempDirs.create("graft_evo_scoped")
    val t = new GraftTable(spark, root, partitionCol = Some("pid"))
    val df = (1 to 40).map(i => (i.toLong, i.toLong % 4, s"u$i")).toDF("id", "pid", "name")
    t.append(df)
    t.addColumn("note", StringType)
    val before = t.entries(t.latestVersion.get).map(_.path).toSet
    t.delete($"pid" === 2L && $"id" > 10L)
    val after = t.entries(t.latestVersion.get).map(_.path).toSet
    assert((before intersect after).nonEmpty, "untouched partition files must carry over")
    val snap = t.snapshot()
    assert(snap.columns.toSeq == Seq("id", "pid", "name", "note"))
    assert(snap.filter($"pid" === 2L).count() == 3) // ids 2, 6, 10 survive
    assert(snap.filter($"note".isNull).count() == snap.count())
  }

  test("SQL catalog: ALTER TABLE ADD COLUMNS then INSERT and read back") {
    val warehouse = graft.TempDirs.create("graft_evo_catalog")
    spark.conf.set("spark.sql.catalog.evo_cat", "graft.acid.GraftCatalog")
    spark.conf.set("spark.sql.catalog.evo_cat.root", warehouse)
    spark.sql("CREATE TABLE evo_cat.t (id BIGINT, name STRING) USING graft")
    spark.sql("INSERT INTO evo_cat.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE evo_cat.t ADD COLUMNS (score DOUBLE)")
    spark.sql("INSERT INTO evo_cat.t VALUES (3, 'c', 1.25)")
    val out = spark.sql("SELECT id, name, score FROM evo_cat.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(out.toSeq == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(1.25))))
    // ALTER on a still-empty table evolves the sidecar
    spark.sql("CREATE TABLE evo_cat.empty (id BIGINT) USING graft")
    spark.sql("ALTER TABLE evo_cat.empty ADD COLUMNS (tag STRING)")
    assert(spark.table("evo_cat.empty").columns.toSeq == Seq("id", "tag"))
  }
}
