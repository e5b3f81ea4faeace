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

  test("renameColumn is metadata-only: old+new files read, time travel crosses the rename") {
    val t = freshTable()
    t.append(rows(3))                       // v1: files with physical 'name'
    val filesBefore = t.activeFiles(1L).toSet
    t.renameColumn("name", "username")      // v2: metadata-only
    assert(t.activeFiles(2L).toSet == filesBefore,
      "rename_column must not rewrite data")
    // reads resolve the ORIGINAL physical column under the new name
    val snap = t.snapshot()
    assert(snap.columns.toSeq == Seq("id", "username", "v"))
    assert(snap.orderBy($"id").select($"username").as[String].collect()
      .toSeq == Seq("u1", "u2", "u3"))
    // new appends (logical names) write the original physical name: old
    // and new files stay uniform and read together
    t.append(Seq((4L, "u4", 6.0)).toDF("id", "username", "v"))
    assert(t.snapshot().orderBy($"id").select($"username").as[String]
      .collect().toSeq == Seq("u1", "u2", "u3", "u4"))
    // the pre-rename version time-travels with ITS name
    assert(t.snapshot(Some(1L)).columns.toSeq == Seq("id", "name", "v"))
    assert(t.snapshot(Some(1L)).orderBy($"id").select($"name").as[String]
      .collect().toSeq == Seq("u1", "u2", "u3"))
    // the manifest is feature-gated: require=cm in the header
    assert(t.versions.nonEmpty)
    // filters and DML on the renamed column work (logical name)
    assert(t.snapshot().filter($"username" === "u2").count() == 1L)
    t.delete($"username" === "u2")
    assert(t.snapshot().count() == 3L)
    // RESTORE past the rename rolls the name back
    t.restore(1L)
    assert(t.snapshot().columns.toSeq == Seq("id", "name", "v"))
    assert(t.snapshot().orderBy($"id").select($"name").as[String]
      .collect().toSeq == Seq("u1", "u2", "u3"))
  }

  test("dropColumn hides the column without rewrite; re-add cannot resurrect values") {
    val t = freshTable()
    t.append(rows(3))
    val filesBefore = t.activeFiles(1L).toSet
    t.dropColumn("name")
    assert(t.activeFiles(2L).toSet == filesBefore,
      "drop_column must not rewrite data")
    assert(t.snapshot().columns.toSeq == Seq("id", "v"))
    // pre-drop version still shows it
    assert(t.snapshot(Some(1L)).columns.toSeq == Seq("id", "name", "v"))
    // re-ADD the same name: fresh physical column — old values must NOT
    // resurrect (all NULL), even though the files still carry them
    t.addColumn("name", StringType)
    val snap = t.snapshot()
    assert(snap.columns.toSeq == Seq("id", "v", "name"))
    assert(snap.filter($"name".isNull).count() == 3L,
      "re-added column must read NULL, never the dropped values")
    // and appends land values under the fresh physical name
    t.append(Seq((9L, 9.0, "fresh")).toDF("id", "v", "name"))
    assert(t.snapshot().filter($"name" === "fresh").count() == 1L)
    assert(t.snapshot().filter($"name".isNull).count() == 3L)
  }

  test("re-add fresh physical name dodges a literal namesake column") {
    val t = freshTable()
    t.append(rows(3))                    // v1: (id, name, v)
    t.dropColumn("name")                 // v2
    // a column literally named `name_4` — the exact candidate the v4
    // re-add below would generate — must NOT end up aliased by it (two
    // logical columns over one physical column would duplicate data)
    t.addColumn("name_4", StringType)    // v3
    t.addColumn("name", StringType)      // v4: fresh physical must dodge
    t.append(Seq((9L, 9.0, "literal", "fresh"))
      .toDF("id", "v", "name_4", "name"))
    val snap = t.snapshot()
    assert(snap.columns.toSeq == Seq("id", "v", "name_4", "name"))
    // the two logical columns hold DISTINCT values — no shared physical
    val r = snap.filter($"id" === 9L)
      .select($"name_4", $"name").collect().head
    assert(r.getString(0) == "literal" && r.getString(1) == "fresh",
      s"name_4/name must not alias one physical column: $r")
    // old rows: both NULL (name_4 is new; name is a fresh physical)
    assert(snap.filter($"id" < 9L && $"name".isNull && $"name_4".isNull)
      .count() == 3L)
  }

  test("re-add fresh physical name dodges a SIBLING column added in the same call") {
    val t = freshTable()
    t.append(rows(3))                    // v1: (id, name, v)
    t.dropColumn("name")                 // v2
    // one addColumns call adding BOTH the re-added `name` (fresh
    // physical candidate `name_3` at v3) and a sibling literally named
    // `name_3`: the generated physical name must dodge the sibling —
    // otherwise two logical columns alias one physical column
    t.addColumns(Seq(
      StructField("name", StringType),
      StructField("name_3", StringType))) // v3
    t.append(Seq((9L, 9.0, "fresh", "sibling"))
      .toDF("id", "v", "name", "name_3"))
    val r = t.snapshot().filter($"id" === 9L)
      .select($"name", $"name_3").collect().head
    assert(r.getString(0) == "fresh" && r.getString(1) == "sibling",
      s"name/name_3 must not alias one physical column: $r")
    // duplicate names WITHIN one call refuse loudly
    val e = intercept[IllegalArgumentException](t.addColumns(Seq(
      StructField("dup", StringType), StructField("DUP", StringType))))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("rename/drop guards: config columns, clashes, CHECK references refuse") {
    val t = new GraftTable(spark, graft.TempDirs.create("graft_cm_guard"),
      statsCol = Some("id"), constraints = Seq("v > 0"))
    t.append(rows(2))
    intercept[IllegalArgumentException](t.renameColumn("id", "key"))
    intercept[IllegalArgumentException](t.dropColumn("id"))
    intercept[IllegalArgumentException](t.renameColumn("v", "w")) // CHECK ref
    intercept[IllegalArgumentException](t.renameColumn("name", "v")) // clash
    intercept[IllegalArgumentException](t.renameColumn("nosuch", "x"))
    // mergeSchema append of a name colliding with a renamed column's
    // physical refuses loudly (it would alias old data)
    t.renameColumn("name", "username")
    intercept[IllegalArgumentException](
      t.append(Seq((5L, "u5", 5.0, "boom")).toDF("id", "username", "v", "name"),
        mergeSchema = true))
  }

  test("old readers refuse a column-mapped manifest (require=cm); clones carry the mapping") {
    val t = freshTable()
    t.append(rows(2))
    t.renameColumn("name", "username")
    // the manifest header must gate the mapping
    val lines = scala.io.Source.fromFile(
      new java.io.File(s"${t.root}/_log").listFiles()
        .filter(_.getName.endsWith(".manifest")).sortBy(_.getName).last)
      .getLines().toList
    assert(lines.head.contains("require=") && lines.head.contains("cm"),
      s"rename commit must stamp require=cm: ${lines.head}")
    // a clone of the mapped table reads identically (mapping carried)
    val cloneRoot = graft.TempDirs.create("graft_cm_clone")
    t.cloneTo(cloneRoot)
    val c = GraftTable.load(spark, cloneRoot)
    assert(c.snapshot().orderBy($"id").select($"username").as[String]
      .collect().toSeq == Seq("u1", "u2"))
  }

  test("SQL catalog: RENAME/DROP COLUMN from ALTER TABLE, reads and DML follow") {
    val warehouse = graft.TempDirs.create("graft_cm_catalog")
    spark.conf.set("spark.sql.catalog.cm_cat", "graft.acid.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cm_cat.root", warehouse)
    spark.sql("CREATE TABLE cm_cat.t (id BIGINT, name STRING, v DOUBLE) USING graft")
    spark.sql("INSERT INTO cm_cat.t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    spark.sql("ALTER TABLE cm_cat.t RENAME COLUMN name TO username")
    assert(spark.table("cm_cat.t").columns.toSeq == Seq("id", "username", "v"))
    assert(spark.sql("SELECT username FROM cm_cat.t WHERE id = 1")
      .collect().head.getString(0) == "a")
    spark.sql("INSERT INTO cm_cat.t VALUES (3, 'c', 3.0)")
    assert(spark.sql(
      "SELECT count(*) AS n FROM cm_cat.t WHERE username IS NOT NULL")
      .collect().head.getLong(0) == 3L)
    // aggregate over the renamed snapshot (exercise the replaced scan)
    assert(spark.sql("SELECT sum(v) AS s FROM cm_cat.t")
      .collect().head.getDouble(0) == 6.0)
    spark.sql("ALTER TABLE cm_cat.t DROP COLUMN username")
    assert(spark.table("cm_cat.t").columns.toSeq == Seq("id", "v"))
    // and DML still works on the mapped table
    spark.sql("DELETE FROM cm_cat.t WHERE id = 2")
    assert(spark.sql("SELECT count(*) AS n FROM cm_cat.t")
      .collect().head.getLong(0) == 2L)
  }

  test("widenColumn is metadata-only: old int files read as long, writes conform") {
    val t = freshTable()
    t.append(Seq((1, "a", 1.0f), (2, "b", 2.0f)).toDF("id", "name", "v"))
    val filesBefore = t.activeFiles(1L).toSet
    t.widenColumn("id", LongType)
    t.widenColumn("v", DoubleType)
    assert(t.activeFiles(t.latestVersion.get).toSet == filesBefore,
      "widen_column must not rewrite data")
    val snap = t.snapshot()
    assert(snap.schema("id").dataType == LongType)
    assert(snap.schema("v").dataType == DoubleType)
    assert(snap.orderBy($"id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    // pre-widen version time-travels with ITS types
    assert(t.snapshot(Some(1L)).schema("id").dataType == IntegerType)
    // appends land the WIDE type; a narrow frame up-casts on conform
    t.append(Seq((3, "c", 3.0f)).toDF("id", "name", "v"))
    assert(t.snapshot().count() == 3L)
    assert(t.snapshot().filter($"id" === 3L).count() == 1L)
    // narrowings and cross-family changes refuse
    intercept[IllegalArgumentException](t.widenColumn("id", IntegerType))
    intercept[IllegalArgumentException](t.widenColumn("name", LongType))
    // SQL surface
    val wh = graft.TempDirs.create("graft_widen_cat")
    spark.conf.set("spark.sql.catalog.wd_cat", "graft.acid.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wd_cat.root", wh)
    spark.sql("CREATE TABLE wd_cat.t (id INT, v FLOAT) USING graft")
    spark.sql("INSERT INTO wd_cat.t VALUES (7, 7.5)")
    spark.sql("ALTER TABLE wd_cat.t ALTER COLUMN id TYPE BIGINT")
    assert(spark.table("wd_cat.t").schema("id").dataType == LongType)
    assert(spark.sql("SELECT id FROM wd_cat.t").collect().head.getLong(0) == 7L)
  }

  test("DECIMAL widening matrix: precision growth and int->decimal are metadata-only") {
    import org.apache.spark.sql.types.DecimalType
    val t = new GraftTable(spark, graft.TempDirs.create("graft_widen_dec"))
    val money = Seq((1, BigDecimal("12.34")), (2, BigDecimal("99999999.99")))
      .toDF("id", "amount")
      .select($"id", $"amount".cast(DecimalType(10, 2)).as("amount"))
    t.append(money)
    val filesBefore = t.activeFiles(1L).toSet
    // decimal(10,2) -> decimal(14,2): precision growth, same scale
    t.widenColumn("amount", DecimalType(14, 2))
    // int -> decimal(12,2): integer room (12-2=10) holds any int
    t.widenColumn("id", DecimalType(12, 2))
    assert(t.activeFiles(t.latestVersion.get).toSet == filesBefore,
      "decimal widening must not rewrite data")
    val snap = t.snapshot()
    assert(snap.schema("amount").dataType == DecimalType(14, 2))
    assert(snap.schema("id").dataType == DecimalType(12, 2))
    // the OLD narrow files read back exact under the wide schema
    val got = snap.orderBy($"id")
      .select($"id".cast("string"), $"amount".cast("string"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("1.00", "12.34"), ("2.00", "99999999.99")), got.toString)
    // a wide append joins the narrow files; values needing the new
    // precision land (they would overflow the old decimal(10,2))
    t.append(Seq((3, BigDecimal("123456789012.99"))).toDF("id", "amount")
      .select($"id".cast(DecimalType(12, 2)).as("id"),
        $"amount".cast(DecimalType(14, 2)).as("amount")))
    assert(t.snapshot().filter($"amount" > BigDecimal("1e11")).count() == 1L)
    // pre-widen version time-travels with ITS types
    assert(t.snapshot(Some(1L)).schema("amount").dataType == DecimalType(10, 2))
    // refusals: precision shrink, scale change, insufficient int room
    intercept[IllegalArgumentException](
      t.widenColumn("amount", DecimalType(12, 2)))
    intercept[IllegalArgumentException](
      t.widenColumn("amount", DecimalType(20, 4)))
    val t2 = new GraftTable(spark, graft.TempDirs.create("graft_widen_dec2"))
    t2.append(Seq((1L, "a")).toDF("id", "s"))
    intercept[IllegalArgumentException](
      t2.widenColumn("id", DecimalType(18, 2))) // 18-2 < 20 long digits
    // physical-config columns refuse the decimal family (bloom/window
    // codings would diverge); integral widenings still allowed
    val t3 = new GraftTable(spark, graft.TempDirs.create("graft_widen_dec3"),
      bloomCol = Some("id"))
    t3.append(Seq((1, "a")).toDF("id", "s"))
    intercept[IllegalArgumentException](
      t3.widenColumn("id", DecimalType(12, 0)))
    t3.widenColumn("id", LongType)
    assert(t3.snapshot().schema("id").dataType == LongType)
    // SQL surface: ALTER COLUMN TYPE DECIMAL through the catalog
    val wh = graft.TempDirs.create("graft_widen_dec_cat")
    spark.conf.set("spark.sql.catalog.wdd_cat", "graft.acid.GraftCatalog")
    spark.conf.set("spark.sql.catalog.wdd_cat.root", wh)
    spark.sql("CREATE TABLE wdd_cat.t (id INT, amount DECIMAL(10,2)) USING graft")
    spark.sql("INSERT INTO wdd_cat.t VALUES (7, 12345678.90)")
    spark.sql("ALTER TABLE wdd_cat.t ALTER COLUMN amount TYPE DECIMAL(16,2)")
    assert(spark.table("wdd_cat.t").schema("amount").dataType ==
      DecimalType(16, 2))
    assert(spark.sql("SELECT CAST(amount AS STRING) AS a FROM wdd_cat.t")
      .collect().head.getString(0) == "12345678.90")
  }

  test("rename then widen compose: the mapped column reads wide from narrow files") {
    val t = freshTable()
    t.append(Seq((1, "a", 1.0)).toDF("id", "name", "v")) // id INT physical
    t.renameColumn("id", "event_id")                     // mapped, still INT
    t.widenColumn("event_id", LongType)                  // mapped AND widened
    val filesBefore = t.activeFiles(1L).toSet
    assert(t.activeFiles(t.latestVersion.get).toSet == filesBefore)
    val snap = t.snapshot()
    assert(snap.schema("event_id").dataType == LongType)
    assert(snap.select($"event_id").as[Long].collect().toSeq == Seq(1L))
    // appends under the new name+type join the old narrow file
    t.append(Seq((2L, "b", 2.0)).toDF("event_id", "name", "v"))
    assert(t.snapshot().orderBy($"event_id").select($"event_id").as[Long]
      .collect().toSeq == Seq(1L, 2L))
    // and DML through the composed lens still works
    t.delete($"event_id" === 1L)
    assert(t.snapshot().select($"event_id").as[Long].collect().toSeq == Seq(2L))
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
