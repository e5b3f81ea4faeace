package graft.acid

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8

/** Format-compatibility safety rails around the commit log:
  *
  *  - bloom sidecar SCHEME versioning: sidecars written before the
  *    integral-widening fix (no `# scheme=long` header) carry
  *    hashInt-derived bits for Int/Short/Byte bloom columns, which
  *    false-negative against the long-hashing probe — they must NEVER
  *    skip unless the column is provably long;
  *  - legacy terminator-less manifests: uncorroborated ones fail loudly
  *    AND fast (the rejection is cached — no 200-attempt spin per read),
  *    with the `allowLegacyManifests` opt-in spelled out.
  */
class FormatSafetySpec extends SparkSpec {
  import spark.implicits._

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Strip the `# scheme=...` header from every bloom sidecar under
    * `root`, simulating a table written by the pre-widening build. */
  private def stripBloomSchemes(root: String): Unit = {
    val f = fs(root)
    f.listStatus(new Path(root, "_log")).filter(_.getPath.getName.endsWith(".blooms"))
      .foreach { st =>
        val in = f.open(st.getPath)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        val out = f.create(st.getPath, true)
        try out.write(lines.filterNot(_.startsWith("# scheme"))
          .mkString("\n").getBytes(UTF_8))
        finally out.close()
      }
  }

  test("pre-widening hashed blooms over an INT column never skip; tagged ones prune") {
    val root = graft.TempDirs.create("graft_bloomscheme_int")
    val t = new GraftTable(spark, root, bloomCol = Some("id"))
    (0 until 3).foreach { s =>
      t.append((0 until 900).collect {
        case i if i % 3 == s => (i, s"v$i") // id is INT — the widening case
      }.toDF("id", "name"))
    }
    val all = t.activeFiles(t.latestVersion.get).size
    // fresh sidecars carry `# scheme=long`: the probe prunes
    assert(t.filesForPoint(300L).size < all, "scheme-tagged bloom should prune")
    // simulate a pre-fix table: same bits, header stripped
    stripBloomSchemes(root)
    val t2 = new GraftTable(spark, root, bloomCol = Some("id"))
    assert(t2.filesForPoint(300L).size == all,
      "an unversioned hashed bloom over a non-long column must never skip")
    // reads stay exact either way
    assert(t2.snapshotPoint(300L).count() == 1L)
  }

  test("unversioned hashed blooms still prune when the column is DECLARED long") {
    val root = graft.TempDirs.create("graft_bloomscheme_long")
    val t = new GraftTable(spark, root, bloomCol = Some("id"))
    (0 until 3).foreach { s =>
      // mergeSchema declares the schema — the probe can then PROVE the
      // bloom column long, where pre- and post-widening builds agree
      t.append((0 until 900).collect {
        case i if i % 3 == s => (i.toLong, s"v$i")
      }.toDF("id", "name"), mergeSchema = true)
    }
    stripBloomSchemes(root)
    val t2 = new GraftTable(spark, root, bloomCol = Some("id"))
    assert(t2.tableSchema.isDefined)
    val all = t2.activeFiles(t2.latestVersion.get).size
    assert(t2.filesForPoint(300L).size < all,
      "a declared-long column's unversioned bloom is probe-compatible")
    assert(t2.snapshotPoint(300L).count() == 1L)
  }

  test("a clone drops pre-widening blooms instead of re-tagging them") {
    val root = graft.TempDirs.create("graft_bloomscheme_clone_src")
    val t = new GraftTable(spark, root, bloomCol = Some("id"))
    t.append((0 until 300).map(i => (i, s"v$i")).toDF("id", "name"))
    stripBloomSchemes(root)
    val src = new GraftTable(spark, root, bloomCol = Some("id"))
    val dest = src.cloneTo(graft.TempDirs.create("graft_bloomscheme_clone_dst"))
    // the clone must not claim scheme=long bits it cannot prove: its
    // entries carry NO bloom (never skip) rather than a mis-tagged one
    val all = dest.activeFiles(dest.latestVersion.get).size
    assert(dest.filesForPoint(5L).size == all)
    assert(dest.snapshotPoint(5L).count() == 1L)
  }

  private def manifestText(root: String, v: Long): String = {
    val f = fs(root)
    val in = f.open(new Path(s"$root/_log/v${"%020d".format(v)}.manifest"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("commits stamp require= for the gated features their entries use") {
    val root = graft.TempDirs.create("graft_featstamp")
    val t = new GraftTable(spark, root, bloomCol = Some("id"))
    t.append((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val h1 = manifestText(root, 1L).linesIterator.next()
    assert(h1.contains("require=") && h1.contains("bf"),
      s"bloom-sidecar commit must gate bf: $h1")
    t.delete(col("id") === 5L) // DV commit re-states the masked entry
    val h2 = manifestText(root, 2L).linesIterator.next()
    assert(h2.contains("dv"), s"DV commit must gate dv: $h2")
    // this build supports all its own features: reads stay green
    assert(t.snapshot().count() == 49L)
  }

  test("a manifest requiring an unknown feature is refused loudly") {
    val root = graft.TempDirs.create("graft_featgate")
    val t = new GraftTable(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    // hand-write v2 as a complete delta manifest requiring a feature
    // this build does not know — tags carry semantics, so an unknowing
    // reader must REFUSE, never silently drop the tag
    val f = fs(root)
    val mp = new Path(s"$root/_log/v${"%020d".format(2)}.manifest")
    val out = f.create(mp, false)
    try out.write(
      ("# op=append ts=0 kind=delta nf=2 require=future_x\n" +
        "+\tdata/cfake/part-00000.parquet\tfx=1\tn=1\n# ok").getBytes(UTF_8))
    finally out.close()
    val t2 = new GraftTable(spark, root)
    val e = intercept[IllegalStateException](t2.snapshot().count())
    assert(e.getMessage.contains("future_x") &&
      e.getMessage.contains("upgrade"), e.getMessage)
    // versions below the gated one still time-travel
    assert(t2.snapshot(Some(1L)).count() == 1L)
  }

  test("50 scattered DV deletes leave at most 2 live dv sidecars") {
    val root = graft.TempDirs.create("graft_dvcoalesce")
    val t = new GraftTable(spark, root, statsCol = Some("id"))
    // many small files so the deletes scatter across entries
    t.append((0L until 500L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(10))
    (1L to 50L).foreach(i => t.delete(col("id") === i * 7L))
    val lv = t.latestVersion.get
    val refs = t.entries(lv).flatMap(_.dvRef).distinct
    assert(refs.size <= GraftTable.MaxDvSidecars,
      s"live dv sidecars: $refs")
    // masks stay exact through every coalesce
    assert(t.snapshot().count() == 450L)
    assert(t.snapshot().agg(sum("id")).head().getLong(0) ==
      (0L until 500L).sum - (1L to 50L).map(_ * 7L).sum)
    // a fresh handle resolves the coalesced masks from disk alone
    assert(GraftTable.load(spark, root).snapshot().count() == 450L)
  }

  test("uncorroborated legacy manifest fails loudly, fast on re-read, and honors the opt-in") {
    val root = graft.TempDirs.create("graft_legacy_fastfail")
    val t = new GraftTable(spark, root)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    // rewrite v1's manifest as a LEGACY shape: `# op=` header, no kind=,
    // no terminator, no later manifest to corroborate it
    val f = fs(root)
    val mp = new Path(s"$root/_log/v${"%020d".format(1)}.manifest")
    val in = f.open(mp)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val body = lines.filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(l => if (l.startsWith("+\t")) l.drop(2) else l)
    val out = f.create(mp, true)
    try out.write((s"# op=append" +: body).mkString("\n").getBytes(UTF_8))
    finally out.close()

    spark.conf.unset("spark.graft.acid.allowLegacyManifests")
    val t2 = new GraftTable(spark, root)
    val e1 = intercept[IllegalStateException](t2.snapshot().count())
    assert(e1.getMessage.contains("allowLegacyManifests"))
    // the rejection is cached: the second read fails in microseconds,
    // not another 20-attempt stability spin
    val start = System.nanoTime()
    intercept[IllegalStateException](t2.snapshot().count())
    assert((System.nanoTime() - start) < 80L * 1000 * 1000,
      "re-read of a rejected legacy manifest must fail fast, not re-spin")
    // the documented opt-in unblocks the same handle
    spark.conf.set("spark.graft.acid.allowLegacyManifests", "true")
    try assert(t2.snapshot().count() == 1L)
    finally spark.conf.unset("spark.graft.acid.allowLegacyManifests")
  }

  test("incremental re-clone syncs only the delta; foreign destinations refuse") {
    val src = new GraftTable(spark, graft.TempDirs.create("graft_reclone_src"))
    src.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    src.delete($"id" === 5L) // DV on file 1
    val destRoot = graft.TempDirs.create("graft_reclone_dst")
    src.cloneTo(destRoot)
    val c1 = GraftTable.load(spark, destRoot)
    assert(c1.snapshot().count() == 99L)
    val firstLines = c1.entries(c1.latestVersion.get).map(_.line).toSet
    // source moves on: one appended file + one new DV in it
    src.append((101L to 200L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    src.delete($"id" === 150L)
    // RE-CLONE onto the existing destination = incremental sync
    src.cloneTo(destRoot)
    val c2 = GraftTable.load(spark, destRoot)
    assert(c2.versions == Seq(1L, 2L), "the sync is one new dest commit")
    assert(c2.snapshot().count() == 198L)
    assert(c2.snapshot().filter($"id".isin(5L, 150L)).isEmpty)
    val after = c2.entries(2L)
    // the already-synced file carried VERBATIM — same dest line, same
    // dest-v1 sidecar refs, zero per-file work
    val carried = after.map(_.line).toSet intersect firstLines
    assert(carried.nonEmpty, "unchanged files must carry over verbatim")
    // only the DELTA re-keyed: exactly the appended file references the
    // sync commit's sidecar
    assert(after.count(_.dvRef.contains(2L)) == 1,
      s"O(delta) sync: only the new file re-keys, got ${after.map(_.dvRef)}")
    assert(after.count(_.dvRef.contains(1L)) == 1,
      "the carried file keeps its original clone sidecar")
    // a destination that is NOT a clone of this source refuses loudly
    val foreign = new GraftTable(spark, graft.TempDirs.create("graft_reclone_x"))
    foreign.append(Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](src.cloneTo(foreign.root))
    assert(e.getMessage.contains("not a clone of"), e.getMessage)
  }
}
