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
/** Process-wide lock for the temporary shuffle-partitions override in
  * `QueryPack.runToMemory`: the session conf is shared, so concurrent
  * query builds (parallel suites on the singleton session) must not
  * interleave their set/start/restore windows — an interleaved restore
  * would leak the temporary value into the session permanently. */
private[graft] object StreamStartLock

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
    * state rows vs 2.9s at 8 (results are partition-count independent;
    * verified by the gate at cpus=4 and 32). At 100 TB the same knob
    * scales UP: state_bytes / target_store_size, not executor cores. */
  protected def runToMemory(df: DataFrame, mode: String,
                            statePartitions: Int = 8): DataFrame = {
    val s = df.sparkSession
    val qn = "mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val key = "spark.sql.shuffle.partitions"
    // start() clones the session conf, so the override only needs to span
    // set..start — but that window must be exclusive (StreamStartLock):
    // interleaved set/restore from a concurrent build would leak the
    // temporary value into the shared session. Known perf-only caveat: a
    // concurrent BATCH query that happens to plan inside this window picks
    // up the temporary partition count (fewer shuffle tasks, same result);
    // the gate runs queries sequentially, and parallel test suites accept
    // the skew. A per-query conf would need a second SparkSession, which
    // cannot see this session's temp fixtures.
    val q = StreamStartLock.synchronized {
      val saved = s.conf.getOption(key)
      s.conf.set(key, statePartitions)
      try df.writeStream.format("memory").queryName(qn)
        .outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      finally saved match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
    q.awaitTermination()
    // s.table() analyzes eagerly, so the returned plan holds the resolved
    // sink relation; dropping the temp view right away un-registers the
    // name without copying the data (collecting large streaming results
    // to the driver cost 3.5x on the stream-stream join at sf0.1)
    val sink = s.table(qn)
    s.catalog.dropTempView(qn)
    sink
  }
}
