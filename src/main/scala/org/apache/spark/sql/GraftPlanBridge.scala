package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door graft's custom plan nodes need: turn a
  * LogicalPlan into a DataFrame on the session. Kept to a single method
  * in Spark's namespace — everything else in graft uses public APIs.
  * (The standard packaging shim for Spark extension libraries; Spark 4
  * moved the implementation class to o.a.s.sql.classic.) */
object GraftPlanBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** Column -> Catalyst Expression (Spark 4 moved Column.expr behind the
    * ColumnNode indirection). Must go through the SESSION's converter:
    * the static ExpressionUtils path leaves an Unevaluable
    * ColumnNodeExpression wrapper the analyzer never unwraps inside
    * custom plan nodes. */
  def expr(session: SparkSession, c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    session.asInstanceOf[classic.SparkSession].expression(c)

  /** Catalyst Expression -> Column (the reverse door): wraps a resolved
    * or unresolved expression so DataFrame combinators can keep building
    * on it. Used by the SQL row-op rewrites, which re-express analyzed
    * UPDATE/MERGE expressions against a differently-shaped frame. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** ANALYZE a plan WITHOUT constructing a Dataset: for Command nodes
    * (MERGE INTO, UPDATE) Dataset construction executes the command
    * eagerly — a COMMIT ATOMIC participant must only be RESOLVED here,
    * its execution belongs to the transaction's staged publish. */
  def analyze(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    session.asInstanceOf[classic.SparkSession].sessionState
      .executePlan(plan).analyzed

  /** Re-wrap a Sink.addBatch frame as a standalone batch DataFrame: the
    * incoming frame is backed by the streaming micro-batch's incremental
    * execution and cannot be re-planned with arbitrary batch transforms;
    * its already-planned InternalRow RDD can (the pattern every
    * production lakehouse streaming sink uses). */
  def asBatchDataFrame(session: SparkSession, df: DataFrame): DataFrame = {
    val cs = session.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.DataFrame].queryExecution.toRdd, df.schema)
  }

  /** Re-wrap an already-planned BATCH computation as a STREAMING-tagged
    * leaf attributed to `stream` — the V1 `Source.getBatch` door for
    * batches whose plan carries operators Spark's streaming planner
    * rejects on streaming relations (exceptAll, the full-outer
    * classification join of a CDC feed). The batch plan compiles here
    * (driver-side planning only); its InternalRow RDD executes
    * distributed when the micro-batch runs, and the LogicalRDD leaf
    * satisfies the engine's isStreaming assertion while attributing the
    * rows to the source (the same move Spark's own sources make for
    * computed batches). */
  def asStreamingBatch(session: SparkSession, df: DataFrame,
      stream: org.apache.spark.sql.connector.read.streaming.SparkDataStream)
      : DataFrame = {
    val cs = session.asInstanceOf[classic.SparkSession]
    val qe = df.asInstanceOf[classic.Dataset[Row]].queryExecution
    classic.Dataset.ofRows(cs, org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd,
      org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0),
      Nil, isStreaming = true, Some(stream))(cs))
  }

  /** Clone the session: same SparkContext/SharedState, but a COPY of the
    * session state (conf, temp views, registered functions). Lets a
    * streaming query start under a per-query conf override (state-store
    * fan-out) without ever mutating the shared session's conf — the
    * round-4 "runToMemory set/restore window" landmine. */
  def cloneSession(session: SparkSession): SparkSession =
    session.asInstanceOf[classic.SparkSession].cloneSession()
}
