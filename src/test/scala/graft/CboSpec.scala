package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LeafNode, LogicalPlan}

/** Cost-based optimization evidence: with catalog statistics (ANALYZE
  * TABLE) and CBO on, Catalyst reorders a badly-written join so the
  * selective dimension is joined BEFORE the big fact-fact join — the
  * difference between shuffling the whole fact table and shuffling a
  * sliver at cluster scale. This is the stats-feeding workflow a 100 TB
  * deployment runs at ingest (ANALYZE after load). */
class CboSpec extends SparkSpec {

  private def leaves(p: LogicalPlan): Seq[String] =
    p.collect { case l: LeafNode => l.toString }

  test("join reorder pulls the filtered small dimension under the fact join") {
    val s = spark
    import s.implicits._
    val sf = "/root/testdata/sf0.001"
    s.sql("DROP TABLE IF EXISTS cbo_lineitem")
    s.sql("DROP TABLE IF EXISTS cbo_orders")
    s.sql("DROP TABLE IF EXISTS cbo_customer")
    Tables.lineitem(s, sf).select($"l_orderkey", $"l_extendedprice")
      .write.saveAsTable("cbo_lineitem")
    Tables.orders(s, sf).select($"o_orderkey", $"o_custkey")
      .write.saveAsTable("cbo_orders")
    Tables.customer(s, sf).select($"c_custkey", $"c_mktsegment")
      .write.saveAsTable("cbo_customer")
    for (t <- Seq("cbo_lineitem", "cbo_orders", "cbo_customer"))
      s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")

    withSQLConf("spark.sql.cbo.enabled" -> "true",
                "spark.sql.cbo.joinReorder.enabled" -> "true") {
      // written order: (lineitem JOIN orders) JOIN filtered-customer —
      // the worst order: full fact-fact join first
      val df = s.sql(
        """SELECT count(*) FROM cbo_lineitem
          |JOIN cbo_orders   ON l_orderkey = o_orderkey
          |JOIN cbo_customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
      val innermost = df.queryExecution.optimizedPlan.collect {
        case j: Join if j.children.forall(c =>
          c.collect { case jj: Join => jj }.isEmpty) => j
      }
      assert(innermost.nonEmpty)
      val innerLeaves = innermost.flatMap(leaves).mkString("\n")
      // reordered: the first join must involve the filtered customer dim,
      // not lineitem-orders (the syntactic order)
      assert(innerLeaves.contains("cbo_customer"),
        s"CBO did not reorder; innermost join leaves:\n$innerLeaves")
    }
  }

  private def withSQLConf(confs: (String, String)*)(f: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
