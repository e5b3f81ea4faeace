package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension installer: makes every graft native function
  * available to pure-SQL users via standard Spark plugin config —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or programmatically `SparkSession.builder.withExtensions(new
  * GraftExtensions)`. This is the packaging surface a library consumer
  * (spark-sql shell, Thrift server, notebook) actually uses; the
  * per-query `register(...)` calls remain for sessions created without
  * the extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // ExpressionInfo's 3-arg constructor is (className, db, functionName) —
  // passing usage as the 3rd arg garbles DESCRIBE FUNCTION output (the
  // usage string showed up as the function name). The extended constructor
  // enforces doc-format rules on usage text, so the class carries the doc
  // and the identifier stays correct.
  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(s"graft.functions ($usage)", null, name),
      builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("web_mercator",
      "web_mercator(lon, lat) - WGS84 -> EPSG:3857 struct<x,y>") { exprs =>
      functions.WebMercator(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head,
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
          org.apache.spark.sql.types.DoubleType))
    })
    e.injectFunction(fn("kgram_hashes",
      "kgram_hashes(str, k) - rolling polynomial hash per k-gram") { exprs =>
      functions.KGramHashes(exprs.head,
        functions.FunctionBuilders.constInt(exprs(1), "kgram_hashes", "k"))
    })
    e.injectFunction(fn("dot_product",
      "dot_product(array<double>, array<double>) - sequential-fold dot") { exprs =>
      functions.DotProduct(exprs.head, exprs(1))
    })
    e.injectFunction(fn("sorted_jaccard",
      "sorted_jaccard(array<bigint>, array<bigint>) - merge-walk jaccard") { exprs =>
      functions.SortedJaccard(exprs.head, exprs(1))
    })
    e.injectFunction(fn("simhash64",
      "simhash64(array<bigint>) - 64-bit simhash of token hashes") { exprs =>
      functions.SimHash64(exprs.head)
    })
    e.injectFunction(fn("minhash_signature",
      "minhash_signature(array<bigint>, k) - k-permutation minhash") { exprs =>
      functions.MinHashSignature(exprs.head,
        functions.FunctionBuilders.constInt(exprs(1), "minhash_signature", "k"))
    })
    e.injectFunction(fn("zorder64",
      "zorder64(a, b) - 2-D Morton interleave of the low 32 bits") { exprs =>
      functions.ZOrder64(exprs.head, exprs(1))
    })
    e.injectFunction(fn("shingle_hashes",
      "shingle_hashes(str, n) - sorted distinct xxhash64 of n-word shingles") { exprs =>
      functions.ShingleHashes(exprs.head,
        functions.FunctionBuilders.constInt(exprs(1), "shingle_hashes", "n"))
    })
    e.injectFunction(fn("word_hashes",
      "word_hashes(str) - polynomial hash per word, in order") { exprs =>
      functions.WordHashes(exprs.head)
    })
    e.injectFunction(fn("explode_track",
      "explode_track(array<struct>) - flatten a track to rows") { exprs =>
      functions.ExplodeTrack(exprs.head)
    })
    // whole-operator plan node: plans graft.plans.TopKPerKeyNode into
    // the bounded-heap TopKPerKeyExec (the DataFrame API also installs
    // this per-session via experimental.extraStrategies for sessions
    // created without the extension)
    e.injectPlannerStrategy(_ => plans.TopKPerKeyStrategy)
    // optimizer rule: rewrites the row_number()-filter top-k idiom into
    // the bounded-heap operator above (see RowNumberTopKRewrite guards)
    e.injectOptimizerRule(_ => plans.RowNumberTopKRewrite)
    // SQL UPDATE / MERGE INTO on graft-catalog ACID tables (the catalog
    // also self-installs these on initialize for extension-less sessions)
    e.injectOptimizerRule(_ => acid.GraftSqlRowOps)
    e.injectPlannerStrategy(_ => acid.GraftRowCommandStrategy)
    // deletion-vector application for DSv2 scans of graft-catalog tables.
    // The rewrite matches DataSourceV2ScanRelation, which only exists
    // AFTER V2 pushdown — every injectable logical-optimizer batch
    // (operator optimization, pre-CBO) runs before it, so the rule must
    // live in experimental.extraOptimizations (the "User Provided
    // Optimizers" batch at the END of the optimizer). Extensions have no
    // session at registration time, but an injected rule BUILDER does:
    // install there, once per session, and return the rule itself as a
    // harmless no-op for the early batch (pre-pushdown plans carry no
    // GraftDvScan marker, so it never matches there). GraftCatalog
    // .initialize installs the same rule for extension-less sessions;
    // both installs are idempotent.
    e.injectOptimizerRule { session =>
      acid.GraftDvScanRewrite.install(session)
      acid.GraftDvScanRewrite
    }
    // txn-pinned table-valued reads: SELECT ... FROM
    // snapshot_at_txn('cat.ns.t', '<txn marker>') — the read-side SQL
    // face of COMMIT ATOMIC (each participant pinned at its committed
    // version; two calls over one marker can never observe a split txn)
    e.injectTableFunction((new FunctionIdentifier("snapshot_at_txn"),
      new ExpressionInfo(
        "graft.acid (snapshot_at_txn(tableRef, txnMarker) - participant " +
          "table pinned at its version in the multi-table txn)",
        null, "snapshot_at_txn"),
      acid.GraftTxnSql.snapshotAtTxnPlan _))
    // CDC reads as composable relations (the Delta table_changes TVF):
    // the range net diff, and the per-commit attributed form
    e.injectTableFunction((new FunctionIdentifier("table_changes"),
      new ExpressionInfo(
        "graft.acid (table_changes(tableRef, fromV, toV) - net row-level " +
          "diff of (fromV, toV], tagged _change)",
        null, "table_changes"),
      acid.GraftTxnSql.tableChangesPlan _))
    e.injectTableFunction((new FunctionIdentifier("table_changes_by_version"),
      new ExpressionInfo(
        "graft.acid (table_changes_by_version(tableRef, fromV, toV) - " +
          "per-commit attributed diff with _commit_version/_commit_timestamp)",
        null, "table_changes_by_version"),
      acid.GraftTxnSql.tableChangesByVersionPlan _))
    // lakehouse maintenance SQL over graft-catalog tables:
    // OPTIMIZE [TARGET n FILES] [ZORDER BY (a, b)] / VACUUM [RETAIN n
    // VERSIONS] / RESTORE ... TO VERSION AS OF v / DESCRIBE HISTORY
    e.injectParser((_, delegate) => new acid.GraftSqlParser(delegate))
  }
}
