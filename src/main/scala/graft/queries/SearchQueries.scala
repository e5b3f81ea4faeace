package graft.queries

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus search / curation queries a training-data pipeline needs beyond
  * dedup: BM25 ranked retrieval (inverted-index shape), duplicate-cluster
  * canonicalization (connected components over the MinHash near-dup
  * graph), deterministic stratified sampling, exact heavy hitters, and
  * one-pass column profiling.
  *
  * Scale design notes per query are inline; the common theme is that every
  * shuffle key is a narrow derived column (term, doc_id, cluster label) —
  * document text never rides through an exchange.
  */
object SearchQueries extends QueryPack {

  /** Min-label propagation connected components over an undirected edge
    * list (columns `src`, `dst`, both directions present). Returns
    * (id, cluster_id = min reachable id).
    *
    * Each round is one equi-join + partial-aggregated min — all shuffles
    * key on the 8-byte id. Convergence needs diameter(G) rounds; near-dup
    * graphs are overwhelmingly small cliques/short chains, so 2-3 rounds
    * dominate in practice. The loop is driver-side but each check is a
    * single scalar aggregate (the Pregel/GraphX shape); `maxIters` bounds
    * an adversarial path graph, where the right fix is path-doubling
    * (large-star/small-star), not more rounds. localCheckpoint per round
    * truncates the lineage so the plan does not grow with iterations. */
  private[queries] def connectedComponents(edges: DataFrame,
                                           maxIters: Int = 30): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    var labels = edges.select($"src".as("id")).distinct()
      .withColumn("label", $"id")
      .localCheckpoint()
    // Deliberate join strategy (guide §3.1), the pageRank treatment:
    // labels/nbrMin are O(nodes) narrow rows and checkpointed frames
    // carry no stats for the planner — while the node count fits an
    // executor (4M-row cap), broadcast them so neither per-round join
    // shuffles the edge list (the corpus-sized side). The count reads
    // already-materialized checkpoint blocks — one tiny driver scalar.
    val bcastNodes = labels.count() <= 4000000L
    def side(df: DataFrame): DataFrame = if (bcastNodes) broadcast(df) else df
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(side(labels.select($"id".as("dst"), $"label".as("dlabel"))), "dst")
        .groupBy($"src").agg(min($"dlabel").as("nmin"))
      // the convergence flag rides INSIDE the checkpointed row, so the
      // check is a filter over already-materialized blocks — not a second
      // join + shuffle per round (halved q_dedup_clusters at sf0.1)
      val next = labels
        .join(side(nbrMin.select($"src".as("id"), $"nmin")), Seq("id"), "left")
        .select($"id", least($"label", coalesce($"nmin", $"label")).as("label"),
          (coalesce($"nmin", $"label") < $"label").as("changed"))
        .localCheckpoint()
      converged = next.filter($"changed").isEmpty
      labels = next.select($"id", $"label")
      iter += 1
    }
    labels
  }

  /** TF-IDF vector-space scoring shared by q_search_tfidf (rank@5 with
    * the raw cosine) and q_search_rrf (rank@10 as the lexical arm of the
    * hybrid fusion): (q_id, doc_id, cos) for the 50 query docs against
    * the corpus. One tf pass (localCheckpoint: it feeds df stats, the
    * vectorization, and the query block — re-running the explode+groupBy
    * per consumer was ~70% of the query's wall time at sf0.1).
    * FIXED-POINT weights: idf rounds to integer micro-units (1e6), so
    * each weight is one long multiply — exact, engine-identical.
    * CHAMPION-LIST VECTORIZATION: with the scoring vocabulary bounded
    * (this corpus's 31 terms; a df-pruned champion list in production)
    * each doc's sparse weights collapse into a dense vocab-indexed
    * double array and the pair scores run through the codegen dot
    * kernel — the q_ann_cosine_topk scan shape — instead of a 5.8M-row
    * posting fan-out into a decimal hash aggregate. Weights are
    * integer-valued doubles (<= 2^53, exact); the pair dot is the
    * kernel's SEQUENTIAL fold over a fixed term order, so both engines
    * round identically. The posting join remains the unbounded-vocab
    * path (q_search_bm25 keeps that shape). */
  private def tfidfScored(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    // EAGER tf (r18, reversing the r17 lazy experiment for this frame
    // only): tf feeds the dfv/tids/vsz BROADCAST builds AND the main
    // stage — under a lazy checkpoint those run as concurrent jobs that
    // each re-materialize the un-built checkpoint RDD (the driver log's
    // "Block rdd_* already exists" signature; measured cold 15.3 s vs
    // 2.7 s eager, OptLab `search`). Eager serializes: one job builds
    // the blocks, every consumer reads them.
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfv = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = tf.join(broadcast(dfv), "term").crossJoin(broadcast(n))
      .select($"doc_id", $"term",
        ($"tf" * round(log($"n_docs".cast("double") / $"df") * 1e6)
          .cast("long")).as("w6"))
    graft.functions.VectorExprs.register(s)
    import graft.llm.VectorOps.dot
    val tids = dfv.select($"term",
      row_number().over(Window.orderBy($"term")).as("tid"))
    val vsz = tids.agg(max($"tid").as("vsz"))
    // vecs is consumed TWICE — the qvecs broadcast build and the probe
    // side of the pair join — and nothing between them materializes it,
    // so the whole tf->w->vectorize pipeline used to run once per
    // consumer. One eager checkpoint (doc-count rows of vocab-length
    // arrays — corpus-linear, narrow) halves that: steady 1.7 s -> 1.4 s
    // (OptLab `search`, same JVM), results bit-identical.
    val vecs = w.join(broadcast(tids), "term")
      .groupBy($"doc_id")
      .agg(map_from_entries(collect_list(struct($"tid", $"w6"))).as("m"))
      .crossJoin(broadcast(vsz))
      .select($"doc_id",
        transform(sequence(lit(1), $"vsz"),
          i => coalesce(element_at($"m", i), lit(0L)).cast("double")).as("v"))
      .withColumn("n2", dot($"v", $"v"))
      .localCheckpoint()
    val qvecs = vecs.filter($"doc_id" < 50)
      .select($"doc_id".as("q_id"), $"v".as("qv"), $"n2".as("na2"))
    vecs.join(broadcast(qvecs), $"q_id" =!= $"doc_id")
      .select($"q_id", $"doc_id",
        (dot($"qv", $"v") / (sqrt($"na2") * sqrt($"n2"))).as("cos"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- BM25 ranked retrieval (Lucene-variant idf), inverted-index shape ----
    // The index build is the classic one-explode two-stage aggregation:
    // (doc_id, term) tf with map-side combine, then per-term df off the tf
    // table (no second pass over text). The query side (top-3 corpus terms
    // here, a user query in production) is k rows — broadcast onto the
    // postings; corpus text never reaches a shuffle. Scoring joins postings
    // with per-doc lengths on doc_id (narrow rows), top-10 via
    // TakeOrderedAndProject (no global sort). Scores round to 4 decimals on
    // both engines: ln() may differ across libm implementations by ulps
    // (same trick as the q_geo_buffer oracle), and the <=3-term double sum
    // is merge-order-sensitive at the last bit.
    "q_search_bm25" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      // EAGER localCheckpoint (r18): tf feeds the qterms broadcast build
      // AND the scoring stage. The previous cache()/unpersist() pair was
      // a NO-OP at action time (unpersist ran at DataFrame-construction
      // time, before the plan ever executed — r17 verdict), so the
      // explode+groupBy corpus pass ran once per consumer. The eager
      // checkpoint materializes it exactly once; blocks are GC-managed
      // with the frame instead of pinned in the cache registry.
      val tf = docs
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dl = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n"), avg($"dl").as("avgdl"))
      val termStats = tf.groupBy($"term")
        .agg(count(lit(1)).as("df"), sum($"tf").as("cnt"))
      val qterms = termStats
        .orderBy($"cnt".desc, $"term")
        .limit(3)
        .select($"term", $"df")
      val k1 = 1.2
      val b = 0.75
      val scored = tf
        .join(broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log(($"n" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
        .withColumn("tscore",
          $"idf" * ($"tf" * (k1 + 1.0)) /
            ($"tf" + lit(k1) * (lit(1.0) - b + lit(b) * $"dl" / $"avgdl")))
        .groupBy($"doc_id")
        .agg(round(sum($"tscore"), 4).as("score"),
          asLong(count(lit(1))).as("n_terms"))
      scored.orderBy($"score".desc, $"doc_id").limit(10)
    },

    // ---- TF-IDF retrieval: sparse-vector cosine via posting join ----
    // The vector-space twin of BM25: docs as tf·idf term vectors, query
    // docs ranked against the corpus by cosine. Same inverted-index
    // shape — ONE tf pass (text leaves the scan as (doc_id, term, tf)),
    // dot products from a posting equi-join on term (query side 50 docs,
    // broadcastable), norms from a per-doc aggregate — so the corpus
    // never self-shuffles on anything wider than a term. At web scale
    // hot terms get df-pruned / champion-listed before the join; this
    // corpus's synthetic 31-term vocabulary makes a df cap degenerate
    // (every term is in >50% of docs), so the fan-out bound here is
    // vocab-sized and pruning stays off. Determinism: idf rounds to
    // integer micro-units (fixed-point long), products are exact long
    // multiplies summed in DECIMAL (merge-order-insensitive); the final
    // cosine is IEEE-deterministic from exact inputs — compared RAW,
    // no output rounding.
    "q_search_tfidf" -> { (s, d) =>
      import s.implicits._
      tfidfScored(s, d)
        .withColumn("rk", row_number().over(
          Window.partitionBy($"q_id").orderBy($"cos".desc, $"doc_id")))
        .filter($"rk" <= 5)
        .select($"q_id", asLong($"rk").as("rk"), $"doc_id", $"cos")
        .orderBy($"q_id", $"rk")
    },

    // ---- hybrid retrieval: reciprocal-rank fusion of lexical + semantic ----
    // The production hybrid-search shape: a lexical ranking (TF-IDF
    // cosine over the inverted index) and a semantic ranking (embedding
    // cosine over the vector index) fused per query by RRF
    // (Cormack et al. 2009): score = sum over systems of 1/(60 + rank).
    // Each system contributes only its top-10, so the fusion join runs
    // over O(queries x k) rows — the corpus-scale work lives entirely
    // inside the two component retrievers, and the fusion itself is a
    // full-outer join on (query, doc) + one rank window, independent of
    // corpus size. Determinism: each 1/(60+rank) is rounded to integer
    // micro-units (ppm) — BIGINT sums, no float accumulation; 1e6/(60+r)
    // never lands on a .5 rounding boundary for r in 1..10 (2e6 has no
    // divisor in [61, 70] with an odd quotient), so both engines round
    // identically.
    "q_search_rrf" -> { (s, d) =>
      import s.implicits._
      val lex = tfidfScored(s, d)
        .withColumn("rk", row_number().over(
          Window.partitionBy($"q_id").orderBy($"cos".desc, $"doc_id")))
        .filter($"rk" <= 10)
        .select($"q_id", $"doc_id", $"rk".as("rk_lex"))
      val sem = LlmVectorQueries.cosineRanked(s, d, 10)
        .select($"q_id", $"b_id".as("doc_id"), $"rk".as("rk_sem"))
      lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
        .select($"q_id", $"doc_id",
          (coalesce(round(lit(1000000.0) / (lit(60) + $"rk_lex")).cast("long"), lit(0L))
            + coalesce(round(lit(1000000.0) / (lit(60) + $"rk_sem")).cast("long"), lit(0L)))
            .as("rrf_ppm"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"q_id").orderBy($"rrf_ppm".desc, $"doc_id")))
        .filter($"rk" <= 10)
        .select($"q_id", asLong($"rk").as("rk"), $"doc_id", $"rrf_ppm")
        .orderBy($"q_id", $"rk")
    },

    // ---- duplicate-cluster canonicalization (connected components) ----
    // The step after pair discovery in every dedup pipeline: group
    // transitive near-dup pairs (a~b, b~c => {a,b,c}) and elect the
    // canonical member (min doc_id). Pairs come from the MinHash+LSH path
    // (already equi-join shaped); components via min-label propagation —
    // see connectedComponents above for the 100 TB analysis. Output one
    // row per clustered doc with its cluster id, the canonical flag, and
    // the cluster size.
    "q_dedup_clusters" -> { (s, d) =>
      import s.implicits._
      val pairs = LlmTextQueries.minhashNearDups(s, d).select($"a_id", $"b_id")
      val edges = pairs.select($"a_id".as("src"), $"b_id".as("dst"))
        .union(pairs.select($"b_id".as("src"), $"a_id".as("dst")))
        .localCheckpoint(eager = false) // edges drive every iteration; one materialization at the first round's action
      val labels = connectedComponents(edges)
        .select($"id".as("doc_id"), $"label".as("cluster_id"))
      val sizes = labels.groupBy($"cluster_id")
        .agg(asLong(count(lit(1))).as("cluster_size"))
      labels.join(sizes, "cluster_id")
        .select($"doc_id", $"cluster_id",
          ($"doc_id" === $"cluster_id").as("is_canonical"), $"cluster_size")
        .orderBy($"doc_id")
    },

    // ---- deterministic stratified sampling (per-language rates) ----
    // Data-mixing downsampling: each stratum keeps a different fraction,
    // membership a pure Knuth-hash function of doc_id — stable across
    // runs, engines, and corpus growth, and a narrow map (no shuffle of
    // text; the final sort is the driver-compare convention, not part of
    // the operator). The id reduces mod 2^31 before the multiply so the
    // hash stays total for any 64-bit id under ANSI overflow checking.
    "q_sample_stratified" -> { (s, d) =>
      import s.implicits._
      val permille = typedLit(Map(
        "en" -> 100L, "de" -> 400L, "es" -> 400L, "fr" -> 400L, "zh" -> 400L))
      val h = Hashing.knuth($"doc_id") % 1000
      Tables.documents(s, d)
        .withColumn("keep_below", coalesce(permille($"lang"), lit(200L)))
        .filter(h < $"keep_below")
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    },

    // ---- exact heavy hitters: top-20 corpus tokens ----
    // Two-stage aggregation: map-side partial counts mean the shuffle
    // carries |vocab| rows per task, not the corpus; top-20 via
    // TakeOrderedAndProject. The approximate alternative at 100 TB is a
    // count-min sketch per partition merged on the driver, but exact
    // two-stage is already a single narrow shuffle — sketches only win
    // when |vocab| itself explodes (e.g. n-gram vocabularies).
    "q_text_heavy_hitters" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("term"))
        .groupBy($"term").agg(asLong(count(lit(1))).as("cnt"))
        .orderBy($"cnt".desc, $"term")
        .limit(20)
    },

    // ---- one-pass column profiling over orders ----
    // The ingest-time "summarize" operator: null counts, exact distinct
    // counts, and formatted min/max for every column in ONE scan — the
    // multi-distinct aggregate plans as a single pass with an Expand (x6
    // narrow rows), which at 100 TB beats six separate scans by the full
    // scan cost. Min/max format through engine-stable renderings (decimal
    // casts, explicit date format) so the compare is exact.
    // ---- equi-width histogram + cumulative distribution ----
    // The profiling companion to min/max/distinct: 20 equi-width bins
    // over o_totalprice with counts and a running cumulative count. Two
    // scans (a 1-row min/max aggregate broadcast into the binning pass),
    // then a 20-key groupBy with map-side partials — the shuffle carries
    // bins, not rows, at any corpus size. Bin edges and assignment are
    // ---- corpus token entropy (dataset-quality diagnostic) ----
    // Shannon entropy of the corpus token distribution in nats — the
    // "is this corpus degenerate/templated?" number curation dashboards
    // track. One explode -> two-stage vocab aggregation (the shuffle
    // carries vocab rows, never the token stream), per-term ln rounded
    // to 6 dp into DECIMAL so the weighted sum is exact and
    // merge-order-insensitive, with a ~1e4x-wider safety margin against
    // cross-libm ulp boundary hits than a 10-dp grid (the hardened
    // q_text_surprisal recipe applied corpus-wide).
    "q_text_entropy" -> { (s, d) =>
      import s.implicits._
      // EAGER checkpoint (r18): tok (vocab-sized) feeds the tot
      // broadcast build AND the final aggregate — one corpus tokenize
      // pass instead of two (the q_text_pmi/tfidf pattern).
      val tok = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val tot = tok.agg(sum($"cnt").as("n_total"))
      tok.crossJoin(broadcast(tot))
        .agg(
          asLong(count(lit(1))).as("vocab_size"),
          asLong(sum($"cnt")).as("n_tokens"),
          sum((round(log($"n_total") - log($"cnt"), 6).cast("decimal(28,12)")
            * $"cnt")).as("h"))
        .select($"vocab_size", $"n_tokens",
          round($"h".cast("double") / $"n_tokens".cast("double"), 4)
            .as("entropy_nats"))
    },

    // ---- join-key skew profile (the pre-flight check for shuffle ops) ----
    // Per-key count distribution of a join key: max/p99/mean and the
    // max-to-mean skew ratio — the number that decides between a plain
    // shuffle join, salting (q_join_salted), or AQE skew split before a
    // 100 TB join is launched. Two-stage aggregation; the second pass
    // runs over one row per key.
    "q_profile_skew" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
        .agg(
          asLong(count(lit(1))).as("n_keys"),
          asLong(max($"cnt")).as("max_per_key"),
          round(avg($"cnt"), 4).as("avg_per_key"),
          round(expr("percentile(cnt, 0.99)"), 4).as("p99_per_key"),
          round(max($"cnt") / avg($"cnt"), 4).as("skew_ratio"))
    },

    // engine-exact by construction: prices become integer cents up
    // front (round(x*100) — o_totalprice is dollars-and-cents in a
    // double), the bin index is pure BIGINT arithmetic (`div` here,
    // `//` in the DuckDB oracle; identical truncation for the
    // non-negative operands), and the bin bounds are emitted as plain
    // BIGINT cents — no DECIMAL or IEEE double ever reaches an output
    // column, so the hash compare has no numeric-rendering surface at
    // all (DECIMAL output hash-diverged in the r4/r5 gates despite
    // value-exact rows). The top edge clamps into the last bin (the
    // max value lands on bin 20 by the formula).
    "q_profile_histogram" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
        .select(round($"o_totalprice" * 100).cast("long").as("pc"))
      val nb = 20
      val stats = o.agg(min($"pc").as("mn"), max($"pc").as("mx"))
        .select($"mn", greatest($"mx" - $"mn", lit(1L)).as("rng"))
      o.crossJoin(broadcast(stats))
        .select(least(expr(s"(pc - mn) * $nb div rng"), lit(nb - 1L)).as("bin"),
          $"mn", $"rng")
        .groupBy($"bin", $"mn", $"rng")
        .agg(asLong(count(lit(1))).as("n"))
        // bound in cent-twentieths = mn*20 + bin*rng; floor to whole cents
        .select($"bin",
          expr(s"(mn * $nb + bin * rng) div $nb").as("bin_lo_cents"),
          expr(s"(mn * $nb + (bin + 1) * rng) div $nb").as("bin_hi_cents"),
          $"n")
        .withColumn("cum_n", sum($"n").over(
          Window.orderBy($"bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy($"bin")
    },

    "q_profile_columns" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.Column
      val o = Tables.orders(s, d)
      // per-column formatting chosen for engine-stable string rendering:
      // longs/varchars cast directly, doubles through DECIMAL(18,2)
      // (double->string scientific-notation thresholds differ between
      // engines), timestamps through an explicit second-precision format
      val cols: Seq[(String, Column => Column)] = Seq(
        "o_custkey" -> (_.cast("string")),
        "o_orderdate" -> (date_format(_, "yyyy-MM-dd HH:mm:ss")),
        "o_orderkey" -> (_.cast("string")),
        "o_orderpriority" -> identity,
        "o_orderstatus" -> identity,
        "o_totalprice" -> (_.cast("decimal(18,2)").cast("string")))
      // TWO single-row aggregates, crossJoined: putting the string/ts
      // min/max (var-length agg buffers -> SortAggregate) in the same
      // aggregate as the multi-distinct Expand forces a full sort of the
      // 6x-expanded corpus on 7 keys. Split, the distinct path keeps
      // HashAggregate (its dedup stage has no var-length buffers) and the
      // min/max path is a grouping-key-free SortAggregate (no sort at
      // all) — each one scan with map-side partials.
      val minMaxNulls = cols.flatMap { case (c, fmt) => Seq(
        (count(lit(1)) - count(col(c))).as(s"nn_$c"),
        fmt(min(col(c))).as(s"mn_$c"),
        fmt(max(col(c))).as(s"mx_$c"))
      }
      val distincts = cols.map { case (c, _) => countDistinct(col(c)).as(s"nd_$c") }
      val base = o.agg(minMaxNulls.head, minMaxNulls.tail: _*)
      val dist = o.agg(distincts.head, distincts.tail: _*)
      base.crossJoin(dist)
        .select(inline(array(cols.map { case (c, _) =>
          struct(lit(c).as("col_name"),
            col(s"nn_$c").as("n_nulls"),
            col(s"nd_$c").as("n_distinct"),
            col(s"mn_$c").as("min_value"),
            col(s"mx_$c").as("max_value"))
        }: _*)))
        .orderBy($"col_name")
    },

    // ---- link-graph authority scoring: PageRank, Pregel shape ----
    // The web-curation quality signal (rank pages by link authority)
    // over the customer<->supplier interaction graph from lineitem.
    // Each of the 4 iterations is ONE equi-join (edges ⋈ ranks on src,
    // both sides partitioned by the 8-byte id) + a partial-aggregated
    // sum on dst — the GraphX/Pregel shape; at cluster scale the edge
    // table is hash-partitioned once and every iteration reuses that
    // exchange. localCheckpoint per iteration truncates lineage.
    //
    // ALL arithmetic is integer fixed-point (1e12 mass units, damping
    // 0.85 as *85 div 100): exact, overflow-free (max 85e12 << 2^63),
    // and bit-identical in any engine — the oracle replays all 4
    // iterations in SQL with no float in sight. Every node of the
    // undirected graph has outdeg >= 1, so there is no dangling mass.
    "q_graph_pagerank" -> { (s, d) =>
      import s.implicits._
      val e0 = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
        .distinct()
      val edges = e0.select($"a".as("src"), $"b".as("dst"))
        .union(e0.select($"b".as("src"), $"a".as("dst")))
      pageRank(edges, iters = 4)
        .select($"id", $"pr".as("pr_units"))
        .orderBy($"pr_units".desc, $"id").limit(20)
    },

    // ---- count-min sketch (the sketch path heavy-hitters narrates) ----
    // 4 rows x 1024 counters; each term occurrence increments one bucket
    // per row (bucket = Knuth-mixed polynomial word hash, the replayable
    // family), and a term's estimate is the MIN over its 4 counters —
    // an overestimate exactly when buckets collide, never under. This is
    // the fixed-memory alternative to exact two-stage heavy hitters at
    // 100 TB: counters partial-aggregate map-side into <= 4096 cells per
    // task regardless of vocabulary size, and sketches merge by cell-wise
    // addition across any partitioning. Deterministic hash functions make
    // even the approximate estimates hash-comparable. Output: the top-20
    // exact terms with exact and CMS counts side by side.
    "q_sketch_cms" -> { (s, d) =>
      import s.implicits._
      graft.functions.VectorExprs.register(s)
      val W = 1024
      def bucket(h: org.apache.spark.sql.Column, i: Int) =
        (pmod(h, lit(2147483648L)) * lit(2654435761L) + lit(i * 1000003L)) %
          lit(4294967296L) % lit(W.toLong)
      val tw = Tables.documents(s, d)
        .select(explode(arrays_zip(
          split($"text", " ").as("t"),
          expr("word_hashes(text)").as("h"))).as("z"))
        .select($"z.t".as("term"), $"z.h".as("h"))
      val sketch = tw
        .select(explode(array((0 until 4).map(i =>
          struct(lit(i).as("r"), bucket($"h", i).as("b"))): _*)).as("rb"))
        .groupBy($"rb.r".as("r"), $"rb.b".as("b"))
        .agg(count(lit(1)).as("cnt"))
      val top = tw.groupBy($"term")
        .agg(count(lit(1)).as("exact_cnt"), max($"h").as("h"))
        .orderBy($"exact_cnt".desc, $"term").limit(20)
      top
        .select($"term", $"exact_cnt", explode(array((0 until 4).map(i =>
          struct(lit(i).as("r"), bucket($"h", i).as("b"))): _*)).as("rb"))
        .select($"term", $"exact_cnt", $"rb.r".as("r"), $"rb.b".as("b"))
        .join(broadcast(sketch), Seq("r", "b"))
        .groupBy($"term", $"exact_cnt")
        .agg(min($"cnt").as("cms_est"))
        .select($"term", asLong($"exact_cnt").as("exact_cnt"),
          asLong($"cms_est").as("cms_est"))
        .orderBy($"exact_cnt".desc, $"term")
    },

    // ---- triangle counting (degree-ordered edge iterator) ----
    // Per-node triangle participation over the part co-purchase graph
    // (parts sharing an order), on a deterministic Knuth-hash 20% sample
    // of orders — sampled motif counting is the standard practice at
    // scale, and sampling ORDERS (not edges) preserves closed wedges
    // within the kept orders while shrinking edge count superlinearly.
    // The count uses the classic degree-ordered orientation: every edge
    // points from its (deg, id)-smaller endpoint, so each triangle is
    // found exactly once as a wedge at its minimum vertex plus the
    // closing edge, and per-vertex out-degree — hence wedge fan-out per
    // task — is bounded by O(sqrt(m)) regardless of hub skew. Every join
    // is an equi-join (the closing edge's orientation is made canonical
    // by carrying endpoint degrees into the wedge). The oracle counts
    // the SAME triangles by the naive a<b<c triple join — an independent
    // method, not a replay.
    "q_graph_triangles" -> { (s, d) =>
      import s.implicits._
      val knuth = (c: org.apache.spark.sql.Column) => Hashing.knuth(c)
      val ords = Tables.orders(s, d).select($"o_orderkey")
        .filter(knuth($"o_orderkey") % 1000 < 200)
      val li = Tables.lineitem(s, d).select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        .join(ords, $"ok" === $"o_orderkey").drop("o_orderkey").distinct()
      val e0 = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
        .localCheckpoint(eager = false) // reused: degree pass + the two orientation joins (materialized by the deg.count() guard)
      val deg = e0.select(explode(array($"a", $"b")).as("v"))
        .groupBy($"v").agg(count(lit(1)).as("dg"))
        .localCheckpoint(eager = false)
      // deg is node-sized (the pageRank treatment, guide §3.1): while it
      // fits an executor, broadcast it into both orientation joins so
      // the edge list is not shuffled twice just to pick up endpoint
      // degrees; past the cap the shuffle joins return. The count is a
      // driver scalar over the materialized checkpoint.
      val bcastDeg = deg.count() <= 4000000L
      def degSide(df: DataFrame): DataFrame = if (bcastDeg) broadcast(df) else df
      val oriented = e0
        .join(degSide(deg.select($"v".as("a"), $"dg".as("da"))), "a")
        .join(degSide(deg.select($"v".as("b"), $"dg".as("db"))), "b")
        .select(when(struct($"da", $"a") < struct($"db", $"b"),
            struct($"a".as("u"), $"b".as("w"), $"db".as("dw")))
          .otherwise(struct($"b".as("u"), $"a".as("w"), $"da".as("dw"))).as("e"))
        .select($"e.u".as("u"), $"e.w".as("w"), $"e.dw".as("dw"))
        .localCheckpoint(eager = false) // reused by both wedge sides and the closing join
      val wedges = oriented.as("e1").join(oriented.as("e2"),
          col("e1.u") === col("e2.u") &&
            struct(col("e1.dw"), col("e1.w")) < struct(col("e2.dw"), col("e2.w")))
        .select(col("e1.u").as("t0"), col("e1.w").as("v1"), col("e2.w").as("v2"))
      val tri = wedges.join(
        oriented.select($"u".as("v1"), $"w".as("v2")), Seq("v1", "v2"))
      tri.select(explode(array($"t0", $"v1", $"v2")).as("node"))
        .groupBy($"node").agg(asLong(count(lit(1))).as("tri_cnt"))
        .orderBy($"node")
    }
  )

  /** Fixed-point PageRank over an undirected edge list (`src`, `dst`,
    * both directions present; every node thus has outdeg >= 1 — no
    * dangling mass). Mass is 1e12 integer units; damping 0.85 applied
    * as *85 div 100. Truncating division leaks < 1 unit per node per
    * contribution, so sum(pr) stays within (N + E) * iters of 1e12 —
    * exactness here means ENGINE-exact (bit-identical replay), the
    * property the oracle needs. Returns (id, outdeg, n, pr). */
  private[queries] def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val unit = 1000000000000L
    val e = edges.localCheckpoint(eager = false) // reused every iteration: one materialization (at the deg.count() guard)
    val deg = e.groupBy($"src".as("id")).agg(count(lit(1)).as("outdeg"))
    // Join strategy decided DELIBERATELY from the rank table's true size
    // (guide §3.1 — post-checkpoint frames carry no stats, so the
    // planner can't): the rank table is O(nodes) narrow rows; while it
    // fits an executor (cap 4M rows ~ 128 MB built), broadcasting it
    // into the edge join removes BOTH per-iteration shuffles of the
    // edge list — measured 4.2 s -> 2.8 s steady on the gate's graph
    // (16k nodes, 240k directed edges) with bit-identical fixed-point
    // results. Past the cap the shuffle join is the correct plan and
    // the prior shape is kept. deg is already aggregated, so the count
    // is one tiny driver scalar, not a corpus action.
    val nNodes = deg.count()
    val bcastRanks = nNodes <= 4000000L
    val n = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(n))
      .select($"id", $"outdeg", $"n", expr(s"$unit div n").as("pr"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val ranks = pr.select($"id".as("src"), expr("pr div outdeg").as("c"))
      val inflow = e
        .join(if (bcastRanks) broadcast(ranks) else ranks, "src")
        .groupBy($"dst".as("id")).agg(sum($"c").as("inflow"))
      pr = pr.drop($"pr")
        .join(inflow, Seq("id"), "left")
        .select($"id", $"outdeg", $"n",
          (expr(s"(15 * ($unit div n)) div 100") +
            expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
        .localCheckpoint(eager = false)
    }
    pr
  }

  /** TF-IDF scoring replay CTEs (through `scored` = (q_id, c_id, cos)),
    * shared by the q_search_tfidf and q_search_rrf oracles: idf in
    * integer micro-units, dense vocab-ordered vectors, list_dot_product
    * cosine — mirrors the Spark expression tree op for op. */
  private val tfidfOracleCtes: String =
    """tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY 1, 2),
      |dfv AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |w AS (
      |  SELECT doc_id, term,
      |    tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1000000) AS BIGINT) AS w6
      |  FROM tf JOIN dfv USING (term) CROSS JOIN n),
      |tids AS (SELECT term, row_number() OVER (ORDER BY term) AS tid FROM dfv),
      |grid AS (
      |  SELECT d.doc_id, t.tid, CAST(coalesce(wt.w6, 0) AS DOUBLE) AS x
      |  FROM (SELECT DISTINCT doc_id FROM w) d
      |  CROSS JOIN tids t
      |  LEFT JOIN (SELECT doc_id, tid, w6 FROM w JOIN tids USING (term)) wt
      |    ON wt.doc_id = d.doc_id AND wt.tid = t.tid),
      |vecs AS (SELECT doc_id, list(x ORDER BY tid) AS v FROM grid GROUP BY doc_id),
      |scored AS (
      |  SELECT q.doc_id AS q_id, b.doc_id AS c_id,
      |    list_dot_product(q.v, b.v)
      |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
      |  FROM vecs q JOIN vecs b ON q.doc_id < 50 AND b.doc_id != q.doc_id)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_search_tfidf" ->
      s"""WITH $tfidfOracleCtes
        |SELECT q_id, rk, doc_id, cos
        |FROM (SELECT q_id, c_id AS doc_id, cos,
        |        CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
        |      FROM scored)
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin,

    // both component rankings replayed (lexical from the shared tfidf
    // CTEs, semantic from the embedding cosine), fused in exact integer
    // ppm units — see the query comment for the rounding-boundary proof
    "q_search_rrf" ->
      s"""WITH $tfidfOracleCtes,
        |lex AS (
        |  SELECT q_id, doc_id, rk FROM (
        |    SELECT q_id, c_id AS doc_id,
        |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
        |    FROM scored) t
        |  WHERE rk <= 10),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |sem AS (
        |  SELECT q_id, b_id AS doc_id, rk FROM (
        |    SELECT q.vec_id AS q_id, b.vec_id AS b_id,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(q.ev, b.ev) DESC, b.vec_id) AS rk
        |    FROM e q JOIN e b ON q.vec_id < 50 AND b.vec_id != q.vec_id) t
        |  WHERE rk <= 10),
        |fused AS (
        |  SELECT coalesce(l.q_id, s.q_id) AS q_id,
        |         coalesce(l.doc_id, s.doc_id) AS doc_id,
        |         coalesce(CAST(round(1000000.0 / (60 + l.rk)) AS BIGINT), 0)
        |           + coalesce(CAST(round(1000000.0 / (60 + s.rk)) AS BIGINT), 0) AS rrf_ppm
        |  FROM lex l FULL OUTER JOIN sem s
        |    ON l.q_id = s.q_id AND l.doc_id = s.doc_id)
        |SELECT q_id, CAST(rk AS BIGINT) AS rk, doc_id, rrf_ppm FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |             ORDER BY rrf_ppm DESC, doc_id) AS rk
        |  FROM fused) t
        |WHERE rk <= 10
        |ORDER BY q_id, rk""".stripMargin,

    "q_search_bm25" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM docs),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(w) AS term FROM docs)
        |       GROUP BY doc_id, term),
        |termstats AS (SELECT term, count(*) AS df, sum(tf) AS cnt
        |              FROM tf GROUP BY term),
        |qterms AS (SELECT term, df FROM termstats
        |           ORDER BY cnt DESC, term LIMIT 3),
        |scored AS (
        |  SELECT tf.doc_id,
        |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
        |             * (tf * (1.2 + 1.0))
        |             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score,
        |         count(*) AS n_terms
        |  FROM tf JOIN qterms USING (term)
        |          JOIN dl USING (doc_id)
        |          CROSS JOIN stats
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, score, n_terms FROM scored
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // pair discovery replayed as independent all-pairs exact Jaccard (the
    // q_dedup_minhash oracle), then the transitive closure via a recursive
    // CTE and min-reachable-id per node — ground truth for the propagation
    // loop's fixpoint, not a restatement of it.
    "q_dedup_clusters" ->
      """WITH RECURSIVE docs AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                        FOR i IN range(1, len(w) - 1)]) s
        |       FROM docs WHERE len(w) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |          / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM pairs
        |          UNION ALL SELECT b_id, a_id FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT u, u FROM edges
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |labels AS (SELECT id AS doc_id, min(r) AS cluster_id
        |           FROM reach GROUP BY id),
        |sizes AS (SELECT cluster_id, count(*) AS cluster_size
        |          FROM labels GROUP BY cluster_id)
        |SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical,
        |       cluster_size
        |FROM labels JOIN sizes USING (cluster_id)
        |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang, source
        |FROM documents
        |WHERE (((doc_id % 2147483648 + 2147483648) % 2147483648)
        |        * 2654435761) % 4294967296 % 1000
        |      < CASE WHEN lang = 'en' THEN 100 ELSE 400 END
        |ORDER BY doc_id""".stripMargin,

    "q_text_heavy_hitters" ->
      """SELECT term, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term
        |ORDER BY cnt DESC, term LIMIT 20""".stripMargin,

    "q_text_entropy" ->
      """WITH tok AS (
        |  SELECT term, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS n_total FROM tok)
        |SELECT CAST(count(*) AS BIGINT) AS vocab_size,
        |       CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |       round(CAST(sum(CAST(round(ln(n_total) - ln(cnt), 6) AS DECIMAL(28,12)) * cnt)
        |                  AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 4) AS entropy_nats
        |FROM tok, tot""".stripMargin,

    "q_profile_skew" ->
      """WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(max(cnt) AS BIGINT) AS max_per_key,
        |       round(avg(cnt), 4) AS avg_per_key,
        |       round(quantile_cont(cnt, 0.99), 4) AS p99_per_key,
        |       round(max(cnt) / avg(cnt), 4) AS skew_ratio
        |FROM c""".stripMargin,

    "q_profile_histogram" ->
      """WITH cents AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders),
        |stats AS (SELECT min(pc) AS mn, greatest(max(pc) - min(pc), 1) AS rng FROM cents),
        |binned AS (
        |  SELECT least((pc - mn) * 20 // rng, 19) AS bin, mn, rng
        |  FROM cents CROSS JOIN stats),
        |counts AS (
        |  SELECT bin, mn, rng, count(*) AS n FROM binned GROUP BY 1, 2, 3)
        |SELECT bin,
        |  CAST((mn * 20 + bin * rng) // 20 AS BIGINT) AS bin_lo_cents,
        |  CAST((mn * 20 + (bin + 1) * rng) // 20 AS BIGINT) AS bin_hi_cents,
        |  n,
        |  CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        |FROM counts
        |ORDER BY bin""".stripMargin,

    "q_profile_columns" ->
      """SELECT 'o_custkey' AS col_name,
        |       count(*) - count(o_custkey) AS n_nulls,
        |       count(DISTINCT o_custkey) AS n_distinct,
        |       CAST(min(o_custkey) AS VARCHAR) AS min_value,
        |       CAST(max(o_custkey) AS VARCHAR) AS max_value FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*) - count(o_orderdate),
        |       count(DISTINCT o_orderdate),
        |       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
        |       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', count(*) - count(o_orderkey),
        |       count(DISTINCT o_orderkey),
        |       CAST(min(o_orderkey) AS VARCHAR),
        |       CAST(max(o_orderkey) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
        |       count(DISTINCT o_orderpriority),
        |       min(o_orderpriority), max(o_orderpriority) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
        |       count(DISTINCT o_orderstatus),
        |       min(o_orderstatus), max(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*) - count(o_totalprice),
        |       count(DISTINCT o_totalprice),
        |       CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
        |       CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) FROM orders
        |ORDER BY col_name""".stripMargin,

    // integer fixed-point makes the 4 iterations exactly replayable:
    // // is floor division, and every operand is positive, matching
    // Spark's `div` truncation semantics
    "q_graph_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT a AS src, b AS dst FROM e0
        |          UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT src AS id, count(*) AS outdeg FROM edges GROUP BY src),
        |p0 AS (SELECT id, outdeg, n, 1000000000000 // n AS pr
        |       FROM deg CROSS JOIN (SELECT count(*) AS n FROM deg)),
        |i1 AS (SELECT e.dst AS id, sum(p.pr // p.outdeg) AS inflow
        |       FROM edges e JOIN p0 p ON e.src = p.id GROUP BY e.dst),
        |p1 AS (SELECT d.id, d.outdeg, d.n,
        |         (15 * (1000000000000 // d.n)) // 100
        |           + (85 * coalesce(i.inflow, 0)) // 100 AS pr
        |       FROM p0 d LEFT JOIN i1 i USING (id)),
        |i2 AS (SELECT e.dst AS id, sum(p.pr // p.outdeg) AS inflow
        |       FROM edges e JOIN p1 p ON e.src = p.id GROUP BY e.dst),
        |p2 AS (SELECT d.id, d.outdeg, d.n,
        |         (15 * (1000000000000 // d.n)) // 100
        |           + (85 * coalesce(i.inflow, 0)) // 100 AS pr
        |       FROM p1 d LEFT JOIN i2 i USING (id)),
        |i3 AS (SELECT e.dst AS id, sum(p.pr // p.outdeg) AS inflow
        |       FROM edges e JOIN p2 p ON e.src = p.id GROUP BY e.dst),
        |p3 AS (SELECT d.id, d.outdeg, d.n,
        |         (15 * (1000000000000 // d.n)) // 100
        |           + (85 * coalesce(i.inflow, 0)) // 100 AS pr
        |       FROM p2 d LEFT JOIN i3 i USING (id)),
        |i4 AS (SELECT e.dst AS id, sum(p.pr // p.outdeg) AS inflow
        |       FROM edges e JOIN p3 p ON e.src = p.id GROUP BY e.dst),
        |p4 AS (SELECT d.id, d.outdeg, d.n,
        |         (15 * (1000000000000 // d.n)) // 100
        |           + (85 * coalesce(i.inflow, 0)) // 100 AS pr
        |       FROM p3 d LEFT JOIN i4 i USING (id))
        |SELECT id, CAST(pr AS BIGINT) AS pr_units FROM p4
        |ORDER BY pr_units DESC, id LIMIT 20""".stripMargin,

    // full CMS replay: polynomial word hashes in HUGEINT, Knuth-mixed
    // buckets, per-cell counts, min-over-rows estimates
    "q_sketch_cms" ->
      """WITH tw AS (
        |  SELECT t AS term,
        |    CASE WHEN len(t) = 0 THEN 0::HUGEINT
        |         ELSE list_reduce(
        |           list_transform(string_split(t, ''), c -> CAST(unicode(c) AS HUGEINT)),
        |           (a, b) -> (a * 1000003 + b) % 18446744073709551616::HUGEINT)
        |    END AS h
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
        |en AS (
        |  SELECT term, i AS r,
        |    CAST(((h % 2147483648::HUGEINT) * 2654435761::HUGEINT + i * 1000003)
        |         % 4294967296::HUGEINT % 1024 AS BIGINT) AS b
        |  FROM tw, unnest([0, 1, 2, 3]) AS u(i)),
        |sk AS (SELECT r, b, count(*) AS cnt FROM en GROUP BY r, b),
        |top AS (
        |  SELECT term, count(*) AS exact_cnt, max(h) AS h FROM tw
        |  GROUP BY term ORDER BY exact_cnt DESC, term LIMIT 20),
        |eb AS (
        |  SELECT term, exact_cnt, i AS r,
        |    CAST(((h % 2147483648::HUGEINT) * 2654435761::HUGEINT + i * 1000003)
        |         % 4294967296::HUGEINT % 1024 AS BIGINT) AS b
        |  FROM top, unnest([0, 1, 2, 3]) AS u(i))
        |SELECT term, CAST(exact_cnt AS BIGINT) AS exact_cnt,
        |       CAST(min(cnt) AS BIGINT) AS cms_est
        |FROM eb JOIN sk USING (r, b)
        |GROUP BY term, exact_cnt
        |ORDER BY exact_cnt DESC, term""".stripMargin,

    // independent method: naive a<b<c triple join (no degree ordering)
    "q_graph_triangles" ->
      """WITH ords AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE (((o_orderkey % 2147483648 + 2147483648) % 2147483648)
        |         * 2654435761) % 4294967296 % 1000 < 200),
        |li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem JOIN ords ON l_orderkey = o_orderkey),
        |e AS (
        |  SELECT DISTINCT x.pk AS a, y.pk AS b
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT unnest([x, y, z]) AS node FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
        |FROM n GROUP BY node ORDER BY node""".stripMargin
  )
}
