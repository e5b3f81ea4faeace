package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B lab for round-17 optimization experiments. Times named
  * variants of hot operators side by side in one JVM (2 runs each; the
  * second is the steady number). Not part of the driver contract.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.OptLab <experiment>"
  */
object OptLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach {
      case "ssj" => ssj(spark, sfDir)
      case "pagerank" => pagerank(spark, sfDir)
      case "prplan" => prplan(spark, sfDir)
      case "bigram" => bigram(spark, sfDir)
      case "mmr" => mmr(spark, sfDir)
      case "tri" => tri(spark, sfDir)
      case "shj" => shj(spark, sfDir)
      case "search" => search(spark, sfDir)
      case "variant" => variantSpread(spark, sfDir)
      case "pipeline" => pipeline(spark, sfDir)
      case "textagg" => textagg(spark, sfDir)
      case other => println(s"unknown experiment: $other")
    }
    spark.stop()
  }

  private def time(tag: String)(mk: => DataFrame): Unit = {
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"OPTLAB $tag%-36s ${times.map(t => f"$t%.2f").mkString(" ")}")
  }

  /** stream-stream inner join at varying state-partition fan-out. */
  private def ssj(s: SparkSession, d: String): Unit = {
    import s.implicits._
    def q(parts: Int): DataFrame = {
      val purchases = graft.tracks.TrackStateOp.eventsStream(s, d)
        .filter($"eventType" === "purchase")
        .select($"user_id".as("p_user"), timestamp_micros($"tsMicros").as("p_ts"),
          $"event_id".as("p_id"))
        .withWatermark("p_ts", "1 hour")
      val clicks = graft.tracks.TrackStateOp.eventsStream(s, d)
        .filter($"eventType" === "click")
        .select($"user_id".as("c_user"), timestamp_micros($"tsMicros").as("c_ts"),
          $"event_id".as("c_id"))
        .withWatermark("c_ts", "1 hour")
      val joined = purchases.join(clicks,
        $"p_user" === $"c_user" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
          $"c_ts" <= $"p_ts")
        .select($"p_id", $"c_id")
      LabBridge.runToMem(joined, "append", parts).orderBy($"p_id", $"c_id")
    }
    Seq(8, 4, 2, 1).foreach { p =>
      time(s"ssj parts=$p")(q(p))
      val got = q(p).count()
      println(s"OPTLAB ssj parts=$p rows=$got")
    }
  }

  /** preferSortMergeJoin on/off across the join-heavy gates. */
  private def shj(s: SparkSession, d: String): Unit = {
    val qs = Seq("q_tpch_q5", "q_tpch_q7", "q_tpch_q18", "q_tpch_q21",
      "q_join_inner_star", "q_join_bucketed", "q_tpch_q9", "q_join_asof")
    for (round <- 1 to 2; pref <- Seq("true", "false")) {
      s.conf.set("spark.sql.join.preferSortMergeJoin", pref)
      val t0 = System.nanoTime()
      qs.foreach { q =>
        SparkEntry.queries(q)(s, d).write.format("noop").mode("overwrite").save()
      }
      println(f"OPTLAB shj round$round preferSMJ=$pref total ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    s.conf.unset("spark.sql.join.preferSortMergeJoin")
  }

  /** Triangle count: eager vs lazy checkpoints around the self-joined
    * oriented edge list (cache-race hypothesis). */
  private def tri(s: SparkSession, d: String): Unit = {
    import s.implicits._
    def variant(eagerCp: Boolean): DataFrame = {
      val knuth = (c: org.apache.spark.sql.Column) => graft.queries.Hashing.knuth(c)
      val ords = Tables.orders(s, d).select($"o_orderkey")
        .filter(knuth($"o_orderkey") % 1000 < 200)
      val li = Tables.lineitem(s, d).select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        .join(ords, $"ok" === $"o_orderkey").drop("o_orderkey").distinct()
      val e0 = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
        .localCheckpoint(eager = eagerCp)
      val deg = e0.select(explode(array($"a", $"b")).as("v"))
        .groupBy($"v").agg(count(lit(1)).as("dg"))
        .localCheckpoint(eager = eagerCp)
      val bcastDeg = deg.count() <= 4000000L
      def degSide(df: DataFrame): DataFrame = if (bcastDeg) broadcast(df) else df
      val oriented = e0
        .join(degSide(deg.select($"v".as("a"), $"dg".as("da"))), "a")
        .join(degSide(deg.select($"v".as("b"), $"dg".as("db"))), "b")
        .select(when(struct($"da", $"a") < struct($"db", $"b"),
            struct($"a".as("u"), $"b".as("w"), $"db".as("dw")))
          .otherwise(struct($"b".as("u"), $"a".as("w"), $"da".as("dw"))).as("e"))
        .select($"e.u".as("u"), $"e.w".as("w"), $"e.dw".as("dw"))
        .localCheckpoint(eager = eagerCp)
      val wedges = oriented.as("e1").join(oriented.as("e2"),
          col("e1.u") === col("e2.u") &&
            struct(col("e1.dw"), col("e1.w")) < struct(col("e2.dw"), col("e2.w")))
        .select(col("e1.u").as("t0"), col("e1.w").as("v1"), col("e2.w").as("v2"))
      val tri = wedges.join(
        oriented.select($"u".as("v1"), $"w".as("v2")), Seq("v1", "v2"))
      tri.select(explode(array($"t0", $"v1", $"v2")).as("node"))
        .groupBy($"node").agg(count(lit(1)).cast("long").as("tri_cnt"))
        .orderBy($"node")
    }
    time("tri eager")(variant(true))
    time("tri lazy (current)")(variant(false))
    time("tri eager")(variant(true))
    time("tri lazy (current)")(variant(false))
  }

  /** MMR greedy loop: eager vs lazy localCheckpoints (job-count). */
  private def mmr(s: SparkSession, d: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.llm.VectorOps.dot
    def variant(eagerCp: Boolean): DataFrame = {
      import graft.llm.VectorOps.{asDoubles, norm2}
      graft.functions.VectorExprs.register(s)
      val sl = graft.queries.LlmVectorQueries.cosineRanked(s, d, 10)
        .select($"q_id", $"b_id", $"cos".as("rel"))
        .localCheckpoint(eager = eagerCp)
      val withN = graft.Tables.embeddings(s, d).select(
        col("vec_id"), asDoubles(col("embedding")).as("v"),
        sqrt(norm2(asDoubles(col("embedding")))).as("nrm"))
      val withV = sl.join(withN.select($"vec_id".as("b_id"), $"v", $"nrm"), Seq("b_id"))
      val pairs = withV.as("x").join(withV.as("y"),
          col("x.q_id") === col("y.q_id") && col("x.b_id") =!= col("y.b_id"))
        .select(col("x.q_id").as("q_id"), col("x.b_id").as("a_id"),
          col("y.b_id").as("c_id"),
          (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("sim"))
        .localCheckpoint(eager = eagerCp)
      var selected = sl.withColumn("rn", row_number().over(
          Window.partitionBy($"q_id").orderBy($"rel".desc, $"b_id")))
        .filter($"rn" === 1)
        .select($"q_id", $"b_id", lit(1L).as("pick"))
        .localCheckpoint(eager = eagerCp)
      for (i <- 2 to 5) {
        val cand = sl.join(selected.select($"q_id", $"b_id"),
          Seq("q_id", "b_id"), "left_anti")
        val ms = pairs.join(selected.select($"q_id", $"b_id".as("c_id")),
            Seq("q_id", "c_id"))
          .groupBy($"q_id", $"a_id").agg(max($"sim").as("maxsim"))
          .withColumnRenamed("a_id", "b_id")
        val next = cand.join(ms, Seq("q_id", "b_id"))
          .withColumn("mmr", lit(0.5) * $"rel" - lit(0.5) * $"maxsim")
          .withColumn("rn", row_number().over(
            Window.partitionBy($"q_id").orderBy($"mmr".desc, $"b_id")))
          .filter($"rn" === 1)
          .select($"q_id", $"b_id", lit(i.toLong).as("pick"))
        selected = selected.union(next).localCheckpoint(eager = eagerCp)
      }
      selected.select($"q_id", $"pick", $"b_id").orderBy($"q_id", $"pick")
    }
    time("mmr eager (current)")(variant(true))
    time("mmr lazy")(variant(false))
    time("mmr eager (current)")(variant(true))
    time("mmr lazy")(variant(false))
    def h(df: DataFrame): String = df.collect().map(_.toString).mkString("|")
    println(s"OPTLAB mmr equal: ${h(variant(true)) == h(variant(false))}")
  }

  /** Search family (round 18): tf / vecs materialization strategy.
    * Hypotheses from the r17 verdict: (a) lazy-localCheckpoint `tf`
    * consumed by both broadcast-build jobs and the main stage races
    * ("Block already exists" duplicate materialization); (b) bm25's
    * cache()/unpersist() pair is a no-op at action time so tf's
    * explode+groupBy runs twice (broadcast build + scoring). Variants:
    * tf lazy vs eager, and additionally checkpointing `vecs` (consumed
    * twice: qvecs broadcast build + probe side). */
  private def search(s: SparkSession, d: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def tfidf(eagerTf: Boolean, cpVecs: Boolean): DataFrame = {
      val docs = Tables.documents(s, d)
      val tf = docs
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = eagerTf)
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
      val vecs0 = w.join(broadcast(tids), "term")
        .groupBy($"doc_id")
        .agg(map_from_entries(collect_list(struct($"tid", $"w6"))).as("m"))
        .crossJoin(broadcast(vsz))
        .select($"doc_id",
          transform(sequence(lit(1), $"vsz"),
            i => coalesce(element_at($"m", i), lit(0L)).cast("double")).as("v"))
        .withColumn("n2", dot($"v", $"v"))
      val vecs = if (cpVecs) vecs0.localCheckpoint() else vecs0
      val qvecs = vecs.filter($"doc_id" < 50)
        .select($"doc_id".as("q_id"), $"v".as("qv"), $"n2".as("na2"))
      vecs.join(broadcast(qvecs), $"q_id" =!= $"doc_id")
        .select($"q_id", $"doc_id",
          (dot($"qv", $"v") / (sqrt($"na2") * sqrt($"n2"))).as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"q_id").orderBy($"cos".desc, $"doc_id")))
        .filter($"rk" <= 5)
        .select($"q_id", $"rk".cast("long").as("rk"), $"doc_id", $"cos")
        .orderBy($"q_id", $"rk")
    }
    def bm25(variant: String): DataFrame = {
      val docs = Tables.documents(s, d)
      val tf0 = docs
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val tf = variant match {
        case "deadcache" => val c = tf0.cache(); c.unpersist(); c
        case "eagercp" => tf0.localCheckpoint()
        case "plain" => tf0
      }
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
      tf.join(broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log(($"n" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
        .withColumn("tscore",
          $"idf" * ($"tf" * (k1 + 1.0)) /
            ($"tf" + lit(k1) * (lit(1.0) - b + lit(b) * $"dl" / $"avgdl")))
        .groupBy($"doc_id")
        .agg(round(sum($"tscore"), 4).as("score"),
          count(lit(1)).cast("long").as("n_terms"))
        .orderBy($"score".desc, $"doc_id").limit(10)
    }
    for (_ <- 1 to 2) {
      time("tfidf lazyTf (current)")(tfidf(eagerTf = false, cpVecs = false))
      time("tfidf eagerTf")(tfidf(eagerTf = true, cpVecs = false))
      time("tfidf eagerTf+cpVecs")(tfidf(eagerTf = true, cpVecs = true))
      time("tfidf lazyTf+cpVecs")(tfidf(eagerTf = false, cpVecs = true))
    }
    for (_ <- 1 to 2) {
      time("bm25 deadcache (current)")(bm25("deadcache"))
      time("bm25 eagercp")(bm25("eagercp"))
      time("bm25 plain")(bm25("plain"))
    }
    def h(df: DataFrame): String = df.collect().map(_.toString).mkString("|")
    println(s"OPTLAB tfidf equal: " +
      s"${h(tfidf(false, false)) == h(tfidf(true, true))}")
    println(s"OPTLAB bm25 equal: " +
      s"${h(bm25("deadcache")) == h(bm25("eagercp"))}")
  }

  /** Multi-consumer corpus aggregates (round 18): q_text_pmi's c2 feeds
    * the ca/cb/n broadcast builds AND the main filter (4 consumers →
    * up to 4 bigram-formation corpus passes); q_text_surprisal's tf
    * feeds the vocab build + the scoring join (2 passes);
    * q_select_dsir's token-hash explode feeds docBucket/rawB/tgtB
    * (3 passes). A/B: as-is vs materialize-once (checkpoint the
    * aggregate; for dsir derive rawB/tgtB FROM the (doc,lang,bucket)
    * aggregate so the token stream is read once). */
  private def textagg(s: SparkSession, d: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def pmi(cp: Boolean): DataFrame = {
      val bg = Tables.documents(s, d)
        .select(split($"text", " ").as("toks"))
        .filter(size($"toks") >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i-1] AS a, toks[i] AS b))")).as("p"))
        .select($"p.a".as("a"), $"p.b".as("b"))
      val c20 = bg.groupBy($"a", $"b").agg(count(lit(1)).as("c2"))
      val c2 = if (cp) c20.localCheckpoint() else c20
      val ca = c2.groupBy($"a").agg(sum($"c2").as("ca"))
      val cb = c2.groupBy($"b").agg(sum($"c2").as("cb"))
      val n = c2.agg(sum($"c2").as("nbg"))
      c2.filter($"c2" >= 5)
        .join(broadcast(ca), Seq("a")).join(broadcast(cb), Seq("b"))
        .crossJoin(broadcast(n))
        .withColumn("ratio",
          ($"c2" * $"nbg").cast("double") / ($"ca" * $"cb").cast("double"))
        .orderBy($"ratio".desc, $"a", $"b").limit(20)
        .withColumn("rk", row_number().over(
          Window.orderBy($"ratio".desc, $"a", $"b")))
        .select($"rk".cast("long").as("rk"), $"a", $"b", $"c2".cast("long").as("c2"),
          round(log($"ratio"), 6).as("pmi"))
        .orderBy($"rk")
    }
    def surprisal(cp: Boolean): DataFrame = {
      val tf0 = Tables.documents(s, d)
        .select($"doc_id", explode(graft.llm.TextOps.words($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val tf = if (cp) tf0.localCheckpoint() else tf0
      val vocab = tf.groupBy($"term").agg(sum($"tf").as("ctf"))
      val total = vocab.agg(sum($"ctf").as("n_total"))
      tf.join(broadcast(vocab), "term")
        .crossJoin(broadcast(total))
        .withColumn("surp",
          round(log($"n_total") - log($"ctf"), 6).cast("decimal(28,12)"))
        .groupBy($"doc_id")
        .agg(
          round(sum($"surp" * $"tf").cast("double") /
            sum($"tf").cast("double"), 4).as("mean_surprisal"),
          sum($"tf").cast("long").as("n_tok"))
        .orderBy($"doc_id")
    }
    def dsir(variant: String): DataFrame = {
      graft.functions.VectorExprs.register(s)
      val NB = 1024
      val feats = Tables.documents(s, d)
        .withColumn("wh", call_function("word_hashes", $"text"))
        .select($"doc_id", $"lang",
          explode(concat($"wh",
            call_function("span_hashes", $"wh", lit(2)))).as("f"))
        .select($"doc_id", $"lang", pmod($"f", lit(NB.toLong)).as("bucket"))
      val (docBucket, rawB, tgtB) = variant match {
        case "current" =>
          (feats.groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("cnt")),
            feats.groupBy($"bucket").agg(count(lit(1)).as("r")),
            feats.filter($"lang" === "en")
              .groupBy($"bucket").agg(count(lit(1)).as("t")))
        case "derive" =>
          val db = feats.groupBy($"doc_id", $"lang", $"bucket")
            .agg(count(lit(1)).as("cnt"))
            .localCheckpoint()
          (db.select($"doc_id", $"bucket", $"cnt"),
            db.groupBy($"bucket").agg(sum($"cnt").as("r")),
            db.filter($"lang" === "en")
              .groupBy($"bucket").agg(sum($"cnt").as("t")))
      }
      val tbl = s.range(NB).select($"id".as("bucket"))
        .join(rawB, Seq("bucket"), "left")
        .join(tgtB, Seq("bucket"), "left")
        .select($"bucket", coalesce($"r", lit(0L)).as("r"),
          coalesce($"t", lit(0L)).as("t"))
      val totals = tbl.agg(sum($"r").as("r_total"), sum($"t").as("t_total"))
      def lnDec(c: org.apache.spark.sql.Column) =
        round(log(c.cast("double")), 6).cast("decimal(28,12)")
      val lam = tbl.crossJoin(broadcast(totals))
        .select($"bucket",
          (lnDec($"t" + 1) - lnDec($"t_total" + NB)
            - lnDec($"r" + 1) + lnDec($"r_total" + NB)).as("lw"))
      docBucket.join(broadcast(lam), "bucket")
        .groupBy($"doc_id")
        .agg(round(sum($"lw" * $"cnt"), 4).cast("double").as("dsir_score"),
          sum($"cnt").cast("long").as("n_feats"),
          (sum($"lw" * $"cnt") > 0).as("keep"))
        .orderBy($"doc_id")
    }
    def bigramLm(cpBgTf: Boolean, cpUni: Boolean): DataFrame = {
      val toksArr = Tables.documents(s, d)
        .select($"doc_id", split($"text", " ").as("toks"))
      val bg = toksArr
        .filter(size($"toks") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i-1] AS a, toks[i] AS b))")).as("p"))
        .select($"doc_id", $"p.a".as("a"), $"p.b".as("b"))
      val bgTf0 = bg.groupBy($"doc_id", $"a", $"b").agg(count(lit(1)).as("tf"))
      val bgTf = if (cpBgTf) bgTf0.localCheckpoint() else bgTf0
      val c2 = bgTf.groupBy($"a", $"b").agg(sum($"tf").as("c2"))
      val uni0 = toksArr.select(explode($"toks").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c1"))
        .withColumnRenamed("w", "a")
      val uni = if (cpUni) uni0.localCheckpoint() else uni0
      val v = uni.agg(count(lit(1)).as("vsz"))
      bgTf.join(broadcast(c2), Seq("a", "b")).join(broadcast(uni), Seq("a"))
        .crossJoin(broadcast(v))
        .withColumn("surp",
          round(log($"c1" + $"vsz") - log($"c2" + lit(1L)), 6)
            .cast("decimal(28,12)"))
        .groupBy($"doc_id")
        .agg(
          round(sum($"surp" * $"tf").cast("double") /
            sum($"tf").cast("double"), 4).as("mean_bigram_surprisal"),
          sum($"tf").cast("long").as("n_bigrams"))
        .orderBy($"doc_id")
    }
    for (_ <- 1 to 2) {
      time("pmi current")(pmi(false))
      time("pmi cpC2")(pmi(true))
      time("surprisal current")(surprisal(false))
      time("surprisal cpTf")(surprisal(true))
      time("dsir current")(dsir("current"))
      time("dsir derive")(dsir("derive"))
      time("bigram_lm none")(bigramLm(false, false))
      time("bigram_lm cpBgTf")(bigramLm(true, false))
      time("bigram_lm cpBoth")(bigramLm(true, true))
    }
    println(s"OPTLAB bigram_lm equal: " +
      s"${bigramLm(false, false).collect().map(_.toString).mkString("|") == bigramLm(true, true).collect().map(_.toString).mkString("|")}")
    def h(df: DataFrame): String = df.collect().map(_.toString).mkString("|")
    println(s"OPTLAB pmi equal: ${h(pmi(false)) == h(pmi(true))}")
    println(s"OPTLAB surprisal equal: ${h(surprisal(false)) == h(surprisal(true))}")
    println(s"OPTLAB dsir equal: ${h(dsir("current")) == h(dsir("derive"))}")
  }

  /** Curation-pipeline composition (q_pipeline_training_set shape):
    * stagewise cost breakdown + A/B on materializing the exact-dedup
    * survivors frame (consumed by BOTH the minhash pass and the
    * anti-join/quality tail — recomputed per consumer today). */
  private def pipeline(s: SparkSession, d: String): Unit = {
    import s.implicits._
    graft.functions.VectorExprs.register(s)
    def keepExact(base: DataFrame): DataFrame =
      base.groupBy(sha2($"text", 256).as("digest"))
        .agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
    def full(cpDocs: Boolean): DataFrame = {
      val base = Tables.documents(s, d)
      val docs0 = base.join(keepExact(base), Seq("doc_id"))
      val docs = if (cpDocs) docs0.select($"doc_id", $"text", $"source")
        .localCheckpoint() else docs0
      val nearDups = graft.queries.LlmTextQueries
        .minhashNearDupsFrom(s, docs.select($"doc_id", $"text"))
        .select($"b_id".as("doc_id")).distinct()
      val kept = docs.join(nearDups, Seq("doc_id"), "left_anti")
      kept.select(Seq($"doc_id") ++ graft.llm.TextOps.qualityColumns($"text"): _*)
        .filter($"n_tokens" >= 20 && $"quality_score" >= 0.2)
        .select($"doc_id", $"n_tokens", $"quality_score")
        .orderBy($"doc_id")
    }
    // stagewise: where do the CPU seconds go?
    val base = Tables.documents(s, d)
    time("stage keepExact")(keepExact(base))
    time("stage docsJoin")(base.join(keepExact(base), Seq("doc_id")))
    time("stage minhash(docsJoin)")(graft.queries.LlmTextQueries
      .minhashNearDupsFrom(s,
        base.join(keepExact(base), Seq("doc_id")).select($"doc_id", $"text")))
    time("stage minhash(rawbase)")(graft.queries.LlmTextQueries
      .minhashNearDupsFrom(s, base.select($"doc_id", $"text")))
    for (_ <- 1 to 2) {
      time("pipeline current")(full(cpDocs = false))
      time("pipeline cpDocs")(full(cpDocs = true))
    }
    def h(df: DataFrame): String = df.collect().map(_.toString).mkString("|")
    println(s"OPTLAB pipeline equal: ${h(full(false)) == h(full(true))}")
  }

  /** q_scalar_variant: repartition spread before the JSON encode/parse —
    * defaultParallelism (current) vs none vs 8 (r17 verdict item 6:
    * 13 CPU-s summed task time at 32 tasks for a 0.9 s wall suggests
    * superlinear contention in the parse path). */
  private def variantSpread(s: SparkSession, d: String): Unit = {
    import s.implicits._
    def q(parts: Int): DataFrame = {
      val base = Tables.events(s, d)
      val spread = if (parts <= 0) base else base.repartition(parts)
      spread
        .select($"event_id".as("eid"),
          parse_json(to_json(struct($"event_type", $"value",
            struct($"user_id", $"event_id").as("ids"), $"props"))).as("v"))
        .select(
          $"eid".as("event_id"),
          expr("variant_get(v, '$.event_type', 'string')").as("event_type"),
          expr("variant_get(v, '$.value', 'double')").as("value"),
          expr("variant_get(v, '$.ids.user_id', 'long')").as("user_id"),
          expr("variant_get(parse_json(variant_get(v, '$.props', 'string')), " +
            "'$.k', 'long')").as("k"),
          (expr("variant_get(v, '$.ids.event_id', 'long')") === $"eid")
            .cast("long").as("id_roundtrip"),
          expr("variant_get(v, '$.no_such_path', 'string')").isNull
            .cast("long").as("missing_is_null"))
        .orderBy($"event_id")
    }
    val dp = s.sparkContext.defaultParallelism
    for (_ <- 1 to 2) {
      time(s"variant repartition($dp) (current)")(q(dp))
      time("variant no-spread")(q(0))
      time("variant repartition(8)")(q(8))
    }
    def h(df: DataFrame): String = df.collect().map(_.toString).mkString("|")
    println(s"OPTLAB variant equal: ${h(q(dp)) == h(q(0))}")
  }

  /** bigram formation: lead() window (old) vs array transform (new). */
  private def bigram(s: SparkSession, d: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def tail(bg: DataFrame): DataFrame = {
      val bgTf = bg.groupBy($"doc_id", $"a", $"b").agg(count(lit(1)).as("tf"))
      val c2 = bgTf.groupBy($"a", $"b").agg(sum($"tf").as("c2"))
      bgTf.join(broadcast(c2), Seq("a", "b"))
        .groupBy($"doc_id").agg(sum($"tf").as("n"), max($"c2").as("mx"))
        .orderBy($"doc_id")
    }
    def oldShape: DataFrame = {
      val toks = Tables.documents(s, d)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      tail(toks
        .withColumn("nxt", lead($"w", 1).over(
          Window.partitionBy($"doc_id").orderBy($"pos")))
        .filter($"nxt".isNotNull)
        .select($"doc_id", $"w".as("a"), $"nxt".as("b")))
    }
    def newShape: DataFrame = {
      tail(Tables.documents(s, d)
        .select($"doc_id", split($"text", " ").as("toks"))
        .filter(size($"toks") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i-1] AS a, toks[i] AS b))")).as("p"))
        .select($"doc_id", $"p.a".as("a"), $"p.b".as("b")))
    }
    time("bigram old window")(oldShape)
    time("bigram new transform")(newShape)
    time("bigram old window")(oldShape)
    time("bigram new transform")(newShape)
  }

  /** Dump the PER-ITERATION inflow plan for both pageRank join
    * strategies (the gate's final explain hides the loop behind the
    * localCheckpoint) — evidence for plans/r17. */
  private def prplan(s: SparkSession, d: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.execution.ExplainMode
    val e0 = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      .distinct()
    val e = e0.select($"a".as("src"), $"b".as("dst")).localCheckpoint()
    val deg = e.groupBy($"src".as("id")).agg(count(lit(1)).as("outdeg"))
    val n = deg.agg(count(lit(1)).as("n"))
    val pr = deg.crossJoin(broadcast(n))
      .select($"id", $"outdeg", $"n", expr("1000000000000 div n").as("pr"))
      .localCheckpoint()
    val ranks = pr.select($"id".as("src"), expr("pr div outdeg").as("c"))
    def show(tag: String, df: DataFrame): Unit = {
      println(s"==== PRPLAN $tag ====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    show("shuffle (before)",
      e.join(ranks, "src").groupBy($"dst".as("id")).agg(sum($"c").as("inflow")))
    show("broadcast (after)",
      e.join(broadcast(ranks), "src").groupBy($"dst".as("id")).agg(sum($"c").as("inflow")))
  }

  /** PageRank variants: current (per-iter localCheckpoint) vs lazy
    * lineage vs broadcast-rank joins. */
  private def pagerank(s: SparkSession, d: String): Unit = {
    import s.implicits._
    def edges: DataFrame = {
      val e0 = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
        .distinct()
      e0.select($"a".as("src"), $"b".as("dst"))
        .union(e0.select($"b".as("src"), $"a".as("dst")))
    }
    val unit = 1000000000000L

    // A: current shape (graft.queries.SearchQueries.pageRank)
    def prA(): DataFrame = {
      val e = edges.localCheckpoint()
      val deg = e.groupBy($"src".as("id")).agg(count(lit(1)).as("outdeg"))
      val n = deg.agg(count(lit(1)).as("n"))
      var pr = deg.crossJoin(broadcast(n))
        .select($"id", $"outdeg", $"n", expr(s"$unit div n").as("pr"))
        .localCheckpoint()
      for (_ <- 1 to 4) {
        val inflow = e
          .join(pr.select($"id".as("src"), expr("pr div outdeg").as("c")), "src")
          .groupBy($"dst".as("id")).agg(sum($"c").as("inflow"))
        pr = pr.drop($"pr")
          .join(inflow, Seq("id"), "left")
          .select($"id", $"outdeg", $"n",
            (expr(s"(15 * ($unit div n)) div 100") +
              expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
          .localCheckpoint()
      }
      pr.select($"id", $"pr".as("pr_units"))
        .orderBy($"pr_units".desc, $"id").limit(20)
    }

    // B: broadcast the rank table into the edge join (rank is O(nodes),
    // edges stay put — no shuffle of e per iteration)
    def prB(): DataFrame = {
      val e = edges.localCheckpoint()
      val deg = e.groupBy($"src".as("id")).agg(count(lit(1)).as("outdeg"))
      val n = deg.agg(count(lit(1)).as("n"))
      var pr = deg.crossJoin(broadcast(n))
        .select($"id", $"outdeg", $"n", expr(s"$unit div n").as("pr"))
        .localCheckpoint()
      for (_ <- 1 to 4) {
        val inflow = e
          .join(broadcast(pr.select($"id".as("src"), expr("pr div outdeg").as("c"))), "src")
          .groupBy($"dst".as("id")).agg(sum($"c").as("inflow"))
        pr = pr.drop($"pr")
          .join(inflow, Seq("id"), "left")
          .select($"id", $"outdeg", $"n",
            (expr(s"(15 * ($unit div n)) div 100") +
              expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
          .localCheckpoint()
      }
      pr.select($"id", $"pr".as("pr_units"))
        .orderBy($"pr_units".desc, $"id").limit(20)
    }

    // C: B + lazy checkpoints (one job; lineage still truncated on
    // materialization)
    def prC(): DataFrame = {
      val e = edges.localCheckpoint()
      val deg = e.groupBy($"src".as("id")).agg(count(lit(1)).as("outdeg"))
      val n = deg.agg(count(lit(1)).as("n"))
      var pr = deg.crossJoin(broadcast(n))
        .select($"id", $"outdeg", $"n", expr(s"$unit div n").as("pr"))
        .localCheckpoint(eager = false)
      for (_ <- 1 to 4) {
        val inflow = e
          .join(broadcast(pr.select($"id".as("src"), expr("pr div outdeg").as("c"))), "src")
          .groupBy($"dst".as("id")).agg(sum($"c").as("inflow"))
        pr = pr.drop($"pr")
          .join(inflow, Seq("id"), "left")
          .select($"id", $"outdeg", $"n",
            (expr(s"(15 * ($unit div n)) div 100") +
              expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
          .localCheckpoint(eager = false)
      }
      pr.select($"id", $"pr".as("pr_units"))
        .orderBy($"pr_units".desc, $"id").limit(20)
    }

    time("pagerank A current")(prA())
    time("pagerank B bcast-rank")(prB())
    time("pagerank C bcast+lazy")(prC())
    // equivalence check: hash of all three results must match
    def h(df: DataFrame): String = df.collect().map(_.toString).mkString("|")
    val (a, b, c) = (h(prA()), h(prB()), h(prC()))
    println(s"OPTLAB pagerank equal: AB=${a == b} AC=${a == c}")
  }
}

/** Access shim: QueryPack.runToMemory is protected; expose it for lab
  * experiments only. */
private object LabBridge extends QueryPack {
  def queries = Map.empty
  def oracles = Map.empty
  def runToMem(df: DataFrame, mode: String, parts: Int): DataFrame =
    runToMemory(df, mode, parts)
}
