package graft.queries

import graft.SparkSpec

/** Invariants of the assembly pack that the sf0.01 hash oracle cannot
  * express: the packing contract (budget respected, bins contiguous,
  * oversized docs isolated) and full chunk coverage of every token.
  */
class AssemblySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sequence packing: budget respected, bins contiguous, docs partitioned") {
    val rows = AssemblyQueries.queries("q_pack_sequences")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    // every doc exactly once
    assert(rows.map(_._1).distinct.length == rows.length)

    val budget = 128L
    rows.groupBy(r => (r._2, r._3)).foreach { case ((shard, seq), bin) =>
      val total = bin.map(_._4).sum
      // a bin only exceeds the budget when a single oversized doc owns it
      assert(total <= budget || bin.length == 1,
        s"shard=$shard seq=$seq holds ${bin.length} docs, $total tokens")
    }

    // within a shard, seq ids start at 0 and are contiguous in doc order,
    // and greedy NEVER rolls early: merging a bin's first doc into the
    // previous bin would have overflowed the budget
    rows.groupBy(_._2).foreach { case (shard, inShard) =>
      val byDoc = inShard.sortBy(_._1)
      assert(byDoc.head._3 == 0L, s"shard $shard starts at seq ${byDoc.head._3}")
      byDoc.sliding(2).foreach {
        case Array((_, _, s1, _), (_, _, s2, _)) =>
          assert(s2 == s1 || s2 == s1 + 1, s"shard $shard jumps $s1 -> $s2")
        case _ =>
      }
      val fills = byDoc.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
      byDoc.sliding(2).foreach {
        case Array((_, _, s1, _), (_, _, s2, nt2)) if s2 == s1 + 1 =>
          assert(fills(s1) + nt2 > budget,
            s"shard $shard rolled to $s2 although ${fills(s1)} + $nt2 fits")
        case _ =>
      }
    }
  }

  test("sliding chunks: every token covered, stride/window respected") {
    val s = spark
    import s.implicits._
    val docLens = graft.Tables.documents(spark, sf)
      .select($"doc_id", org.apache.spark.sql.functions.size(
        graft.llm.TextOps.words($"text")).cast("long").as("nt"))
      .as[(Long, Long)].collect().toMap

    val chunks = AssemblyQueries.queries("q_chunk_sliding")(spark, sf)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_tok")
      .as[(Long, Long, Long, Long)].collect()

    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val nt = docLens(doc)
      val sorted = cs.sortBy(_._3)
      // starts are 1, 17, 33, ... and the last start still lands in-doc
      sorted.zipWithIndex.foreach { case ((_, idx, start, n), i) =>
        assert(idx == i && start == 1 + 16L * i, s"doc $doc start $start at $i")
        assert(n == math.min(32L, nt - start + 1), s"doc $doc chunk $i len $n")
      }
      // coverage: last chunk reaches the final token
      val (_, _, lastStart, lastN) = sorted.last
      assert(lastStart + lastN - 1 == nt, s"doc $doc tail uncovered")
    }
  }

  test("redaction removes every planted email and ip") {
    val s = spark
    import s.implicits._
    val out = AssemblyQueries.queries("q_text_redact")(spark, sf)
      .select($"n_emails", $"n_ips", $"redacted").as[(Long, Long, String)].collect()
    out.foreach { case (ne, ni, red) =>
      assert(ne >= 1 && ni >= 1)
      assert(!red.contains("@") && red.contains("<EMAIL>") && red.contains("<IP>"))
      assert(!"""([0-9]{1,3}\.){3}[0-9]{1,3}""".r.findFirstIn(red).isDefined)
    }
  }
}
