package graft.queries

import graft.SparkSpec
import graft.multimodal.MultimodalOps

/** Unit coverage for the curation/audio paths beyond what the oracle gate
  * proves: the Bloom prefilter must actually PRUNE (the gate only proves
  * the final answer is right — a bloom that flagged every row as a
  * candidate would still pass it), and the WAV codec must round-trip
  * adversarial sample values the planted waveform never reaches.
  */
class CurationSpec extends SparkSpec {

  test("WAV codec round-trips extreme and boundary samples exactly") {
    val cases = Seq(
      Array(0, 1, -1, 32767, -32768, 12345, -12345),
      Array(32767, 32767, -32768, -32768),
      Array(0),
      Array.tabulate(1000)(i => (i * 37 - 500) % 32768))
    for (xs <- cases) {
      val decoded = MultimodalOps.decodeWav(MultimodalOps.encodeWav(xs))
      assert(decoded.toSeq == xs.toSeq, s"roundtrip failed for ${xs.take(8).toSeq}")
    }
  }

  private def checkProp(prop: org.scalacheck.Prop): Unit = {
    import org.scalacheck.{Test => ScTest}
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("WAV codec round-trips arbitrary 16-bit sample arrays (property)") {
    import org.scalacheck.{Gen, Prop}
    val samples = Gen.nonEmptyListOf(Gen.chooseNum(-32768, 32767))
    checkProp(Prop.forAll(samples) { xs =>
      val arr = xs.toArray
      MultimodalOps.decodeWav(MultimodalOps.encodeWav(arr)).toSeq == arr.toSeq
    })
  }

  test("weighted systematic sampling: bounded count, exact when no heavy item") {
    // the crossing rule selects a row iff its cumulative interval
    // contains >= 1 multiple of total/k, so the count is ALWAYS in
    // [1, k] — and exactly k when every weight < total/k (a heavier
    // item absorbs several crossing points into one selected row,
    // the standard systematic-PPS behavior)
    import org.scalacheck.{Gen, Prop}
    val weights = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n * 10, Gen.chooseNum(1L, 1000L)))
    checkProp(Prop.forAll(weights) { ws =>
      val k = 10L
      val total = ws.sum
      val cums = ws.scanLeft(0L)(_ + _).tail
      val selected = cums.zip(0L +: cums.dropRight(1)).count {
        case (cum, prev) => cum * k / total > prev * k / total
      }
      val noHeavy = ws.forall(_ * k < total)
      selected >= 1 && selected <= k && (!noHeavy || selected == k)
    })
  }

  test("planted waveform features match a direct recompute") {
    val n = MultimodalOps.plantedSampleCount(553)
    assert(n == 160 + 553 % 128)
    val xs = Array.tabulate(n)(MultimodalOps.plantedSample(42L, _))
    val decoded = MultimodalOps.decodeWav(MultimodalOps.encodeWav(xs))
    assert(decoded.toSeq == xs.toSeq)
  }

  test("compaction collapses the file count without changing content") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    // running the query writes both layouts and returns the compacted rows
    val rows = SourceQueries.queries("q_source_compaction")(s, d).count()
    def dataFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    val small = dataFiles(s"${SourceQueries.compactDir}/small")
    val big = dataFiles(s"${SourceQueries.compactDir}/big")
    assert(rows > 0)
    assert(small >= 32, s"fragmented copy should have many files, got $small")
    assert(big == 1, s"compacted copy should be one file, got $big")
  }

  test("bloom prefilter: no false negatives, few false positives") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(s, d)
    val block = docs.filter($"doc_id" % 11 === 0)
    val blockTexts = block.select($"text").distinct().as[String].collect().toSet
    val probed = CurationQueries.bloomProbe(docs, block)
      .select($"doc_id", $"text", $"cand")
      .collect()
    // no false negatives: every row whose text IS blocklisted must be a
    // candidate (a miss here would leak a blocked doc into the survivors)
    assert(probed.filter(r => blockTexts(r.getString(1))).forall(_.getBoolean(2)))
    // pruning contract: candidates beyond the true matches are Bloom false
    // positives; at m=4096/k=3 with a ~10-text blocklist the expected fp
    // count is << 1% of the corpus
    val fps = probed.count(r => r.getBoolean(2) && !blockTexts(r.getString(1)))
    assert(fps <= probed.length / 100,
      s"bloom stopped pruning: $fps false positives of ${probed.length} rows")
  }
}
