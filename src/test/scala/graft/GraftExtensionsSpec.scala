package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The plugin surface: a session built with
  * spark.sql.extensions=graft.GraftExtensions must expose every graft
  * function to pure SQL with no Scala registration calls. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("all graft functions resolve in SQL on an extensions-configured session") {
    // share the JVM's SparkContext but CREATE a distinct session so the
    // extensions actually apply (getOrCreate would return the shared
    // session, silently ignoring withExtensions)
    SparkSpec.session // ensure the shared context exists; create() reuses it
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .create()
    // NOTE: never s2.stop() here — it would stop the SHARED SparkContext
    // and kill every later suite; the extra session is harmless.
    val row = s2.sql(
      """SELECT
          |  web_mercator(CAST(-79.5857 AS DOUBLE), CAST(34.2655 AS DOUBLE)).x AS mx,
          |  size(kgram_hashes('abcdef', 3)) AS nk,
          |  dot_product(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
          |              array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS dp,
          |  sorted_jaccard(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
          |                 array(CAST(2 AS BIGINT), CAST(3 AS BIGINT))) AS j,
          |  simhash64(array(CAST(7 AS BIGINT))) AS sh,
          |  size(minhash_signature(array(CAST(7 AS BIGINT)), 8)) AS nm,
          |  size(shingle_hashes('a b c d', 3)) AS ns,
          |  size(word_hashes('a b c')) AS nw
          |""".stripMargin).head()
    assert(row.getDouble(0) == functions.WebMercator.R * -79.5857 * math.Pi / 180.0)
    assert(row.getInt(1) == 4)
    assert(row.getDouble(2) == 11.0)
    assert(row.getDouble(3) == 1.0 / 3.0)
    assert(row.getLong(4) == 7L)
    assert(row.getInt(5) == 8)
    assert(row.getInt(6) == 2)
    assert(row.getInt(7) == 3)
    // generator through pure SQL too
    val n = s2.sql(
      "SELECT explode_track(array(named_struct('a', 1), named_struct('a', 2)))").count()
    assert(n == 2)
  }
}
