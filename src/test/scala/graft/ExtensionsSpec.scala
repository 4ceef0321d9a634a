package graft

import org.apache.spark.sql.SparkSession

/** The custom function family resolves from SQL via both registration
  * paths (session registry, and SparkSessionExtensions when this JVM
  * doesn't already hold a session). */
class ExtensionsSpec extends SparkSpec {

  test("custom function family resolves from SQL") {
    // extensions only apply at session creation; under a shared test JVM
    // fall back to the registry path — both consume GraftFunctions.all
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    val r = s.sql(
      """select rolling_hash('abc') as rh,
        | sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 9L)) as ic,
        | size(char_trigram_codes('hello')) as tc""".stripMargin).collect().head
    val exp = ((('a' * 263L + 'b') % 1000000007L) * 263L + 'c') % 1000000007L
    assert(r.getLong(0) == exp)
    assert(r.getLong(1) == 2L)
    assert(r.getInt(2) == 3)
  }

  test("extensions inject the full function table") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // must not throw; table is shared
    assert(graft.functions.GraftFunctions.all.map(_._1).toSet ==
      Set("rolling_hash", "sorted_intersect_count", "sorted_jaccard",
        "char_trigram_codes", "chain_dot", "cody_erfc", "winnow_sel",
        "sorted_dot_fp", "repetition_stats", "double_sort_bucket"))
  }
}
