package graft.sources

import org.apache.spark.sql.SparkSession

/** Gate-start testdata schema pre-flight.
  *
  * The driver regenerates `/root/testdata` between rounds and the
  * physical types can drift (round 5: `events.ts` flipped
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and 25 queries failed analysis
  * with opaque per-query errors). This check runs BEFORE any query and
  * compares every table's post-[[Tables.read]] schema — the normalized
  * relation all queries and oracles were written against — to the
  * checked-in expectation below, so the next silent regeneration change
  * is ONE diagnostic naming the table.column that moved instead of a
  * red wall.
  *
  * Expectations are on the NORMALIZED schema (after `normalizeTs`), so
  * physical timestamp encodings the reader already absorbs don't
  * false-positive: `events.ts` must arrive as BIGINT epoch-nanos
  * whatever the file stores, and the date columns accept either
  * timestamp flavor (both behave identically under the UTC session the
  * gates run with). Extra columns are allowed (additive regeneration is
  * not drift); missing or retyped columns are not.
  */
object Preflight {

  private val eitherTs = Set("timestamp", "timestamp_ntz")

  /** table → (column → acceptable Catalyst simpleStrings). */
  private val expect: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> eitherTs, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> eitherTs),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> Set("bigint"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** One line per divergence; empty = green. Never throws — unreadable
    * tables become diagnostics too. */
  def diagnose(spark: SparkSession, sfDir: String): Seq[String] =
    expect.flatMap { case (t, cols) =>
      try {
        val actual = Tables.read(spark, sfDir, t).schema
          .map(f => f.name -> f.dataType.simpleString).toMap
        cols.flatMap { case (c, want) =>
          actual.get(c) match {
            case None =>
              Seq(s"$t.$c: MISSING (expected ${want.mkString("|")})")
            case Some(got) if !want.contains(got) =>
              Seq(s"$t.$c: $got (expected ${want.mkString("|")})")
            case _ => Nil
          }
        }
      } catch {
        case e: Throwable =>
          Seq(s"$t: unreadable (${e.getClass.getSimpleName}: ${e.getMessage})")
      }
    }

  /** Hard gate: throws with every divergence in the message. */
  def check(spark: SparkSession, sfDir: String): Unit = {
    val d = diagnose(spark, sfDir)
    if (d.nonEmpty) throw new IllegalStateException(
      "TESTDATA SCHEMA PRE-FLIGHT FAILED — the fixture regeneration moved " +
        "types the queries were written against:\n  " + d.mkString("\n  "))
  }
}
