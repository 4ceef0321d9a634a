package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the tokenizer-training
  * pass of an LLM data pipeline, expressed as vocabulary-sized dataflow.
  *
  * Classic BPE (Sennrich et al. 2016, public): start from words split
  * into characters, repeatedly merge the most frequent adjacent symbol
  * pair. The scale-critical property (the original paper's own trick) is
  * that after ONE corpus pass that counts distinct words, every
  * iteration runs on the word VOCABULARY weighted by frequency — at
  * 100 TB the corpus is touched once and the per-round working set is
  * vocab-sized (millions of rows, not trillions), shuffling only
  * (pair, count) aggregates.
  *
  * Determinism contract (what makes this oracle-checkable cross-engine):
  *   - words = `[a-z]+` runs of the lowercased text (ASCII-only, so no
  *     engine-specific Unicode segmentation is involved);
  *   - pair counts are exact integers; the merge winner is the
  *     lexicographically-least (lhs, rhs) among maximal counts;
  *   - a word's symbol state is a single-space-joined string with
  *     leading/trailing sentinels (" l o w "), and a merge is applied as
  *     TWO `replace(' lhs rhs ', ' lhsrhs ')` passes. `replace` scans
  *     left-to-right non-overlapping in both engines; the second pass
  *     catches the odd-run stagger (" a a a a " → " aa a a " → " aa aa ")
  *     so runs up to length 5 merge exactly as leftmost-first BPE; longer
  *     same-symbol runs may keep a trailing unmerged pair for one round —
  *     a documented approximation applied identically in both engines.
  *
  * Each round materializes via `localCheckpoint` to keep the iteration's
  * lineage flat (same discipline as [[Graph.pageRank]]); the 1-row
  * winner is broadcast, so a round costs one vocab-sized aggregate plus
  * a map — no driver-side collect of data rows.
  */
object Bpe {

  /** " l o w " — char-split with sentinel spaces. Spark spells the
    * backreference `$1` (Java regex), DuckDB `\1` with the 'g' flag. */
  private val reprSpark = "concat(' ', regexp_replace(word, '(.)', '$1 '))"

  private val mergeExpr =
    "replace(replace(repr, concat(' ', lhs, ' ', rhs, ' '), concat(' ', lhs, rhs, ' ')), " +
      "concat(' ', lhs, ' ', rhs, ' '), concat(' ', lhs, rhs, ' '))"

  /** Train `rounds` merges over `docs(text)`. Returns one row per round:
    * (round, lhs, rhs, freq, token). If the pair universe drains before
    * `rounds` (toy corpora), later rounds emit nothing — identically in
    * the oracle (an empty argmax empties the cross join). */
  def train(docs: DataFrame, rounds: Int = 8): DataFrame = {
    val words = docs
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .selectExpr("cnt", s"$reprSpark as repr")

    var w = words.localCheckpoint()
    val merges = (1 to rounds).map { k =>
      val top = w
        .select(col("cnt"), expr("split(trim(repr), ' ')").as("s"))
        .filter(expr("size(s) >= 2"))
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> struct(element_at(s, i) as lhs, element_at(s, i + 1) as rhs))")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("cnt").as("freq"))
        .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .localCheckpoint()
      if (k < rounds)
        w = w.crossJoin(broadcast(top.select("lhs", "rhs")))
          .selectExpr("cnt", s"$mergeExpr as repr")
          .localCheckpoint()
      top.select(lit(k.toLong).as("round"), col("lhs"), col("rhs"), col("freq"))
    }
    merges.reduce(_.union(_))
      .withColumn("token", concat(col("lhs"), col("rhs")))
  }

  /** DuckDB mirror: the identical iteration unrolled as CTEs (the
    * [[Graph.pageRank]] oracle pattern). */
  def trainSql(rounds: Int = 8, table: String = "documents"): String = {
    val sb = new StringBuilder
    sb ++= s"with v as (select word, cast(count(*) as bigint) as cnt from " +
      s"(select unnest(regexp_extract_all(lower(text), '[a-z]+')) as word from $table) t " +
      "group by word), "
    sb ++= "w0 as (select cnt, concat(' ', regexp_replace(word, '(.)', '\\1 ', 'g')) as repr from v)"
    for (k <- 1 to rounds) {
      sb ++= s", p$k as (select s[i] as lhs, s[i + 1] as rhs, cast(sum(cnt) as bigint) as freq " +
        s"from (select cnt, s, unnest(generate_series(1, len(s) - 1)) as i " +
        s"from (select cnt, string_split(trim(repr), ' ') as s from w${k - 1}) t1 " +
        "where len(s) >= 2) t2 group by 1, 2)"
      sb ++= s", m$k as (select lhs, rhs, freq from p$k order by freq desc, lhs asc, rhs asc limit 1)"
      if (k < rounds)
        sb ++= s", w$k as (select cnt, " +
          "replace(replace(repr, ' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' '), " +
          "' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' ') as repr " +
          s"from w${k - 1} cross join m$k)"
    }
    sb ++= " select round, lhs, rhs, freq, lhs||rhs as token from ("
    sb ++= (1 to rounds)
      .map(k => s"select cast($k as bigint) as round, lhs, rhs, freq from m$k")
      .mkString(" union all ")
    sb ++= ") u"
    sb.toString
  }
}
