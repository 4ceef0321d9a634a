package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding — tokenizer TRAINING and ENCODING as
  * vocabulary-sized dataflow (the tokenizer loop of an LLM data
  * pipeline).
  *
  * Classic BPE (Sennrich et al. 2016, public): start from words split
  * into characters, repeatedly merge the most frequent adjacent symbol
  * pair. The scale-critical property (the original paper's own trick) is
  * that after ONE corpus pass that counts distinct words, every
  * iteration runs on the word VOCABULARY weighted by frequency — at
  * 100 TB the corpus is touched once and the per-round working set is
  * vocab-sized (millions of rows, not trillions), shuffling only
  * (pair, count) aggregates. Encoding then joins the corpus word stream
  * against the trained word→symbols map — AQE broadcasts it while it
  * fits, shuffle-joins beyond that.
  *
  * Determinism contract (what makes this oracle-checkable cross-engine):
  *   - words = `[a-z]+` runs of the lowercased text (ASCII-only, so no
  *     engine-specific Unicode segmentation is involved);
  *   - pair counts are exact integers; the merge winner is the
  *     lexicographically-least (lhs, rhs) among maximal counts;
  *   - a word's symbol state is a single-space-joined string with
  *     leading/trailing sentinels (" l o w "), and a merge is applied
  *     EXACTLY leftmost-first via the doubled-separator trick: double
  *     every space, replace " lhs  rhs " with " lhsrhs ", undouble.
  *     `replace` scans left-to-right non-overlapping in both engines,
  *     and because the doubled delimiter lends one space to each of two
  *     adjacent matches, the scan resumes exactly at the next symbol
  *     boundary — no stagger: " a a a a a a a " merges to
  *     " aa aa aa a ", precisely what reference BPE's regex-sub apply
  *     produces on arbitrary-length same-symbol runs.
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

  /** Leftmost-first merge: the 5-char pattern " lhs rhs " would CONSUME
    * the shared delimiter and stagger the scan past the next occurrence
    * (" a a a a " → " aa a a "). Doubling the separators first makes
    * every delimiter two spaces; the pattern takes one space from each
    * side, the replacement restores them, and the leftover space of a
    * shared delimiter starts the next match — an exact emulation of
    * reference BPE's non-overlapping regex sub. All result delimiters
    * are exactly two spaces, so the final undouble restores the
    * single-space form losslessly. */
  private val mergeExpr =
    "replace(replace(replace(repr, ' ', '  '), " +
      "concat(' ', lhs, '  ', rhs, ' '), concat(' ', lhs, rhs, ' ')), '  ', ' ')"

  private def wordVocab(docs: DataFrame): DataFrame = docs
    .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
    .groupBy("word").agg(count(lit(1)).as("cnt"))
    .selectExpr("word", "cnt", s"$reprSpark as repr")

  /** One training round: (winning merge, vocab with the merge applied). */
  private def step(w: DataFrame): (DataFrame, DataFrame) = {
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
    val applied = w.crossJoin(broadcast(top.select("lhs", "rhs")))
      .selectExpr("word", "cnt", s"$mergeExpr as repr")
      .localCheckpoint()
    (top, applied)
  }

  /** Train `rounds` merges over `docs(text)`. Returns one row per round:
    * (round, lhs, rhs, freq, token). If the pair universe drains before
    * `rounds` (toy corpora), later rounds emit nothing — identically in
    * the oracle (an empty argmax empties the cross join). */
  def train(docs: DataFrame, rounds: Int = 8): DataFrame = {
    var w = wordVocab(docs).localCheckpoint()
    val merges = (1 to rounds).map { k =>
      val (top, applied) = step(w)
      w = applied
      top.select(lit(k.toLong).as("round"), col("lhs"), col("rhs"), col("freq"))
    }
    merges.reduce(_.union(_))
      .withColumn("token", concat(col("lhs"), col("rhs")))
  }

  /** The trained word→symbols map after `rounds` merges. */
  def vocab(docs: DataFrame, rounds: Int = 8): DataFrame = {
    var w = wordVocab(docs).localCheckpoint()
    for (_ <- 1 to rounds) w = step(w)._2
    w
  }

  /** ENCODE the corpus with the trained tokenizer: per document, the
    * word count and the post-merge token (symbol) count — the
    * token-budget accounting every training-mix plan needs at the real
    * tokenizer's granularity, not whitespace's. The corpus word stream
    * joins the vocab map on `word`; no hint, so AQE broadcasts a small
    * vocab and degrades to a shuffle join when the vocabulary outgrows
    * it. Documents with no `[a-z]+` word have no tokens and are absent
    * (the oracle's unnest of an empty list agrees). */
  def encode(docs: DataFrame, rounds: Int = 8): DataFrame = {
    val v = vocab(docs, rounds)
      .selectExpr("word", "cast(size(split(trim(repr), ' ')) as bigint) as n_sym")
    docs
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .join(v, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_tokens"))
  }

  /** APPLY the trained tokenizer: per document, the ordered subword
    * token STREAM — (doc_id, word_idx, sym_idx, token) — the actual
    * rollout a downstream training job consumes, not just the count.
    * The corpus word stream joins the trained word→symbols map (AQE
    * broadcasts while the vocabulary fits, shuffle-joins beyond), and
    * both position axes come from generators — no extra shuffle beyond
    * the vocab join. With the round-5 leftmost-first merge contract the
    * emitted segmentation matches reference BPE exactly. */
  def applyTokens(docs: DataFrame, rounds: Int = 8): DataFrame = {
    val v = vocab(docs, rounds).select("word", "repr")
    docs
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .as(Seq("word_idx", "word")))
      .join(v, "word")
      .select(col("doc_id"), col("word_idx").cast("long").as("word_idx"),
        posexplode(expr("split(trim(repr), ' ')")).as(Seq("sym_idx", "token")))
      .select(col("doc_id"), col("word_idx"),
        col("sym_idx").cast("long").as("sym_idx"), col("token"))
  }

  /** DuckDB mirror of [[applyTokens]] — scalar generate_series + unnest
    * for both position axes (the chunkSql pattern: DuckDB's
    * table-function generate_series rejects lateral column args). */
  def applyTokensSql(rounds: Int = 8, table: String = "documents"): String =
    ctePrefix(rounds, table) +
      s", dw as (select doc_id, unnest(generate_series(1, len(ws))) as wi, ws" +
      s" from (select doc_id, regexp_extract_all(lower(text), '[a-z]+') as ws from $table) t0)" +
      ", dwo as (select doc_id, cast(wi - 1 as bigint) as word_idx, ws[wi] as word from dw)" +
      s", tok as (select doc_id, word_idx, unnest(generate_series(1, len(ss))) as si, ss" +
      s" from (select doc_id, word_idx, string_split(trim(repr), ' ') as ss" +
      s"  from dwo join w$rounds using (word)) t1)" +
      " select doc_id, word_idx, cast(si - 1 as bigint) as sym_idx, ss[si] as token from tok"

  /** Tokenizer FERTILITY audit: per language, tokens-per-word and
    * chars-per-token under the trained tokenizer — the standard
    * cross-lingual tokenizer-quality report (a language whose fertility
    * is 2× pays 2× the sequence length for the same text; public
    * metric, e.g. the XLM-R/BLOOM tokenizer analyses). Exact integer
    * totals; the two ratios are single IEEE divisions of exact BIGINTs,
    * so the report hash-checks cross-engine. Same plan physics as
    * [[encode]] (word stream ⋈ vocab, AQE picks the join strategy),
    * collapsing map-side to one row per language. */
  def fertility(docs: DataFrame, rounds: Int = 8): DataFrame = {
    val v = vocab(docs, rounds)
      .selectExpr("word", "cast(size(split(trim(repr), ' ')) as bigint) as n_sym")
    docs
      .select(col("lang"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .join(v, "word")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_tokens"),
        sum(expr("cast(char_length(word) as bigint)")).as("n_chars"))
      .withColumn("fertility",
        expr("cast(n_tokens as double) / cast(n_words as double)"))
      .withColumn("chars_per_token",
        expr("cast(n_chars as double) / cast(n_tokens as double)"))
  }

  /** DuckDB mirror of [[fertility]]. */
  def fertilitySql(rounds: Int = 8, table: String = "documents"): String =
    ctePrefix(rounds, table) +
      s", dw as (select lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) as word from $table)" +
      s", vs as (select word, cast(len(string_split(trim(repr), ' ')) as bigint) as n_sym from w$rounds)" +
      " select lang, n_words, n_tokens, n_chars," +
      " cast(n_tokens as double) / cast(n_words as double) as fertility," +
      " cast(n_chars as double) / cast(n_tokens as double) as chars_per_token from (" +
      " select lang, cast(count(*) as bigint) as n_words, cast(sum(n_sym) as bigint) as n_tokens," +
      " cast(sum(length(dw.word)) as bigint) as n_chars" +
      " from dw join vs on dw.word = vs.word group by lang) t"

  /** Shared CTE prefix: v (word counts), w0 (char split), then per round
    * k the pair counts p_k, winner m_k, and applied vocab w_k. */
  private def ctePrefix(rounds: Int, table: String): String = {
    val sb = new StringBuilder
    sb ++= s"with v as (select word, cast(count(*) as bigint) as cnt from " +
      s"(select unnest(regexp_extract_all(lower(text), '[a-z]+')) as word from $table) t " +
      "group by word), "
    sb ++= "w0 as (select word, cnt, concat(' ', regexp_replace(word, '(.)', '\\1 ', 'g')) as repr from v)"
    for (k <- 1 to rounds) {
      sb ++= s", p$k as (select s[i] as lhs, s[i + 1] as rhs, cast(sum(cnt) as bigint) as freq " +
        s"from (select cnt, s, unnest(generate_series(1, len(s) - 1)) as i " +
        s"from (select cnt, string_split(trim(repr), ' ') as s from w${k - 1}) t1 " +
        "where len(s) >= 2) t2 group by 1, 2)"
      sb ++= s", m$k as (select lhs, rhs, freq from p$k order by freq desc, lhs asc, rhs asc limit 1)"
      sb ++= s", w$k as (select word, cnt, " +
        "replace(replace(replace(repr, ' ', '  '), " +
        "' '||lhs||'  '||rhs||' ', ' '||lhs||rhs||' '), '  ', ' ') as repr " +
        s"from w${k - 1} cross join m$k)"
    }
    sb.toString
  }

  /** DuckDB mirror of [[train]]: the identical iteration unrolled as
    * CTEs (the [[Graph.pageRank]] oracle pattern). */
  def trainSql(rounds: Int = 8, table: String = "documents"): String =
    ctePrefix(rounds, table) +
      " select round, lhs, rhs, freq, lhs||rhs as token from (" +
      (1 to rounds)
        .map(k => s"select cast($k as bigint) as round, lhs, rhs, freq from m$k")
        .mkString(" union all ") + ") u"

  /** DuckDB mirror of [[encode]]. */
  def encodeSql(rounds: Int = 8, table: String = "documents"): String =
    ctePrefix(rounds, table) +
      s", dw as (select doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) as word from $table)" +
      s", vs as (select word, cast(len(string_split(trim(repr), ' ')) as bigint) as n_sym from w$rounds)" +
      " select doc_id, cast(count(*) as bigint) as n_words, cast(sum(n_sym) as bigint) as n_tokens" +
      " from dw join vs on dw.word = vs.word group by doc_id"
}
