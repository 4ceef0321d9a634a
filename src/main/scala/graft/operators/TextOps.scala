package graft.operators

import graft.oracle.Parity.{Dialect, DuckD, SparkD}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token stats, quality
  * scoring, fingerprinting (builder north star, SURVEY.md §7.6). All
  * built from codegen'd built-ins — per-row, embarrassingly parallel, no
  * shuffle.
  *
  * The snippet builders are dialect-parameterized so the Spark plan and
  * the DuckDB oracle evaluate the *same arithmetic*: token counts and
  * ratios are exact integer ratios → bit-deterministic, no rounding.
  */
object TextOps {

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is", "data", "value", "fast")

  /** Per-document token statistics + quality ratios, one SQL snippet per
    * output column (join with "," for the oracle; feed to selectExpr for
    * Spark). Tokenization = split on single space after trim (empties
    * from runs of spaces count identically in both engines). */
  def statsSelects(d: Dialect): Seq[String] = {
    val (split, len, distinct, filt) = d match {
      case SparkD => ("split", "size", "array_distinct", "filter")
      case DuckD  => ("string_split", "len", "list_distinct", "list_filter")
    }
    val toks = s"$split(trim(text), ' ')"
    val nTok = s"$len($toks)"
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    val sumLen = s"(length(trim(text)) - ($nTok - 1))"
    Seq(
      "doc_id", "lang", "source",
      "cast(length(text) as bigint) as n_chars_m",
      s"cast($nTok as bigint) as n_tokens",
      s"cast($len($distinct($toks)) as bigint) as n_distinct",
      s"cast($sumLen as bigint) as sum_token_len",
      s"(cast($sumLen as double) / cast($nTok as double)) as avg_token_len",
      s"(cast($len($distinct($toks)) as double) / cast($nTok as double)) as ttr",
      s"(cast($len($filt($toks, t -> t in ($stopList))) as double) / cast($nTok as double)) as stop_ratio")
  }

  /** Composite quality score in [0,1]: length band + lexical diversity +
    * stopword presence, over the [[statsSelects]] columns. Pure rational
    * arithmetic on exact ratios — deterministic. */
  def qualityExpr: String =
    "(least(1e0, cast(n_chars_m as double) / 4e2) * 4e-1" +
      " + least(1e0, ttr * 2e0) * 3e-1" +
      " + least(1e0, stop_ratio * 1e1) * 3e-1)"

  /** Spark side of [[statsSelects]] — same snippets by construction. */
  def stats(docs: DataFrame): DataFrame =
    docs.selectExpr(statsSelects(SparkD): _*)

  /** BPE-ish sub-word tokenization: the classic pre-tokenizer regex
    * (letter runs | digit runs | single non-alphanumeric), counted via
    * regexp_extract_all — identical simple-class pattern semantics in
    * Java and RE2 regex engines. */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def bpeSelects: Seq[String] = Seq(
    "doc_id",
    s"cast(size(regexp_extract_all(text, '$bpePattern', 0)) as bigint) as n_bpe",
    s"cast(size(array_distinct(regexp_extract_all(text, '$bpePattern', 0))) as bigint) as n_bpe_distinct")

  def bpeTokens(docs: DataFrame): DataFrame = docs.selectExpr(bpeSelects: _*)

  def bpeSql(table: String = "documents"): String =
    s"""select doc_id,
       | cast(len(regexp_extract_all(text, '$bpePattern', 0)) as bigint) as n_bpe,
       | cast(len(list_distinct(regexp_extract_all(text, '$bpePattern', 0))) as bigint) as n_bpe_distinct
       |from $table""".stripMargin.replace("\n", " ")

  /** Language-ID by stopword-profile scoring: score(lang) = fraction of
    * tokens in that language's function-word list; prediction = argmax
    * with alphabetical tie-break. The classic cheap n-gram/stopword
    * heuristic — deterministic exact ratios, dialect-shared. (The
    * synthetic corpus uses one shared vocabulary across langs, so the
    * scorer's value here is the oracle-checked mechanics, not accuracy.) */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "no", "por", "los"),
    "fr" -> Seq("le", "la", "et", "un", "que", "pour", "dans", "ce", "une", "sur"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "就", "不", "人"))

  def langIdSelects(d: Dialect): Seq[String] = {
    val (split, len, filt) = d match {
      case SparkD => ("split", "size", "filter")
      case DuckD  => ("string_split", "len", "list_filter")
    }
    val toks = s"$split(trim(text), ' ')"
    val scores = langProfiles.map { case (lg, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      s"(cast($len($filt($toks, t -> t in ($list))) as double) / cast($len($toks) as double)) as s_$lg"
    }
    Seq("doc_id", "lang") ++ scores
  }

  /** argmax over the s_<lang> columns, alphabetical tie-break. */
  def langPredExpr: String = {
    val m = langProfiles.map { case (lg, _) => s"s_$lg" }.mkString("greatest(", ", ", ")")
    val cases = langProfiles.map { case (lg, _) => s"when s_$lg = $m then '$lg'" }
    s"(case ${cases.mkString(" ")} end)"
  }

  def langId(docs: DataFrame): DataFrame =
    docs.selectExpr(langIdSelects(SparkD): _*)
      .withColumn("pred_lang", expr(langPredExpr))
      .withColumn("is_correct", col("pred_lang") === col("lang"))

  /** Content fingerprint of whitespace-trimmed text (md5 — identical hex
    * in both engines) plus UTF-8 byte length. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(trim(col("text"))).as("fingerprint"),
      octet_length(col("text")).cast("long").as("n_bytes"))
}
