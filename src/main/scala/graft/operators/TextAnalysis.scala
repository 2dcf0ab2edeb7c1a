package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Text-analysis operators for training-data pipelines over `documents`:
  * token counting (whitespace + BPE-ish regex), quality scoring,
  * language-ID heuristic, and document fingerprinting.
  *
  * Everything is built-in `sql.functions` (codegen'd, no UDFs): at 100 TB
  * these are embarrassingly-parallel per-row maps that run entirely inside
  * whole-stage codegen with zero shuffles; only the final per-source
  * aggregations shuffle (on tiny keys).
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  /** ta2's composite quality score (TTR + stopword balance, rounded to
    * 4 dp) as a reusable column — the single definition both ta2Quality
    * and [[CorpusPipeline]]'s quality floor apply, so a threshold behaves
    * identically in analysis and filtering. */
  def qualityScore(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t)
    val nDistinct = size(array_distinct(t))
    val nStop = size(filter(t, x => x === "the" || x === "a"))
    round(nDistinct / nTok * 0.5 + (lit(1) - nStop / nTok) * 0.5, 4)
  }

  /** ta1_tokens — token counting: whitespace tokens + a BPE-ish greedy
    * regex chunking (1-3 letter chunks approximate subword counts),
    * aggregated per source. */
  def ta1Tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("source"),
        size(toks(col("text"))).as("n_tok"),
        size(regexp_extract_all(col("text"), lit("[a-zA-Z]{1,3}"), lit(0))).as("n_bpe"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        round(avg(col("n_tok")), 2).as("avg_tokens"),
        sum(col("n_bpe")).as("total_bpe_tokens"))
      .orderBy(col("source"))

  /** ta2_quality — per-document quality features: char/token counts,
    * type-token ratio, stopword ratio, mean token length, and a composite
    * score. All pure column expressions. */
  def ta2Quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("t", toks(col("text")))
      .withColumn("n_tok", size(col("t")))
      .withColumn("n_distinct", size(array_distinct(col("t"))))
      .withColumn("n_stop", size(filter(col("t"), t => t === "the" || t === "a")))
      .select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        col("n_tok"),
        round(col("n_distinct") / col("n_tok"), 4).as("ttr"),
        round(col("n_stop") / col("n_tok"), 4).as("stop_ratio"),
        round((length(col("text")) - col("n_tok") + 1) / col("n_tok"), 4).as("avg_tok_len"),
        qualityScore(col("text")).as("quality_score"))
      .orderBy(col("doc_id"))

  /** ta3_langid — language-ID heuristic: score each candidate language by
    * marker-token overlap, argmax with 'und' fallback. A real deployment
    * swaps the marker lists for char-n-gram profiles; the plumbing
    * (array_intersect against broadcast literal profiles, argmax via
    * greatest/when) is the scale-ready part — per-row, no shuffle.
    * The marker argmax is plain SQL, so the DuckDB oracle mirrors it
    * exactly (list_intersect + CASE argmax, same tie order). */
  def ta3Langid(s: SparkSession, dir: String): DataFrame =
    ta3LangidFrom(Tables.documents(s, dir))

  /** ta3 over an arbitrary documents DataFrame (`doc_id`, `text`,
    * `lang`); use [[detectLang]] when there is no claimed `lang`. */
  def ta3LangidFrom(documents: DataFrame): DataFrame =
    withDetected(documents)
      .select(col("doc_id"), col("lang").as("claimed_lang"), col("detected_lang"))
      .orderBy(col("doc_id"))

  /** The detector alone — (`doc_id`, `detected_lang`) from (`doc_id`,
    * `text`), no claimed-language column required. */
  def detectLang(documents: DataFrame): DataFrame =
    withDetected(documents).select(col("doc_id"), col("detected_lang"))

  private def withDetected(documents: DataFrame): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "is"),
      "es" -> Seq("el", "la", "de", "y", "es"),
      "fr" -> Seq("le", "la", "de", "et", "est"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "zh" -> Seq("的", "是", "了", "在", "我"))
    val d = documents.withColumn("t", array_distinct(toks(col("text"))))
    val scored = profiles.foldLeft(d) { case (df, (lang, markers)) =>
      df.withColumn(s"score_$lang",
        size(array_intersect(col("t"), typedLit(markers))))
    }
    // argmax: pick the lang whose score equals the max and wins ties by
    // profile order (deterministic)
    val maxScore = greatest(profiles.map(p => col(s"score_${p._1}")): _*)
    val detected = profiles.foldRight(lit("und")) { case ((lang, _), els) =>
      when(col(s"score_$lang") === maxScore && maxScore > 0, lit(lang)).otherwise(els)
    }
    scored.withColumn("detected_lang", detected)
  }

  /** ta4_fingerprint — document fingerprinting: md5 over whitespace- and
    * case-normalized text (the canonical "content hash" for exact-dup
    * detection across formatting variants), plus a short prefix key used
    * for sharded storage. */
  def ta4Fingerprint(s: SparkSession, dir: String): DataFrame = {
    // explicit class, not \s: Java's \s includes vertical tab (\x0B),
    // RE2's (DuckDB's) does not — the one whitespace char the two
    // engines disagree on would silently fork the fingerprint (the
    // same Java/RE2-identical-subset discipline as the PII patterns)
    val norm = trim(regexp_replace(lower(col("text")), "[ \\t\\n\\x0B\\f\\r]+", " "))
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        md5(norm).as("fingerprint"),
        substring(md5(norm), 1, 4).as("shard_key"))
      .orderBy(col("doc_id"))
  }

  /** ta5_top_ngrams — corpus n-gram statistics: top-3 word bigrams per
    * source by document frequency (deterministic lexicographic
    * tie-break). Explode → two-key count → per-group top-k window: the
    * same plan at 100 TB, with the bigram count shuffle being the only
    * wide stage. */
  def ta5TopNgrams(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_docs").desc, col("bigram"))
    Tables.documents(s, dir)
      .withColumn("toks", toks(col("text")))
      // single-token documents have no bigram: without this filter the
      // greatest(...,1) anti-descending-sequence guard emitted the lone
      // unigram as a fake "bigram", polluting per-source document
      // frequencies (the oracle mirrored the artifact, so only review
      // caught it)
      .where(size(col("toks")) >= 2)
      .select(col("source"), col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(size(toks) - 1, 1)), " +
          "i -> concat_ws(' ', slice(toks, i, 2))))")).as("bigram"))
      .groupBy(col("source"), col("bigram"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("source"), col("bigram"), col("n_docs"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** ta6_winnow — winnowing fingerprints (the MOSS scheme): hash every
    * character k-gram, slide a window of w hashes, keep each window's
    * minimum, dedupe. Robust to local edits: two documents sharing any
    * run of >= k+w-1 chars share a fingerprint. Pure per-row array
    * expressions inside codegen — the shape scales linearly. The hash is
    * md5-of-substring (lexicographic min) so the DuckDB oracle can mirror
    * it exactly; a production variant would swap in a cheaper rolling
    * hash, which is oracle-free but identical plumbing. */
  def ta6Winnow(s: SparkSession, dir: String): DataFrame = {
    val k = 8; val w = 4
    Tables.documents(s, dir)
      .withColumn("h", expr(
        s"transform(sequence(1, greatest(length(text) - $k + 1, 1)), i -> md5(substring(text, i, $k)))"))
      .withColumn("fps", array_distinct(expr(
        s"transform(sequence(1, greatest(size(h) - $w + 1, 1)), j -> array_min(slice(h, j, $w)))")))
      .select(
        col("doc_id"),
        size(col("fps")).as("n_fingerprints"),
        array_min(col("fps")).as("min_fp"))
      .orderBy(col("doc_id"))
  }

  /** ta7_repetition — Gopher-style repetition quality filters (Rae et al.
    * 2021 §A1.1, arXiv:2112.11446): documents dominated by repeated
    * n-grams are boilerplate/spam and get filtered before training. Per
    * document:
    *   - `top2_count`: occurrence count of the most frequent word bigram;
    *   - `top2_frac`: fraction of text characters covered by occurrences
    *     of that bigram (count x bigram length / doc length);
    *   - `dup5_frac`: fraction of characters in word 5-grams that occur
    *     more than once (overlapping occurrences counted, as in Gopher).
    * Pure per-row array lambdas — no shuffle, linear scan shape; the
    * within-doc distinct-x-count is O(grams^2) on docs of bounded length
    * (a production variant map-groups per doc, identical plumbing). */
  def ta7Repetition(s: SparkSession, dir: String): DataFrame =
    ta7RepetitionFrom(Tables.documents(s, dir))

  /** ta7 over an arbitrary documents DataFrame (`doc_id`, `text`). */
  def ta7RepetitionFrom(documents: DataFrame): DataFrame =
    documents
      .withColumn("t", toks(col("text")))
      .withColumn("bg", expr(
        "transform(sequence(1, greatest(size(t) - 1, 1)), i -> concat_ws(' ', slice(t, i, 2)))"))
      .withColumn("fg", expr(
        "transform(sequence(1, greatest(size(t) - 4, 1)), i -> concat_ws(' ', slice(t, i, 5)))"))
      .withColumn("top2_count", expr(
        "array_max(transform(array_distinct(bg), x -> size(filter(bg, b -> b = x))))"))
      .withColumn("top2_chars", expr(
        "array_max(transform(array_distinct(bg), x -> size(filter(bg, b -> b = x)) * length(x)))"))
      .withColumn("dup5_chars", expr(
        "aggregate(transform(array_distinct(fg), x -> IF(size(filter(fg, b -> b = x)) >= 2, " +
          "size(filter(fg, b -> b = x)) * length(x), 0)), 0, (a, v) -> a + v)"))
      .select(
        col("doc_id"),
        size(col("t")).as("n_tok"),
        col("top2_count"),
        // try_divide: an EMPTY document has length 0 and plain `/` is a
        // task-killing DIVIDE_BY_ZERO under ANSI (Spark-4 default) —
        // empty docs score NULL fractions instead (fixture docs are all
        // non-empty, so the oracle is unaffected)
        round(try_divide(col("top2_chars"), length(col("text"))), 4).as("top2_frac"),
        round(try_divide(col("dup5_chars"), length(col("text"))), 4).as("dup5_frac"))
      .orderBy(col("doc_id"))

  /** Email / phone / IPv4 patterns shared by the scrubber and its tests.
    * Plain ASCII classes + `\b` word boundaries — the syntax subset Java
    * regex and RE2 (DuckDB) interpret identically, so the oracle mirrors
    * the scrub exactly. */
  private[operators] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** US phone shapes, alternation ordered longest-first so Java and RE2
    * (both leftmost-first) pick the same match: `(415) 867-5309`,
    * 10-digit with -/./space separators, bare 10-digit, and the local
    * 7-digit `867-5309`. No capture groups (extract-all counts group 0);
    * runs on the IP-scrubbed text so dotted phones can't collide with
    * IPv4 (which needs three dots anyway). */
  private[operators] val PhoneRe =
    "\\(\\d{3}\\) ?\\d{3}[-. ]\\d{4}\\b|\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b|" +
      "\\b\\d{10}\\b|\\b\\d{3}-\\d{4}\\b"
  private[operators] val IpRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction over an arbitrary text column. Returns, IN ORDER:
    * (email count, IPv4 count, phone count, cleaned text) — the counts
    * follow the scrub order, which is emails first (so their digit-
    * bearing domains can't be half-eaten by the IP pattern), then IPs
    * (so dotted phones can't collide with them), then phones. The two
    * middle slots are both bare count Columns, so destructure against
    * THIS comment, not the type. Per-row regex maps inside codegen —
    * zero shuffle. */
  def piiScrub(text: Column): (Column, Column, Column, Column) = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp    = regexp_replace(noEmail, IpRe, "<IP>")
    val clean   = regexp_replace(noIp, PhoneRe, "<PHONE>")
    (size(regexp_extract_all(text, lit(EmailRe), lit(0))),
     size(regexp_extract_all(noEmail, lit(IpRe), lit(0))),
     size(regexp_extract_all(noIp, lit(PhoneRe), lit(0))),
     clean)
  }

  /** ta8_pii_scrub — the scrubber as a checkable query. The synthetic
    * corpus carries no PII, so the query first SEEDS each document with
    * deterministic fake contact lines derived from `doc_id` (an email,
    * all four phone shapes [[PhoneRe]] covers, an IPv4), then proves the
    * scrubber finds and redacts all of them. Counts + redacted text per
    * document. */
  def ta8PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val last4 = lpad((col("doc_id") % 10000).cast("string"), 4, "0")
    val seeded = concat(
      col("text"), lit(" reach user"), col("doc_id").cast("string"),
      lit("@mail.example.com or 555-"), last4,
      lit(" or (415) 867-"), last4,
      lit(" or 415.867."), last4,
      lit(" or 415867"), last4,
      lit(" from 10."), (col("doc_id") % 256).cast("string"),
      lit(".0."), ((col("doc_id") * 7) % 256).cast("string"))
    val (nEmail, nIp, nPhone, clean) = piiScrub(seeded)
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        nEmail.as("n_emails"),
        nPhone.as("n_phones"),
        nIp.as("n_ips"),
        clean.as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  /** ta9_lm_score — corpus-LM quality scoring, the CCNet-style filter
    * shape (Wenzek et al. 2019: score each doc under an LM trained on a
    * trusted corpus; outliers are noise/spam): pass 1 trains the unigram
    * LM (token → corpus frequency — vocab-sized, tiny vs corpus), pass 2
    * joins it back to every token occurrence and aggregates per doc:
    * total/mean corpus frequency and the fraction of "rare" tokens
    * (corpus probability < 1/1000). A production deployment swaps the
    * unigram table for KenLM n-gram bits-per-token; the Spark shape — a
    * vocab-sized LM the planner broadcasts against the exploded corpus,
    * then a doc-key agg — is identical. All-integer internals until the
    * final single division, so the DuckDB oracle matches bit-for-bit
    * (transcendental log scores would drift cross-engine). The 1-row
    * total-token cross join is the documented q16/ss1 broadcast pattern. */
  def ta9LmScore(s: SparkSession, dir: String): DataFrame =
    ta9LmScoreFrom(Tables.documents(s, dir))

  /** ta9 over an arbitrary documents DataFrame (`doc_id`, `text`). */
  def ta9LmScoreFrom(documents: DataFrame): DataFrame = {
    val toksEx = documents.select(col("doc_id"), explode(toks(col("text"))).as("token"))
    val lm = toksEx.groupBy(col("token")).agg(count(lit(1)).as("cf"))
    val total = lm.agg(sum(col("cf")).as("t_total")) // exactly one row
    val lmFlagged = lm.crossJoin(broadcast(total))
      .withColumn("is_rare", when(col("cf") * 1000 < col("t_total"), 1L).otherwise(0L))
      .select(col("token"), col("cf"), col("is_rare"))
    toksEx.join(lmFlagged, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(col("cf")).as("cf_sum"),
        sum(col("is_rare")).as("n_rare"))
      .select(
        col("doc_id"), col("n_tok"), col("cf_sum"),
        round(col("cf_sum") / col("n_tok"), 4).as("mean_cf"),
        round(col("n_rare") / col("n_tok"), 4).as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta1_tokens" -> (ta1Tokens _),
    "ta2_quality" -> (ta2Quality _),
    "ta3_langid" -> (ta3Langid _),
    "ta4_fingerprint" -> (ta4Fingerprint _),
    "ta5_top_ngrams" -> (ta5TopNgrams _),
    "ta6_winnow" -> (ta6Winnow _),
    "ta7_repetition" -> (ta7Repetition _),
    "ta8_pii_scrub" -> (ta8PiiScrub _),
    "ta9_lm_score" -> (ta9LmScore _),
  )

  val oracle: Map[String, String] = Map(
    "ta1_tokens" ->
      """SELECT source, count(*) AS n_docs,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
              round(avg(len(string_split(text, ' '))), 2) AS avg_tokens,
              CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]{1,3}'))) AS BIGINT) AS total_bpe_tokens
       FROM documents GROUP BY source ORDER BY source""",
    "ta2_quality" ->
      """WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks,
               CAST(length(text) AS INTEGER) AS len_chars,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
               CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x = 'the' OR x = 'a')) AS INTEGER) AS n_stop
        FROM documents)
       SELECT doc_id, len_chars, n_tok,
            round(n_distinct * 1.0 / n_tok, 4) AS ttr,
            round(n_stop * 1.0 / n_tok, 4) AS stop_ratio,
            round((len_chars - n_tok + 1) * 1.0 / n_tok, 4) AS avg_tok_len,
            round(n_distinct * 1.0 / n_tok * 0.5 + (1 - n_stop * 1.0 / n_tok) * 0.5, 4) AS quality_score
       FROM t ORDER BY doc_id""",
    // ta3: the Spark argmax checks languages in profile order (en..zh) and
    // falls back to 'und' when every score is 0 — the CASE mirrors both.
    "ta3_langid" ->
      """WITH t AS (
        SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
        FROM documents),
      s AS (
        SELECT doc_id, lang,
               len(list_intersect(toks, ['the','a','of','and','is'])) AS score_en,
               len(list_intersect(toks, ['el','la','de','y','es'])) AS score_es,
               len(list_intersect(toks, ['le','la','de','et','est'])) AS score_fr,
               len(list_intersect(toks, ['der','die','das','und','ist'])) AS score_de,
               len(list_intersect(toks, ['的','是','了','在','我'])) AS score_zh
        FROM t),
      m AS (
        SELECT *, greatest(score_en, score_es, score_fr, score_de, score_zh) AS mx
        FROM s)
       SELECT doc_id, lang AS claimed_lang,
            CASE WHEN mx = 0 OR mx IS NULL THEN 'und'
                 WHEN score_en = mx THEN 'en'
                 WHEN score_es = mx THEN 'es'
                 WHEN score_fr = mx THEN 'fr'
                 WHEN score_de = mx THEN 'de'
                 ELSE 'zh' END AS detected_lang
       FROM m ORDER BY doc_id""",
    "ta4_fingerprint" ->
      """SELECT doc_id,
              md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fingerprint,
              substring(md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))), 1, 4) AS shard_key
       FROM documents ORDER BY doc_id""",
    "ta5_top_ngrams" ->
      """WITH toks AS (SELECT source, doc_id, string_split(text, ' ') AS t FROM documents),
      bg AS (
        SELECT source, doc_id,
               unnest(list_distinct([array_to_string(t[i:i+1], ' ')
                                     FOR i IN range(1, greatest(len(t), 2))])) AS bigram
        FROM toks WHERE len(t) >= 2),
      counts AS (
        SELECT source, bigram, count(*) AS n_docs FROM bg GROUP BY 1, 2),
      ranked AS (
        SELECT source, bigram, n_docs,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY n_docs DESC, bigram) AS INTEGER) AS rk
        FROM counts)
       SELECT source, bigram, n_docs, rk FROM ranked
       WHERE rk <= 3 ORDER BY source, rk""",
    "ta6_winnow" ->
      """WITH h AS (
        SELECT doc_id,
               [md5(substring(text, i, 8)) FOR i IN range(1, greatest(length(text) - 8 + 1, 1) + 1)] AS hs
        FROM documents),
      fp AS (
        SELECT doc_id,
               list_distinct([list_min(hs[j:j+3]) FOR j IN range(1, greatest(len(hs) - 4 + 1, 1) + 1)]) AS fps
        FROM h)
       SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fingerprints,
            list_min(fps) AS min_fp
       FROM fp ORDER BY doc_id""",
    // ta7: same gram positions as Spark's sequence(1, greatest(n-k+1, 1));
    // range() is end-exclusive, hence the +1-shifted greatest() bounds.
    "ta7_repetition" ->
      """WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      g AS (
        SELECT doc_id, text, CAST(len(t) AS INTEGER) AS n_tok,
               [array_to_string(t[i:i+1], ' ') FOR i IN range(1, greatest(len(t), 2))] AS bg,
               [array_to_string(t[i:i+4], ' ') FOR i IN range(1, greatest(len(t) - 3, 2))] AS fg
        FROM t),
      c AS (
        SELECT doc_id, text, n_tok,
               list_max(list_transform(list_distinct(bg),
                 x -> len(list_filter(bg, b -> b = x)))) AS top2_count,
               list_max(list_transform(list_distinct(bg),
                 x -> len(list_filter(bg, b -> b = x)) * length(x))) AS top2_chars,
               list_sum(list_transform(list_distinct(fg),
                 x -> CASE WHEN len(list_filter(fg, b -> b = x)) >= 2
                           THEN len(list_filter(fg, b -> b = x)) * length(x)
                           ELSE 0 END)) AS dup5_chars
        FROM g)
       SELECT doc_id, n_tok, CAST(top2_count AS INTEGER) AS top2_count,
            round(top2_chars * 1.0 / length(text), 4) AS top2_frac,
            round(dup5_chars * 1.0 / length(text), 4) AS dup5_frac
       FROM c ORDER BY doc_id""",
    // ta8: scrub order mirrors piiScrub — emails, then IPs, then phones;
    // counts are taken against the same intermediate the replace ran on.
    "ta8_pii_scrub" ->
      """WITH s AS (
        SELECT doc_id,
               text || ' reach user' || CAST(doc_id AS VARCHAR) ||
               '@mail.example.com or 555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' or (415) 867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' or 415.867.' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' or 415867' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' from 10.' ||
               CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
               CAST((doc_id * 7) % 256 AS VARCHAR) AS seeded
        FROM documents),
      r AS (
        SELECT doc_id, seeded,
               regexp_replace(seeded, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g') AS no_email
        FROM s),
      r2 AS (
        SELECT doc_id, seeded, no_email,
               regexp_replace(no_email, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                              '<IP>', 'g') AS no_ip
        FROM r)
       SELECT doc_id,
            CAST(len(regexp_extract_all(seeded,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
            CAST(len(regexp_extract_all(no_ip,
              '\(\d{3}\) ?\d{3}[-. ]\d{4}\b|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b|\b\d{10}\b|\b\d{3}-\d{4}\b'
              )) AS INTEGER) AS n_phones,
            CAST(len(regexp_extract_all(no_email,
              '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
            regexp_replace(no_ip,
              '\(\d{3}\) ?\d{3}[-. ]\d{4}\b|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b|\b\d{10}\b|\b\d{3}-\d{4}\b',
              '<PHONE>', 'g') AS scrubbed
       FROM r2 ORDER BY doc_id""",
    "ta9_lm_score" ->
      """WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      lm AS (
        SELECT token, count(*) AS cf FROM tok GROUP BY token),
      t AS (
        SELECT CAST(sum(cf) AS BIGINT) AS t_total FROM lm),
      sc AS (
        SELECT doc_id, count(*) AS n_tok,
               CAST(sum(cf) AS BIGINT) AS cf_sum,
               CAST(sum(CASE WHEN cf * 1000 < t_total THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        FROM tok JOIN lm USING (token) CROSS JOIN t
        GROUP BY doc_id)
       SELECT doc_id, n_tok, cf_sum,
            round(cf_sum * 1.0 / n_tok, 4) AS mean_cf,
            round(n_rare * 1.0 / n_tok, 4) AS rare_frac
       FROM sc ORDER BY doc_id""",
  )
}
