"""Text-analysis operators for training-data curation.

Everything here is built-in pyspark.sql.functions only — no UDFs at all —
so the whole stage stays inside WholeStageCodegen and the same logic is
expressible verbatim in the DuckDB oracle SQL (the driver's correctness
gate). The operators:

- token_counts: whitespace tokenization + a BPE-ish subword proxy
  (4-chars-per-token ceiling — the standard quick estimator).
- quality_scores: length / mean word length / stopword ratio /
  punctuation ratio / uppercase ratio and a composite keep/drop score
  (Gopher/C4-style filter family, re-expressed as column ops).
- lang_id: stopword-marker voting across a fixed per-language marker
  list (n-gram/stopword heuristic; deterministic, no model download).
- winnowing_fingerprints: k-word shingles -> sha256 hex -> per-window
  minimum (winnowing; Schleimer et al., SIGMOD'03) — the document
  fingerprint set used for plagiarism-style containment detection.
  Hashes stay *hex strings* so min() is portable across engines.

Scale notes: every op is a narrow map over the documents scan except the
fingerprint distinct (one shuffle on (id, fingerprint)) — all linear,
no skew-prone keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "un", "una", "en"],
}


def _words(text_col) -> "F.Column":
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " ")


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_words, n_tokens_est) — n_tokens_est = ceil(chars/4),
    the standard BPE token-count proxy when no tokenizer is shipped."""
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars"),
        F.size(_words(text_col)).alias("n_words"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_tokens_est"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features + composite keep flag (C4/Gopher-style):
    keep iff 10 <= n_words and 2 <= mean_word_len <= 12 and
    stopword_ratio >= 0.01 (any-language markers) — thresholds are
    documented constants the synthetic corpus is authored against."""
    words = _words(text_col)
    n_words = F.size(words)
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = F.size(F.filter(words, lambda w: w.isin(all_stops)))
    n_chars = F.length(text_col)
    mean_wl = F.round((F.length(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", "")) / F.greatest(n_words, F.lit(1))), 4)
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(F.col(text_col), r"[^A-Z]", ""))
    out = df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(upper / F.greatest(n_chars, F.lit(1)), 4).alias("upper_ratio"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= 10)
        & (F.col("mean_word_len") >= 2)
        & (F.col("mean_word_len") <= 12)
        & (F.col("stopword_ratio") >= 0.01),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang, marker_hits) — stopword-marker voting.

    Counts per-language marker words; argmax with deterministic
    tie-break on language code ascending; 'und' when zero hits
    everywhere. Pure column ops (greatest + chained when)."""
    words = _words(text_col)
    counts = {
        lang: F.size(F.filter(words, lambda w: w.isin(ws)))
        for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    # reversed-alpha chain so the *earliest* alphabetical lang wins ties
    for lang in sorted(counts, reverse=True):
        pred = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col).alias("id"), pred.alias("pred_lang"), best.alias("marker_hits")
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, window: int = 4
) -> DataFrame:
    """(id, fingerprint) — distinct winnowed shingle hashes per document.

    k-word shingles at each position -> sha256 hex -> minimum over each
    sliding window of `window` consecutive positions -> distinct. Hex
    strings (not ints) so lexicographic min matches any SQL engine.
    """
    from pyspark.sql.window import Window

    words = _words(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
    )
    pos = df.select(
        F.col(id_col).alias("id"), F.posexplode(sh).alias("pos", "shingle")
    ).withColumn("h", F.sha2("shingle", 256))
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(-(window - 1), 0)
    return (
        pos.withColumn("fingerprint", F.min("h").over(w))
        .filter(F.col("pos") >= window - 1)
        .select("id", "fingerprint")
        .distinct()
    )


def fingerprint_summary(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, window: int = 4
) -> DataFrame:
    """(id, n_fingerprints, min_fingerprint) — compact per-doc digest of
    the winnowed set (the joinable form for containment candidates)."""
    fps = winnowing_fingerprints(df, id_col, text_col, k, window)
    return fps.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fingerprint").alias("min_fingerprint"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    idf_mode: str = "ratio",
) -> DataFrame:
    """Per-document top-k TF-IDF terms.

    tf = term count within the document; idf = N/df (``idf_mode='ratio'``,
    exact integer-ratio arithmetic — cross-engine reproducible since no
    transcendental is evaluated) or ln(N/df) (``'log'``, the classic
    form — engines' libm ulp differences make it unsuitable for
    value-hash oracles, so the registered query uses ratio mode).
    Deterministic tie-break: (score desc, term asc).

    Scale: one shuffle for (id, term) counts, one vocabulary-sized
    shuffle for document frequencies, an equi-join on term, then a
    per-doc window top-k. No collect, no UDF; the df side is
    vocabulary-sized and AQE will broadcast it when it fits.
    """
    from pyspark.sql.window import Window

    words = df.select(
        F.col(id_col).alias("id"), F.explode(_words(text_col)).alias("term")
    ).filter(F.length("term") > 0)
    tf = words.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    idf = F.col("n") / F.col("df")
    if idf_mode == "log":
        idf = F.log(idf)
    elif idf_mode != "ratio":
        raise ValueError(f"unknown idf_mode {idf_mode!r}")
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))  # one scalar row broadcast
        .select("id", "term", "tf", "df", (F.col("tf") * idf).alias("score"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("id", "term", "tf", "df", F.round("score", 6).alias("score"), "rk")
    )
