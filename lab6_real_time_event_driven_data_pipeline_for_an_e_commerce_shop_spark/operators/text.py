"""Text-analysis operators for the ``documents`` table — the
training-data-pipeline extension pack (beyond the reference surface).

All operators are pure ``pyspark.sql.functions`` column expressions
(JVM-side, whole-stage-codegen'd) — no Python UDFs in the hot path.
Each returns columns deterministic enough to oracle-check in DuckDB.

Operators:
- token_count      — whitespace tokenization + count
- quality_score    — length/punct/digit/uppercase ratio features
- language_id      — stopword-marker n-gram heuristic
- fingerprint      — md5 over whitespace-normalized text (doc identity)
- shingles         — k-word shingle array (input to MinHash / Jaccard)
- repetition_profile — Gopher-class repetition/diversity signals
  (distinct-token ratio, top unigram/bigram fractions)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deliberately tiny + deterministic (the point is the Spark
# plumbing and the oracle-checkable argmax, not linguistic accuracy).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
    "zh": ["的", "是", "了", "在", "我"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, trimmed)."""
    return F.split(F.trim(col), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens(F.col(text_col))).cast("long"))


def _ratio(numer: Column, denom: Column) -> Column:
    return numer.cast("double") / F.when(denom == 0, F.lit(1)).otherwise(denom)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token stats, punct/digit/upper
    ratios. Everything is computed by regexp_replace-length deltas —
    one codegen stage, no UDF."""
    t = F.col(text_col)
    length = F.length(t)
    no_punct = F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    no_digit = F.length(F.regexp_replace(t, r"[0-9]", ""))
    no_upper = F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_tok = F.size(tokens(t))
    return (
        df.withColumn("n_chars_actual", length.cast("long"))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("avg_token_len", _ratio(length - (n_tok - 1), n_tok))
        .withColumn("punct_ratio", _ratio(length - no_punct, length))
        .withColumn("digit_ratio", _ratio(length - no_digit, length))
        .withColumn("upper_ratio", _ratio(length - no_upper, length))
    )


def language_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts: occurrences of each marker word,
    word-bounded, over the lowercased text."""
    lowered = F.lower(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(markers) + r")\b"
        # occurrences == split-parts - 1 (identical semantics in DuckDB's
        # string_split_regex, which the oracle uses)
        out[lang] = F.size(F.split(lowered, pattern)) - 1
    return out


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax language by marker-word hits; deterministic tie-break by
    language code ascending; 'und' (undetermined) when all scores are 0."""
    scores = language_scores(F.col(text_col))
    langs = sorted(scores)
    # build argmax as a fold over (score, lang) pairs — pure expressions
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # reversed so earlier langs win ties
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    out = df
    for lang in langs:
        out = out.withColumn(f"score_{lang}", scores[lang].cast("long"))
    return out.withColumn("predicted_lang", best_lang)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text (reference-class doc identity for exact dedup; SURVEY.md §7
    phase 4). Portable across engines (DuckDB md5 ≡ Spark md5)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(normalized))


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingle array via transform over a sequence — pure SQL
    expressions, no UDF, no explode until the caller wants one."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-style pre-tokenization (GPT-2-class pretoken split): letter
    runs, digit runs, punctuation runs — ``regexp_extract_all`` over the
    lowercased text. The real BPE merge table would run behind a Pandas
    UDF; the pretokenizer is where the row-level compute lives and is
    pure codegen."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), 0)


def bigrams(text: Column) -> Column:
    """Adjacent word-bigram array ('tok[i] tok[i+1]'); empty when the
    document has fewer than two tokens (unlike :func:`shingles`, which
    degrades to the whole text — a repetition metric must not count a
    short doc as its own top bigram)."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        )
    )


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-class repetition signals per document — the standard
    pretraining quality filters that catch boilerplate/spam that
    length-and-punctuation ratios miss (cf. Gopher paper §A1.1's
    duplicate n-gram fractions):

    - ``n_distinct_tokens`` / ``distinct_token_ratio`` — vocabulary
      diversity (low ⇒ keyword stuffing).
    - ``top_token_frac`` — occurrences of the most frequent token over
      all tokens (high ⇒ single-term spam).
    - ``top_bigram_frac`` — occurrences of the most frequent adjacent
      bigram over all bigrams (high ⇒ repeated phrases); 0.0 for docs
      with <2 tokens.

    Shape: explode → count → per-doc max/distinct — the same bounded
    (doc, gram) substrate grain as the dedup family; shuffles hashes of
    grams, never text, and every ratio is exact-int ÷ exact-int double
    division (engine-portable bit-for-bit). No UDF anywhere."""
    t = F.col(text_col)
    base = df.select(F.col(id_col), t.alias("_txt")).withColumn(
        "_n_tok", F.size(tokens(F.col("_txt"))).cast("long")
    )
    uni = (
        base.select(F.col(id_col), F.explode(tokens(F.col("_txt"))).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
            F.max("_c").cast("long").alias("_top_uni"),
        )
    )
    bi = (
        base.select(F.col(id_col), F.explode(bigrams(F.col("_txt"))).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").cast("long").alias("_top_bi"))
    )
    return (
        base.select(F.col(id_col), F.col("_n_tok"))
        .join(uni, id_col, "left")
        .join(bi, id_col, "left")
        .select(
            F.col(id_col),
            F.col("_n_tok").alias("n_tokens"),
            F.coalesce(F.col("n_distinct_tokens"), F.lit(0)).alias(
                "n_distinct_tokens"
            ),
            (
                F.coalesce(F.col("n_distinct_tokens"), F.lit(0)).cast("double")
                / F.greatest(F.col("_n_tok"), F.lit(1))
            ).alias("distinct_token_ratio"),
            (
                F.coalesce(F.col("_top_uni"), F.lit(0)).cast("double")
                / F.greatest(F.col("_n_tok"), F.lit(1))
            ).alias("top_token_frac"),
            (
                F.coalesce(F.col("_top_bi"), F.lit(0)).cast("double")
                / F.greatest(F.col("_n_tok") - 1, F.lit(1))
            ).alias("top_bigram_frac"),
        )
    )


def rolling_fingerprint(col: Column, modulus: int = 2_147_483_647) -> Column:
    """Polynomial rolling hash over the character stream:
    h = (h·31 + codepoint) mod P — the classic content-defined
    fingerprint, folded entirely JVM-side (aggregate over the char
    array; no UDF). Engine-portable: DuckDB reproduces it with
    list_reduce over the same codepoints."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % modulus,
    )
