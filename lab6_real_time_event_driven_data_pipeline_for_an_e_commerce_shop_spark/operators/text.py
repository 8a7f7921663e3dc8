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
    expressions, no UDF, no explode until the caller wants one.

    r17: the token array is LET-BOUND via the transform(array(x), v ->
    body) idiom before the per-position lambda. Referencing
    ``split(...)`` directly inside the position lambda re-inlines the
    split PER ELEMENT (the r6/r10 Catalyst HOF trap — subexpression
    elimination does not hoist lambda-invariant subtrees), making each
    document O(n_tokens²) character work. Measured on the sf0.1 corpus:
    shingle substrate 3.21 s → 0.78 s, results bit-identical."""

    def _body(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        )

    return F.element_at(F.transform(F.array(tokens(text)), _body), 1)


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
    short doc as its own top bigram).

    Shape (r8): the token array is LET-BOUND once via
    ``transform(array(tokens), t -> …)`` and paired with its own
    tail through ``zip_with`` — O(n_tokens) per document. The previous
    form nested ``tokens(text)`` inside a ``transform()`` lambda,
    which Catalyst re-inlines per element (O(n_tokens × text_len),
    the winnow_fingerprints nested-array trap); the aggregate-grain
    corpus path still prefers posexplode + lead
    (see :func:`repetition_profile`)."""
    return F.get(
        F.transform(
            F.array(tokens(text)),
            lambda t: F.filter(
                F.zip_with(
                    t,
                    F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
                lambda x: x.isNotNull(),
            ),
        ),
        F.lit(0),
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
    - ``dup_trigram_frac`` (r8) — fraction of trigram OCCURRENCES that
      belong to a repeated trigram (Gopher's duplicate n-gram family
      proper: Σ c over trigrams with c ≥ 2, ÷ total trigrams); 0.0 for
      docs with <3 tokens. Catches long-range copy-paste repetition
      that a single top-gram fraction underweights.

    Shape: posexplode → lead-window bigram pairing → count → per-doc
    max/distinct — the same bounded (doc, gram) substrate grain as the
    dedup family; shuffles hashes of grams, never text, and every ratio
    is exact-int ÷ exact-int double division (engine-portable
    bit-for-bit). No UDF anywhere. Bigrams are paired AFTER the
    explode (lead() over (doc, pos)) rather than via the
    :func:`bigrams` array expression — transform() lambdas re-inline
    the split() per element (O(n_tokens × text_len) per doc, the
    winnow_fingerprints Catalyst trap); the window shape tokenizes
    each document exactly once."""
    from pyspark.sql import Window

    t = F.col(text_col)
    base = df.select(F.col(id_col), t.alias("_txt")).withColumn(
        "_n_tok", F.size(tokens(F.col("_txt"))).cast("long")
    )
    tok_pos = base.select(
        F.col(id_col), F.posexplode(tokens(F.col("_txt"))).alias("_p", "_tok")
    )
    uni = (
        tok_pos.groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
            F.max("_c").cast("long").alias("_top_uni"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("_p")
    bi = (
        tok_pos.withColumn("_nxt", F.lead("_tok").over(w))
        .where(F.col("_nxt").isNotNull())
        .select(F.col(id_col), F.concat_ws(" ", "_tok", "_nxt").alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").cast("long").alias("_top_bi"))
    )
    tri = (
        tok_pos.withColumn("_n1", F.lead("_tok", 1).over(w))
        .withColumn("_n2", F.lead("_tok", 2).over(w))
        .where(F.col("_n2").isNotNull())
        .select(
            F.col(id_col), F.concat_ws(" ", "_tok", "_n1", "_n2").alias("_g")
        )
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("_c") >= 2, F.col("_c")).otherwise(0))
            .cast("long")
            .alias("_dup_tri")
        )
    )
    return (
        base.select(F.col(id_col), F.col("_n_tok"))
        .join(uni, id_col, "left")
        .join(bi, id_col, "left")
        .join(tri, id_col, "left")
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
            (
                F.coalesce(F.col("_dup_tri"), F.lit(0)).cast("double")
                / F.greatest(F.col("_n_tok") - 2, F.lit(1))
            ).alias("dup_trigram_frac"),
        )
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    max_punct_ratio: float = 0.3,
    max_digit_ratio: float = 0.3,
    min_distinct_token_ratio: float = 0.3,
    max_top_bigram_frac: float = 0.35,
    max_dup_trigram_frac: float | None = None,
) -> DataFrame:
    """Gopher-style composed document quality gate: every rule is a
    column predicate over :func:`quality_features` +
    :func:`repetition_profile`, and the verdict ships with evidence —
    ``qc_pass`` (boolean) and ``qc_fail_reasons`` (sorted CSV of the
    rules that fired, '' when clean; a scalar, so downstream stays
    engine-comparable). The same rules-as-columns pattern as the
    e-commerce validation operator: filtering discards information,
    flag-and-explain keeps the audit trail a curation pipeline needs.
    One join on id between the two profile substrates; no UDF."""
    q = quality_features(df.select(F.col(id_col), F.col(text_col)), text_col)
    rep = repetition_profile(df, text_col, id_col).select(
        id_col, "distinct_token_ratio", "top_bigram_frac", "dup_trigram_frac"
    )
    j = q.join(rep, id_col)
    rules = {
        "too_few_tokens": F.col("n_tokens") < min_tokens,
        "too_many_tokens": F.col("n_tokens") > max_tokens,
        "avg_token_too_short": F.col("avg_token_len") < min_avg_token_len,
        "avg_token_too_long": F.col("avg_token_len") > max_avg_token_len,
        "punct_heavy": F.col("punct_ratio") > max_punct_ratio,
        "digit_heavy": F.col("digit_ratio") > max_digit_ratio,
        "low_diversity": F.col("distinct_token_ratio")
        < min_distinct_token_ratio,
        "repeated_phrase": F.col("top_bigram_frac") > max_top_bigram_frac,
    }
    if max_dup_trigram_frac is not None:  # opt-in 9th rule (r8)
        rules["copy_paste_repetition"] = (
            F.col("dup_trigram_frac") > max_dup_trigram_frac
        )
    fired = F.array_sort(
        F.filter(
            F.array(
                *[F.when(cond, F.lit(name)) for name, cond in rules.items()]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return j.select(
        F.col(id_col),
        (F.size(fired) == 0).alias("qc_pass"),
        F.array_join(fired, ",").alias("qc_fail_reasons"),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    min_freq: int = 2,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn BPE merge rules from the corpus — the standard two-phase
    shape every scalable tokenizer trainer uses (HuggingFace/SentencePiece
    train on a word-frequency dict, not the raw corpus):

    1. **Distributed** (one Spark job): pretoken frequencies via
       explode(bpe_ish_tokens) → groupBy → count, with a ``min_freq``
       cut and a deterministic ``max_words`` cap (freq desc, token asc)
       — the only part that touches corpus-scale data, and it reduces
       100 TB of text to a bounded vocabulary.
    2. **Driver** merge loop over that bounded dict: repeatedly merge
       the most frequent adjacent symbol pair (ties broken
       lexicographically, so training is deterministic across runs and
       partitionings) until ``n_merges`` rules or no pair repeats.

    Returns the ordered merge list — rank i = merge priority i."""
    freq_rows = (
        df.select(F.explode(bpe_ish_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_freq)
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.w): r.c for r in freq_rows if r.w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break
        # deterministic tie-break: lexicographically smallest pair
        pair = min(p for p, c in pairs.items() if c == best_count)
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out, i = [], 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == pair[0]
                    and word[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply BPE merges to one pretoken (GPT-2 ``bpe()`` algorithm):
    repeatedly merge the lowest-rank adjacent pair until none apply."""
    symbols = list(word)
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE subtoken counts under the learned merges.

    Scale design — Python only at the VOCABULARY grain: pretokens
    explode relationally, the ``bpe_segment`` loop runs via Arrow
    ``mapInPandas`` over the *distinct* pretokens (bounded by
    vocabulary size, not corpus size; merges ride the closure as a
    rank dict), and per-document totals come back from a relational
    join + sum. A 100 TB corpus therefore pays Python cost proportional
    to its distinct-word count only. Output: id_col,
    ``n_bpe_subtokens`` (bigint; pretokens with no merges count as
    their own character count — consistent with bpe_segment)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}
    pre = df.select(
        F.col(id_col), F.explode(bpe_ish_tokens(F.col(text_col))).alias("_w")
    )
    distinct_w = pre.select("_w").distinct()

    out_schema = T.StructType(
        [
            T.StructField("_w", T.StringType(), False),
            T.StructField("_n_sub", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = pdf["_w"].tolist()
            yield pd.DataFrame(
                {
                    "_w": words,
                    "_n_sub": [len(bpe_segment(w, ranks)) for w in words],
                }
            )

    seg = distinct_w.mapInPandas(run, schema=out_schema)
    counts = (
        pre.join(seg, "_w")
        .groupBy(id_col)
        .agg(F.sum("_n_sub").cast("long").alias("n_bpe_subtokens"))
    )
    # docs with zero pretokens (empty/whitespace-only text) must still
    # appear, with count 0 — an inner agg would silently drop them
    return (
        df.select(id_col)
        .join(counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bpe_subtokens"), F.lit(0))
            .cast("long")
            .alias("n_bpe_subtokens"),
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


# Published model artifact for model-based quality scoring (the same
# pattern as the SRP PLANE_SEED and the seeded PQ codebooks): the
# weights are fixed, documented constants so the score is a pure
# function of the text — reproducible across engines, runs, and
# cluster sizes. Units: features are exact integers (chars/tokens
# capped; ratios in parts-per-million via integer division), weights
# are small ints, the logit is an int64. Swapping in weights trained
# offline (e.g. a fastText/CCNet-style classifier distilled to a
# linear head) changes ONLY this table, not the plan.
QUALITY_LOGIT_WEIGHTS: dict[str, int] = {
    "len_capped": 500,      # + per char up to 2000 (substance)
    "tokens_capped": 2500,  # + per token up to 400
    "ttr_micro": 2,         # + type-token ratio (vocabulary diversity)
    "punct_micro": -3,      # - punctuation excess
    "digit_micro": -4,      # - digit excess (tables/serial dumps)
    "upper_micro": -3,      # - uppercase excess (shouting/headers)
    "bias": -800_000_000,
}


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division for NON-NEGATIVE int64 columns without
    leaving integer arithmetic: (a - a mod b) is exactly divisible by
    b, so the double division is exact (results < 2^53). A plain
    floor(a / b) risks the classic double-rounding misfloor when the
    true quotient sits just below an integer."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def quality_logit(
    df: DataFrame,
    text_col: str = "text",
    distinct_col: str = "n_distinct_tokens",
) -> DataFrame:
    """Model-based quality score (CCNet/fastText-classifier stage of a
    pretraining pipeline) as ONE integer-exact column expression:
    ``quality_logit_micro`` = Σ wᵢ·fᵢ + bias over capped counts and
    ppm-ratios (see QUALITY_LOGIT_WEIGHTS). All arithmetic is int64 —
    no float enters the computation, so the score is bit-identical on
    any engine/partitioning and a DuckDB oracle reproduces it with
    `//` integer division. Requires ``distinct_col`` (per-doc distinct
    token count, e.g. from repetition_profile) to be present."""
    t = F.col(text_col)
    length = F.length(t).cast("long")
    n_tok = F.size(tokens(t)).cast("long")
    no_punct = F.length(F.regexp_replace(t, r"[^\w\s]", "")).cast("long")
    no_digit = F.length(F.regexp_replace(t, r"[0-9]", "")).cast("long")
    no_upper = F.length(F.regexp_replace(t, r"[A-Z]", "")).cast("long")
    lg = F.greatest(length, F.lit(1).cast("long"))
    tg = F.greatest(n_tok, F.lit(1).cast("long"))
    m = F.lit(1_000_000).cast("long")
    w = QUALITY_LOGIT_WEIGHTS
    logit = (
        F.lit(w["len_capped"]).cast("long")
        * F.least(length, F.lit(2000).cast("long"))
        + F.lit(w["tokens_capped"]).cast("long")
        * F.least(n_tok, F.lit(400).cast("long"))
        + F.lit(w["ttr_micro"]).cast("long")
        * _idiv(F.col(distinct_col).cast("long") * m, tg)
        + F.lit(w["punct_micro"]).cast("long")
        * _idiv((length - no_punct) * m, lg)
        + F.lit(w["digit_micro"]).cast("long")
        * _idiv((length - no_digit) * m, lg)
        + F.lit(w["upper_micro"]).cast("long")
        * _idiv((length - no_upper) * m, lg)
        + F.lit(w["bias"]).cast("long")
    )
    return df.withColumn("quality_logit_micro", logit.cast("long"))


def corpus_bigram_coverage(
    df: DataFrame,
    threshold_ppm: int = 400,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CORPUS-TRAINED fluency scoring — the CCNet/KenLM perplexity-
    filter shape with the neural/ngram LM replaced by exact corpus
    statistics (so the score is bit-identical across engines, the
    quality_logit discipline): a document scores by the fraction of
    its positional adjacent bigrams whose RELATIVE corpus frequency
    is at least ``threshold_ppm`` parts-per-million. Text full of
    corpus-typical transitions scores near 1.0; machine garbage,
    boilerplate keyboard-mash, and wrong-language text score low —
    precisely the docs an LM filter prunes. Unlike the fixed-weight
    quality_logit, the statistics are LEARNED from the corpus itself,
    so the op is the engine's first train-on-corpus → score-corpus
    feedback stage.

    Returns (id, n_bigrams, n_covered_bigrams, bigram_cov_micro) at
    doc grain — every input doc appears; docs with <2 tokens have no
    bigrams and score 0. All arithmetic integer: cc·10⁶ ≥ ppm·total
    for coverage, n_covered·10⁶ DIV n_bigrams for the score.

    Shape: one explode, ONE shuffle on the bigram for a window count
    (the q24 DF-cut pattern — a hot bigram pools on one reducer but
    carries only (id, bigram) rows through a sort-free COUNT), one
    groupBy back to doc grain. The corpus total is a single bounded
    driver read (the q24 n_docs pattern) inlined as a literal so the
    coverage predicate stays a pure integer comparison.

    STALENESS (r18, ADVICE r17): the corpus total memoizes in the
    plan-hash-keyed slot ``text.coverage_total`` — callers re-scoring
    after the input path's files were swapped underneath an identical
    plan must ``release_scalar()`` it first (functions/cache.py)."""
    from pyspark.sql.window import Window as _W

    bgpos = df.select(
        F.col(id_col), F.explode(bigrams(F.col(text_col))).alias("_bg")
    )
    from ..functions.cache import bounded_scalar

    # r17: memoized per corpus plan (the q24 ngram_n_docs pattern) —
    # repeat builds in one session stop paying a corpus-pass job each
    total = bounded_scalar(
        "text.coverage_total", bgpos, lambda: bgpos.count()
    )
    counted = bgpos.withColumn(
        "_cc", F.count(F.lit(1)).over(_W.partitionBy("_bg"))
    )
    per_doc = counted.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(
            F.when(
                F.col("_cc") * F.lit(1_000_000)
                >= F.lit(int(threshold_ppm)) * F.lit(int(total)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_covered_bigrams"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_covered_bigrams", F.lit(0))
            .cast("long")
            .alias("n_covered_bigrams"),
            F.expr(
                "CAST(coalesce(n_covered_bigrams, 0) * 1000000"
                " DIV greatest(coalesce(n_bigrams, 0), 1) AS BIGINT)"
            ).alias("bigram_cov_micro"),
        )
    )


def _doc_terms(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared lexical-retrieval substrate: ((id, dl), (id, term, tf)).

    One tokenize per doc (let-bound array — the array is built once,
    never re-inlined per element), one explode, one (id, term) groupBy
    for term frequencies. Both frames stay at bounded grain: dl at doc
    grain, tf at doc×distinct-term grain.

    NULL text coalesces to '' BEFORE tokenizing (r18, ADVICE r17):
    tokens(NULL) is a NULL array, which explode drops — a NULL-text
    doc would vanish from tf (and so from a sum(tf)-derived dl) while
    a size(array)-derived dl still counted it, silently forking the
    two dl derivations' n_docs on any corpus containing NULLs. With
    the coalesce, a NULL doc is an EMPTY doc (one phantom token, the
    pinned r13 fact) on every path — the derivations are
    value-identical by construction."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
    )
    dl = toks.select("_id", F.size("_t").cast("long").alias("dl"))
    tf = (
        toks.select("_id", F.explode("_t").alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return dl, tf


def _doc_shingle_terms(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """:func:`_doc_terms` with k-word SHINGLES as the term unit
    (:func:`shingles` — whole-text fallback for docs shorter than k,
    the q24/q52 shingle convention). Document length = shingle count.

    Why a retrieval op would want this: on a corpus whose UNIGRAM
    vocabulary is small relative to the doc count (every word is a
    stopword by document frequency — true of this repo's synthetic
    corpus, vocab 31, and of any heavily templated real corpus),
    unigram candidate generation is all-pairs no matter the df cut.
    The shingle vocabulary is combinatorially larger (|V|^k), so
    shingle df IS discriminative and candidate generation touches only
    docs sharing an exact k-gram — the same sparsity leak_shingles
    exploits."""
    # NULL → '' for the same reason as _doc_terms (r18, ADVICE r17):
    # shingles(NULL) is a NULL array and explode would drop the doc
    arr = df.select(
        F.col(id_col).alias("_id"),
        shingles(F.coalesce(F.col(text_col), F.lit("")), k).alias("_t"),
    )
    dl = arr.select("_id", F.size("_t").cast("long").alias("dl"))
    tf = (
        arr.select("_id", F.explode("_t").alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return dl, tf


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: top-``k`` terms by an
    integer-exact tf·idf. The idf is the LN-FREE rational surrogate
    ``(2N − 2df + 1)·10⁶ DIV (2df + 1)`` — the Robertson-Spärck-Jones
    weight's argument without the log. ln is monotone, so for a FIXED
    term the surrogate orders documents identically to classic
    BM25-idf; across terms it stretches the tail (rare terms weigh
    relatively more), which for keyword extraction is the desired
    bias. Staying in integers keeps the ranking bit-identical across
    engines (no libm, no double rounding) — the quality_logit
    discipline applied to retrieval.

    Returns (id, term_rank, term, tf, df_docs, tfidf_micro); ties
    broken by term ASC. N (corpus doc count) is one collected scalar
    inlined as a literal.

    Scale: tf groupBy keys on (doc, term) — no hot key; the df groupBy
    pools a stopword's rows on one reducer but each row is just
    (term), count-only (the q24 DF-cut shape); the rank window
    partitions by doc (bounded groups). Integer headroom: tf·idf ≤
    dl·(2N·10⁶ DIV 3); int64-safe while dl·N < ~1.3e13 — at larger
    corpora drop the 10⁶ idf scale (the knob is the literal below)."""
    dl, tf = _doc_terms(df, text_col, id_col)
    n_docs = int(dl.count())  # one scalar to the driver, never rows
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf_micro",
        F.expr(
            f"tf * (((2 * {n_docs} - 2 * df_docs + 1) * 1000000)"
            " DIV (2 * df_docs + 1))"
        ),
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("_id").orderBy(
        F.col("tfidf_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            "term_rank",
            "term",
            "tf",
            "df_docs",
            "tfidf_micro",
        )
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    pre_topk_buckets: int = 32,
    max_df_ppm: int | None = None,
    shingle_k: int | None = None,
    cache_slot: str = "bm25",
) -> DataFrame:
    """Quantized BM25 retrieval: top-``k`` documents per query,
    integer-exact end to end (the curation stage that selects
    domain-relevant training docs by lexical similarity to a target
    description, and the retrieval half of decontamination-by-search).

    Scoring is BM25 (Robertson/Walker Okapi, k1=1.2 b=0.75 — public
    constants) with two deterministic quantizations so the score is
    bit-identical across engines and partitionings:
    - idf: the ln-free rational surrogate
      ``(2N − 2df + 1)·10⁶ DIV (2df + 1)`` (ln's argument; see
      tfidf_top_terms for the monotonicity note);
    - tf saturation: ``tf·(k1+1)/(tf + k1(1 − b + b·dl/avgdl))``
      cleared of fractions with k1=6/5, b=3/4:
      ``(2200000·tf·10⁶) DIV (10⁶·tf + 300000 + (9·10¹¹·dl) DIV
      avgdl_micro)`` where ``avgdl_micro = 10⁶·T DIV N`` (T, N =
      corpus token/doc totals, two collected scalars inlined as
      literals).
    Per-term contribution = idf_micro · sat_micro (micro²); summed
    per (query, doc); emitted as ``score_micro = sum DIV 10⁶``.

    Duplicate query terms count once (set semantics). Terms absent
    from the corpus contribute 0. Docs sharing no term with a query
    don't appear. Ties rank by doc id ASC.

    Shape: the query→term list is a tiny in-memory frame joined
    BROADCAST on term (equi-join, never BNLJ); candidate scoring is
    one (query, doc) groupBy; the final top-k uses TWO-LEVEL rank —
    a per-(query, doc-hash-bucket) row_number keeps only
    ``pre_topk_buckets·k`` survivors before the per-query window, so
    no single reducer ever sees the full candidate set (same ordering
    both levels ⇒ the pre-cut provably contains the global top-k).
    Integer headroom: idf·sat ≤ (2N·10⁶ DIV 3)·2.2·10⁶ — int64-safe
    while N < ~6·10⁶ docs; at larger corpora drop the idf scale to
    10³ on both sides."""
    def _qterms(qtext: str) -> set[str]:
        toks = str(qtext).split()
        if shingle_k is None:
            return set(toks)
        if len(toks) < shingle_k:          # the shingles() short-doc
            return {" ".join(toks)}        # whole-text fallback
        return {
            " ".join(toks[i:i + shingle_k])
            for i in range(len(toks) - shingle_k + 1)
        }

    qterms = sorted({(int(qid), t) for qid, qtext in queries
                     for t in _qterms(qtext)})
    if not qterms:
        raise ValueError("bm25_topk: empty query set")
    spark = df.sparkSession
    qdf = spark.createDataFrame(qterms, "query_id long, term string")
    return _bm25_rank(
        df, F.broadcast(qdf), k, text_col, id_col, pre_topk_buckets,
        max_df_ppm, shingle_k, cache_slot,
    )


def bm25_topk_df(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    pre_topk_buckets: int = 32,
    max_df_ppm: int | None = None,
    shingle_k: int | None = None,
    cache_slot: str = "bm25",
) -> DataFrame:
    """DataFrame-native :func:`bm25_topk` — the query SET is a
    DataFrame, so retrieval scales to corpus-sized query sets with no
    driver collect: decontamination-by-search runs the whole TEST
    SPLIT as queries against the train corpus in one relational plan.
    Scoring, quantization, set-semantics, and tie-breaks are the list
    form's exactly (one shared core); the only difference is the
    query-terms join is left to the optimizer (broadcast when small,
    shuffle equi-join when the query set is itself a corpus — still
    never BNLJ) instead of forced broadcast."""
    unit = (
        tokens(F.col(query_text_col))
        if shingle_k is None
        else shingles(F.col(query_text_col), shingle_k)
    )
    qterms = queries_df.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.explode(F.array_distinct(unit)).alias("term"),
    )
    return _bm25_rank(
        df, qterms, k, text_col, id_col, pre_topk_buckets, max_df_ppm,
        shingle_k, cache_slot,
    )


def _bm25_rank(
    df: DataFrame,
    qterms: DataFrame,
    k: int,
    text_col: str,
    id_col: str,
    pre_topk_buckets: int,
    max_df_ppm: int | None = None,
    shingle_k: int | None = None,
    cache_slot: str = "bm25",
) -> DataFrame:
    """Shared BM25 core: (query_id, term) frame → ranked top-k.

    ``shingle_k`` switches the term unit from unigrams to k-word
    shingles (see :func:`_doc_shingle_terms` for when that is the only
    scale-sane choice); the scoring arithmetic is unchanged — dl
    becomes the shingle count.

    ``max_df_ppm`` is the IMPACT-PRUNING knob (the WAND-class
    approximation a corpus-sized query set needs): query terms whose
    document frequency exceeds ``max_df_ppm`` parts-per-million of the
    corpus are dropped BEFORE candidate generation. Without it, every
    stopword a query shares with every document generates a candidate
    row — |queries| × |docs| grain, quadratic when the query set is
    itself a corpus (measured 4.4× at 10× on q52 before the cut).
    High-df terms carry near-zero idf, so the cut removes the terms
    that cost the most and score the least; it is integer-exact
    (df·10⁶ ≤ ppm·N) and replicated verbatim in oracles — both engines
    drop the identical term set. The cut is applied to the PRUNED
    query-term frame joined FIRST (qterms ⋈ dfreq before ⋈ tf), so the
    quadratic join never materializes.

    ``cache_slot`` names the tf-substrate cache slot (r17): two
    concurrent consumers over different corpora/term-units (q71's
    unigram retrieval, q52's shingle decon) would otherwise evict each
    other's substrate and totals memo on every alternation — the q24/
    q53 cache_slot convention.

    STALENESS (r18, ADVICE r17): the tf substrate and the n_docs/
    total_tokens scalars memoize in plan-hash-keyed slots
    (``<cache_slot>.bm25_tf`` / ``<cache_slot>.bm25_totals``) —
    callers whose corpus path's FILES were swapped underneath an
    identical plan (compaction, staging swap) must ``release()`` /
    ``release_scalar()`` those slots first (functions/cache.py)."""
    from pyspark.sql.window import Window as _W

    from ..functions.cache import bounded_cache, bounded_scalar
    from .dedup import _substrate_partitions

    if shingle_k is None:
        dl, tf = _doc_terms(df, text_col, id_col)
    else:
        dl, tf = _doc_shingle_terms(df, text_col, id_col, shingle_k)
    # r17 (guide §2 "shuffle fewer bytes" / §5 substrate reuse): tf
    # feeds BOTH dfreq and the contrib join, and Spark does not CSE
    # identical subtrees across join branches (the r12 maxscore
    # lesson) — uncached, the tokenize+explode+groupBy pass ran TWICE
    # per action. dl is Σ tf per doc, value-identical to the old
    # size(token_array) pass for EVERY doc (tokens()/shingles() emit
    # ≥1 element even for empty text — the phantom-token fact pinned
    # in r13 — and NULL text coalesces to '' inside _doc_terms/
    # _doc_shingle_terms (r18, ADVICE r17), so no doc row is lost on
    # ANY corpus and n_docs == dl.count() exactly), which
    # lets the dl pass ride the same cache instead of re-tokenizing
    # the corpus. The two plan-literal scalars collapse to ONE
    # memoized job over that dl (was: two jobs, each a full tokenize).
    # The explicit repartition before the cache is NOT optional: a
    # cached plan's OUTPUT partitioning is frozen (AQE cannot coalesce
    # it even with canChangeCachedPlanOutputPartitioning, and a vanilla
    # session never coalesces it), so caching the groupBy's raw
    # 200-partition output made every consumer scan pay 200 tasks —
    # measured SLOWER than the uncached double-build. Width is
    # scale-adaptive from the corpus scan's footer bytes (§2), and
    # hash-by-_id pre-satisfies dl's doc-grain groupBy below — the
    # repartition's exchange carries post-aggregation rows, so the
    # map-side partial agg of the (_id, term) groupBy is kept.
    tf = bounded_cache(
        f"{cache_slot}.bm25_tf",
        tf.repartition(_substrate_partitions(df), "_id"),
    )
    dl = tf.groupBy("_id").agg(F.sum("tf").cast("long").alias("dl"))
    n_docs, total_tokens = (
        int(x)
        for x in bounded_scalar(
            f"{cache_slot}.bm25_totals",
            tf,
            lambda: tuple(
                dl.agg(
                    F.count(F.lit(1)),
                    F.coalesce(F.sum("dl"), F.lit(0)),
                ).collect()[0]
            ),
        )
    )
    if n_docs == 0 or total_tokens == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl_micro = (1_000_000 * total_tokens) // n_docs

    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    if max_df_ppm is not None:
        # threshold folded driver-side: ppm·N as two int literals would
        # overflow INT32 under ANSI at corpus scale
        dfreq = dfreq.filter(
            F.col("df_docs") * F.lit(1_000_000)
            <= F.lit(int(max_df_ppm) * n_docs)
        )
    contrib = (
        tf.join(qterms.join(dfreq, "term"), "term")
        .join(dl, "_id")
        .withColumn(
            "_mm",
            F.expr(
                f"(((2 * {n_docs} - 2 * df_docs + 1) * 1000000)"
                " DIV (2 * df_docs + 1))"
                " * ((2200000 * tf * 1000000)"
                f" DIV (1000000 * tf + 300000"
                f" + (900000000000 * dl) DIV {avgdl_micro}))"
            ),
        )
    )
    scored = contrib.groupBy("query_id", "_id").agg(
        F.expr("CAST(SUM(_mm) DIV 1000000 AS BIGINT)").alias("score_micro")
    )
    order = [F.col("score_micro").desc(), F.col("_id").asc()]
    pre_w = _W.partitionBy(
        "query_id", F.pmod(F.xxhash64("_id"), F.lit(pre_topk_buckets))
    ).orderBy(*order)
    final_w = _W.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("_pre", F.row_number().over(pre_w))
        .filter(F.col("_pre") <= k)
        .withColumn("rank", F.row_number().over(final_w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", F.col("_id").alias(id_col), "score_micro"
        )
    )


def bm25_topk_maxscore(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    pre_topk_buckets: int = 32,
    split_df_ppm: int = 100_000,
    shingle_k: int | None = None,
    diagnostics: bool = False,
) -> DataFrame:
    """EXACT BM25 top-k with MaxScore/WAND-class upper-bound pruning —
    returns bit-identically what :func:`bm25_topk` returns with NO df
    cut, while only generating candidates from the rare ("essential")
    query terms (`max_df_ppm` is the lossy approximation: it DROPS
    high-df terms, so a high-df-but-discriminative term changes
    results; this operator keeps them exact).

    The mechanism (Turtle & Flood MaxScore, relationally):

    1. **Corpus artifact** — per-term score upper bound
       ``ub_mm(t) = max over t's postings of idf(t)·sat(tf, dl)``
       (the "max impact" real impact-ordered indexes store per posting
       list). Query-independent, term grain, ONE extra groupBy over
       the posting contributions.
    2. **Split** — query terms partition by document frequency at
       ``split_df_ppm`` (a pure performance heuristic: ANY split is
       correct; df is the standard proxy for cheap-vs-expensive
       posting lists).
    3. **Phase 1** — candidates = docs sharing ≥1 rare query term
       (the small join).
    4. **Phase 2** — each candidate's high-df contributions are ADDED
       BACK via (candidate × its query's high terms) ⋈ postings on
       (term, doc) — an equi-join at candidate×|q_high| grain, never
       |corpus|×|q_high|. Candidate totals now EQUAL unpruned scores.
    5. **Bound check** — a non-candidate doc contains only high-df
       query terms, so its score ≤ B_q = (Σ ub_mm over the query's
       high terms) DIV 10⁶. If ``B_q < θ_q`` (the candidate set's
       k-th-ranked score, STRICT — ties at θ_q could win the id
       tie-break) and the query has ≥ k candidates, pruning is PROVEN
       exact for that query.
    6. **Fallback** — queries failing the proof are re-scored
       unpruned (restricted by semi-join), so the result is exact for
       EVERY query, not just the provable ones. On a healthy Zipf
       corpus the fallback set is empty; on a degenerate one (this
       repo's 31-word unigram corpus) the operator degrades to
       correct-but-unpruned instead of silently wrong — the honest
       dual of ``max_df_ppm``.

    Scale shape: everything is equi-joins at posting / candidate /
    term grain; the ub artifact is one corpus-linear pass amortized
    across the whole query set. Same two-level top-k windows, same
    integer arithmetic, same tie-breaks as :func:`bm25_topk`.

    ``diagnostics=True`` returns ``(result, verdicts)`` where verdicts
    is (query_id, _nc candidates, _theta, _b bound, _valid) — the
    no-silent-caps rule: at scale, log how many queries fell back."""
    def _qterms(qtext: str) -> set[str]:
        toks = str(qtext).split()
        if shingle_k is None:
            return set(toks)
        if len(toks) < shingle_k:
            return {" ".join(toks)}
        return {
            " ".join(toks[i:i + shingle_k])
            for i in range(len(toks) - shingle_k + 1)
        }

    qterms = sorted({(int(qid), t) for qid, qtext in queries
                     for t in _qterms(qtext)})
    if not qterms:
        raise ValueError("bm25_topk_maxscore: empty query set")
    spark = df.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(qterms, "query_id long, term string")
    )
    return _maxscore_rank(
        df, qdf, k, text_col, id_col, pre_topk_buckets, split_df_ppm,
        shingle_k, diagnostics,
    )


def bm25_topk_maxscore_df(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    pre_topk_buckets: int = 32,
    split_df_ppm: int = 100_000,
    shingle_k: int | None = None,
    diagnostics: bool = False,
):
    """DataFrame-native :func:`bm25_topk_maxscore` — the query set is a
    DataFrame (no driver collect), which is exactly the workload where
    MaxScore's corpus-linear ub artifact amortizes: decontamination-by-
    search with the whole held-out split as queries, EXACT scores (the
    lossy max_df_ppm form is :func:`bm25_topk_df`). Same core, same
    proof/fallback semantics; the query-terms join strategy is left to
    the optimizer (broadcast when small, shuffle equi-join when the
    query set is corpus-sized — never BNLJ)."""
    unit = (
        tokens(F.col(query_text_col))
        if shingle_k is None
        else shingles(F.col(query_text_col), shingle_k)
    )
    qterms = queries_df.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.explode(F.array_distinct(unit)).alias("term"),
    )
    return _maxscore_rank(
        df, qterms, k, text_col, id_col, pre_topk_buckets, split_df_ppm,
        shingle_k, diagnostics,
    )


def _maxscore_rank(
    df: DataFrame,
    qdf: DataFrame,
    k: int,
    text_col: str,
    id_col: str,
    pre_topk_buckets: int,
    split_df_ppm: int,
    shingle_k: int | None,
    diagnostics: bool,
):
    """Shared MaxScore core: (query_id, term) frame → exact ranked
    top-k with upper-bound pruning + per-query fallback (see
    :func:`bm25_topk_maxscore` for the mechanism)."""
    from pyspark.sql.window import Window as _W

    if shingle_k is None:
        dl, tf = _doc_terms(df, text_col, id_col)
    else:
        dl, tf = _doc_shingle_terms(df, text_col, id_col, shingle_k)
    n_docs = int(dl.count())
    total_tokens = int(dl.agg(F.sum("dl")).collect()[0][0] or 0)
    if n_docs == 0 or total_tokens == 0:
        raise ValueError("bm25_topk_maxscore: empty corpus")
    avgdl_micro = (1_000_000 * total_tokens) // n_docs
    mm_expr = (
        f"(((2 * {n_docs} - 2 * df_docs + 1) * 1000000)"
        " DIV (2 * df_docs + 1))"
        " * ((2200000 * tf * 1000000)"
        f" DIV (1000000 * tf + 300000"
        f" + (900000000000 * dl) DIV {avgdl_micro}))"
    )

    from ..functions.cache import bounded_cache

    dfreq = bounded_cache(
        "text.maxscore_dfreq",
        tf.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("df_docs")
        ),
    )
    # corpus-side posting contributions (term×doc grain, linear) —
    # shared by the ub artifact, both phases, and the fallback. Spark
    # does NOT common-subexpression-eliminate identical subtrees across
    # joins (the uncached plan repeats the corpus scan per use-site),
    # so the substrate is bounded_cache'd like q24/q52's shingle caches
    # — ONE tokenize+scan, every consumer reads the cache.
    postings = bounded_cache(
        "text.maxscore_postings",
        tf.join(dfreq, "term").join(dl, "_id")
        .withColumn("_mm", F.expr(mm_expr))
        .select("term", "_id", "_mm"),
    )
    ub = postings.groupBy("term").agg(F.max("_mm").alias("ub_mm"))

    qt = qdf.join(dfreq, "term")  # absent terms contribute 0, as before
    split_cond = (
        F.col("df_docs") * F.lit(1_000_000)
        <= F.lit(int(split_df_ppm) * n_docs)
    )
    q_low = qt.filter(split_cond).select("query_id", "term")
    q_high = qt.filter(~split_cond).select("query_id", "term")

    low_contrib = postings.join(q_low, "term").select(
        "query_id", "_id", "_mm"
    )
    cand_ids = low_contrib.select("query_id", "_id").distinct()
    high_contrib = (
        cand_ids.join(q_high, "query_id")
        .join(postings, ["term", "_id"])
        .select("query_id", "_id", "_mm")
    )
    totals = (
        low_contrib.unionByName(high_contrib)
        .groupBy("query_id", "_id")
        .agg(
            F.expr("CAST(SUM(_mm) DIV 1000000 AS BIGINT)").alias(
                "score_micro"
            )
        )
    )

    order = [F.col("score_micro").desc(), F.col("_id").asc()]
    pre_w = _W.partitionBy(
        "query_id", F.pmod(F.xxhash64("_id"), F.lit(pre_topk_buckets))
    ).orderBy(*order)
    final_w = _W.partitionBy("query_id").orderBy(*order)
    ranked = (
        totals.withColumn("_pre", F.row_number().over(pre_w))
        .filter(F.col("_pre") <= k)
        .withColumn("rank", F.row_number().over(final_w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "_id", "score_micro")
    )

    # per-query exactness proof: θ_q (k-th ranked candidate score,
    # exists iff ≥ k candidates) vs B_q (sum of high-term upper bounds)
    theta = ranked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_nc"),
        F.min(
            F.when(F.col("rank") == F.lit(k), F.col("score_micro"))
        ).alias("_theta"),
    )
    bound = (
        q_high.join(ub, "term")
        .groupBy("query_id")
        .agg(
            F.expr("CAST(SUM(ub_mm) DIV 1000000 AS BIGINT)").alias("_b")
        )
    )
    # every query with ≥1 corpus-present term gets a verdict row
    verdicts = (
        qt.select("query_id").distinct()
        .join(theta, "query_id", "left")
        .join(bound, "query_id", "left")
        .withColumn(
            "_valid",
            F.col("_b").isNull()  # no high terms → nothing was pruned
            | (
                (F.coalesce(F.col("_nc"), F.lit(0)) >= F.lit(k))
                & F.col("_theta").isNotNull()
                & (F.col("_b") < F.col("_theta"))
            ),
        )
    )
    invalid = F.broadcast(
        verdicts.filter(~F.col("_valid")).select("query_id")
    )

    # fallback: exact unpruned scoring, restricted to the unprovable
    # queries (their candidate sets were incomplete — recompute whole)
    fb_contrib = postings.join(
        qt.join(invalid, "query_id").select("query_id", "term"), "term"
    )
    fb_totals = fb_contrib.groupBy("query_id", "_id").agg(
        F.expr("CAST(SUM(_mm) DIV 1000000 AS BIGINT)").alias("score_micro")
    )
    fb_ranked = (
        fb_totals.withColumn("_pre", F.row_number().over(pre_w))
        .filter(F.col("_pre") <= k)
        .withColumn("rank", F.row_number().over(final_w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "_id", "score_micro")
    )

    result = (
        ranked.join(invalid, "query_id", "left_anti")
        .unionByName(fb_ranked)
        .select(
            "query_id", "rank", F.col("_id").alias(id_col), "score_micro"
        )
    )
    if diagnostics:
        return result, verdicts
    return result


def portable_bucket_thresholds(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 3,
    k: int = 256,
) -> list[int]:
    """The (n_buckets−1) integer bucket thresholds CCNet-style
    perplexity bucketing needs (head/middle/tail at n_buckets=3):
    order statistics of the PORTABLE bottom-``k`` hash sample of the
    column's DISTINCT values. Threshold j (1-based) = the value at
    integer rank ``max(1, (j·n + n_buckets − 1) DIV n_buckets)`` of
    the sorted sample — never a float ceil (the misfloor rule).

    Scale shape: distinct substrate → TakeOrderedAndProject on
    (portable hash, value) — a distributed partial top-k, no global
    sort; the ≤k sample collects to the driver and the thresholds ship
    as LITERALS (a 1-row broadcast-threshold join would plan as BNLJ —
    the r8 sq_encode lesson). Deterministic across engines,
    partitionings, and runs; an oracle re-derives the sample with the
    md5-prefix hash and the same rank arithmetic (q22's xsamp/xthr
    CTEs). Values must be integral (the sketch float rule). Returns
    [] for an empty frame — callers bucket everything as 0."""
    from ..functions.expressions import portable_hash

    samp = (
        df.select(F.col(value_col).alias("_v"))
        .distinct()
        .withColumn("_h", portable_hash(F.col("_v").cast("string")))
        .orderBy("_h", "_v")
        .limit(k)
    )
    vals = sorted(r._v for r in samp.collect())
    if not vals:
        return []
    n = len(vals)
    return [
        vals[max(1, (j * n + n_buckets - 1) // n_buckets) - 1]
        for j in range(1, n_buckets)
    ]


def portable_bucket_thresholds_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 3,
    k: int = 256,
) -> DataFrame:
    """Per-GROUP portable bucket thresholds — CCNet's actual mechanism
    (perplexity terciles per LANGUAGE, not globally): for every group,
    exactly the thresholds ``portable_bucket_thresholds`` returns on
    that group's filtered frame (pinned by the per-group composition
    test), computed in ONE distributed pass with no driver loop.

    Returns a DataFrame ``(group_col, t1..t{n_buckets-1})`` — one row
    per group that has ≥1 value; a group absent from the result has no
    scoreable rows (callers bucket those 0 via a left join's NULLs).
    Unlike the scalar version this never collects: the threshold table
    is group-grain (bounded by the number of languages/domains), so
    consumers join it back with a **broadcast EQUI-join on the group
    key** — a real join key, so it plans as BroadcastHashJoin, never
    the BNLJ a 1-row threshold join would degenerate to (the r8
    sq_encode lesson only bites keyless joins).

    Shape: distinct (group, value) substrate → per-group bottom-k by
    (portable hash, value) via one row_number window → per-group rank
    + count windows → conditional-max rollup. Two shuffles on the
    group key over a distinct-values-sized frame; no global sort, no
    collect. Same integer rank arithmetic as the scalar version —
    ``max(1, (j·n + n_buckets − 1) DIV n_buckets)``, never a float
    ceil."""
    from pyspark.sql.window import Window as _W

    from ..functions.expressions import portable_hash

    samp = (
        df.select(
            F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
        )
        .distinct()
        .withColumn("_h", portable_hash(F.col("_v").cast("string")))
        .withColumn(
            "_kr",
            F.row_number().over(_W.partitionBy("_g").orderBy("_h", "_v")),
        )
        .filter(F.col("_kr") <= k)
    )
    ranked = samp.select(
        "_g",
        "_v",
        F.row_number().over(_W.partitionBy("_g").orderBy("_v")).alias("_rn"),
        F.count(F.lit(1)).over(_W.partitionBy("_g")).alias("_n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("_rn")
                == F.greatest(
                    F.lit(1),
                    F.expr(
                        f"({j} * _n + {n_buckets - 1}) DIV {n_buckets}"
                    ),
                ),
                F.col("_v"),
            )
        )
        .cast("long")
        .alias(f"t{j}")
        for j in range(1, n_buckets)
    ]
    return ranked.groupBy("_g").agg(*aggs).withColumnRenamed("_g", group_col)


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram Shannon entropy in FIXED-POINT micro-bits
    (integer-exact, engine-portable): with per-token counts c and
    n = Σc,

        entropy_micro = L(n) − (Σ c·L(c)) DIV n,   L = log2_micro

    — algebraically ``−Σ (c/n)·log2(c/n)`` with every log a
    LOG2_TABLE_MICRO lookup and every decision on integers, so the
    value is bit-identical across engines (the quality_logit
    discipline; quantization error bounded by the table's <0.0056-bit
    mantissa truncation). Low entropy ⇒ repetitive/keyword-stuffed
    text (the information-theoretic generalization of Gopher's
    top_token_frac: sensitive to the WHOLE count distribution, not
    just the mode). Returns (id, entropy_micro); 0 for empty or
    single-distinct-token docs.

    Shape: one (doc, token) groupBy (bounded grain, hashes shuffle —
    never text), the log lookup is one constant-array element_at per
    row, one groupBy back to doc grain. Headroom: Σ c·L(c) ≤ n·63·10⁶
    — int64-safe to ~10¹¹ tokens per document."""
    from ..functions.expressions import log2_micro_sql

    cnt = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.col(text_col))).alias("_tok"),
        )
        .groupBy("_id", "_tok")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .withColumn("_l", F.expr(log2_micro_sql("_c", "spark")))
    )
    agg = cnt.groupBy("_id").agg(
        F.sum("_c").cast("long").alias("_n"),
        F.sum(F.col("_c") * F.col("_l")).cast("long").alias("_s"),
    )
    ent = agg.select(
        "_id",
        F.expr(
            "CASE WHEN _n <= 0 THEN CAST(0 AS BIGINT) ELSE "
            + log2_micro_sql("_n", "spark")
            + " - (_s DIV _n) END"
        ).cast("long").alias("entropy_micro"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(ent, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("entropy_micro", F.lit(0)).cast("long").alias(
                "entropy_micro"
            ),
        )
    )


def bigram_cross_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The CCNet/KenLM perplexity filter PROPER, engine-portable: per
    document, the average negative log2 probability of its token
    transitions under an add-one-smoothed corpus bigram LM —

        p(b|a)   = (c(a b) + 1) / (c(a) + V)
        xent     = (Σ over doc bigrams [L(c(a)+V) − L(c(a b)+1)])
                   DIV n_bigrams          (micro-bits, L = log2_micro)

    where c(·) are CORPUS counts and V the corpus unigram vocabulary
    size. Low cross-entropy = fluent, corpus-typical text; high =
    garbage/wrong-language — the actual quantity CCNet thresholds,
    not the coverage proxy (:func:`corpus_bigram_coverage` survives
    as the cheaper screen). Every log is a LOG2_TABLE_MICRO lookup,
    so the score is bit-identical across engines.

    Returns (id, n_bigrams, xent_micro_bits); docs with <2 tokens
    emit (0, 0) — nothing to score.

    Shape: the LM "training" is two corpus groupBys (bigram counts,
    unigram counts — counts only, never text); the log lookups run on
    the COUNT tables (vocabulary grain); the doc side joins its
    bigram occurrences to the two stat tables by gram key (hash
    equi-joins; a hot transition is count-carrying, not pair-
    exploding) and folds integer sums. Headroom: per-bigram cost
    ≤ 63·10⁶, so Σ is int64-safe to ~10¹¹ bigrams per doc.

    STALENESS (r18, ADVICE r17): the vocabulary size memoizes in the
    plan-hash-keyed slot ``text.xent_vocab`` — callers re-scoring
    after the input path's files were swapped underneath an identical
    plan must ``release_scalar()`` it first (functions/cache.py)."""
    from ..functions.expressions import log2_micro_sql

    bg = df.select(
        F.col(id_col).alias("_id"), F.explode(bigrams(F.col(text_col))).alias("_g")
    ).withColumn("_a", F.split(F.col("_g"), " ", 2).getItem(0))
    uni = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    from ..functions.cache import bounded_scalar

    # r17: memoized per corpus plan (the q24 ngram_n_docs pattern)
    vocab = bounded_scalar(
        "text.xent_vocab",
        uni,
        lambda: int(uni.select("_t").distinct().count()),
    )
    uni_c = (
        uni.groupBy(F.col("_t").alias("_a"))
        .agg(F.count(F.lit(1)).cast("long").alias("_ca"))
        .withColumn("_cav", F.col("_ca") + F.lit(vocab))
        .select("_a", F.expr(log2_micro_sql("_cav", "spark")).alias("_la"))
    )
    bg_c = (
        bg.groupBy("_g")
        .agg(F.count(F.lit(1)).cast("long").alias("_cg"))
        .withColumn("_cg1", F.col("_cg") + F.lit(1))
        .select("_g", F.expr(log2_micro_sql("_cg1", "spark")).alias("_lg"))
    )
    scored = (
        bg.join(bg_c, "_g")
        .join(uni_c, "_a")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.col("_la") - F.col("_lg")).cast("long").alias("_s"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.expr(
                "CAST(coalesce(_s, 0) DIV greatest(coalesce(n_bigrams, 0), 1)"
                " AS BIGINT)"
            ).alias("xent_micro_bits"),
        )
    )


def textrank_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
) -> DataFrame:
    """The TextRank co-occurrence graph (Mihalcea & Tarau 2004): an
    undirected edge between two DISTINCT words that co-occur within
    ``window`` token positions in any document. Returned as a directed
    (src, dst) string-node edge list carrying BOTH directions —
    :func:`~..operators.graph.pagerank` collapses duplicates, so the
    distinct pair set is the classic binary co-occurrence graph.

    Plan shape: posexplode the token array once, then one lead() per
    gap over the SAME (doc, pos) window — O(n_tokens × window) rows,
    no self-join (the r7 bigram lesson: lead over the exploded
    substrate, never transform() re-inlining split())."""
    if int(window) < 2:
        raise ValueError("textrank window must be >= 2 (adjacent words)")
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(tokens(F.col(text_col))).alias("_p", "_t"),
    )
    w = Window.partitionBy("_d").orderBy("_p")
    pairs = None
    for g in range(1, int(window)):
        p = toks.select(
            F.col("_t").alias("a"), F.lead("_t", g).over(w).alias("b")
        ).filter(F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def textrank_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
    n_iter: int = 4,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**12,
) -> DataFrame:
    """Corpus keyword scores = integer PageRank over the TextRank
    co-occurrence graph — the graph×text composition: every word is a
    node, mass flows along co-occurrence, and the top-mass words are
    the corpus keywords. Returns (node, mass) with string word nodes
    (graph._PRState is node-type-agnostic). Fully oracle-able: the
    edge derivation is one SQL subquery (LATERAL position enumeration)
    fed to graph.pagerank_oracle_sql's chained CTEs — an iterative
    NLP algorithm under an exact cross-engine contract.

    The co-occurrence graph is undirected, so every node has out-edges
    and the dangling term is identically zero; damping still mixes in
    the uniform teleport each round. Scale shape: the graph is
    VOCABULARY-grain (nodes = distinct words, edges ≤ min(corpus
    windows, |V|²)) — corpus size only affects the one edge-derivation
    pass, never the iteration loop."""
    from . import graph

    return graph.pagerank(
        textrank_edges(df, text_col, id_col, window),
        n_iter=n_iter,
        damping=damping,
        scale=scale,
    )


def textrank_edges_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    window: int = 2,
) -> str:
    """DuckDB twin of :func:`textrank_edges` — a single subquery
    (both directions via UNION ALL) suitable as
    ``pagerank_oracle_sql(edges_sql=...)``."""
    if int(window) < 2:
        raise ValueError("textrank window must be >= 2 (adjacent words)")
    pairs = f"""
        SELECT t[i] AS a, t[i + g] AS b
        FROM (SELECT string_split_regex(trim(text), '\\s+') AS t
              FROM ({docs_sql})),
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) gi,
             LATERAL (SELECT unnest(generate_series(1, {int(window) - 1})) AS g) gg
        WHERE len(t) >= 2 AND i + g <= len(t) AND t[i] <> t[i + g]
    """
    return (
        f"SELECT a AS src, b AS dst FROM ({pairs}) "
        f"UNION ALL SELECT b AS src, a AS dst FROM ({pairs})"
    )
