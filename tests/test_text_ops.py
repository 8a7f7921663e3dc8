"""Edge-case tests for the text/similarity operator internals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    similarity,
    text,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id_und_when_no_markers(spark):
    out = {r.doc_id: r.predicted_lang for r in text.language_id(
        _docs(spark, [(1, "zzz qqq xxx www"), (2, "the cat and the dog is here")])
    ).collect()}
    assert out[1] == "und"
    assert out[2] == "en"


def test_language_id_tiebreak_alphabetical(spark):
    # one 'en' marker and one 'de' marker → tie → lexicographically first (de)
    out = text.language_id(_docs(spark, [(1, "the und")])).collect()[0]
    assert out.score_en == 1 and out.score_de == 1
    assert out.predicted_lang == "de"


def test_shingles_short_doc_falls_back_to_whole_text(spark):
    df = _docs(spark, [(1, "only two")])
    out = df.select(text.shingles(F.col("text"), 3).alias("s")).collect()[0]["s"]
    assert out == ["only two"]


def test_token_count_handles_messy_whitespace(spark):
    df = _docs(spark, [(1, "  a   b\tc \n d  ")])
    assert text.token_count(df).collect()[0].n_tokens == 4


def test_quality_features_ratios_bounded(spark):
    df = _docs(spark, [(1, "ABC 123 def!!"), (2, "x")])
    for r in text.quality_features(df).collect():
        for c in ("punct_ratio", "digit_ratio", "upper_ratio"):
            assert 0.0 <= r[c] <= 1.0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = _docs(spark, [(1, "Hello   World"), (2, "hello world"), (3, "hello  world ")])
    fps = [r.fingerprint for r in text.fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]


def test_rolling_fingerprint_deterministic_and_distinct(spark):
    df = _docs(spark, [(1, "abc"), (2, "abc"), (3, "acb")])
    out = {r.doc_id: r.h for r in df.select(
        "doc_id", text.rolling_fingerprint(F.col("text")).alias("h")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]  # order-sensitive (rolling, not bag-of-chars)


def test_bpe_ish_tokens_split_classes(spark):
    df = _docs(spark, [(1, "Hello42, world!!")])
    toks = df.select(text.bpe_ish_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["hello", "42", ",", "world", "!!"]


def test_lsh_bucket_deterministic_across_sessions(spark):
    planes = similarity.hyperplanes(4, 8)
    again = similarity.hyperplanes(4, 8)
    assert planes == again  # fixed-seed splitmix, no RNG state
    df = spark.createDataFrame(
        [(1, [0.5] * 8), (2, [-0.5] * 8)], "vec_id long, embedding array<float>"
    )
    b = {r.vec_id: r.b for r in df.select(
        "vec_id", similarity.lsh_bucket(F.col("embedding"), planes).alias("b")).collect()}
    b2 = {r.vec_id: r.b for r in df.select(
        "vec_id", similarity.lsh_bucket(F.col("embedding"), planes).alias("b")).collect()}
    assert b == b2
    # opposite vectors land in complementary buckets
    assert b[1] != b[2]


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<double>, b array<double>",
    )
    out = [r.c for r in df.select(similarity.cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(0.0)


def test_repetition_profile(spark):
    """Hand-computable repetition signals: a spammy doc (one token
    dominating), a diverse doc, and a repeated-phrase doc."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "buy buy buy buy now"),          # 5 tokens, 'buy'×4
        (2, "a fresh diverse set of words"),  # all distinct
        (3, "very good very good very good"),  # bigram 'very good'×3
        (4, "single"),                        # <2 tokens: no bigrams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text_ops.repetition_profile(df).collect()}

    assert out[1].n_tokens == 5 and out[1].n_distinct_tokens == 2
    assert out[1].top_token_frac == 4 / 5
    assert out[1].distinct_token_ratio == 2 / 5
    # bigrams of doc1: 'buy buy'×3, 'buy now' → top 3 of 4
    assert out[1].top_bigram_frac == 3 / 4

    assert out[2].distinct_token_ratio == 1.0
    assert out[2].top_token_frac == 1 / 6
    assert out[2].top_bigram_frac == 1 / 5

    # doc3: tokens very×3 good×3 → top 3/6; bigrams: 'very good'×3,
    # 'good very'×2 → top 3/5
    assert out[3].top_token_frac == 3 / 6
    assert out[3].top_bigram_frac == 3 / 5

    assert out[4].n_tokens == 1 and out[4].top_bigram_frac == 0.0
    assert out[4].top_token_frac == 1.0

    # dup_trigram_frac (r8): doc1 trigrams = 'buy buy buy'x2 + 'buy buy
    # now' -> 2 duplicated occurrences of 3; doc2 all distinct -> 0;
    # doc3 'very good very'x2 + 'good very good'x2 -> 4/4; <3 tokens -> 0
    assert out[1].dup_trigram_frac == 2 / 3
    assert out[2].dup_trigram_frac == 0.0
    assert out[3].dup_trigram_frac == 1.0
    assert out[4].dup_trigram_frac == 0.0


def test_bpe_train_and_apply(spark):
    """BPE end-to-end: training learns the frequent pairs of a
    hand-built corpus deterministically; application segments by merge
    rank at the distinct-pretoken grain and sums per document."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "low low low lower lower lowest"),
        (2, "new newer newest new new"),
        (3, "low new low new"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = text_ops.train_bpe(df, n_merges=10, min_freq=1)
    assert merges, "no merges learned"
    assert merges == text_ops.train_bpe(
        df.repartition(7), n_merges=10, min_freq=1
    ), "training must be partition-invariant"
    # 'low' appears 7 times, 'new' 6: their pairs must merge first
    first = {("l", "o"), ("o", "w"), ("lo", "w"), ("l", "ow")}
    assert merges[0] in first

    ranks = {p: i for i, p in enumerate(merges)}
    # with enough merges 'low' collapses to one token
    assert text_ops.bpe_segment("low", ranks) == ["low"]
    # unseen words degrade to finer segments but never crash
    assert "".join(text_ops.bpe_segment("glower", ranks)) == "glower"

    counts = {
        r.doc_id: r.n_bpe_subtokens
        for r in text_ops.apply_bpe(df, merges).collect()
    }
    # doc 3: 'low'x2 + 'new'x2; both learned words segment identically
    n_low = len(text_ops.bpe_segment("low", ranks))
    n_new = len(text_ops.bpe_segment("new", ranks))
    assert counts[3] == 2 * n_low + 2 * n_new
    # sanity: counts bounded by characters and at least pretoken count
    assert 6 <= counts[1] <= len("lowlowlowlowerlowerlowest")


def test_bpe_empty_merges_counts_chars(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    df = spark.createDataFrame([(1, "ab cd!")], ["doc_id", "text"])
    out = text_ops.apply_bpe(df, []).collect()[0]
    # pretokens: 'ab', 'cd', '!' -> 2 + 2 + 1 characters
    assert out.n_bpe_subtokens == 5


def test_quality_filter_rules_and_reasons(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "a clean and nicely varied sentence with plenty of words here"),
        (2, "spam spam spam spam spam spam spam spam"),       # low diversity + phrase
        (3, "hi"),                                            # too few tokens
        (4, "1234 5678 9999 0000 1111 2222 3333 4444 55 66"),  # digit heavy
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text_ops.quality_filter(df).collect()}
    assert out[1].qc_pass and out[1].qc_fail_reasons == ""
    assert not out[2].qc_pass
    assert "low_diversity" in out[2].qc_fail_reasons
    assert "repeated_phrase" in out[2].qc_fail_reasons
    # reasons are sorted CSV
    parts = out[2].qc_fail_reasons.split(",")
    assert parts == sorted(parts)
    assert not out[3].qc_pass and "too_few_tokens" in out[3].qc_fail_reasons
    assert not out[4].qc_pass and "digit_heavy" in out[4].qc_fail_reasons


def test_apply_bpe_keeps_empty_documents(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    df = spark.createDataFrame(
        [(1, "some words"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.n_bpe_subtokens for r in text_ops.apply_bpe(df, []).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] > 0 and out[2] == 0 and out[3] == 0


def test_quality_logit_idiv_and_edges(spark):
    """quality_logit (r8): _idiv must equal Python // for nonneg int64
    operands (the double-misfloor hazard it exists to avoid), and the
    logit is defined for degenerate docs (empty / all-punct / caps)."""
    import pyspark.sql.functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    pairs = [
        (0, 1), (1, 3), (10**15 + 1, 3), (2**52 + 1, 10**6),
        (999_999_999_999, 7), (1_000_000, 1_000_000), (5, 10**12),
    ]
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        (r.a, r.b): r.q
        for r in df.select(
            "a", "b", text_ops._idiv(F.col("a"), F.col("b")).alias("q")
        ).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == a // b, (a, b)

    rows = [(1, ""), (2, "!!! ??? ..."), (3, "ALL CAPS SHOUTING"),
            (4, "a normal little sentence with words")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    base = docs.withColumn("n_distinct_tokens", F.lit(3).cast("long"))
    out = {r.doc_id: r.quality_logit_micro
           for r in text_ops.quality_logit(base).collect()}
    assert all(isinstance(v, int) for v in out.values())
    # ordering sanity: normal text beats punctuation soup and shouting
    assert out[4] > out[2] and out[4] > out[3]


def test_quality_filter_copy_paste_rule(spark):
    """Opt-in 9th rule (r8): dup_trigram_frac gate fires on copy-paste
    repetition that the top-bigram rule alone can miss; default (None)
    leaves the 8-rule behavior untouched."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    # two distinct sentences alternated: top bigram frac stays modest,
    # but every trigram inside each sentence repeats
    s1 = "alpha beta gamma delta"
    s2 = "omega psi chi phi"
    spam = " ".join([s1, s2] * 6)
    clean = " ".join(f"w{i} x{i} y{i}" for i in range(8))
    df = spark.createDataFrame([(1, spam), (2, clean)], ["doc_id", "text"])

    default = {r.doc_id: r for r in text_ops.quality_filter(df).collect()}
    strict = {
        r.doc_id: r
        for r in text_ops.quality_filter(df, max_dup_trigram_frac=0.5).collect()
    }
    assert "copy_paste_repetition" not in default[1].qc_fail_reasons
    assert "copy_paste_repetition" in strict[1].qc_fail_reasons
    assert not strict[1].qc_pass
    assert "copy_paste_repetition" not in strict[2].qc_fail_reasons


def test_corpus_bigram_coverage_exact_and_duckdb_parity(spark):
    """Corpus-trained bigram coverage (r10): common transitions count
    as covered, rare ones don't, short docs score 0, and the whole
    computation matches a DuckDB re-derivation integer-for-integer."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the cat sat quietly here"),
        (4, "zz qq xx vv"),          # all-rare transitions → coverage 0
        (5, "one"),                   # single token → no bigrams → 0
        (6, "the cat"),               # one bigram, frequent → 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # threshold: 120000 ppm of 17 total bigrams = 2.04 → covered iff
    # the bigram occurs >= 3 times? cc*1e6 >= 120000*17 = 2040000 →
    # cc >= 2.04 → cc >= 3
    got = {
        r.doc_id: (r.n_bigrams, r.n_covered_bigrams, r.bigram_cov_micro)
        for r in text_ops.corpus_bigram_coverage(
            df, threshold_ppm=120_000
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    want = {
        d: (nb, nc, cov)
        for d, nb, nc, cov in con.execute(r"""
        WITH bg AS (
          SELECT doc_id, t[i] || ' ' || t[i+1] AS g
          FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents),
               LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) gg
          WHERE len(t) >= 2
        ), tot AS (SELECT COUNT(*) AS t FROM bg),
        cc AS (SELECT doc_id, g, COUNT(*) OVER (PARTITION BY g) AS c FROM bg),
        cov AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nbg,
                 CAST(SUM(CASE WHEN c * 1000000 >= 120000 * (SELECT t FROM tot)
                               THEN 1 ELSE 0 END) AS BIGINT) AS ncov
          FROM cc GROUP BY doc_id
        )
        SELECT d.doc_id, COALESCE(cov.nbg, 0), COALESCE(cov.ncov, 0),
               COALESCE(cov.ncov, 0) * 1000000
                   // GREATEST(COALESCE(cov.nbg, 0), 1)
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN cov ON cov.doc_id = d.doc_id
        """).fetchall()
    }
    assert got == want
    # semantic spot checks: 'the cat' (3x) and 'cat sat' (3x) are
    # covered; doc 4 is all-rare; doc 5 has no bigrams; doc 6 is 100%
    assert got[4] == (3, 0, 0)
    assert got[5] == (0, 0, 0)
    assert got[6] == (1, 1, 1_000_000)
    assert got[1][0] == 5 and 0 < got[1][1] < 5
    # determinism across partitionings
    again = {
        r.doc_id: (r.n_bigrams, r.n_covered_bigrams, r.bigram_cov_micro)
        for r in text_ops.corpus_bigram_coverage(
            df.repartition(7), threshold_ppm=120_000
        ).collect()
    }
    assert again == got


def _bm25_duckdb(con, queries, k):
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, qt in queries
        for t in sorted(set(qt.split()))
    )
    return con.execute(rf"""
    WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
               FROM documents),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(t) AS term FROM d) GROUP BY 1, 2),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfd FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    avg AS (SELECT (1000000 * CAST(SUM(dl) AS BIGINT)) // (SELECT n FROM n)
                AS avgdl FROM dl),
    q(query_id, term) AS (VALUES {qvals}),
    scored AS (
      SELECT q.query_id, tf.doc_id,
        SUM((((2 * (SELECT n FROM n) - 2 * dfd + 1) * 1000000)
                 // (2 * dfd + 1))
            * ((2200000 * tf * 1000000)
                 // (1000000 * tf + 300000
                     + (900000000000 * dl.dl) // (SELECT avgdl FROM avg)))
        ) AS mm
      FROM q JOIN tf USING (term) JOIN dfq USING (term)
             JOIN dl ON dl.doc_id = tf.doc_id
      GROUP BY 1, 2
    )
    SELECT query_id, rnk, doc_id, CAST(mm // 1000000 AS BIGINT)
    FROM (SELECT *, row_number() OVER
            (PARTITION BY query_id ORDER BY mm DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= {k} ORDER BY query_id, rnk
    """).fetchall()


def test_bm25_topk_duckdb_parity_and_semantics(spark):
    """Quantized BM25 (r10): the full integer pipeline — ln-free idf,
    fraction-cleared tf saturation, micro² sum — matches a DuckDB
    re-derivation row-for-row on a synthetic corpus AND on the real
    sf0.01 documents table; the two-level top-k equals the naive
    single-window form; results are partitioning-invariant."""
    import os

    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "spark shuffle join broadcast join"),
        (2, "spark window rank partition"),
        (3, "duck db oracle parity check"),
        (4, "join join join shuffle"),          # tf saturation visible
        (5, "broadcast"),                        # short doc, low dl
        (6, "totally unrelated words here now"),
    ]
    queries = [(10, "spark join"), (20, "broadcast"), (30, "absentterm")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.query_id, r.rank, r.doc_id, r.score_micro)
        for r in text_ops.bm25_topk(df, queries, k=3)
        .orderBy("query_id", "rank")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    assert got == _bm25_duckdb(con, queries, 3)
    # semantics: absent term -> query 30 returns nothing; doc 6 never
    # appears; the all-join doc ranks first for "spark join" despite
    # saturation only damping (not erasing) its tf=3
    by_q = {}
    for qid, rank, doc, score in got:
        by_q.setdefault(qid, []).append((rank, doc, score))
    assert 30 not in by_q
    assert all(doc != 6 for v in by_q.values() for _, doc, _ in v)
    assert {doc for _, doc, _ in by_q[20]} == {1, 5}
    # short doc 5 outranks doc 1 for "broadcast": same tf, smaller dl
    assert by_q[20][0][1] == 5
    # partitioning + bucket-count invariance (two-level == global topk)
    again = [
        (r.query_id, r.rank, r.doc_id, r.score_micro)
        for r in text_ops.bm25_topk(
            df.repartition(7), queries, k=3, pre_topk_buckets=1
        ).orderBy("query_id", "rank").collect()
    ]
    assert again == got

    # real-corpus parity at sf0.01
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    real_q = [(1, "scan filter pushdown"), (2, "join broadcast table")]
    got_real = [
        (r.query_id, r.rank, r.doc_id, r.score_micro)
        for r in text_ops.bm25_topk(docs, real_q, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    assert got_real == _bm25_duckdb(con2, real_q, 10)
    assert len(got_real) == 20


def test_tfidf_top_terms_duckdb_parity(spark):
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "alpha beta beta gamma"),
        (2, "alpha alpha delta"),
        (3, "gamma gamma gamma epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.doc_id, r.term_rank, r.term, r.tf, r.df_docs, r.tfidf_micro)
        for r in text_ops.tfidf_top_terms(df, k=2)
        .orderBy("doc_id", "term_rank")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    want = con.execute(r"""
    WITH tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS term
            FROM documents) GROUP BY 1, 2),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfd FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT doc_id, rnk, term, tf, dfd,
           tf * (((2 * (SELECT n FROM n) - 2 * dfd + 1) * 1000000)
                     // (2 * dfd + 1)) AS w
    FROM (SELECT tf.*, dfd, row_number() OVER (PARTITION BY doc_id
            ORDER BY tf * (((2 * (SELECT n FROM n) - 2 * dfd + 1) * 1000000)
                     // (2 * dfd + 1)) DESC, term) AS rnk
          FROM tf JOIN dfq USING (term))
    WHERE rnk <= 2 ORDER BY doc_id, rnk
    """).fetchall()
    assert got == want
    # doc 1's top term is 'beta' (tf=2, df=1) over stopword-ish 'alpha'
    assert got[0][2] == "beta"
    # determinism across partitionings
    again = [
        (r.doc_id, r.term_rank, r.term, r.tf, r.df_docs, r.tfidf_micro)
        for r in text_ops.tfidf_top_terms(df.repartition(5), k=2)
        .orderBy("doc_id", "term_rank")
        .collect()
    ]
    assert again == got


def test_token_entropy_exact_values(spark):
    """Fixed-point entropy (r10): uniform distributions hit exactly
    log2(n) micro-bits (table exact at powers of two), constant docs
    score 0, and values agree with a direct Python re-derivation."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        log2_micro_int,
    )
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "a b c d"),              # uniform over 4 -> exactly 2 bits
        (2, "x x x x"),              # constant -> 0
        (3, "a a b b c c d d"),      # uniform over 4, n=8 -> 2 bits
        (4, "a a a b"),              # skewed
        (5, "solo"),                 # single token -> 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.entropy_micro for r in text_ops.token_entropy(df).collect()
    }

    def ref(text):
        from collections import Counter

        c = Counter(text.split())
        n = sum(c.values())
        return log2_micro_int(n) - sum(
            v * log2_micro_int(v) for v in c.values()
        ) // n

    assert got == {i: ref(t) for i, t in rows}
    assert got[1] == 2_000_000 and got[3] == 2_000_000
    assert got[2] == 0 and got[5] == 0
    assert 0 < got[4] < 2_000_000
    # partitioning invariance
    again = {
        r.doc_id: r.entropy_micro
        for r in text_ops.token_entropy(df.repartition(4)).collect()
    }
    assert again == got


def test_bm25_topk_df_equals_list_form_and_decontaminates(spark):
    """DataFrame-native BM25 (r10): identical output to the list form
    on the same queries, and the decontamination-by-search
    composition — run the whole test split as queries against the
    train corpus — surfaces a planted contaminated pair as its
    query's top hit."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    queries = [(1, "scan filter pushdown"), (2, "join broadcast table")]
    got_list = [
        (r.query_id, r.rank, r.doc_id, r.score_micro)
        for r in text_ops.bm25_topk(docs, queries, k=7)
        .orderBy("query_id", "rank").collect()
    ]
    qdf = spark.createDataFrame(
        [(q, " ".join(t.split())) for q, t in queries],
        "query_id long, query_text string",
    )
    got_df = [
        (r.query_id, r.rank, r.doc_id, r.score_micro)
        for r in text_ops.bm25_topk_df(docs, qdf, k=7)
        .orderBy("query_id", "rank").collect()
    ]
    assert got_df == got_list

    # decontamination-by-search: train = the corpus plus one doc that
    # IS a test doc's text; test split = 3 docs as queries.
    test_rows = docs.orderBy("doc_id").limit(3).select("doc_id", "text").collect()
    contaminated = spark.createDataFrame(
        [(999_999, test_rows[1].text)], "doc_id long, text string"
    )
    train = docs.select("doc_id", "text").unionAll(contaminated)
    hits = text_ops.bm25_topk_df(
        train,
        spark.createDataFrame(
            [(r.doc_id, r.text) for r in test_rows],
            "query_id long, query_text string",
        ),
        k=3,
    ).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score_micro))
    top1 = {q: sorted(v)[0] for q, v in by_q.items()}
    mid = test_rows[1].doc_id
    # the contaminated query's two top hits are its own copy pair --
    # the original (lower id) first, the planted copy right behind
    # with the IDENTICAL score
    assert top1[mid][1] == mid
    pair = sorted(by_q[mid])[:2]
    assert pair[1][1] == 999_999 and pair[0][2] == pair[1][2]
    # uncontaminated queries show NO copy signature: their top two
    # hits have strictly different scores (an exact copy would tie
    # bit-for-bit). Note BM25 does NOT guarantee a long doc ranks
    # itself first — saturation caps per-term credit, so a shorter
    # term-dense doc can legitimately outrank the query's source.
    for q in (test_rows[0].doc_id, test_rows[2].doc_id):
        ranked = sorted(by_q[q])
        assert ranked[0][2] > ranked[1][2]


def test_bigram_cross_entropy_duckdb_parity_and_semantics(spark):
    """True bigram-LM scoring (r10): the add-one-smoothed corpus LM
    cross-entropy matches a DuckDB re-derivation built from the SAME
    log table integer-for-integer; fluent (corpus-typical) docs score
    LOWER than keyboard mash; short docs emit (0, 0)."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        log2_micro_sql,
    )
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the cat sat on the mat again"),
        (4, "zz qq xx vv pp"),       # transitions unseen elsewhere
        (5, "one"),                   # no bigrams
        (6, "the cat sat on the mat"),  # exact repeat of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.xent_micro_bits)
        for r in text_ops.bigram_cross_entropy(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    la = log2_micro_sql("_cav", "duckdb")
    lg = log2_micro_sql("_cg1", "duckdb")
    want = {
        d: (nb, x)
        for d, nb, x in con.execute(rf"""
        WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                     FROM documents),
        uni AS (SELECT doc_id, unnest(t) AS a FROM tok),
        bg AS (
          SELECT doc_id, t[i] AS a, t[i] || ' ' || t[i+1] AS g
          FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) gg
          WHERE len(t) >= 2
        ),
        v AS (SELECT COUNT(DISTINCT a) AS v FROM uni),
        uc AS (SELECT a, CAST(COUNT(*) AS BIGINT) + (SELECT v FROM v) AS _cav
               FROM uni GROUP BY 1),
        bc AS (SELECT g, CAST(COUNT(*) AS BIGINT) + 1 AS _cg1
               FROM bg GROUP BY 1),
        sc AS (
          SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS nb,
                 CAST(SUM({la} - {lg}) AS BIGINT) AS s
          FROM bg JOIN bc USING (g) JOIN uc USING (a)
          GROUP BY 1
        )
        SELECT d.doc_id, COALESCE(sc.nb, 0),
               COALESCE(sc.s, 0) // GREATEST(COALESCE(sc.nb, 0), 1)
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN sc USING (doc_id)
        """).fetchall()
    }
    assert got == want
    assert got[5] == (0, 0)
    # fluent docs (shared transitions) beat the all-rare doc 4
    assert max(got[1][1], got[2][1], got[3][1], got[6][1]) < got[4][1]
    # exact repeats score identically (same transitions, same LM)
    assert got[1] == got[6]
    # partitioning invariance
    again = {
        r.doc_id: (r.n_bigrams, r.xent_micro_bits)
        for r in text_ops.bigram_cross_entropy(df.repartition(5)).collect()
    }
    assert again == got


def test_bm25_max_df_ppm_impact_pruning(spark):
    """r11: the impact-pruning knob drops query terms with corpus df
    above the ppm threshold BEFORE candidate generation. Semantics pin:
    pruned scoring == unpruned scoring over queries with those terms
    REMOVED (same idf/sat arithmetic, smaller candidate set), and a
    query whose every term is pruned retrieves nothing."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    # 'the' in 5/6 docs (df 833333 ppm); content words are rare
    docs = spark.createDataFrame(
        [
            (1, "the parquet footer stores column statistics"),
            (2, "the shuffle service moves map output blocks"),
            (3, "the optimizer prunes partitions at plan time"),
            (4, "the broadcast join avoids the exchange"),
            (5, "the codegen stage fuses operators"),
            (6, "vectorized readers batch decode pages"),
        ],
        "doc_id long, text string",
    )
    queries = [(100, "the parquet statistics"), (200, "the the the")]
    got = sorted(
        tuple(r)
        for r in text_ops.bm25_topk(
            docs, queries, k=6, max_df_ppm=500_000
        ).collect()
    )
    # reference: same op, NO cut, queries with the high-df term removed
    want = sorted(
        tuple(r)
        for r in text_ops.bm25_topk(
            docs, [(100, "parquet statistics")], k=6
        ).collect()
    )
    assert got == want          # query 200 (all terms pruned) vanishes
    assert {r[0] for r in got} == {100}
    # default (None) is exact: the stopword still contributes
    full = text_ops.bm25_topk(docs, queries, k=6)
    assert {r.query_id for r in full.collect()} == {100, 200}


def test_q22_xent_bucket_zero_and_tercile_edges(spark, tmp_path):
    """r11: q22's xent_bucket 0-branch (docs with no bigrams are not
    scoreable) and the tercile thresholds on a corpus small enough to
    verify by hand. q22 reads only the documents table, so a synthetic
    sf_dir with just documents.parquet exercises the real gated plan."""
    import math

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans.queries import (
        catalog,
    )

    rows = [
        (1, "the cat sat on the mat", "en", "s1", 22),
        (2, "the cat sat on the rug today", "en", "s1", 28),
        (3, "zz qq xx vv pp ww", "en", "s2", 17),
        (4, "one", "en", "s2", 3),          # single token: no bigrams
        (5, "the cat sat on the mat", "en", "s1", 22),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r.doc_id: (r.n_bigrams, r.xent_micro, r.xent_bucket)
        for r in catalog()["q22_doc_quality"](spark, str(tmp_path)).collect()
    }
    assert out[4] == (0, 0, 0)              # unscoreable → bucket 0
    # identical docs share bucket; the all-rare doc lands in the tail
    assert out[1][2] == out[5][2]
    scored = sorted(
        (x, b) for nb, x, b in out.values() if nb > 0
    )
    # buckets are monotone in xent
    assert [b for _, b in scored] == sorted(b for _, b in scored)
    assert out[3][2] == 3                   # highest xent → tail
    # thresholds replicate the integer rank rule over distinct values
    distinct = sorted({x for nb, x, _ in out.values() if nb > 0})
    n = len(distinct)
    t1 = distinct[max(1, (n + 2) // 3) - 1]
    t2 = distinct[max(1, (2 * n + 2) // 3) - 1]
    for nb, x, b in out.values():
        if nb > 0:
            assert b == (1 if x <= t1 else 2 if x <= t2 else 3)


def test_ccnet_bucketing_composition_end_to_end(spark):
    """The CCNet pipeline shape proper (r11): score every doc under the
    corpus bigram LM (bigram_cross_entropy) → tercile thresholds from
    the portable bottom-k sample (portable_bucket_thresholds) → KEEP
    head+middle, drop the tail — then the survivors flow into sequence
    packing. Pins: thresholds equal the naive integer-rank selection
    over distinct values; the garbage docs (all-rare transitions) land
    in the tail and are dropped; fluent docs survive; the composition
    feeds pack_sequences without loss."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
        text as text_ops,
    )

    fluent = [
        (i, "the cat sat on the mat and the dog sat on the rug " + tail)
        for i, tail in [
            (1, "every day"), (2, "every night"), (3, "all morning"),
            (4, "all evening"), (5, "in the sun"), (6, "in the rain"),
        ]
    ]
    garbage = [(7, "zq wv xk pj qn br vt lz"), (8, "mm kk zz vv qq ww xx")]
    df = spark.createDataFrame(
        fluent + garbage, "doc_id long, text string"
    )
    xent = text_ops.bigram_cross_entropy(df)
    scoreable = xent.filter(F.col("n_bigrams") > 0)
    thr = text_ops.portable_bucket_thresholds(
        scoreable, "xent_micro_bits", n_buckets=3
    )
    assert len(thr) == 2 and thr[0] <= thr[1]

    # naive reference: same integer rank rule over distinct values
    distinct = sorted({r.xent_micro_bits for r in scoreable.collect()})
    n = len(distinct)
    want = [distinct[max(1, (j * n + 2) // 3) - 1] for j in (1, 2)]
    assert thr == want

    kept = df.join(
        xent.filter(F.col("xent_micro_bits") <= thr[1]).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    kept_ids = {r.doc_id for r in kept.collect()}
    # the all-rare docs score highest and fall in the dropped tail
    assert not ({7, 8} & kept_ids)
    assert {1, 2, 3} <= kept_ids

    # survivors pack without loss: every kept doc appears in a pack
    packed = curation.pack_sequences(
        kept.withColumn(
            "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
        ),
        budget_tokens=64,
    )
    assert {r.doc_id for r in packed.collect()} == kept_ids


def test_bm25_shingle_form_list_equals_df(spark):
    """r11: the shingle_k term unit must behave identically through the
    list and DataFrame query APIs (the Python-side shingler vs the
    shingles() column expression), including the whole-text fallback
    for queries shorter than k."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    docs = spark.createDataFrame(
        [
            (1, "the parquet footer stores column statistics for pruning"),
            (2, "the shuffle service moves map output blocks to reducers"),
            (3, "the parquet footer stores row group metadata"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    queries = [
        (100, "the parquet footer stores column statistics"),
        (200, "tiny doc"),                     # < k tokens: fallback
    ]
    got_list = sorted(
        tuple(r)
        for r in text_ops.bm25_topk(docs, queries, k=4, shingle_k=3).collect()
    )
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    got_df = sorted(
        tuple(r)
        for r in text_ops.bm25_topk_df(docs, qdf, k=4, shingle_k=3).collect()
    )
    assert got_list == got_df and got_list
    # the fallback query matches exactly its whole-text twin (doc 4)
    assert {r[2] for r in got_list if r[0] == 200} == {4}
    # shingle retrieval separates the sharing docs from the disjoint one
    hits_100 = {r[2] for r in got_list if r[0] == 100}
    assert 1 in hits_100 and 2 not in hits_100


def test_portable_bucket_thresholds_per_group_composition(spark):
    """r12 precursor (library-only): CCNet buckets are per LANGUAGE in
    the real pipeline. portable_bucket_thresholds takes any frame, so
    per-group thresholds are one call per group over a filtered frame —
    pin that the per-group thresholds differ from the global ones when
    the groups' score distributions differ, and that each group's
    thresholds replicate the naive integer-rank selection over that
    group's distinct values."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [("en", v) for v in (10, 20, 30, 40, 50, 60)] + [
        ("de", v) for v in (1000, 2000, 3000, 4000, 5000, 6000)
    ]
    df = spark.createDataFrame(rows, "lang string, score long")
    per_lang = {
        lang: text_ops.portable_bucket_thresholds(
            df.filter(F.col("lang") == lang), "score", n_buckets=3
        )
        for lang in ("en", "de")
    }
    for lang in ("en", "de"):
        distinct = sorted({v for lg, v in rows if lg == lang})
        n = len(distinct)
        want = [distinct[max(1, (j * n + 2) // 3) - 1] for j in (1, 2)]
        assert per_lang[lang] == want
    # global thresholds are a different (cross-language) split: the
    # global tail boundary sits inside de's range, far above en's
    global_thr = text_ops.portable_bucket_thresholds(df, "score", 3)
    assert global_thr not in (per_lang["en"], per_lang["de"])
    assert global_thr[1] > per_lang["en"][1]
    # empty group: no thresholds, caller buckets as 0
    assert text_ops.portable_bucket_thresholds(
        df.filter(F.col("lang") == "fr"), "score", 3
    ) == []


def test_portable_bucket_thresholds_by_group_equals_scalar(spark):
    """r12: the distributed per-group threshold table equals the scalar
    function called once per filtered group — same distinct substrate,
    same bottom-k hash sample, same integer rank arithmetic — and a
    group with no rows is simply absent (callers bucket 0 via the left
    join's NULLs). Partitioning-invariance checked at 1 and 7
    partitions."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = (
        [("en", v) for v in (10, 20, 30, 40, 50, 60)]
        + [("de", v) for v in (1000, 2000, 3000, 4000, 5000, 6000)]
        + [("zh", 777)]                      # single-value group
        + [("en", 10), ("de", 3000)]         # duplicates: distinct grain
    )
    df = spark.createDataFrame(rows, "lang string, score long")
    for parts in (1, 7):
        got = {
            r.lang: (r.t1, r.t2)
            for r in text_ops.portable_bucket_thresholds_by_group(
                df.repartition(parts), "lang", "score", n_buckets=3
            ).collect()
        }
        want = {
            lang: tuple(
                text_ops.portable_bucket_thresholds(
                    df.filter(F.col("lang") == lang), "score", n_buckets=3
                )
            )
            for lang in ("en", "de", "zh")
        }
        assert got == want
    # single-value group: both thresholds are that value
    assert got["zh"] == (777, 777)
    # empty input: empty table, not an error
    assert (
        text_ops.portable_bucket_thresholds_by_group(
            df.filter(F.col("lang") == "fr"), "lang", "score", 3
        ).count()
        == 0
    )


def test_q22_xent_bucket_lang_per_language_terciles(spark, tmp_path):
    """r12: q22's xent_bucket_lang buckets within each LANGUAGE (the
    CCNet mechanism proper). Synthetic sf_dir with two languages whose
    xent distributions are disjoint: globally, one language's docs all
    land in the head and the other's in the tail; per-language, EACH
    language spans head/middle/tail. Also pins the 0-branch and that
    per-lang thresholds replicate the integer rank rule per group."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans.queries import (
        catalog,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [
        # en: shared fluent base with varying rare tails
        (1, fluent + " every day", "en"),
        (2, fluent + " every night", "en"),
        (3, fluent + " zq wv xk", "en"),
        (4, fluent + " zq wv xk pj qn br", "en"),
        # de: all-rare transitions (high xent), with internal spread
        (5, "aa bb aa bb aa bb aa bb", "de"),
        (6, "aa bb cc dd aa bb cc dd", "de"),
        (7, "qq ww ee rr tt yy uu ii", "de"),
        (8, "zz xx cc vv bn nm mk kl", "de"),
        # unscoreable
        (9, "one", "en"),
    ]
    spark.createDataFrame(
        [(i, t, lg, "s1", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r.doc_id: r
        for r in catalog()["q22_doc_quality"](spark, str(tmp_path)).collect()
    }
    assert out[9].xent_bucket_lang == 0          # no bigrams → 0
    # per-lang thresholds replicate the rank rule within each language
    for lg in ("en", "de"):
        scored = {
            i: out[i].xent_micro
            for i, _, g in [(r[0], r[1], r[2]) for r in rows]
            if g == lg and out[i].n_bigrams > 0
        }
        distinct = sorted(set(scored.values()))
        n = len(distinct)
        t1 = distinct[max(1, (n + 2) // 3) - 1]
        t2 = distinct[max(1, (2 * n + 2) // 3) - 1]
        for i, x in scored.items():
            assert out[i].xent_bucket_lang == (
                1 if x <= t1 else 2 if x <= t2 else 3
            ), f"doc {i} lang {lg}"
        # each language spans more than one bucket on its own scale
        assert len({out[i].xent_bucket_lang for i in scored}) >= 2
    # the mechanism matters: per-language bucketing must actually
    # disagree with the global tercile split somewhere on this corpus
    assert any(
        out[i].xent_bucket_lang != out[i].xent_bucket
        for i, _, g in rows
        if out[i].n_bigrams > 0
    )


def test_bm25_maxscore_exact_vs_unpruned_and_lossy_cut(spark):
    """r12 (VERDICT r11 #5): MaxScore upper-bound pruning is EXACT —
    bm25_topk_maxscore == bm25_topk with NO cut, on a corpus with a
    Zipf head that is NOT a pure stopword (high-df but discriminative:
    huge tf in a few docs). On the same corpus the lossy max_df_ppm cut
    CHANGES the ranking (the exact failure mode the upper-bound
    machinery exists to fix). Diagnostics pin that the proof actually
    engaged (valid) for the mixed query and that an only-high-df query
    fell back — both paths exercised, both exact."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    # 40 docs. 'hub' appears in ALL docs (df=100%) but is decisive for
    # docs 0-1 where it dominates tf. Rare terms spread across docs.
    rows = []
    for i in range(40):
        rare = f"uniq{i} marker{i % 7}"
        hub = "hub " * (20 if i < 2 else 1)
        rows.append((i, (hub + rare + " filler common words here").strip()))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [
        (100, "hub uniq5"),        # mixed: rare candidates + hub added back
        (200, "uniq7 marker3"),    # all-rare: nothing pruned
        (300, "hub"),              # only-high: no candidates → fallback
    ]
    K = 5
    exact = sorted(
        map(tuple, text_ops.bm25_topk(df, queries, k=K).collect())
    )
    pruned, verd = text_ops.bm25_topk_maxscore(
        df, queries, k=K, split_df_ppm=500_000, diagnostics=True
    )
    assert sorted(map(tuple, pruned.collect())) == exact
    v = {r.query_id: r for r in verd.collect()}
    assert v[300]._valid is False          # only-high-df → fallback
    assert v[200]._valid == True           # noqa: E712 — no high terms
    # the lossy cut disagrees on this corpus: query 300 vanishes and
    # query 100 loses the hub contribution
    lossy = sorted(
        map(
            tuple,
            text_ops.bm25_topk(
                df, queries, k=K, max_df_ppm=500_000
            ).collect(),
        )
    )
    assert lossy != exact
    assert not any(r[0] == 300 for r in lossy)


def test_bm25_maxscore_matches_unpruned_on_real_corpus(spark, sf_smoke):
    """MaxScore == unpruned on the real documents corpus in BOTH term
    regimes: unigrams (31-word vocabulary — every term high-df, the
    degenerate case, everything falls back: correct-but-unpruned) and
    3-word shingles (discriminative df — pruning engages). Exactness
    must hold regardless of which regime a corpus lands in."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    qrows = [
        (1, "spark shuffle partitions and joins"),
        (2, "customer order value table scan"),
    ]
    for sk in (None, 3):
        exact = sorted(
            map(
                tuple,
                text_ops.bm25_topk(
                    docs, qrows, k=8, shingle_k=sk
                ).collect(),
            )
        )
        pruned = sorted(
            map(
                tuple,
                text_ops.bm25_topk_maxscore(
                    docs, qrows, k=8, shingle_k=sk, split_df_ppm=100_000
                ).collect(),
            )
        )
        assert pruned == exact, f"shingle_k={sk}"


def test_bm25_maxscore_exactness_randomized_sweep(spark):
    """r12: the MaxScore proof/fallback machinery must equal unpruned
    BM25 for ANY corpus shape and ANY split point — 6 seeded random
    corpora (Zipf-ish token draws so df spans the whole range) × 3
    split_df_ppm settings, k=3. A single mismatch means the bound
    arithmetic (B_q vs θ_q, strict tie handling) is wrong somewhere."""
    import random

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    vocab = [f"t{i}" for i in range(30)]
    for seed in range(6):
        rng = random.Random(seed)
        docs = []
        for d in range(rng.randint(8, 18)):
            n = rng.randint(3, 25)
            # Zipf-ish: low indices drawn far more often
            toks = [
                vocab[min(int(rng.expovariate(0.25)), len(vocab) - 1)]
                for _ in range(n)
            ]
            docs.append((d, " ".join(toks)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        queries = [
            (qi, " ".join(rng.sample(vocab, rng.randint(1, 4))))
            for qi in range(3)
        ]
        want = sorted(
            map(tuple, text_ops.bm25_topk(df, queries, k=3).collect())
        )
        for ppm in (50_000, 300_000, 900_000):
            got = sorted(
                map(
                    tuple,
                    text_ops.bm25_topk_maxscore(
                        df, queries, k=3, split_df_ppm=ppm
                    ).collect(),
                )
            )
            assert got == want, f"seed={seed} ppm={ppm}"


def test_ccnet_per_language_keep_composition(spark):
    """r12: the per-LANGUAGE CCNet pipeline shape — score under the
    corpus bigram LM, tercile thresholds PER LANGUAGE via the
    distributed by-group table joined back on lang, keep head+middle
    within each language. The point of per-lang calibration: a language
    whose xent distribution sits wholly above another's still keeps its
    own head+middle (global terciles would drop it entirely)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = (
        [(i, fluent + f" tail{i}", "en") for i in range(1, 7)]
        # de: all-rare transitions → every de doc scores far above en
        + [(i, f"q{i}a w{i}b e{i}c r{i}d t{i}e y{i}f", "de")
           for i in range(11, 17)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    xent = text_ops.bigram_cross_entropy(df).filter(F.col("n_bigrams") > 0)
    xl = xent.join(df.select("doc_id", "lang"), "doc_id")
    thr = text_ops.portable_bucket_thresholds_by_group(
        xl, "lang", "xent_micro_bits", n_buckets=3
    )
    kept = (
        xl.join(F.broadcast(thr), "lang")
        .filter(F.col("xent_micro_bits") <= F.col("t2"))
    )
    kept_by_lang = {
        lg: {r.doc_id for r in kept.filter(F.col("lang") == lg).collect()}
        for lg in ("en", "de")
    }
    # each language keeps SOME of its own docs (per-lang head+middle)
    assert kept_by_lang["en"] and kept_by_lang["de"]
    # global terciles would have dropped the entire de split: every de
    # xent exceeds every en xent on this corpus
    en_max = xl.filter(F.col("lang") == "en").agg(
        F.max("xent_micro_bits")
    ).collect()[0][0]
    de_min = xl.filter(F.col("lang") == "de").agg(
        F.min("xent_micro_bits")
    ).collect()[0][0]
    assert de_min > en_max
    # and within each language the drop is its own tail: every kept
    # xent ≤ every dropped xent, per language
    for lg in ("en", "de"):
        part = [
            (r.doc_id, r.xent_micro_bits)
            for r in xl.filter(F.col("lang") == lg).collect()
        ]
        kept_x = [x for d, x in part if d in kept_by_lang[lg]]
        drop_x = [x for d, x in part if d not in kept_by_lang[lg]]
        assert kept_x and (not drop_x or max(kept_x) <= min(drop_x))


def test_bm25_maxscore_list_equals_df(spark):
    """r12: the DataFrame-native MaxScore form must rank identically to
    the list form (shared core; only the query-term derivation
    differs), in both term regimes."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = []
    for i in range(30):
        hub = "hub " * (15 if i < 2 else 1)
        rows.append((i, (hub + f"uniq{i} marker{i % 5} filler words").strip()))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [(100, "hub uniq5 marker2"), (200, "uniq7 filler")]
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    for sk in (None, 2):
        want = sorted(map(tuple, text_ops.bm25_topk_maxscore(
            df, queries, k=4, split_df_ppm=400_000, shingle_k=sk
        ).collect()))
        got = sorted(map(tuple, text_ops.bm25_topk_maxscore_df(
            df, qdf, k=4, split_df_ppm=400_000, shingle_k=sk
        ).collect()))
        assert got == want, f"shingle_k={sk}"
        # and both equal the unpruned exact ranking
        exact = sorted(map(tuple, text_ops.bm25_topk(
            df, queries, k=4, shingle_k=sk
        ).collect()))
        assert got == exact, f"shingle_k={sk} vs unpruned"


def test_bm25_null_text_docs_counted_and_paths_identical(spark):
    """r18 (ADVICE r17): NULL text coalesces to '' inside the term
    substrates, so a NULL-text doc behaves as an EMPTY doc (phantom
    token, dl=1) on EVERY dl derivation — bm25_topk (sum(tf) dl) and
    bm25_topk_maxscore (size-array dl) stay bit-identical on corpora
    containing NULLs, and n_docs counts the NULL doc on both paths."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.cache import (
        release,
        release_scalar,
    )
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    rows = [
        (1, "spark shuffle join broadcast"),
        (2, "spark window rank"),
        (3, None),  # the doc the two derivations used to disagree on
        (4, "join shuffle join"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    queries = [(10, "spark join"), (20, "shuffle")]
    # fresh substrate state for this synthetic corpus
    release("nulltext.bm25_tf")
    release_scalar("nulltext.bm25_totals")
    plain = sorted(
        map(
            tuple,
            text_ops.bm25_topk(
                df, queries, k=4, cache_slot="nulltext"
            ).collect(),
        )
    )
    maxs = sorted(
        map(tuple, text_ops.bm25_topk_maxscore(df, queries, k=4).collect())
    )
    assert plain == maxs
    assert len(plain) > 0
    # the NULL doc never ranks (it has no real terms) but it must be
    # COUNTED: n_docs=4 changes every idf numerator vs n_docs=3, so
    # parity across the two paths above is only possible if both saw it
    release("nulltext.bm25_tf")
    release_scalar("nulltext.bm25_totals")
