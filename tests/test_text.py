"""Text-operator unit/property tests (the oracle-matched queries cover the
cross-engine values; these cover semantics the SQL twin can't express)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_voting_system_spark.operators import textops


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_lang_id_beats_chance(spark, docs):
    """Marker-word language ID on the synthetic corpus: it can only be
    judged on docs whose text contains any markers; on those, prediction
    should be far above the 20% uniform-chance floor."""
    pred = textops.lang_id(docs)
    joined = pred.join(docs.select("doc_id", "lang"), "doc_id")
    scored = joined.filter(F.col("pred_lang") != "und")
    n = scored.count()
    if n == 0:
        pytest.skip("synthetic corpus has no marker words")
    acc = scored.filter(F.col("pred_lang") == F.col("lang")).count() / n
    assert acc > 0.2, f"lang-id accuracy {acc} not above chance"


def test_rolling_fingerprint_properties(spark):
    """fp_roll: equal texts → equal hashes; token order matters (unlike a
    bag-of-words hash); single-token docs hash to xxhash64(token)."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox"),
            (3, "fox brown quick the"),
            (4, "fox"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.fp_roll for r in textops.fingerprints(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    single = df.filter("doc_id = 4").select(
        F.pmod(F.xxhash64(F.lit("fox")), F.lit(2147483647)).alias("h")
    ).first()
    assert rows[4] == single.h


def test_quality_score_bounds_and_monotonicity(spark, docs):
    q = textops.quality_score(docs)
    mm = q.agg(F.min("quality"), F.max("quality")).first()
    assert 0.0 <= mm[0] and mm[1] <= 1.0 + 1e-9
    # a degenerate doc scores below a normal english sentence
    tiny = spark.createDataFrame(
        [(1, "1234 5678 9999"), (2, "the cat and the dog went to the park")],
        "doc_id long, text string",
    )
    r = {x.doc_id: x.quality for x in textops.quality_score(tiny).collect()}
    assert r[2] > r[1]


def test_token_frequencies_sum(spark, docs):
    freq = textops.token_frequencies(docs)
    total_from_freq = freq.agg(F.sum("freq")).first()[0]
    total_tokens = (
        textops.text_stats(docs).agg(F.sum("n_tokens")).first()[0]
    )
    assert total_from_freq == total_tokens


def test_length_quantiles_approx_brackets_exact(spark, sf_dir):
    """The mergeable percentile_approx sketch (the 100 TB path) must land
    within the exact distribution's neighborhood: between the two adjacent
    exact quantiles for every requested prob."""
    from realtime_voting_system_spark.operators.textops import length_quantiles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = length_quantiles(docs).first()
    approx = length_quantiles(docs, approx=True).first()
    assert approx["n_docs"] == exact["n_docs"]
    assert exact["min_tokens"] <= approx["p10"] <= exact["p50"]
    assert exact["p10"] <= approx["p50"] <= exact["p90"]
    assert exact["p50"] <= approx["p90"] <= exact["p99"]
    assert exact["p90"] <= approx["p99"] <= exact["max_tokens"]


def test_filter_top_quality_approx_close_to_exact(spark, sf_dir):
    """The sketch-threshold switch must keep approximately the same
    fraction as the exact percentile threshold (the sets may differ near
    the boundary; the fraction must not)."""
    from realtime_voting_system_spark.operators.textops import (
        filter_top_quality,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    exact = filter_top_quality(docs, keep_frac=0.25).count()
    approx = filter_top_quality(docs, keep_frac=0.25, approx=True).count()
    assert abs(exact / n - 0.25) < 0.02
    assert abs(approx - exact) / n < 0.1


def test_dsir_weights_favor_target_distribution(spark, sf_dir):
    """English docs (the target sample) must average a higher importance
    score than non-English docs, and every score is positive."""
    from realtime_voting_system_spark.operators import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = textops.dsir_weights(docs, docs.filter(F.col("lang") == "en"))
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    rows = joined.groupBy(F.col("lang") == "en").agg(
        F.avg("score").alias("m")
    ).collect()
    means = {r[0]: r.m for r in rows}
    assert means[True] > means[False]
    assert w.filter(F.col("score") <= 0).count() == 0


def test_strip_markup_semantics(spark):
    """Markup stripping contracts: script/style bodies vanish wholesale
    (case-insensitive, across newlines), tags drop but their text stays,
    entities decode exactly once (&amp;amp; → &amp;, never &), and
    malformed nesting degrades to text, not an error."""
    from pyspark.sql import functions as F

    from realtime_voting_system_spark.operators.textops import strip_markup

    rows = [
        (1, "a<SCRIPT>\nevil()\n</SCRIPT>b"),
        (2, "<p>keep <b>bold</b> text</p>"),
        (3, "&amp;lt; stays-as &lt;"),
        (4, "<em>unclosed"),
        (5, "x &nbsp;&nbsp; y"),
    ]
    df = spark.createDataFrame(rows, "i long, html string")
    got = {
        r.i: r.c
        for r in df.select("i", strip_markup(F.col("html")).alias("c")).collect()
    }
    assert got[1] == "a b"
    assert got[2] == "keep bold text"
    assert got[3] == "&lt; stays-as <"   # single decode, no double-decode
    assert got[4] == "unclosed"
    assert got[5] == "x y"               # nbsp + collapse


def test_sentence_segmentation_edge_rules(spark):
    """X258: every pinned edge rule, asserted on exact output — abbrev
    periods (incl. sentence-final 'etc.') never split; decimals and
    dotted versions never split; terminator RUNS split once; a
    terminator without following whitespace never splits; newline/tab
    count as whitespace; unterminated tails survive as sentences."""
    from realtime_voting_system_spark.functions.text import split_sentences

    cases = {
        "Dr. Smith went home. He slept soundly! Was it late?": [
            "Dr. Smith went home.", "He slept soundly!", "Was it late?",
        ],
        "Pi is 3.14. Euler's e is 2.718, i.e. transcendental.": [
            "Pi is 3.14.", "Euler's e is 2.718, i.e. transcendental.",
        ],
        "What?!  Really?No split without whitespace.": [
            "What?!", "Really?No split without whitespace.",
        ],
        "Version 1.2.3 shipped. Cost $3.50. Done.": [
            "Version 1.2.3 shipped.", "Cost $3.50.", "Done.",
        ],
        "Multi.\nLine. Breaks\ttabbed? Yes.": [
            "Multi.", "Line.", "Breaks\ttabbed?", "Yes.",
        ],
        "He cited Smith et al., etc. Then he stopped.": [
            # pinned rule: an abbreviation period never ends a sentence,
            # even when it genuinely should (high-precision choice)
            "He cited Smith et al., etc. Then he stopped.",
        ],
        "One sentence only": ["One sentence only"],
        "???": ["???"],
        "": [],
        "   ": [],
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i long, txt string"
    )
    got = {
        r.i: list(r.s)
        for r in df.select("i", split_sentences(F.col("txt")).alias("s"))
        .collect()
    }
    for i, (txt, want) in enumerate(cases.items()):
        assert got[i] == want, (txt, got[i])


def test_canonicalize_url_rules(spark):
    """X270 edge rules, one case per canonicalization clause: case-fold
    scheme/host only (path/query case preserved), www./default-port
    strip (non-default ports kept), utm/gclid/fbclid removal in any
    position (real params kept in ORIGINAL order), trailing-slash and
    fragment normalization, non-URL → ''."""
    from realtime_voting_system_spark.functions.text import canonicalize_url

    cases = [
        ("HTTPS://WWW.Example.COM:443/Path/X?b=2&a=1#frag",
         "https://example.com/Path/X?b=2&a=1"),
        ("http://example.com:80/a/", "http://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("https://example.com:80/a", "https://example.com:80/a"),
        ("https://e.com/p?utm_source=x&id=7&utm_campaign=y&fbclid=z",
         "https://e.com/p?id=7"),
        ("https://e.com/p?utm_source=x", "https://e.com/p"),
        ("https://e.com/p?gclid=abc&page=2", "https://e.com/p?page=2"),
        ("https://e.com///", "https://e.com"),
        ("ftp://Files.E.com/Data", "ftp://files.e.com/Data"),
        ("not a url", ""),
        ("https://e.com", "https://e.com"),
        # a '?' INSIDE the fragment is fragment content, not a query —
        # the old unanchored query regex resurrected it (advisor r8)
        ("https://e.com/p#/route?tab=1", "https://e.com/p"),
        ("https://e.com/p#a?b=1", "https://e.com/p"),
        ("https://e.com/p?real=1#a?fake=2", "https://e.com/p?real=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select(
            "i", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_url_dedup_collapses_variants_keeps_real_params(spark, sf_dir):
    """X270 planted contract: every 5-doc group yields exactly TWO
    canonicals — variants 0-3 (case/port/utm/slash/fragment noise)
    collapse with keep_id = the bare variant, while variant 4's ?page=
    param survives as a singleton."""
    from realtime_voting_system_spark.plans.parity import QUERIES

    rows = QUERIES["dedup_url_canonical"](spark, sf_dir).collect()
    by_n = {}
    for r in rows:
        by_n.setdefault(r.n_variants, []).append(r)
    assert set(by_n) == {4, 1}
    assert len(by_n[4]) == len(by_n[1])
    for r in by_n[4]:
        assert r.keep_id % 5 == 0        # the bare variant wins
        assert "?" not in r.canonical_url
    for r in by_n[1]:
        assert r.keep_id % 5 == 4
        assert "?page=" in r.canonical_url
        assert "utm" not in r.canonical_url


def test_unicode_normalize_fingerprints_converge(spark):
    """X271 planted contract: NFD, mojibake, and clean NFC spellings of
    the SAME document fingerprint differently before the screen and
    IDENTICALLY after it."""
    from realtime_voting_system_spark.functions.text import fingerprint_md5
    from realtime_voting_system_spark.operators import textops

    clean = "café au lait"
    variants = [
        (1, clean),
        (2, "café au lait"),                      # NFD
        (3, clean.encode("utf-8").decode("latin-1")),   # mojibake
    ]
    df = spark.createDataFrame(variants, "doc_id long, text string")
    before = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", fingerprint_md5(F.col("text")).alias("fp")
        ).collect()
    }
    assert len(set(before.values())) == 3  # three spellings, three md5s
    after = {
        r.doc_id: (r.fingerprint, r.clean_text, r.was_mojibake, r.was_nfd)
        for r in textops.normalize_unicode(df).collect()
    }
    assert len({v[0] for v in after.values()}) == 1  # converged
    assert all(v[1] == clean for v in after.values())
    assert after[2][3] and not after[2][2]    # NFD flagged, not mojibake
    assert after[3][2] and not after[3][3]    # mojibake flagged, not NFD
    assert not after[1][2] and not after[1][3]


def test_mojibake_roundtrip_agrees_with_ladder_and_passes_mixed(spark):
    """The general round-trip repair equals the pinned ladder on
    pure-mojibake strings, repairs sequences OUTSIDE the ladder
    (combining marks), and passes mixed clean+mojibake strings through
    unchanged (all-or-nothing round-trip — the ladder's local repair
    covers those)."""
    from realtime_voting_system_spark.operators import textops

    moj = lambda s: s.encode("utf-8").decode("latin-1")  # noqa: E731
    rows = [
        (1, moj("naïve résumé")),            # pinned alphabet
        (2, moj("café")),              # combining mark — not in ladder
        (3, "clean é plus " + moj("é")),     # mixed → round-trip fails
        (4, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in textops.fix_mojibake_roundtrip_pandas(df).collect()
    }
    assert got[1] == "naïve résumé"
    assert got[2] == "café"            # repaired (ladder can't)
    assert got[3] == rows[2][1]              # unchanged, all-or-nothing
    assert got[4] == "plain ascii"
    # ladder agreement on the pinned alphabet
    ladder = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", textops.fix_mojibake(F.col("text")).alias("t")
        ).collect()
    }
    assert ladder[1] == got[1]
    # and the ladder DOES repair the mixed case locally
    assert ladder[3] == "clean é plus é"


def test_ngram_lm_score_ranks_disfluent_text_lower(spark, sf_dir):
    """X274 semantics: with the LM trained on the corpus itself, a
    document whose bigrams are corpus-typical must out-score one made
    of the SAME unigrams in a corpus-atypical order (unseen bigrams →
    add-one floor), and the registered query's mean equals
    sum_micro / n_bigrams exactly."""
    from realtime_voting_system_spark.plans.parity import QUERIES

    rows = {r.doc_id: r
            for r in QUERIES["text_ngram_lm_score"](spark, sf_dir).collect()}
    for r in rows.values():
        if r.n_bigrams:
            assert r.mean_micro == r.sum_micro / r.n_bigrams
        else:
            assert r.mean_micro is None and r.sum_micro == 0
    # planted fluency contrast on a fresh tiny corpus
    from realtime_voting_system_spark.plans.quality_ops import (
        text_ngram_lm_score,
    )
    import tempfile, os
    tmp = tempfile.mkdtemp(prefix="lm_docs_")
    fluent = "the cat sat on the mat " * 5
    docs = [(i, fluent) for i in range(9)]
    docs.append((9, "mat the on sat cat the mat sat"))  # same words, shuffled
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "documents.parquet"))
    got = {r.doc_id: r.mean_micro
           for r in text_ngram_lm_score(spark, tmp).collect()}
    assert got[9] < min(got[i] for i in range(9))


def test_ngram_lm3_interpolation_rescues_common_continuations(spark, sf_dir):
    """X293 semantics: mean equals sum/n exactly; on a planted corpus a
    document of corpus-typical trigrams out-scores one with the SAME
    unigrams shuffled; and a document whose TRIGRAMS are unseen but
    whose bigrams/unigrams are corpus-typical out-scores the shuffled
    one too — the interpolation rescue a pure trigram add-one model
    would not provide."""
    from realtime_voting_system_spark.plans.parity import QUERIES

    rows = {r.doc_id: r
            for r in QUERIES["text_ngram_lm_score3"](spark, sf_dir).collect()}
    for r in rows.values():
        if r.n_trigrams:
            assert r.mean_micro == r.sum_micro / r.n_trigrams
        else:
            assert r.mean_micro is None and r.sum_micro == 0
    from realtime_voting_system_spark.plans.quality_ops import (
        text_ngram_lm_score3,
    )
    import tempfile, os
    tmp = tempfile.mkdtemp(prefix="lm3_docs_")
    fluent = "the cat sat on the mat " * 5
    docs = [(i, fluent) for i in range(9)]
    docs.append((9, "mat the on sat cat the mat sat cat on"))  # shuffled
    # novel trigram order, corpus-typical bigrams ("the cat", "cat sat",
    # "on the"): unseen trigrams, rescued through the bigram/unigram arms
    docs.append((10, "on the cat sat on the cat sat on the"))
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "documents.parquet"))
    got = {r.doc_id: r.mean_micro
           for r in text_ngram_lm_score3(spark, tmp).collect()}
    fluent_floor = min(got[i] for i in range(9))
    assert got[9] < fluent_floor
    assert got[9] < got[10] < fluent_floor


# ---------------------------------------------------------------------------
# X312 — BPE merge induction
# ---------------------------------------------------------------------------


def _ref_bpe(word_freqs, n_merges):
    """Pure-Python reference BPE trainer: weighted pair counts, argmax
    with (count desc, lexicographic) ties, left-to-right non-overlapping
    merge application — the textbook algorithm bpe_train must match."""
    vocab = {}
    for w, c in word_freqs.items():
        key = tuple(w)
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return merges


def test_bpe_train_matches_reference(spark, docs):
    """bpe_train's distributed loop (vocab-level pair counts, fold-based
    merge application) must reproduce the reference trainer's merge
    list exactly — order, symbols, and counts — on the real corpus."""
    import re

    rows = docs.select("text").collect()
    wf = {}
    for r in rows:
        for t in re.split(r"[^a-z0-9]+", r["text"].lower()):
            if t:
                wf[t] = wf.get(t, 0) + 1
    want = _ref_bpe(wf, 8)
    got = textops.bpe_train(docs, 8)
    assert got == want


def test_bpe_apply_merge_nonoverlapping(spark):
    """The fold-based merge application must merge left-to-right and
    never overlap: "aaaa" under (a,a) becomes [aa, aa], "aaa" [aa, a]."""
    df = spark.createDataFrame(
        [(1, "aaaa aaa a b ab",)], "doc_id long, text string"
    )
    merges = textops.bpe_train(df, 1)
    assert merges[0][:2] == ("a", "a")
    # apply directly and inspect the arrays
    out = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["b"],)],
        "syms array<string>",
    ).select(
        textops._apply_merge(F.col("syms"), "a", "a").alias("m")
    ).collect()
    assert [r["m"] for r in out] == [["aa", "aa"], ["aa", "a"], ["b"]]
