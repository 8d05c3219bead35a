"""Text-analysis operators vs pure-Python ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.functions.text import (
    bpe_ish_token_count,
    clean_text,
    fingerprint,
    lang_id,
    quality_score,
    shingles,
    token_count,
)

TEXTS = [
    "the quick brown fox, jumps over!",
    "der hund und die katze ist da",
    "",
    "   ",
    "one",
    "a b a b a b",
    "x" * 600,
]


def _df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id long, text string")


def test_token_counts(spark):
    rows = _df(spark).select(
        "id", token_count(F.col("text")).alias("n")
    ).collect()
    for r in rows:
        assert r["n"] == len(TEXTS[r["id"]].split())


def test_bpe_ish_counts(spark):
    import re

    pat = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
    rows = _df(spark).select("id", bpe_ish_token_count(F.col("text")).alias("n")).collect()
    for r in rows:
        assert r["n"] == len(pat.findall(TEXTS[r["id"]])), TEXTS[r["id"]]


def test_lang_id_markers(spark):
    rows = {r["id"]: r["l"] for r in _df(spark).select("id", lang_id(F.col("text")).alias("l")).collect()}
    assert rows[0] == "en"  # 'the'
    assert rows[1] == "de"  # der/und/die/ist beat everything
    assert rows[2] == "und" and rows[4] == "und"


def test_quality_bounds_and_monotony(spark):
    rows = {r["id"]: r["q"] for r in _df(spark).select("id", quality_score(F.col("text")).alias("q")).collect()}
    assert all(0.0 <= q <= 1.0 for q in rows.values() if q is not None)
    # real sentence scores above empty string and repeated garbage
    assert rows[0] > rows[2]
    assert rows[0] > rows[5]


def test_shingles_and_fingerprint(spark):
    rows = _df(spark).select(
        "id", shingles(F.col("text"), 3).alias("sh"), fingerprint(F.col("text")).alias("fp")
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[0]["sh"][0] == "the quick brown"
    assert by_id[4]["sh"] == ["one"]  # < k tokens -> whole text
    import hashlib

    want = min(
        hashlib.md5(s.encode()).hexdigest()
        for s in by_id[0]["sh"]
    )
    assert by_id[0]["fp"] == want


def test_clean_text_matches_reference():
    """Engine vs a literal transcription of base_converter._clean_text."""
    import re as _re
    import unicodedata as _ud

    def ref_clean(text: str) -> str:
        if not text:
            return ""
        text = "".join(
            ch if ch in "\n\t" or not _ud.category(ch).startswith("C") else " "
            for ch in text
        )
        text = _re.sub(r"[^\S\n]+", " ", text)
        text = _re.sub(r"\n{3,}", "\n\n", text)
        text = "\n".join(line.strip() for line in text.split("\n"))
        return text.strip()

    cases = [
        "a\x00b\tc\n\n\n\nd  e\x07",
        "  leading\nand trailing  \n\xa0\xa0unicode\xa0space  ",
        "\n\n\nx\n\n\n",
        "",
    ]
    from eget_spark.session import get_spark

    spark = get_spark(cores=4)
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r["c"] for r in df.select(clean_text(F.col("t")).alias("c")).collect()]
    assert got == [ref_clean(c) for c in cases]


def test_stopword_ratio(spark):
    from eget_spark.functions.text import stopword_ratio

    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("foo bar baz",), ("",)], "t string"
    )
    got = [r["r"] for r in df.select(stopword_ratio(F.col("t")).alias("r")).collect()]
    assert got[0] == round(3 / 6, 6)  # the, on, the
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_vocab_growth_matches_python_oracle(spark):
    import re

    from eget_spark.functions.text import vocab_growth

    rows = [(i, f"alpha beta tok{i} tok{i % 3} gamma-{i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["threshold"]: r["vocab_size"]
        for r in vocab_growth(df, "id", "text", [0, 5, 20, 39, 100]).collect()
    }
    first = {}
    for i, text in rows:
        for t in re.split(r"[^a-z0-9]+", text.lower()):
            if t and t not in first:
                first[t] = i
    want = {
        th: sum(1 for f in first.values() if f <= th) for th in [0, 5, 20, 39, 100]
    }
    assert got == want
    # monotone non-decreasing; final threshold sees the whole vocabulary
    assert got[100] == len(first) and got[0] <= got[5] <= got[20] <= got[39]


def test_flesch_reading_ease_matches_python_oracle(spark):
    import re

    from eget_spark.functions.text import flesch_reading_ease

    rows = [
        (0, "The cat sat. It was happy! Was it?"),
        (1, "one two three four five"),          # no sentence punct -> 1
        (2, ""),                                  # zero words -> NULL score
        (3, "Extraordinary bureaucracy, undeniably."),
        (4, "a b c d e f g h...!!"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in flesch_reading_ease(df, "id", "text").collect()}
    for i, text in rows:
        ws = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        sent = max(1, len(re.findall(r"[.!?]+", text)))
        syl = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in ws)
        r = got[i]
        assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (
            sent, len(ws), syl,
        )
        if ws:
            want = round(206.835 - 1.015 * (len(ws) / sent) - 84.6 * (syl / len(ws)), 6)
            assert abs(r["flesch"] - want) < 1e-9
        else:
            assert r["flesch"] is None


def test_bpe_pair_counts_matches_python_oracle(spark):
    import re
    from collections import Counter

    from eget_spark.functions.text import bpe_pair_counts

    rows = [(i, f"lower newer wider low new {'x' * (i % 3 + 1)}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = [(r["pair"], r["n"]) for r in bpe_pair_counts(df, "id", "text", 10).collect()]
    c = Counter()
    for _, text in rows:
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    c[w[i : i + 2]] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_script_profile_pinned_cases(spark):
    from eget_spark.functions.text import script_profile

    rows = [
        (0, "hello world"),                     # pure latin
        (1, "привет мир"),                      # pure cyrillic
        (2, "hello мир 世界世界世界"),            # han wins (6 > 5 latin)
        (3, ""),                                # empty -> none
        (4, "1234 !!!"),                        # no script chars -> none
        (5, "abc абв"),                         # 3-3 tie -> latin (list order)
        (6, "naÃ¯ve cafÃ©"),                    # mojibake x2
        (7, "מרחבא שלום"),                      # hebrew
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_latin"], r["n_cyrillic"], r["n_han"], r["dominant"],
            r["dominant_permille"], r["mojibake_hits"],
        )
        for r in script_profile(df, "doc_id", "text").collect()
    }
    assert got[0] == (10, 0, 0, "latin", 10000 // 11, 0)
    assert got[1] == (0, 9, 0, "cyrillic", 9000 // 10, 0)
    assert got[2] == (5, 3, 6, "han", 6000 // len("hello мир 世界世界世界"), 0)
    assert got[3] == (0, 0, 0, "none", 0, 0)
    assert got[4] == (0, 0, 0, "none", 0, 0)
    assert got[5][3] == "latin" and got[5][0] == got[5][1] == 3
    # mojibake: Ã¯ and Ã© are hits; the Ã chars also count as latin
    assert got[6][5] == 2 and got[6][3] == "latin"
    assert got[7][3] == "hebrew"


def test_script_profile_zero_shuffle(spark):
    from eget_spark.functions.text import script_profile

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        script_profile(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_heaps_fit_matches_python_ols(spark):
    import math
    import re

    from eget_spark.functions.text import heaps_fit

    rows = [
        (i, " ".join(f"w{(i * 17 + j * 5) % 97}" for j in range(12)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    ths = [5, 10, 20, 40, 59, 500]
    out = heaps_fit(df, "id", "text", ths).collect()
    # python oracle: same checkpoints, same micro-quantized OLS
    first, per_doc = {}, {}
    for i, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        per_doc[i] = len(toks)
        for t in toks:
            first.setdefault(t, i)
    pts = []
    for th in ths:
        v = sum(1 for f in first.values() if f <= th)
        T = sum(c for d, c in per_doc.items() if d <= th)
        if v > 0 and T > 0:
            pts.append((th, T, v))
    xs = [round(math.log(T) * 1e6) for _, T, _ in pts]
    ys = [round(math.log(v) * 1e6) for _, _, v in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    lnk = round((sy / 1e6 - beta * (sx / 1e6)) / n, 6)
    assert len(out) == n
    for r in out:
        assert r["heaps_beta"] == beta and r["heaps_lnk"] == lnk
    got = {r["threshold"]: (r["cum_tokens"], r["vocab_size"]) for r in out}
    assert got == {th: (T, v) for th, T, v in pts}
    # sublinear vocabulary growth: 0 < beta < 1 on this synthetic corpus
    assert 0.0 < beta < 1.0
    # saturated threshold (500 > max id) pins the full-corpus point
    assert got[500] == (sum(per_doc.values()), len(first))


def test_zipf_fit_matches_python_ols(spark):
    import math
    import re
    from collections import Counter

    from eget_spark.functions.text import zipf_fit

    rows = [
        (i, " ".join("tok%d" % ((i * j) % 23) for j in range(1, 15)))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = zipf_fit(df, "id", "text", top_n=10).collect()
    freqs = Counter(
        t
        for _, text in rows
        for t in re.split(r"[^a-z0-9]+", text.lower())
        if t
    )
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    xs = [round(math.log(r + 1) * 1e6) for r in range(len(ranked))]
    ys = [round(math.log(f) * 1e6) for _, f in ranked]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    s_want = round(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6)
    lnc_want = round((sy / 1e6 + s_want * (sx / 1e6)) / n, 6)
    assert len(out) == 10
    got = {r["rank"]: (r["tok"], r["freq"]) for r in out}
    for i, (tok, f) in enumerate(ranked):
        assert got[i + 1] == (tok, f)
    for r in out:
        assert r["zipf_s"] == s_want and r["zipf_lnc"] == lnc_want
    # the synthetic distribution is roughly Zipf-ish: slope positive
    assert s_want > 0
