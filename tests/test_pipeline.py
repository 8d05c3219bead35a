"""End-to-end training-data preparation pipeline invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from eget_spark.pipeline import prepare_training_data


def _corpus(spark):
    rows = []
    # 30 good english docs, 3 exact dup groups, a couple near-dups, junk
    import random

    rng = random.Random(99)
    vocab = [f"word{k}" for k in range(400)]
    for i in range(30):
        # distinct token soup per doc + some english glue so lang-id and
        # quality pass, but shingle overlap across docs stays low
        soup = " ".join(rng.choice(vocab) for _ in range(40))
        # markdown-shaped: the semantic chunker needs headers (reference
        # quirk: header-less preamble is dropped, pinned in test_chunker)
        body = f"# Doc\n\nThe document is about {soup} and the system writes it."
        rows.append((i, body))
    rows.append((100, rows[5][1]))  # exact dup of doc 5
    rows.append((101, rows[5][1]))  # another exact dup
    rows.append((102, rows[7][1] + " extra"))  # near dup of doc 7
    rows.append((200, "x" * 3))  # junk: low quality
    rows.append((201, "!!! ??? ,,, ;;;"))  # junk: punctuation soup
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_training_data_invariants(spark):
    res = prepare_training_data(
        _corpus(spark), min_quality=0.4, languages=["en"], shingle_k=2
    )
    docs = res.chunks.sparkSession  # noqa: F841 (force nothing)
    kept = {r["id"] for r in res.docs.select("id").collect()}
    dropped = {r["id"]: r["reason"] for r in res.dropped.collect()}

    # junk filtered
    assert dropped[200] == "quality_filter"
    assert dropped[201] == "quality_filter"
    # exact dups collapsed to the min id
    assert 5 in kept and 100 not in kept and 101 not in kept
    assert dropped[100] == "exact_duplicate" and dropped[101] == "exact_duplicate"
    # near-dup (jaccard-verified) collapsed to its component min: 102 is a
    # true near-dup of 7 (shared suffix), glue-phrase LSH candidates are
    # rejected by the verification stage so 7 itself survives
    assert dropped[102] == "near_duplicate" and 7 in kept
    # no surviving text duplicates
    texts = [r["text"] for r in res.docs.collect()]
    assert len(texts) == len(set(texts))
    # chunks cover exactly the surviving docs, positions contiguous from 0
    chunk_ids = {r["doc_id"] for r in res.chunks.select("doc_id").collect()}
    assert chunk_ids == {str(k) for k in kept}
    pos = (
        res.chunks.groupBy("doc_id")
        .agg(F.min("position").alias("lo"), F.max("position").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    for r in pos:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
    # every kept/dropped doc accounted for exactly once
    all_ids = {r["doc_id"] for r in _corpus(spark).collect()}
    assert kept | set(dropped) == all_ids
    assert not (kept & set(dropped))


def test_prepare_sentence_chunker_and_stopword_gate(spark):
    res = prepare_training_data(
        _corpus(spark),
        min_quality=0.0,
        max_stopword_ratio=0.9,
        chunker="sentence",
        near_dup=False,
    )
    assert res.chunks.count() > 0
    assert "sentence_count" in res.chunks.columns


def test_prepare_entropy_and_embedding_stages(spark):
    rows = []
    for i in range(8):
        rows.append((i, f"# Doc\n\nThe document {i} is about topic{i} and the system writes it well."))
    rows.append((50, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"))  # entropy ~0
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # embeddings: docs 3 and 4 are semantic twins; others orthogonal-ish
    import random

    rng = random.Random(3)
    embs = []
    base34 = [rng.gauss(0, 1) for _ in range(16)]
    for i, _ in rows:
        if i == 4:
            v = [x + rng.gauss(0, 0.01) for x in base34]
        elif i == 3:
            v = base34
        else:
            v = [rng.gauss(0, 1) for _ in range(16)]
        embs.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(embs, "doc_id long, embedding array<double>")

    res = prepare_training_data(
        docs,
        min_entropy=1.0,
        near_dup=False,
        embeddings=emb,
        emb_threshold=0.9,
    )
    kept = {r["id"] for r in res.docs.select("id").collect()}
    dropped = {r["id"]: r["reason"] for r in res.dropped.collect()}
    assert dropped[50] == "quality_filter"  # entropy floor folded into keep
    assert 3 in kept and 4 not in kept
    assert dropped[4] == "embedding_near_duplicate"
    assert kept == {0, 1, 2, 3, 5, 6, 7}


def test_prepare_pii_scrub_stage(spark):
    df = _corpus(spark)
    # plant PII on doc 3; doc 5's dup group must still collapse (dedup
    # runs on raw bytes, scrub after)
    df = df.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 3,
            F.concat(
                F.col("text"),
                F.lit(" mail bob@example.com from 10.1.2.3 call +1-555-0100 end"),
            ),
        ).otherwise(F.col("text")),
    )
    res = prepare_training_data(
        df, min_quality=0.4, languages=["en"], shingle_k=2, scrub_pii=True
    )
    rows = {r["id"]: r for r in res.docs.collect()}
    assert 100 not in rows and 101 not in rows  # dedup unaffected
    r3 = rows[3]
    assert (r3["n_pii_emails"], r3["n_pii_ips"], r3["n_pii_phones"]) == (1, 1, 1)
    assert r3["text"].endswith(" mail <EMAIL> from <IP> call <PHONE> end")
    # counters are zero and text untouched elsewhere
    assert all(
        (v["n_pii_emails"], v["n_pii_ips"], v["n_pii_phones"]) == (0, 0, 0)
        for k, v in rows.items()
        if k != 3
    )
    # chunks inherit the scrubbed text
    chunk_text = " ".join(
        r["content"]
        for r in res.chunks.where(F.col("doc_id") == "3").collect()
    )
    assert "bob@example.com" not in chunk_text and "<EMAIL>" in chunk_text


def test_prepare_gopher_and_lm_stages(spark):
    rows = []
    # 20 healthy docs: enough words (>=50), stopwords, varied lines
    base = (
        "# Doc\n\nThe document describes the system and that it should "
        "have been written with care to be read of and by people. "
    )
    for i in range(20):
        rows.append((i, base + " ".join(f"term{i}x{k} value" for k in range(30))))
    # gopher trap: boilerplate-dominated doc (dup lines >> 0.30) that the
    # base quality gate would keep
    nav = "the menu is home and about with contact of course to be seen"
    rows.append((300, "# Doc\n\n" + "\n".join([nav] * 12)))
    # lm trap: healthy shape but out-of-distribution vocabulary
    rows.append(
        (
            301,
            base
            + " ".join(f"zzqx{k}v wvvqz{k} qqzx{k}b" for k in range(20)),
        )
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")

    res = prepare_training_data(
        df, languages=["en"], shingle_k=2, gopher_rules=True
    )
    dropped = {r["id"]: r["reason"] for r in res.dropped.collect()}
    kept = {r["id"] for r in res.docs.select("id").collect()}
    assert dropped.get(300) == "gopher_filter"
    assert all(i in kept for i in range(20)), dropped

    res2 = prepare_training_data(
        df.where(F.col("doc_id") != 300),
        languages=["en"],
        shingle_k=2,
        min_lm_score=-5.5,  # healthy docs score ~-4.4, the junk-vocab doc ~-6.4
    )
    dropped2 = {r["id"]: r["reason"] for r in res2.dropped.collect()}
    assert dropped2.get(301) == "lm_score_filter"
    # and the stage is off by default: same corpus, no lm floor -> 301 kept
    res3 = prepare_training_data(
        df.where(F.col("doc_id") != 300), languages=["en"], shingle_k=2
    )
    assert 301 in {r["id"] for r in res3.docs.select("id").collect()}


def test_prepare_round5_stages(spark):
    """min_flesch / adaptive_quality_den / best_representative /
    source_weights / split_by wire correctly and account every doc."""
    import hashlib

    docs = _corpus(spark).withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.lit("keepall")).otherwise(
            F.lit("rare")
        ),
    ).withColumn(
        "host", F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"))
    )
    res = prepare_training_data(
        docs,
        min_quality=0.3,
        adaptive_quality_den=10,
        best_representative=True,
        source_weights={"rare": 0.5},   # keepall unlisted -> rate 1.0
        mix_seed="m",
        split_by="host",
        split_seed="s",
    )
    surv = res.docs.collect()
    dropped = {r["id"]: r["reason"] for r in res.dropped.collect()}
    # full accounting: every input doc is surviving xor dropped
    ids = {r["id"] for r in surv}
    assert ids.isdisjoint(dropped)
    assert ids | set(dropped) == {r["doc_id"] for r in docs.collect()}
    # adaptive stage fired (bottom decile of en docs dropped)
    assert "adaptive_quality_filter" in set(dropped.values())
    # source sampling: every kept 'rare' doc passes the hash rule; every
    # sampled-out doc is 'rare' (keepall rate is 1.0)
    for r in surv:
        if r["source"] == "rare":
            assert int(hashlib.md5(f"m{r['id']}".encode()).hexdigest()[:15], 16) < int(
                0.5 * (1 << 60)
            )
    out_ids = {i for i, why in dropped.items() if why == "source_sampled_out"}
    srcs = {r["doc_id"]: r["source"] for r in docs.collect()}
    assert out_ids and all(srcs[i] == "rare" for i in out_ids)
    # split column present, group-consistent, and hash-derived
    names = ["train", "val", "test"]
    for r in surv:
        b = int(hashlib.md5(f"s{r['host']}".encode()).hexdigest()[:15], 16) % 10
        assert r["split"] == (names[0] if b < 8 else names[1] if b < 9 else names[2])
    # chunks only reference surviving docs
    chunk_ids = {
        int(r["doc_id"]) for r in res.chunks.select("doc_id").distinct().collect()
    }
    assert chunk_ids <= ids


def test_prepare_best_representative_keeps_highest_quality(spark):
    # two exact-ish near dups where the HIGHER id has higher quality:
    # default keeps lowest id, best_representative keeps the better doc
    base = (
        "# Doc\n\nThe quick brown fox jumps over the lazy dog and writes "
        "long sentences about the system of the world today."
    )
    richer = base + " Brilliant unique additions."
    docs = spark.createDataFrame(
        [(1, base), (2, richer)], "doc_id long, text string"
    )
    default = prepare_training_data(docs, near_dup_threshold=0.5)
    best = prepare_training_data(
        docs, near_dup_threshold=0.5, best_representative=True
    )
    d_ids = {r["id"] for r in default.docs.collect()}
    b_ids = {r["id"] for r in best.docs.collect()}
    # they form one near-dup cluster in both runs
    assert len(d_ids) == 1 and len(b_ids) == 1
    assert d_ids == {1}          # lowest-id convention
    assert b_ids == {2}          # higher quality wins


def test_prepare_min_flesch_floor(spark):
    # syllable-dense doc scores far below a simple one; floor drops it
    simple = "# Doc\n\nThe cat sat on the mat. It was fun. We like it a lot."
    dense = (
        "# Doc\n\nExtraordinary bureaucratic organizations habitually "
        "overcomplicate unintelligible administrative responsibilities."
    )
    docs = spark.createDataFrame(
        [(1, simple), (2, dense)], "doc_id long, text string"
    )
    res = prepare_training_data(docs, min_quality=0.0, min_flesch=50.0)
    assert {r["id"] for r in res.docs.collect()} == {1}
    assert {r["id"]: r["reason"] for r in res.dropped.collect()} == {
        2: "quality_filter"
    }
