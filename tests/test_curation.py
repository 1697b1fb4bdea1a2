"""Curation operators (pipelines/curation.py) vs direct Python oracles:
deterministic hash split, mixture sampling, benchmark decontamination, and
concat-and-chunk packing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.curation import (
    cap_per_group,
    chunk_documents,
    contamination_fraction,
    decontaminate,
    hash_split,
    hex_threshold,
    mixture_sample,
    pack_sequences,
    pack_summary,
    word_ngrams,
)

SF = "/root/testdata/sf0.001"


def _md5_prefix(i, salt):
    return hashlib.md5(f"{i}|{salt}".encode()).hexdigest()[:12]


def _py_split(i, fractions, salt):
    names = list(fractions)
    cum = 0.0
    p = _md5_prefix(i, salt)
    for name in names[:-1]:
        cum += fractions[name]
        if p < hex_threshold(cum):
            return name
    return names[-1]


def test_hex_threshold_bounds():
    assert hex_threshold(1.0) == "g" and hex_threshold(2.0) == "g"
    assert hex_threshold(0.0) == "" and hex_threshold(-1.0) == ""
    # fraction resolves to a 12-char hex cut strictly inside the range
    t = hex_threshold(0.5)
    assert len(t) == 12 and t == "800000000000"


def test_hash_split_matches_python_oracle(spark):
    fr = {"test": 0.1, "val": 0.2, "train": 0.7}
    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    got = dict(
        hash_split(df, fractions=fr, salt="s6").select("doc_id", "split").collect()
    )
    for i in range(3000):
        assert got[i] == _py_split(i, fr, "s6")
    # all three splits are populated and roughly proportional
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {"test", "val", "train"}
    assert abs(c["test"] / 3000 - 0.1) < 0.03
    assert abs(c["val"] / 3000 - 0.2) < 0.03


def test_hash_split_stable_under_repartition_and_salt(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = dict(hash_split(df, salt="x").select("doc_id", "split").collect())
    b = dict(
        hash_split(df.repartition(13), salt="x").select("doc_id", "split").collect()
    )
    assert a == b
    c = dict(hash_split(df, salt="y").select("doc_id", "split").collect())
    assert a != c  # salt actually moves the cut


def test_mixture_sample_matches_python_oracle(spark):
    rows = [(i, f"src{i % 3}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    kept = {
        r.doc_id
        for r in mixture_sample(df, rates, salt="m").select("doc_id").collect()
    }
    expect = {
        i
        for i, s in rows
        if _md5_prefix(i, "m") < hex_threshold(rates[s])
    }
    assert kept == expect
    assert all(i in kept for i, s in rows if s == "src0")
    assert not any(s == "src2" for i, s in rows if i in kept)


def test_word_ngrams_edges(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("  One  Two three  ",), ("",)], ["t"]
    )
    out = [r.g for r in df.select(word_ngrams(F.col("t"), 3).alias("g")).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []  # fewer tokens than n -> empty, not reversed sequence
    assert out[2] == ["one two three"]  # lowercased, whitespace-normalized
    assert out[3] == []


def test_decontaminate_planted(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "x alpha beta gamma delta epsilon y"),
            (2, "clean words only here nothing shared at all"),
            (3, "alpha beta gamma delta epsilon zeta alpha beta gamma delta epsilon zeta"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_contaminated_grams, r.contaminated)
        for r in decontaminate(train, bench, n=5).collect()
    }
    # python oracle: count train 5-gram instances present in the benchmark set
    def grams(t, n=5):
        w = t.lower().split()
        return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]

    bset = set(grams("alpha beta gamma delta epsilon zeta"))
    texts = {r.doc_id: r.text for r in train.collect()}
    for d, (cnt, flag) in out.items():
        exp = sum(g in bset for g in grams(texts[d]))
        assert cnt == exp and flag == (exp > 0)
    assert out[2] == (0, False)
    assert out[1][1] and out[3][1]


def _py_chunks(text, chunk, overlap):
    w = text.strip().split()
    if not w:
        w = [""]
    stride = chunk - overlap
    import math

    last = math.ceil(max(len(w) - chunk, 0) / stride)
    out = []
    for i in range(last + 1):
        s = i * stride  # 0-based
        piece = w[s : s + chunk]
        out.append((i, s + 1, len(piece), " ".join(piece)))
    return out


@pytest.mark.parametrize(
    "n_words,chunk,overlap",
    [(3, 8, 2), (8, 8, 2), (9, 8, 2), (20, 8, 2), (19, 8, 0), (25, 10, 9)],
)
def test_chunk_documents_oracle(spark, n_words, chunk, overlap):
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = sorted(
        (r.chunk_id, r.start_token, r.n_tokens, r.text)
        for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    )
    assert got == _py_chunks(text, chunk, overlap)
    # coverage law: dropping each chunk's leading overlap (except chunk 0)
    # and concatenating reconstructs the normalized document
    rebuilt = " ".join(
        t if i == 0 else " ".join(t.split()[overlap:]) for i, _, _, t in got
    ).strip()
    assert rebuilt == " ".join(text.split())


def test_chunk_documents_guard_and_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)
    res = chunk_documents(df, chunk_tokens=4, overlap=1)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    ).split("Initial Plan")[0]
    assert "Exchange" not in plan  # zero-shuffle per-row op


_B100 = "alpha beta gamma delta epsilon zeta eta theta"


def _cf_frames(spark):
    bench = spark.createDataFrame(
        [(100, _B100), (101, "one two three")],  # 101: < n words -> no grams
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "x " + _B100 + " y"),  # full inclusion -> frac 1.0
            (2, "p alpha beta gamma delta epsilon zeta q"),  # partial
            (3, "clean words only here nothing shared at all whatsoever"),
            (4, _B100 + " " + _B100),  # repetition must NOT inflate coverage
        ],
        ["doc_id", "text"],
    )
    return bench, train


def _py_contam_frac(bench_rows, train_rows, n, min_frac):
    def gset(t):
        w = t.lower().split()
        return {" ".join(w[i : i + n]) for i in range(max(len(w) - n + 1, 0))}

    want = {}
    for bid, bt in bench_rows:
        bg = gset(bt)
        if not bg:
            continue
        for tid, tt in train_rows:
            common = len(gset(tt) & bg)
            frac = common / len(bg)
            if frac >= min_frac:
                want[(tid, bid)] = (common, len(bg), frac)
    return want


@pytest.mark.parametrize("hash_grams", [True, False])
def test_contamination_fraction_oracle(spark, hash_grams):
    bench, train = _cf_frames(spark)
    got = {
        (r.doc_id, r.bench_id): (r.common_grams, r.n_bench_grams, r.frac)
        for r in contamination_fraction(
            train, bench, n=5, min_frac=0.4, hash_grams=hash_grams
        ).collect()
    }
    want = _py_contam_frac(
        [(r.doc_id, r.text) for r in bench.collect()],
        [(r.doc_id, r.text) for r in train.collect()],
        n=5,
        min_frac=0.4,
    )
    assert set(got) == set(want)
    for k, (c, nb, f) in want.items():
        assert got[k][0] == c and got[k][1] == nb
        assert got[k][2] == pytest.approx(f)
    # the planted invariants: full inclusion = 1.0; repetition doesn't inflate;
    # the short benchmark item and the clean doc never appear
    assert got[(1, 100)][2] == pytest.approx(1.0)
    assert got[(4, 100)][0] == got[(1, 100)][0]
    assert all(b != 101 for _, b in got)
    assert all(t != 3 for t, _ in got)


def test_contamination_fraction_plan(spark):
    bench, train = _cf_frames(spark)
    res = contamination_fraction(train, bench, n=5, min_frac=0.4)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    ).split("Initial Plan")[0]
    assert "CartesianProduct" not in plan
    # both the gram lookup and the sizes join must be broadcast (the training
    # side shuffles only the post-join hit pairs)
    assert plan.count("BroadcastHashJoin") >= 2


def test_decontaminate_string_and_hashed_grams_agree(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 37 == 0).select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 37 != 0).select("doc_id", "text")
    a = decontaminate(train, bench, n=8, hash_grams=True)
    b = decontaminate(train, bench, n=8, hash_grams=False)
    assert sorted(map(tuple, a.select("doc_id", "n_contaminated_grams").collect())) == sorted(
        map(tuple, b.select("doc_id", "n_contaminated_grams").collect())
    )


def test_pack_sequences_matches_python_oracle(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 700)) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "ntok"])
    out = pack_sequences(
        df,
        token_col="ntok",
        chunk_tokens=512,
        num_bins=8,
        bin_col=F.col("doc_id") % 8,
    )
    got = {
        r.doc_id: (r.pack_bin, r.n_tokens, r.chunk_id, r.chunk_offset)
        for r in out.collect()
    }
    # oracle: per bin, stream docs in id order, cumulative starting offset
    cum = {b: 0 for b in range(8)}
    for i, ntok in rows:  # rows already in doc_id order
        b = i % 8
        before = cum[b]
        assert got[i] == (b, ntok, before // 512, before % 512)
        cum[b] = before + ntok
    # invariant: offset always inside a chunk
    assert all(0 <= off < 512 for (_, _, _, off) in got.values())


def test_pack_summary_token_conservation(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("ntok")
    )
    packed = pack_sequences(df, token_col="ntok", chunk_tokens=256, num_bins=4)
    s = pack_summary(packed)
    total = s.agg(F.sum("n_tokens").alias("t"), F.sum("n_docs").alias("d")).collect()[0]
    assert total.t == sum(i % 97 + 1 for i in range(300))
    assert total.d == 300
    # within every bin, consecutive chunks exist from 0..max (no gaps)
    for r in s.groupBy("pack_bin").agg(
        F.countDistinct("chunk_id").alias("n"), F.max("chunk_id").alias("m")
    ).collect():
        assert r.n == r.m + 1


def test_split_and_mixture_plans_are_narrow(spark):
    """Zero-shuffle contract: split/sample are pure per-row exprs."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in [
        hash_split(docs),
        mixture_sample(docs, {"src0": 0.5}),
    ]:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 37 == 0)
    out = decontaminate(docs, bench, n=8)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_cap_per_group_exact_matches_python_oracle(spark):
    import hashlib

    rows = [(i, f"d{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    got = sorted(
        r.doc_id
        for r in cap_per_group(
            df, "domain", cap=5, id_col="doc_id", salt="cap"
        ).collect()
    )

    def rank_key(i):
        return (hashlib.md5(f"{i}|cap".encode()).hexdigest()[:12], i)

    expect = []
    for d in {"d0", "d1", "d2"}:
        members = sorted((i for i, dom in rows if dom == d), key=rank_key)
        expect += members[:5]
    assert got == sorted(expect)
    # determinism: same survivors on a re-run with shuffled input order
    df2 = spark.createDataFrame(list(reversed(rows)), ["doc_id", "domain"])
    got2 = sorted(
        r.doc_id
        for r in cap_per_group(
            df2, "domain", cap=5, id_col="doc_id", salt="cap"
        ).collect()
    )
    assert got2 == got


def test_cap_per_group_approx_targets_cap(spark):
    rows = [(i, "big" if i < 400 else f"s{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    out = cap_per_group(df, "domain", cap=50, id_col="doc_id", exact=False)
    sizes = {r.domain: r.n for r in out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    # small groups (< cap) are kept whole
    for d, n in sizes.items():
        if d != "big":
            assert n == sum(1 for i, dom in rows if dom == d)
    # the hot group lands near the target (Binomial(400, 1/8): mean 50, sd ~6.6)
    assert 20 <= sizes["big"] <= 90
    # approx mode is window-free and the decision is a per-row expression
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan


def _unit_rows(n, dim, seed):
    import numpy as np

    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m


def test_semantic_decontaminate_planted(spark):
    from pyspark_validator.pipelines.curation import (
        semantic_contamination,
        semantic_decontaminate,
    )

    dim = 16
    m = _unit_rows(60, dim, seed=3)
    train = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    # benchmark = 2x-scaled copies of every 5th training vector: same direction
    # => cosine exactly 1.0 and the identical sign-LSH bucket (recall 1 here)
    bench = spark.createDataFrame(
        [(1000 + i, [float(2 * x) for x in m[i]]) for i in range(0, 60, 5)],
        "vec_id long, embedding array<double>",
    )
    hits = semantic_contamination(train, bench, dim=dim, threshold=0.95, num_bits=8)
    got = {r.vec_id: (r.n_benchmark_matches, r.max_benchmark_cosine) for r in hits.collect()}
    import numpy as np

    # brute-force cross cosine says which OTHER train vectors also clear 0.95
    sims = m @ m[range(0, 60, 5)].T
    expect_ids = {i for i in range(60) if sims[i].max() >= 0.95}
    assert set(got) <= expect_ids  # exact verify => no false positives
    assert set(got) >= set(range(0, 60, 5))  # planted copies always collide
    for i in range(0, 60, 5):
        assert got[i][1] >= 0.999999
    clean = semantic_decontaminate(train, bench, dim=dim, threshold=0.95, num_bits=8)
    surv = sorted(r.vec_id for r in clean.collect())
    assert set(surv) == set(range(60)) - set(got)
    assert clean.columns == ["vec_id", "embedding"]


def test_semantic_contamination_broadcast_plan_and_no_false_positives(spark):
    import numpy as np

    from pyspark_validator.pipelines.curation import semantic_contamination

    dim = 12
    t = _unit_rows(80, dim, seed=11)
    b = _unit_rows(9, dim, seed=12)
    train = spark.createDataFrame(
        [(i, [float(x) for x in t[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(i, [float(x) for x in b[i]]) for i in range(9)],
        "vec_id long, embedding array<double>",
    )
    hits = semantic_contamination(train, bench, dim=dim, threshold=0.6, num_bits=4)
    brute = t @ b.T
    brute_ids = {i for i in range(80) if brute[i].max() >= 0.6}
    rows = {r.vec_id: r.max_benchmark_cosine for r in hits.collect()}
    assert set(rows) <= brute_ids
    for i, c in rows.items():
        assert 0.6 <= c <= brute[i].max() + 1e-9
    # benchmark side broadcasts; the training scan is never shuffle-joined
    plan = hits._sc._jvm.PythonSQLUtils.explainString(
        hits._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# exact duplicate pairs + split leakage


def _leak_fixture(spark):
    # clusters: {1,2,3} share text A; {10, 11} share text B; 20 unique;
    # mega-cluster {30..34} exercises the max_cluster pair guard
    rows = (
        [(i, "A text  shared") for i in (1, 2, 3)]
        + [(i, "b TEXT shared") for i in (10, 11)]
        + [(20, "unique")]
        + [(i, "mega") for i in range(30, 35)]
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicate_pairs_python_oracle(spark):
    from pyspark_validator.pipelines.dedup import exact_duplicate_pairs

    d = _leak_fixture(spark)
    got = sorted(
        (r["id_a"], r["id_b"]) for r in exact_duplicate_pairs(d).collect()
    )
    import itertools

    want = sorted(
        itertools.chain(
            itertools.combinations((1, 2, 3), 2),
            itertools.combinations((10, 11), 2),
            itertools.combinations(range(30, 35), 2),
        )
    )
    assert got == want


def test_exact_duplicate_pairs_max_cluster_guard(spark):
    from pyspark_validator.pipelines.dedup import exact_duplicate_pairs

    d = _leak_fixture(spark)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in exact_duplicate_pairs(d, max_cluster=4).collect()
    )
    # the 5-member mega cluster is dropped from the PAIR view; smaller survive
    assert got == [(1, 2), (1, 3), (2, 3), (10, 11)]


def test_split_leakage_python_oracle(spark):
    from pyspark_validator.pipelines.curation import leaked_ids, split_leakage

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (30, 31)], "id_a long, id_b long"
    )
    assign = {1: "train", 2: "val", 3: "train", 10: "test", 11: "train",
              30: "val", 31: "val"}
    splits = spark.createDataFrame(
        [(k, v) for k, v in assign.items()], "doc_id long, split string"
    )
    got = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in split_leakage(pairs, splits).collect()
    }
    from collections import Counter

    want = Counter(
        tuple(sorted((assign[a], assign[b]))) for a, b in
        [(1, 2), (1, 3), (2, 3), (10, 11), (30, 31)]
    )
    assert got == dict(want)

    leaked = sorted(
        (r["doc_id"], r["split"]) for r in leaked_ids(pairs, splits).collect()
    )
    # protected docs with a train partner: 2 (val, via 1) and 10 (test, via 11)
    assert leaked == [(2, "val"), (10, "test")]


def test_split_leakage_zero_on_clean_split(spark):
    from pyspark_validator.pipelines.curation import leaked_ids, split_leakage

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    splits = spark.createDataFrame(
        [(1, "train"), (2, "train")], "doc_id long, split string"
    )
    rows = split_leakage(pairs, splits).collect()
    assert [(r["split_a"], r["split_b"], r["n_pairs"]) for r in rows] == [
        ("train", "train", 1)
    ]
    assert leaked_ids(pairs, splits).count() == 0


# ---------------------------------------------------------------------------
# chunk manifest


def test_chunk_manifest_python_oracle(spark):
    from pyspark_validator.pipelines.curation import chunk_manifest, pack_sequences

    # one bin, chunk=10: doc sizes 4, 9 (straddles), 0 (skipped), 25 (3 chunks)
    rows = [(0, "a " * 4), (1, "b " * 9), (2, ""), (3, "c " * 25)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(d, chunk_tokens=10, num_bins=1, bin_col=F.lit(0))
    got = sorted(
        (
            r["doc_id"], r["chunk_id"], r["doc_tok_start"],
            r["doc_tok_end"], r["chunk_tok_start"],
        )
        for r in chunk_manifest(packed, chunk_tokens=10).collect()
    )
    # stream: doc0 tokens [0,4), doc1 [4,13), doc3 [13,38)
    want = [
        (0, 0, 0, 4, 0),
        (1, 0, 0, 6, 4),   # doc1 fills the rest of chunk 0
        (1, 1, 6, 9, 0),   # and spills 3 tokens into chunk 1
        (3, 1, 0, 7, 3),   # doc3 fills chunk 1
        (3, 2, 7, 17, 0),  # all of chunk 2
        (3, 3, 17, 25, 0), # 8 tokens into chunk 3
    ]
    assert got == want


def test_chunk_manifest_conservation_laws(spark):
    from collections import defaultdict

    from pyspark_validator.pipelines.curation import chunk_manifest, pack_sequences

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    packed = pack_sequences(
        d, chunk_tokens=256, num_bins=4, bin_col=F.col("doc_id") % 4
    )
    man = chunk_manifest(packed, chunk_tokens=256).collect()
    tok = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    per_doc = defaultdict(int)
    per_chunk = defaultdict(int)
    for r in man:
        assert 0 <= r["doc_tok_start"] < r["doc_tok_end"] <= tok[r["doc_id"]]
        assert 0 <= r["chunk_tok_start"] < 256
        per_doc[r["doc_id"]] += r["doc_tok_end"] - r["doc_tok_start"]
        per_chunk[(r["pack_bin"], r["chunk_id"])] += (
            r["doc_tok_end"] - r["doc_tok_start"]
        )
    # every token of every doc lands in exactly one chunk slice
    assert per_doc == {k: v for k, v in tok.items() if v > 0}
    # every chunk except each bin's last is exactly full
    last = {}
    for (b, c) in per_chunk:
        last[b] = max(last.get(b, -1), c)
    for (b, c), n in per_chunk.items():
        if c < last[b]:
            assert n == 256, (b, c, n)
