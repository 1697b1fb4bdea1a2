"""Pipeline operators: text analysis, dedup family, similarity search, multimodal
plumbing. Planted-defect synthetic corpora with closed-form expectations plus
numpy/pandas oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyspark_validator.pipelines.dedup import (
    containment_pairs,
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from pyspark_validator.pipelines.multimodal import (
    extract_image_features,
    fake_media_table,
    sample_frames,
)
from pyspark_validator.pipelines.similarity import (
    add_lsh_bucket,
    ann_topk,
    brute_force_topk,
    cosine_pairs,
)
from pyspark_validator.pipelines.text import (
    fingerprint,
    language_id,
    quality_score,
    token_counts,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old stone bridge every single morning"
    near = base.replace("morning", "evening")  # 1-word difference
    rows = [
        ("d1", base),
        ("d2", base),  # exact dup of d1
        ("d3", "  THE  quick brown fox jumps over the lazy dog near the old stone bridge every single morning "),  # normalized dup
        ("d4", near),  # near dup
        ("d5", "completely different content about database systems and distributed query processing engines at scale"),
        ("d6", "der schnelle braune fuchs springt über den faulen hund und das ist nicht gut für die katze"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, corpus):
    clusters = exact_duplicates(corpus).collect()
    assert len(clusters) == 1
    c = clusters[0]
    assert c.cluster_size == 3
    assert c.representative == "d1"
    assert sorted(c.members) == ["d1", "d2", "d3"]
    kept = dedup_exact(corpus)
    assert kept.count() == 4
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [
        "d1",
        "d4",
        "d5",
        "d6",
    ]


def test_ngram_jaccard(spark, corpus):
    pairs = ngram_jaccard_pairs(corpus, k=3, threshold=0.5).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    # d1/d2/d3 identical (jaccard 1.0); d4 near (1 word of 16 changed -> 3 of 14
    # distinct shingles differ -> jaccard ~ 11/17 ~ 0.65)
    assert ("d1", "d2") in got and ("d1", "d3") in got and ("d2", "d3") in got
    assert ("d1", "d4") in got
    assert not any("d5" in p or "d6" in p for p in got)
    jac = {(p.id_a, p.id_b): p.jaccard for p in pairs}
    assert jac[("d1", "d2")] == pytest.approx(1.0)
    # numpy oracle for d1-d4
    def sh(t, k=3):
        w = " ".join(t.lower().split()).split(" ")
        return {" ".join(w[i : i + k]) for i in range(max(len(w) - k, 0) + 1)}
    a, b = sh("the quick brown fox jumps over the lazy dog near the old stone bridge every single morning"), sh(
        "the quick brown fox jumps over the lazy dog near the old stone bridge every single evening"
    )
    assert jac[("d1", "d4")] == pytest.approx(len(a & b) / len(a | b))


def _sh_set(t, k=3):
    w = " ".join(t.lower().split()).split(" ")
    return {" ".join(w[i : i + k]) for i in range(max(len(w) - k, 0) + 1)}


def test_containment_quotation(spark):
    """A short doc quoted verbatim inside a much longer one: containment is
    1.0 while jaccard sits far below any dedup threshold."""
    quote = "the committee voted to approve the annual budget on tuesday"
    filler = " ".join(f"filler{i} section{i} topic{i}" for i in range(30))
    rows = [("short", quote), ("long", filler + " " + quote + " " + filler)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = containment_pairs(df, k=3, threshold=0.8, max_df=10**6).collect()
    assert len(got) == 1
    r = got[0]
    a, b = _sh_set(rows[0][1]), _sh_set(rows[1][1])
    assert (r.id_a, r.id_b) == ("long", "short")
    assert r.containment == pytest.approx(len(a & b) / min(len(a), len(b)))
    assert r.containment == pytest.approx(1.0)
    assert r.jaccard == pytest.approx(len(a & b) / len(a | b))
    assert r.jaccard < 0.8  # symmetric Jaccard would have missed this pair


def test_containment_oracle_and_laws(spark, corpus):
    """Full python oracle on the shared corpus + containment >= jaccard law."""
    rows = {r.doc_id: r.text for r in corpus.collect()}
    got = containment_pairs(corpus, k=3, threshold=0.5, max_df=10**6).collect()
    want = {}
    ids = sorted(rows)
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            a, b = _sh_set(rows[x]), _sh_set(rows[y])
            c = len(a & b) / min(len(a), len(b))
            if c >= 0.5:
                want[(x, y)] = (c, len(a & b) / len(a | b))
    assert {(r.id_a, r.id_b) for r in got} == set(want)
    for r in got:
        c, j = want[(r.id_a, r.id_b)]
        assert r.containment == pytest.approx(c)
        assert r.jaccard == pytest.approx(j)
        assert r.containment >= r.jaccard - 1e-12


def test_minhash_lsh(spark, corpus):
    pairs = minhash_lsh_pairs(corpus, k=3, threshold=0.5, verify=True).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    assert ("d1", "d2") in got  # identical docs always collide
    for p in pairs:
        assert p.jaccard >= 0.5
        assert 0.0 <= p.est_jaccard <= 1.0
    # estimated similarity of identical docs is exactly 1
    est = {(p.id_a, p.id_b): p.est_jaccard for p in pairs}
    assert est[("d1", "d2")] == pytest.approx(1.0)


def test_simhash(spark, corpus):
    s = {r.id: r.simhash for r in simhash(corpus).collect()}
    assert s["d1"] == s["d2"] == s["d3"]  # identical after normalization
    ham = bin(s["d1"] ^ s["d4"]).count("1")
    assert ham <= 8  # near-dup -> small hamming
    assert bin(s["d1"] ^ s["d5"]).count("1") > 8
    pairs = simhash_pairs(corpus, max_hamming=8).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    assert ("d1", "d2") in got and ("d1", "d4") in got


def test_text_analysis(spark, corpus):
    t = token_counts(corpus).collect()
    byid = {r.doc_id: r for r in t}
    assert byid["d1"].n_ws_tokens == 17
    assert byid["d1"].n_bpe_tokens == 17  # plain words, no punct
    lang = {r.doc_id: r.lang for r in language_id(corpus).collect()}
    assert lang["d1"] == "en" and lang["d5"] == "en" and lang["d6"] == "de"
    q = {r.doc_id: r for r in quality_score(corpus).collect()}
    assert 0.0 <= q["d1"].quality <= 1.0
    assert q["d1"].stopword_ratio > 0.15
    fp = {r.doc_id: r for r in fingerprint(corpus).collect()}
    assert fp["d1"].content_fp == fp["d2"].content_fp == fp["d3"].content_fp
    assert fp["d1"].content_fp != fp["d4"].content_fp


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_topk(spark, emb):
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = mat[0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))
    exp = list(pdf["vec_id"].to_numpy()[order][:5])
    got = [r.id for r in brute_force_topk(emb, list(q), k=5).collect()]
    assert got == exp
    assert got[0] == pdf["vec_id"][0]  # self is its own nearest neighbor


def test_ann_topk_recall(spark, emb):
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    bucketed = add_lsh_bucket(emb, dim=64, num_bits=6).cache()
    hits = 0
    for i in (0, 7, 42):
        q = list(mat[i])
        exact = {r.id for r in brute_force_topk(emb, q, k=10).collect()}
        approx = ann_topk(
            emb, q, k=10, num_bits=6, multiprobe=2, bucketed=bucketed
        ).collect()
        # the query vector itself is always found (lands in its own bucket)
        assert approx[0].id == pdf["vec_id"][i]
        hits += len(exact & {r.id for r in approx})
    assert hits >= 12  # >= 40% recall@10 on ~uniform random vectors (hard case)
    bucketed.unpersist()


def test_cosine_pairs_planted(spark):
    rng = np.random.RandomState(3)
    base = rng.normal(size=(40, 16))
    dup = base[:5] + rng.normal(scale=0.01, size=(5, 16))  # near-identical copies
    mat = np.vstack([base, dup]).astype(float)
    pdf = pd.DataFrame({"vec_id": range(45), "embedding": [list(r) for r in mat]})
    df = spark.createDataFrame(pdf)
    pairs = cosine_pairs(df, dim=16, threshold=0.99, num_bits=6).collect()
    got = {(p.id_a, p.id_b) for p in pairs}
    expected = {(i, 40 + i) for i in range(5)}
    assert expected & got == expected  # all planted dups found
    for p in pairs:
        assert p.cosine >= 0.99


def test_multimodal_plumbing(spark):
    media = fake_media_table(spark, n=30)
    feats = extract_image_features(media, decode="fake", dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feat) == 8 for r in rows)
    assert all(r.payload_bytes > 0 for r in rows)
    # deterministic: same input -> same features
    again = {r.media_ref: r.feat for r in extract_image_features(media, decode="fake", dim=8).collect()}
    first = {r.media_ref: r.feat for r in rows}
    assert first == again
    # real decode is a clearly-marked stub
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_image_features(media, decode="real").collect()
    # frame sampling: 10 videos x 5 frames (duration 5000ms, every 1000ms)
    fr = sample_frames(media, every_ms=1000).collect()
    vids = media.filter(F.col("kind") == "video").count()
    assert len(fr) == vids * 5
    assert all(len(r.frame_feat) == 4 for r in fr)


def test_multimodal_resize_stage(spark):
    from pyspark_validator.pipelines.multimodal import fake_media_table, resize_images

    media = fake_media_table(spark, n=30)
    out = resize_images(media, width=32, height=32)
    rows = out.collect()
    assert len(rows) == 10  # only the image rows
    assert all(r.meta.width == 32 and r.meta.height == 32 for r in rows)
    assert all(len(r.payload) == 32 * 32 // 64 for r in rows)
    # deterministic: same input -> same payload bytes
    again = {r.media_ref: bytes(r.payload) for r in resize_images(media, 32, 32).collect()}
    assert {r.media_ref: bytes(r.payload) for r in rows} == again
    # the real-decode path is an explicit stub
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplemented|codec"):
        resize_images(media, 32, 32, decode="real").collect()


def test_ivf_similarity_recall(spark):
    """IVF (sampled k-means + list pruning) must find the true top-1 (the
    planted identical vector) and approximate brute-force top-k well."""
    from pyspark_validator.pipelines.similarity import brute_force_topk, ivf_build, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id = 7").select("embedding").collect()[0][0]
    indexed, cents = ivf_build(emb, dim=64, n_lists=8, iters=5)
    indexed = indexed.persist()
    approx = [r.id for r in ivf_topk(indexed, cents, list(q), k=10, nprobe=3).collect()]
    exact = [r.id for r in brute_force_topk(emb, list(q), k=10).collect()]
    assert approx[0] == exact[0] == 7  # the query vector itself
    assert len(set(approx) & set(exact)) >= 5  # decent recall at nprobe=3/8
    # every vector got a list in [0, n_lists)
    import pyspark.sql.functions as F

    bounds = indexed.agg(F.min("list_id"), F.max("list_id")).collect()[0]
    assert bounds[0] >= 0 and bounds[1] < 8


def test_line_filter(spark):
    from pyspark_validator.pipelines.text import line_filter

    docs = [
        # 3 lines: keep, drop (no terminal punct), drop (too short)
        ("d1", "This is a good line.\nno punctuation here\nShort one."),
        # boilerplate mentions dropped; doc gate fine
        ("d2", "Please accept our cookie policy now.\nA perfectly normal sentence here."),
        # doc dropped: lorem ipsum
        ("d3", "Lorem ipsum dolor sit amet, consectetur."),
        # doc dropped: code brace
        ("d4", "A fine sentence with words.\nfunction f() { return 1; }"),
        # doc dropped: all lines are bullets
        ("d5", "- first bullet item here.\n- second bullet item here."),
        # ellipsis gate: 1 of 2 lines ends with ... (> 0.3)
        ("d6", "A solid opening sentence here.\nand then it trails off..."),
    ]
    out = {
        r["doc_id"]: r
        for r in line_filter(
            spark.createDataFrame(docs, "doc_id string, text string")
        ).collect()
    }
    assert out["d1"]["n_lines"] == 3 and out["d1"]["n_kept_lines"] == 1
    assert out["d1"]["clean_text"] == "This is a good line."
    assert out["d1"]["keep_doc"]
    assert out["d2"]["n_kept_lines"] == 1  # cookie line dropped
    assert not out["d3"]["keep_doc"]
    assert not out["d4"]["keep_doc"]
    assert out["d5"]["n_bullet_lines"] == 2 and not out["d5"]["keep_doc"]
    assert out["d6"]["n_ellipsis_lines"] == 1 and not out["d6"]["keep_doc"]


def test_real_codec_roundtrip():
    import numpy as np

    from pyspark_validator.pipelines.multimodal import decode_ppm, encode_ppm

    rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert (decode_ppm(encode_ppm(rgb)) == rgb).all()
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert (decode_ppm(encode_ppm(gray)) == gray).all()
    # header comments are skipped
    with_comment = b"P5\n# a comment\n4 3\n255\n" + gray.tobytes()
    assert (decode_ppm(with_comment) == gray).all()


def test_real_decode_features(spark):
    import math

    import numpy as np

    from pyspark_validator.pipelines.multimodal import (
        extract_image_features,
        real_media_table,
    )

    media = real_media_table(spark, n=8)
    out = {
        r["media_ref"]: r
        for r in extract_image_features(media, decode="real", dim=4).collect()
    }
    assert len(out) == 8
    # constant blue channel + known gradients: recompute one image exactly
    y, x = np.mgrid[0:8, 0:16]
    px = np.stack([(x * 16) % 256, (y * 32) % 256, np.zeros((8, 16))], axis=2)
    expect_luma = float(px.mean()) / 255.0
    got = out["media://image/000000"]
    assert float(np.mean(got["feat"])) == pytest.approx(expect_luma, rel=1e-6)
    # audio: sine RMS = amp / sqrt(2)
    a = out["media://audio/000001"]
    amp = 0.25 + 0.05 * 1
    assert float(np.mean(a["feat"])) == pytest.approx(amp / math.sqrt(2), rel=1e-2)


def test_real_resize_nearest(spark):
    import numpy as np

    from pyspark_validator.pipelines.multimodal import (
        MEDIA_SCHEMA,
        decode_ppm,
        encode_ppm,
        resize_images,
    )

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    media = spark.createDataFrame(
        [("m1", "image", bytearray(encode_ppm(px)), (4, 4, 0, "ppm"))], MEDIA_SCHEMA
    )
    row = resize_images(media, 2, 2, decode="real").collect()[0]
    got = decode_ppm(bytes(row["payload"]))
    assert (got == px[np.ix_([0, 2], [0, 2])]).all()
    assert row["meta"]["width"] == 2 and row["meta"]["codec"] == "ppm"


def test_real_decode_rejects_compressed(spark):
    from pyspark_validator.pipelines.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )

    media = spark.createDataFrame(
        [("m1", "image", bytearray(b"\x89PNG\r\n\x1a\n...."), (1, 1, 0, "png"))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="PPM/PGM|PIL"):
        extract_image_features(media, decode="real").collect()


def test_semantic_dedup_keep_one(spark):
    import numpy as np

    from pyspark_validator.pipelines.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    base = [
        (i, [float(x) for x in rng.randn(16)]) for i in range(40)
    ]
    # plant: 100+i = 2x copy of i for i in {0, 5, 10}; 200 = copy of 100
    copies = [
        (100 + i, [2.0 * x for x in dict(base)[i]]) for i in (0, 5, 10)
    ] + [(200, [4.0 * x for x in dict(base)[0]])]
    df = spark.createDataFrame(
        base + copies, "vec_id long, embedding array<double>"
    )
    out = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, dim=16, threshold=0.99, num_bits=6).collect()
    )
    # smallest id of every duplicate component survives; all copies drop
    assert out == sorted(range(40))


def test_y4m_roundtrip_and_frame_sampling(spark):
    import numpy as np

    from pyspark_validator.pipelines.multimodal import (
        decode_y4m,
        encode_y4m,
        real_media_table,
        sample_frames,
    )

    frames = [np.full((6, 8), 10 * f, dtype=np.uint8) for f in range(5)]
    got, fps = decode_y4m(encode_y4m(frames, fps=10))
    assert fps == 10 and len(got) == 5
    assert all((a == b).all() for a, b in zip(got, frames))

    media = real_media_table(spark, n=3)  # row 2 is a 5-frame 10 fps clip
    out = sample_frames(media, every_ms=100, decode="real").collect()
    assert len(out) == 5
    for r in out:
        idx = r.frame_ts_ms // 100
        assert float(np.mean(r.frame_feat)) == pytest.approx(10 * idx / 255.0)

    with pytest.raises(Exception, match="YUV4MPEG2|ffmpeg"):
        from pyspark_validator.pipelines.multimodal import MEDIA_SCHEMA

        bad = spark.createDataFrame(
            [("m", "video", bytearray(b"\x00mp4..."), (1, 1, 500, "mp4"))],
            MEDIA_SCHEMA,
        )
        sample_frames(bad, every_ms=100, decode="real").collect()


def test_media_conformance_clean_and_corrupted(spark):
    """Payload-vs-metadata conformance over the real codec layer: the clean
    fixture conforms everywhere; truncation, meta lies, and unsupported
    formats degrade per row with typed reasons."""
    from pyspark.sql import functions as F

    from pyspark_validator.pipelines.multimodal import (
        media_conformance_check,
        media_conformance_flags,
        real_media_table,
    )

    media = real_media_table(spark, n=12)
    v = media_conformance_check(media, num_partitions=4)
    rows = v.collect()
    assert sum(r.n_media for r in rows) == 12
    assert all(r.holds for r in rows)

    # corrupt: truncate one image payload, lie about one wav's duration,
    # and relabel one video as compressed junk
    corrupted = media.withColumn(
        "payload",
        F.when(
            F.col("media_ref") == "media://image/000000",
            F.expr("substring(payload, 1, 10)"),
        ).otherwise(F.col("payload")),
    ).withColumn(
        "meta",
        F.when(
            F.col("media_ref") == "media://audio/000001",
            F.named_struct(
                F.lit("width"), F.col("meta.width"),
                F.lit("height"), F.col("meta.height"),
                F.lit("duration_ms"), F.lit(999),
                F.lit("codec"), F.col("meta.codec"),
            ).cast(media.schema["meta"].dataType),
        ).otherwise(F.col("meta")),
    )
    flags = {
        r.media_ref: r
        for r in media_conformance_flags(corrupted).collect()
    }
    bad_img = flags["media://image/000000"]
    assert not bad_img.decode_ok and bad_img.reason.startswith("undecodable")
    bad_wav = flags["media://audio/000001"]
    assert bad_wav.decode_ok and not bad_wav.meta_ok
    assert "999" in bad_wav.reason
    # everything else still conforms
    others = [r for k, r in flags.items()
              if k not in ("media://image/000000", "media://audio/000001")]
    assert all(r.decode_ok and r.meta_ok for r in others)

    v2 = media_conformance_check(corrupted, num_partitions=4)
    assert sum(r.n_undecodable for r in v2.collect()) == 1
    assert sum(r.n_meta_mismatch for r in v2.collect()) == 1


def test_repetition_signals_closed_form(spark):
    """Hand-checked Gopher gates: 'a b'x3 of 11 words; dup lines 'l1'."""
    from pyspark_validator.pipelines.text import repetition_signals

    rows = [
        (1, "a b a b a b c\nx y\nx y"),
        (2, "hello world"),
        (3, "l1\nl1\nl2"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in repetition_signals(df, top_n=2, dup_n=2).collect()
    }
    assert out[1].top_ngram == "a b"
    assert out[1].top_ngram_char_frac == pytest.approx(6 / 11)
    assert out[1].dup_ngram_frac == pytest.approx(0.4)  # 10 grams, 6 distinct
    assert out[1].dup_line_frac == pytest.approx(1 / 3)  # 'x y' repeats
    assert out[3].dup_line_frac == pytest.approx(1 / 3)
    assert out[3].dup_line_char_frac == pytest.approx(2 / 6)
    assert out[2].top_ngram == "hello world"
    assert out[2].top_ngram_char_frac == pytest.approx(1.0)
    assert out[4].top_ngram == "" and out[4].top_ngram_char_frac == 0.0


def test_repetition_signals_zero_shuffle(spark):
    """The whole operator must stay in one stage: no Exchange in the plan."""
    from pyspark_validator.pipelines.text import repetition_signals

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_signals_and_redaction(spark):
    from pyspark.sql import functions as F

    from pyspark_validator.pipelines.text import pii_signals, redact_pii

    df = spark.createDataFrame(
        [(1, "mail a@b.io via https://b.io from 10.0.0.1 call +1 555 123 4567")],
        ["doc_id", "text"],
    )
    r = pii_signals(df).collect()[0]
    assert (r.n_url, r.n_email, r.n_ipv4, r.n_phone) == (1, 1, 1, 1)
    red = redact_pii(df).collect()[0].redacted
    assert red == "mail <EMAIL> via <URL> from <IPV4> call <PHONE>"
    # an IP must not double-count as a phone number
    ip_only = spark.createDataFrame([(1, "host 192.168.10.20 up")], ["doc_id", "text"])
    r2 = pii_signals(ip_only).collect()[0]
    assert (r2.n_ipv4, r2.n_phone) == (1, 0)


def test_cosine_pairs_multiprobe_law(spark):
    # spec law: pairs(probes=r) == {(a,b) : cosine >= t AND hamming(sig) <= r}
    # computed independently in numpy with the same deterministic planes
    from pyspark_validator.pipelines.similarity import _planes

    rng = np.random.RandomState(9)
    base = rng.normal(size=(30, 12))
    near = base + rng.normal(scale=0.08, size=(30, 12))  # borderline near-dups
    mat = np.vstack([base, near]).astype(float)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    n, num_bits, t = len(mat), 10, 0.95
    planes = _planes(12, num_bits, seed=42)
    sigs = ((mat @ planes) > 0).astype(int)
    cos = mat @ mat.T

    def expected(r):
        out = set()
        for a in range(n):
            for b in range(a + 1, n):
                if cos[a, b] >= t and int(np.sum(sigs[a] != sigs[b])) <= r:
                    out.add((a, b))
        return out

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(r) for r in mat]})
    )
    for r in (0, 1, 2):
        got = {
            (p.id_a, p.id_b)
            for p in cosine_pairs(
                df, dim=12, threshold=t, num_bits=num_bits, probes=r
            ).collect()
        }
        assert got == expected(r), f"probes={r}"
    # the soak data must actually exercise the ladder, or the law is vacuous
    assert expected(0) < expected(1) <= expected(2)


def test_semantic_contamination_multiprobe_recovers_one_bit_miss(spark):
    from pyspark_validator.pipelines.curation import semantic_contamination
    from pyspark_validator.pipelines.similarity import _planes

    rng = np.random.RandomState(21)
    tr = rng.normal(size=(40, 12))
    tr /= np.linalg.norm(tr, axis=1, keepdims=True)
    bn = tr[:8] + rng.normal(scale=0.06, size=(8, 12))
    bn /= np.linalg.norm(bn, axis=1, keepdims=True)
    num_bits, t = 10, 0.95
    planes = _planes(12, num_bits, seed=42)
    st = ((tr @ planes) > 0).astype(int)
    sb = ((bn @ planes) > 0).astype(int)
    cos = tr @ bn.T

    def expected(r):
        return {
            i
            for i in range(40)
            for j in range(8)
            if cos[i, j] >= t and int(np.sum(st[i] != sb[j])) <= r
        }

    train = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(40), "embedding": [list(x) for x in tr]})
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(8), "embedding": [list(x) for x in bn]})
    )
    for r in (0, 1):
        hits = semantic_contamination(
            train, bench, dim=12, threshold=t, num_bits=num_bits, probes=r
        )
        assert {x.vec_id for x in hits.collect()} == expected(r), f"probes={r}"
