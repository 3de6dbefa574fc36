"""Text-analysis function tests + ANN + multimodal plumbing + streaming parity."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from textchunking_and_knowledgegraph_spark.functions import textfns
from textchunking_and_knowledgegraph_spark.operators.ann import brute_force_topk, srp_topk
from textchunking_and_knowledgegraph_spark.operators.multimodal import (
    extract_features,
    fake_decoder,
    sample_frames,
    strict_decoder,
    synthetic_media,
)


def test_textfns_values(spark):
    df = spark.createDataFrame(
        [
            {"id": 1, "text": "the quick fox. jumps!"},
            {"id": 2, "text": "函数的概念与性质是数学内容"},
            {"id": 3, "text": ""},
        ]
    )
    out = {
        r.id: r
        for r in df.select(
            "id",
            textfns.token_count(F.col("text")).alias("tc"),
            textfns.language_id(F.col("text")).alias("lang"),
            textfns.fingerprint(F.col("text")).alias("fp"),
            textfns.token_estimate(F.col("text")).alias("te"),
        ).collect()
    }
    assert out[1].tc == 4
    assert out[1].lang == "en"
    assert out[2].lang == "zh"
    assert out[2].te == 13  # all-CJK (13 chars): one token per char
    assert out[3].tc == 0
    assert len(out[1].fp) == 32


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [{"id": 1, "text": "Hello   World"}, {"id": 2, "text": "hello world"}]
    )
    fps = [r.fp for r in df.select(textfns.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def _emb_df(spark):
    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0, 0.0, 0.0]},
        {"vec_id": 1, "embedding": [0.9, 0.1, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [0.0, 1.0, 0.0, 0.0]},
        {"vec_id": 3, "embedding": [0.0, 0.9, 0.2, 0.0]},
        {"vec_id": 4, "embedding": [-1.0, 0.0, 0.1, 0.0]},
    ]
    return spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_brute_force_topk(spark):
    corpus = _emb_df(spark)
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(corpus, queries, k=2).collect()
    assert [r.vec_id for r in out] == [1, 2]  # nearest first
    assert out[0].rank == 1 and out[0].cosine > 0.98


def test_srp_topk_finds_near(spark):
    corpus = _emb_df(spark)
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = srp_topk(corpus, queries, k=2, n_planes=4, n_probe=4).collect()
    assert any(r.vec_id == 1 for r in out)  # the true nearest survives blocking


def test_srp_topk_plan_is_equi_join(spark):
    """Scale guard: the probe must be a hash join on bucket keys, never a
    nested-loop scan of the corpus per query (round-1 regression)."""
    corpus = _emb_df(spark)
    queries = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = srp_topk(corpus, queries, k=2, n_planes=4, n_probe=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_multimodal_features(spark):
    media = synthetic_media(spark, n=12)
    feats = extract_features(media).toPandas()
    assert len(feats) == 12
    assert (feats["width"] >= 64).all() and (feats["height"] >= 64).all()
    assert feats["feature"].map(len).eq(16).all()
    img = feats[feats["kind"] == "image"]
    assert (img["n_frames"] == 1).all()
    # determinism
    feats2 = extract_features(media).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )


def test_mm_features_matches_duckdb_oracle(spark):
    """The mm_features contract entry is hash-verified by the driver; pin
    the same Spark-vs-DuckDB parity here at sf0.001 so a decoder or oracle
    drift fails fast in pytest, including bit-exact float32->double dims."""
    import duckdb
    import os

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        import pytest

        pytest.skip("driver testdata not present")
    got = (
        entrymod.mm_features(spark, sf_dir)
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.sql(entrymod.oracle_sql()["mm_features"])
        .df()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    for c in got.columns:
        if got[c].dtype == object:
            assert (got[c].values == want[c].values).all(), c
        else:
            # exact equality on purpose: the float32 narrowing is IEEE
            # round-to-nearest-even on both sides, so bits must agree
            assert (
                got[c].values.astype("float64") == want[c].values.astype("float64")
            ).all(), c


def test_multimodal_strict_decoder_video_raises(spark):
    """The strict path decodes image/audio for real and stays LOUD on video
    (no pure-numpy demuxer): a video row must fail, never silently fake."""
    media = synthetic_media(spark, n=3).filter("kind = 'video'")
    try:
        extract_features(media, decoder=strict_decoder()).collect()
        raised = False
    except Exception as e:  # Py4J wraps the NotImplementedError
        raised = "NotImplementedError" in str(e) or "demuxer" in str(e)
    assert raised


def test_multimodal_real_codecs_roundtrip():
    """Pure-numpy codecs: encode->decode is the identity for BMP (24-bit,
    incl. the 4-byte row padding seam), binary PPM/PGM, and PCM WAV (16-bit
    stereo + mono, odd data-chunk word alignment)."""
    import numpy as np

    from textchunking_and_knowledgegraph_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.RandomState(42)
    for w in (1, 2, 3, 4, 7):  # widths straddling every padding residue
        img = rng.randint(0, 256, (5, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()
        assert (decode_ppm(encode_ppm(img)) == img).all()
    gray = rng.randint(0, 256, (4, 9), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(gray)) == gray).all()
    stereo = rng.randint(-32768, 32768, (101, 2)).astype(np.int16)
    d, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and (d == stereo).all()
    mono = rng.randint(-32768, 32768, 37).astype(np.int16)
    d2, _ = decode_wav(encode_wav(mono))
    assert d2.shape == (37, 1) and (d2[:, 0] == mono).all()


def test_multimodal_real_decoder_features():
    """real_decoder recovers encoded dims exactly; constant-fill payloads
    give a one-hot L1-normalized histogram in the predicted bin."""
    import numpy as np

    from textchunking_and_knowledgegraph_spark.operators.multimodal import (
        encode_bmp,
        encode_wav,
        real_decoder,
    )

    img = real_decoder(encode_bmp(np.full((3, 4, 3), 200, dtype=np.uint8)), "image")
    assert (img["width"], img["height"], img["n_frames"]) == (4, 3, 1)
    assert img["feature"][200 // 16] == 1.0 and sum(img["feature"]) == 1.0

    wav = real_decoder(encode_wav(np.full(55, -32768 + 4096 * 5, dtype=np.int16)), "audio")
    assert wav["n_frames"] == 55 and wav["width"] is None and wav["height"] is None
    assert wav["feature"][5] == 1.0 and sum(wav["feature"]) == 1.0

    # corrupt image payloads fail loudly, never misread
    import pytest

    with pytest.raises(ValueError):
        real_decoder(b"definitely not an image", "image")


def test_sample_frames_shape(spark):
    media = synthetic_media(spark, n=12)
    frames = sample_frames(media, every_n=8).toPandas()
    feats = extract_features(media.filter(F.col("kind") == "video")).toPandas()
    expected = sum((n + 7) // 8 for n in feats["n_frames"])
    assert len(frames) == expected
    assert (frames["frame_idx"] % 8 == 0).all()


def test_srp_topk_recall_vs_brute_force(spark):
    """Recall bound for the bucketed ANN path on real fixture embeddings:
    hamming-ball probing at n_planes=8/n_probe=8 must recover most of the
    exact top-5 (deterministic: planes are seeded)."""
    import pytest

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    try:
        emb = spark.read.parquet(emb_path)
    except Exception:
        pytest.skip("driver testdata not present")
    emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.vec_id)
              for r in srp_topk(emb, queries, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"recall {recall:.2f} below documented bound"


def test_ivf_topk_recall_and_plan(spark):
    """IVF sibling of the SRP recall bound: probing 4 of 8 k-means cells on
    the near-uniform fixture embeddings (LSH/IVF worst case) must recover
    well over half of the exact top-5, and the probe must compile to a hash
    equi-join on the cell id — never a per-query corpus scan."""
    import pytest

    from textchunking_and_knowledgegraph_spark.operators.ann import ivf_topk

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    try:
        emb = spark.read.parquet(emb_path)
    except Exception:
        pytest.skip("driver testdata not present")
    queries = emb.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    plan_df = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4)
    approx = {}
    for r in plan_df.collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.6, f"recall {recall:.2f} below documented bound"
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_scrub_pii_and_counts(spark):
    from textchunking_and_knowledgegraph_spark.functions.textfns import (
        pii_counts,
        scrub_pii,
    )

    rows = [
        (1, "mail joe.doe@example.com, see https://foo.bar/x?y=1, tel 555-1234"),
        (2, "server 192.168.1.1 rebooted"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r for r in df.select(
        "id", scrub_pii(F.col("text")).alias("s"), pii_counts(F.col("text")).alias("p")
    ).collect()}
    assert "<EMAIL>" in out[1].s and "<URL>" in out[1].s and "<PHONE>" in out[1].s
    assert "joe.doe" not in out[1].s and "foo.bar" not in out[1].s
    assert out[1].p.emails == 1 and out[1].p.urls == 1 and out[1].p.phones == 1
    assert out[2].s == "server <IP> rebooted" and out[2].p.ips == 1
    assert out[3].s == rows[2][1]  # untouched


def test_scrub_pii_preserves_numeric_ranges_and_punctuation(spark):
    """Regression (review findings): ordinary numeric ranges must survive
    the scrub, trailing sentence punctuation is not part of a URL, the
    audit counts follow scrub precedence, and null text counts as zeros."""
    from textchunking_and_knowledgegraph_spark.functions.textfns import (
        pii_counts,
        scrub_pii,
    )

    rows = [
        (1, "years 2019-2020 and pages 100-200 and span 100-2000 stay intact"),
        (2, "see https://foo.bar/x?y=1, next sentence"),
        (3, "https://example.com/555-1234 x"),
        (4, None),
        (5, "call (010) 6552-3355 or +86 1381-0000"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r for r in df.select(
        "id", scrub_pii(F.col("text")).alias("s"), pii_counts(F.col("text")).alias("p")
    ).collect()}
    assert out[1].s == rows[0][1]                      # ranges untouched
    assert out[2].s == "see <URL>, next sentence"      # comma survives
    # a phone-shaped path inside a URL is a URL, not a phone
    assert out[3].s == "<URL> x"
    assert out[3].p.urls == 1 and out[3].p.phones == 0
    assert out[4].p == (0, 0, 0, 0)                    # null -> zeros
    assert out[5].p.phones == 2 and "<PHONE>" in out[5].s


def test_repetition_quality_signals(spark):
    from textchunking_and_knowledgegraph_spark.functions.textfns import (
        dup_line_fraction,
        top_bigram_fraction,
    )

    rows = [
        (1, "a\na\nb\na"),              # 4 lines, 2 distinct -> 0.5
        (2, "go go go go go go stop"),  # "go go" = 5 of 6 bigrams
        (3, "all lines unique\nno repeats\nclean text"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r for r in df.select(
        "id",
        F.round(dup_line_fraction(F.col("text")), 4).alias("dlf"),
        F.round(top_bigram_fraction(F.col("text")), 4).alias("tbf"),
    ).collect()}
    assert out[1].dlf == 0.5
    assert out[2].tbf == round(5 / 6, 4)
    assert out[3].dlf == 0.0
    assert out[4].dlf == 0.0 and out[4].tbf == 0.0


def test_stopword_ratio_zh(spark):
    from textchunking_and_knowledgegraph_spark.functions.textfns import (
        stopword_ratio_zh,
    )

    rows = [
        (1, "函数的概念是数学的基础，它在分析中很重要。"),  # natural prose
        (2, "函数 集合 数列 向量"),                          # keyword list
        (3, "no cjk at all"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r.z for r in df.select(
        "id", F.round(stopword_ratio_zh(F.col("text")), 4).alias("z")).collect()}
    assert out[1] > 0.15          # 的/是/在/很/它... dense
    assert out[2] == 0.0          # no function chars
    assert out[3] == 0.0          # no CJK -> 0, not NULL


def test_quality_score_bounds_and_ordering(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog and then the fox "
            "rests by the river for a while in the afternoon sun. " * 4),
        (2, "!!!???!!!"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r.q for r in df.select(
        "id", textfns.quality_score(F.col("text")).alias("q")).collect()}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    assert out[1] > 0.9            # long natural prose scores high
    assert out[2] < 0.1            # pure punctuation scores near zero
    assert out[1] > out[3] > out[2]  # empty = punct-free baseline between


def test_quality_score_zh_prose_scores_natural(spark):
    """Round-2 finding: the English-stopword composite scored ALL Chinese
    prose as non-natural (the reference corpus is Chinese). The zh branch
    must score natural zh prose like natural en prose, and above zh
    keyword lists (which have no function chars)."""
    zh_prose = ("函数的概念是数学中最重要的概念之一。我们在研究运动变化的过程中，"
                "发现两个变量之间存在着对应关系，这种关系就是函数。"
                "如果说集合是现代数学的基础，那么函数就是联系各个分支的纽带。") * 3
    zh_keywords = "函数 集合 概念 性质 定义域 值域 单调性 奇偶性 幂函数 映射 区间 图象" * 8
    en_prose = ("The quick brown fox jumps over the lazy dog and then the fox "
                "rests by the river for a while in the afternoon sun. " * 4)
    rows = [(1, zh_prose), (2, zh_keywords), (3, en_prose)]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r.q for r in df.select(
        "id", textfns.quality_score(F.col("text")).alias("q")).collect()}
    assert out[1] > 0.9              # natural zh prose now scores high
    assert out[1] > out[2] + 0.2     # ...and clearly above zh keyword soup
    assert abs(out[1] - out[3]) < 0.1  # zh prose ~ en prose


def test_quality_score_matches_duckdb_mirror_on_zh(spark):
    """The q23 'quality' oracle arm and the Spark expression must agree on
    zh text; the driver's testdata has no CJK, so the zh branch parity is
    pinned here against the exact SQL fragment the oracle uses."""
    import duckdb

    import __spark_entry__ as entry

    rows = [
        (1, "函数的概念是数学中最重要的概念之一。我们在研究中发现了对应关系。" * 8),
        (2, "函数 集合 概念" * 40),
        (3, "mixed 函数 text with english words beside it " * 10),
        (4, "plain english prose about nothing in particular at all " * 6),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.quality for r in df.select(
        "doc_id", textfns.quality_score(F.col("text")).alias("quality")).collect()}

    sql = entry.oracle_sql()["q23_quality_metrics"].replace("FROM documents", "FROM pdf")
    pdf = df.toPandas()  # noqa: F841 (registered by name in duckdb)
    oracle = {int(d): q for d, q in
              duckdb.sql(f"SELECT doc_id, quality FROM ({sql})").fetchall()}
    assert got == oracle


_REAL_JPEGS = [
    # baseline 4:2:0 camera photos
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP802813.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel/chr30.4.184.jpg",
    # progressive (SOF2, successive approximation) files
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel/grayscale.jpg",
]


@pytest.mark.skipif(
    not all(os.path.exists(p) for p in _REAL_JPEGS),
    reason="Spark sample images not present",
)
def test_jpeg_decoder_matches_imageio_on_real_files(spark):
    """Decode REAL 4:2:0 camera JPEGs (Spark's mllib sample images) with the
    pure-numpy baseline decoder and compare pixel-for-pixel against an
    INDEPENDENT reference decoder -- Spark's ImageIO-backed `image` data
    source. The JPEG spec allows small per-sample decoder variance (IDCT
    precision, chroma upsampling kernel), so the pin is a tight error
    envelope, not bit equality: mean |diff| < 1.0 and 99.9th percentile
    <= 8 across every sample of both images."""
    import numpy as np

    from textchunking_and_knowledgegraph_spark.operators.jpeg import decode_jpeg

    for p in _REAL_JPEGS:
        row = spark.read.format("image").load(p).select("image.*").first()
        ref = np.frombuffer(row.data, np.uint8).reshape(
            row.height, row.width, row.nChannels
        )
        ref = ref[:, :, ::-1] if row.nChannels == 3 else ref[:, :, 0]
        ours = decode_jpeg(open(p, "rb").read())
        assert ours.shape == ref.shape
        d = np.abs(ours.astype(int) - ref.astype(int))
        assert float(d.mean()) < 1.0, (p, float(d.mean()))
        assert float(np.percentile(d, 99.9)) <= 8.0, (p, float(np.percentile(d, 99.9)))


_REAL_PNGS = [
    "/usr/share/doc/python3/_static/file.png",               # RGBA
    "/usr/share/doc/nodejs/osx_installer_logo.png",          # palette + tRNS
    "/usr/share/doc/libpng-dev/examples/pngtest.png",        # RGBA, Adam7 INTERLACED
]


@pytest.mark.skipif(
    not all(os.path.exists(p) for p in _REAL_PNGS),
    reason="sample PNGs not present",
)
def test_png_decoder_bitexact_vs_imageio_on_real_files(spark):
    """PNG is lossless, so the pin is BIT EXACTNESS: decode real-world RGBA,
    palette(+tRNS), and Adam7-interlaced files with the pure-numpy decoder
    and require every sample equal to Spark's ImageIO-backed image reader."""
    import numpy as np

    from textchunking_and_knowledgegraph_spark.operators.multimodal import decode_png

    for p in _REAL_PNGS:
        row = spark.read.format("image").load(p).select("image.*").first()
        ref = np.frombuffer(row.data, np.uint8).reshape(
            row.height, row.width, row.nChannels
        )
        ref = ref[:, :, [2, 1, 0, 3]] if row.nChannels == 4 else ref[:, :, ::-1]
        ours = decode_png(open(p, "rb").read())
        assert ours.shape == ref.shape, p
        assert (ours == ref).all(), p
