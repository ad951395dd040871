"""Unit tests for the training-data pipeline operators
(pegasus_spark.functions.*)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pegasus_spark import codec
from pegasus_spark.functions import multimodal, simops, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different text about spark engines and shuffles"),
        (4, "el gato y la casa de la abuela en el pueblo"),
        (5, "le chat et le chien des voisins dans la rue"),
        (6, "xy"),  # degenerate short doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = textops.exact_dedup_groups(docs).collect()
    dup = [g for g in groups if g["n_docs"] > 1]
    assert len(dup) == 1 and dup[0]["keeper"] == 0 and dup[0]["n_docs"] == 2
    assert len(groups) == 6  # 7 docs, one pair merged


def test_quality_metrics(spark, docs):
    q = {r["doc_id"]: r for r in textops.quality_metrics(docs).collect()}
    assert q[0]["n_tokens"] == 9
    assert q[0]["stopword_ratio"] > 0
    assert q[6]["n_tokens"] == 1 and not q[6]["len_ok"]


def test_langid(spark, docs):
    pred = {r["doc_id"]: r["pred_lang"] for r in textops.langid_heuristic(docs).collect()}
    assert pred[0] == "en"
    assert pred[4] == "es"
    assert pred[5] == "fr"
    assert pred[6] == "other"


def test_repetition_metrics(spark):
    rows = [
        # 4 non-empty lines, "spam spam" repeated 3x → 2 dup lines;
        # bigrams of "spam spam\nspam spam\nspam spam\nok line" tokens:
        # [spam]x6 [ok] [line]: (spam,spam)x5 (spam,ok) (ok,line) = 7 occ,
        # top share 5/7
        (0, "spam spam\nspam spam\nspam spam\nok line"),
        # all lines distinct, all bigrams distinct
        (1, "alpha beta\ngamma delta"),
        # 1-token doc → short-gram fallback: 1 gram, share 1.0
        (2, "solo"),
        # blank/whitespace-only lines are dropped before the line metrics
        (3, "a b\n\n   \na b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = {r["doc_id"]: r for r in textops.repetition_metrics(docs).collect()}
    assert m[0]["n_lines"] == 4 and m[0]["dup_line_frac"] == 0.5
    assert m[0]["n_bigrams"] == 7 and m[0]["top_bigram_share"] == round(5 / 7, 4)
    assert m[1]["dup_line_frac"] == 0.0 and m[1]["top_bigram_share"] == round(1 / 3, 4)
    assert m[2]["n_lines"] == 1 and m[2]["n_bigrams"] == 1
    assert m[2]["top_bigram_share"] == 1.0
    assert m[3]["n_lines"] == 2 and m[3]["dup_line_frac"] == 0.5


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             textops.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs  # exact dup shares all bands
    # near-dup (0,2) shares most shingles → very likely ≥1 band
    assert (0, 2) in pairs or (1, 2) in pairs
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             textops.ngram_jaccard_pairs(docs).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.0 < pairs[(0, 2)] < 1.0


def test_simhash_near_dup(spark, docs):
    # band_bits=4 → 16 bands: a pair within hamming 15 is GUARANTEED to
    # share a band (pigeonhole), so the near-dup (0,2) must be found
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simops.simhash_near_dup_pairs(docs, max_hamming=15, band_bits=4).collect()}
    assert pairs[(0, 1)] == 0  # identical text → identical simhash
    assert (0, 2) in pairs  # near-dup within hamming budget


def test_cosine_topk_and_lsh(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    vecs[7] = vecs[0] + rng.standard_normal(16).astype(np.float32) * 0.01  # near dup of 0
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    top = simops.cosine_topk(df, q, k=3).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cos"] == 1.0
    assert top[1]["vec_id"] == 7  # the planted near-dup
    # LSH bucket search finds the planted near-dup too (same bucket w.h.p.)
    lsh = simops.lsh_bucket_topk(df, q, k=3, n_planes=4).collect()
    assert lsh[0]["vec_id"] == 0


def test_bpe_token_count_matches_reference_pretokenizer(spark):
    # python's re engine shares leftmost-first alternation with Java and
    # RE2, so re.findall over the SAME pattern is the executable spec
    import re as _re

    samples = [
        "hello world",
        "don't stop, won't you're it's I'll we'd they've I'm",
        "x=42; y3 = foo(bar,  baz)!?  \t tabs\nand newlines",
        "",
        "   ",
        "a1b2c3 --- ''' 12,345.67",
    ]
    from pegasus_spark.functions.textops import _BPE_RE, bpe_token_count
    expected = [len(_re.findall(_BPE_RE, s)) for s in samples]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "i long, text string")
    got = {r["i"]: r["n"] for r in
           df.select("i", bpe_token_count(F.col("text")).alias("n")).collect()}
    assert [got[i] for i in range(len(samples))] == expected
    # sanity: punctuation-heavy text yields MORE tokens than whitespace
    # splitting (the reason this counter exists)
    from pegasus_spark.functions.textops import token_count
    ws = df.select("i", token_count(F.col("text")).alias("n")).collect()
    ws = {r["i"]: r["n"] for r in ws}
    assert got[2] > ws[2]


def test_ivf_topk_prunes_to_probed_cells(spark):
    # Two well-separated directions; centroids are the sampled ids 0..3.
    # Vectors near direction-of-0 must be retrieved; vectors near the
    # opposite direction sit in unprobed cells and must be pruned even
    # though a brute-force scan would still rank them (that pruning IS
    # the IVF contract).
    rng = np.random.default_rng(11)
    base_a = rng.standard_normal(16)
    base_b = -base_a  # antipodal: cos(a, b) = -1
    rows = []
    for i in range(120):
        base = base_a if i % 2 == 0 else base_b
        v = base + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = simops.ivf_topk(df, k=10, n_cells=4, n_probe=2, query_id=0).collect()
    assert len(out) == 10
    assert all(r["vec_id"] != 0 for r in out)
    # every result is cosine-close to the query's direction, none from
    # the antipodal family (their cells are not probed)
    assert all(r["vec_id"] % 2 == 0 for r in out)
    assert all(r["cos"] > 0.9 for r in out)
    # results come only from probed cells, and cells are real centroids
    assert all(r["cell"] in (0, 1, 2, 3) for r in out)
    # deterministic: same input → same list
    again = simops.ivf_topk(df, k=10, n_cells=4, n_probe=2, query_id=0).collect()
    assert [(r["vec_id"], r["cos"]) for r in out] == \
           [(r["vec_id"], r["cos"]) for r in again]


def test_embedding_near_dup_pairs(spark):
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    vecs[9] = vecs[3] * 1.001
    df = spark.createDataFrame(
        [(i, i % 2, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, label int, embedding array<float>",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             simops.embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert (3, 9) in pairs


def test_embedding_near_dup_lsh_blocked(spark):
    """End-to-end: signed_projection_bucket output wired in as the
    near-dup ``block_col`` (the 100 TB blocking path — no label column)."""
    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    vecs[11] = vecs[2] * 1.001  # planted near-dup: same direction → same bucket
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    b = simops.signed_projection_bucket(df, dim=8, n_planes=4)
    pairs = {(r["id_a"], r["id_b"]): r["cos"] for r in
             simops.embedding_near_dup_pairs(b, threshold=0.99,
                                             block_col="bucket").collect()}
    assert (2, 11) in pairs and pairs[(2, 11)] >= 0.99
    # blocking really restricts the join: every emitted pair shares a bucket
    buckets = {r["vec_id"]: r["bucket"] for r in b.collect()}
    assert all(buckets[a] == buckets[bb] for a, bb in pairs)


def test_sig64_udf_matches_jvm_form(spark):
    """The numpy-matmul sig64 UDF (the 100 TB hot path) is bit-identical
    to the posexplode/groupBy JVM twin (the oracle-checkable form): both
    compute the same exact-int64 projection sums, so every signature bit
    must agree — this is what lets the entry query use the fast form
    while the DuckDB oracle checks the slow one's algebra."""
    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    jvm = {r["vec_id"]: (r["sig_lo"], r["sig_hi"]) for r in
           simops.signed_projection_sig64(df, dim=16).collect()}
    udf = {r["vec_id"]: (r["sig_lo"], r["sig_hi"]) for r in
           simops.signed_projection_sig64_udf(df, dim=16).collect()}
    assert jvm == udf


def test_simhash_md5_matches_reference(spark, docs):
    """Pin the md5-twin signature semantics with a pure-Python reference
    (same spec: two 32-bit md5 halves, frequency-weighted sign-sums)."""
    import hashlib

    got = {r["doc_id"]: (r["sim_lo"], r["sim_hi"]) for r in
           simops.simhash_md5(docs).collect()}
    for doc_id, text in [(0, "the quick brown fox jumps over the lazy dog"), (6, "xy")]:
        toks = [t for t in text.strip().lower().split() if t]
        sums = [0] * 64
        for t in toks:
            hx = hashlib.md5(t.encode()).hexdigest()
            hlo, hhi = int(hx[:8], 16), int(hx[8:16], 16)
            for b in range(32):
                sums[b] += 1 if (hlo >> b) & 1 else -1
                sums[32 + b] += 1 if (hhi >> b) & 1 else -1
        lo = sum(1 << b for b in range(32) if sums[b] > 0)
        hi = sum(1 << b for b in range(32) if sums[32 + b] > 0)
        assert got[doc_id] == (lo, hi), f"doc {doc_id}"
    # exact dup docs agree bit-for-bit
    assert got[0] == got[1]


@pytest.fixture(scope="module")
def images(spark):
    rng = np.random.default_rng(5)
    rows = []
    base = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    for i in range(6):
        px = base.copy() if i < 2 else rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        fmt = "png" if i % 2 == 0 else "qnt"
        rows.append((f"img-{i}", codec.encode(px, fmt), 16, 16, fmt, codec.phash(px)))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, phash long")


def test_image_features_real_decode(spark, images):
    feats = {r["image_id"]: r for r in multimodal.image_features(images).collect()}
    assert all(f["decode_ok"] for f in feats.values())
    for k, f in feats.items():
        assert 0 <= f["brightness"] <= 255


def test_image_resize(spark, images):
    out = multimodal.image_resize(images, 8, 8).collect()
    for r in out:
        px = codec.png_decode(r["bytes"])
        assert px.shape == (8, 8, 3)


def test_phash_near_dup(spark, images):
    pairs = {(r["id_a"], r["id_b"]) for r in
             multimodal.phash_near_dup_pairs(images, max_hamming=0).collect()}
    assert ("img-0", "img-1") in pairs  # same pixels (qnt loses ≤2/255 → same phash)


def _wav_bytes(samples: np.ndarray, sr: int, nch: int = 1) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_audio_features_wav(spark):
    sr = 8000
    t = np.arange(sr)  # 1 s
    sine = 0.5 * np.sin(2 * np.pi * 440 * t / sr)  # 440 Hz tone
    silence = np.zeros(sr // 2)  # 0.5 s of silence
    stereo = np.repeat(sine[: sr // 4, None], 2, axis=1).ravel()  # 0.25 s stereo
    df = spark.createDataFrame(
        [
            ("tone", _wav_bytes(sine, sr), "wav"),
            ("quiet", _wav_bytes(silence, sr), "wav"),
            ("stereo", _wav_bytes(stereo.reshape(-1, 2).ravel(), sr, nch=2), "wav"),
            ("mp3", b"\xffITS-NOT-WAV", "mp3"),
        ],
        "clip_id string, bytes binary, fmt string",
    )
    feats = {r["clip_id"]: r for r in multimodal.audio_features(df).collect()}
    tone = feats["tone"]
    assert tone["decode_ok"] and tone["sample_rate"] == sr and tone["n_channels"] == 1
    assert abs(tone["duration_s"] - 1.0) < 1e-6
    assert abs(tone["rms"] - 0.5 / np.sqrt(2)) < 1e-3  # sine RMS = A/√2
    assert abs(tone["spectral_centroid_hz"] - 440.0) < 5.0  # energy at the tone
    assert feats["quiet"]["decode_ok"] and feats["quiet"]["rms"] == 0.0
    assert feats["stereo"]["n_channels"] == 2
    assert abs(feats["stereo"]["duration_s"] - 0.25) < 1e-6
    assert not feats["mp3"]["decode_ok"]  # no codec in env → flagged, not raised


def test_video_frame_sample_y4m(spark):
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(7)]
    df = spark.createDataFrame(
        [
            ("v1", multimodal.y4m_encode(frames, fps=30), "y4m"),
            ("v2", b"\x00not-a-video", "mp4"),
        ],
        "video_id string, bytes binary, fmt string",
    )
    out = multimodal.video_frame_sample(df, every_n=3).collect()
    got = {(r["video_id"], r["frame_no"]): r["frame_png"] for r in out}
    assert {k for k in got if k[0] == "v1"} == {("v1", 0), ("v1", 3), ("v1", 6)}
    # C444 YUV roundtrip is lossy only by rounding: every pixel within ±2
    px0 = codec.png_decode(got[("v1", 3)])
    assert px0.shape == (16, 16, 3)
    assert np.abs(px0.astype(int) - frames[3].astype(int)).max() <= 2
    assert got[("v2", -1)] is None  # undecodable container → marker row


def test_y4m_420_colorspace():
    # 4:2:0 chroma subsampling path, pure-python (no Spark needed)
    w, h = 8, 8
    y = np.full((h, w), 120, dtype=np.uint8)
    u = np.full((h // 2, w // 2), 128, dtype=np.uint8)
    v = np.full((h // 2, w // 2), 128, dtype=np.uint8)
    data = (b"YUV4MPEG2 W8 H8 F30:1 C420\n" + b"FRAME\n"
            + y.tobytes() + u.tobytes() + v.tobytes())
    out = list(multimodal.y4m_decode_frames(data))
    assert len(out) == 1
    fno, arr = out[0]
    assert fno == 0 and arr.shape == (8, 8, 3)
    assert np.all(arr == 120)  # neutral chroma → gray at Y level
