"""Mixed-modality corpus end to end (VERDICT r3 'next round' item 6).

A crawl over a page store whose payloads include real WAV and Y4M blobs
(alongside the usual images), then the multimodal feature operators
running directly on the crawled corpus table — asserting per-row
decode_ok accounting for both the decodable and the planted-corrupt
rows. This is the path a 100 TB training-data pipeline takes: crawl →
corpus table → modality-specific feature extraction, one engine.
"""

import io
import shutil
import tempfile
import wave

import numpy as np
from pyspark.sql import functions as F

from pegasus_spark.config import CrawlConfig
from pegasus_spark.crawl import crawl
from pegasus_spark.fixtures import WebParams, generate_web, write_web
from pegasus_spark.functions import multimodal
from pegasus_spark.tables import ManifestCatalog


def _wav_bytes(samples: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_multimodal_crawl_end_to_end(spark):
    web = generate_web(WebParams(seed=43, n_pages=80, n_hosts=4,
                                 fanout=2.5, n_seeds=4,
                                 # all four planted seeds must actually
                                 # crawl: no robots-disallowed hosts
                                 disallow_host_frac=0.0))
    pages = web["pages"]

    sr = 8000
    tone = np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    frames = [np.full((16, 16, 3), c, dtype=np.uint8) for c in (0, 128, 255)]
    # plant four multimodal payloads on the SEED pages (guaranteed
    # crawled in round 0); out_links stay untouched so discovery continues
    import re

    seed_idx = sorted({int(re.findall(r"/p/(\d+)", u)[-1])
                       for u in web["seeds"]["url"]})[:4]
    assert len(seed_idx) == 4
    plant = [
        ("wav", _wav_bytes(tone, sr)),        # decodable audio
        ("wav", b"RIFFgarbage-not-a-wav"),    # corrupt audio
        ("y4m", multimodal.y4m_encode(frames, fps=10)),  # decodable video
        ("y4m", b"YUV4MPEG2 not a stream"),   # corrupt video
    ]
    planted_ids = {}
    for i, (fmt, blob) in zip(seed_idx, plant):
        pages.at[i, "fmt"] = fmt
        pages.at[i, "bytes"] = blob
        planted_ids[(fmt, len(blob))] = pages.at[i, "image_id"]

    tmp = tempfile.mkdtemp()
    try:
        write_web(web, f"{tmp}/web")
        cfg = CrawlConfig(web_dir=f"{tmp}/web", job_dir=f"{tmp}/job",
                          min_delay_ms=1000, seen_parts=4, host_buckets=8,
                          # payloads are mixed-modality; image-decode
                          # validation doesn't apply to wav/y4m rows
                          validate_payloads=False)
        res = crawl(spark, cfg)
        assert res.stop_reason == "exhausted"

        cat = ManifestCatalog(spark, f"{tmp}/job")
        corpus = cat.read("corpus")
        got_fmts = {r["fmt"] for r in corpus.select("fmt").distinct().collect()}
        assert {"wav", "y4m"} <= got_fmts, "planted payloads were not crawled"

        # audio: corpus rows flow straight into audio_features
        audio = multimodal.audio_features(
            corpus.where(F.col("fmt") == "wav")
            .select(F.col("image_id").alias("clip_id"), "bytes", "fmt"))
        arow = {r["clip_id"]: r for r in audio.collect()}
        good_a = planted_ids[("wav", len(plant[0][1]))]
        bad_a = planted_ids[("wav", len(plant[1][1]))]
        assert arow[good_a]["decode_ok"] is True
        assert abs(arow[good_a]["duration_s"] - 1.0) < 1e-6
        assert arow[bad_a]["decode_ok"] is False

        # video: frame sampling with per-row failure accounting
        vid = multimodal.video_frame_sample(
            corpus.where(F.col("fmt") == "y4m")
            .select(F.col("image_id").alias("video_id"), "bytes", "fmt"),
            every_n=1)
        vrows = vid.collect()
        good_v = planted_ids[("y4m", len(plant[2][1]))]
        bad_v = planted_ids[("y4m", len(plant[3][1]))]
        good_frames = [r for r in vrows if r["video_id"] == good_v]
        bad_frames = [r for r in vrows if r["video_id"] == bad_v]
        assert sorted(r["frame_no"] for r in good_frames) == [0, 1, 2]
        assert all(r["frame_png"] is not None for r in good_frames)
        # corrupt stream → exactly one visible marker row, no silent drop
        assert [r["frame_no"] for r in bad_frames] == [-1]
        assert bad_frames[0]["frame_png"] is None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
