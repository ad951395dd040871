import numpy as np

from pegasus_spark import codec
from pegasus_spark.fixtures import WebParams, generate_web
from pegasus_spark.hashing import xxhash64_str


def test_deterministic_regeneration():
    p = WebParams(seed=7, n_pages=50, n_hosts=5)
    a = generate_web(p)
    b = generate_web(p)
    for name in ("pages", "seeds", "robots_txt"):
        assert a[name].equals(b[name]), name


def test_pages_schema_and_invariants():
    p = WebParams(seed=42, n_pages=100, n_hosts=5, lossy_frac=0.5)
    web = generate_web(p)
    pages = web["pages"]
    assert list(pages.columns) == [
        "url", "url_hash", "host", "image_id", "bytes", "w", "h",
        "fmt", "caption", "phash", "out_links", "pixels_ref", "ref_md5",
        "redirect_to", "flaky_until_round",
    ]
    # redirect/flaky knobs default OFF: all-200, never-failing store
    assert pages["redirect_to"].isna().all()
    assert (pages["flaky_until_round"] == 0).all()
    # the stored checksum IS md5(pixels_ref) — the fetch validator's
    # lossless bit-exactness check depends on this invariant
    import hashlib

    assert (pages["ref_md5"] == pages["pixels_ref"].map(
        lambda b: hashlib.md5(b).hexdigest())).all()
    assert pages["url"].is_unique
    for _, r in pages.iterrows():
        assert r["url_hash"] == xxhash64_str(r["url"])
        px_ref = np.frombuffer(r["pixels_ref"], dtype=np.uint8).reshape(r["h"], r["w"], 3)
        dec = codec.decode(r["bytes"], r["fmt"])
        assert dec.shape == px_ref.shape
        if r["fmt"] == "png":
            assert np.array_equal(dec, px_ref)
        else:
            assert codec.psnr(dec, px_ref) >= 40.0
        assert r["phash"] == codec.phash(px_ref)
    assert set(pages["fmt"]) == {"png", "qnt"}


def test_hot_host_skew_present():
    p = WebParams(seed=42, n_pages=2000, n_hosts=20)
    pages = generate_web(p)["pages"]
    counts = pages.groupby("host").size().sort_values(ascending=False)
    # Zipf: hottest host should dominate the coldest by a wide margin
    assert counts.iloc[0] > 5 * counts.iloc[-1]


def test_robots_and_seeds():
    p = WebParams(seed=42, n_pages=200, n_hosts=10, n_seeds=5)
    web = generate_web(p)
    robots = web["robots_txt"]
    assert len(robots) == 10
    # deny-all host exists
    deny_all = [r for _, r in robots.iterrows() if r["rules"][0] == {"allow": False, "prefix": "/"}]
    assert len(deny_all) == 1
    seeds = web["seeds"]
    assert len(seeds) == 5
    assert (seeds["priority"] == 0).all()
