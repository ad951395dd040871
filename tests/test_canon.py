import pandas as pd
import pytest

from pegasus_spark.canon import canonicalize_one, host_of, resolve_canonicalize

BASE = "http://h3.example/p/17"

TABLE = [
    # (href, expected)
    ("http://h5.example/p/9", "http://h5.example/p/9"),
    ("HTTP://H5.EXAMPLE/p/9", "http://h5.example/p/9"),
    ("http://h5.example:80/p/9", "http://h5.example/p/9"),
    ("https://h5.example:443/p/9", "https://h5.example/p/9"),
    ("http://h5.example:8080/p/9", "http://h5.example:8080/p/9"),
    ("http://h5.example/p/9#frag", "http://h5.example/p/9"),
    ("http://h5.example/p/9?q=1#frag", "http://h5.example/p/9?q=1"),
    ("/p/9", "http://h3.example/p/9"),
    ("../p/9", "http://h3.example/p/9"),
    ("9", "http://h3.example/p/9"),
    ("./9", "http://h3.example/p/9"),
    ("http://h5.example", "http://h5.example/"),
    ("http://h5.example/a/./b/../c", "http://h5.example/a/c"),
    ("http://h5.example/../../x", "http://h5.example/x"),
    ("  http://h5.example/p/9  ", "http://h5.example/p/9"),
    ("//h5.example/p/9", "http://h5.example/p/9"),
]

NON_CRAWLABLE = ["javascript:alert(1)", "mailto:a@b.c", "data:text/plain,x", "http://", "", "#frag"]


@pytest.mark.parametrize("href,expected", TABLE)
def test_canonicalize_table(href, expected):
    assert canonicalize_one(BASE, href) == expected


def test_vectorized_matches_scalar():
    hrefs = pd.Series([h for h, _ in TABLE])
    bases = pd.Series([BASE] * len(TABLE))
    out = resolve_canonicalize(bases, hrefs)
    assert list(out) == [e for _, e in TABLE]


def test_non_crawlable_hrefs_are_na():
    out = resolve_canonicalize(
        pd.Series([BASE] * len(NON_CRAWLABLE)), pd.Series(NON_CRAWLABLE)
    )
    assert out.isna().all()


def test_host_of():
    s = pd.Series(["http://h3.example/p/1", "https://x.y:8080/z", "http://h0.example/"])
    assert list(host_of(s)) == ["h3.example", "x.y", "h0.example"]


def test_idempotent():
    for href, expected in TABLE:
        assert canonicalize_one(expected, expected) == expected
