"""URL canonicalization (SURVEY.md §2 O9).

The reference resolves/normalizes URLs with the ``exploding-fish`` URI
library inside its extractor (shriphani/pegasus ``src/pegasus/
defaults.clj`` — symbol-level cite per SURVEY.md §0). We reproduce the
semantics as ONE vectorized pandas implementation used in three places:

- engine hot path: wrapped as an Arrow-batched ``pandas_udf`` (no
  per-row Python — all ops are pandas ``.str`` / numpy mask vectorized),
- fixture generator (ground truth),
- the pure-Python oracle simulator (parity spec).

Canonical form: ``scheme://host[:port]/path`` with lowercase scheme+host,
fragment stripped, default ports dropped, ``.``/``..`` path segments
collapsed, empty path → ``/``. Query strings are preserved verbatim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def _normalize_path_py(path: str) -> str:
    """Collapse '.' and '..' segments; pure Python (used per *unique*
    dirty path only — see resolve_canonicalize)."""
    if not path:
        return "/"
    segs = path.split("/")
    out: list[str] = []
    for s in segs[1:] if path.startswith("/") else segs:
        if s == "." or s == "":
            continue
        if s == "..":
            if out:
                out.pop()
            continue
        out.append(s)
    tail = "/" if path.endswith(("/", "/.", "/..")) and out else ""
    return "/" + "/".join(out) + tail if out else "/"


def resolve_canonicalize(base: pd.Series, href: pd.Series) -> pd.Series:
    """Vectorized resolve+canonicalize of ``href`` against ``base``.

    ``base`` must already be canonical absolute URLs (engine invariant:
    everything in the frontier is canonical). Returns canonical absolute
    URLs; unparseable hrefs (empty after stripping) return <NA>.
    """
    href = href.astype("string").str.strip()
    href = href.str.replace(r"#.*$", "", regex=True, n=1)
    base = base.astype("string")

    is_abs = href.str.match(_SCHEME_RE).fillna(False).to_numpy(dtype=bool)
    # non-hierarchical schemes (javascript:, mailto:, data:, …) are not
    # crawlable → NA. A crawler must never path-join these.
    is_othscheme = (
        href.str.match(r"^[A-Za-z][A-Za-z0-9+.-]*:").fillna(False).to_numpy(dtype=bool)
        & ~is_abs
    )
    is_protorel = href.str.startswith("//").fillna(False).to_numpy(dtype=bool) & ~is_abs
    is_rootrel = (
        href.str.startswith("/").fillna(False).to_numpy(dtype=bool)
        & ~is_abs & ~is_protorel
    )
    is_empty = (href.isna() | (href == "")).to_numpy(dtype=bool) | is_othscheme
    is_rel = ~is_abs & ~is_protorel & ~is_rootrel & ~is_empty

    # split base into origin + dir for relative resolution
    b_origin = base.str.extract(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)", expand=False)
    b_path = base.str.replace(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+", "", regex=True, n=1)
    b_dir = b_path.str.replace(r"[^/]*$", "", regex=True, n=1)
    b_dir = b_dir.where(b_dir.str.len() > 0, "/")

    out = pd.Series(pd.array([pd.NA] * len(href), dtype="string"), index=href.index)
    out[is_abs] = href[is_abs]
    if is_protorel.any():
        b_scheme = base.str.extract(r"^([A-Za-z][A-Za-z0-9+.-]*)://", expand=False)
        out[is_protorel] = b_scheme[is_protorel] + ":" + href[is_protorel]
    if is_rootrel.any():
        out[is_rootrel] = b_origin[is_rootrel] + href[is_rootrel]
    if is_rel.any():
        out[is_rel] = b_origin[is_rel] + b_dir[is_rel] + href[is_rel]

    # --- canonicalize the absolute form ---
    scheme = out.str.extract(r"^([A-Za-z][A-Za-z0-9+.-]*)://", expand=False).str.lower()
    rest = out.str.replace(_SCHEME_RE, "", regex=True, n=1)
    netloc = rest.str.extract(r"^([^/?]*)", expand=False).str.lower()
    pathq = rest.str.replace(r"^[^/?]*", "", regex=True, n=1)
    # drop default ports
    netloc = netloc.where(~((scheme == "http") & netloc.str.endswith(":80")),
                          netloc.str.replace(r":80$", "", regex=True))
    netloc = netloc.where(~((scheme == "https") & netloc.str.endswith(":443")),
                          netloc.str.replace(r":443$", "", regex=True))
    path = pathq.str.extract(r"^([^?]*)", expand=False)
    query = pathq.str.replace(r"^[^?]*", "", regex=True, n=1)
    path = path.fillna("")
    path = path.where(path != "", "/")
    # collapse ./.. only where needed (vector mask; python only per unique dirty path)
    dirty = path.str.contains(r"/\.\.?(?:/|$)", regex=True).fillna(False)
    if dirty.any():
        uniq = {p: _normalize_path_py(p) for p in path[dirty].dropna().unique()}
        path = path.where(~dirty, path.map(uniq))
    res = scheme + "://" + netloc + path + query.fillna("")
    res[is_empty] = pd.NA
    # empty host (e.g. literal "http://") is not a crawlable URL
    res = res.where(netloc.str.len().fillna(0) > 0, pd.NA)
    return res.astype("string")


def canonicalize_one(base: str, href: str) -> str | None:
    """Scalar convenience wrapper (oracle/tests)."""
    r = resolve_canonicalize(pd.Series([base]), pd.Series([href]))
    v = r.iloc[0]
    return None if pd.isna(v) else str(v)


def host_of(urls: pd.Series) -> pd.Series:
    """Host (without port) of canonical absolute URLs, vectorized."""
    return (
        urls.astype("string")
        .str.replace(_SCHEME_RE, "", regex=True, n=1)
        .str.extract(r"^([^/:?]*)", expand=False)
    )
