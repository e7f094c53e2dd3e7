"""Deterministic source-code-repository base table (FIXTURES.md §1).

Shape per BASELINE.json ``input_hint``:
``(repo string, path string, commit string, lang string, content string)``.
Repo sizes are Zipf-skewed so a few hot repos own a large share of paths —
this is what exercises salted compaction and skew handling downstream.
All vectorized numpy; no wall clock, no external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = [
    ("py", "python"), ("rs", "rust"), ("go", "go"), ("js", "javascript"),
    ("ts", "typescript"), ("java", "java"), ("c", "c"), ("cc", "cpp"),
    ("rb", "ruby"), ("scala", "scala"), ("sql", "sql"), ("md", "markdown"),
]

_WORDS = (
    "fn let mut pub use mod struct impl match return if else for while def "
    "class import from lambda yield async await try except raise with as "
    "select insert update delete merge join group order window partition "
    "val var func type interface package static void int long string bool"
).split()


def _base_text(seed: int, size: int = 1 << 16) -> str:
    rng = np.random.default_rng(seed ^ 0x5EED7E47)
    idx = rng.integers(0, len(_WORDS), size // 4)
    return " ".join(_WORDS[i] for i in idx)[:size]


def gen_repos_base(n_rows: int, seed: int = 42, zipf_a: float = 1.3) -> pa.Table:
    """Deterministic base snapshot: one row per (repo, path), keys unique."""
    rng = np.random.default_rng(seed)
    n_repos = max(16, n_rows // 200)

    # Zipf-skewed repo popularity: weight_i ∝ 1/(i+1)^a.
    w = 1.0 / np.arange(1, n_repos + 1, dtype=np.float64) ** zipf_a
    w /= w.sum()
    repo_idx = rng.choice(n_repos, size=n_rows, p=w)

    # Unique path per (repo, row-within-repo): stable cumcount per repo.
    order = np.argsort(repo_idx, kind="stable")
    cum = np.empty(n_rows, dtype=np.int64)
    sorted_idx = repo_idx[order]
    boundary = np.r_[True, sorted_idx[1:] != sorted_idx[:-1]]
    grp_start = np.maximum.accumulate(np.where(boundary, np.arange(n_rows), 0))
    cum[order] = np.arange(n_rows) - grp_start

    ext_i = rng.integers(0, len(LANGS), n_rows)
    dir_i = rng.integers(0, 24, n_rows)

    base = _base_text(seed)
    # Log-uniform content lengths, 64 B – 8 KiB.
    lens = np.exp(rng.uniform(np.log(64), np.log(8192), n_rows)).astype(np.int64)
    offs = rng.integers(0, max(1, len(base) - 8192), n_rows)

    org = repo_idx % 97
    repos = [f"org{o}/repo{r}" for o, r in zip(org, repo_idx)]
    paths = [
        f"src/dir{d}/file{k}.{LANGS[e][0]}" for d, k, e in zip(dir_i, cum, ext_i)
    ]
    langs = [LANGS[e][1] for e in ext_i]
    commits = [
        hashlib.sha1(f"{seed}:{r}:{p}:0".encode()).hexdigest()
        for r, p in zip(repos, paths)
    ]
    contents = [
        f"{r}:{p}:v0\n{base[o : o + n]}"
        for r, p, o, n in zip(repos, paths, offs, lens)
    ]
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def next_commit(seed: int, repo: str, path: str, version: int) -> str:
    return hashlib.sha1(f"{seed}:{repo}:{path}:{version}".encode()).hexdigest()
