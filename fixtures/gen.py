"""Deterministic corpus generator (FIXTURES.md F1/F3, seed 42).

Produces the Iceberg-shaped table mandated by BASELINE.json input_hint:
(repo:string, path:string, commit:string, lang:string, content:string)
with Zipf repo skew, controlled duplicate contents and reproducible
sha256(content). No external data; pure numpy + hashlib.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

LANGS = ["zig", "py", "go", "rs", "c", "js", "md", "txt"]
LANG_W = np.array([0.05, 0.25, 0.15, 0.10, 0.10, 0.20, 0.10, 0.05])
EXT = {l: l for l in LANGS}
WORDS = ("alloc fn pub const var defer comptime struct enum union error "
         "return while for if else switch try catch async await import "
         "export let match impl trait mod use crate static inline void "
         "int float double char bool string slice array map set hash").split()


def gen_corpus(n_rows: int, seed: int = 42, dupe_frac: float = 0.0,
               n_repos: int | None = None, skew: float = 1.2) -> pd.DataFrame:
    """Deterministic corpus of n_rows files across Zipf-skewed repos."""
    rng = np.random.default_rng(seed)
    if n_repos is None:
        n_repos = max(4, n_rows // 200)
    # Zipf repo sizes: one repo holds a large share of rows
    w = 1.0 / np.arange(1, n_repos + 1) ** skew
    w /= w.sum()
    repo_idx = rng.choice(n_repos, size=n_rows, p=w)
    lang_idx = rng.choice(len(LANGS), size=n_rows, p=LANG_W / LANG_W.sum())
    file_no = rng.integers(0, 1 << 30, size=n_rows)
    w1 = rng.integers(0, len(WORDS), size=n_rows)
    w2 = rng.integers(0, len(WORDS), size=n_rows)
    n_tokens = rng.integers(8, 512, size=n_rows)
    token_ids = rng.integers(0, len(WORDS), size=int(n_tokens.sum()))

    repos, paths, commits, langs, contents = [], [], [], [], []
    off = 0
    for i in range(n_rows):
        r = int(repo_idx[i])
        repo = f"org{r % 17}/repo{r}"
        lang = LANGS[lang_idx[i]]
        path = f"src/{WORDS[w1[i]]}/{WORDS[w2[i]]}_{int(file_no[i])}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}:{int(file_no[i])}".encode()).hexdigest()
        k = int(n_tokens[i])
        body = " ".join(WORDS[t] for t in token_ids[off:off + k])
        off += k
        content = f"// {repo}/{path}@{commit[:8]}\n{body}"
        repos.append(repo); paths.append(path); commits.append(commit)
        langs.append(lang); contents.append(content)

    df = pd.DataFrame({"repo": repos, "path": paths, "commit": commits,
                       "lang": langs, "content": contents})
    if dupe_frac > 0:
        n_dupes = int(n_rows * dupe_frac)
        src = rng.integers(0, n_rows - n_dupes, size=n_dupes)
        dst = np.arange(n_rows - n_dupes, n_rows)
        # duplicate content across different repos (F3 `dupes` fixture)
        df.loc[dst, "content"] = df.loc[src, "content"].to_numpy()
    return df


def write_corpus(path: str, n_rows: int, seed: int = 42, **kw) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    gen_corpus(n_rows, seed, **kw).to_parquet(path, index=False)
    return path


if __name__ == "__main__":
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus.parquet"
    print(write_corpus(out, n), n, "rows")
