"""Deterministic synthetic source-code corpus (BASELINE.json input_hint shape).

Generates the ``(repo, path, commit, lang, content)`` table the engine is
designed for, seeded (seed=42, FIXTURES.md) — the analogue of the
reference's golden XML fixtures (test/fixtures/testOAI-128-records.xml).
Skew is baked in so the salting path is actually exercised: ``import``
appears in >80% of python docs and dominates total postings.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["python", "java", "js", "go", "c"]
LANG_P = [0.45, 0.2, 0.15, 0.1, 0.1]
EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "c": "c"}

# keyword vocabulary with skewed frequencies (code-corpus shape)
KEYWORDS = ["import", "def", "class", "return", "self", "for", "if", "else",
            "while", "try", "except", "with", "lambda", "yield", "assert",
            "from", "print", "range", "len", "none", "true", "false", "value",
            "data", "result", "name", "type", "key", "item", "index", "node",
            "list", "dict", "str", "int", "func", "var", "const", "public",
            "static", "void", "new", "this", "package", "struct", "interface"]
KEYWORD_W = np.array([400, 200, 120, 180, 160, 140, 150, 80, 60, 50, 40, 55,
                      25, 30, 20, 90, 45, 35, 40, 15, 22, 18, 70, 75, 65, 60,
                      50, 45, 40, 35, 30, 42, 38, 33, 28, 26, 24, 20, 18, 17,
                      16, 15, 14, 12, 10, 9], dtype=np.float64)


def make_corpus(n_docs: int, seed: int = 42, n_idents: int | None = None,
                avg_len: int = 120) -> pd.DataFrame:
    """Build the corpus as pandas (callers parallelize via spark.createDataFrame).

    Each doc: skewed keyword tokens + a few rare ``ident_k`` tokens so every
    doc has discriminative terms. Length log-normal, clipped to [20, 2000].
    """
    rng = np.random.default_rng(seed)
    n_idents = n_idents or max(50, n_docs // 2)

    lang = rng.choice(len(LANGS), size=n_docs, p=LANG_P)
    n_repos = max(3, n_docs // 50)
    # Zipf-ish repo sizes
    repo_w = 1.0 / np.arange(1, n_repos + 1)
    repo_idx = rng.choice(n_repos, size=n_docs, p=repo_w / repo_w.sum())

    lens = np.clip(rng.lognormal(np.log(avg_len), 0.8, n_docs).astype(np.int64),
                   20, 2000)

    kw_p = KEYWORD_W / KEYWORD_W.sum()
    rows = []
    for i in range(n_docs):
        L = int(lens[i])
        n_rare = max(2, L // 40)
        kw = rng.choice(KEYWORDS, size=L - n_rare, p=kw_p).tolist()
        rare = [f"ident_{int(x)}" for x in rng.integers(0, n_idents, n_rare)]
        toks = kw + rare
        # python docs get a guaranteed leading 'import' >80% of the time
        if LANGS[lang[i]] == "python" and rng.random() < 0.9:
            toks[0] = "import"
        rng.shuffle(toks)
        lg = LANGS[lang[i]]
        repo = f"org{repo_idx[i] % 7}/proj{repo_idx[i]}"
        path = f"src/m{i % 97}/file_{i}.{EXT[lg]}"
        commit = hashlib.sha1(f"{repo}:{path}:0".encode()).hexdigest()
        rows.append((repo, path, commit, lg, " ".join(toks)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                       "content"])


QUERY_SET: list[tuple[str, int]] = [
    # (query, k) — FIXTURES.md §2 coverage
    ("ident_7", 10),              # single rare term
    ("import", 10),               # single ultra-common term (salted postings)
    ("import ident_3", 10),       # common + rare 2-term
    ("def class return", 10),     # 3-term
    ("zzz_absent_term", 10),      # term absent from corpus
    ("self", 1),                  # k=1 edge
    ("value data result", 100),   # k=100 edge
    ("import import def", 10),    # duplicate query terms (deduped)
]
