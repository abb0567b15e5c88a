"""Deterministic synthetic source-code corpus (BASELINE.json input_hint shape).

Generates the ``(repo, path, commit, lang, content)`` table the engine is
designed for, seeded (seed=42, FIXTURES.md) — the analogue of the
reference's golden XML fixtures (test/fixtures/testOAI-128-records.xml).
Skew is baked in so the salting path is actually exercised: ``import``
appears in >80% of python docs and dominates total postings.

Generation is **per-document deterministic** (rng keyed by (seed, doc
index)), so the same corpus can be produced serially in pandas
(:func:`make_corpus`) or distributed across a cluster
(:func:`make_corpus_spark`) — identical rows either way.
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
KW_P = KEYWORD_W / KEYWORD_W.sum()


def gen_rows(indices: np.ndarray, *, n_docs: int, seed: int = 42,
             n_idents: int | None = None, avg_len: int = 120) -> pd.DataFrame:
    """Generate the docs whose global indices are ``indices`` — the unit of
    distributed generation. Each row depends only on (seed, index)."""
    n_idents = n_idents or max(50, n_docs // 2)
    n_repos = max(3, n_docs // 50)
    repo_w = 1.0 / np.arange(1, n_repos + 1)
    repo_p = repo_w / repo_w.sum()

    rows = []
    for i in indices:
        i = int(i)
        rng = np.random.default_rng((seed, i))
        lang = LANGS[int(rng.choice(len(LANGS), p=LANG_P))]
        repo_idx = int(rng.choice(n_repos, p=repo_p))
        L = int(np.clip(int(rng.lognormal(np.log(avg_len), 0.8)), 20, 2000))
        n_rare = max(2, L // 40)
        kw = rng.choice(KEYWORDS, size=L - n_rare, p=KW_P).tolist()
        rare = [f"ident_{int(x)}" for x in rng.integers(0, n_idents, n_rare)]
        toks = kw + rare
        if lang == "python" and rng.random() < 0.9:
            toks[0] = "import"
        rng.shuffle(toks)
        repo = f"org{repo_idx % 7}/proj{repo_idx}"
        path = f"src/m{i % 97}/file_{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}:{path}:0".encode()).hexdigest()
        rows.append((repo, path, commit, lang, " ".join(toks)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                       "content"])


def make_corpus(n_docs: int, seed: int = 42, n_idents: int | None = None,
                avg_len: int = 120) -> pd.DataFrame:
    """Serial generation (tests, small fixtures)."""
    return gen_rows(np.arange(n_docs), n_docs=n_docs, seed=seed,
                    n_idents=n_idents, avg_len=avg_len)


def make_corpus_spark(spark, n_docs: int, seed: int = 42,
                      num_partitions: int | None = None,
                      avg_len: int = 120, n_idents: int | None = None):
    """Distributed generation: identical rows to :func:`make_corpus`, built
    in parallel via mapInPandas over a doc-index range. ``n_idents``
    widens the rare-identifier vocabulary (default n_docs // 2) — used by
    the scaling harness to push the term dictionary past the dictseg
    distributed-writer crossover."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield gen_rows(pdf["id"].to_numpy(), n_docs=n_docs,
                               seed=seed, avg_len=avg_len,
                               n_idents=n_idents)

    rng_df = spark.range(0, n_docs, 1, num_partitions)
    return rng_df.mapInPandas(
        gen, "repo string, path string, commit string, lang string, "
             "content string")


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
