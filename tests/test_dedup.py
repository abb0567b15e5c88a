import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from harvester_spark.operators.dedup import (exact_duplicates, minhash_lsh_pairs,
                                             minhash_signatures, ngram_jaccard,
                                             simhash, simhash_near_pairs)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "import numpy as np def main return value data result for index"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base + " extra_token_x"),                # near dup
        (3, base.replace("numpy", "pandas")),        # near dup
        (4, "completely different words about streaming windows watermark"),
        (5, "another unrelated doc talking about graph traversal nodes edges"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_exact_duplicates(dup_docs):
    groups = exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["keep_id"] == 0 and g["doc_ids"] == [0, 1] and g["n_dups"] == 2


def test_minhash_identical_sigs(dup_docs):
    sig = {r["doc_id"]: r["sig"] for r in minhash_signatures(dup_docs).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[4]
    # near-dup shares most hash mins
    agree = sum(a == b for a, b in zip(sig[0], sig[2]))
    assert agree > 32  # >half of 64


def test_minhash_lsh_pairs_find_dups(dup_docs):
    pairs = minhash_lsh_pairs(dup_docs, jaccard_threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == 1.0
    assert not any({4, 5} & {a, b} for a, b in got)


def test_minhash_approximates_jaccard(spark):
    # statistical property: signature agreement ≈ true Jaccard
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(200)]
    a = set(rng.choice(vocab, 80, replace=False))
    b = set(list(a)[:40]) | set(rng.choice(vocab, 40, replace=False))
    docs = spark.createDataFrame(
        [(0, " ".join(sorted(a))), (1, " ".join(sorted(b)))],
        "doc_id long, content string")
    sig = {r["doc_id"]: r["sig"] for r in
           minhash_signatures(docs, shingle_n=1, num_hashes=64).collect()}
    est = sum(x == y for x, y in zip(sig[0], sig[1])) / 64
    true_j = len(a & b) / len(a | b)
    assert abs(est - true_j) < 0.2


def test_simhash_hamming(dup_docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(dup_docs).collect()}
    assert fp[0] == fp[1]
    ham = bin(fp[0] ^ fp[2]).count("1")
    assert ham <= 8
    ham_far = bin(fp[0] ^ fp[4]).count("1")
    assert ham_far > ham


def test_simhash_near_pairs(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs(dup_docs, max_hamming=8).collect()}
    assert pairs.get((0, 1)) == 0
    assert not any({4, 5} & {a, b} for a, b in pairs)


def test_ngram_jaccard(dup_docs, spark):
    probe = dup_docs.filter(F.col("doc_id") == 0)
    out = {r["doc_a"]: r["jaccard"]
           for r in ngram_jaccard(dup_docs, probe).collect()}
    # pairs are (every doc, probe 0)
    assert out[1] == 1.0
    assert out[4] == 0.0
    assert 0 < out[2] < 1.0
