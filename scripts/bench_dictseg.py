"""Benchmark the front-coded dictionary segment at 10^7 synthetic terms
(r3 verdict #7 'done' criterion). Reports write time, segment size,
driver-resident index size, and lookup latency (hits + misses), vs the
python-dict baseline the 2M cap used to protect.

Usage: PYTHONPATH=. python scripts/bench_dictseg.py [n_terms]
"""
import random
import string
import sys
import time
import tempfile

from harvester_spark.operators.dictseg import DictSegment, write_dict_segment

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
rng = random.Random(42)


def gen_terms(n):
    """Sorted unique pseudo-words (zipf-ish lengths, shared prefixes —
    realistic front-coding fodder)."""
    roots = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 8)))
             for _ in range(max(1000, n // 200))]
    seen = set()
    while len(seen) < n:
        t = rng.choice(roots) + "".join(
            rng.choices(string.ascii_lowercase + "_0123456789",
                        k=rng.randint(0, 6)))
        seen.add(t)
    return sorted(seen)


t0 = time.time()
terms = gen_terms(N)
print(f"generated {len(terms):,} terms in {time.time()-t0:.1f}s")

rows = ((t, (i % 9973) + 1, 1.0 + (i % 100) / 100.0, 0.5) for i, t in
        enumerate(terms))
out = tempfile.mkdtemp(prefix="dictseg_bench_")
t0 = time.time()
info = write_dict_segment(rows, out)
wt = time.time() - t0
print(f"write: {wt:.1f}s  ({info['n_terms']/wt:,.0f} terms/s)  "
      f"segment {info['bytes']/1e6:.1f} MB "
      f"({info['bytes']/info['n_terms']:.1f} B/term)")

t0 = time.time()
seg = DictSegment(out)
leaders = seg.leaders
print(f"open: {time.time()-t0:.2f}s  leaders={len(leaders):,} "
      f"(driver-resident ~{sum(len(l) for l in leaders)/1e6:.1f} MB strings"
      f" + {len(leaders)*16/1e6:.1f} MB offsets)")

hits = rng.sample(terms, 2000)
misses = [t + "@" for t in rng.sample(terms, 2000)]
for name, probes in (("hit", hits), ("miss", misses)):
    t0 = time.time()
    found = sum(seg.get(t) is not None for t in probes)
    per = (time.time() - t0) / len(probes)
    print(f"lookup {name}: {per*1e6:.1f} µs/term  (found {found}/{len(probes)})")

# baseline: what the 2M-cap hash map would cost at this size
import sys as _sys
sample = {t: {"df": 1, "idf": 1.0, "max_tfnorm": 0.5} for t in terms[:100_000]}
per_entry = (sum(_sys.getsizeof(k) for k in list(sample)[:1000]) / 1000
             + _sys.getsizeof(next(iter(sample.values()))) + 200)
print(f"python-dict baseline would be ~{per_entry*len(terms)/1e9:.1f} GB "
      f"for {len(terms):,} terms (vs segment leaders above)")
