"""Generate expected outputs for the driver-gate queries whose semantics a
DuckDB SQL oracle cannot express (they depend on Spark's xxhash64):
``minhash_lsh`` and ``simhash_dedup``.

This is an INDEPENDENT implementation: plain Python sets/dicts over the
documents parquet, with the hash kernel from functions/xxh64.py (pure
Python, JVM parity proven by tests/test_xxh64.py).  It deliberately does
not import pyspark or the operators under test.

Run from the repo root:  python scripts/gen_expected.py
Writes tests/expected/{minhash_lsh,simhash_dedup}_li{N}.parquet where N is
the row count of the same-sf lineitem table — the key the oracle SQL uses
to dispatch on the scale factor it is being run at (documents row counts
collide between sf0.001 and sf0.01; lineitem counts do not).

Parameters MUST mirror the gate lambdas in __spark_entry__.py:
  minhash_lsh_pairs(threshold=0.2, n_hashes=32, bands=8, n=3, max_df=20)
  simhash_pairs(max_hamming=4)
"""

from __future__ import annotations

import os
import sys
from collections import Counter, defaultdict

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from distributed_spatial_index_spark.functions.xxh64 import xxhash64  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "expected")

N_HASHES, BANDS, NGRAM, MAX_DF, THRESHOLD = 32, 8, 3, 20, 0.2
MAX_HAMMING = 4


def _load_docs(sf_dir: str) -> list[tuple[int, str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    return [(int(d), t) for d, t in rows]


def _tokens(text: str) -> list[str]:
    # mirrors F.split(F.lower(F.trim(text)), " "): trim spaces only,
    # split on single spaces keeping empty tokens
    return text.strip(" ").lower().split(" ")


def _shingles(text: str, n: int = NGRAM) -> set[str]:
    toks = _tokens(text)
    m = max(len(toks) - (n - 1), 1)
    return {" ".join(toks[i:i + n]) for i in range(m)}


def minhash_lsh(docs: list[tuple[int, str]]) -> list[tuple[int, int, float]]:
    sh = {d: _shingles(t) for d, t in docs}
    df = Counter(s for ss in sh.values() for s in ss)
    sh = {d: {s for s in ss if df[s] <= MAX_DF} for d, ss in sh.items()}
    sh = {d: ss for d, ss in sh.items() if ss}

    rows = N_HASHES // BANDS
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    shingle_h: dict[str, list[int]] = {}
    for d, ss in sh.items():
        sig = []
        for i in range(N_HASHES):
            best = None
            for s in ss:
                hs = shingle_h.get(s)
                if hs is None:
                    hs = [xxhash64(("int", j), s) for j in range(N_HASHES)]
                    shingle_h[s] = hs
                if best is None or hs[i] < best:
                    best = hs[i]
            sig.append(best)
        for b in range(BANDS):
            key = xxhash64(*sig[b * rows:(b + 1) * rows])
            buckets[(b, key)].append(d)

    cand = set()
    for ds in buckets.values():
        ds = sorted(set(ds))
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                cand.add((a, b))
    out = []
    for a, b in sorted(cand):
        inter = len(sh[a] & sh[b])
        jac = inter / (len(sh[a]) + len(sh[b]) - inter)
        if jac >= THRESHOLD:
            out.append((a, b, jac))
    return out


def simhash(docs: list[tuple[int, str]]) -> list[tuple[int, int, int]]:
    M = (1 << 64) - 1
    sig: dict[int, int] = {}
    for d, t in docs:
        toks = set(_tokens(t))
        sums = [0] * 64
        for tok in toks:
            u = xxhash64(tok) & M
            for i in range(64):
                sums[i] += 1 if (u >> i) & 1 else -1
        s = 0
        for i in range(64):
            if sums[i] > 0:
                s |= 1 << i
        sig[d] = s

    n_chunks = MAX_HAMMING + 1
    width = 64 // n_chunks
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for d, s in sig.items():
        for c in range(n_chunks):
            buckets[(c, (s >> (c * width)) & ((1 << width) - 1))].append(d)
    cand = set()
    for ds in buckets.values():
        ds = sorted(set(ds))
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                cand.add((a, b))
    out = []
    for a, b in sorted(cand):
        ham = bin(sig[a] ^ sig[b]).count("1")
        if ham <= MAX_HAMMING:
            out.append((a, b, ham))
    return out


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    con = duckdb.connect()
    for sf_dir in SF_DIRS:
        n_li = con.execute(
            f"SELECT count(*) FROM '{sf_dir}/lineitem.parquet'"
        ).fetchone()[0]
        docs = _load_docs(sf_dir)

        mh = minhash_lsh(docs)
        t = pa.table({
            "a": pa.array([r[0] for r in mh], pa.int64()),
            "b": pa.array([r[1] for r in mh], pa.int64()),
            "jaccard": pa.array([r[2] for r in mh], pa.float64()),
        })
        p = os.path.join(OUT_DIR, f"minhash_lsh_li{n_li}.parquet")
        pq.write_table(t, p)
        print(f"{sf_dir}: minhash_lsh {len(mh)} pairs -> {p}")

        sp = simhash(docs)
        t = pa.table({
            "a": pa.array([r[0] for r in sp], pa.int64()),
            "b": pa.array([r[1] for r in sp], pa.int64()),
            "hamming": pa.array([r[2] for r in sp], pa.int32()),
        })
        p = os.path.join(OUT_DIR, f"simhash_dedup_li{n_li}.parquet")
        pq.write_table(t, p)
        print(f"{sf_dir}: simhash {len(sp)} pairs -> {p}")


if __name__ == "__main__":
    main()
