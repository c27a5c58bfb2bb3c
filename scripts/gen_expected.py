"""Generate expected outputs for the driver-gate queries whose semantics a
DuckDB SQL oracle cannot express: ``minhash_lsh`` and ``simhash_dedup``
(they depend on Spark's xxhash64) and the multimodal family
``media_decode`` / ``media_resize`` / ``media_frames`` (binary blobs
processed in mapInPandas).

This is an INDEPENDENT implementation: plain Python/NumPy over the
documents parquet, with the hash kernel from functions/xxh64.py (pure
Python, JVM parity proven by tests/test_xxh64.py).  It deliberately does
not import pyspark or the operators under test; the synthetic media blob
layout is re-derived here from its documented contract
(operators/multimodal.py:media_row) and kept in lockstep by
tests/test_gen_expected_sync.py.

Run from the repo root:  python scripts/gen_expected.py
Writes tests/expected/<name>_li{N}.parquet where N is the row count of the
same-sf lineitem table — the key the oracle SQL uses to dispatch on the
scale factor it is being run at (documents row counts collide between
sf0.001 and sf0.01; lineitem counts do not).

Parameters MUST mirror the gate lambdas in __spark_entry__.py (asserted by
tests/test_gen_expected_sync.py):
  minhash_lsh_pairs(threshold=0.2, n_hashes=32, bands=8, n=3, max_df=20,
                    max_bucket=100)
  simhash_pairs(max_hamming=4, max_bucket=100)
  decode_features / resize_media(8, 8) / sample_frames(every_nth=2)
"""

from __future__ import annotations

import os
import struct
import sys
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from distributed_spatial_index_spark.functions.xxh64 import xxhash64  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "expected")

N_HASHES, BANDS, NGRAM, MAX_DF, THRESHOLD = 32, 8, 3, 20, 0.2
MAX_HAMMING = 4
# hot-bucket guard: LSH band / simhash chunk buckets holding more docs than
# this are dropped from candidate generation (must equal the graded
# max_bucket in __spark_entry__.py)
MAX_BUCKET = 100

# multimodal gate parameters (must equal the gate lambdas)
MEDIA_MAX_DIM, MEDIA_N_FRAMES = 16, 4
RESIZE_W, RESIZE_H = 8, 8
FRAME_EVERY = 2
MEDIA_HEADER = 8


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
        if len(ds) > MAX_BUCKET:  # hot-bucket guard (mirror of the op)
            continue
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
        if len(ds) > MAX_BUCKET:  # hot-bucket guard (mirror of the op)
            continue
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                cand.add((a, b))
    out = []
    for a, b in sorted(cand):
        ham = bin(sig[a] ^ sig[b]).count("1")
        if ham <= MAX_HAMMING:
            out.append((a, b, ham))
    return out


# --- multimodal twins --------------------------------------------------------


def media_row(mid: int) -> tuple[str, int, int, bytes]:
    """Contract twin of operators/multimodal.py:media_row (kept in lockstep
    by tests/test_gen_expected_sync.py): (media_type, w, h, blob)."""
    rng = np.random.default_rng(1000 + mid)
    mtype = ("image", "audio", "video")[mid % 3]
    w = 4 + mid % (MEDIA_MAX_DIM - 4)
    h = 4 + (mid // 3) % (MEDIA_MAX_DIM - 4)
    frames = MEDIA_N_FRAMES if mtype == "video" else 1
    payload = rng.integers(0, 256, w * h * frames, dtype=np.uint8)
    return mtype, w, h, struct.pack("<II", w, h) + payload.tobytes()


def media_decode(doc_ids: list[int]) -> list[tuple]:
    """(media_id, mean, std, h0..h3): independent decode_features twin."""
    out = []
    for mid in doc_ids:
        _, _, _, blob = media_row(mid)
        px = np.frombuffer(blob[MEDIA_HEADER:], dtype=np.uint8)
        hist = np.bincount(px >> 6, minlength=4).astype(np.float64)
        hist = hist / hist.sum()
        out.append((mid, float(px.mean()), float(px.std()), *hist.tolist()))
    return out


def media_resize(doc_ids: list[int]) -> list[tuple[int, str]]:
    """(media_id, blob_hex): independent resize_media(RESIZE_W, RESIZE_H)
    twin (nearest-neighbor on the first frame)."""
    out = []
    for mid in doc_ids:
        _, w, h, blob = media_row(mid)
        px = np.frombuffer(
            blob[MEDIA_HEADER:MEDIA_HEADER + w * h], dtype=np.uint8
        ).reshape(h, w)
        yi = np.arange(RESIZE_H) * h // RESIZE_H
        xi = np.arange(RESIZE_W) * w // RESIZE_W
        small = px[np.ix_(yi, xi)]
        out.append(
            (mid,
             (struct.pack("<II", RESIZE_W, RESIZE_H) + small.tobytes()).hex())
        )
    return out


def media_frames(doc_ids: list[int]) -> list[tuple[int, int, str]]:
    """(media_id, frame_no, frame_hex): independent sample_frames twin
    (video blobs only, every FRAME_EVERY-th frame)."""
    out = []
    for mid in doc_ids:
        mtype, w, h, blob = media_row(mid)
        if mtype != "video":
            continue
        payload = blob[MEDIA_HEADER:]
        fsize = w * h
        for fno in range(0, len(payload) // fsize, FRAME_EVERY):
            out.append((mid, fno, payload[fno * fsize:(fno + 1) * fsize].hex()))
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

        doc_ids = [d for d, _ in docs]
        dec = media_decode(doc_ids)
        t = pa.table({
            "media_id": pa.array([r[0] for r in dec], pa.int64()),
            "mean": pa.array([r[1] for r in dec], pa.float64()),
            "std": pa.array([r[2] for r in dec], pa.float64()),
            **{f"h{i}": pa.array([r[3 + i] for r in dec], pa.float64())
               for i in range(4)},
        })
        p = os.path.join(OUT_DIR, f"media_decode_li{n_li}.parquet")
        pq.write_table(t, p)
        print(f"{sf_dir}: media_decode {len(dec)} rows -> {p}")

        rez = media_resize(doc_ids)
        t = pa.table({
            "media_id": pa.array([r[0] for r in rez], pa.int64()),
            "blob_hex": pa.array([r[1] for r in rez], pa.string()),
        })
        p = os.path.join(OUT_DIR, f"media_resize_li{n_li}.parquet")
        pq.write_table(t, p)
        print(f"{sf_dir}: media_resize {len(rez)} rows -> {p}")

        frm = media_frames(doc_ids)
        t = pa.table({
            "media_id": pa.array([r[0] for r in frm], pa.int64()),
            "frame_no": pa.array([r[1] for r in frm], pa.int32()),
            "frame_hex": pa.array([r[2] for r in frm], pa.string()),
        })
        p = os.path.join(OUT_DIR, f"media_frames_li{n_li}.parquet")
        pq.write_table(t, p)
        print(f"{sf_dir}: media_frames {len(frm)} rows -> {p}")


if __name__ == "__main__":
    main()
