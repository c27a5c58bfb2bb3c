"""Lockstep guards for the expected-parquet oracle generator.

scripts/gen_expected.py is deliberately INDEPENDENT of pyspark and of the
operators under test, so its gate parameters and its synthetic-media
contract twin can silently drift from __spark_entry__.py / the operators.
Silent drift would make the committed expected parquets stale and fail the
driver gate confusingly — these tests make drift loud instead (ADVICE r2).
"""

from __future__ import annotations

import importlib.util
import inspect
import os

import __spark_entry__ as entry
from distributed_spatial_index_spark.operators import dedup, multimodal

_GE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "gen_expected.py",
)
_spec = importlib.util.spec_from_file_location("gen_expected", _GE_PATH)
ge = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ge)


def test_gate_constants_match_entry():
    assert ge.MAX_DF == entry._MAX_DF
    assert ge.MAX_BUCKET == entry._MAX_BUCKET
    assert ge.THRESHOLD == entry._LSH_THRESHOLD
    assert ge.MAX_HAMMING == entry._MAX_HAMMING
    assert (ge.RESIZE_W, ge.RESIZE_H) == (entry._RESIZE_W, entry._RESIZE_H)
    assert ge.FRAME_EVERY == entry._FRAME_EVERY


def test_lsh_shape_matches_operator_defaults():
    sig = inspect.signature(dedup.minhash_lsh_pairs)
    assert ge.N_HASHES == sig.parameters["n_hashes"].default
    assert ge.BANDS == sig.parameters["bands"].default
    assert ge.NGRAM == sig.parameters["n"].default


def test_media_contract_matches_operator():
    """gen_expected re-derives the synthetic blob layout; every field must
    equal the operator-side single source of truth for a spread of ids
    (incl. ids past one max_dim cycle and all three media types)."""
    sig = inspect.signature(multimodal.media_row)
    assert ge.MEDIA_MAX_DIM == sig.parameters["max_dim"].default
    assert ge.MEDIA_N_FRAMES == sig.parameters["n_frames"].default
    assert ge.MEDIA_HEADER == multimodal.HEADER
    for mid in list(range(16)) + [37, 100, 499, 1234]:
        op_mid, op_type, op_w, op_h, op_blob = multimodal.media_row(mid)
        ge_type, ge_w, ge_h, ge_blob = ge.media_row(mid)
        assert (op_mid, op_type, op_w, op_h) == (mid, ge_type, ge_w, ge_h)
        assert op_blob == ge_blob
