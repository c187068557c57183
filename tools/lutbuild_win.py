"""Time the numpy-vectorized ADC LUT build vs the retired scalar loop
(r14 verdict task 5: ivf_pq_probe_batched built its per-query lookup
tables in a driver-side Python loop, O(|queries| * M * ksub) ≈ 2M
iterations at a 1000-query batch).

Pure driver-side measurement — the LUT build is driver work by design
(the tables broadcast to executors). The scalar reference here is the
retired loop verbatim (pq._fold_l2sq per cell); equality of every cell
is asserted bit-for-bit, which is the same guarantee the live code pins
via the batched ≡ per-query probe test.

Appends a "lut_build" entry to BATCHPROBE_WIN.json.

Usage: python tools/lutbuild_win.py [n_queries] [m] [ksub] [dsub]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scalar_build(queries, cb, m, dsub):
    """The retired loop, verbatim shape (pq._fold_l2sq per cell)."""
    from data_wrangle_openstreetmaps_data_1_spark.operators.pq import _fold_l2sq

    lut_rows = [[] for _ in range(m)]
    for qid, qvec in queries:
        for mi in range(m):
            qs = qvec[mi * dsub : (mi + 1) * dsub]
            for code0, cvec in enumerate(cb[mi]):
                dd = _fold_l2sq(qs, cvec)
                lut_rows[mi].append((int(qid), code0 + 1, float(dd)))
    return lut_rows


def numpy_build(queries, cb, m, dsub):
    """The live build (operators/ivf_index.py ivf_pq_probe_batched),
    replicated: same left-fold accumulation order per cell."""
    qids = np.asarray([int(qid) for qid, _ in queries], dtype=np.int64)
    qmat = np.asarray([qvec for _, qvec in queries], dtype=np.float64)
    out = []
    for mi in range(m):
        cmat = np.asarray(cb[mi], dtype=np.float64)
        qs = qmat[:, mi * dsub : (mi + 1) * dsub]
        acc = np.zeros((qmat.shape[0], cmat.shape[0]), dtype=np.float64)
        for j in range(dsub):
            diff = qs[:, j, None] - cmat[None, :, j]
            acc += diff * diff
        out.append((qids, acc))
    return out


def main() -> int:
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ksub = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    dsub = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    rng = np.random.RandomState(0)
    queries = [(i, rng.randn(m * dsub).tolist()) for i in range(nq)]
    cb = [rng.randn(ksub, dsub).tolist() for _ in range(m)]

    t0 = time.perf_counter()
    ref = scalar_build(queries, cb, m, dsub)
    scalar_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = numpy_build(queries, cb, m, dsub)
    numpy_sec = time.perf_counter() - t0

    # bit-for-bit equality, every cell
    for mi in range(m):
        qids, acc = got[mi]
        flat = acc.ravel()
        assert len(ref[mi]) == flat.shape[0]
        for idx, (qid, code1, dd) in enumerate(ref[mi]):
            assert qids[idx // ksub] == qid
            assert idx % ksub + 1 == code1
            assert flat[idx] == dd, (mi, idx, flat[idx], dd)

    entry = {
        "n_queries": nq, "m": m, "ksub": ksub, "dsub": dsub,
        "cells": nq * m * ksub,
        "scalar_loop_sec": round(scalar_sec, 3),
        "numpy_sec": round(numpy_sec, 4),
        "speedup": round(scalar_sec / max(numpy_sec, 1e-9), 1),
        "bit_identical": True,
    }
    path = os.path.join(REPO, "BATCHPROBE_WIN.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["lut_build"] = entry
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    print(json.dumps(entry))
    return 0


if __name__ == "__main__":
    sys.exit(main())
