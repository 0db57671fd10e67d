"""Driver-style correctness gate at an arbitrary scale factor.

Mirrors the external driver: vanilla session (hostile non-UTC TZ probe),
every registered query vs its DuckDB oracle over the same parquet tables,
comparing sorted column names, row count, and order-insensitive values
(floats rounded to 9 places). Writes a CORRECTNESS_r{N}-shaped JSON.

Usage: python tools/drive_at_sf.py <sf_dir> <out_json>
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def rows(df):
    names = sorted(df.columns)
    cols = [[canon(x) for x in df[c].tolist()] for c in names]
    return sorted(zip(*cols), key=lambda r: tuple((x is None, str(x)) for x in r))


def digest(df) -> object:
    """Order-insensitive canonical form, vectorized for multi-million-row
    results (the per-value Python path above takes tens of minutes at sf1.0):
    every column is canonicalized to a string series (floats rounded to 9
    like ``canon``; NaN → 'NaN'; NULL → sentinel), then the row strings are
    SORTED and hashed. Falls back to the exact tuple path for small frames
    so any dtype oddity (nested arrays, decimals) keeps byte-for-byte
    semantics there."""
    import hashlib

    import numpy as np
    import pandas as pd

    if len(df) < 100_000:
        return rows(df)
    parts = []
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # float columns conflate NULL and NaN on both sides (pandas
            # float64 holds one NaN) — same semantics as `canon` above.
            r = s.round(9)
            out = r.map(repr)  # repr(float) is exact & stable across engines
            out = out.mask(r.isna(), "NaN")
        elif s.dtype == object:
            # EVERY object column takes the exact per-cell path (no
            # sampling: a column whose sampled head is scalar but whose
            # tail holds arrays would otherwise fall into str(), where
            # numpy's '...' elision can hash two different arrays equal).
            # Sequence-valued cells: str(ndarray) elides >1000-element
            # arrays with '...' (two different arrays could hash equal) and
            # ndarray vs list reprs differ between Spark toPandas and
            # DuckDB to_pandas — serialize the actual elements instead;
            # scalar cells pass through str() unchanged.
            # Numeric sequences go through a vectorized bytes path (rounded
            # float64 / int64 buffers) — the per-element canon() path is
            # minutes-slow at embedding widths × 100k+ rows.
            import json as _json

            def _seq(v):
                if isinstance(v, (list, tuple, np.ndarray)):
                    a = np.asarray(v)
                    if a.ndim == 1 and a.dtype.kind == "f":
                        buf = b"f" + np.round(a.astype(np.float64), 9).tobytes()
                    elif a.ndim == 1 and a.dtype.kind in "iu":
                        buf = b"i" + a.astype(np.int64).tobytes()
                    else:
                        buf = _json.dumps(
                            [canon(x) for x in a.tolist()], separators=(",", ":")
                        ).encode()
                    # fixed-width per-cell digest: joining full element dumps
                    # into the row strings is GBs at embedding widths
                    return hashlib.md5(buf).hexdigest()
                return str(v)

            out = s.map(_seq, na_action="ignore")
            out = out.mask(s.isna(), "\x00null")
        else:
            out = s.astype(str)
            out = out.mask(s.isna(), "\x00null")
        parts.append(out.to_numpy(dtype=str))
    joined = parts[0]
    for p in parts[1:]:
        joined = np.char.add(np.char.add(joined, "\x01"), p)
    joined.sort()
    return hashlib.md5("\n".join(joined).encode()).hexdigest()


def cc_unionfind_oracle(con):
    """Scale-tractable oracle for ``dedup_cluster_canonical``: the registry's
    recursive-CTE oracle is exact but DuckDB's recursive UNION accumulates
    every (node, reachable-label) pair — quadratic in clique size, measured
    270 s at sf0.1 and unbounded-hours at sf1.0 where the generator plants
    10-way duplicate groups. This replacement keeps the PAIR step in DuckDB
    (the independently hash-verified ``DEDUP_NGRAM_ORACLE``) and collapses
    pairs to components with textbook union-find in Python (0.2 s at sf0.1,
    verified element-identical to the recursive CTE there). No engine-under-
    test code involved."""
    from collections import Counter

    import numpy as np
    import pandas as pd

    from steam_data_engineer_project_spark.queries import DEDUP_NGRAM_ORACLE

    pe = con.execute(
        f"SELECT id_a, id_b FROM ({DEDUP_NGRAM_ORACLE})"
    ).fetchall()
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pe:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = {a for a, _ in pe} | {b for _, b in pe}
    comp = {n: find(n) for n in nodes}
    sizes = Counter(comp.values())
    rows_ = sorted(nodes)
    return pd.DataFrame(
        {
            "doc_id": np.array(rows_, dtype=np.int64),
            "component": np.array([comp[n] for n in rows_], dtype=np.int64),
            "cluster_size": np.array(
                [sizes[comp[n]] for n in rows_], dtype=np.int64
            ),
            "is_canonical": np.array([n == comp[n] for n in rows_], dtype=bool),
        }
    )


#: oracles the tool computes outside DuckDB SQL (exact, engine-independent);
#: the registry keeps the pure-SQL version for the external driver's sf0.01
#: gate, where it is tractable.
def semdedup_numpy_oracle(con):
    """Scale-tractable oracle for ``dedup_embedding_cosine``: the registry's
    pure-SQL oracle unrolls the Lloyd iterations as k×N cross joins with
    per-element list lambdas — fine at sf0.01 (k=8, 500 vectors), measured
    >590 s at sf1.0 (k=320, 20k vectors → 400M lambda evals per
    assignment). This replacement keeps the lsh_pair leg in DuckDB (the
    SQL the sf0.01 gate hash-verified) and replays the semdedup legs with
    int64 numpy — the IDENTICAL arithmetic (same quantization expression
    tree, same integer distance D = c²Σx² − 2c(x·s) + Σs², same single
    double division, same first-min/lowest-cid ties), so values are
    bit-equal, just vectorized. No engine-under-test code involved."""
    import math

    import numpy as np
    import pandas as pd

    from steam_data_engineer_project_spark.queries import (
        _SEM_ITER,
        _SEM_K,
        _SEM_SEED_UNIT,
        _SEM_THRESHOLD,
        _lsh_pair_oracle_body,
    )

    lsh = con.execute(
        f"SELECT id_a, id_b, cosine FROM ({_lsh_pair_oracle_body()})"
    ).fetch_arrow_table().to_pandas()

    raw = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetch_arrow_table().to_pandas()
    ids = raw["vec_id"].to_numpy().astype(np.int64)
    E = np.stack([np.asarray(v, dtype=np.float64) for v in raw["embedding"]])
    dim = E.shape[1]

    # planted fixture (mirror of queries._sem_embeddings)
    dec = ids // 10
    lat = ((dec[:, None] * 31 + np.arange(dim)[None, :] * 17) % 13 - 6).astype(
        np.float64
    )
    lat[ids % 10 == 7, 0] += 0.25
    emb = np.where(np.isin(ids % 10, (6, 7))[:, None], lat, E)

    # int8 quantization (same expression tree as operators.quantize_int8)
    amax = np.maximum(np.abs(emb).max(axis=1), 1e-30)
    qv = np.floor(emb * (127.0 / amax)[:, None] + 0.5).astype(np.int64)

    n = len(ids)
    k = _SEM_K * math.ceil(n / _SEM_SEED_UNIT)
    seed_mask = ids < k
    cids = ids[seed_mask]
    order = np.argsort(cids)
    cids = cids[order]
    S = qv[seed_mask][order].copy()
    C = np.ones(len(cids), dtype=np.int64)

    def assign(X, S, C):
        dots = X @ S.T
        xx = np.einsum("nd,nd->n", X, X)
        ss = np.einsum("kd,kd->k", S, S)
        D = (C * C)[None, :] * xx[:, None] - 2 * C[None, :] * dots + ss[None, :]
        dist = D.astype(np.float64) / (C * C).astype(np.float64)[None, :]
        j = np.argmin(dist, axis=1)  # first min = smallest cid (cids sorted)
        return j, dist[np.arange(len(X)), j]

    def lloyd(X, S, C):
        """_SEM_ITER Lloyd updates then the final assignment — identical
        rules to the main chain (emptied cluster keeps previous state)."""
        for _ in range(_SEM_ITER):
            j, _d = assign(X, S, C)
            newS = np.zeros_like(S)
            newC = np.zeros_like(C)
            np.add.at(newS, j, X)
            np.add.at(newC, j, 1)
            emptied = newC == 0  # emptied cluster keeps previous state
            S = np.where(emptied[:, None], S, newS)
            C = np.where(emptied, C, newC)
        j, dist = assign(X, S, C)
        return j, dist, S, C

    j, dist, _S, _C = lloyd(qv, S, C)
    cluster = cids[j]

    legs = [
        pd.DataFrame(
            {
                "part": "lsh_pair",
                "id_a": lsh["id_a"].astype(np.int64),
                "id_b": lsh["id_b"].astype(np.int64),
                "cosine": lsh["cosine"].astype(np.float64),
                "cluster_id": np.nan,
                "n": np.nan,
                "cos_micro": np.nan,
                "dist": np.nan,
            }
        ),
        pd.DataFrame(
            {
                "part": "assign",
                "id_a": ids,
                "id_b": np.nan,
                "cosine": np.nan,
                "cluster_id": cluster,
                "n": np.nan,
                "cos_micro": np.nan,
                "dist": dist,
            }
        ),
    ]
    uniq, counts = np.unique(cluster, return_counts=True)
    legs.append(
        pd.DataFrame(
            {
                "part": "size",
                "id_a": np.nan,
                "id_b": np.nan,
                "cosine": np.nan,
                "cluster_id": uniq,
                "n": counts.astype(np.int64),
                "cos_micro": np.nan,
                "dist": np.nan,
            }
        )
    )

    t_sq = int(_SEM_THRESHOLD * _SEM_THRESHOLD * 10_000)
    n2 = np.einsum("nd,nd->n", qv, qv)
    pa, pb, pc, pm = [], [], [], []
    for c in uniq:
        m = np.flatnonzero(cluster == c)
        m = m[np.argsort(ids[m])]  # id-ascending so i<j ⇒ id_a < id_b
        if len(m) < 2:
            continue
        G = qv[m]
        dots = G @ G.T
        nn = n2[m]
        iu, ju = np.triu_indices(len(m), k=1)
        d = dots[iu, ju]
        keep = (d > 0) & (10_000 * d * d >= t_sq * nn[iu] * nn[ju])
        if not keep.any():
            continue
        d = d[keep]
        # long product THEN cast — the exact order of the Spark expression
        # ((na*nb).cast("double")); fits int64 (≤ (dim·127²)² ≈ 1.06e12)
        na = (nn[iu][keep] * nn[ju][keep]).astype(np.float64)
        pa.append(ids[m][iu[keep]])
        pb.append(ids[m][ju[keep]])
        pc.append(np.full(len(d), c, dtype=np.int64))
        pm.append(
            np.floor(d.astype(np.float64) / np.sqrt(na) * 1e6 + 0.5).astype(
                np.int64
            )
        )
    if pa:
        legs.append(
            pd.DataFrame(
                {
                    "part": "pair",
                    "id_a": np.concatenate(pa),
                    "id_b": np.concatenate(pb),
                    "cosine": np.nan,
                    "cluster_id": np.concatenate(pc),
                    "n": np.nan,
                    "cos_micro": np.concatenate(pm),
                    "dist": np.nan,
                }
            )
        )

    # incremental legs (mirror of queries._semdedup_incremental_oracle_body):
    # corpus = ids ≢ 5,7 (mod 10), incoming = the rest; Lloyd on the corpus
    # only (seeded by its k smallest ids), incoming assigned to the FROZEN
    # final state, pairs batch-vs-corpus within shared clusters.
    cmask = ~np.isin(ids % 10, (5, 7))
    imask = ~cmask
    k2 = _SEM_K * math.ceil(int(cmask.sum()) / _SEM_SEED_UNIT)
    seed_ids = np.sort(ids[cmask])[:k2]
    smask = np.isin(ids, seed_ids)
    cids2 = ids[smask]
    order2 = np.argsort(cids2)
    cids2 = cids2[order2]
    jc, _dc, S2, C2 = lloyd(
        qv[cmask],
        qv[smask][order2].copy(),
        np.ones(len(cids2), dtype=np.int64),
    )
    ji, _di = assign(qv[imask], S2, C2)
    ccl, icl = cids2[jc], cids2[ji]
    inc_ids_arr, qi, qc = ids[imask], qv[imask], qv[cmask]
    n2i = np.einsum("nd,nd->n", qi, qi)
    n2c = np.einsum("nd,nd->n", qc, qc)
    nm = np.zeros(len(inc_ids_arr), dtype=np.int64)
    mc = np.full(len(inc_ids_arr), np.nan)
    for c in np.unique(icl):
        im = np.flatnonzero(icl == c)
        cm = np.flatnonzero(ccl == c)
        if len(cm) == 0:
            continue
        dmat = qi[im] @ qc[cm].T
        keep = (dmat > 0) & (
            10_000 * dmat * dmat >= t_sq * n2i[im][:, None] * n2c[cm][None, :]
        )
        cnt = keep.sum(axis=1)
        nm[im] += cnt
        if keep.any():
            na = (n2i[im][:, None] * n2c[cm][None, :]).astype(np.float64)
            cosm = np.floor(dmat.astype(np.float64) / np.sqrt(na) * 1e6 + 0.5)
            cosm = np.where(keep, cosm, -np.inf)
            has = cnt > 0
            mc[im[has]] = cosm.max(axis=1)[has]
    legs.append(
        pd.DataFrame(
            {
                "part": np.where(nm > 0, "inc_dup", "inc_new"),
                "id_a": inc_ids_arr,
                "id_b": np.nan,
                "cosine": np.nan,
                "cluster_id": icl,
                "n": nm.astype(np.int64),
                "cos_micro": mc,
                "dist": np.nan,
            }
        )
    )
    return pd.concat(legs, ignore_index=True)


def corpus_store_hybrid_oracle(con):
    """Scale-tractable oracle for ``corpus_store_suite``: the text-tier
    legs (doc/span/bloom/kmv) run in DuckDB via the registry's own
    ``_corpus_store_text_oracle_body`` (sf1-tractable — shingle joins and
    bit math, no Lloyd unrolling), while the semantic legs are replayed
    with int64 numpy — the IDENTICAL arithmetic as the registry SQL (same
    lattice fixture, same quantization, same integer distance with
    first-min/lowest-cid ties, same frozen-state assignment of batches 1
    and 2, same exact-integer pair threshold), so values are bit-equal.
    No engine-under-test code involved."""
    import math

    import numpy as np
    import pandas as pd

    from steam_data_engineer_project_spark.queries import (
        _SEM_ITER,
        _SEM_K,
        _SEM_SEED_UNIT,
        _SEM_THRESHOLD,
        _corpus_store_text_oracle_body,
    )

    text = con.execute(
        _corpus_store_text_oracle_body()
    ).fetch_arrow_table().to_pandas()

    raw = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetch_arrow_table().to_pandas()
    ids = raw["vec_id"].to_numpy().astype(np.int64)
    E = np.stack([np.asarray(v, dtype=np.float64) for v in raw["embedding"]])
    dim = E.shape[1]

    # planted fixture (mirror of queries._store_embeddings)
    g = ids // 20
    i_idx = np.arange(dim)[None, :]
    lat31 = ((g[:, None] * 31 + i_idx * 17) % 13 - 6).astype(np.float64)
    lat37 = ((g[:, None] * 37 + i_idx * 17) % 13 - 6).astype(np.float64)
    emb = E.copy()
    m20, m40 = ids % 20, ids % 40
    emb[m20 == 0] = lat31[m20 == 0]
    emb[m20 == 6] = lat37[m20 == 6]
    sel = m40 == 8
    emb[sel] = lat31[sel]
    emb[sel, 0] += 0.25
    sel = m40 == 28
    emb[sel] = lat37[sel]
    emb[sel, 0] += 0.25

    amax = np.maximum(np.abs(emb).max(axis=1), 1e-30)
    qv = np.floor(emb * (127.0 / amax)[:, None] + 0.5).astype(np.int64)

    bmask = ids % 10 <= 5
    b1mask = np.isin(ids % 10, (6, 7))
    b2mask = np.isin(ids % 10, (8, 9))
    k = _SEM_K * math.ceil(int(bmask.sum()) / _SEM_SEED_UNIT)
    seed_ids = np.sort(ids[bmask])[:k]
    smask = np.isin(ids, seed_ids)
    cids = ids[smask]
    order = np.argsort(cids)
    cids = cids[order]
    S = qv[smask][order].copy()
    C = np.ones(len(cids), dtype=np.int64)

    def dist_mat(X, S, C):
        dots = X @ S.T
        xx = np.einsum("nd,nd->n", X, X)
        ss = np.einsum("kd,kd->k", S, S)
        D = (C * C)[None, :] * xx[:, None] - 2 * C[None, :] * dots + ss[None, :]
        return D.astype(np.float64) / (C * C).astype(np.float64)[None, :]

    def assign(X, S, C):
        # first min = smallest cid (cids sorted)
        return np.argmin(dist_mat(X, S, C), axis=1)

    X = qv[bmask]
    for _ in range(_SEM_ITER):
        j = assign(X, S, C)
        newS = np.zeros_like(S)
        newC = np.zeros_like(C)
        np.add.at(newS, j, X)
        np.add.at(newC, j, 1)
        emptied = newC == 0  # emptied cluster keeps previous state
        S = np.where(emptied[:, None], S, newS)
        C = np.where(emptied, C, newC)
    jb = assign(X, S, C)
    j1 = assign(qv[b1mask], S, C)
    d2 = dist_mat(qv[b2mask], S, C)
    j2 = np.argmin(d2, axis=1)
    # top-2 probes for the sem_b2_p2 leg (stable sort = (dist, cid) ties,
    # cids sorted ascending — same order as the SQL's ROW_NUMBER)
    J2p = np.argsort(d2, axis=1, kind="stable")[:, : min(2, len(cids))]

    corp_q = np.concatenate([qv[bmask], qv[b1mask]])
    corp_cl = np.concatenate([cids[jb], cids[j1]])
    inc_q, inc_cl, inc_ids = qv[b2mask], cids[j2], ids[b2mask]
    n2c = np.einsum("nd,nd->n", corp_q, corp_q)
    n2i = np.einsum("nd,nd->n", inc_q, inc_q)
    t_sq = int(_SEM_THRESHOLD * _SEM_THRESHOLD * 10_000)

    def sem_match(Jp):
        """Pair matching over the probed clusters in Jp (n × p ranks) —
        each corpus member belongs to ONE cluster, so ranks never double
        count; running-max via fmax (fmax(nan, x) = x)."""
        nm = np.zeros(len(inc_ids), dtype=np.int64)
        mc = np.full(len(inc_ids), np.nan)
        for r in range(Jp.shape[1]):
            pcl = cids[Jp[:, r]]
            for c in np.unique(pcl):
                im = np.flatnonzero(pcl == c)
                cm = np.flatnonzero(corp_cl == c)
                if len(cm) == 0:
                    continue
                dmat = inc_q[im] @ corp_q[cm].T
                keep = (dmat > 0) & (
                    10_000 * dmat * dmat
                    >= t_sq * n2i[im][:, None] * n2c[cm][None, :]
                )
                cnt = keep.sum(axis=1)
                nm[im] += cnt
                if keep.any():
                    na = (n2i[im][:, None] * n2c[cm][None, :]).astype(
                        np.float64
                    )
                    cosm = np.floor(
                        dmat.astype(np.float64) / np.sqrt(na) * 1e6 + 0.5
                    )
                    cosm = np.where(keep, cosm, -np.inf)
                    has = cnt > 0
                    mc[im[has]] = np.fmax(
                        mc[im[has]], cosm.max(axis=1)[has]
                    )
        return nm, mc

    nm, mc = sem_match(J2p[:, :1])
    nm2, mc2 = sem_match(J2p)

    sem = pd.concat(
        [
            pd.DataFrame(
                {
                    "part": part,
                    "id": inc_ids,
                    "verdict": np.where(n > 0, "semantic_dup", "new"),
                    "n_a": n,
                    "n_b": m,
                    "x": inc_cl.astype(np.float64),
                }
            )
            for part, n, m in (
                ("sem_b2", nm, mc),
                ("sem_b2_p2", nm2, mc2),
            )
        ],
        ignore_index=True,
    )
    cb = pd.DataFrame(
        {
            "part": "codebook",
            "id": cids,
            "verdict": None,
            "n_a": S.sum(axis=1),
            "n_b": C.astype(np.float64),
            "x": np.einsum("kd,kd->k", S, S).astype(np.float64),
        }
    )
    return pd.concat([text, sem, cb], ignore_index=True)


def ann_ivf_numpy_oracle(con):
    """Scale-tractable oracle for ``ann_ivf_topk``: the registry SQL
    unrolls the trained leg's Lloyd chain as k×N cross joins with
    per-element list lambdas — fine at sf0.01, but hours at sf2's 40k
    vectors. This replay keeps the IDENTICAL arithmetic in numpy:
    double sums computed in strict LEFT-FOLD column order (matching
    F.aggregate / DuckDB list_sum element order, so the 6-dp rounding
    and micro-unit floors see bit-identical doubles), int64 quantized
    distances exact by value, the same first-min/lowest-cid ties, the
    same floor-mean codebook, the same (score DESC, id ASC) selections.
    No engine-under-test code involved."""
    import numpy as np
    import pandas as pd

    raw = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetch_arrow_table().to_pandas()
    ids = raw["vec_id"].to_numpy().astype(np.int64)
    E = np.stack([np.asarray(v, dtype=np.float64) for v in raw["embedding"]])
    n, d = E.shape

    def fold_dot(A, B):
        """Left-fold Σ A[:,j]·B[:,j] — per-element addition order identical
        to F.aggregate's sequential fold (numpy's pairwise dot is not)."""
        s = np.zeros((A.shape[0], B.shape[0]))
        for j in range(d):
            s = s + A[:, j, None] * B[None, :, j]
        return s

    def fold_sq(A):
        s = np.zeros(A.shape[0])
        for j in range(d):
            s = s + A[:, j] * A[:, j]
        return s

    legs = []
    # ---- firstids leg: centroids = embeddings of ids < 16
    cmask = ids < 16
    cids = ids[cmask]
    CV = E[cmask]
    normE = np.sqrt(fold_sq(E))
    normC = np.sqrt(fold_sq(CV))
    cos = np.round(fold_dot(E, CV) / (normE[:, None] * normC[None, :]), 6)
    # argmax of (rounded cos, -cid): ties on the ROUNDED value -> smallest cid
    best = np.zeros(n, dtype=np.int64)
    for r in range(n):
        row = cos[r]
        m = row.max()
        best[r] = cids[np.flatnonzero(row == m).min()]
    q = E[ids == 0][0]
    qcos = np.round(
        fold_dot(CV, q[None, :])[:, 0] / (normC * np.sqrt(fold_sq(q[None, :]))[0]),
        6,
    )
    probe = cids[
        sorted(range(len(cids)), key=lambda i: (-qcos[i], cids[i]))[:4]
    ]
    cand = np.isin(best, probe)
    ccos = np.round(
        fold_dot(E[cand], q[None, :])[:, 0]
        / (normE[cand] * np.sqrt(fold_sq(q[None, :]))[0]),
        6,
    )
    cid_arr, ccid = ids[cand], best[cand]
    order = sorted(range(len(cid_arr)), key=lambda i: (-ccos[i], cid_arr[i]))[:10]
    legs.append(
        pd.DataFrame(
            {
                "part": "firstids",
                "vec_id": cid_arr[order],
                "centroid_id": ccid[order],
                "cosine": ccos[order],
                "cos_micro": np.nan,
            }
        )
    )

    # ---- trained leg: int8 quantize -> 3 Lloyd iters -> floor-mean codebook
    amax = np.maximum(np.abs(E).max(axis=1), 1e-30)
    qv = np.floor(E * (127.0 / amax)[:, None] + 0.5).astype(np.int64)
    S = qv[cmask].copy()
    C = np.ones(len(cids), dtype=np.int64)

    def assign_int(X, S, C):
        dots = X @ S.T
        xx = np.einsum("nd,nd->n", X, X)
        ss = np.einsum("kd,kd->k", S, S)
        D = (C * C)[None, :] * xx[:, None] - 2 * C[None, :] * dots + ss[None, :]
        dist = D.astype(np.float64) / (C * C).astype(np.float64)[None, :]
        return np.argmin(dist, axis=1)  # first min = smallest cid

    for _ in range(3):
        j = assign_int(qv, S, C)
        newS = np.zeros_like(S)
        newC = np.zeros_like(C)
        np.add.at(newS, j, qv)
        np.add.at(newC, j, 1)
        emptied = newC == 0
        S = np.where(emptied[:, None], S, newS)
        C = np.where(emptied, C, newC)
    fin = cids[assign_int(qv, S, C)]

    # micro-unit normalized vectors (left-fold norms), floor-mean codebook
    nrm = np.maximum(np.sqrt(fold_sq(E)), 1e-30)
    M = np.floor(E / nrm[:, None] * 1e6 + 0.5).astype(np.int64)
    cb = {}
    for k_i, cid in enumerate(cids):
        mem = fin == cid
        if mem.sum():
            cb[cid] = np.floor(
                M[mem].sum(axis=0).astype(np.float64) / mem.sum()
            ).astype(np.int64)
    cb_ids = np.array(sorted(cb), dtype=np.int64)
    CB = np.stack([cb[c] for c in cb_ids])
    nc = np.einsum("kd,kd->k", CB, CB)
    nx = np.einsum("nd,nd->n", qv, qv)
    # all-integer cosine assignment -> probe 4 -> top 10 micro-cosines
    sc = (qv @ CB.T) / (np.sqrt(nx.astype(np.float64))[:, None] * np.sqrt(nc.astype(np.float64))[None, :])
    assigned = np.zeros(n, dtype=np.int64)
    for r in range(n):
        row = sc[r]
        m = row.max()
        assigned[r] = cb_ids[np.flatnonzero(row == m).min()]
    q0 = qv[ids == 0][0]
    nq = int(q0 @ q0)
    qsc = (CB @ q0) / (np.sqrt(nc.astype(np.float64)) * np.sqrt(float(nq)))
    tprobe = cb_ids[
        sorted(range(len(cb_ids)), key=lambda i: (-qsc[i], cb_ids[i]))[:4]
    ]
    tc = np.isin(assigned, tprobe)
    dots = qv[tc] @ q0
    micro = np.floor(
        dots.astype(np.float64)
        / (np.sqrt(nx[tc].astype(np.float64)) * np.sqrt(float(nq)))
        * 1e6
        + 0.5
    ).astype(np.int64)
    tid, tcid = ids[tc], assigned[tc]
    order = sorted(range(len(tid)), key=lambda i: (-micro[i], tid[i]))[:10]
    legs.append(
        pd.DataFrame(
            {
                "part": "trained",
                "vec_id": tid[order],
                "centroid_id": tcid[order],
                "cosine": np.nan,
                "cos_micro": micro[order].astype(np.float64),
            }
        )
    )
    legs.append(
        pd.DataFrame(
            {
                "part": "codebook",
                "vec_id": np.nan,
                "centroid_id": cb_ids,
                "cosine": CB.sum(axis=1).astype(np.float64),
                "cos_micro": nc.astype(np.float64),
            }
        )
    )
    return pd.concat(legs, ignore_index=True)


SPECIAL_ORACLES = {
    "dedup_cluster_canonical": cc_unionfind_oracle,
    "dedup_embedding_cosine": semdedup_numpy_oracle,
    "corpus_store_suite": corpus_store_hybrid_oracle,
}

#: the registry SQL stays the sf0.01 driver-gate oracle; the numpy replay
#: serves the sf>=1 notches where the unrolled-Lloyd SQL is intractable.
SPECIAL_ORACLES["ann_ivf_topk"] = ann_ivf_numpy_oracle


def main() -> int:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    # resume: a prior run's entries in THIS file are kept — only queries
    # without a green entry re-run. Parallel shards must each use their OWN
    # out file (this is read-once/rewrite-whole, so two processes sharing a
    # file would clobber each other's rows); merge shard files afterwards.
    prior = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("drive-at-sf")
        .config("spark.sql.session.timeZone", "America/New_York")
        # the gate COLLECTS full results for comparison — at sf1.0 several
        # queries return 5-10 M rows, far past local-mode's 1g default heap.
        # (The production answer is "don't collect"; a correctness gate must.)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    results, fails = dict(prior), []
    for name in qs:
        if only is not None and name not in only:
            continue
        if prior.get(name, {}).get("hash_match"):
            print(f"{name:36s}SKIP (prior green)", flush=True)
            continue
        t0 = time.time()
        entry = {"rows_match": False, "schema_match": False, "hash_match": False,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            con = duckdb.connect()
            for t in TABLES:
                p = os.path.join(sf_dir, f"{t}.parquet")
                if os.path.exists(p):
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/**/*.parquet')"
                        if os.path.isdir(p)
                        else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                    )
            if name in SPECIAL_ORACLES:
                ddf = SPECIAL_ORACLES[name](con)
                entry["oracle"] = "python-exact (see tool docstring)"
            else:
                ddf = con.execute(oracles[name]).fetch_arrow_table().to_pandas()
            entry["spark_rows"], entry["oracle_rows"] = len(sdf), len(ddf)
            entry["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
            entry["rows_match"] = len(sdf) == len(ddf)
            entry["hash_match"] = (
                entry["schema_match"]
                and entry["rows_match"]
                and digest(sdf) == digest(ddf)
            )
        except Exception as e:  # noqa: BLE001 — recorded, not raised
            entry["err"] = f"{type(e).__name__}: {e}"[:400]
        ok = entry["hash_match"]
        if not ok:
            fails.append(name)
        print(f"{name:36s}{'OK' if ok else 'FAIL':6s}{time.time()-t0:7.1f}s", flush=True)
        entry["sec"] = round(time.time() - t0, 1)
        results[name] = entry
        with open(out_path, "w") as f:  # incremental: crash/parallel-safe
            json.dump(results, f, indent=2)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("FAILS:", ", ".join(fails) if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
