"""Geometry sweep for the ID1/ID2 linkage candidate generator (r12).

Measures, against the exact all-pairs top-1 cosine linkage over
(hour-of-day × event-type) integer profiles, the recall / candidate-ratio
point of every candidate-generation scheme considered for
``id_linkage_banded``:

  1. OR-amplified threshold banding of signed-random-projection bits
     (the E4 geometry, swept over bands × bits) — on raw-centered,
     df-capped, and idf-reweighted profiles;
  2. dominant-cell blocking (each user's top-m heaviest cells as keys);
  3. IVF (spherical k-means cells, nprobe probes);
  4. top-K by full-signature XOR-popcount agreement (the SHIPPED scheme),
     exact md5-seeded ±1 planes, integer-scaled centering — i.e. the
     bit-exact prototype of the gated query.

Pure numpy + duckdb (no Spark): the question is GEOMETRY recall, not
engine performance; the shipped scheme's signs/centering replicate the
query's md5 expressions exactly so the measured point transfers.

Usage: python tools/linkage_sweep.py [sf_dir ...]
  (default: /root/testdata/sf0.01 /root/testdata/sf0.1)

r12 measured summary (full table in SCALE.md):
- threshold banding tops out at 0.913 recall @ 0.777 ratio (4 bits ×
  24 bands, centered); df-capping (<=0.83 @ 0.63) and idf (<=0.82 @
  0.64) make it WORSE — per-bit match/random agreement is 0.575/0.50
  centered (0.68/0.62 raw): the dense 24×type profile cloud gives
  sign-LSH almost no per-bit gap to amplify.
- dominant-cell blocking: 0.80 @ 0.35 at best (top-6 cells).
- IVF: <=0.75 @ 0.33.
- shipped top-K agreement (512 bits): 0.973 @ 0.201 (sf0.01, K=30) and
  0.998 @ 0.200 (sf0.1, K=300) with K = max(20, ceil((U-1)/5));
  fixed K=60 holds 0.920 @ 0.040 at sf0.1 — the large-corpus
  operating point where K decouples from U.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np

BITS = 512


def load_profiles(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    prof = con.execute(
        """
        SELECT user_id,
               CAST(floor(epoch(ts)/3600) AS BIGINT) % 24 AS hod,
               event_type, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
        """
    ).fetchnumpy()
    users = sorted(set(prof["user_id"]))
    cells = sorted(
        set(
            zip(
                [int(h) for h in prof["hod"]],
                [str(t) for t in prof["event_type"]],
            )
        )
    )
    uidx = {u: i for i, u in enumerate(users)}
    cidx = {c: i for i, c in enumerate(cells)}
    M = np.zeros((len(users), len(cells)), dtype=np.int64)
    for u, h, t, c in zip(
        prof["user_id"], prof["hod"], prof["event_type"], prof["c"]
    ):
        M[uidx[u], cidx[(int(h), str(t))]] = c
    return M, cells


def exact_top1(M: np.ndarray) -> np.ndarray:
    n2 = (M * M).sum(1).astype(float)
    cos = (M @ M.T) / np.sqrt(np.outer(n2, n2))
    np.fill_diagonal(cos, -2)
    U = M.shape[0]
    return np.array(
        [np.lexsort((np.arange(U), -cos[u]))[0] for u in range(U)]
    )


def md5_planes(cells, bits: int) -> np.ndarray:
    """The query's exact sign convention: ±1 from the first hex digit of
    md5('pn:hod:event_type') (ssidentity_spark/plans/analytics.py
    ``_lnk_sign``)."""
    SG = np.empty((len(cells), bits), dtype=np.int64)
    for j, (hod, et) in enumerate(cells):
        for pn in range(1, bits + 1):
            h = hashlib.md5(f"{pn}:{hod}:{et}".encode()).hexdigest()[0]
            SG[j, pn - 1] = 1 if h <= "7" else -1
    return SG


def report(name: str, cand, top1, U: int) -> None:
    rec = sum(1 for u in range(U) if top1[u] in cand[u]) / U
    ratio = sum(len(s) for s in cand) / (U * (U - 1))
    print(f"  {name}: recall {rec:.3f} ratio {ratio:.3f}")


def banding(X: np.ndarray, bits: int, bands: int, seed: int = 7):
    r = np.random.default_rng(seed)
    P = r.standard_normal((X.shape[1], bits * bands))
    sig = (X @ P) > 0
    U = X.shape[0]
    cand = [set() for _ in range(U)]
    for bnd in range(bands):
        seg = sig[:, bnd * bits : (bnd + 1) * bits]
        kv: dict = {}
        for u in range(U):
            kv.setdefault(tuple(seg[u]), set()).add(u)
        for us in kv.values():
            for u in us:
                cand[u] |= us - {u}
    return cand


def sweep(sf_dir: str) -> None:
    M, cells = load_profiles(sf_dir)
    U, C = M.shape
    print(f"{sf_dir}: U={U} C={C} occupancy {(M > 0).mean():.3f}")
    top1 = exact_top1(M)
    S = M.sum(0)
    Mc = (M * U - S).astype(float)
    df = (M > 0).sum(0)

    print(" threshold banding (centered):")
    for bits, bands in ((3, 4), (4, 16), (4, 24), (5, 24), (6, 32)):
        report(f"bits={bits} bands={bands}", banding(Mc, bits, bands), top1, U)
    print(" threshold banding (df-capped @ 0.5U, centered):")
    keep = df <= 0.5 * U
    Mk = M[:, keep]
    Mkc = (Mk * U - Mk.sum(0)).astype(float)
    for bits, bands in ((4, 16), (5, 24)):
        report(f"bits={bits} bands={bands}", banding(Mkc, bits, bands), top1, U)
    print(" threshold banding (idf-weighted, centered):")
    w = np.log(U / np.maximum(df, 1))
    for bits, bands in ((4, 16), (5, 24)):
        report(
            f"bits={bits} bands={bands}", banding(Mc * w, bits, bands), top1, U
        )

    print(" dominant-cell blocking:")
    order = np.argsort(-M, axis=1, kind="stable")
    for m in (2, 4, 6):
        buckets: dict = {}
        for u in range(U):
            for cell in order[u, :m]:
                if M[u, cell] > 0:
                    buckets.setdefault(cell, set()).add(u)
        cand = [set() for _ in range(U)]
        for us in buckets.values():
            for u in us:
                cand[u] |= us - {u}
        report(f"top-{m} cells", cand, top1, U)

    print(" IVF (spherical k-means):")
    Xn = Mc / np.linalg.norm(Mc, axis=1, keepdims=True)
    for ncells, nprobe in ((8, 2), (12, 3), (12, 4)):
        r = np.random.default_rng(3)
        cent = Xn[r.choice(U, ncells, replace=False)].copy()
        for _ in range(10):
            a = (Xn @ cent.T).argmax(1)
            for cc in range(ncells):
                m = Xn[a == cc]
                if len(m):
                    cent[cc] = m.mean(0)
                    cent[cc] /= np.linalg.norm(cent[cc])
        simc = Xn @ cent.T
        probes = np.argsort(-simc, 1)[:, :nprobe]
        assign = simc.argmax(1)
        members = {cc: set(np.where(assign == cc)[0]) for cc in range(ncells)}
        cand = [set() for _ in range(U)]
        for u in range(U):
            for cc in probes[u]:
                cand[u] |= members[cc] - {u}
        report(f"ncells={ncells} nprobe={nprobe}", cand, top1, U)

    print(f" SHIPPED: top-K by {BITS}-bit md5-plane agreement:")
    SG = md5_planes(cells, BITS)
    bits_m = (Mc @ SG) > 0
    s = 2.0 * bits_m.astype(np.float32) - 1
    agree = ((BITS + s @ s.T) / 2).astype(int)
    np.fill_diagonal(agree, -1)
    ranks = np.empty(U, dtype=int)
    for u in range(U):
        order_u = np.lexsort((np.arange(U), -agree[u]))
        ranks[u] = int(np.where(order_u == top1[u])[0][0])
    k_rule = max(20, -(-(U - 1) // 5))
    for K in sorted({15, 30, 60, k_rule}):
        kk = min(K, U - 1)
        print(
            f"  K={K}{' (query rule)' if K == k_rule else ''}: "
            f"recall {np.mean(ranks < kk):.3f} ratio {kk / (U - 1):.3f}"
        )


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for d in dirs:
        sweep(d)
