"""Edit-distance fuzzy matching: length-blocked candidates + a banded
Levenshtein DP vectorized across the pair axis.

This is the entity-resolution primitive an ingest pipeline needs when the
same logical record arrives with typos from two sources (DataX itself has
no fuzzy matcher; SURVEY.md §2 extension surface). Scale shape:

- **Candidate generation is LENGTH BLOCKING**: ``levenshtein(a, b) <= k``
  implies ``|len(a) - len(b)| <= k``, so each distinct string is routed to
  the blocks of lengths ``[len, len + k]`` and an unordered pair is
  generated only in the block ``B == max(len_a, len_b)`` — each pair
  appears exactly once, no post-hoc dedup shuffle.
- **Verification is a BANDED DP vectorized over pairs**: for threshold k
  only the diagonal band ``|i - j| <= k`` can stay <= k, so the DP
  computes ``2k + 1`` cells per row, each cell ONE numpy op over every
  pair in the bucket at once — ``O(Lmax * (2k + 1))`` vectorized steps,
  zero per-pair Python.
- A length block holds the distinct strings of ~one length, and pair
  generation within it is quadratic in block size. The caller MUST dedup
  to distinct strings first (``fuzzy_pairs`` does) and, at corpus scale,
  subdivide hot blocks with an extra signature (first token / q-gram
  band) before the quadratic step — documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_INF = np.int32(1 << 20)


def _pad_codes(strs: list[str], width: int) -> np.ndarray:
    """Encode strings into a (P, width) uint8 matrix (0-padded).

    Multi-byte UTF-8 is compared byte-wise, which preserves equality (the
    only property the DP uses) — byte-distance can differ from
    codepoint-distance for non-ASCII edits, same as DuckDB's levenshtein
    operating on its internal byte strings.
    """
    out = np.zeros((len(strs), max(width, 1)), np.uint8)
    for i, s in enumerate(strs):
        b = s.encode("utf-8")
        out[i, : len(b)] = np.frombuffer(b, np.uint8)
    return out


def banded_levenshtein(
    a: list[str], b: list[str], k: int = 2
) -> np.ndarray:
    """Levenshtein distance per pair (a[i], b[i]), exact when <= k; any
    pair whose true distance exceeds k returns a value > k (not the true
    distance — the band cuts those DP paths off). Vectorized across the
    pair axis: each DP cell is one numpy op over all pairs."""
    P = len(a)
    if P == 0:
        return np.zeros(0, np.int32)
    a_len = np.array([len(s.encode("utf-8")) for s in a], np.int32)
    b_len = np.array([len(s.encode("utf-8")) for s in b], np.int32)
    La = int(a_len.max())
    Lb = int(b_len.max())
    ac = _pad_codes(a, La)
    bc = _pad_codes(b, Lb)
    W = 2 * k + 1
    # prev[:, m] = D[i-1][j] at band offset m = j - (i-1) + k
    prev = np.full((P, W), _INF, np.int32)
    for m in range(k, W):  # row i=0: D[0][j] = j for j in [0, k]
        j = m - k
        prev[:, m] = np.where(j <= b_len, j, _INF)
    out = np.full(P, _INF, np.int32)
    z = a_len == 0
    if z.any():
        out[z] = np.where(b_len[z] <= k, b_len[z], _INF)[: int(z.sum())]
    for i in range(1, La + 1):
        cur = np.full((P, W), _INF, np.int32)
        for m in range(W):
            j = i + m - k  # scalar: the band is centered on i for every pair
            if j < 0 or j > Lb:
                continue
            if j == 0:
                # D[i][0] = i (delete all i chars); in-band only when i <= k
                cur[:, m] = i if i <= k else _INF
                continue
            best = prev[:, m] + (ac[:, i - 1] != bc[:, j - 1]).astype(np.int32)
            if m + 1 < W:  # deletion D[i-1][j]
                best = np.minimum(best, prev[:, m + 1] + 1)
            if m - 1 >= 0:  # insertion D[i][j-1]
                best = np.minimum(best, cur[:, m - 1] + 1)
            cur[:, m] = np.where(j <= b_len, best, _INF)
        hit = np.nonzero(a_len == i)[0]
        if hit.size:
            mm = b_len[hit] - i + k
            ok = (mm >= 0) & (mm < W)
            out[hit[ok]] = cur[hit[ok], mm[ok]]
        prev = cur
    return out


def fuzzy_pairs(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 2,
    num_buckets: int = 8,
) -> "ray.data.Dataset":
    """All unordered pairs of DISTINCT values of ``col`` with Levenshtein
    distance <= k, as (name_a < name_b, dist). Distinct-fold first (the
    combiner shuffle carries one row per distinct string), then one
    length-block exchange; the quadratic pair step runs per block."""
    from datax_ray.functions.relational import partial_agg

    distinct = partial_agg(ds, keys=[col], counts="_c").drop_columns(["_c"])

    def route(t: pa.Table) -> pa.Table:
        names = t[col].combine_chunks()
        ln = pc.binary_length(names).to_numpy(zero_copy_only=False).astype(np.int32)
        reps = k + 1
        n = len(names)
        idx = np.repeat(np.arange(n), reps)
        block = (ln[:, None] + np.arange(reps)[None, :]).reshape(-1)
        return pa.table(
            {
                "block": pa.array(block, pa.int32()),
                "name": names.take(pa.array(idx)),
                "own": pa.array(block == np.repeat(ln, reps)),
            }
        )

    _OUT = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()), ("dist", pa.int64())]
    )

    def per_block(g: pa.Table) -> pa.Table:
        own = g.filter(g["own"])["name"].to_pylist()
        probe = g.filter(pc.invert(g["own"]))["name"].to_pylist()
        own = sorted(set(own))
        probe = sorted(set(probe) - set(own))
        cands_a: list[str] = []
        cands_b: list[str] = []
        no = len(own)
        if no >= 2:  # own x own (equal length): upper triangle
            ia, ib = np.triu_indices(no, 1)
            cands_a += [own[i] for i in ia]
            cands_b += [own[j] for j in ib]
        if probe and own:  # shorter x own — the pair's max-length block is here
            for p in probe:
                cands_a += [p] * no
                cands_b += own
        if not cands_a:
            return _OUT.empty_table()
        # orient output name_a < name_b
        aa = np.array(cands_a, object)
        bb = np.array(cands_b, object)
        flip = aa > bb
        aa[flip], bb[flip] = bb[flip], aa[flip]
        dist = banded_levenshtein(list(aa), list(bb), k=k)
        keep = dist <= k
        return pa.table(
            {
                "name_a": pa.array(aa[keep], pa.string()),
                "name_b": pa.array(bb[keep], pa.string()),
                "dist": pa.array(dist[keep].astype(np.int64), pa.int64()),
            }
        )

    return (
        distinct.map_batches(route, batch_format="pyarrow")
        .groupby("block")
        .map_groups(per_block, batch_format="pyarrow")
    )
