"""Distributed BPE tokenizer training — the merge-learning loop of
byte-pair encoding (Sennrich et al. 2016, the public algorithm behind
GPT-style tokenizers), expressed Ray-Data-first.

Classic BPE is sequential: count all adjacent symbol pairs, merge the
most frequent pair everywhere, repeat. The count step is the only part
that touches the corpus, and it is embarrassingly parallel — so each
iteration here is ONE `map_batches` pass emitting per-batch pair-count
partials (a combiner: one row per distinct pair per batch, never per
occurrence) folded by a vocabulary-sized exchange, and the argmax fold is
O(distinct pairs). The learned merge list (tiny — `n_merges` rows) is the
only driver state and is re-applied INSIDE each batch task at the next
iteration, so the corpus itself never materializes anywhere.

Word-level pre-tokenization (split on whitespace) bounds pair contexts to
words, exactly like the published algorithm; per-batch word DEDUP with
counts collapses repeated words before any symbol work, so hot words
(the Zipf mass) cost one encode per batch regardless of frequency.

Determinism: ties on count break by pair lexicographic order, so the
merge table is identical across runs, block layouts and cluster sizes —
the property the sequential-reference pytest asserts.

N iterations = N passes over the corpus. That is the real cost of BPE
training everywhere; production pipelines bound it by training on a
sample. `max_word_len` guards the O(len^2) worst case of pathological
unbroken strings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _apply_merges(sym_lists: list[list[str]], merges: list[tuple[str, str]]):
    """Apply learned merges in rank order to each symbol list (the same
    greedy order the canonical algorithm uses)."""
    if not merges:
        return sym_lists
    ranks = {m: r for r, m in enumerate(merges)}
    out = []
    for syms in sym_lists:
        syms = list(syms)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        out.append(syms)
    return out


class _PairCounter:
    """Per-batch combiner: dedup words with counts, symbolize each
    distinct word under the current merge table, emit one (left, right,
    cnt) row per distinct adjacent pair in the batch."""

    def __init__(self, merges: list[tuple[str, str]], max_word_len: int):
        self.merges = merges
        self.max_word_len = max_word_len

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        words = (
            pa.table({"w": toks})
            .group_by(["w"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["w", "cnt"])
        )
        wvals = words["w"].to_pylist()
        wcnts = words["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        pair_cnt: dict[tuple[str, str], int] = {}
        sym_lists = _apply_merges(
            [list(w[: self.max_word_len]) for w in wvals], self.merges
        )
        for syms, c in zip(sym_lists, wcnts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_cnt[p] = pair_cnt.get(p, 0) + int(c)
        if not pair_cnt:
            return pa.schema(
                [("left", pa.string()), ("right", pa.string()), ("cnt", pa.int64())]
            ).empty_table()
        items = list(pair_cnt.items())
        return pa.table(
            {
                "left": pa.array([p[0] for p, _ in items], pa.string()),
                "right": pa.array([p[1] for p, _ in items], pa.string()),
                "cnt": pa.array([c for _, c in items], pa.int64()),
            }
        )


def bpe_train(
    ds,
    n_merges: int = 16,
    min_count: int = 2,
    max_word_len: int = 64,
    num_buckets: int = 16,
):
    """Learn `n_merges` BPE merges from ds['text']. Returns a pyarrow
    Table (rank, left, right, merged, cnt) — the merge table, tiny by
    construction. Each iteration: one combiner pass over the corpus, one
    vocabulary-sized fold, one O(pairs)-row argmax."""
    from datax_ray.functions.relational import partial_agg

    merges: list[tuple[str, str]] = []
    rows = []
    for rank in range(n_merges):
        folded = partial_agg(
            ds.map_batches(
                _PairCounter(list(merges), max_word_len),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            keys=["left", "right"],
            sums={"cnt": "cnt"},
            num_buckets=num_buckets,
        )
        # distributed argmax: per-bucket top-1 survives, driver folds
        # O(buckets) rows (deterministic count-desc, pair-asc tie-break)
        def bucket_top(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            t = t.sort_by(
                [("cnt", "descending"), ("left", "ascending"), ("right", "ascending")]
            )
            return t.slice(0, 1)

        tops = folded.map_batches(
            bucket_top, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        if not tops:
            break
        tops.sort(key=lambda r: (-r["cnt"], r["left"], r["right"]))
        best = tops[0]
        if best["cnt"] < min_count:
            break
        merges.append((best["left"], best["right"]))
        rows.append(
            {
                "rank": rank,
                "left": best["left"],
                "right": best["right"],
                "merged": best["left"] + best["right"],
                "cnt": int(best["cnt"]),
            }
        )
    schema = pa.schema(
        [
            ("rank", pa.int64()),
            ("left", pa.string()),
            ("right", pa.string()),
            ("merged", pa.string()),
            ("cnt", pa.int64()),
        ]
    )
    if not rows:
        return schema.empty_table()
    return pa.Table.from_pylist(rows, schema=schema)


def bpe_train_sequential(texts: list[str], n_merges: int = 16,
                         min_count: int = 2, max_word_len: int = 64):
    """Single-machine reference implementation (for tests): the textbook
    count-merge loop over an in-memory corpus."""
    words: dict[str, int] = {}
    for txt in texts:
        for w in (txt or "").split(" "):
            words[w] = words.get(w, 0) + 1
    merges: list[tuple[str, str]] = []
    out = []
    for rank in range(n_merges):
        sym_lists = _apply_merges(
            [list(w[:max_word_len]) for w in words], merges
        )
        pair_cnt: dict[tuple[str, str], int] = {}
        for syms, c in zip(sym_lists, words.values()):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_cnt[p] = pair_cnt.get(p, 0) + c
        if not pair_cnt:
            break
        best = min(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        merges.append(best[0])
        out.append(
            {
                "rank": rank,
                "left": best[0][0],
                "right": best[0][1],
                "merged": best[0][0] + best[0][1],
                "cnt": best[1],
            }
        )
    return out
