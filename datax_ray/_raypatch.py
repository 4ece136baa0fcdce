"""Runtime workarounds for Ray 2.49.2 hash-shuffle schema-propagation bugs.

Ray Data's hash-shuffle operators (``Dataset.join``, ``groupby().aggregate``,
``groupby().map_groups``) lose block schemas around EMPTY blocks, which makes
joins crash config-sensitively (pass at 2 partitions, crash at 16). Three
interlocking defects, all reproduced on ray 2.49.2 in tests/test_raypatch.py:

1. ``_shuffle_block`` (hash_shuffle.py:171) early-returns on ``num_rows == 0``
   BEFORE the ``send_empty_blocks`` fan-out, so when the *designated
   schema-broadcast block* of a join side happens to be empty, no aggregator
   ever learns the side's schema.

2. ``HashShufflingOperatorBase._do_add_input_inner`` (hash_shuffle.py:540)
   sets ``_has_schemas_broadcasted[seq] = True`` unconditionally after
   launching the first shuffle task — even when that first bundle was an
   empty block with NO schema at all (``map_groups`` emits bare
   ``pd.DataFrame()`` blocks for empty partitions; ``aggregate``'s finalize
   emits 0-column ``ArrowBlockAccessor._empty_table()``).  The broadcast is
   consumed without ever happening, and which bundle arrives first is a race
   — the failure appears/disappears with parallelism.

3. ``JoiningShuffleAggregation.finalize`` (join.py:104) builds a partition
   that received no shards as a 0-column ``pa.table({})`` and feeds it to
   ``pyarrow.Table.join`` → ``ArrowInvalid: No match or multiple matches for
   key field reference FieldRef.Name(...)``.

Empty blocks cannot be scrubbed from inside a pipeline: ``map_batches``
bypasses the UDF entirely for all-empty bundles (map_transformer.py:458
re-emits the input empty block verbatim), so every downstream stage inherits
the poison. The only place to fix this is the shuffle machinery itself.

The patches below are narrow, idempotent, and version-guarded (no-ops with a
warning if Ray internals moved):

  A. ``_shuffle_block``: when the broadcast-designated block is empty but
     TYPED, fan its (empty) schema out to every aggregator instead of
     early-returning.
  B. ``_do_add_input_inner``: only consume the one-shot broadcast flag when
     the bundle actually carried a usable schema; otherwise re-arm it so the
     next typed bundle broadcasts.
  C. ``JoiningShuffleAggregation``: drop 0-column shards in ``accept`` (they
     carry no data and poison the block builder), remember each side's last
     seen schema, and repair 0-column partition tables with it in
     ``finalize``.  As a never-crash last resort (a side whose schema was
     never seen anywhere), emit a row-preserving best-effort block instead of
     letting pyarrow raise.
  D. ``HashShufflingOperatorBase.__init__``: wrap the partition-aggregation
     factory in ``_PatchingAggFactory`` so the aggregator ACTOR process
     (which re-imports ray.data by pickle-reference and would otherwise run
     the STOCK classes — patch C never reached it) imports datax_ray and
     applies these patches before constructing the aggregation. Without D,
     a join side whose rows all hash into one partition still crashed:
     the other partitions' builders come up empty, stock ``finalize``
     builds a 0-column table, pyarrow raises on the key
     (tests/test_iterative_queries.py's hand-graph BFS reproduces it).

Applied on ``import datax_ray`` (see __init__.py) so every entrypoint —
driver, bench, tests, CLI — gets it.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_APPLIED = False


def apply() -> None:
    global _APPLIED
    if _APPLIED:
        return
    _APPLIED = True
    import os as _os

    if _os.environ.get("DATAX_DISABLE_RAYPATCH") == "1":
        # Upgrade rehearsal switch: run the engine exactly as a future Ray
        # version would if these private APIs moved and the patches
        # no-oped. tests/test_raypatch.py runs the parity suite under this
        # flag so correctness is measured, not assumed, in that world.
        logger.warning(
            "datax_ray: DATAX_DISABLE_RAYPATCH=1 — running WITHOUT the Ray "
            "hash-shuffle schema workarounds (upgrade-rehearsal mode)"
        )
        return
    try:
        _patch_fsspec_http_stub()
        _patch_shuffle_block()
        _patch_broadcast_flag()
        _patch_join_aggregation()
        _patch_aggregator_factory()
    except Exception:  # pragma: no cover - version drift guard
        logger.warning(
            "datax_ray: Ray hash-shuffle workarounds could not be applied; "
            "joins over aggregate outputs may crash on empty partitions",
            exc_info=True,
        )


# --------------------------------------------------------------------- 0 --


def _patch_fsspec_http_stub() -> None:
    """Without aiohttp, ``import fsspec.implementations.http`` fails — Ray
    guards every such import with ``except ModuleNotFoundError`` (e.g.
    ray/data/datasource/path_util.py), which works single-threaded. But
    when TWO driver threads hit the first read_parquet concurrently (a
    multi-writer replay), the loser of the import race can observe the
    winner's partially-initialized module and raise a bare ``ImportError``
    ("cannot import name 'HTTPFileSystem'") that escapes Ray's guard and
    kills the replay. Registering a FINISHED stub module (whose
    HTTPFileSystem raises only if actually constructed for an http:// read
    — impossible in this no-network engine) removes the race at the root:
    every later import succeeds instantly and deterministically."""
    try:
        import fsspec.implementations.http  # noqa: F401

        return  # aiohttp present: nothing to do
    except ImportError:
        pass
    import sys
    import types

    stub = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # noqa: N801 - mirrors the fsspec class name
        def __init__(self, *a, **k):
            raise ImportError(
                "fsspec HTTPFileSystem requires aiohttp, which is not "
                "installed (datax_ray stub)"
            )

    stub.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = stub


# --------------------------------------------------------------------- A --


def _patch_shuffle_block() -> None:
    import ray
    from ray.data._internal.arrow_ops.transform_pyarrow import _create_empty_table
    from ray.data._internal.execution.operators import hash_shuffle as _hs
    from ray.data._internal.table_block import TableBlockAccessor
    from ray.data.block import BlockAccessor, BlockExecStats, BlockType

    remote_fn = _hs._shuffle_block
    orig = getattr(remote_fn, "_function", None)
    if orig is None or getattr(orig, "_dx_patched", False):
        return

    def _shuffle_block_fixed(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        if send_empty_blocks:
            # This is the schema-broadcast-designated block. If it is empty
            # but typed, the stock implementation's num_rows==0 early-return
            # would silently skip the broadcast — do it here instead.
            probe = block
            if block_transformer is not None:
                probe = block_transformer(probe)
            probe = TableBlockAccessor.try_convert_block_type(
                probe, block_type=BlockType.ARROW
            )
            if probe.num_rows == 0 and probe.schema is not None and probe.num_columns:
                stats = BlockExecStats.builder()
                pending = []
                for pid in range(pool.num_partitions):
                    agg = pool.get_aggregator_for_partition(pid)
                    ref = ray.put(_create_empty_table(probe.schema))
                    pending.append(agg.submit.remote(input_index, pid, ref))
                while pending:
                    _, pending = ray.wait(
                        pending, num_returns=len(pending), timeout=1
                    )
                meta = BlockAccessor.for_block(probe).get_metadata(
                    exec_stats=stats.build()
                )
                return meta, {}
        return orig(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=block_transformer,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    _shuffle_block_fixed._dx_patched = True
    _hs._shuffle_block = ray.remote(_shuffle_block_fixed)


# --------------------------------------------------------------------- B --


def _patch_broadcast_flag() -> None:
    from ray.data._internal.execution.operators import hash_shuffle as _hs

    base = _hs.HashShufflingOperatorBase
    orig = base._do_add_input_inner
    if getattr(orig, "_dx_patched", False):
        return

    def _do_add_input_inner(self, input_bundle, input_index):
        schema = getattr(input_bundle, "schema", None)
        names = list(getattr(schema, "names", None) or []) if schema is not None else []
        if names:
            return orig(self, input_bundle, input_index)
        # Bundle carries no usable schema (schema-less empty block, or
        # metadata not populated): run the shuffle, then re-arm the one-shot
        # broadcast flag so a later TYPED bundle still broadcasts. Executor
        # calls this single-threaded, so save/restore is race-free.
        pre = self._has_schemas_broadcasted[input_index]
        try:
            return orig(self, input_bundle, input_index)
        finally:
            self._has_schemas_broadcasted[input_index] = pre

    _do_add_input_inner._dx_patched = True
    base._do_add_input_inner = _do_add_input_inner


# --------------------------------------------------------------------- C --


def _patch_join_aggregation() -> None:
    from ray.data._internal.arrow_ops.transform_pyarrow import _create_empty_table
    from ray.data._internal.execution.operators import join as _join_mod

    cls = _join_mod.JoiningShuffleAggregation
    if getattr(cls.accept, "_dx_patched", False):
        return
    orig_accept = cls.accept

    def accept(self, input_seq_id, partition_id, partition_shard):
        ncols = getattr(partition_shard, "num_columns", None)
        if ncols is None:  # pandas block
            ncols = len(getattr(partition_shard, "columns", ()))
        if ncols == 0:
            # 0-column shard: no data, no schema — adding it would poison
            # the ArrowBlockBuilder's schema unification.
            return
        schema = getattr(partition_shard, "schema", None)
        if schema is not None:
            if not hasattr(self, "_dx_seen_schemas"):
                self._dx_seen_schemas = {}
            self._dx_seen_schemas[input_seq_id] = schema
        return orig_accept(self, input_seq_id, partition_id, partition_shard)

    accept._dx_patched = True
    cls.accept = accept

    def finalize(self, partition_id):
        left = self._get_partition_builder(
            input_seq_id=0, partition_id=partition_id
        ).build()
        right = self._get_partition_builder(
            input_seq_id=1, partition_id=partition_id
        ).build()
        seen = getattr(self, "_dx_seen_schemas", {})
        if left.num_columns == 0 and 0 in seen:
            left = _create_empty_table(seen[0])
        if right.num_columns == 0 and 1 in seen:
            right = _create_empty_table(seen[1])

        if left.num_columns == 0 or right.num_columns == 0:
            # Never-crash fallback: one side's schema was never observed by
            # this aggregator (requires the broadcast races above AND a
            # sparse side — defensive only once patches A+B are active).
            # Preserve outer-side rows; inner/semi joins of an unknown side
            # are empty by definition.
            jt = str(getattr(self, "_join_type", ""))
            if left.num_columns and ("left" in jt or "full" in jt) and "semi" not in jt and "anti" not in jt:
                return left
            if left.num_columns and ("anti" in jt or "semi" in jt) and "left" in jt:
                return left.slice(0, 0) if "semi" in jt else left
            if right.num_columns and ("right" in jt or "full" in jt) and "semi" not in jt and "anti" not in jt:
                return right
            if right.num_columns and ("anti" in jt or "semi" in jt) and "right" in jt:
                return right.slice(0, 0) if "semi" in jt else right
            side = left if left.num_columns else right
            if side.num_columns:
                return side.slice(0, 0)
            from ray.data._internal.arrow_block import ArrowBlockAccessor

            return ArrowBlockAccessor._empty_table()

        arrow_join_type = _join_mod._JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP[self._join_type]
        return left.join(
            right,
            join_type=arrow_join_type,
            keys=list(self._left_key_col_names),
            right_keys=list(self._right_key_col_names),
            left_suffix=self._left_columns_suffix,
            right_suffix=self._right_columns_suffix,
        )

    finalize._dx_patched = True
    cls.finalize = finalize


# --------------------------------------------------------------------- D --


class _PatchingAggFactory:
    """Wrapper around a hash-shuffle partition-aggregation factory that
    re-applies these patches INSIDE the aggregator actor.

    Patch C monkeypatches ``JoiningShuffleAggregation`` at class level, but
    the class travels to the ``HashShuffleAggregator`` actor BY REFERENCE
    (cloudpickle re-imports ray.data in the actor process), so without this
    hook the actor always runs the stock, crashing ``finalize`` — patches
    applied in the driver never reach it. The wrapper itself is a
    module-level class, so unpickling it in the actor imports
    ``datax_ray._raypatch`` (running the package __init__'s ``apply()``)
    BEFORE the factory constructs the aggregation object; the defensive
    ``apply()`` in ``__call__`` covers exotic pickle paths that skip module
    import. Reproduced by tests/test_iterative_queries.py's hand-graph BFS:
    a join side whose rows all land in ONE hash partition leaves the other
    partitions' builders empty → stock finalize builds a 0-column table →
    ``ArrowInvalid`` on the join key."""

    def __init__(self, orig):
        self._orig = orig

    def __call__(self, aggregator_id, target_partition_ids):
        apply()
        return self._orig(aggregator_id, target_partition_ids)


def _patch_aggregator_factory() -> None:
    from ray.data._internal.execution.operators import hash_shuffle as _hs

    base = _hs.HashShufflingOperatorBase
    orig = base.__init__
    if getattr(orig, "_dx_patched", False):
        return

    def __init__(self, *args, **kwargs):
        f = kwargs.get("partition_aggregation_factory")
        if f is not None and not isinstance(f, _PatchingAggFactory):
            kwargs["partition_aggregation_factory"] = _PatchingAggFactory(f)
        orig(self, *args, **kwargs)

    __init__._dx_patched = True
    base.__init__ = __init__
