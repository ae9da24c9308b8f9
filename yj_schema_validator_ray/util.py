"""Small shared helpers."""

from __future__ import annotations


def default_pool(max_fraction: float = 0.5, floor: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds that leave CPUs for the read/write and
    shuffle stages: an actor pool that reserves every CPU starves its
    upstream task stages and the pipeline deadlocks (observed at
    num_cpus=4 with a fixed pool of 4).

    Returns ``(1, max(floor+1, int(ncpu * max_fraction)))``.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    hi = max(floor + 1, int(ncpu * max_fraction))
    return (floor, hi)


def collect_small_arrow(ds):
    """Materialize a SMALL (domain-sized, never corpus-sized) dataset
    driver-side as one Arrow table, skipping the schema-less empty
    blocks a coarse-hash exchange emits for unoccupied partitions
    (``pa.concat_tables`` rejects their empty schemas)."""
    import pyarrow as pa
    import ray

    # empty blocks from unoccupied exchange partitions come through
    # schema-less, and (Ray 2.49) an empty PANDAS block is returned
    # unconverted by to_arrow_refs — normalize + drop both forms
    tables = []
    for t in ray.get(ds.to_arrow_refs()):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_columns:
            tables.append(t)
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


def union_by_name(datasets):
    """Schema-evolution union: align Datasets with DIFFERING schemas by
    column NAME (SQL ``UNION ALL BY NAME``), filling absent columns
    with typed nulls — Ray's ``Dataset.union`` requires identical
    schemas, which real multi-crawl corpora rarely have.  Column order
    is first-seen; a column appearing with conflicting Arrow types
    raises (silent coercion would corrupt data)."""
    import pyarrow as pa

    schemas = [ds.schema() for ds in datasets]
    names: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for name, typ in zip(sch.names, sch.types):
            if name in types:
                if types[name] != typ:
                    raise ValueError(
                        f"union_by_name: column {name!r} has conflicting "
                        f"types {types[name]} vs {typ}")
            else:
                names.append(name)
                types[name] = typ

    def normalize(t: pa.Table) -> pa.Table:
        cols = []
        for name in names:
            if name in t.column_names:
                cols.append(t.column(name))
            else:
                cols.append(pa.nulls(t.num_rows, types[name]))
        return pa.table(dict(zip(names, cols)))

    out = datasets[0].map_batches(normalize, batch_format="pyarrow")
    for ds in datasets[1:]:
        out = out.union(ds.map_batches(normalize, batch_format="pyarrow"))
    return out


_PROCESS_INSTANCES: dict = {}


def process_cached(cls, key, *args):
    """A plain ``map_batches`` fn that lazily builds (and caches per Ray
    worker PROCESS) an instance of a callable-class stage.

    For CHEAP state (broadcast refs, compiled regexes, small matrices)
    stateless tasks on warm workers beat an actor pool's ~5-7 s spin-up
    while keeping the same once-per-process amortization — the pattern
    the validator's task mode uses (``stages/validator.py:
    make_validator_fn``).  Keep real actor pools for heavy state (models,
    remote sessions).  ``key`` must uniquely identify the constructed
    state (include ObjectRef hexes for broadcast args)."""
    cache_key = (cls.__module__, cls.__qualname__, key)

    def f(batch):
        inst = _PROCESS_INSTANCES.get(cache_key)
        if inst is None:
            if len(_PROCESS_INSTANCES) > 256:  # bound long-lived workers
                _PROCESS_INSTANCES.clear()
            inst = cls(*args)
            _PROCESS_INSTANCES[cache_key] = inst
        return inst(batch)

    return f


def ref_key(ref) -> str:
    """Stable cache-key fragment for an ObjectRef."""
    return ref.hex() if hasattr(ref, "hex") else str(ref)


def shuffle_partitions() -> int:
    """Shuffle (groupby/sort) partition count scaled to the session's CPUs.

    Ray's default partitioning targets much larger datasets; for the
    pre-aggregated partials our constraint shuffles move, a
    cores-proportional count cuts fixed task overhead ~3-30x at small
    scale while still scaling with cluster size (more nodes -> more CPUs
    -> more reducers).
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, ncpu)
