"""Dataset-level constraints: column stats, uniqueness, referential
integrity, distribution drift (the ``north_rule`` generalization of the
reference's global AND / summary counts — SURVEY.md §2.0 constraint table).

Scale design notes (100 TB / 256 nodes):
- Every grouped constraint PRE-AGGREGATES inside ``map_batches`` (one row
  per key per block) before the shuffle, so the all-to-all exchange moves
  key-cardinality-sized partials, not raw rows.
- Referential integrity is a broadcast anti-join: the known-keys side is
  ``ray.put`` once and read per actor — never a shuffle join.
- Distinct counts come in two flavors: exact (groupby over per-batch
  deduped values — the correctness oracle) and a mergeable HLL sketch
  (one 2^p register array per batch, merged in a tiny final stage — the
  100 TB path).
- ``lang`` histograms / KL drift aggregate per-batch value counts; the
  hot-repo skew injected by the corpus never concentrates on one reducer
  because pre-aggregated partials are tiny.  For per-REPO aggregates (hot
  repo = 30% of rows) see :func:`repo_stats_salted`, which salts the key.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.corpus import ORPHAN_ORG
from ..util import shuffle_partitions

KEY_COLS = ["repo", "path", "commit"]


# ---------------------------------------------------------------------------
# uniqueness on (repo, path, commit)
# ---------------------------------------------------------------------------

def _key_hash64(batch: pa.Table) -> np.ndarray:
    # vectorized Arrow-buffer hash (no pandas object round-trip) — this
    # runs in BOTH full-corpus scans of the two-phase uniqueness plan
    from ..stages.exact_agg import hash_columns

    return hash_columns(batch.select(KEY_COLS))


def uniqueness_violations(corpus_ds):
    """Key triples appearing more than once -> (repo, path, commit, n_rows).

    Two-phase hash plan (the 10^12-row shape):
    A. shuffle 64-bit KEY HASHES with per-batch counts (8 bytes/key vs
       ~70 bytes of strings) -> candidate duplicate hashes (tiny);
    B. re-scan, keep only rows whose hash is a candidate (broadcast set),
       and aggregate the REAL key triples exactly — hash collisions are
       eliminated here, so the result is exact.
    The triple key is fine-grained, so no salting is needed (SURVEY.md §4.2).
    """
    import ray

    from ..stages.exact_agg import grouped_aggregate

    def hash_partial(batch: pa.Table) -> pa.Table:
        kh = _key_hash64(batch)
        t = pa.table({"kh": pa.array(kh.astype(np.int64), pa.int64())})
        return (t.group_by(["kh"]).aggregate([([], "count_all")])
                .rename_columns(["kh", "n"]))

    cand = (grouped_aggregate(
        corpus_ds.map_batches(hash_partial, batch_format="pyarrow"),
        ["kh"], [("n", "sum", "n")])
        .filter(expr="n > 1")).materialize()
    # the broadcast-prefilter plan assumes duplicates are RARE (the normal
    # uniqueness-check regime: candidates ~ violations).  A pathological
    # corpus (everything duplicated) would pull every distinct key hash to
    # the driver, so above a bound we skip the prefilter and aggregate the
    # exact key triples dataset-side (one heavier shuffle, no driver state)
    if cand.count() > 2_000_000:
        return grouped_aggregate(
            corpus_ds.map_batches(
                lambda b: (b.select(KEY_COLS).group_by(KEY_COLS)
                           .aggregate([([], "count_all")])
                           .rename_columns(KEY_COLS + ["n_rows"])),
                batch_format="pyarrow"),
            KEY_COLS, [("n_rows", "sum", "n_rows")]).filter(expr="n_rows > 1")
    dup_hashes = frozenset(r["kh"] for r in cand.take_all())
    if not dup_hashes:
        import pandas as pd

        return ray.data.from_pandas(pd.DataFrame({
            "repo": pd.Series(dtype="string"), "path": pd.Series(dtype="string"),
            "commit": pd.Series(dtype="string"), "n_rows": pd.Series(dtype="int64")}))
    dup_ref = ray.put(dup_hashes)

    class KeepCandidates:
        def __init__(self, ref):
            # sorted array -> vectorized np.isin membership per batch
            self.dups = np.array(sorted(ray.get(ref)), dtype=np.int64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            kh = _key_hash64(batch).astype(np.int64)
            mask = np.isin(kh, self.dups)
            kept = batch.select(KEY_COLS).filter(pa.array(mask))
            return (kept.group_by(KEY_COLS).aggregate([([], "count_all")])
                    .rename_columns(KEY_COLS + ["n_rows"]))

    from ..util import process_cached, ref_key

    agg = grouped_aggregate(
        corpus_ds.map_batches(
            process_cached(KeepCandidates, ref_key(dup_ref), dup_ref),
            batch_format="pyarrow"),
        KEY_COLS, [("n_rows", "sum", "n_rows")], num_partitions=4)
    return agg.filter(expr="n_rows > 1")


# ---------------------------------------------------------------------------
# referential integrity repo -> known-repos dimension (broadcast anti-join)
# ---------------------------------------------------------------------------

def known_repos_ref(corpus_ds=None):
    """The known-repos dimension as a broadcast object ref.

    In production this is the distinct-key side of a real dimension table
    (``ds.unique("repo")`` — small) put into the object store once.  The
    test corpus injects its dimension analytically: every corpus repo
    except the '{ORPHAN_ORG}/*' org (FIXTURES.md §4).
    """
    import ray

    repos = set()
    for j10 in range(10):
        if j10 < 3:
            repos.add("org0/hot")
    for org in range(1, 8):
        if f"org{org}" == ORPHAN_ORG:
            continue
        for r in range(3):
            repos.add(f"org{org}/repo{r}")
    return ray.put(frozenset(repos))


class OrphanFilter:
    """Actor-pool stage: anti-join each batch against the broadcast key set
    (ray.get in ``__init__`` — once per actor, not per batch)."""

    def __init__(self, known_ref):
        import ray
        # Arrow value-set built ONCE per actor, not per batch
        self.known_arr = pa.array(sorted(ray.get(known_ref)), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("repo"), value_set=self.known_arr)
        orphans = batch.filter(pc.invert(mask))
        return (orphans.select(["repo"]).group_by(["repo"])
                .aggregate([([], "count_all")])
                .rename_columns(["repo", "n_orphan_rows"]))


def ref_integrity_violations(corpus_ds, known_ref=None):
    from ray.data.aggregate import Sum

    from ..util import process_cached, ref_key

    if known_ref is None:
        known_ref = known_repos_ref()
    parts = corpus_ds.map_batches(
        process_cached(OrphanFilter, ref_key(known_ref), known_ref),
        batch_format="pyarrow")
    # partials are <= n_distinct_repos rows per block -> tiny final shuffle
    return parts.groupby("repo", num_partitions=4).aggregate(
        Sum("n_orphan_rows", alias_name="n_orphan_rows"))


# ---------------------------------------------------------------------------
# per-column stats (count / null / min / max / exact distinct)
# ---------------------------------------------------------------------------

def column_stats(corpus_ds, columns=("repo", "path", "commit", "lang")):
    """One row per column: row_count, null_count, min/max, exact distinct.

    ONE corpus pass: each batch emits a union-shaped partial table with
    both the per-column scalar row ('s') and the per-batch-deduped
    distinct value hashes ('d').  The partials (tiny: 4 scalar rows +
    key-cardinality hashes per block) are materialized once and both
    combines read them — the corpus is never scanned twice.
    """

    cols = list(columns)

    def fused_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        n_, v_ = [], []
        counts, nulls, mins, maxs = [], [], [], []
        for c in cols:
            arr = batch.column(c)
            counts.append(len(arr))
            nulls.append(arr.null_count)
            mm = pc.min_max(arr)
            mins.append(mm["min"].as_py())
            maxs.append(mm["max"].as_py())
            # distinct side: shuffle 64-bit VALUE HASHES, not value
            # strings (~10x lighter; a collision miscounts by 1 with
            # probability ~n^2/2^65 — 1e-7 at 2M distinct values)
            u = pc.unique(arr).drop_null()
            if len(u):
                h = pd.util.hash_array(u.to_numpy(zero_copy_only=False)
                                       .astype(object)).astype(np.int64)
                n_.append(np.full(len(h), c, dtype=object))
                v_.append(h)
        d_names = list(np.concatenate(n_)) if n_ else []
        d_vals = list(np.concatenate(v_)) if v_ else []
        nd = len(d_vals)
        return pa.table({
            "kind": pa.array(["s"] * len(cols) + ["d"] * nd, pa.string()),
            "column_name": pa.array(cols + d_names, pa.string()),
            "row_count": pa.array(counts + [None] * nd, pa.int64()),
            "null_count": pa.array(nulls + [None] * nd, pa.int64()),
            "min_value": pa.array(
                [str(m) if m is not None else None for m in mins] + [None] * nd,
                pa.string()),
            "max_value": pa.array(
                [str(m) if m is not None else None for m in maxs] + [None] * nd,
                pa.string()),
            "value": pa.array([None] * len(cols) + d_vals, pa.int64()),
        })

    parts = corpus_ds.map_batches(
        fused_partial, batch_format="pyarrow").materialize()

    scal = (parts.filter(expr="kind == 's'")
            .select_columns(["column_name", "row_count", "null_count",
                             "min_value", "max_value"]).to_pandas())
    scal = scal.groupby("column_name").agg(
        row_count=("row_count", "sum"), null_count=("null_count", "sum"),
        min_value=("min_value", "min"), max_value=("max_value", "max")).reset_index()

    from ..stages.exact_agg import grouped_aggregate

    dist_pairs = (parts.filter(expr="kind == 'd'")
                  .select_columns(["column_name", "value"]))
    distinct_rows = grouped_aggregate(dist_pairs, ["column_name", "value"],
                                      [("", "count", "n")])

    def count_per_col(t: pa.Table) -> pa.Table:
        return (t.select(["column_name"]).group_by(["column_name"])
                .aggregate([([], "count_all")])
                .rename_columns(["column_name", "n"]))

    from ray.data.aggregate import Sum as _Sum
    dist = (distinct_rows.map_batches(count_per_col, batch_format="pyarrow")
            .groupby("column_name", num_partitions=4)
            .aggregate(_Sum("n", alias_name="distinct_count")).to_pandas())

    out = scal.merge(dist, on="column_name", how="left")
    out["distinct_count"] = out["distinct_count"].fillna(0).astype("int64")
    out["row_count"] = out["row_count"].astype("int64")
    out["null_count"] = out["null_count"].astype("int64")
    return out[["column_name", "row_count", "null_count",
                "min_value", "max_value", "distinct_count"]]


# ---------------------------------------------------------------------------
# streaming distinct sketch (HLL) — the 10^12-row path for distinct counts
# ---------------------------------------------------------------------------

class HLLSketch:
    """Plain HyperLogLog with 2^p registers (mergeable by max)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        w = 64 - self.p
        v = hashes & np.uint64((1 << w) - 1)
        # rank = leading-zero count within the w-bit window + 1; w <= 52 so
        # float64 log2 is exact
        rank = np.full(len(hashes), w + 1, dtype=np.uint8)
        nz = v > 0
        rank[nz] = (w - np.floor(np.log2(v[nz].astype(np.float64)))).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        return float(est)


def _hash64(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit hashes of a string column (xxhash-free: use
    pandas' SipHash via util.hash_array — stable within a run)."""
    import pandas as pd

    s = arr.to_pandas().astype("string").fillna("\x00null")
    return pd.util.hash_array(s.to_numpy(dtype=object)).astype(np.uint64)


def distinct_sketch(corpus_ds, columns=("repo", "path", "commit", "lang"), p: int = 12):
    """HLL distinct estimates per column: one serialized sketch per batch
    per column -> driver merge (mergeable-sketch pattern, ray_guide)."""
    cols = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        out_names, out_blobs = [], []
        for c in cols:
            sk = HLLSketch(p)
            sk.add_hashed(_hash64(batch.column(c)))
            out_names.append(c)
            out_blobs.append(sk.registers.tobytes())
        return pa.table({"column_name": pa.array(out_names, pa.string()),
                         "registers": pa.array(out_blobs, pa.binary())})

    parts = corpus_ds.map_batches(partial, batch_format="pyarrow")
    merged: dict[str, HLLSketch] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for name, blob in zip(b.column("column_name").to_pylist(),
                              b.column("registers").to_pylist()):
            sk = merged.setdefault(name, HLLSketch(p))
            np.maximum(sk.registers,
                       np.frombuffer(blob, dtype=np.uint8), out=sk.registers)
    import pandas as pd
    return pd.DataFrame({
        "column_name": list(merged),
        "distinct_estimate": [round(merged[c].estimate()) for c in merged],
    }).sort_values("column_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# histograms + KL drift
# ---------------------------------------------------------------------------

def lang_histogram(corpus_ds):
    """groupby-count on ``lang`` with per-batch pre-aggregation."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # NULL langs get an explicit sentinel so the shuffle key is non-null
        lang = batch.column("lang").fill_null("__null__")
        return (pa.table({"lang": lang}).group_by(["lang"])
                .aggregate([([], "count_all")]).rename_columns(["lang", "n"]))

    agg = (corpus_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang", num_partitions=shuffle_partitions())
           .aggregate(Sum("n", alias_name="n")))

    def desentinel(batch: pa.Table) -> pa.Table:
        lang = pc.if_else(pc.equal(batch.column("lang"), "__null__"),
                          pa.nulls(batch.num_rows, pa.string()), batch.column("lang"))
        return pa.table({"lang": lang, "n": batch.column("n")})

    return agg.map_batches(desentinel, batch_format="pyarrow")


def content_length_histogram(corpus_ds):
    """Fixed log2 bins over character length of ``content``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ln = pc.utf8_length(batch.column("content"))
        bucket = pc.cast(pc.floor(pc.log2(pc.add(pc.cast(ln, pa.float64()), 1.0))),
                         pa.int64())
        return (pa.table({"bucket": bucket}).group_by(["bucket"])
                .aggregate([([], "count_all")]).rename_columns(["bucket", "n"]))

    return (corpus_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket", num_partitions=shuffle_partitions())
            .aggregate(Sum("n", alias_name="n")))


# baseline lang probabilities implied by the corpus generator (exact when
# N % 50 == 0: 2% NULL [all on json rows], 8% json, 90% yaml; normalized
# over non-null values)
BASELINE_LANG_P = {"json": 0.08 / 0.98, "yaml": 0.90 / 0.98}


def kl_divergence(observed: dict[str, int], baseline_p: dict[str, float]) -> float:
    total = sum(n for k, n in observed.items() if k in baseline_p)
    if total == 0:
        return 0.0
    kl = 0.0
    for k, q in baseline_p.items():
        n = observed.get(k, 0)
        if n == 0:
            continue
        p = n / total
        kl += p * math.log(p / q)
    return kl


def lang_drift(corpus_ds, baseline_p=None, threshold: float = 0.05):
    """KL(observed ‖ baseline) on the lang histogram -> one-row DataFrame."""
    import pandas as pd

    if baseline_p is None:
        baseline_p = BASELINE_LANG_P
    hist = lang_histogram(corpus_ds).to_pandas()
    observed = {row["lang"]: int(row["n"]) for _, row in hist.iterrows()
                if row["lang"] is not None}
    kl = kl_divergence(observed, baseline_p)
    # sign-aware half-away rounding, mirrored in lang_drift_sql (Python
    # round() is half-to-even)
    kl6 = math.floor(abs(kl) * 1e6 + 0.5) / 1e6 * (1 if kl >= 0 else -1)
    return pd.DataFrame({"kl": [kl6], "drifted": [kl > threshold]})


# ---------------------------------------------------------------------------
# salted per-repo aggregation (skew handling for the hot repo)
# ---------------------------------------------------------------------------

def repo_stats_salted(corpus_ds, salt_buckets: int = 16):
    """Per-repo row counts + total content chars with explicit salt-key
    skew splitting: first aggregate on (repo, hash(path) % k), then
    de-salt with a second combine on repo — the hot repo's 30% of rows
    spread across k reducers instead of one (north_rule requirement).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        salt_np = (pd.util.hash_array(
            batch.column("path").to_pandas().to_numpy(dtype=object))
            % salt_buckets).astype("int64")
        salt = pa.array(salt_np, pa.int64())
        chars = pc.cast(pc.utf8_length(batch.column("content")), pa.int64())
        t = pa.table({"repo": batch.column("repo"), "salt": salt, "chars": chars})
        return (t.group_by(["repo", "salt"])
                .aggregate([("chars", "sum"), ([], "count_all")])
                .rename_columns(["repo", "salt", "total_chars", "n_rows"]))

    salted = (corpus_ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["repo", "salt"], num_partitions=shuffle_partitions())
              .aggregate(Sum("total_chars", alias_name="total_chars"),
                         Sum("n_rows", alias_name="n_rows")))
    # de-salt: combine the k sub-aggregates per repo (tiny)
    return (salted.groupby("repo", num_partitions=shuffle_partitions())
            .aggregate(Sum("total_chars", alias_name="total_chars"),
                       Sum("n_rows", alias_name="n_rows")))


def grouped_distinct_sketch(ds, group_col: str, value_col: str, p: int = 12):
    """Per-GROUP HLL distinct estimates — the sketch path for
    COUNT(DISTINCT) over unbounded value domains.  The exact two-phase
    plan (:func:`~.relational.events_distinct_users`) moves one row per
    distinct (group, value) pair; at billions of distinct values per
    group this moves one 2^p-byte register blob per (group, batch)
    instead, merged by element-wise max — the classic mergeable-sketch
    exchange.

    Per-batch per-group registers -> one group-keyed exchange ->
    vectorized register max per group -> estimate.  Output
    (group, distinct_estimate) is group-domain-sized.
    """
    import pandas as pd

    from ..util import shuffle_partitions

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pandas()
        hs = _hash64(batch.column(value_col))
        codes, uniques = pd.factorize(g)
        names, blobs = [], []
        for i, name in enumerate(uniques):
            sk = HLLSketch(p)
            sk.add_hashed(hs[codes == i])
            names.append(name)
            blobs.append(sk.registers.tobytes())
        return pa.table({group_col: pa.array(names, pa.string()),
                         "registers": pa.array(blobs, pa.binary())})

    def merge(gdf: pd.DataFrame) -> pd.DataFrame:
        out_g, out_est = [], []
        for name, part in gdf.groupby(group_col, sort=False):
            sk = HLLSketch(p)
            for blob in part["registers"]:
                np.maximum(sk.registers,
                           np.frombuffer(blob, dtype=np.uint8),
                           out=sk.registers)
            out_g.append(name)
            out_est.append(round(sk.estimate()))
        return pd.DataFrame({
            group_col: out_g,
            "distinct_estimate": pd.Series(out_est, dtype="int64")})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col,
                     num_partitions=min(8, shuffle_partitions()))
            .map_groups(merge, batch_format="pandas"))


# ---------------------------------------------------------------------------
# composite expectation suite (Great-Expectations-style report)
# ---------------------------------------------------------------------------

def expectations_report(sf_dir: str, price_max_cents: int = 60_000_000):
    """One-shot data-quality EXPECTATION SUITE over ``orders`` — the
    composite report a validation engine ships as its contract surface
    (Great-Expectations-style): each row is one expectation with the
    observed row count, the violation count, and a pass flag.

    Expectations and their distributed shapes:

    * row-level checks (``not_null``, ``accepted_values``, ``regex``,
      ``range``) fuse into ONE zero-copy Arrow scan emitting a single
      int64 partial-counter row per batch — adding expectations adds
      columns, not passes;
    * ``unique:o_orderkey`` is the two-phase exact shape: per-batch key
      dedup partials -> one coarse exchange -> violations =
      rows - distinct (never a driver-side key set);
    * ``fk:o_custkey->customer`` uses the side-tagged deduped-key
      exchange (the :func:`..pipelines.relational.relational_integrity`
      plan) — customer scales with the fact tables, so it is never
      broadcast here.

    The final 7-row table is assembled from scalar partials on the
    driver.  Money thresholds compare in integer cents.

    Reference analogue: the dataset-level constraint family of SURVEY
    §2 NR1-NR4, composed into the user-facing report shape.
    """
    import pandas as pd
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate

    cols = ["o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority", "o_totalprice"]
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

    def row_partials(t: pa.Table) -> pa.Table:
        n = t.num_rows

        def nviol(mask) -> int:  # nulls count as violations
            ok = pc.sum(pc.cast(pc.fill_null(mask, False), pa.int64()))
            return n - (ok.as_py() or 0)

        cust_nulls = t.column("o_custkey").null_count
        bad_status = nviol(pc.is_in(
            t.column("o_orderstatus"),
            value_set=pa.array(["O", "F", "P"])))
        bad_prio = nviol(pc.match_substring_regex(
            t.column("o_orderpriority"), "^[1-5]-"))
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("o_totalprice"), pa.float64()), 100.0)),
            pa.int64())
        bad_price = nviol(pc.and_(
            pc.greater_equal(cents, 0),
            pc.less_equal(cents, price_max_cents)))
        return pa.table({k: pa.array([v], pa.int64()) for k, v in [
            ("n", n), ("null_cust", cust_nulls), ("bad_status", bad_status),
            ("bad_prio", bad_prio), ("bad_price", bad_price)]})

    scan = ds.map_batches(row_partials, batch_format="pyarrow") \
        .to_pandas().sum()
    n_rows = int(scan["n"])

    # unique:o_orderkey — distinct count via one exchange
    n_keys = grouped_aggregate(
        ds.map_batches(
            lambda t: pa.table(
                {"k": pc.cast(t.column("o_orderkey"), pa.int64())}),
            batch_format="pyarrow"),
        ["k"], [("k", "count", "n")]).count()

    # fk:o_custkey->customer — side-tagged deduped-key exchange
    def refing(t: pa.Table) -> pa.Table:
        g = (pa.table({"k": pc.cast(t.column("o_custkey"), pa.int64())})
             .group_by(["k"]).aggregate([([], "count_all")])
             .rename_columns(["k", "n_ref"]))
        return pa.table({
            "k": g.column("k"),
            "n_ref": pc.cast(g.column("n_ref"), pa.int64()),
            "present": pa.array(np.zeros(g.num_rows, np.int64)),
            "__coarse": pa.array(
                coarse_mix(g.column("k").to_numpy(), 1023), pa.int64())})

    def refed(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("c_custkey"), pa.int64())
        return pa.table({
            "k": keys,
            "n_ref": pa.array(np.zeros(t.num_rows, np.int64)),
            "present": pa.array(np.ones(t.num_rows, np.int64)),
            "__coarse": pa.array(
                coarse_mix(keys.to_numpy(), 1023), pa.int64())})

    def orphan_group(g):
        agg = g.groupby("k", sort=False).agg(
            n_ref=("n_ref", "sum"), present=("present", "max"))
        return pd.DataFrame({
            "orphans": [int(agg.loc[agg["present"] == 0, "n_ref"].sum())]})

    orders_keys = ds.map_batches(refing, batch_format="pyarrow")
    cust_keys = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"]).map_batches(refed, batch_format="pyarrow")
    orphans = int(orders_keys.union(cust_keys)
                  .groupby("__coarse", num_partitions=shuffle_partitions())
                  .map_groups(orphan_group, batch_format="pandas")
                  .to_pandas()["orphans"].sum())

    rows = [
        ("row_count_at_least_1", n_rows, 0 if n_rows >= 1 else 1),
        ("not_null:o_custkey", n_rows, int(scan["null_cust"])),
        ("accepted_values:o_orderstatus", n_rows, int(scan["bad_status"])),
        ("regex:o_orderpriority", n_rows, int(scan["bad_prio"])),
        ("range:o_totalprice", n_rows, int(scan["bad_price"])),
        ("unique:o_orderkey", n_rows, n_rows - int(n_keys)),
        ("fk:o_custkey->customer", n_rows, orphans),
    ]
    return pd.DataFrame({
        "expectation": [r[0] for r in rows],
        "observed": pd.Series([r[1] for r in rows], dtype="int64"),
        "violations": pd.Series([r[2] for r in rows], dtype="int64"),
        "passed": [r[2] == 0 for r in rows],
    })


def expectations_report_sql(price_max_cents: int = 60_000_000) -> str:
    return f"""
WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
v AS (
  SELECT 'row_count_at_least_1' AS expectation,
         (SELECT n FROM base) AS observed,
         CAST(CASE WHEN (SELECT n FROM base) >= 1 THEN 0 ELSE 1 END
              AS BIGINT) AS violations
  UNION ALL
  SELECT 'not_null:o_custkey', (SELECT n FROM base),
         CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'accepted_values:o_orderstatus', (SELECT n FROM base),
         CAST(count(*) FILTER (
           WHERE o_orderstatus IS NULL
              OR o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'regex:o_orderpriority', (SELECT n FROM base),
         CAST(count(*) FILTER (
           WHERE o_orderpriority IS NULL
              OR NOT regexp_matches(o_orderpriority, '^[1-5]-'))
           AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'range:o_totalprice', (SELECT n FROM base),
         CAST(count(*) FILTER (
           WHERE o_totalprice IS NULL
              OR CAST(round(CAST(o_totalprice AS DOUBLE) * 100)
                      AS BIGINT) NOT BETWEEN 0 AND {price_max_cents})
           AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'unique:o_orderkey', (SELECT n FROM base),
         (SELECT n FROM base)
           - CAST(count(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'fk:o_custkey->customer', (SELECT n FROM base),
         CAST(count(*) FILTER (
           WHERE c.c_custkey IS NULL) AS BIGINT)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT expectation, observed, violations, violations = 0 AS passed
FROM v"""


def fd_violations(docs_ds):
    """Functional-dependency profiling: test the candidate FDs
    source -> lang and lang -> source on the documents table, reporting
    per direction the number of determinant groups, how many violate
    (map to >1 distinct dependent) and the worst fan-out — the
    dependency-discovery primitive under schema normalization and
    data-quality rules ("is source supposed to determine language?").

    Shape: ONE exchange builds the distinct (source, lang) pair table
    (per-batch Arrow dedupe partials, pair-domain-sized); both FD
    directions then aggregate off that same materialized pair set —
    raw rows are scanned once, and nothing row-scale crosses the wire.
    """
    from ..stages.exact_agg import grouped_aggregate

    def pair_rows(t: pa.Table) -> pa.Table:
        return (t.select(["source", "lang"])
                .group_by(["source", "lang"]).aggregate([])
                .select(["source", "lang"]))

    pairs = grouped_aggregate(
        docs_ds.map_batches(pair_rows, batch_format="pyarrow"),
        ["source", "lang"], [("", "count", "n")]).materialize()

    def direction(det: str, fd_name: str):
        per_det = grouped_aggregate(pairs, [det], [("", "count", "d")])

        def audit(t: pa.Table) -> pa.Table:
            d = t.column("d")
            return pa.table({
                "fd": pa.array([fd_name], pa.string()),
                "n_groups": pa.array([t.num_rows], pa.int64()),
                "n_violating": pa.array(
                    [int(pc.sum(pc.cast(pc.greater(d, 1), pa.int64()))
                         .as_py() or 0)], pa.int64()),
                "max_distinct": pa.array(
                    [int(pc.max(d).as_py() or 0)], pa.int64())})

        return per_det.map_batches(audit, batch_format="pyarrow")

    u = direction("source", "source->lang").union(
        direction("lang", "lang->source"))
    return grouped_aggregate(u, ["fd"],
                             [("n_groups", "sum", "n_groups"),
                              ("n_violating", "sum", "n_violating"),
                              ("max_distinct", "max", "max_distinct")])


def fd_violations_sql() -> str:
    return """
WITH pairs AS (SELECT DISTINCT source, lang FROM documents),
a AS (SELECT source, count(*) AS d FROM pairs GROUP BY source),
b AS (SELECT lang, count(*) AS d FROM pairs GROUP BY lang)
SELECT 'source->lang' AS fd, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE d > 1) AS BIGINT) AS n_violating,
       CAST(max(d) AS BIGINT) AS max_distinct
FROM a
UNION ALL
SELECT 'lang->source', CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE d > 1) AS BIGINT),
       CAST(max(d) AS BIGINT)
FROM b"""


def derived_column_audit(docs_ds):
    """Derived-column consistency: the documents table materializes
    ``n_chars`` next to ``text``; certify the invariant n_chars ==
    length(text) holds row-for-row (per-lang mismatch counts) — the
    denormalization-drift check every table with precomputed columns
    needs after a rewrite/migration.

    Shape: zero-shuffle scan, lang-domain partials, one tiny exchange.
    """
    from ..stages.exact_agg import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        actual = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        stored = pc.cast(t.column("n_chars"), pa.int64())
        bad = pc.cast(pc.not_equal(actual, stored), pa.int64())
        return pa.table({
            "lang": t.column("lang"),
            "n_rows": pa.array(np.ones(t.num_rows, np.int64)),
            "n_mismatched": bad})

    return grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"], [("n_rows", "sum", "n_rows"),
                   ("n_mismatched", "sum", "n_mismatched")])


def derived_column_audit_sql() -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
         AS n_mismatched
FROM documents GROUP BY lang"""


def label_uniformity_chi2(emb_ds, k: int = 10):
    """Goodness-of-fit audit: is the embeddings ``label`` column
    uniform over its k classes?  Reports the EXACT INTEGER chi-square
    numerator sum((k*n_i - N)^2) (the fp statistic is numerator /
    (k*N) downstream) plus N and max class count — the class-balance
    gate before classifier training.

    Shape: label-domain count exchange; the k-term fold is driver-side
    Python ints vs HUGEINT in the oracle."""
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"label": pc.cast(t.column("label"), pa.int64())})

    counts = collect_small_arrow(grouped_aggregate(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["label"], [("", "count", "n")])).to_pandas()
    ns = [int(v) for v in counts["n"]]
    n_total = sum(ns)
    chi2_num = sum((k * v - n_total) ** 2 for v in ns)
    import pandas as pd

    return pd.DataFrame({
        "n_classes": pd.Series([len(ns)], dtype="int64"),
        "n_total": pd.Series([n_total], dtype="int64"),
        "max_class_n": pd.Series([max(ns)], dtype="int64"),
        "chi2_num": pd.Series([chi2_num], dtype="int64")})


def label_uniformity_chi2_sql(k: int = 10) -> str:
    return f"""
WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
t AS (SELECT sum(n) AS nt FROM c)
SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_classes,
       CAST(t.nt AS BIGINT) AS n_total,
       CAST((SELECT max(n) FROM c) AS BIGINT) AS max_class_n,
       CAST((SELECT sum(({k} * n - t.nt) * ({k} * n - t.nt)) FROM c)
            AS BIGINT) AS chi2_num
FROM t"""


def sequence_gap_audit(sf_dir: str, coarse: int = 1024):
    """Surrogate-key continuity audit: distinct keys, span,
    missing-count (span − distinct) and the LARGEST adjacent gap — the
    id-sequence health check (bulk-load holes, partition loss) that
    naively needs a global sort.  Audited over the keys RETAINED after
    the governance cascade delete (the md5-rule on o_custkey), so the
    corpus's dense surrogate sequence actually exhibits holes — the
    exact after-deletion state a continuity audit runs on.

    Distributed max-adjacent-gap WITHOUT sorting globally: pass 1 is a
    (min, max, distinct-count) aggregate; pass 2 range-buckets keys by
    (key − min) * C // (span), takes each bucket's vectorized in-bucket
    max gap plus its (min, max), and the driver stitches the C
    cross-bucket boundary gaps (bucket-domain state).  Empty buckets
    between occupied ones fold into the boundary gaps naturally.
    """
    import pandas as pd
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow, shuffle_partitions

    from ..pipelines.governance import DELETE_RATE, _rule_mask
    from ..stages.sampling import _hex_threshold

    thr = _hex_threshold(DELETE_RATE)
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey"])

    def distinct_rows(t: pa.Table) -> pa.Table:
        keep = pc.invert(_rule_mask(
            pc.cast(t.column("o_custkey"), pa.int64()), thr))
        return pa.table({"k": pa.array(np.unique(
            pc.cast(t.filter(keep).column("o_orderkey"),
                    pa.int64()).to_numpy()), pa.int64())})

    dist = grouped_aggregate(
        ds.map_batches(distinct_rows, batch_format="pyarrow"),
        ["k"], [("", "count", "n")]).materialize()

    def minmax_partial(t: pa.Table) -> pa.Table:
        # post-exchange blocks can be schema-bearing but ZERO-row
        # (unoccupied coarse partitions) — pc.min on them is null
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "lo": pa.array([int(pc.min(t.column("k")).as_py())],
                           pa.int64()),
            "hi": pa.array([int(pc.max(t.column("k")).as_py())],
                           pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())})

    mm = collect_small_arrow(dist.map_batches(
        minmax_partial, batch_format="pyarrow")).to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    n_distinct = int(mm["n"].sum())
    span = hi - lo + 1

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy()
        b = (k - lo) * coarse // max(span, 1)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "__coarse": pa.array(
                             np.minimum(b, coarse - 1), pa.int64())})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"bmin": pd.Series(dtype="int64"),
                "bmax": pd.Series(dtype="int64"),
                "max_gap_in": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        k = np.sort(g["k"].to_numpy())
        gap = int(np.diff(k).max()) if len(k) > 1 else 0
        return pd.DataFrame({"bmin": [int(k[0])], "bmax": [int(k[-1])],
                             "max_gap_in": [gap]})

    stats = collect_small_arrow(
        (dist.map_batches(bucketize, batch_format="pyarrow")
         .groupby("__coarse", num_partitions=shuffle_partitions())
         .map_groups(bucket_stats, batch_format="pandas"))).to_pandas()
    stats = stats.sort_values("bmin").reset_index(drop=True)
    max_gap = int(stats["max_gap_in"].max())
    if len(stats) > 1:
        cross = (stats["bmin"].to_numpy()[1:]
                 - stats["bmax"].to_numpy()[:-1])
        max_gap = max(max_gap, int(cross.max()))
    return pd.DataFrame({
        "n_distinct": pd.Series([n_distinct], dtype="int64"),
        "key_span": pd.Series([span], dtype="int64"),
        "n_missing": pd.Series([span - n_distinct], dtype="int64"),
        "max_gap": pd.Series([max_gap], dtype="int64")})


def sequence_gap_audit_sql() -> str:
    from ..pipelines.governance import DELETE_RATE
    from ..stages.sampling import _hex_threshold

    thr = _hex_threshold(DELETE_RATE)
    return f"""
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
           WHERE substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)
                 >= '{thr}'),
g AS (SELECT k - lag(k) OVER (ORDER BY k) AS gap FROM k)
SELECT CAST((SELECT count(*) FROM k) AS BIGINT) AS n_distinct,
       CAST((SELECT max(k) - min(k) + 1 FROM k) AS BIGINT) AS key_span,
       CAST((SELECT max(k) - min(k) + 1 - count(*) FROM k) AS BIGINT)
         AS n_missing,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap
FROM g"""
