"""OLAP accessory wave: the classic warehouse shapes the relational
family did not yet cover (reference scope: the engine-side analytics
surface; no single reference file — these extend SURVEY.md §2's
constraint/aggregate rows):

* ``events_first_last`` — per-entity FIRST/LAST-touch attribution:
  argmin/argmax batch partials, 2 candidate rows per (user, batch).
* ``docs_dense_topk`` / ``dense_topk`` — grouped top-k by DENSE RANK
  including ALL ties; the batch-local k-th-distinct prune is a sound
  superset of the global tiers.
* ``embedding_centroids`` — exact per-label centroid sums in fixed
  point ((label x dim) int64 partials, order-free merge — the k-means
  building block; vectors never move).
* ``events_ols_stats`` — grouped OLS sufficient statistics (five
  mergeable int64 sums; slope/R^2 are driver math).
* ``events_mad_outliers`` — the MAD/Hampel robust anomaly gate (two
  exact radix-rank median passes + a counting scan).
* ``events_path_trigrams`` — sequence mining: per-user ordered
  event-type 3-gram counts.
* ``orders_open_per_day`` — the interval-overlap sweep (spans to +-1
  boundary events, day-domain histogram, driver cumsum).
* ``docs_ids_concat`` — ordered collect (string_agg/array_agg):
  order-insensitive partial collects, the final per-group sort owns
  the order.
* ``events_conversion_window`` — time-bounded funnel conversion
  (first-view anchor, click within W).
* ``events_user_mode`` — grouped MODE via distributive counts + a
  domain-sized argmax exchange, deterministic tie rule.
* ``docs_pareto_frontier`` — the 2-D dominance skyline (global
  frontier ⊆ every batch-local frontier).

All follow the CLAUDE.md exchange discipline: partials through
``exact_agg``-keyed coarse groupbys, merges vectorized per partition,
integer outputs everywhere hashes must match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# first / last event per user (argmin / argmax combiner)
# ---------------------------------------------------------------------------

def events_first_last(sf_dir: str, coarse: int = 1024):
    """Per-user first/last event attribution: (first ts+id+type,
    last ts+id+type, total events), ties broken by event_id — the
    distributive argmin/argmax pair, so a per-batch partial (2 candidate
    rows + one count per user per batch) is exact.

    Timestamps travel and return as epoch MICROSECOND int64 (the
    ``window_start`` convention of the events family) so the value hash
    is unit-exact against ``epoch_us(ts)``.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
        })

    return first_last_by_user(ds.map_batches(prep, batch_format="pyarrow"),
                              coarse=coarse)


def first_last_by_user(ds, coarse: int = 1024):
    """Core combiner over a prepared (user_id, ts_us, event_id,
    event_type) int64/int64/int64/string Dataset — split out so tests
    can drive it with multi-block synthetic tables."""
    from ..stages.exact_agg import hash_columns
    from ..util import shuffle_partitions

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        g = df.groupby("user_id", sort=False)
        out = g.agg(
            n_events=("event_id", "size"),
            first_ts_us=("ts_us", "first"),
            first_event_id=("event_id", "first"),
            first_type=("event_type", "first"),
            last_ts_us=("ts_us", "last"),
            last_event_id=("event_id", "last"),
            last_type=("event_type", "last"),
        ).reset_index()
        kh = hash_columns(pa.table({"user_id": pa.array(
            out["user_id"].to_numpy(np.int64))}))
        out["__coarse"] = (kh & np.uint64(coarse - 1)).astype(np.int64)
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__coarse")
        n = df.groupby("user_id", sort=False)["n_events"].sum()
        f = (df.sort_values(["user_id", "first_ts_us", "first_event_id"],
                            kind="mergesort")
             .groupby("user_id", sort=False)
             [["first_ts_us", "first_event_id", "first_type"]].first())
        l = (df.sort_values(["user_id", "last_ts_us", "last_event_id"],
                            kind="mergesort")
             .groupby("user_id", sort=False)
             [["last_ts_us", "last_event_id", "last_type"]].last())
        out = pd.concat([n, f, l], axis=1).reset_index()
        for c in ("user_id", "n_events", "first_ts_us", "first_event_id",
                  "last_ts_us", "last_event_id"):
            out[c] = out[c].astype("int64")
        return out[["user_id", "n_events",
                    "first_ts_us", "first_event_id", "first_type",
                    "last_ts_us", "last_event_id", "last_type"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(merge, batch_format="pandas"))


def events_first_last_sql() -> str:
    return """
WITH rk AS (
  SELECT user_id, ts, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rd,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(max(CASE WHEN ra=1 THEN epoch_us(ts) END) AS BIGINT)
         AS first_ts_us,
       CAST(max(CASE WHEN ra=1 THEN event_id END) AS BIGINT)
         AS first_event_id,
       max(CASE WHEN ra=1 THEN event_type END) AS first_type,
       CAST(max(CASE WHEN rd=1 THEN epoch_us(ts) END) AS BIGINT)
         AS last_ts_us,
       CAST(max(CASE WHEN rd=1 THEN event_id END) AS BIGINT)
         AS last_event_id,
       max(CASE WHEN rd=1 THEN event_type END) AS last_type
FROM rk GROUP BY user_id"""


# ---------------------------------------------------------------------------
# dense-rank top-k per group WITH ties
# ---------------------------------------------------------------------------

def docs_dense_topk(sf_dir: str, k: int = 2):
    """The ``k`` highest DISTINCT n_chars tiers per source, keeping
    every document on a kept tier (dense_rank() <= k semantics — the
    tie-inclusive variant of ``docs_top_per_group``).

    Local prune: a row can only sit on a global top-k distinct tier of
    its source if its value is >= the batch's k-th distinct value for
    that source, so each batch forwards only candidate rows (bounded by
    sources x k tiers x tier membership); the final per-source merge
    re-derives the distinct tiers from candidates only.
    """
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    return dense_topk(ds, group_col="source", value_col="n_chars",
                      id_col="doc_id", k=k)


def dense_topk(ds, group_col: str, value_col: str, id_col: str,
               k: int = 2, rank_col: str = "dr"):
    """Core dense-rank top-k with ties — see ``docs_dense_topk``."""
    from ..util import shuffle_partitions

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        d = (df[[group_col, value_col]].drop_duplicates()
             .sort_values([group_col, value_col], ascending=[True, False],
                          kind="mergesort"))
        d["__r"] = d.groupby(group_col, sort=False).cumcount()
        thr = d[d["__r"] == k - 1].set_index(group_col)[value_col]
        cut = df[group_col].map(thr)
        out = df[cut.isna() | (df[value_col] >= cut)].copy()
        out[id_col] = out[id_col].astype("int64")
        out[value_col] = out[value_col].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        tiers = np.sort(df[value_col].unique())[::-1][:k]
        rank = {int(v): i + 1 for i, v in enumerate(tiers)}
        out = df[df[value_col].isin(tiers)].copy()
        out[rank_col] = out[value_col].map(rank).astype("int64")
        return out[[group_col, id_col, value_col, rank_col]]

    return (ds.map_batches(local_prune, batch_format="pandas")
            .groupby(group_col, num_partitions=min(8, shuffle_partitions()))
            .map_groups(final, batch_format="pandas"))


def docs_dense_topk_sql(k: int = 2) -> str:
    return f"""
SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(dense_rank() OVER (PARTITION BY source
            ORDER BY n_chars DESC) AS BIGINT) AS dr
FROM documents QUALIFY dr <= {k}"""


# ---------------------------------------------------------------------------
# exact per-label embedding centroids (fixed-point)
# ---------------------------------------------------------------------------

def embedding_centroids(emb_ds):
    """Exact per-(label, dim) centroid accounting: vector count and the
    fixed-point component sum (floor(x*1e6 + 0.5), the
    ``embedding_quantize`` convention).  Per batch the (n, d) float
    matrix collapses to a (labels x d) int64 partial — vectors never
    reach the exchange — and integer sums make the merge order-free.
    The caller derives means as sum_q / n_vecs; keeping the exact
    integer pair is what makes the result mergeable across epochs.
    """
    from ..stages.ann import _list_f64_matrix
    from ..stages.exact_agg import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        m = _list_f64_matrix(t.column("embedding"))
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq))),
            "n_vecs": pa.array(np.repeat(counts, d)),
            "sum_q": pa.array(sums.reshape(-1)),
        })

    return grouped_aggregate(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        [("n_vecs", "sum", "n_vecs"), ("sum_q", "sum", "sum_q")])


# ---------------------------------------------------------------------------
# grouped OLS sufficient statistics (value-vs-time trend per event type)
# ---------------------------------------------------------------------------

def events_ols_stats(sf_dir: str):
    """Per-event-type OLS sufficient statistics for the value-vs-time
    trend: (n, sum_x, sum_y_cents, sum_xx, sum_xy) with x = whole
    seconds since the global min timestamp and y = integer cents — the
    classic mergeable-statistics shape (slope/intercept/R^2 are
    domain-sized driver math over the five sums, and partials from any
    partitioning merge by addition).

    Everything that crosses the exchange is int64: no float summation,
    so the hash matches SQL regardless of order.  Magnitude note for
    100 TB: sum_xy grows as rows x time-span x |y|; a production run
    re-zeroes x per day/shard (the statistics re-merge exactly after
    shifting, x' = x - c changes sums by closed-form int terms).
    """
    import ray.data
    from ray.data.aggregate import Min

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    t0 = (ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
          .map_batches(lambda t: pa.table(
              {"ts_us": pc.cast(t.column("ts"), pa.int64())}),
              batch_format="pyarrow")
          .aggregate(Min("ts_us")))["min(ts_us)"]

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        x = (ts_us - t0) // 1_000_000
        y = pc.cast(pc.round(pc.multiply(t.column("value"),
                                         pa.scalar(100.0))),
                    pa.int64()).to_numpy()
        return pa.table({
            "event_type": t.column("event_type"),
            "x": pa.array(x), "y": pa.array(y),
            "xx": pa.array(x * x), "xy": pa.array(x * y),
        })

    return grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"],
        [("", "count", "n_events"), ("x", "sum", "sum_x"),
         ("y", "sum", "sum_y_cents"), ("xx", "sum", "sum_xx"),
         ("xy", "sum", "sum_xy")])


def events_ols_stats_sql() -> str:
    return """
WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
b AS (
  SELECT event_type,
         CAST((epoch_us(ts) - t0.t0) // 1000000 AS BIGINT) AS x,
         CAST(round(value * 100.0) AS BIGINT) AS y
  FROM events, t0)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y_cents,
       CAST(sum(x * x) AS BIGINT) AS sum_xx,
       CAST(sum(x * y) AS BIGINT) AS sum_xy
FROM b GROUP BY event_type"""


# ---------------------------------------------------------------------------
# MAD outlier report (robust anomaly gate)
# ---------------------------------------------------------------------------

def events_mad_outliers(sf_dir: str, k_sigma: float = 3.0):
    """Robust per-group anomaly accounting: median, median absolute
    deviation and the count of |value - med| > k * MAD rows per event
    type (the Hampel/MAD gate data-quality layers run before training).

    Three streaming passes, each exchanging only domain-sized partials:
    (1) exact per-group median via the radix-rank plan
    (:func:`~..stages.quantiles.grouped_exact_quantiles` — disc
    semantics, an actual element, so it is bit-identical to SQL);
    (2) the same plan over |value - med| for the MAD; (3) a counting
    scan.  med/MAD are corpus ELEMENTS and the gate arithmetic is one
    IEEE subtract/abs/multiply/compare tree mirrored in the oracle —
    no float accumulates anywhere.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.quantiles import grouped_exact_quantiles
    from ..util import collect_small_arrow

    def ev(cols):
        return ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                     columns=cols)

    med_t = collect_small_arrow(grouped_exact_quantiles(
        ev(["event_type", "value"]), "event_type", "value", qs=(0.5,)))
    med = dict(zip(med_t.column("event_type").to_pylist(),
                   med_t.column("value").to_pylist()))

    def dev(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        m = pd.Series(et.to_pandas()).map(med).to_numpy(np.float64)
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table({"event_type": et, "dev": np.abs(v - m)})

    mad_t = collect_small_arrow(grouped_exact_quantiles(
        ev(["event_type", "value"]).map_batches(dev, batch_format="pyarrow"),
        "event_type", "dev", qs=(0.5,)))
    mad = dict(zip(mad_t.column("event_type").to_pylist(),
                   mad_t.column("value").to_pylist()))

    def flag(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        ets = pd.Series(et.to_pandas())
        m = ets.map(med).to_numpy(np.float64)
        a = ets.map(mad).to_numpy(np.float64)
        v = t.column("value").to_numpy(zero_copy_only=False)
        out = (np.abs(v - m) > k_sigma * a).astype(np.int64)
        return pa.table({"event_type": et, "is_out": pa.array(out)})

    counts = grouped_aggregate(
        ev(["event_type", "value"]).map_batches(flag, batch_format="pyarrow"),
        ["event_type"],
        [("", "count", "n_events"), ("is_out", "sum", "n_outliers")])

    def attach(t: pa.Table) -> pa.Table:
        ets = pd.Series(t.column("event_type").to_pandas())
        return pa.table({
            "event_type": t.column("event_type"),
            "n_events": t.column("n_events"),
            "med": pa.array(ets.map(med).to_numpy(np.float64)),
            "mad": pa.array(ets.map(mad).to_numpy(np.float64)),
            "n_outliers": pc.cast(t.column("n_outliers"), pa.int64()),
        })

    return counts.map_batches(attach, batch_format="pyarrow")


def events_mad_outliers_sql(k_sigma: float = 3.0) -> str:
    return f"""
WITH s AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (
  SELECT event_type, value AS med FROM s
  WHERE r = CAST(ceil(0.5 * n) AS BIGINT)),
d AS (
  SELECT e.event_type, abs(e.value - m.med) AS dev
  FROM events e JOIN med m USING (event_type)),
s2 AS (
  SELECT event_type, dev,
         row_number() OVER (PARTITION BY event_type ORDER BY dev) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d),
mad AS (
  SELECT event_type, dev AS mad FROM s2
  WHERE r = CAST(ceil(0.5 * n) AS BIGINT))
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events, m.med, a.mad,
       CAST(coalesce(sum(CASE WHEN abs(e.value - m.med) > {k_sigma} * a.mad
                               THEN 1 END), 0) AS BIGINT) AS n_outliers
FROM events e JOIN med m USING (event_type) JOIN mad a USING (event_type)
GROUP BY e.event_type, m.med, a.mad"""


# ---------------------------------------------------------------------------
# sequence mining: event-type path trigrams
# ---------------------------------------------------------------------------

def events_path_trigrams(sf_dir: str):
    """Per-user event-type path 3-grams (the funnel-discovery /
    next-action-model feature table): count every consecutive
    (e1 -> e2 -> e3) triple along each user's (ts, event_id)-ordered
    stream.

    ONE user-keyed coarse exchange co-locates each user's events
    (sequence mining is inherently per-entity — this is the minimal
    movement); inside each partition the trigram emit is a vectorized
    grouped double-shift, and what leaves is (trigram -> count)
    partials bounded by the event-type-domain cubed, not by rows.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate, hash_columns
    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        kh = hash_columns(pa.table(
            {"user_id": pc.cast(t.column("user_id"), pa.int64())}))
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array((kh & np.uint64(1023)).astype(np.int64)),
        })

    def trigrams(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        g = df.groupby("user_id", sort=False)["event_type"]
        out = pd.DataFrame({"e1": df["event_type"],
                            "e2": g.shift(-1), "e3": g.shift(-2)})
        out = out[out["e2"].notna() & out["e3"].notna()]
        if out.empty:
            return pd.DataFrame({"e1": pd.Series(dtype="object"),
                                 "e2": pd.Series(dtype="object"),
                                 "e3": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        out = (out.groupby(["e1", "e2", "e3"], sort=False).size()
               .reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    co = (ds.map_batches(prep, batch_format="pyarrow")
          .groupby("__coarse", num_partitions=shuffle_partitions())
          .map_groups(trigrams, batch_format="pandas"))
    return grouped_aggregate(co, ["e1", "e2", "e3"],
                             [("n", "sum", "n")])


def events_path_trigrams_sql() -> str:
    return """
WITH s AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3"""


# ---------------------------------------------------------------------------
# interval sweep: concurrently-open orders per day
# ---------------------------------------------------------------------------

def orders_open_per_day(sf_dir: str):
    """Daily concurrently-open-order count (the backlog / WIP series):
    an order is open from its order date through its LAST ship date —
    the classic interval-overlap sweep, distributed as boundary events.

    Order spans come from an order-grain max-shipdate partial
    co-located with orders (no broadcast; both sides scale); each
    order then emits exactly two int64 boundary rows (+1 open day,
    -1 close day + 1) whose day-domain histogram is one exchange; the
    running sum over the day DOMAIN (thousands of rows regardless of
    corpus size) is driver math, like every post-exchange reduce in
    this repo.  Orders with no lineitems have no ship date and drop
    (inner semantics, mirrored in the oracle).  Returns one row per
    calendar day from the first open to the last close.
    """
    import ray.data

    from ..stages.dimjoin import colocate_join
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    US_PER_DAY = 86_400_000_000

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])

    def li_max(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "ship_us": pc.cast(t.column("l_shipdate"), pa.int64()),
        })
        return (tt.group_by(["l_orderkey"]).aggregate([("ship_us", "max")])
                .rename_columns(["l_orderkey", "ship_us"]))

    ship = grouped_aggregate(
        li.map_batches(li_max, batch_format="pyarrow"),
        ["l_orderkey"], [("ship_us", "max", "ship_us")])

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "open_us": pc.cast(t.column("o_orderdate"), pa.int64()),
        })

    span = colocate_join(orders.map_batches(o_prep, batch_format="pyarrow"),
                         ship, "o_orderkey", "l_orderkey")

    def boundaries(t: pa.Table) -> pa.Table:
        open_day = (t.column("open_us").to_numpy(zero_copy_only=False)
                    .astype(np.int64)) // US_PER_DAY
        close_day = (t.column("ship_us").to_numpy(zero_copy_only=False)
                     .astype(np.int64)) // US_PER_DAY
        return pa.table({
            "day": pa.array(np.concatenate([open_day, close_day + 1])),
            "d": pa.array(np.concatenate([
                np.ones(len(open_day), np.int64),
                np.full(len(close_day), -1, np.int64)])),
        })

    hist = collect_small_arrow(grouped_aggregate(
        span.map_batches(boundaries, batch_format="pyarrow"),
        ["day"], [("d", "sum", "delta")])).to_pandas()

    hist = hist.sort_values("day").reset_index(drop=True)
    lo, hi = int(hist["day"].iloc[0]), int(hist["day"].iloc[-1]) - 1
    full = pd.DataFrame({"day": np.arange(lo, hi + 1, dtype=np.int64)})
    full = full.merge(hist, on="day", how="left")
    full["n_open"] = (full["delta"].fillna(0).astype("int64")
                      .cumsum().astype("int64"))
    return full[["day", "n_open"]]


def orders_open_per_day_sql() -> str:
    return """
WITH span AS (
  SELECT o.o_orderkey,
         CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS open_day,
         CAST(max(epoch_us(l.l_shipdate)) // 86400000000 AS BIGINT)
           AS close_day
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate),
b AS (
  SELECT open_day AS day, 1 AS d FROM span
  UNION ALL
  SELECT close_day + 1 AS day, -1 AS d FROM span),
h AS (SELECT day, sum(d) AS delta FROM b GROUP BY day),
days AS (
  SELECT unnest(range((SELECT min(open_day) FROM span),
                      (SELECT max(close_day) + 1 FROM span))) AS day)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(sum(coalesce(h.delta, 0)) OVER (ORDER BY d.day) AS BIGINT)
         AS n_open
FROM days d LEFT JOIN h ON h.day = d.day"""


# ---------------------------------------------------------------------------
# ordered collect (string_agg / array_agg)
# ---------------------------------------------------------------------------

def docs_ids_concat(sf_dir: str):
    """Ordered collect per group: the comma-joined sorted doc_id list
    per (source, lang) — the ``string_agg(... ORDER BY ...)`` /
    ``array_agg`` aggregate family member (manifest building, shard
    membership lists).

    Collect is holistic, but ORDER-INSENSITIVELY so: per-batch partials
    collect each batch's sorted slice, the group exchange moves
    (group, partial-list) rows (one per group per batch, id volume
    unchanged but already compacted into list cells), and the
    per-partition merge re-sorts the concatenation — associative
    because the final sort owns the order.  Output also carries n_docs
    as a cheap cross-check of list length.
    """
    import ray.data

    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        g = (df.groupby(["source", "lang"], sort=False)["doc_id"]
             .agg(list).reset_index(name="ids"))
        g["n_docs"] = g["ids"].map(len).astype("int64")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["source", "lang"], sort=False)
               .agg(ids=("ids", lambda s: sorted(
                   int(x) for lst in s for x in lst)),
                    n_docs=("n_docs", "sum"))
               .reset_index())
        out["doc_ids"] = out["ids"].map(
            lambda lst: ",".join(str(x) for x in lst))
        out["n_docs"] = out["n_docs"].astype("int64")
        return out[["source", "lang", "n_docs", "doc_ids"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["source", "lang"],
                     num_partitions=min(8, shuffle_partitions()))
            .map_groups(merge, batch_format="pandas"))


def docs_ids_concat_sql() -> str:
    return """
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         AS doc_ids
FROM documents GROUP BY source, lang"""


# ---------------------------------------------------------------------------
# time-bounded conversion (windowed funnel step)
# ---------------------------------------------------------------------------

def events_conversion_window(sf_dir: str, windows=(3600, 86400)):
    """Time-bounded conversion: of the users with a 'view', how many
    clicked within W seconds AFTER their FIRST view — the windowed
    funnel step :func:`~.relational.events_funnel`'s unbounded ordering
    test cannot express.

    The anchor (first view) is not known batch-locally, so click rows
    co-locate with per-batch view-minima partials in ONE user-keyed
    exchange (clicks are pruned to (user, ts) int64 pairs before
    moving; view rows pre-reduce to one row per user per batch); each
    partition computes tv = min(view), tc = min(click > tv) vectorized,
    and only window-domain count partials leave.  Returns one row per
    window: (window_s, n_first_view_users, n_converted).
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate, hash_columns
    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        ts_us = pc.cast(t.column("ts"), pa.int64())
        uid = pc.cast(t.column("user_id"), pa.int64())
        views = pa.table({"user_id": uid, "ts_us": ts_us}).filter(
            pc.equal(et, "view"))
        # view side pre-reduces to one (user, min ts) row per batch
        views = (views.group_by(["user_id"]).aggregate([("ts_us", "min")])
                 .rename_columns(["user_id", "ts_us"]))
        clicks = pa.table({"user_id": uid, "ts_us": ts_us}).filter(
            pc.equal(et, "click"))
        out = pa.table({
            "user_id": pa.concat_arrays(
                [views.column("user_id").combine_chunks(),
                 clicks.column("user_id").combine_chunks()]),
            "ts_us": pa.concat_arrays(
                [views.column("ts_us").combine_chunks(),
                 clicks.column("ts_us").combine_chunks()]),
            "kind": pa.array(np.concatenate([
                np.zeros(views.num_rows, np.int64),
                np.ones(clicks.num_rows, np.int64)])),
        })
        kh = hash_columns(out.select(["user_id"]))
        return out.append_column("__u", pa.array(
            (kh & np.uint64(1023)).astype(np.int64)))

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        v = df[df["kind"] == 0]
        tv = v.groupby("user_id", sort=False)["ts_us"].min()
        c = df[df["kind"] == 1].copy()
        c["tv"] = c["user_id"].map(tv)
        c = c[c["tv"].notna() & (c["ts_us"] > c["tv"])]
        tc = c.groupby("user_id", sort=False)["ts_us"].min()
        base = pd.DataFrame({"tv": tv})
        base["tc"] = tc  # NaN where never clicked after tv
        rows = []
        for w in windows:
            conv = (base["tc"].notna()
                    & (base["tc"] <= base["tv"] + w * 1_000_000)).sum()
            rows.append((int(w), len(base), int(conv)))
        return pd.DataFrame(rows, columns=["window_s",
                                           "n_first_view_users",
                                           "n_converted"]).astype("int64")

    partials = (ds.map_batches(prep, batch_format="pyarrow")
                .groupby("__u", num_partitions=shuffle_partitions())
                .map_groups(per_user, batch_format="pandas"))
    return grouped_aggregate(
        partials, ["window_s"],
        [("n_first_view_users", "sum", "n_first_view_users"),
         ("n_converted", "sum", "n_converted")])


def events_conversion_window_sql(windows=(3600, 86400)) -> str:
    wlist = ", ".join(str(w) for w in windows)
    return f"""
WITH fv AS (
  SELECT user_id, min(epoch_us(ts)) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id),
tc AS (
  SELECT f.user_id, f.tv, min(epoch_us(e.ts)) AS tc
  FROM fv f LEFT JOIN events e
    ON e.user_id = f.user_id AND e.event_type = 'click'
   AND epoch_us(e.ts) > f.tv
  GROUP BY f.user_id, f.tv),
w AS (SELECT CAST(unnest([{wlist}]) AS BIGINT) AS window_s)
SELECT CAST(w.window_s AS BIGINT) AS window_s,
       CAST(count(*) AS BIGINT) AS n_first_view_users,
       CAST(coalesce(sum(CASE WHEN tc.tc IS NOT NULL
                          AND tc.tc <= tc.tv + w.window_s * 1000000
                          THEN 1 END), 0) AS BIGINT) AS n_converted
FROM w, tc GROUP BY w.window_s"""


# ---------------------------------------------------------------------------
# grouped MODE (most frequent value, deterministic ties)
# ---------------------------------------------------------------------------

def events_user_mode(sf_dir: str):
    """Per-user MODE of event_type — "each user's dominant action" —
    with the deterministic tie rule (highest count, then lexicographic
    smallest type).  Mode is not distributive, but (user, type) COUNTS
    are: one count exchange on the (user, type) domain, then a
    vectorized per-partition argmax; event rows never move.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "event_type": t.column("event_type"),
        })

    counts = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "event_type"], [("", "count", "n")])

    # grouped_aggregate keyed on (user, type), so one user's types may
    # land in different coarse groups — a second tiny exchange keyed on
    # user alone co-locates them (the counts table is
    # (user x type)-DOMAIN-sized, not event-sized)
    from ..stages.exact_agg import hash_columns
    from ..util import shuffle_partitions

    def key_user(t: pa.Table) -> pa.Table:
        kh = hash_columns(t.select(["user_id"]))
        return t.append_column("__u", pa.array(
            (kh & np.uint64(1023)).astype(np.int64)))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "n", "event_type"],
                            ascending=[True, False, True],
                            kind="mergesort")
        out = df.groupby("user_id", sort=False).head(1).copy()
        out["user_id"] = out["user_id"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "event_type", "n"]]

    return (counts.map_batches(key_user, batch_format="pyarrow")
            .groupby("__u", num_partitions=shuffle_partitions())
            .map_groups(pick, batch_format="pandas"))


def events_user_mode_sql() -> str:
    return """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events
  GROUP BY user_id, event_type),
r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rk
  FROM c)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(n AS BIGINT) AS n
FROM r WHERE rk = 1"""


# ---------------------------------------------------------------------------
# Pareto frontier (2-D skyline)
# ---------------------------------------------------------------------------

def _skyline_2d(df: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Strict-dominance 2-D skyline, vectorized: a point survives iff
    its y exceeds every y at strictly larger x AND it holds its own
    x-column's max y (duplicates of a frontier point all survive —
    equal points do not dominate each other)."""
    if df.empty:
        return df
    per_x = (df.groupby(x, sort=True)[y].max()
             .sort_index(ascending=False))
    runbest = per_x.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    kept_x = per_x[per_x > runbest]
    ymax = df[x].map(per_x)
    return df[df[x].isin(kept_x.index) & (df[y] == ymax)]


def docs_pareto_frontier(sf_dir: str):
    """The documents on the (length, alphabetic-purity) Pareto frontier
    — "no other document is both longer AND cleaner" (the dominance /
    skyline query; curation uses it to pick per-tradeoff exemplars).
    Purity is integer fixed-point: alpha_q6 = (1e6 * [A-Za-z] count)
    // n_chars, so both axes hash-exactly.

    Distribution: the global skyline is a subset of every batch's local
    skyline (a surviving point has no dominator anywhere, hence none in
    its own batch), so each batch forwards only its local frontier and
    one final single-partition pass reduces the candidate union with
    the same vectorized sweep.  Candidate volume is the sum of batch
    frontier sizes — tiny on real distributions (frontiers grow
    ~O(log n)); an adversarial all-diagonal corpus degrades to the
    batch size, which the final pass still bounds to candidates, not
    the corpus.
    """
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "n_chars"])

    def features(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_chars"), pa.int64()).to_numpy()
        alpha = pc.cast(pc.count_substring_regex(
            t.column("text"), "[A-Za-z]"), pa.int64()).to_numpy()
        keep = n > 0
        return pa.table({
            "doc_id": pa.array(pc.cast(t.column("doc_id"), pa.int64())
                               .to_numpy()[keep]),
            "n_chars": pa.array(n[keep]),
            "alpha_q6": pa.array((1_000_000 * alpha[keep]) // n[keep]),
        })

    def local_front(df: pd.DataFrame) -> pd.DataFrame:
        return _skyline_2d(df, "n_chars", "alpha_q6")

    return (ds.map_batches(features, batch_format="pyarrow")
            .map_batches(local_front, batch_format="pandas")
            .repartition(1)
            .map_batches(local_front, batch_format="pandas"))


def docs_pareto_frontier_sql() -> str:
    return """
WITH f AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(1000000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              // n_chars AS BIGINT) AS alpha_q6
  FROM documents WHERE n_chars > 0)
SELECT d.doc_id, d.n_chars, d.alpha_q6
FROM f d
WHERE NOT EXISTS (
  SELECT 1 FROM f e
  WHERE e.n_chars >= d.n_chars AND e.alpha_q6 >= d.alpha_q6
    AND (e.n_chars > d.n_chars OR e.alpha_q6 > d.alpha_q6))"""


# ---------------------------------------------------------------------------
# k-means Lloyd assignment step (exact, oracled)
# ---------------------------------------------------------------------------

def embedding_lloyd_step(sf_dir: str):
    """ONE exact Lloyd iteration over the labelled embeddings: compute
    the per-label centroid of the CURRENT labels, then re-assign every
    vector to its nearest centroid — the k-means refinement step,
    fully SQL-oracled (most engines can only property-test k-means;
    the fixed-point formulation makes the assignment bit-checkable).

    Arithmetic contract: coordinates quantize once (floor(x*1e6+0.5),
    the repo convention) and ALL downstream math is integer — centroid
    component m = trunc(sum_q / n) (trunc matches DuckDB's BIGINT
    ``//``), distance = sum_dims (x_q6 - m)^2 (max ~6.4e15, inside
    int64), ties break to the smallest label.  Output per vector:
    (vec_id, old label, new_label, dist_q, moved).

    Shape: centroids come from :func:`embedding_centroids` (one
    (label x dim)-domain exchange) and are collected driver-side
    (k x d integers — genuinely tiny at any corpus size); assignment
    is a zero-shuffle scan with a broadcast (k, d) matrix and a
    batched numpy argmin.
    """
    import ray.data

    from ..util import collect_small_arrow
    from ..stages.ann import _list_f64_matrix

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding", "label"])

    cent_t = collect_small_arrow(embedding_centroids(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["embedding", "label"])))
    cdf = cent_t.to_pandas().sort_values(["label", "dim"])
    labels = np.sort(cdf["label"].unique())
    d = int(cdf["dim"].max()) + 1
    sums = cdf["sum_q"].to_numpy(np.int64).reshape(len(labels), d)
    ns = (cdf.groupby("label", sort=True)["n_vecs"].first()
          .to_numpy(np.int64))
    # trunc division (DuckDB // semantics), sign-aware
    m = np.sign(sums) * (np.abs(sums) // ns[:, None])

    def assign(t: pa.Table) -> pa.Table:
        x = _list_f64_matrix(t.column("embedding"))
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
        # (n, k, d) deltas; batch_size bounds the intermediate
        dist = ((xq[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(dist, axis=1)  # first occurrence = smallest label
        old = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        new = labels[best]
        return pa.table({
            "vec_id": pc.cast(t.column("vec_id"), pa.int64()),
            "label": pa.array(old),
            "new_label": pa.array(new),
            "dist_q": pa.array(dist[np.arange(len(best)), best]),
            "moved": pa.array((new != old).astype(np.int64)),
        })

    return emb.map_batches(assign, batch_format="pyarrow",
                           batch_size=1024)


def embedding_lloyd_step_sql() -> str:
    return """
WITH el AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings),
cent AS (
  SELECT label, dim, CAST(sum(xq) // count(*) AS BIGINT) AS m
  FROM el GROUP BY label, dim),
dist AS (
  SELECT e.vec_id, c.label AS cand,
         CAST(sum((e.xq - c.m) * (e.xq - c.m)) AS BIGINT) AS dist_q
  FROM el e JOIN cent c ON c.dim = e.dim
  GROUP BY e.vec_id, c.label),
best AS (
  SELECT vec_id, cand, dist_q,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist_q, cand) AS rk
  FROM dist)
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(e.label AS BIGINT) AS label,
       b.cand AS new_label, b.dist_q,
       CAST(CASE WHEN b.cand <> e.label THEN 1 ELSE 0 END AS BIGINT)
         AS moved
FROM embeddings e JOIN best b ON b.vec_id = e.vec_id AND b.rk = 1"""


def embedding_centroids_sql() -> str:
    return """
WITH el AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(range(len(embedding))) AS dim,
         unnest(embedding) AS x
  FROM embeddings)
SELECT label, CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS sum_q
FROM el GROUP BY label, dim"""



# --- round-5 maintenance split: the waves below live in sibling
# modules; this facade preserves the original import surface
# (`from ..pipelines import olap as OL`; tests import helpers too).
from .olap_events2 import *  # noqa: F401,F403
from .olap_sessions import *  # noqa: F401,F403
from .olap_warehouse import *  # noqa: F401,F403
from .olap_warehouse import _F445_CUM  # noqa: F401
from .olap_events2 import _MORTON_MASKS  # noqa: F401
from .olap_events2 import _kmeans_assign_ds  # noqa: F401
from .olap_events2 import _kmeans_cte_parts  # noqa: F401
from .olap_events2 import _spread_bits  # noqa: F401
