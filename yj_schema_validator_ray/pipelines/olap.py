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


# ---------------------------------------------------------------------------
# wide pivot (conditional aggregation)
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir: str):
    """PIVOT the event stream into one WIDE row per user: a count
    column per (pinned) event type plus the total — the long-to-wide
    conditional-aggregation reshape feeding feature stores.  The type
    list is pinned (a pivot's output schema must be static); unlisted
    types count only toward ``n_total``.

    Shape: per-batch crosstab partials (already wide, one row per user
    per batch) -> one keyed exact aggregate summing the wide columns.
    No row-grain data crosses the exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"], df["event_type"])
        ct = ct.reindex(columns=list(EVENT_TYPES), fill_value=0)
        out = ct.rename(columns={t: f"n_{t}" for t in EVENT_TYPES})
        out = out.reset_index()
        out["user_id"] = out["user_id"].astype("int64")
        for c in cols:
            out[c] = out[c].astype("int64")
        out["n_total"] = (df.groupby("user_id", sort=False).size()
                          .reindex(out["user_id"]).to_numpy()
                          .astype("int64"))
        return out

    return grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pandas"),
        ["user_id"],
        [(c, "sum", c) for c in cols] + [("n_total", "sum", "n_total")])


def events_type_pivot_sql() -> str:
    sel = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
        f" AS n_{t}" for t in EVENT_TYPES)
    return f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       {sel},
       CAST(count(*) AS BIGINT) AS n_total
FROM events GROUP BY user_id"""


# ---------------------------------------------------------------------------
# RFM segmentation (exact quintile scores over a derived aggregate)
# ---------------------------------------------------------------------------

def orders_rfm(sf_dir: str):
    """RFM customer segmentation: per customer, Recency (last order
    timestamp), Frequency (order count) and Monetary (lifetime cents),
    each scored 1-5 against the EXACT population quintiles of the
    derived per-customer aggregate — the classic warehouse
    segmentation, built from this engine's exact-quantile machinery
    (:func:`~..stages.quantiles.grouped_exact_quantiles`) applied to a
    DERIVED table instead of a base table.

    Shape: one keyed aggregate to customer grain (materialized — the
    quantile pass streams it twice), a long-format (metric, value)
    projection through the exact-quantile histogram plan (3x4
    thresholds -> broadcast), one stateless scoring scan.  Scores are
    ``1 + #(v > threshold)`` over doubles both engines derive
    identically, so the hash is exact.
    """
    import ray
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.quantiles import grouped_exact_quantiles
    from ..util import process_cached, ref_key

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                t.column("o_totalprice"), pa.scalar(100.0))), pa.int64()),
            "ts_us": pc.cast(t.column("o_orderdate"), pa.int64()),
        })

    per_cust = grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderdate"])
        .map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"],
        [("cents", "count", "n_orders"),
         ("cents", "sum", "monetary_cents"),
         ("ts_us", "max", "last_us")]).materialize()

    def long_form(t: pa.Table) -> pa.Table:
        n = t.num_rows
        v = np.concatenate([
            t.column("last_us").to_numpy().astype(np.float64),
            t.column("n_orders").to_numpy().astype(np.float64),
            t.column("monetary_cents").to_numpy().astype(np.float64)])
        metric = np.concatenate([np.full(n, "r", object),
                                 np.full(n, "f", object),
                                 np.full(n, "m", object)])
        return pa.table({"metric": pa.array(metric, pa.string()),
                         "v": pa.array(v, pa.float64())})

    qs = (0.2, 0.4, 0.6, 0.8)
    thr = grouped_exact_quantiles(
        per_cust.map_batches(long_form, batch_format="pyarrow"),
        "metric", "v", qs=qs).to_pandas()
    piv = thr.pivot_table(index="metric", columns="quantile",
                          values="value", aggfunc="max")
    mat = {m: piv.loc[m, list(qs)].to_numpy(dtype=np.float64)
           for m in piv.index}
    ref = ray.put(mat)

    class Score:
        def __init__(self, r):
            self.mat = ray.get(r)

        def _score(self, v: np.ndarray, metric: str) -> np.ndarray:
            th = self.mat[metric]
            return (1 + (v[:, None] > th[None, :]).sum(axis=1)) \
                .astype(np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            r = self._score(t.column("last_us").to_numpy()
                            .astype(np.float64), "r")
            f = self._score(t.column("n_orders").to_numpy()
                            .astype(np.float64), "f")
            m = self._score(t.column("monetary_cents").to_numpy()
                            .astype(np.float64), "m")
            return pa.table({
                "o_custkey": t.column("o_custkey"),
                "n_orders": t.column("n_orders"),
                "monetary_cents": t.column("monetary_cents"),
                "last_us": t.column("last_us"),
                "r_score": pa.array(r), "f_score": pa.array(f),
                "m_score": pa.array(m),
                "rfm_code": pa.array(100 * r + 10 * f + m),
            })

    return per_cust.map_batches(process_cached(Score, ref_key(ref), ref),
                                batch_format="pyarrow")


def orders_rfm_sql() -> str:
    def score(col, alias):
        cmps = " + ".join(
            f"(CASE WHEN c.{col} > p{alias}.t{i} THEN 1 ELSE 0 END)"
            for i in (1, 2, 3, 4))
        return f"CAST(1 + {cmps} AS BIGINT)"

    return f"""
WITH c AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS monetary_cents,
         CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS last_us
  FROM orders GROUP BY o_custkey),
m AS (
  SELECT 'r' AS metric, CAST(last_us AS DOUBLE) AS v FROM c
  UNION ALL SELECT 'f', CAST(n_orders AS DOUBLE) FROM c
  UNION ALL SELECT 'm', CAST(monetary_cents AS DOUBLE) FROM c),
s AS (
  SELECT metric, v,
         row_number() OVER (PARTITION BY metric ORDER BY v) AS rk,
         count(*) OVER (PARTITION BY metric) AS n
  FROM m),
q AS (SELECT CAST(unnest([0.2, 0.4, 0.6, 0.8]) AS DOUBLE) AS quantile),
thr AS (
  SELECT s.metric, q.quantile, s.v FROM q JOIN s
  ON s.rk = CAST(ceil(q.quantile * s.n) AS BIGINT)),
p AS (
  SELECT metric,
         max(CASE WHEN quantile = 0.2 THEN v END) AS t1,
         max(CASE WHEN quantile = 0.4 THEN v END) AS t2,
         max(CASE WHEN quantile = 0.6 THEN v END) AS t3,
         max(CASE WHEN quantile = 0.8 THEN v END) AS t4
  FROM thr GROUP BY metric)
SELECT c.o_custkey, c.n_orders, c.monetary_cents, c.last_us,
       {score('last_us', 'r')} AS r_score,
       {score('n_orders', 'f')} AS f_score,
       {score('monetary_cents', 'm')} AS m_score,
       CAST(100 * (1 + {" + ".join(f"(CASE WHEN c.last_us > pr.t{i} THEN 1 ELSE 0 END)" for i in (1, 2, 3, 4))})
          + 10 * (1 + {" + ".join(f"(CASE WHEN c.n_orders > pf.t{i} THEN 1 ELSE 0 END)" for i in (1, 2, 3, 4))})
          + (1 + {" + ".join(f"(CASE WHEN c.monetary_cents > pm.t{i} THEN 1 ELSE 0 END)" for i in (1, 2, 3, 4))})
            AS BIGINT) AS rfm_code
FROM c, p pr, p pf, p pm
WHERE pr.metric = 'r' AND pf.metric = 'f' AND pm.metric = 'm'"""


# ---------------------------------------------------------------------------
# band (non-equi temporal) self join: views in the hour before a purchase
# ---------------------------------------------------------------------------

def events_purchase_view_window(sf_dir: str, window_s: int = 3600,
                                coarse: int = 1024):
    """BAND JOIN: for every purchase, how many of the same user's view
    events fall in the hour before it ``[ts - W, ts)`` — the non-equi
    temporal join (attribution lookback) the equi-join operators can't
    express.  Unlike :func:`events_conversion_window` (first-view
    anchor, one row per user) this scores EVERY purchase against a
    sliding lookback.

    Shape: one user-keyed exchange; per partition both event streams
    sort once and the band is two vectorized ``searchsorted`` probes —
    O((P+V) log V) per user, never the P x V product.  Purchases with
    zero views are kept (LEFT semantics), matching the SQL.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    w_us = window_s * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        value_set=pa.array(["purchase", "view"]))
        t = t.filter(keep)
        user = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "user_id": user,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "is_p": pc.cast(pc.equal(t.column("event_type"),
                                     pa.scalar("purchase")), pa.int64()),
            "__coarse": pa.array(coarse_mix(user.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def band(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, u in g.groupby("user_id", sort=False):
            p = u[u["is_p"] == 1]
            if p.empty:
                continue
            vts = np.sort(u.loc[u["is_p"] == 0, "ts_us"]
                          .to_numpy(np.int64))
            pts = p["ts_us"].to_numpy(np.int64)
            n = (np.searchsorted(vts, pts, side="left")
                 - np.searchsorted(vts, pts - w_us, side="left"))
            outs.append(pd.DataFrame({
                "event_id": p["event_id"].to_numpy(np.int64),
                "user_id": p["user_id"].to_numpy(np.int64),
                "ts_us": pts,
                "n_views_1h": n.astype(np.int64)}))
        if not outs:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "ts_us": pd.Series(dtype="int64"),
                                 "n_views_1h": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return (ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("__coarse", num_partitions=shuffle_partitions())
        .map_groups(band, batch_format="pandas"))


def events_purchase_view_window_sql(window_s: int = 3600) -> str:
    return f"""
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       CAST(count(v.event_id) AS BIGINT) AS n_views_1h
FROM events p LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL {window_s} SECOND AND v.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts"""


# ---------------------------------------------------------------------------
# year-over-year growth (lag over an aggregated series)
# ---------------------------------------------------------------------------

def orders_yoy_growth(sf_dir: str):
    """Year-over-year revenue deltas per order priority: aggregate to
    the (priority, year) domain, then LAG within each priority's year
    series — the trend-report shape (growth emitted as the exact
    integer cent DIFFERENCE; a ratio would be fp).  First year of each
    priority has no predecessor and is dropped, like the SQL's
    ``WHERE prev IS NOT NULL``.

    Per-batch domain partials -> driver-side lag over the ~|priorities
    x years| series (domain-sized by construction)."""
    import ray.data

    from ..util import collect_small_arrow

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "o_year": pc.strftime(t.column("o_orderdate"), format="%Y"),
            "revenue_cents": pc.cast(pc.round(pc.multiply(
                t.column("o_totalprice"), pa.scalar(100.0))), pa.int64())})
        return (tt.group_by(["o_orderpriority", "o_year"])
                .aggregate([("revenue_cents", "sum")])
                .rename_columns(["o_orderpriority", "o_year",
                                 "revenue_cents"]))

    partials = collect_small_arrow(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderpriority", "o_orderdate",
                                       "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")).to_pandas()
    if partials.empty:
        return pd.DataFrame({
            "o_orderpriority": pd.Series(dtype="string"),
            "o_year": pd.Series(dtype="string"),
            "revenue_cents": pd.Series(dtype="int64"),
            "prev_cents": pd.Series(dtype="int64"),
            "yoy_diff_cents": pd.Series(dtype="int64")})
    y = (partials.groupby(["o_orderpriority", "o_year"], as_index=False)
         ["revenue_cents"].sum()
         .sort_values(["o_orderpriority", "o_year"]))
    y["prev_cents"] = (y.groupby("o_orderpriority", sort=False)
                       ["revenue_cents"].shift(1))
    y = y[y["prev_cents"].notna()].copy()
    y["revenue_cents"] = y["revenue_cents"].astype("int64")
    y["prev_cents"] = y["prev_cents"].astype("int64")
    y["yoy_diff_cents"] = (y["revenue_cents"]
                           - y["prev_cents"]).astype("int64")
    return y.reset_index(drop=True)


def orders_yoy_growth_sql() -> str:
    return """
WITH y AS (
  SELECT o_orderpriority, strftime(o_orderdate, '%Y') AS o_year,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1, 2),
l AS (
  SELECT *, lag(revenue_cents) OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_year) AS prev_cents
  FROM y)
SELECT o_orderpriority, o_year, revenue_cents,
       CAST(prev_cents AS BIGINT) AS prev_cents,
       CAST(revenue_cents - prev_cents AS BIGINT) AS yoy_diff_cents
FROM l WHERE prev_cents IS NOT NULL"""


# ---------------------------------------------------------------------------
# multi-round k-means (unrolled Lloyd iterations, SQL-oracled end-to-end)
# ---------------------------------------------------------------------------

def embedding_kmeans(sf_dir: str, rounds: int = 3):
    """FULL k-means refinement loop: ``rounds`` exact Lloyd iterations
    (centroids of the current assignment -> nearest-centroid
    re-assignment), the iterative-ML-training-loop shape
    (:func:`embedding_lloyd_step` is one round; this drives the loop
    with per-round re-materialization bounding the lineage, the
    :mod:`..stages.pagerank` discipline).  The whole trajectory is
    bit-checkable: the fixed-point arithmetic contract of the single
    step holds every round, and the oracle unrolls the same ``rounds``
    CTE chain.

    A cluster that loses all members simply disappears from the next
    round's centroid set (both engines derive this identically).

    Shape per round: zero-shuffle (label x dim) int64 partial sums ->
    driver-collected k x d centroid matrix (tiny at any corpus size)
    -> broadcast argmin re-assignment scan.  Vectors never cross an
    exchange; only the assignment column changes per round.

    Output per vector: (vec_id, label_init, label_final, moved).
    """
    cur = _kmeans_assign_ds(sf_dir, rounds)

    def finish(t: pa.Table) -> pa.Table:
        init = t.column("label_init")
        fin = t.column("label")
        return pa.table({
            "vec_id": t.column("vec_id"),
            "label_init": init,
            "label_final": fin,
            "moved": pc.cast(pc.not_equal(fin, init), pa.int64())})

    return cur.map_batches(finish, batch_format="pyarrow")


def _kmeans_assign_ds(sf_dir: str, rounds: int):
    """Shared Lloyd driver: returns the post-``rounds`` assignment
    Dataset (vec_id, embedding, label_init, label) — the engine half of
    the unrolled-CTE oracle contract (:func:`_kmeans_cte_parts`)."""
    import ray
    import ray.data

    from ..stages.ann import _list_f64_matrix
    from ..util import collect_small_arrow, process_cached, ref_key

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": pc.cast(t.column("vec_id"), pa.int64()),
            "embedding": t.column("embedding"),
            "label_init": pc.cast(t.column("label"), pa.int64()),
            "label": pc.cast(t.column("label"), pa.int64())})

    cur = (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding", "label"])
           .map_batches(prep, batch_format="pyarrow")).materialize()

    def cent_partial(t: pa.Table) -> pa.Table:
        xq = np.floor(_list_f64_matrix(t.column("embedding"))
                      * 1e6 + 0.5).astype(np.int64)
        lbl = t.column("label").to_numpy()
        labels, inv = np.unique(lbl, return_inverse=True)
        k, d = len(labels), xq.shape[1]
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, inv, xq)
        ns = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(labels, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "sum_q": pa.array(sums.reshape(-1)),
            "n_vecs": pa.array(np.repeat(ns, d)),
        })

    for _ in range(rounds):
        cdf = collect_small_arrow(
            cur.map_batches(cent_partial,
                            batch_format="pyarrow")).to_pandas()
        cdf = (cdf.groupby(["label", "dim"], as_index=False)
               [["sum_q", "n_vecs"]].sum().sort_values(["label", "dim"]))
        labels = np.sort(cdf["label"].unique())
        d = int(cdf["dim"].max()) + 1
        sums = cdf["sum_q"].to_numpy(np.int64).reshape(len(labels), d)
        ns = (cdf.groupby("label", sort=True)["n_vecs"].first()
              .to_numpy(np.int64))
        m = np.sign(sums) * (np.abs(sums) // ns[:, None])
        ref = ray.put((labels, m))

        class Assign:
            def __init__(self, r):
                self.labels, self.m = ray.get(r)

            def __call__(self, t: pa.Table) -> pa.Table:
                xq = np.floor(_list_f64_matrix(t.column("embedding"))
                              * 1e6 + 0.5).astype(np.int64)
                dist = ((xq[:, None, :].astype(np.int64)
                         - self.m[None, :, :]) ** 2).sum(axis=2)
                best = np.argmin(dist, axis=1)
                return pa.table({
                    "vec_id": t.column("vec_id"),
                    "embedding": t.column("embedding"),
                    "label_init": t.column("label_init"),
                    "label": pa.array(self.labels[best], pa.int64())})

        cur = cur.map_batches(
            process_cached(Assign, ref_key(ref), ref),
            batch_format="pyarrow", batch_size=1024).materialize()

    return cur


def embedding_kmeans_sql(rounds: int = 3) -> str:
    """Oracle: the same ``rounds``-step Lloyd chain unrolled as CTEs
    (the :func:`..stages.pagerank.trade_pagerank` unrolled-oracle
    technique applied to k-means)."""
    parts = _kmeans_cte_parts(rounds)
    return f"""
WITH {", ".join(parts)}
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(e.label AS BIGINT) AS label_init,
       a.label AS label_final,
       CAST(CASE WHEN a.label <> e.label THEN 1 ELSE 0 END AS BIGINT)
         AS moved
FROM embeddings e JOIN a{rounds} a USING (vec_id)"""


def _kmeans_cte_parts(rounds: int) -> list:
    """The unrolled Lloyd CTE chain (a0 .. a{rounds}) shared by the
    k-means and SemDeDup oracles."""
    parts = ["""el AS (
  SELECT vec_id, unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings),
a0 AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""c{r} AS (
  SELECT a.label, e.dim, CAST(sum(e.xq) // count(*) AS BIGINT) AS m
  FROM el e JOIN a{r - 1} a USING (vec_id) GROUP BY a.label, e.dim),
d{r} AS (
  SELECT e.vec_id, c.label AS cand,
         CAST(sum((e.xq - c.m) * (e.xq - c.m)) AS BIGINT) AS d2
  FROM el e JOIN c{r} c ON c.dim = e.dim GROUP BY e.vec_id, c.label),
a{r} AS (
  SELECT vec_id, cand AS label FROM (
    SELECT vec_id, cand,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cand) AS rk
    FROM d{r}) WHERE rk = 1)""")
    return parts


# ---------------------------------------------------------------------------
# trailing-window exact distinct (rolling COUNT(DISTINCT) OVER a day range)
# ---------------------------------------------------------------------------

def events_rolling_distinct(sf_dir: str, window_days: int = 7):
    """Exact trailing-``window_days`` distinct active users per day
    (the rolling COUNT(DISTINCT) the MA-of-DAU series approximates):
    a user is active on day d if they had ANY event in
    [d - window_days + 1, d].

    Distributed shape — rolling distinct does NOT decompose as a
    windowed sum of per-day distincts, but each user's activity
    coverage is a union of equal-length intervals, so it becomes the
    :func:`orders_open_per_day` boundary sweep run per user:

    1. one user-keyed coarse exchange of deduped int64 (user, day)
       pairs (per-batch dedup first; text never moves);
    2. inside each co-located group, a vectorized chain scan merges
       each user's overlapping coverage intervals and emits +-1
       boundary rows (equal interval lengths make chain ends monotone,
       so the scan is one shift-compare, no loop);
    3. the day-domain boundary histogram is one exact aggregate and
       the running sum over the day DOMAIN is driver math.

    Days with zero active users inside [first, last] event day are
    emitted with n_active = 0 (LEFT JOIN semantics in the oracle).
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow, shuffle_partitions

    US_PER_DAY = 86_400_000_000
    W = int(window_days)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("user_id"), pa.int64())
        day = pc.cast(pc.divide(pc.cast(t.column("ts"), pa.int64()),
                                pa.scalar(US_PER_DAY, pa.int64())),
                      pa.int64())
        dd = (pa.table({"u": u, "day": day})
              .group_by(["u", "day"]).aggregate([]))
        un = dd.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        return dd.append_column(
            "__coarse", pa.array(coarse_mix(un), pa.int64()))

    def boundaries(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["u", "day"])
             .sort_values(["u", "day"], kind="mergesort"))
        u = g["u"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        # coverage of one event day is [day, day + W - 1]; within a
        # user, a new chain starts when the gap leaves the coverage
        brk = np.ones(len(u), bool)
        if len(u) > 1:
            brk[1:] = (u[1:] != u[:-1]) | (day[1:] - day[:-1] >= W)
        last = np.roll(brk, -1)
        if len(u):
            last[-1] = True
        return pd.DataFrame({
            "day": np.concatenate([day[brk], day[last] + W]),
            "d": np.concatenate([
                np.ones(int(brk.sum()), np.int64),
                np.full(int(last.sum()), -1, np.int64)])})

    hist = collect_small_arrow(grouped_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__coarse", num_partitions=shuffle_partitions())
        .map_groups(boundaries, batch_format="pandas"),
        ["day"], [("d", "sum", "delta")])).to_pandas()

    hist = hist.sort_values("day").reset_index(drop=True)
    lo = int(hist["day"].iloc[0])            # min start = first event day
    hi = int(hist["day"].iloc[-1]) - W       # max end - W = last event day
    full = pd.DataFrame({"day": np.arange(lo, hi + 1, dtype=np.int64)})
    full = full.merge(hist, on="day", how="left")
    full["n_active"] = (full["delta"].fillna(0).astype("int64")
                        .cumsum().astype("int64"))
    return full[["day", "n_active"]]


def events_rolling_distinct_sql(window_days: int = 7) -> str:
    return f"""
WITH ev AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events),
days AS (
  SELECT unnest(range((SELECT min(day) FROM ev),
                      (SELECT max(day) + 1 FROM ev))) AS day)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(count(DISTINCT e.u) AS BIGINT) AS n_active
FROM days d LEFT JOIN ev e
  ON e.day BETWEEN d.day - {int(window_days) - 1} AND d.day
GROUP BY d.day"""


# ---------------------------------------------------------------------------
# market-basket pair support (frequent co-purchased item pairs)
# ---------------------------------------------------------------------------

def basket_pairs(sf_dir: str, min_support: int = 2, max_basket: int = 32):
    """Co-purchase pair mining (the Apriori/market-basket first pass):
    for every unordered part pair {p1 < p2}, in how many orders do both
    appear — keeping pairs with support >= ``min_support``.

    Shape: the within-group self-join.  One order-keyed coarse exchange
    of int64 (order, part) pairs co-locates each basket; pair expansion
    is a fully-vectorized grouped-arange gather (no per-basket Python),
    quadratic only in basket size, which is HARD-BOUNDED: baskets with
    more than ``max_basket`` distinct parts are dropped, and the oracle
    mirrors the drop — the documented guard against pathological
    mega-baskets at scale (same discipline as the LSH bucket cap).
    Pair-domain partial counts cross one exact aggregate; the support
    gate is a post-aggregate filter.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])

    def prep(t: pa.Table) -> pa.Table:
        dd = (pa.table({
            "o": pc.cast(t.column("l_orderkey"), pa.int64()),
            "p": pc.cast(t.column("l_partkey"), pa.int64())})
            .group_by(["o", "p"]).aggregate([]))
        on = dd.column("o").to_numpy(zero_copy_only=False).astype(np.int64)
        return dd.append_column(
            "__coarse", pa.array(coarse_mix(on), pa.int64()))

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["o", "p"])
             .sort_values(["o", "p"], kind="mergesort"))
        o = g["o"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        # basket sizes + within-basket positions, vectorized
        brk = np.ones(len(o), bool)
        brk[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, len(o)))
        keep = sizes <= max_basket
        size_per_row = np.repeat(sizes, sizes)
        pos = np.arange(len(o)) - np.repeat(starts, sizes)
        row_keep = np.repeat(keep, sizes)
        rep = np.where(row_keep, size_per_row - 1 - pos, 0)
        total = int(rep.sum())
        if total == 0:
            return pd.DataFrame({"p1": np.empty(0, np.int64),
                                 "p2": np.empty(0, np.int64),
                                 "support": np.empty(0, np.int64)})
        ends = rep.cumsum()
        inc = np.arange(total) - np.repeat(ends - rep, rep)
        p1 = np.repeat(p, rep)
        p2 = p[np.repeat(np.arange(len(p)) + 1, rep) + inc]
        out = (pd.DataFrame({"p1": p1, "p2": p2})
               .groupby(["p1", "p2"], sort=False).size()
               .rename("support").reset_index())
        out["support"] = out["support"].astype("int64")
        return out

    agg = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__coarse", num_partitions=shuffle_partitions())
        .map_groups(expand, batch_format="pandas"),
        ["p1", "p2"], [("support", "sum", "support")])

    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t.column("support"), pa.scalar(min_support, pa.int64()))),
        batch_format="pyarrow")


def basket_pairs_sql(min_support: int = 2, max_basket: int = 32) -> str:
    return f"""
WITH basket AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o,
                  CAST(l_partkey AS BIGINT) AS p
  FROM lineitem),
sized AS (
  SELECT o FROM basket GROUP BY o HAVING count(*) <= {int(max_basket)})
SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS support
FROM basket a
JOIN basket b ON a.o = b.o AND a.p < b.p
JOIN sized s ON s.o = a.o
GROUP BY a.p, b.p
HAVING count(*) >= {int(min_support)}"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt — the wide-to-long inverse of the type pivot
# ---------------------------------------------------------------------------

def events_unpivot(sf_dir: str):
    """Melt the wide per-user type pivot back to long (user_id,
    event_type, n) rows, dropping zero cells — the UNPIVOT reshape.
    Composed as pivot -> melt so the oracle (a direct GROUP BY over
    the pinned type list) certifies the round trip: melt(pivot(x)) ==
    groupby(x).  The melt is a pure per-batch reshape (no exchange on
    top of the pivot's)."""
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=["user_id"], value_vars=cols,
                      var_name="event_type", value_name="n")
        out = out[out["n"] > 0].reset_index(drop=True)
        out["event_type"] = out["event_type"].str.slice(2)
        out["user_id"] = out["user_id"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "event_type", "n"]]

    return events_type_pivot(sf_dir).map_batches(
        melt, batch_format="pandas")


def events_unpivot_sql() -> str:
    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    return f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type IN ({types})
GROUP BY user_id, event_type"""


# ---------------------------------------------------------------------------
# gaps-and-islands: per-user consecutive-day activity streaks
# ---------------------------------------------------------------------------

def events_user_streaks(sf_dir: str):
    """Per-user consecutive-day activity streaks (the classic
    gaps-and-islands shape): longest streak, total active days, and
    number of distinct streaks.

    Distributed shape: per-batch (user, day) dedup prunes the exchange
    to at most one int64 pair per user-day, ONE user-keyed coarse
    exchange co-locates each user, and inside each group a single
    sorted shift-compare marks island breaks (``diff != 1``) — run
    lengths fall out of the break positions with no Python loop.  The
    output is user-domain sized; nothing collects on the driver.

    Reference analogue: none (warehouse canon; same family as
    :func:`events_rolling_distinct`'s interval sweep).
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    US_PER_DAY = 86_400_000_000

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("user_id"), pa.int64())
        day = pc.cast(pc.divide(pc.cast(t.column("ts"), pa.int64()),
                                pa.scalar(US_PER_DAY, pa.int64())),
                      pa.int64())
        dd = (pa.table({"user_id": u, "day": day})
              .group_by(["user_id", "day"]).aggregate([]))
        un = dd.column("user_id").to_numpy(zero_copy_only=False)
        return dd.append_column(
            "__coarse",
            pa.array(coarse_mix(un.astype(np.int64)), pa.int64()))

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["user_id", "day"])
             .sort_values(["user_id", "day"], kind="mergesort"))
        u = g["user_id"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        n = len(u)
        if n == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "longest_streak": pd.Series(dtype="int64"),
                "n_active_days": pd.Series(dtype="int64"),
                "n_streaks": pd.Series(dtype="int64")})
        brk = np.ones(n, bool)
        brk[1:] = (u[1:] != u[:-1]) | (day[1:] - day[:-1] != 1)
        starts = np.flatnonzero(brk)
        run_len = np.diff(np.concatenate((starts, [n])))
        run_user = u[starts]
        df = pd.DataFrame({"user_id": run_user, "len": run_len})
        out = (df.groupby("user_id", sort=False)
               .agg(longest_streak=("len", "max"),
                    n_active_days=("len", "sum"),
                    n_streaks=("len", "size"))
               .reset_index())
        for c in ("longest_streak", "n_active_days", "n_streaks"):
            out[c] = out[c].astype("int64")
        return out

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(streaks, batch_format="pandas"))


def events_user_streaks_sql() -> str:
    return """
WITH days AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events),
isl AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days),
runs AS (
  SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY user_id"""


# ---------------------------------------------------------------------------
# Z-order (Morton) layout clustering over two int dimensions
# ---------------------------------------------------------------------------

_MORTON_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Interleave-ready 31-bit spread (uint64, bits land on even
    positions) — the standard mask cascade, fully vectorized."""
    x = x.astype(np.uint64)
    for sh, mask in _MORTON_MASKS:
        x = (x | (x << np.uint64(sh))) & np.uint64(mask)
    return x


def lineitem_zorder_stats(sf_dir: str, shift: int = 16):
    """Z-ORDER layout clustering certificate: Morton-interleave
    ``(l_partkey, l_suppkey)``, bucket rows by the top Morton bits
    (``morton >> shift``), and report each bucket's row count and
    bounding box over BOTH dimensions.

    This is the data-layout primitive behind multi-dimensional scan
    pruning at 100 TB (Delta/Iceberg ``ZORDER BY``): writing files in
    Morton-bucket order makes per-file min/max stats tight on EVERY
    interleaved column at once, so predicates on either key prune
    files.  The per-bucket bbox output IS the pruning index a writer
    would persist.  Engine shape: the Morton code is five mask-shift
    steps on the raw int64 Arrow buffers (zero Python per row), bucket
    stats are one :func:`~..stages.exact_agg.grouped_aggregate`
    exchange of 5-column int64 partials; nothing driver-side.  Keys are
    guarded to [0, 2^31) — wider keys need a wider-spread variant.

    Reference analogue: none (lakehouse layout canon; Morton 1966).
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])

    def add_bucket(t: pa.Table) -> pa.Table:
        x = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(x) and (x.min() < 0 or y.min() < 0
                       or max(x.max(), y.max()) >= (1 << 31)):
            raise ValueError(
                "lineitem_zorder_stats: keys outside [0, 2^31) — widen "
                "the Morton spread before bucketing")
        morton = (_spread_bits(x) | (_spread_bits(y) << np.uint64(1)))
        return pa.table({
            "bucket": pa.array((morton >> np.uint64(shift)).astype(np.int64),
                               pa.int64()),
            "part": pa.array(x, pa.int64()),
            "supp": pa.array(y, pa.int64()),
        })

    return grouped_aggregate(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        ["bucket"],
        [("part", "count", "n_rows"),
         ("part", "min", "min_part"), ("part", "max", "max_part"),
         ("supp", "min", "min_supp"), ("supp", "max", "max_supp")])


def lineitem_zorder_stats_sql(shift: int = 16) -> str:
    """Oracle: the identical mask cascade in BIGINT bit ops."""
    def spread(col: str) -> str:
        e = col
        for sh, mask in _MORTON_MASKS:
            e = f"(({e} | ({e} << {sh})) & {mask})"
        return e

    return f"""
WITH src AS (
  SELECT CAST(l_partkey AS BIGINT) AS part,
         CAST(l_suppkey AS BIGINT) AS supp
  FROM lineitem),
m AS (
  SELECT part, supp,
         ({spread('part')} | ({spread('supp')} << 1)) >> {shift} AS bucket
  FROM src)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(part) AS BIGINT) AS min_part,
       CAST(max(part) AS BIGINT) AS max_part,
       CAST(min(supp) AS BIGINT) AS min_supp,
       CAST(max(supp) AS BIGINT) AS max_supp
FROM m GROUP BY bucket"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup = k-means clusters -> within-cluster cosine prune
# ---------------------------------------------------------------------------

def semdedup(sf_dir: str, rounds: int = 2, threshold: float = 0.4):
    """SemDeDup (Abbas et al., 2023): semantic deduplication by
    clustering the embedding space with k-means and pruning, WITHIN
    each cluster, every vector that has a higher-similarity twin —
    keep-lowest-``vec_id`` is the deterministic representative rule.
    The quadratic pair scan is confined to one cluster (the paper's
    entire point: k scales the within-cluster work down as the corpus
    grows), so the global shape is linear + per-cluster tiles.

    Shape: ``rounds`` exact fixed-point Lloyd iterations (the shared
    :func:`_kmeans_assign_ds` driver — zero-shuffle int64 centroid
    partials, broadcast argmin scans) -> ONE cluster-keyed exchange of
    (vec_id, embedding) -> per-cluster ascending-``vec_id`` tile
    matmuls that OR a "has an earlier twin" flag per vector; vectors
    never reach the driver and no pair list materializes (the flag is
    the output).  ``sim`` uses f64 cosine with the same >= threshold
    test as :func:`..stages.ann.embedding_dup_pairs` (driver-green
    precedent for cross-engine f64 determinism at this rounding).

    Output per vector: (vec_id, cluster, pruned).  The default
    threshold is tuned to this corpus (synthetic 16-dim embeddings are
    near-random: max within-cluster cosine ~0.47, so the paper's ~0.99
    web-dedup setting would prune nothing); production corpora with
    real semantic twins use the high setting.
    """
    from ..stages.ann import _list_f64_matrix, _normalize
    from ..util import shuffle_partitions

    cur = _kmeans_assign_ds(sf_dir, rounds)

    def strip(t: pa.Table) -> pa.Table:
        return pa.table({
            "cluster": t.column("label"),
            "vec_id": t.column("vec_id"),
            "embedding": t.column("embedding")})

    def prune_cluster(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "pruned": pa.array([], pa.bool_())})
        ids = g.column("vec_id").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        cluster = g.column("cluster").to_numpy()[order]
        M = _normalize(_list_f64_matrix(g.column("embedding"))[order])
        pruned = np.zeros(n, bool)
        B = 4096
        for cs in range(0, n, B):          # column tile = candidate j
            ce = min(cs + B, n)
            for rs in range(0, ce, B):     # row tile = earlier i (i < j)
                re_ = min(rs + B, ce)
                sims = M[rs:re_] @ M[cs:ce].T
                if rs == cs:
                    sims[np.tril_indices(re_ - rs, k=0, m=ce - cs)] = -2.0
                hit = (sims >= threshold).any(axis=0)
                pruned[cs:ce] |= hit
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(cluster, pa.int64()),
                         "pruned": pa.array(pruned)})

    return (cur.map_batches(strip, batch_format="pyarrow")
            .groupby("cluster",
                     num_partitions=min(64, shuffle_partitions()))
            .map_groups(prune_cluster, batch_format="pyarrow"))


def semdedup_sql(rounds: int = 2, threshold: float = 0.4) -> str:
    parts = _kmeans_cte_parts(rounds)
    return f"""
WITH {", ".join(parts)},
asg AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id, a.label AS cluster,
         e.embedding
  FROM embeddings e JOIN a{rounds} a USING (vec_id)),
twins AS (
  SELECT DISTINCT b.vec_id
  FROM asg a JOIN asg b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[]))
        >= {threshold})
SELECT asg.vec_id, asg.cluster, (t.vec_id IS NOT NULL) AS pruned
FROM asg LEFT JOIN twins t USING (vec_id)"""


def lang_source_share(sf_dir: str):
    """Ratio-to-report window: per (source, lang), the doc count and its
    share of the source's total in integer BASIS POINTS
    (``n * 10000 // source_total`` — floor division both sides, so the
    value hash is fp-free).  The mixture-dashboard number every feed
    report opens with.

    Shape: one (source, lang)-keyed count exchange; the share division
    runs on the collected domain-sized (sources x langs) table."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang"])
    c = collect_small_arrow(grouped_aggregate(
        ds, ["source", "lang"], [("", "count", "n_docs")])).to_pandas()
    tot = c.groupby("source")["n_docs"].transform("sum").to_numpy()
    c["share_bp"] = (c["n_docs"].to_numpy(np.int64) * 10000) // tot
    c["share_bp"] = c["share_bp"].astype("int64")
    return pa.Table.from_pandas(c, preserve_index=False)


def lang_source_share_sql() -> str:
    return """
WITH c AS (SELECT source, lang, count(*) AS n
           FROM documents GROUP BY 1, 2)
SELECT source, lang, CAST(n AS BIGINT) AS n_docs,
       CAST((n * 10000) // SUM(n) OVER (PARTITION BY source) AS BIGINT)
         AS share_bp
FROM c"""


def events_burst_days(sf_dir: str, z: int = 2):
    """Burst detection on the aggregated daily series: per event type,
    flag days whose count exceeds mean + ``z`` sigma of that type's
    own daily distribution.  The test is evaluated in EXACT integers —
    ``n*D - S > 0 and (n*D - S)^2 > z^2 * (D*Q - S^2)`` with D=#days,
    S=sum, Q=sum of squares — Python ints on the engine side, HUGEINT
    in the oracle, so no sqrt/fp enters the certificate (the
    count-series companion to the value-level MAD gate in
    ``events_mad_outliers``).

    Shape: one (type, day)-keyed count exchange; the flagging runs on
    the collected day-domain series (calendar-bounded at any scale)."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"event_type": t.column("event_type"),
                         "day": day})

    d = collect_small_arrow(grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["event_type", "day"], [("", "count", "n_events")])).to_pandas()
    flags = []
    for _, g in d.groupby("event_type", sort=False):
        n = [int(v) for v in g["n_events"]]   # Python ints: no overflow
        D, S, Q = len(n), sum(n), sum(v * v for v in n)
        var_term = D * Q - S * S
        flags.append(pd.Series(
            [(v * D - S) > 0 and (v * D - S) ** 2 > z * z * var_term
             for v in n], index=g.index))
    d["is_burst"] = pd.concat(flags).sort_index()
    d["n_events"] = d["n_events"].astype("int64")
    return pa.Table.from_pandas(d, preserve_index=False)


def events_burst_days_sql(z: int = 2) -> str:
    return f"""
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2),
s AS (SELECT event_type, COUNT(*) AS nd, SUM(n) AS sn, SUM(n * n) AS qn
      FROM d GROUP BY event_type)
SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n_events,
       (d.n * s.nd - s.sn > 0 AND
        (d.n * s.nd - s.sn) * (d.n * s.nd - s.sn)
          > {z * z} * (s.nd * s.qn - s.sn * s.sn)) AS is_burst
FROM d JOIN s USING (event_type)"""


def events_active_coverage(sf_dir: str, window_s: int = 300):
    """Interval-UNION coverage per user: pad every event to a
    [ts, ts+window) activity interval and report how much wall-clock
    each user's union of intervals covers (plus how many disjoint
    merged intervals it falls into) — total-active-time accounting,
    where naive SUM double-counts every overlap.

    Distributed shape: one user-keyed coarse exchange of (user, ts)
    int64 pairs; inside each group the merge is the classic sweep done
    with vectorized pandas segment ops (per-user cummax of interval
    ends -> island breaks where the next start clears the running max
    -> per-island max(end) - min(start)).  Outputs are exact integer
    MICROSECONDS (epoch_us both sides), so no fp enters the hash."""
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    w_us = window_s * 1_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("user_id"), pa.int64())
        ts = pc.cast(t.column("ts"), pa.int64())
        un = u.to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": u, "ts": ts,
            "__coarse": pa.array(coarse_mix(un.astype(np.int64)),
                                 pa.int64())})

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_intervals": pd.Series(dtype="int64"),
                                 "covered_us": pd.Series(dtype="int64")})
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts = g["ts"].to_numpy(np.int64)
        te = ts + w_us
        u = g["user_id"]
        prev_max = pd.Series(te).groupby(u.to_numpy()).cummax() \
            .groupby(u.to_numpy()).shift(1)
        new_island = (~(ts <= prev_max.to_numpy())) \
            | prev_max.isna().to_numpy()
        island = np.cumsum(new_island)
        df = pd.DataFrame({"user_id": u.to_numpy(np.int64),
                           "island": island, "ts": ts, "te": te})
        per_isl = df.groupby(["user_id", "island"], sort=False).agg(
            s=("ts", "min"), t=("te", "max"))
        out = (per_isl.assign(c=per_isl["t"] - per_isl["s"])
               .groupby("user_id", sort=False)
               .agg(n_intervals=("c", "size"), covered_us=("c", "sum"))
               .reset_index())
        out["n_intervals"] = out["n_intervals"].astype("int64")
        out["covered_us"] = out["covered_us"].astype("int64")
        return out

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(sweep, batch_format="pandas"))


def events_active_coverage_sql(window_s: int = 300) -> str:
    return f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, ts,
         ts + INTERVAL {window_s} SECOND AS te
  FROM events),
m AS (
  SELECT user_id, ts, te,
         CASE WHEN ts <= max(te) OVER (PARTITION BY user_id
                   ORDER BY ts, te
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS ni
  FROM e),
g AS (SELECT user_id, ts, te,
             SUM(ni) OVER (PARTITION BY user_id ORDER BY ts, te) AS isl
      FROM m),
i AS (SELECT user_id, isl, min(ts) AS s, max(te) AS t
      FROM g GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(SUM(epoch_us(t - s)) AS BIGINT) AS covered_us
FROM i GROUP BY user_id"""


def events_benford(sf_dir: str):
    """Benford's-law first-digit audit over the value column — the
    classic fabricated-numbers screen.  The digit is extracted from
    the EXACT integer cents (``round(value*100)``), first character of
    the int's decimal string — identical int-to-string on both sides,
    no log10 (whose IEEE results at powers of ten differ between
    libraries).  Non-positive amounts are excluded on both sides.
    Output (digit, n) exact; the Benford deviation stat stays
    downstream where fp is allowed.  One fixed-width (9-row) count
    exchange."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])

    def digits(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t.column("value"),
                                         pa.scalar(100.0))), pa.int64())
        c = c.to_numpy(zero_copy_only=False)
        c = c[c > 0]
        # first decimal digit: digit count via log-free integer divide
        d = c.copy()
        d[d >= 10**15] //= 10**15
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        return pa.table({"digit": pa.array(d, pa.int64())})

    return grouped_aggregate(
        ds.map_batches(digits, batch_format="pyarrow"),
        ["digit"], [("", "count", "n")])


def events_benford_sql() -> str:
    return """
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
d AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE c > 0)
SELECT digit, CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY digit"""


def user_activity_gini(sf_dir: str):
    """Concentration-of-activity audit: the exact integer Gini
    numerator over per-user event counts — ``sum((2r - n - 1) * x_r)``
    with rank ``r`` ascending by (count, user_id) — reported with
    ``n_users`` and ``sum_events`` so the [0,1] Gini ratio stays
    downstream where fp is allowed.  Ties don't matter: permuting
    equal counts inside a tie block leaves the sum unchanged, so the
    deterministic id tie-break is merely reproducibility.

    Shape: per-user counts (one keyed exchange) ->
    :func:`~..stages.rank.global_rank` (histogram-offset ranking, no
    global sort) -> per-block (sum rx, sum x, n) partials -> one tiny
    driver combine using Python ints (the r*x sum is the one term that
    could outgrow int64 at extreme scale)."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.rank import global_rank
    from ..util import collect_small_arrow

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    # alias "x" (not "n"): global_rank's internal histogram uses "n"
    counts = grouped_aggregate(ev, ["user_id"], [("", "count", "x")])
    ranked = global_rank(counts, key_col="x", id_col="user_id",
                         descending=False)

    def partial(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy()
        x = t.column("x").to_numpy()
        return pa.table({
            "n_users": pa.array([t.num_rows], pa.int64()),
            "sum_x": pa.array([int(x.sum())], pa.int64()),
            "sum_rx": pa.array([int((r * x).sum())], pa.int64())})

    s = collect_small_arrow(ranked.map_batches(
        partial, batch_format="pyarrow")).to_pandas().sum()
    n, sx, srx = int(s.n_users), int(s.sum_x), int(s.sum_rx)
    gini_num = 2 * srx - (n + 1) * sx
    return pd.DataFrame({
        "n_users": pd.Series([n], dtype="int64"),
        "sum_events": pd.Series([sx], dtype="int64"),
        "gini_num": pd.Series([gini_num], dtype="int64")})


def user_activity_gini_sql() -> str:
    return """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
r AS (SELECT n,
             row_number() OVER (ORDER BY n ASC, user_id ASC) AS rk,
             count(*) OVER () AS nu,
             SUM(n) OVER () AS sx
      FROM c)
SELECT CAST(ANY_VALUE(nu) AS BIGINT) AS n_users,
       CAST(ANY_VALUE(sx) AS BIGINT) AS sum_events,
       CAST(2 * SUM(rk * n) - (ANY_VALUE(nu) + 1) * ANY_VALUE(sx)
            AS BIGINT) AS gini_num
FROM r"""


def orders_allen_intervals(sf_dir: str, coarse: int = 1024):
    """Allen's interval-algebra audit: classify every lineitem's ship
    window against its parent order's fulfillment window into the 13
    mutually-exclusive Allen relations and count each — the temporal
    conformance profile (how shipping activity sits inside the promised
    window) and the algebra layer under as-of / range joins.

    Intervals in exact integer DAYS (timestamps are midnight-aligned):
    order window a = [orderdate, orderdate + 30]; ship window
    b = [shipdate, shipdate + (linenumber % 7) + 1] (the deterministic
    width stands in for the absent receiptdate column).

    Shape: the standard order-grain pattern — lineitem rows carry only
    (orderkey, b1, b2) int64 triples through one coarse-hash exchange
    to meet the orders side's (orderkey, a1) rows; the per-bucket
    classify is pure vectorized numpy; output is <= 13 rows.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    DAY_US = 86_400_000_000

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        a1 = pc.divide(pc.cast(t.column("o_orderdate"), pa.int64()),
                       pa.scalar(DAY_US, pa.int64()))
        n = t.num_rows
        return pa.table({
            "okey": keys, "x1": a1,
            "x2": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def li_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("l_orderkey"), pa.int64())
        b1 = pc.divide(pc.cast(t.column("l_shipdate"), pa.int64()),
                       pa.scalar(DAY_US, pa.int64())).to_numpy()
        width = pc.cast(t.column("l_linenumber"), pa.int64()).to_numpy() % 7 + 1
        return pa.table({
            "okey": keys,
            "x1": pa.array(b1, pa.int64()),
            "x2": pa.array(b1 + width, pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    REL = ["equals", "before", "meets", "overlaps", "starts", "during",
           "finishes", "after", "met_by", "overlapped_by", "started_by",
           "contains", "finished_by"]

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or not (g["side"] == 1).any():
            return pd.DataFrame({"relation": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        o = g.loc[g["side"] == 0, ["okey", "x1"]].rename(
            columns={"x1": "a1"})
        li = g.loc[g["side"] == 1, ["okey", "x1", "x2"]].rename(
            columns={"x1": "b1", "x2": "b2"})
        j = li.merge(o, on="okey", how="inner")
        a1 = j["a1"].to_numpy()
        a2 = a1 + 30
        b1, b2 = j["b1"].to_numpy(), j["b2"].to_numpy()
        code = np.select(
            [(b1 == a1) & (b2 == a2), b2 < a1, b2 == a1,
             (b1 < a1) & (b2 > a1) & (b2 < a2), (b1 == a1) & (b2 < a2),
             (b1 > a1) & (b2 < a2), (b2 == a2) & (b1 > a1), b1 > a2,
             b1 == a2, (b1 > a1) & (b1 < a2) & (b2 > a2),
             (b1 == a1) & (b2 > a2), (b1 < a1) & (b2 > a2),
             (b2 == a2) & (b1 < a1)],
            np.arange(13), default=-1)
        cnt = np.bincount(code, minlength=13)
        keep = cnt > 0
        return pd.DataFrame({
            "relation": [r for r, k in zip(REL, keep) if k],
            "n": cnt[keep].astype("int64")})

    o = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_orderdate"])
         .map_batches(order_side, batch_format="pyarrow"))
    li = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_shipdate",
                                         "l_linenumber"])
          .map_batches(li_side, batch_format="pyarrow"))
    parts = (o.union(li)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(classify, batch_format="pandas"))
    return grouped_aggregate(parts, ["relation"], [("n", "sum", "n")])


def orders_allen_intervals_sql() -> str:
    return """
WITH iv AS (
  SELECT CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS a1,
         CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) + 30
           AS a2,
         CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) AS b1,
         CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT)
           + (l.l_linenumber % 7) + 1 AS b2
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
lab AS (
  SELECT CASE
    WHEN b1 = a1 AND b2 = a2 THEN 'equals'
    WHEN b2 < a1 THEN 'before'
    WHEN b2 = a1 THEN 'meets'
    WHEN b1 < a1 AND b2 > a1 AND b2 < a2 THEN 'overlaps'
    WHEN b1 = a1 AND b2 < a2 THEN 'starts'
    WHEN b1 > a1 AND b2 < a2 THEN 'during'
    WHEN b2 = a2 AND b1 > a1 THEN 'finishes'
    WHEN b1 > a2 THEN 'after'
    WHEN b1 = a2 THEN 'met_by'
    WHEN b1 > a1 AND b1 < a2 AND b2 > a2 THEN 'overlapped_by'
    WHEN b1 = a1 AND b2 > a2 THEN 'started_by'
    WHEN b1 < a1 AND b2 > a2 THEN 'contains'
    WHEN b2 = a2 AND b1 < a1 THEN 'finished_by'
  END AS relation FROM iv)
SELECT relation, CAST(count(*) AS BIGINT) AS n
FROM lab GROUP BY relation"""


def events_value_ma_range(sf_dir: str, window_min: int = 10,
                          coarse: int = 1024):
    """Time-RANGE window frame: per event, the trailing sum of the SAME
    user's value-cents over [ts - 10 min, ts] — the RANGE BETWEEN
    INTERVAL frame (sparse, irregular series), complementing the
    rows-based events_dau_ma7.  RANGE semantics exactly: every peer row
    with equal ts is included regardless of ordering.

    Shape: one user-keyed coarse exchange of (user, ts_us, event_id,
    cents) int64 rows; per bucket one lexsort + per-user-segment
    prefix-sum with two vectorized searchsorted probes (no per-row
    loop, no self-join).  Output is event-grain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    W_US = window_min * 60 * 1_000_000

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                t.column("value"), pa.scalar(100.0))), pa.int64()),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def trailing(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "trailing_cents": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        w = g["cents"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, eid, w = u[order], ts[order], eid[order], w[order]
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(u)]))
        cum = np.concatenate(([0], np.cumsum(w)))
        out = np.empty(len(u), np.int64)
        for s, e in zip(starts, ends):  # per USER segment (few, small)
            seg = ts[s:e]
            lo = s + np.searchsorted(seg, seg - W_US, side="left")
            hi = s + np.searchsorted(seg, seg, side="right")
            out[s:e] = cum[hi] - cum[lo]
        return pd.DataFrame({"event_id": eid, "user_id": u,
                             "trailing_cents": out})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "value"])
    return (ev.map_batches(rows, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(trailing, batch_format="pandas"))


def events_value_ma_range_sql(window_min: int = 10) -> str:
    return f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL {window_min} MINUTE PRECEDING
               AND CURRENT ROW) AS BIGINT) AS trailing_cents
FROM events"""


def events_cusum_alarm(sf_dir: str):
    """Sequential change detection (one-sided CUSUM / SPC) on each
    event type's daily count series: S_t = max(0, S_{t-1} + x_t - k)
    with reference k = that type's floor-mean daily count, alarming
    when the cumulative excess tops one average day (S_t > k).  The
    recursion is evaluated CLOSED-FORM — S_t = C_t - min(0, running
    min C_j) with C the cumsum of (x - k) — so both sides are pure
    window algebra over exact integers (the sequential-detection
    companion to the pointwise z-gate in :func:`events_burst_days`).

    Shape: one (type, day)-keyed count exchange; the CUSUM sweep runs
    on the collected day-domain series (calendar-bounded at any
    scale), Python ints driver-side vs HUGEINT in the oracle.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"event_type": t.column("event_type"),
                         "day": day})

    d = collect_small_arrow(grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["event_type", "day"], [("", "count", "n_events")])).to_pandas()
    d = d.sort_values(["event_type", "day"]).reset_index(drop=True)
    s_out, alarm_out = [], []
    for _, g in d.groupby("event_type", sort=False):
        x = [int(v) for v in g["n_events"]]
        k = sum(x) // len(x)
        cum, run_min, s = 0, 0, []
        for v in x:
            cum += v - k
            run_min = min(run_min, cum)
            s.append(cum - min(0, run_min))
        s_out.extend(s)
        alarm_out.extend([v > k for v in s])
    d["s_stat"] = pd.Series(s_out, dtype="int64")
    d["alarm"] = pd.Series(alarm_out, dtype="bool")
    d["n_events"] = d["n_events"].astype("int64")
    return pa.Table.from_pandas(d, preserve_index=False)


def events_cusum_alarm_sql() -> str:
    return """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS x
  FROM events GROUP BY 1, 2),
k AS (SELECT event_type, sum(x) // count(*) AS kk FROM d GROUP BY 1),
c AS (
  SELECT d.event_type, d.day, d.x, k.kk,
         sum(d.x - k.kk) OVER (PARTITION BY d.event_type ORDER BY d.day
                               ROWS UNBOUNDED PRECEDING) AS cum
  FROM d JOIN k USING (event_type)),
m AS (
  SELECT event_type, day, x, kk, cum,
         least(0, min(cum) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING)) AS mn
  FROM c)
SELECT event_type, day, CAST(x AS BIGINT) AS n_events,
       CAST(cum - mn AS BIGINT) AS s_stat,
       (cum - mn) > kk AS alarm
FROM m"""


def orders_backlog_age_buckets(sf_dir: str, coarse: int = 1024):
    """Backlog aging report as of a snapshot date (1998-01-01): orders
    placed by then whose lineitems are not all shipped (or that have
    no lineitems) are bucketed by age in days — the WIP/receivables
    aging statement.

    Shape: the orders side prunes at the read (o_orderdate <= D pushed
    into read_parquet); lineitem ships only per-batch (orderkey,
    max_ship) partials; one coarse-hash exchange merges them and emits
    bucket-count partials; output is <= 4 rows.
    """
    import pyarrow.dataset as pds
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    D_US = 883_612_800_000_000  # 1998-01-01T00:00:00Z epoch us
    DAY_US = 86_400_000_000

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        age = (D_US - pc.cast(t.column("o_orderdate"),
                              pa.int64()).to_numpy()) // DAY_US
        return pa.table({
            "okey": keys,
            "v": pa.array(age, pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def li_side(t: pa.Table) -> pa.Table:
        g = (pa.table({"okey": pc.cast(t.column("l_orderkey"), pa.int64()),
                       "ship_us": pc.cast(t.column("l_shipdate"),
                                          pa.int64())})
             .group_by(["okey"]).aggregate([("ship_us", "max")])
             .rename_columns(["okey", "v"]))
        kk = g.column("okey")
        return pa.table({
            "okey": kk, "v": g.column("v"),
            "side": pa.array(np.ones(g.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64())})

    def buckets(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"age_bucket": pd.Series(dtype="object"),
                "n_orders": pd.Series(dtype="int64")}
        if g.empty or not (g["side"] == 0).any():
            return pd.DataFrame(cols)
        o = g.loc[g["side"] == 0, ["okey", "v"]].rename(
            columns={"v": "age"})
        ms = (g.loc[g["side"] == 1, ["okey", "v"]]
              .groupby("okey", as_index=False).max()
              .rename(columns={"v": "last_ship"}))
        j = o.merge(ms, on="okey", how="left")
        open_mask = j["last_ship"].isna() | (j["last_ship"] > D_US)
        age = j.loc[open_mask, "age"].to_numpy()
        lab = np.where(age <= 30, "0-30",
                       np.where(age <= 90, "31-90",
                                np.where(age <= 365, "91-365", "365+")))
        v, c = np.unique(lab, return_counts=True)
        return pd.DataFrame({"age_bucket": v,
                             "n_orders": c.astype("int64")})

    o = (ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        filter=(pds.field("o_orderdate")
                <= pa.scalar(D_US, pa.timestamp("us"))))
        .map_batches(order_side, batch_format="pyarrow"))
    li = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_shipdate"])
          .map_batches(li_side, batch_format="pyarrow"))
    parts = (o.union(li)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(buckets, batch_format="pandas"))
    return grouped_aggregate(parts, ["age_bucket"],
                             [("n_orders", "sum", "n_orders")])


def orders_backlog_age_buckets_sql() -> str:
    return """
WITH ms AS (SELECT l_orderkey, max(l_shipdate) AS last_ship
            FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT (epoch_us(TIMESTAMP '1998-01-01')
          - epoch_us(o.o_orderdate)) // 86400000000 AS age_days,
         (ms.last_ship IS NULL
          OR ms.last_ship > TIMESTAMP '1998-01-01') AS is_open
  FROM orders o LEFT JOIN ms ON ms.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate <= TIMESTAMP '1998-01-01')
SELECT CASE WHEN age_days <= 30 THEN '0-30'
            WHEN age_days <= 90 THEN '31-90'
            WHEN age_days <= 365 THEN '91-365'
            ELSE '365+' END AS age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders
FROM j WHERE is_open GROUP BY 1"""


def events_autocorr_lag1(sf_dir: str):
    """Lag-1 autocorrelation of each event type's daily count series,
    reported as EXACT INTEGER Pearson numerators — n*Σab − Σa*Σb and
    the two variance terms — so the fp correlation r stays downstream
    where fp is allowed (the persistence/seasonality screen next to
    :func:`events_burst_days` and :func:`events_cusum_alarm`).
    Python-int driver math vs HUGEINT in the oracle; at extreme daily
    counts the BIGINT output cast is the documented bound.

    Shape: one (type, day)-keyed count exchange; the lag pairing runs
    on the collected day-domain series (calendar-bounded)."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"event_type": t.column("event_type"),
                         "day": day})

    d = collect_small_arrow(grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["event_type", "day"], [("", "count", "n")])).to_pandas()
    d = d.sort_values(["event_type", "day"]).reset_index(drop=True)
    rows = []
    for et, g in d.groupby("event_type", sort=False):
        x = [int(v) for v in g["n"]]
        if len(x) < 2:
            # single-day series has no lag pairs: the oracle's WHERE
            # b IS NOT NULL drops the type entirely — mirror that
            continue
        a, b = x[1:], x[:-1]
        n = len(a)
        sa, sb = sum(a), sum(b)
        rows.append({
            "event_type": et, "n_pairs": n,
            "cov_num": n * sum(p * q for p, q in zip(a, b)) - sa * sb,
            "var_a_num": n * sum(v * v for v in a) - sa * sa,
            "var_b_num": n * sum(v * v for v in b) - sb * sb})
    out = pd.DataFrame(rows, columns=["event_type", "n_pairs", "cov_num",
                                      "var_a_num", "var_b_num"])
    for c in ("n_pairs", "cov_num", "var_a_num", "var_b_num"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def events_autocorr_lag1_sql() -> str:
    return """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS x
  FROM events GROUP BY 1, 2),
p AS (
  SELECT event_type, x AS a,
         lag(x) OVER (PARTITION BY event_type ORDER BY day) AS b
  FROM d),
q AS (SELECT event_type, a, b FROM p WHERE b IS NOT NULL)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) * sum(a * b) - sum(a) * sum(b) AS BIGINT)
         AS cov_num,
       CAST(count(*) * sum(a * a) - sum(a) * sum(a) AS BIGINT)
         AS var_a_num,
       CAST(count(*) * sum(b * b) - sum(b) * sum(b) AS BIGINT)
         AS var_b_num
FROM q GROUP BY event_type"""


SESSION_PATTERNS = ("view.*purchase", "view.*click.*purchase",
                    "error.*error")


def session_path_match(sf_dir: str, gap_s: int = 1800,
                       coarse: int = 1024):
    """Behavioral-pattern mining over sessionized paths: sessions are
    cut at 30-min idle gaps (the events_sessions rule, ties broken by
    event_id), each session's ordered event-type path is joined into a
    'a>b>c' string, and every pattern in ``SESSION_PATTERNS`` reports
    how many sessions match its regex — funnel queries expressed as
    path regexes instead of fixed step joins.

    Shape: one user-keyed exchange of (user, ts_us, event_id, type)
    rows; per bucket a vectorized lexsort + gap cumsum builds session
    ids, a pandas groupby joins paths (session-domain sized), and the
    compiled regexes scan path strings; output is len(patterns) rows.
    """
    import re

    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    gap_us = gap_s * 1_000_000
    pats = [(p, re.compile(p)) for p in SESSION_PATTERNS]

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def match(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"pattern": pd.Series(dtype="object"),
                "n_sessions": pd.Series(dtype="int64"),
                "n_matching": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        new_sess = new_user | (gap > gap_us)
        sid = np.cumsum(new_sess)
        paths = (pd.Series(et).groupby(sid).agg(">".join))
        n = len(paths)
        return pd.DataFrame({
            "pattern": [p for p, _ in pats],
            "n_sessions": np.full(len(pats), n, np.int64),
            "n_matching": np.array(
                [int(sum(1 for s in paths if rx.search(s)))
                 for _, rx in pats], np.int64)})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(match, batch_format="pandas"))
    return grouped_aggregate(parts, ["pattern"],
                             [("n_sessions", "sum", "n_sessions"),
                              ("n_matching", "sum", "n_matching")])


def session_path_match_sql(gap_s: int = 1800) -> str:
    pat_rows = " UNION ALL ".join(
        f"SELECT '{p}' AS pattern" for p in SESSION_PATTERNS)
    return f"""
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {gap_s} * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, ts, event_id,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
p AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY user_id, sid),
pats AS ({pat_rows})
SELECT pats.pattern,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE regexp_matches(p.path, pats.pattern))
            AS BIGINT) AS n_matching
FROM p, pats GROUP BY pats.pattern"""


def event_type_overlap(sf_dir: str, coarse: int = 256):
    """Audience-overlap matrix: for every ordered event-type pair
    (a < b), how many distinct users did BOTH — the co-occurrence /
    bitmap-intersection query behind audience planning ("view AND
    purchase").  Includes the diagonal (a = a: distinct users of a).

    Shape: per-batch DISTINCT (user, type) partials -> one user-keyed
    exchange dedupes globally -> each user's type set (<= |types|)
    expands to its ordered pairs INSIDE the bucket (bounded |types|^2
    per user, vectorized via merge on user) -> pair-domain count
    exchange.  No user list ever reaches the driver.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def pairs_rows(t: pa.Table) -> pa.Table:
        g = (t.select(["user_id", "event_type"])
             .group_by(["user_id", "event_type"]).aggregate([]))
        keys = pc.cast(g.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys, "event_type": g.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"type_a": pd.Series(dtype="object"),
                "type_b": pd.Series(dtype="object"),
                "n_users": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        d = g[["user_id", "event_type"]].drop_duplicates()
        j = d.merge(d, on="user_id", suffixes=("_a", "_b"))
        j = j[j["event_type_a"] <= j["event_type_b"]]
        r = (j.groupby(["event_type_a", "event_type_b"], as_index=False)
             .agg(n_users=("user_id", "nunique")))
        r.columns = ["type_a", "type_b", "n_users"]
        r["n_users"] = r["n_users"].astype("int64")
        return r

    parts = (ev.map_batches(pairs_rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(expand, batch_format="pandas"))
    return grouped_aggregate(parts, ["type_a", "type_b"],
                             [("n_users", "sum", "n_users")])


def event_type_overlap_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id
                 AND a.event_type <= b.event_type
GROUP BY a.event_type, b.event_type"""


def embedding_label_scatter(emb_ds):
    """Per-label WITHIN-CLASS scatter (the Fisher / LDA separability
    numerator): for each label, n_vecs and the exact integer
    sum-over-dims of n*Σx² − (Σx)² on the 1e-6-quantized components —
    n times the within-class sum of squares, so no rational mean ever
    enters the certificate.  The embedding-space companion to the
    clustering-quality ops (is this label a tight cluster or a cloud?).

    Shape: per batch the (n, d) matrix collapses to (labels × d)
    (n, Σx, Σx²) int64 partials — vectors never reach the exchange —
    then one (label, dim)-keyed exchange and a label-domain reduce.
    Products n·Σx² stay under int64 at any realistic per-label count;
    the oracle computes in HUGEINT and the output cast is the bound.
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
        s1 = np.zeros((len(uniq), d), np.int64)
        s2 = np.zeros((len(uniq), d), np.int64)
        np.add.at(s1, inv, q)
        np.add.at(s2, inv, q * q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq))),
            "n": pa.array(np.repeat(counts, d)),
            "s1": pa.array(s1.reshape(-1)),
            "s2": pa.array(s2.reshape(-1))})

    pd_ = grouped_aggregate(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        [("n", "sum", "n"), ("s1", "sum", "s1"), ("s2", "sum", "s2")])

    # the (label x dim) table is DOMAIN-sized; finish the n*s2 - s1^2
    # term driver-side in arbitrary-precision Python ints — numpy int64
    # wraps SILENTLY near 9.2e18 while the HUGEINT oracle keeps going
    # (the final BIGINT cast is the only bound, asserted explicitly)
    from ..util import collect_small_arrow

    pdf = collect_small_arrow(pd_).to_pandas()
    acc: dict[int, list[int]] = {}
    for lab, n, a, b in zip(pdf["label"], pdf["n"], pdf["s1"],
                            pdf["s2"]):
        e = acc.setdefault(int(lab), [0, 0])
        e[0] = max(e[0], int(n))
        e[1] += int(n) * int(b) - int(a) * int(a)
    rows = sorted(acc.items())
    assert all(abs(w) < 2**63 for _, (_, w) in rows), \
        "wss_num exceeds int64 — mirror the oracle's HUGEINT overflow"
    import pandas as _pd
    return _pd.DataFrame({
        "label": _pd.Series([k for k, _ in rows], dtype="int64"),
        "n_vecs": _pd.Series([v[0] for _, v in rows], dtype="int64"),
        "wss_num": _pd.Series([v[1] for _, v in rows], dtype="int64")})


def embedding_label_scatter_sql() -> str:
    return """
WITH el AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings),
pd AS (
  SELECT label, dim, count(*) AS n, sum(xq) AS s1, sum(xq * xq) AS s2
  FROM el GROUP BY label, dim)
SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
       CAST(sum(n * s2 - s1 * s1) AS BIGINT) AS wss_num
FROM pd GROUP BY label"""


def log_parse_roundtrip(sf_dir: str):
    """Raw-log ETL certificate: events are FORMATTED into classic
    key=value log lines per batch (ts_us/user/type/cents), then PARSED
    back with one RE2 ``pc.extract_regex`` named-group kernel (no
    Python per row) and aggregated per type — proving the parse layer
    is lossless against the typed-source oracle, the way a real
    pipeline certifies its log parser against structured ground truth.

    Shape: format + parse + partial all inside one zero-shuffle
    map_batches; one type-domain exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    PAT = (r"^ts=(?P<ts>\d+) user=(?P<user>\d+) "
           r"type=(?P<type>\w+) val=(?P<val>-?\d+)$")

    def roundtrip(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"),
                                             pa.scalar(100.0))), pa.int64())
        line = pc.binary_join_element_wise(
            "ts=", pc.cast(pc.cast(t.column("ts"), pa.int64()),
                           pa.string()),
            " user=", pc.cast(pc.cast(t.column("user_id"), pa.int64()),
                              pa.string()),
            " type=", t.column("event_type"),
            " val=", pc.cast(cents, pa.string()), "")
        f = pc.extract_regex(line, pattern=PAT)
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        parsed_type = f.field("type")
        parsed_val = pc.cast(f.field("val"), pa.int64())
        return (pa.table({"event_type": parsed_type,
                          "n_events": pa.array(np.ones(len(parsed_type),
                                                       np.int64)),
                          "sum_cents": parsed_val})
                .group_by(["event_type"])
                .aggregate([("n_events", "sum"), ("sum_cents", "sum")])
                .rename_columns(["event_type", "n_events", "sum_cents"]))

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "event_type",
                                        "value"])
    return grouped_aggregate(
        ev.map_batches(roundtrip, batch_format="pyarrow"),
        ["event_type"], [("n_events", "sum", "n_events"),
                         ("sum_cents", "sum", "sum_cents")])


def log_parse_roundtrip_sql() -> str:
    # the oracle is the TYPED source: parse-roundtrip must be lossless
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY event_type"""


def events_debounce(sf_dir: str, window_s: int = 259_200,
                    coarse: int = 1024):
    """Telemetry throttle/debounce accounting: an event is KEPT if it
    is the first of its (user, type) stream or arrives more than
    ``window_s`` (default 3 days — sized to this corpus's sparse
    per-stream cadence so the rule actually drops rows) after the
    previous event of that stream (previous
    EVENT, not previous kept — the stateless throttle rule, so both
    sides are pure lag algebra); report kept/total per type.

    Shape: one (user)-keyed exchange of int64 rows; per bucket one
    lexsort + vectorized diff against the (user, type) run structure;
    output is type-domain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    w_us = window_s * 1_000_000

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series(dtype="object"),
                "n_total": pd.Series(dtype="int64"),
                "n_kept": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, et, u))
        u, et, ts = u[order], et[order], ts[order]
        same_run = np.concatenate(
            ([False], (u[1:] == u[:-1]) & (et[1:] == et[:-1])))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        kept = (~same_run) | (gap > w_us)
        out = pd.DataFrame({"event_type": et,
                            "n_total": np.ones(len(et), np.int64),
                            "n_kept": kept.astype("int64")})
        return out.groupby("event_type", as_index=False).sum()

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(debounce, batch_format="pandas"))
    return grouped_aggregate(parts, ["event_type"],
                             [("n_total", "sum", "n_total"),
                              ("n_kept", "sum", "n_kept")])


def events_debounce_sql(window_s: int = 259_200) -> str:
    return f"""
WITH l AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE gap_us IS NULL
                             OR gap_us > {window_s * 1_000_000})
            AS BIGINT) AS n_kept
FROM l GROUP BY event_type"""


def ab_test_report(sf_dir: str, coarse: int = 1024):
    """Experiment analysis: users are assigned to control/treatment by
    the md5-parity rule (md5(user)[:8] first hex digit < '8' ->
    control — deterministic, mirrors in SQL), and the report gives per
    variant: users, converters (>=1 purchase), total purchases, and
    purchase value in integer cents — the conversion-lift table whose
    fp ratios live downstream.  The assignment hash is the same
    sampling convention the md5-rule operators share, so bucketing is
    stable across reruns/epochs (a real experimentation requirement).

    Shape: per-batch (user, is_purchase, cents) partials -> one
    user-keyed exchange -> per-user fold + variant classify inside the
    bucket -> 2-row output exchange.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..stages.sampling import _hex8
    from ..util import shuffle_partitions

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        is_p = pc.cast(pc.equal(t.column("event_type"), "purchase"),
                       pa.int64())
        cents = pc.multiply(
            pc.cast(pc.round(pc.multiply(t.column("value"),
                                         pa.scalar(100.0))), pa.int64()),
            is_p)
        g = (pa.table({"user_id": keys, "n_purchases": is_p,
                       "purchase_cents": cents})
             .group_by(["user_id"])
             .aggregate([("n_purchases", "sum"),
                         ("purchase_cents", "sum")])
             .rename_columns(["user_id", "n_purchases",
                              "purchase_cents"]))
        kk = g.column("user_id")
        return g.append_column(
            "__coarse", pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64()))

    def per_variant(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"variant": pd.Series(dtype="object"),
                "n_users": pd.Series(dtype="int64"),
                "n_converters": pd.Series(dtype="int64"),
                "n_purchases": pd.Series(dtype="int64"),
                "purchase_cents": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        per = g.groupby("user_id", as_index=False).sum()
        # the shared sampling hash rule (stages.sampling._hex8), first
        # hex digit as the variant coin
        hx = _hex8(int(u) for u in per["user_id"])
        per["variant"] = ["control" if h[0] < "8" else "treatment"
                          for h in hx]
        r = per.groupby("variant", as_index=False).agg(
            n_users=("user_id", "size"),
            n_converters=("n_purchases", lambda s: int((s > 0).sum())),
            n_purchases=("n_purchases", "sum"),
            purchase_cents=("purchase_cents", "sum"))
        for c in ("n_users", "n_converters", "n_purchases",
                  "purchase_cents"):
            r[c] = r[c].astype("int64")
        return r

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "value"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(per_variant, batch_format="pandas"))
    return grouped_aggregate(parts, ["variant"],
                             [("n_users", "sum", "n_users"),
                              ("n_converters", "sum", "n_converters"),
                              ("n_purchases", "sum", "n_purchases"),
                              ("purchase_cents", "sum",
                               "purchase_cents")])


def ab_test_report_sql() -> str:
    return """
WITH per AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS n_purchases,
         CAST(coalesce(sum(CAST(round(value * 100.0) AS BIGINT))
                       FILTER (WHERE event_type = 'purchase'), 0)
              AS BIGINT) AS purchase_cents
  FROM events GROUP BY user_id),
v AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'control' ELSE 'treatment' END AS variant,
         n_purchases, purchase_cents
  FROM per)
SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(*) FILTER (WHERE n_purchases > 0) AS BIGINT)
         AS n_converters,
       CAST(sum(n_purchases) AS BIGINT) AS n_purchases,
       CAST(sum(purchase_cents) AS BIGINT) AS purchase_cents
FROM v GROUP BY variant"""


TTL_WATERMARK_US = 1_706_572_800_000_000  # 2024-01-30T00:00:00Z


def events_ttl_expiry(sf_dir: str, ttl_days: int = 7, coarse: int = 1024):
    """Keyed-state TTL/GC accounting (the streaming-state eviction
    audit): for every (user, type) stream, its state is LIVE at the
    watermark if the last event arrived within ``ttl_days``, else
    EXPIRED — report live/expired stream counts per type.  This is the
    bookkeeping a stateful streaming job runs to size its keyed state
    under eviction.

    Shape: per-batch argmax partials (max ts per (user, type) — one
    row per stream per block), one keyed exchange merges maxima, the
    classify is a vectorized compare; output is type-domain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    cutoff = TTL_WATERMARK_US - ttl_days * 86_400_000_000

    def partials(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": pc.cast(t.column("user_id"), pa.int64()),
                       "event_type": t.column("event_type"),
                       "ts_us": pc.cast(t.column("ts"), pa.int64())})
             .group_by(["user_id", "event_type"])
             .aggregate([("ts_us", "max")])
             .rename_columns(["user_id", "event_type", "last_us"]))
        keys = g.column("user_id")
        return g.append_column(
            "__coarse", pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series(dtype="object"),
                "n_live": pd.Series(dtype="int64"),
                "n_expired": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        per = (g.groupby(["user_id", "event_type"], as_index=False)
               ["last_us"].max())
        live = (per["last_us"] >= cutoff)
        out = pd.DataFrame({"event_type": per["event_type"],
                            "n_live": live.astype("int64"),
                            "n_expired": (~live).astype("int64")})
        return out.groupby("event_type", as_index=False).sum()

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])
    parts = (ev.map_batches(partials, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(classify, batch_format="pandas"))
    return grouped_aggregate(parts, ["event_type"],
                             [("n_live", "sum", "n_live"),
                              ("n_expired", "sum", "n_expired")])


def events_ttl_expiry_sql(ttl_days: int = 7) -> str:
    cutoff = TTL_WATERMARK_US - ttl_days * 86_400_000_000
    return f"""
WITH per AS (
  SELECT user_id, event_type, max(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id, event_type)
SELECT event_type,
       CAST(count(*) FILTER (WHERE last_us >= {cutoff}) AS BIGINT)
         AS n_live,
       CAST(count(*) FILTER (WHERE last_us < {cutoff}) AS BIGINT)
         AS n_expired
FROM per GROUP BY event_type"""


def events_dense_matrix(sf_dir: str):
    """Dense (day x type) count matrix INCLUDING explicit zero cells —
    the cross-join-spine fill that charting/ML feature layers need
    (sparse groupby output leaves holes; the spine makes absence a
    row).  Spine = distinct days x distinct types, both derived from
    the data itself.

    Shape: one (day, type) count exchange (sparse, data-sized); the
    spine fill runs on the collected day x type domain (calendar x
    type-vocabulary bounded at any scale).
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"day": day, "event_type": t.column("event_type")})

    sparse = collect_small_arrow(grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["day", "event_type"], [("", "count", "n")])).to_pandas()
    days = sorted(sparse["day"].unique())
    types = sorted(sparse["event_type"].unique())
    spine = pd.MultiIndex.from_product([days, types],
                                       names=["day", "event_type"])
    dense = (sparse.set_index(["day", "event_type"])
             .reindex(spine, fill_value=0).reset_index())
    dense["n"] = dense["n"].astype("int64")
    return dense


def events_dense_matrix_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d')
                    AS day FROM events),
t AS (SELECT DISTINCT event_type FROM events),
c AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
SELECT d.day, t.event_type,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM d CROSS JOIN t
LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type"""


def supplier_hhi_by_region(sf_dir: str):
    """Market-concentration audit: per region, the exact integer
    Herfindahl-Hirschman numerator over nations' supplier counts —
    HHI = sum(share_i^2) = (sum n_i^2) / N^2, so reporting
    (n_suppliers = N, hhi_num = sum n_i^2) keeps the certificate
    integer and the fp ratio downstream — the grouped companion of the
    Gini concentration audit.

    Shape: one (nation)-domain count exchange; region fold over the
    25-nation table driver-side (the dimension is constant-sized).
    """
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    n2r = dict(zip(nat.column("n_nationkey").to_pylist(),
                   nat.column("n_regionkey").to_pylist()))

    def rows(t: pa.Table) -> pa.Table:
        return pa.table({"n_nationkey": pc.cast(t.column("s_nationkey"),
                                                pa.int64())})

    per_nation = collect_small_arrow(grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_nationkey"])
        .map_batches(rows, batch_format="pyarrow"),
        ["n_nationkey"], [("", "count", "n")])).to_pandas()
    per_nation["region"] = per_nation["n_nationkey"].map(
        lambda v: n2r[int(v)])
    out = (per_nation.assign(n2=lambda d: d["n"].astype("int64") ** 2)
           .groupby("region", as_index=False)
           .agg(n_nations=("n", "size"), n_suppliers=("n", "sum"),
                hhi_num=("n2", "sum")))
    out = out.rename(columns={"region": "r_regionkey"})
    for c in ("r_regionkey", "n_nations", "n_suppliers", "hhi_num"):
        out[c] = out[c].astype("int64")
    return out


def supplier_hhi_by_region_sql() -> str:
    return """
WITH pn AS (
  SELECT n.n_regionkey, s.s_nationkey, count(*) AS n
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_regionkey, s.s_nationkey)
SELECT CAST(n_regionkey AS BIGINT) AS r_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       CAST(sum(n) AS BIGINT) AS n_suppliers,
       CAST(sum(n * n) AS BIGINT) AS hhi_num
FROM pn GROUP BY n_regionkey"""


def customer_peak_open_orders(sf_dir: str, coarse: int = 1024):
    """Per-customer PEAK concurrency: the maximum number of that
    customer's orders simultaneously open (open = [orderdate day,
    last ship day]), reported as a (peak -> n_customers) histogram —
    the per-entity companion of the global backlog series
    (:func:`orders_open_per_day`), and the classic interval max-overlap
    sweep run inside each key group.

    Shape: lineitem ships (orderkey, max ship) partials to the orders
    side through one orderkey exchange; each order then emits two
    (custkey, day, ±1) boundary rows into a custkey exchange where the
    per-customer sweep is one lexsort + cumsum + segment max; output
    is peak-domain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    DAY_US = 86_400_000_000

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        return pa.table({
            "okey": keys,
            "v": pc.divide(pc.cast(t.column("o_orderdate"), pa.int64()),
                           pa.scalar(DAY_US, pa.int64())),
            "cust": pc.cast(t.column("o_custkey"), pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def li_side(t: pa.Table) -> pa.Table:
        g = (pa.table({"okey": pc.cast(t.column("l_orderkey"), pa.int64()),
                       "ship": pc.divide(
                           pc.cast(t.column("l_shipdate"), pa.int64()),
                           pa.scalar(DAY_US, pa.int64()))})
             .group_by(["okey"]).aggregate([("ship", "max")])
             .rename_columns(["okey", "v"]))
        kk = g.column("okey")
        return pa.table({
            "okey": kk, "v": g.column("v"),
            "cust": pa.array(np.zeros(g.num_rows, np.int64)),
            "side": pa.array(np.ones(g.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64())})

    def boundaries(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"cust": pd.Series(dtype="int64"),
                "day": pd.Series(dtype="int64"),
                "d": pd.Series(dtype="int64")}
        if g.empty or not (g["side"] == 0).any():
            return pd.DataFrame(cols)
        o = (g.loc[g["side"] == 0, ["okey", "v", "cust"]]
             .rename(columns={"v": "start"}))
        ms = (g.loc[g["side"] == 1, ["okey", "v"]]
              .groupby("okey", as_index=False).max()
              .rename(columns={"v": "close"}))
        j = o.merge(ms, on="okey", how="inner")  # orders with lineitems
        # close can precede start in this synthetic corpus: the open
        # interval is [min(start, close), max(start, close)]
        lo = np.minimum(j["start"].to_numpy(), j["close"].to_numpy())
        hi = np.maximum(j["start"].to_numpy(), j["close"].to_numpy())
        return pd.DataFrame({
            "cust": np.concatenate([j["cust"].to_numpy()] * 2),
            "day": np.concatenate([lo, hi + 1]),
            "d": np.concatenate([np.ones(len(j), np.int64),
                                 -np.ones(len(j), np.int64)])})

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"peak_open": pd.Series(dtype="int64"),
                "n_customers": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        agg = (g.groupby(["cust", "day"], as_index=False)["d"].sum()
               .sort_values(["cust", "day"], kind="mergesort"))
        cust = agg["cust"].to_numpy()
        d = agg["d"].to_numpy()
        cum = np.cumsum(d)
        starts = np.concatenate(([0], np.flatnonzero(
            cust[1:] != cust[:-1]) + 1))
        base = np.repeat(np.concatenate(([0], cum[starts[1:] - 1])),
                         np.diff(np.concatenate((starts, [len(d)]))))
        within = cum - base
        peak = pd.DataFrame({"cust": cust, "w": within}) \
            .groupby("cust")["w"].max()
        r = (peak.value_counts().rename_axis("peak_open")
             .reset_index(name="n_customers")
             .astype({"peak_open": "int64", "n_customers": "int64"}))
        return r

    o = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey",
                                        "o_orderdate"])
         .map_batches(order_side, batch_format="pyarrow"))
    li = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_shipdate"])
          .map_batches(li_side, batch_format="pyarrow"))
    b = (o.union(li)
         .groupby("__coarse", num_partitions=shuffle_partitions())
         .map_groups(boundaries, batch_format="pandas"))

    def add_cust_coarse(t: pa.Table) -> pa.Table:
        from ..stages.dedup import coarse_mix as cm

        keys = pc.cast(t.column("cust"), pa.int64())
        return t.append_column(
            "__coarse2", pa.array(cm(keys.to_numpy(), coarse - 1),
                                  pa.int64()))

    parts = (b.map_batches(add_cust_coarse, batch_format="pyarrow")
             .groupby("__coarse2", num_partitions=shuffle_partitions())
             .map_groups(sweep, batch_format="pandas"))
    return grouped_aggregate(parts, ["peak_open"],
                             [("n_customers", "sum", "n_customers")])


def customer_peak_open_orders_sql() -> str:
    return """
WITH ms AS (SELECT l_orderkey,
                   CAST(epoch_us(max(l_shipdate)) // 86400000000
                        AS BIGINT) AS close
            FROM lineitem GROUP BY l_orderkey),
iv AS (
  SELECT o.o_custkey AS cust,
         least(CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT),
               ms.close) AS lo,
         greatest(CAST(epoch_us(o.o_orderdate) // 86400000000
                       AS BIGINT), ms.close) AS hi
  FROM orders o JOIN ms ON ms.l_orderkey = o.o_orderkey),
b AS (
  SELECT cust, lo AS day, 1 AS d FROM iv
  UNION ALL SELECT cust, hi + 1, -1 FROM iv),
s AS (SELECT cust, day, sum(d) AS d FROM b GROUP BY cust, day),
c AS (SELECT cust,
             sum(d) OVER (PARTITION BY cust ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS open
      FROM s),
p AS (SELECT cust, CAST(max(open) AS BIGINT) AS peak_open
      FROM c GROUP BY cust)
SELECT peak_open, CAST(count(*) AS BIGINT) AS n_customers
FROM p GROUP BY peak_open"""


FISCAL_ANCHOR_DAY = 9125  # 1994-12-26 (Monday), BEFORE the data min:
#   weeks stay non-negative, where numpy floor-div and DuckDB's
#   truncating // agree (they diverge on negatives)
_F445_CUM = (4, 8, 13, 17, 21, 26, 30, 34, 39, 43, 47, 52)


def orders_fiscal_445(sf_dir: str):
    """4-4-5 fiscal-calendar rollup: every order date maps to the
    retail fiscal calendar (52-week years anchored Monday 1994-12-26,
    one week before the corpus' first order so week numbers stay
    non-negative — numpy floor division and DuckDB's truncating //
    only agree there;
    each quarter = 4+4+5 weeks) with PURE INTEGER day arithmetic —
    week = (epoch_day - anchor) // 7, fiscal_year = week // 52, and
    the period is the searchsorted position of week-in-year against
    the cumulative (4,8,13,...,52) boundaries — then revenue
    aggregates per (fiscal_year, fiscal_period).  The calendar logic
    finance warehouses need and civil-calendar date functions can't
    express.

    Shape: zero-shuffle per-batch mapping + period-domain partials;
    one tiny exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    DAY_US = 86_400_000_000
    cum = np.array(_F445_CUM, np.int64)

    def partial(t: pa.Table) -> pa.Table:
        day = (pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
               // DAY_US)
        week = (day - FISCAL_ANCHOR_DAY) // 7
        fy = week // 52
        wiy = week - fy * 52
        period = np.searchsorted(cum, wiy, side="right") + 1
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64()).to_numpy()
        g = (pa.table({"fiscal_year": pa.array(fy, pa.int64()),
                       "fiscal_period": pa.array(period.astype(np.int64)),
                       "n_orders": pa.array(np.ones(len(fy), np.int64)),
                       "revenue_cents": pa.array(cents, pa.int64())})
             .group_by(["fiscal_year", "fiscal_period"])
             .aggregate([("n_orders", "sum"), ("revenue_cents", "sum")])
             .rename_columns(["fiscal_year", "fiscal_period",
                              "n_orders", "revenue_cents"]))
        return g

    return grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["fiscal_year", "fiscal_period"],
        [("n_orders", "sum", "n_orders"),
         ("revenue_cents", "sum", "revenue_cents")])


def orders_fiscal_445_sql() -> str:
    b = ", ".join(f"({i + 1}, {c})" for i, c in enumerate(_F445_CUM))
    return f"""
WITH bounds(p, cum) AS (VALUES {b}),
d AS (
  SELECT (epoch_us(o_orderdate) // 86400000000
          - {FISCAL_ANCHOR_DAY}) // 7 AS week,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders),
m AS (
  SELECT week // 52 AS fiscal_year,
         week - (week // 52) * 52 AS wiy, cents
  FROM d),
p AS (
  SELECT fiscal_year,
         (SELECT min(p) FROM bounds WHERE m.wiy < cum) AS fiscal_period,
         cents
  FROM m)
SELECT CAST(fiscal_year AS BIGINT) AS fiscal_year,
       CAST(fiscal_period AS BIGINT) AS fiscal_period,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM p GROUP BY fiscal_year, fiscal_period"""


def embedding_gram_matrix(emb_ds):
    """Exact-integer PCA sufficient statistic: the Gram matrix
    G = sum_v q_v q_v^T over the 1e-6-quantized embedding components,
    upper triangle as (dim_i <= dim_j, gram_q, n_vecs) rows — the
    mergeable second-moment matrix whose eigendecomposition (fp,
    downstream) IS principal component analysis; covariance follows by
    subtracting the centroid outer product (also exact via
    ``embedding_centroids``).

    Shape: per batch ONE int64 ``q.T @ q`` matmul collapses the (n, d)
    block to the constant (d, d) partial — vectors never reach the
    exchange and the merge is elementwise integer addition.  Entries
    fit int64 up to ~9e6 vectors per 1e12-quantized product; the
    HUGEINT oracle and this documented bound cover the rest.
    """
    from ..stages.ann import _list_f64_matrix
    from ..stages.exact_agg import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        m = _list_f64_matrix(t.column("embedding"))
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        g = q.T @ q  # (d, d) int64
        d = g.shape[0]
        iu = np.triu_indices(d)
        return pa.table({
            "dim_i": pa.array(iu[0].astype(np.int64)),
            "dim_j": pa.array(iu[1].astype(np.int64)),
            "gram_q": pa.array(g[iu]),
            "n_vecs": pa.array(np.full(len(iu[0]), q.shape[0],
                                       np.int64))})

    return grouped_aggregate(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["dim_i", "dim_j"],
        [("gram_q", "sum", "gram_q"), ("n_vecs", "sum", "n_vecs")])


def embedding_gram_matrix_sql() -> str:
    return """
WITH el AS (
  SELECT vec_id, unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings)
SELECT CAST(a.dim AS BIGINT) AS dim_i, CAST(b.dim AS BIGINT) AS dim_j,
       CAST(sum(a.xq * b.xq) AS BIGINT) AS gram_q,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim"""


def user_conversion_survival(sf_dir: str, coarse: int = 1024):
    """Survival-analysis curve for conversion: per user, days from
    FIRST ACTIVITY to FIRST PURCHASE (never-converters excluded, their
    count reported by the downstream row sum vs user total); output is
    the (days_to_convert -> n_users, cum_users) curve — the
    time-to-event distribution product teams read as "how long until a
    new user buys".

    Shape: per-batch (user, min ts, min purchase ts) partials -> one
    user-keyed exchange merges minima -> integer day difference ->
    day-domain histogram with a driver-side cumulative (the curve is
    calendar-bounded).
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    from ..util import shuffle_partitions

    BIG = (1 << 62)

    def partials(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64())
        is_p = pc.equal(t.column("event_type"), "purchase")
        pts = pc.if_else(is_p, ts, pa.scalar(BIG, pa.int64()))
        g = (pa.table({"user_id": pc.cast(t.column("user_id"), pa.int64()),
                       "first_us": ts, "first_purchase_us": pts})
             .group_by(["user_id"])
             .aggregate([("first_us", "min"),
                         ("first_purchase_us", "min")])
             .rename_columns(["user_id", "first_us",
                              "first_purchase_us"]))
        keys = g.column("user_id")
        return g.append_column(
            "__coarse", pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()))

    def days_hist(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"days_to_convert": pd.Series(dtype="int64"),
                "n_users": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        per = (g.groupby("user_id", as_index=False)
               .agg(first_us=("first_us", "min"),
                    fp=("first_purchase_us", "min")))
        conv = per[per["fp"] < BIG]
        days = ((conv["fp"].to_numpy() - conv["first_us"].to_numpy())
                // 86_400_000_000)
        v, c = np.unique(days, return_counts=True)
        return pd.DataFrame({"days_to_convert": v.astype("int64"),
                             "n_users": c.astype("int64")})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])
    hist = collect_small_arrow(grouped_aggregate(
        (ev.map_batches(partials, batch_format="pyarrow")
         .groupby("__coarse", num_partitions=shuffle_partitions())
         .map_groups(days_hist, batch_format="pandas")),
        ["days_to_convert"],
        [("n_users", "sum", "n_users")])).to_pandas()
    hist = hist.sort_values("days_to_convert").reset_index(drop=True)
    hist["cum_users"] = hist["n_users"].cumsum().astype("int64")
    hist["n_users"] = hist["n_users"].astype("int64")
    hist["days_to_convert"] = hist["days_to_convert"].astype("int64")
    return hist


def user_conversion_survival_sql() -> str:
    return """
WITH per AS (
  SELECT user_id, min(epoch_us(ts)) AS first_us,
         min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
           AS fp
  FROM events GROUP BY user_id),
d AS (
  SELECT (fp - first_us) // 86400000000 AS days_to_convert
  FROM per WHERE fp IS NOT NULL),
h AS (SELECT days_to_convert, CAST(count(*) AS BIGINT) AS n_users
      FROM d GROUP BY days_to_convert)
SELECT CAST(days_to_convert AS BIGINT) AS days_to_convert, n_users,
       CAST(sum(n_users) OVER (ORDER BY days_to_convert
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM h"""


DISCOUNT_CAPS_BP = (0, 200, 500, 1000)


def discount_cap_whatif(sf_dir: str):
    """What-if / scenario analysis in one pass: total revenue under
    hypothetical discount CAPS (discounts clamped to <= cap) for caps
    0% / 2% / 5% / 10%, in exact e4 units — the pricing-policy
    simulation ("how much revenue would a 2% discount ceiling
    recover?").  All scenarios evaluate per batch from the same rows
    (level-tagged partials), so the input is scanned ONCE however
    many scenarios run.

    Shape: zero-shuffle scan, scenario-domain partials, one tiny
    exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    caps = np.array(DISCOUNT_CAPS_BP, np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ext = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                           pa.scalar(100.0))),
                      pa.int64()).to_numpy()
        disc = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                            pa.scalar(10000.0))),
                       pa.int64()).to_numpy()
        rows_cap, rows_rev, rows_n = [], [], []
        for c in caps:
            eff = np.minimum(disc, c)
            rows_cap.append(int(c))
            rows_rev.append(int((ext * (10000 - eff)).sum()))
            rows_n.append(len(ext))
        return pa.table({
            "cap_bp": pa.array(rows_cap, pa.int64()),
            "revenue_e4": pa.array(rows_rev, pa.int64()),
            "n_lines": pa.array(rows_n, pa.int64())})

    return grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow"),
        ["cap_bp"], [("revenue_e4", "sum", "revenue_e4"),
                     ("n_lines", "sum", "n_lines")])


def discount_cap_whatif_sql() -> str:
    parts = []
    for c in DISCOUNT_CAPS_BP:
        parts.append(f"""
SELECT CAST({c} AS BIGINT) AS cap_bp,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                * (10000 - least(CAST(round(l_discount * 10000.0)
                                      AS BIGINT), {c}))) AS BIGINT)
         AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


def session_bounce_rate(sf_dir: str, gap_s: int = 1800,
                        coarse: int = 1024):
    """Bounce-rate by landing event type: sessions (30-min idle cut,
    event_id tiebreak — the shared sessionization rule) grouped by
    their FIRST event's type, reporting sessions and single-event
    bounces per landing type — the entry-page quality report.

    Shape: one user-keyed exchange; per bucket the session cut is the
    shared lexsort + gap cumsum, the landing type is the row at each
    session start, and the bounce test is a session-length bincount;
    output is type-domain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    gap_us = gap_s * 1_000_000

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def bounce(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"landing_type": pd.Series(dtype="object"),
                "n_sessions": pd.Series(dtype="int64"),
                "n_bounces": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        new_sess = new_user | (gap > gap_us)
        sid = np.cumsum(new_sess) - 1
        n_sess = int(sid[-1]) + 1
        sizes = np.bincount(sid, minlength=n_sess)
        landing = et[new_sess]
        out = pd.DataFrame({"landing_type": landing,
                            "n_sessions": np.ones(n_sess, np.int64),
                            "n_bounces": (sizes == 1).astype("int64")})
        return out.groupby("landing_type", as_index=False).sum()

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(bounce, batch_format="pandas"))
    return grouped_aggregate(parts, ["landing_type"],
                             [("n_sessions", "sum", "n_sessions"),
                              ("n_bounces", "sum", "n_bounces")])


def session_bounce_rate_sql(gap_s: int = 1800) -> str:
    return f"""
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {gap_s} * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, ts, event_id,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
p AS (
  SELECT user_id, sid,
         min_by(event_type, CAST(epoch_us(ts) AS HUGEINT) * 1000000000
                            + event_id) AS landing_type,
         count(*) AS n
  FROM s GROUP BY user_id, sid)
SELECT landing_type, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_bounces
FROM p GROUP BY landing_type"""


def events_interarrival_log2(sf_dir: str, coarse: int = 1024):
    """Latency-histogram (observability) shape: per event type, the
    log2-bucketed distribution of same-user interarrival gaps —
    bucket = bit_length(gap_us) - 1 = floor(log2 gap), computed EXACTLY
    on both sides (vectorized doubling bit-length on the engine,
    length(bin(gap)) string arithmetic in the oracle — IEEE log2 at
    power-of-two boundaries is exactly the kind of fp the repo bans).

    Shape: one user-keyed exchange, vectorized lag inside the bucket,
    (type, bucket)-domain counts out.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def _bit_length(x: np.ndarray) -> np.ndarray:
        # exact vectorized bit length (doubling trick, no fp log)
        b = np.zeros(len(x), np.int64)
        v = x.copy()
        for s in (32, 16, 8, 4, 2, 1):
            m = v >= (1 << s)
            b[m] += s
            v[m] >>= s
        return b + (v > 0)

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series(dtype="object"),
                "log2_bucket": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        same = np.concatenate(([False], u[1:] == u[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        sel = same & (gap > 0)
        bucket = _bit_length(gap[sel]) - 1
        out = pd.DataFrame({"event_type": et[sel],
                            "log2_bucket": bucket.astype("int64"),
                            "n": np.ones(int(sel.sum()), np.int64)})
        return out.groupby(["event_type", "log2_bucket"],
                           as_index=False).sum()

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(hist, batch_format="pandas"))
    return grouped_aggregate(parts, ["event_type", "log2_bucket"],
                             [("n", "sum", "n")])


def events_interarrival_log2_sql() -> str:
    return """
WITH l AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events),
b AS (
  SELECT event_type,
         CAST(length(bin(gap_us)) - 1 AS BIGINT) AS log2_bucket
  FROM l WHERE gap_us IS NOT NULL AND gap_us > 0)
SELECT event_type, log2_bucket, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY event_type, log2_bucket"""
