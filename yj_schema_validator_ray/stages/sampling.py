"""Deterministic sampling operators for training-data pipelines.

Sampling at corpus scale must be (a) a pure per-row function — no global
state, no RNG sequencing, so any worker can decide any row and reruns /
resumes pick the same rows — and (b) stable under repartitioning.  Both
operators key on ``md5(doc_id)``: the first 8 hex chars compared against
a rate threshold (hex strings compare like the numbers they encode), so
the DuckDB oracle can mirror the decision byte-for-byte.

- :func:`hash_sample` — uniform rate sample.
- :func:`mixture_sample` — per-source rates (the "training mix"): each
  source is independently downsampled to its target weight.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _hex_threshold(rate: float) -> str:
    rate = min(max(rate, 0.0), 1.0)
    v = int(rate * 16**8)
    if v >= 16**8:
        return "g"  # > every hex digit -> keeps all rows (rate 1.0)
    return format(v, "08x")


def _hex8(doc_ids) -> list[str]:
    return [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in doc_ids]


def hash_sample(docs_ds, rate: float, id_col: str = "doc_id"):
    """Deterministic uniform sample: keep rows with
    ``md5(id)[:8] < hex(rate * 16^8)``."""
    thr = _hex_threshold(rate)

    def f(batch: pa.Table) -> pa.Table:
        hx = _hex8(batch.column(id_col).to_pylist())
        return batch.filter(pa.array([h < thr for h in hx], pa.bool_()))

    return docs_ds.map_batches(f, batch_format="pyarrow")


def hash_sample_sql(rate: float, table: str = "documents",
                    id_col: str = "doc_id", columns: str = "doc_id") -> str:
    thr = _hex_threshold(rate)
    return (f"SELECT {columns} FROM {table} "
            f"WHERE substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) < '{thr}'")


def mixture_sample(docs_ds, rates: dict[str, float],
                   id_col: str = "doc_id", source_col: str = "source"):
    """Training-mix sampling: per-source keep rates (sources absent from
    ``rates`` are dropped).  Pure per-row decision — reproducible across
    reruns, resumes, and repartitioning."""
    thr = {s: _hex_threshold(r) for s, r in rates.items()}

    def f(batch: pa.Table) -> pa.Table:
        hx = _hex8(batch.column(id_col).to_pylist())
        src = batch.column(source_col).to_pylist()
        keep = [h < thr.get(s, "00000000") for h, s in zip(hx, src)]
        return batch.filter(pa.array(keep, pa.bool_()))

    return docs_ds.map_batches(f, batch_format="pyarrow")


def pack_sequences(docs_ds, budget: int = 512, bucket_size: int = 256):
    """Training-sequence packing (GPT-style concat-and-chunk): documents
    in ``doc_id`` order are laid end-to-end and the token stream is cut
    into fixed ``budget``-token sequences; each doc is assigned the
    sequence containing its first token.

    The global cumulative token count is a distributed PREFIX SUM:

    1. one pass computes per-doc token counts tagged with a contiguous
       range bucket (``doc_id // bucket_size``), materialized once
       (2 ints/doc — never the text);
    2. per-bucket token totals come back to the driver (``N/bucket_size``
       rows — size ``bucket_size`` to keep this in the thousands at any
       corpus scale) and exclusive bucket offsets are computed there;
    3. a bucket-partitioned second pass sorts each bucket by doc_id and
       adds bucket offset + in-bucket cumsum — no global sort, no
       driver-side row data.

    Output: (doc_id, n_tokens, tok_offset, seq_id).
    """
    def counts(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        n = pc.cast(pc.count_substring_regex(batch.column("text"), r"\w+"),
                    pa.int64())
        return pa.table({"doc_id": ids, "n_tokens": n})

    return pack_from_counts(docs_ds.map_batches(counts, batch_format="pyarrow"),
                            budget=budget, bucket_size=bucket_size)


def pack_from_counts(cnt_ds, budget: int = 512, bucket_size: int = 256):
    """The distributed prefix-sum core of :func:`pack_sequences`, over a
    pre-computed ``(doc_id, n_tokens)`` dataset — lets composition
    pipelines (quality gate -> dedup -> pack) feed their own kept set."""
    from .exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = pa.array(batch.column("doc_id").to_numpy() // bucket_size,
                          pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": batch.column("n_tokens"),
                         "bucket": bucket})

    cnt = cnt_ds.map_batches(add_bucket, batch_format="pyarrow").materialize()
    btot = grouped_aggregate(
        cnt, ["bucket"], [("n_tokens", "sum", "bucket_tokens")]).to_pandas()
    btot = btot.sort_values("bucket")
    excl = np.concatenate(([0], np.cumsum(btot["bucket_tokens"].to_numpy())))[:-1]
    offs = dict(zip(btot["bucket"].astype(int), excl.astype(int)))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        start = offs[int(g["bucket"].iloc[0])]
        off = (g["n_tokens"].cumsum().shift(fill_value=0) + start).astype("int64")
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_tokens": g["n_tokens"].astype("int64"),
            "tok_offset": off,
            "seq_id": (off // budget).astype("int64"),
        })

    return (cnt.groupby("bucket", num_partitions=shuffle_partitions())
            .map_groups(pack, batch_format="pandas"))


def weighted_sample(docs_ds, scale_tokens: int = 200):
    """Token-WEIGHTED deterministic sampling: keep probability
    ``min(1, n_tokens/scale_tokens)`` per document — substantial docs
    survive, fragments are thinned proportionally (the length-weighted
    mix stage).  Decision stays a pure per-row function of
    ``(md5(doc_id), n_tokens)`` — rerun/resume/repartition stable, and
    mirrored digit-for-digit by the SQL oracle (same float rate, same
    truncation, same hex compare)."""
    def f(batch: pa.Table) -> pa.Table:
        hx = _hex8(batch.column("doc_id").to_pylist())
        ntok = pc.cast(pc.count_substring_regex(batch.column("text"), r"\w+"),
                       pa.int64()).to_numpy()
        keep = [h < _hex_threshold(n / scale_tokens)
                for h, n in zip(hx, ntok)]
        return batch.filter(pa.array(keep, pa.bool_()))

    return docs_ds.map_batches(f, batch_format="pyarrow")


def weighted_sample_sql(scale_tokens: int = 200, table: str = "documents",
                        columns: str = "doc_id") -> str:
    # mirrors _hex_threshold: rate>=1 -> 'g' (keeps everything);
    # else lower-hex of floor(rate * 16^8), zero-padded to 8
    ntok = r"len(regexp_extract_all(text, '\w+'))"
    return (f"SELECT {columns} FROM {table} "
            f"WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < "
            f"(CASE WHEN {ntok} >= {scale_tokens} THEN 'g' "
            f"ELSE lower(lpad(to_hex(CAST(floor("
            f"CAST({ntok} AS DOUBLE) / {scale_tokens} * 4294967296.0"
            f") AS BIGINT)), 8, '0')) END)")


def stratified_sample(docs_ds, n_per_group: int, group_col: str = "source",
                      id_col: str = "doc_id"):
    """Deterministic fixed-size per-group sample: the ``n_per_group``
    rows with the smallest ``(md5(id), id)`` rank inside each group —
    i.e. a uniform-without-replacement sample that is reproducible
    across reruns, resumes, and repartitioning (same property as
    :func:`hash_sample`, but with an exact per-group SIZE instead of an
    expected rate).

    Distributed top-N-per-group: each batch keeps its local N smallest
    per group (so at most ``blocks * N`` rows per group shuffle), then
    one exchange per group finishes the selection.  Group count is
    assumed small (sources, languages, shards); high-cardinality groups
    would route through the coarse-hash exchange instead.
    """
    def local(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            id_col: batch.column(id_col).to_pandas(),
            group_col: batch.column(group_col).to_pandas(),
            "__hex": _hex8(batch.column(id_col).to_pylist()),
        })
        keep = (df.sort_values(["__hex", id_col])
                .groupby(group_col, sort=False).head(n_per_group))
        return pa.Table.from_pandas(keep, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["__hex", id_col]).head(n_per_group)
               [[id_col, group_col]])
        return out.reset_index(drop=True)

    return (docs_ds.map_batches(local, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(final, batch_format="pandas"))


def stratified_sample_sql(n_per_group: int, table: str = "documents",
                          group_col: str = "source",
                          id_col: str = "doc_id") -> str:
    return (f"SELECT {id_col}, {group_col} FROM ("
            f"SELECT {id_col}, {group_col}, row_number() OVER ("
            f"PARTITION BY {group_col} "
            f"ORDER BY substr(md5(CAST({id_col} AS VARCHAR)), 1, 8), {id_col}"
            f") AS r FROM {table}) WHERE r <= {n_per_group}")


def pack_sequences_sql(budget: int = 512, table: str = "documents") -> str:
    return rf"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens
  FROM {table}
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_offset
  FROM t
)
SELECT doc_id, n_tokens, tok_offset,
       CAST(floor(tok_offset / {budget}.0) AS BIGINT) AS seq_id
FROM c"""


def mixture_sample_sql(rates: dict[str, float], table: str = "documents",
                       id_col: str = "doc_id", source_col: str = "source",
                       columns: str = "doc_id, source") -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN '{_hex_threshold(r)}'" for s, r in sorted(rates.items()))
    return (f"SELECT {columns} FROM {table} "
            f"WHERE substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) "
            f"< (CASE {source_col} {whens} ELSE '00000000' END)")


def sample_intersection(docs_ds, rate: float = 0.3, n_per_group: int = 10,
                        group_col: str = "source", id_col: str = "doc_id"):
    """Distributed set INTERSECTION of two sampling strategies: the
    documents selected by BOTH the uniform hash sample and the
    stratified per-group sample — the audit that tells you how much
    two candidate training subsets overlap before committing to one.

    Both inputs are corpus-scale fractions, so neither broadcasts: the
    two id sets co-locate through one id-keyed coarse exchange of
    side-tagged rows and intersect per group (classic INTERSECT plan).
    Both sampling rules are themselves SQL-mirrored, so the
    intersection oracle is their queries joined on the id.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    a = hash_sample(docs_ds, rate, id_col=id_col)
    b = stratified_sample(docs_ds, n_per_group, group_col=group_col,
                          id_col=id_col)
    coarse = 1024

    def tag(side):
        def f(t: pa.Table) -> pa.Table:
            ids = pc.cast(t.column(id_col), pa.int64())
            n = t.num_rows
            return pa.table({
                id_col: ids,
                "in_a": pa.array(np.full(n, 1 - side, np.int64)),
                "in_b": pa.array(np.full(n, side, np.int64)),
                "__coarse": pa.array(
                    coarse_mix(ids.to_numpy(), coarse - 1), pa.int64()),
            })
        return f

    def intersect(g):
        agg = g.groupby(id_col, sort=False).agg(
            in_a=("in_a", "max"), in_b=("in_b", "max"))
        keep = agg[(agg["in_a"] == 1) & (agg["in_b"] == 1)]
        return keep.reset_index()[[id_col]]

    return (a.map_batches(tag(0), batch_format="pyarrow")
            .union(b.map_batches(tag(1), batch_format="pyarrow"))
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(intersect, batch_format="pandas"))


def sample_intersection_sql(rate: float = 0.3, n_per_group: int = 10,
                            table: str = "documents",
                            group_col: str = "source",
                            id_col: str = "doc_id") -> str:
    return (f"SELECT {id_col} FROM ("
            f"{hash_sample_sql(rate, table, id_col, id_col)}) "
            f"INTERSECT SELECT {id_col} FROM ("
            f"{stratified_sample_sql(n_per_group, table, group_col, id_col)})")


def epoch_mixture(docs_ds, rates: dict[str, float],
                  id_col: str = "doc_id", source_col: str = "source"):
    """Training-mix UPSAMPLING: per-source effective-epoch rates that
    may exceed 1 (the repeat-and-sample mix of modern LLM recipes —
    e.g. rate 2.5 = two full copies of every doc plus a deterministic
    half sample as the third epoch).  Emits one row per (doc, epoch)
    with an ``epoch`` column (0-based); sources absent from ``rates``
    are dropped.

    Decision stays a pure per-row function: epoch ``e < floor(rate)``
    always survives; the single fractional epoch ``e = floor(rate)``
    keeps the doc iff ``md5(doc_id || ':' || e)[:8] < frac`` — keyed on
    (id, epoch) so the fractional epoch's subset is INDEPENDENT of the
    rate-1 sample and stable under rerun/resume/repartition.  Mirrored
    digit-for-digit by the SQL oracle.
    """
    ceil_r = {s: int(np.ceil(r)) for s, r in rates.items()}
    floor_r = {s: int(np.floor(r)) for s, r in rates.items()}
    frac_thr = {s: _hex_threshold(r - np.floor(r)) for s, r in rates.items()}

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        srcs = batch.column(source_col).to_pylist()
        idx_out: list[int] = []
        epochs: list[int] = []
        for i, (d, s) in enumerate(zip(ids, srcs)):
            n_full = floor_r.get(s)
            if n_full is None:
                continue
            for e in range(n_full):
                idx_out.append(i)
                epochs.append(e)
            if ceil_r[s] > n_full:
                e = n_full
                hx = hashlib.md5(f"{d}:{e}".encode()).hexdigest()[:8]
                if hx < frac_thr[s]:
                    idx_out.append(i)
                    epochs.append(e)
        out = batch.take(pa.array(idx_out, pa.int64()))
        return out.append_column("epoch", pa.array(epochs, pa.int64()))

    return docs_ds.map_batches(f, batch_format="pyarrow")


def epoch_mixture_sql(rates: dict[str, float], table: str = "documents",
                      id_col: str = "doc_id", source_col: str = "source",
                      columns: str = "doc_id, source") -> str:
    """One row per (doc, epoch): full epochs unconditionally, the
    fractional epoch through the same md5((id, epoch)) gate."""
    max_ceil = max(int(np.ceil(r)) for r in rates.values()) if rates else 0
    srcs = ", ".join(f"'{s}'" for s in rates)
    floor_case = " ".join(
        f"WHEN '{s}' THEN {int(np.floor(r))}" for s, r in rates.items())
    thr_case = " ".join(
        f"WHEN '{s}' THEN '{_hex_threshold(r - np.floor(r))}'"
        for s, r in rates.items())
    return f"""
SELECT {columns}, CAST(e.epoch AS BIGINT) AS epoch
FROM {table}
CROSS JOIN (SELECT unnest(range({max_ceil})) AS epoch) e
WHERE {source_col} IN ({srcs})
  AND (e.epoch < (CASE {source_col} {floor_case} END)
       OR (e.epoch = (CASE {source_col} {floor_case} END)
           AND substr(md5(CAST({id_col} AS VARCHAR) || ':' ||
                          CAST(e.epoch AS VARCHAR)), 1, 8)
               < (CASE {source_col} {thr_case} END)))"""


def exact_split(docs_ds, train_frac: float = 0.8, val_frac: float = 0.1,
                coarse: int = 1024):
    """EXACT-proportion stratified train/val/test split: within each
    ``source``, rank documents by ``(md5(text), doc_id)`` and cut at
    exactly ``floor(train_frac*n)`` / ``floor(val_frac*n)`` rows —
    unlike :func:`hash_sample` (whose per-row threshold
    only hits the rate in expectation), this delivers the precise split
    sizes an eval protocol demands, deterministically.

    Distributed rank without a global sort (the
    :func:`~.rank.docs_length_rank` two-phase histogram pattern, keyed
    here by the first md5 byte): pass 1 counts (source, byte-bucket)
    occupancy — a 256 x |sources| histogram — and the driver turns it
    into per-bucket rank OFFSETS; pass 2 co-locates each (source,
    bucket), sorts the bucket locally by (md5, doc_id), and adds the
    offset.  Text never moves (only id + 32-byte digest cross the
    exchange); driver state is the tiny histogram.

    Output: ``(doc_id, source, rk, split)`` with ``rk`` the 1-based
    within-source rank.
    """
    import ray

    from ..util import collect_small_arrow, process_cached, ref_key, \
        shuffle_partitions
    from .exact_agg import grouped_aggregate, hash_columns

    def digest_rows(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(t.encode("utf-8")).hexdigest()
             for t in df["text"]]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "source": df["source"].to_numpy(object),
            "h": h,
            "bucket": np.array([int(x[:2], 16) for x in h], np.int64)})

    digests = docs_ds.map_batches(digest_rows,
                                  batch_format="pandas").materialize()

    hist = collect_small_arrow(grouped_aggregate(
        digests, ["source", "bucket"], [("", "count", "n")],
        num_partitions=min(8, shuffle_partitions()))).to_pandas()
    offsets: dict = {}
    cuts: dict = {}
    for src, g in hist.groupby("source", sort=False):
        g = g.sort_values("bucket")
        n = int(g["n"].sum())
        cum = np.concatenate([[0], np.cumsum(g["n"].to_numpy())[:-1]])
        for b, off in zip(g["bucket"].to_numpy(), cum):
            offsets[(src, int(b))] = int(off)
        n_train = int(np.floor(train_frac * n))
        n_val = int(np.floor(val_frac * n))
        cuts[src] = (n_train, n_train + n_val)
    ref = ray.put((offsets, cuts))

    def add_coarse(t: pa.Table) -> pa.Table:
        kh = hash_columns(t.select(["source", "bucket"]))
        return t.append_column(
            "__coarse",
            pa.array((kh & np.uint64(coarse - 1)).astype(np.int64)))

    class RankGroup:
        def __init__(self, r):
            self.offsets, self.cuts = ray.get(r)

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for (src, b), blk in g.groupby(["source", "bucket"],
                                           sort=False):
                blk = blk.sort_values(["h", "doc_id"], kind="mergesort")
                rk = (np.arange(1, len(blk) + 1, dtype=np.int64)
                      + self.offsets[(src, int(b))])
                t_cut, v_cut = self.cuts[src]
                split = np.where(rk <= t_cut, "train",
                                 np.where(rk <= v_cut, "val", "test"))
                outs.append(pd.DataFrame({
                    "doc_id": blk["doc_id"].to_numpy(np.int64),
                    "source": blk["source"].to_numpy(object),
                    "rk": rk,
                    "split": split.astype(object)}))
            return pd.concat(outs, ignore_index=True)

    return (digests.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(process_cached(RankGroup, ref_key(ref), ref),
                        batch_format="pandas"))


def exact_split_sql(train_frac: float = 0.8, val_frac: float = 0.1) -> str:
    return f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(text), doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
       CASE WHEN rk <= CAST(floor({train_frac} * n) AS BIGINT)
              THEN 'train'
            WHEN rk <= CAST(floor({train_frac} * n) AS BIGINT)
                     + CAST(floor({val_frac} * n) AS BIGINT)
              THEN 'val'
            ELSE 'test' END AS split
FROM r"""


# --- DSIR importance resampling --------------------------------------

_DSIR_BUCKET_CACHE: dict[str, int] = {}


def _gram_buckets(tokens) -> np.ndarray:
    """md5-first-byte bucket (0-255) per token, cached per worker
    process so md5 runs once per DISTINCT token, not per occurrence.
    Bounded: vocabularies are heavy-tailed, so the hot head repopulates
    instantly after the rare reset."""
    cache = _DSIR_BUCKET_CACHE
    if len(cache) > 2_000_000:
        cache.clear()
    out = np.empty(len(tokens), np.int64)
    for i, t in enumerate(tokens):
        b = cache.get(t)
        if b is None:
            b = cache[t] = int(hashlib.md5(t.encode()).hexdigest()[:2], 16)
        out[i] = b
    return out


def dsir_select(docs_ds, target_source: str = "src0", k: int = 100,
                scale: int = 1_000_000):
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    rank every RAW document by a hashed-unigram importance score
    against a TARGET domain and keep the top-``k``.

    Importance weights are exact integers so the DuckDB oracle matches
    bit-for-bit: per bucket ``b`` (first md5 byte of the token),
    ``w_b = (scale * (ct_b + 1)) // (cr_b + 1)`` — the add-one-smoothed
    target/raw ratio under floor division.  A doc's score sums ``w_b``
    over its token OCCURRENCES: the same per-bucket-monotone ranking as
    the paper's sum of log-ratios, with no fp summation-order hazard.

    Scale shape: bucket statistics are FIXED-width (256 rows) — cheap
    per-batch partials -> one tiny :func:`~.exact_agg.grouped_aggregate`
    -> driver; the weight table ships to the scorers as a 256-int
    constant (nation-style inline broadcast, never per-batch).  Two
    streaming passes over the corpus, nothing corpus-sized anywhere.
    Docs with zero tokens score nothing and drop, like the SQL join.
    """
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate
    from .text import WORD_RE

    def bucket_partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        is_t = (batch["source"] == target_source).to_numpy()
        ct = np.zeros(256, np.int64)
        cr = np.zeros(256, np.int64)
        for tgt, ts in zip(is_t, toks):
            if ts:
                np.add.at(ct if tgt else cr, _gram_buckets(ts), 1)
        return pd.DataFrame({"b": np.arange(256, dtype=np.int64),
                             "ct": ct, "cr": cr})

    stats = collect_small_arrow(grouped_aggregate(
        docs_ds.map_batches(bucket_partials, batch_format="pandas"),
        ["b"], [("ct", "sum", "ct"), ("cr", "sum", "cr")]))
    ct = np.zeros(256, np.int64)
    cr = np.zeros(256, np.int64)
    bi = stats.column("b").to_numpy()
    ct[bi] = stats.column("ct").to_numpy()
    cr[bi] = stats.column("cr").to_numpy()
    # positive int64 floor division == Python // == DuckDB // exactly
    w = (int(scale) * (ct + 1)) // (cr + 1)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["source"] != target_source]
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        ids: list[int] = []
        scores: list[int] = []
        for did, ts in zip(batch["doc_id"].to_numpy(), toks):
            if ts:
                ids.append(int(did))
                scores.append(int(w[_gram_buckets(ts)].sum()))
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "dsir_score": pd.Series(scores,
                                                     dtype="int64")})

    return (docs_ds.map_batches(score, batch_format="pandas")
            .sort(["dsir_score", "doc_id"], descending=[True, False])
            .limit(k))


def dsir_select_sql(target_source: str = "src0", k: int = 100,
                    scale: int = 1_000_000) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(lower(text), '[0-9A-Za-z_]+')) AS g
  FROM documents),
bt AS (
  SELECT substr(md5(g), 1, 2) AS b,
         SUM(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN source <> '{target_source}' THEN 1 ELSE 0 END) AS cr
  FROM toks GROUP BY 1),
w AS (SELECT b, ({scale} * (ct + 1)) // (cr + 1) AS w FROM bt),
scored AS (
  SELECT t.doc_id, SUM(w.w) AS dsir_score
  FROM toks t JOIN w ON substr(md5(t.g), 1, 2) = w.b
  WHERE t.source <> '{target_source}'
  GROUP BY t.doc_id)
SELECT doc_id, CAST(dsir_score AS BIGINT) AS dsir_score
FROM scored ORDER BY dsir_score DESC, doc_id LIMIT {k}"""


def source_nucleus(docs_ds, pct: int = 90):
    """Top-p ("nucleus") selection per source: within each source keep
    the highest-scoring docs (score = char length; ties by lower
    doc_id) until the running score reaches pct% of the source's total
    — the grouped variant of the global ``docs_token_budget`` gate
    (per-mixture-component quality budgeting).  A doc is kept while
    the running total BEFORE it is < pct% of the source total, in
    EXACT integer arithmetic (cum_before * 100 < tot * pct).

    Shape: per-batch (source, doc_id, score) int rows only — text
    never moves — through one source-keyed coarse exchange; the
    per-bucket gate is one vectorized lexsort + cumsum per source run.
    Output is source-domain-sized (n_kept, kept_score, tot_score).
    """
    import ray.data  # noqa: F401

    from .dedup import coarse_mix
    from .exact_agg import _hash_string_array
    from ..util import shuffle_partitions

    def rows(t: pa.Table) -> pa.Table:
        score = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        kh = _hash_string_array(src)
        return pa.table({
            "source": src,
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "score": score,
            "__coarse": pa.array(
                coarse_mix(kh.astype(np.int64), 1023), pa.int64())})

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": pd.Series(dtype="object"),
                "n_kept": pd.Series(dtype="int64"),
                "kept_score": pd.Series(dtype="int64"),
                "tot_score": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        src = g["source"].to_numpy()
        order = np.lexsort((g["doc_id"].to_numpy(),
                            -g["score"].to_numpy(), src))
        src, score = src[order], g["score"].to_numpy()[order]
        starts = np.concatenate(([0], np.flatnonzero(
            src[1:] != src[:-1]) + 1))
        cum = np.cumsum(score)
        base = np.repeat(np.concatenate(([0], cum[starts[1:] - 1])),
                         np.diff(np.concatenate((starts, [len(src)]))))
        ends = np.concatenate((starts[1:], [len(src)]))
        tot = np.repeat(cum[ends - 1] - np.concatenate(
            ([0], cum[starts[1:] - 1])), ends - starts)
        cum_before = cum - score - base
        kept = cum_before * 100 < tot * pct
        out = pd.DataFrame({"source": src, "score": score,
                            "kept": kept, "tot": tot})
        r = out.groupby("source", as_index=False).agg(
            n_kept=("kept", "sum"),
            kept_score=("score", lambda s: 0),  # replaced below
            tot_score=("tot", "first"))
        ks = (out[out["kept"]].groupby("source")["score"].sum()
              .reindex(r["source"]).fillna(0).astype("int64"))
        r["kept_score"] = ks.to_numpy()
        r["n_kept"] = r["n_kept"].astype("int64")
        r["tot_score"] = r["tot_score"].astype("int64")
        return r[["source", "n_kept", "kept_score", "tot_score"]]

    return (docs_ds.map_batches(rows, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(gate, batch_format="pandas"))


def source_nucleus_sql(pct: int = 90) -> str:
    return f"""
WITH s AS (
  SELECT source, doc_id, CAST(length(text) AS BIGINT) AS score
  FROM documents),
t AS (SELECT source, sum(score) AS tot FROM s GROUP BY source),
c AS (
  SELECT s.source, s.score, t.tot,
         sum(s.score) OVER (PARTITION BY s.source
                            ORDER BY s.score DESC, s.doc_id
                            ROWS UNBOUNDED PRECEDING) - s.score
           AS cum_before
  FROM s JOIN t ON t.source = s.source)
SELECT source,
       CAST(count(*) FILTER (WHERE cum_before * 100 < tot * {pct})
            AS BIGINT) AS n_kept,
       CAST(coalesce(sum(score) FILTER (WHERE cum_before * 100
                                              < tot * {pct}), 0)
            AS BIGINT) AS kept_score,
       CAST(max(tot) AS BIGINT) AS tot_score
FROM c GROUP BY source"""


def sampled_count_estimate(sf_dir: str, rate: float = 0.1):
    """Approximate query processing with a DETERMINISTIC sample: the
    per-type event counts estimated from the md5-rule ``rate`` sample
    (est = sample_n * 4294967296 // threshold-int — the exact
    Horvitz-Thompson inverse of the hash-rule inclusion probability),
    reported beside the true counts and the exact integer error in
    basis points.  Because the sample rule is the pure md5 threshold,
    the ESTIMATE ITSELF is SQL-reproducible bit-for-bit — the AQP
    operator whose accuracy the driver can hash-check, not just bound.

    Shape: one zero-shuffle scan computes BOTH sides per batch (full
    partial + sampled partial); one type-domain exchange merges.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    thr = _hex_threshold(rate)
    thr_int = int(rate * 16 ** 8)

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_pylist()
        hx = _hex8(ids)
        in_sample = pa.array([h < thr for h in hx], pa.bool_())
        return pa.table({
            "event_type": t.column("event_type"),
            "true_n": pa.array(np.ones(t.num_rows, np.int64)),
            "sample_n": pc.cast(in_sample, pa.int64())})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type"])
    agg = grouped_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], [("true_n", "sum", "true_n"),
                         ("sample_n", "sum", "sample_n")])

    def finish(t: pa.Table) -> pa.Table:
        tn = t.column("true_n").to_numpy()
        sn = t.column("sample_n").to_numpy()
        est = sn * (16 ** 8) // thr_int
        err_bp = np.abs(est - tn) * 10_000 // np.maximum(tn, 1)
        return pa.table({
            "event_type": t.column("event_type"),
            "true_n": t.column("true_n"),
            "est_n": pa.array(est, pa.int64()),
            "err_bp": pa.array(err_bp, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def sampled_count_estimate_sql(rate: float = 0.1) -> str:
    thr = _hex_threshold(rate)
    thr_int = int(rate * 16 ** 8)
    return f"""
WITH a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS true_n,
         CAST(count(*) FILTER (
           WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < '{thr}')
           AS BIGINT) AS sample_n
  FROM events GROUP BY event_type)
SELECT event_type, true_n,
       CAST(sample_n * {16 ** 8} // {thr_int} AS BIGINT) AS est_n,
       CAST(abs(sample_n * {16 ** 8} // {thr_int} - true_n) * 10000
            // greatest(true_n, 1) AS BIGINT) AS err_bp
FROM a"""
