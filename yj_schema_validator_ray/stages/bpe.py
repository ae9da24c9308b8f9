"""Byte-level BPE tokenization (GPT-2-style): distributed merge-table
training on a bounded deterministic sample + a stateful encode stage.

This is the heavy-state tokenize stage of an LLM data pipeline: the
merge table is trained ONCE (driver-coordinated, corpus-side counting),
shipped via ``ray.put``, and each worker builds its rank table + encode
cache once per process / actor — never per batch.

Training (classic BPE, Sennrich et al. 2016 / GPT-2 byte-level):

1. deterministic hash sample of documents (``sampling.hash_sample`` —
   spans every block, reproducible across reruns/resumes);
2. pre-tokenize with the shared RE2-legal GPT-2 split (``text.BPE_RE``)
   and count UNIQUE pre-tokens through one ``exact_agg`` exchange —
   only (pretoken, count) rows reach the driver (vocab-sized, bounded
   by ``max_pretokens``);
3. driver loop: repeatedly merge the most-frequent adjacent symbol
   pair (ties break on the lexicographically smallest pair, so the
   table is deterministic), ``num_merges`` times.

Encoding: per pre-token, the standard lowest-rank-first merge loop
over its byte sequence, memoized per unique pre-token (Zipf makes the
cache hit rate very high).  Vocabulary: ids 0..255 are raw bytes, id
256+i is merge i — byte-level BPE is LOSSLESS, so decode(encode(x))
== x exactly, which is what the driver-facing certificate pins.

Reference analogue: none in alexmond/yj-schema-validator (this is from
the LLM-pipeline brief); the split regex is shared with
``text.token_counts_bpe`` (`text.py` BPE_RE).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import BPE_RE

_SPLIT = re.compile(BPE_RE)  # ASCII/RE2-compatible (no lookahead)


def train_bpe_merges(docs_ds, num_merges: int = 256,
                     sample_rate: float = 1.0,
                     max_pretokens: int = 2_000_000
                     ) -> list[tuple[bytes, bytes]]:
    """Train a deterministic BPE merge table.

    ``sample_rate`` < 1 gates documents through the md5 hash sample
    (use it at corpus scale — merge quality saturates quickly);
    pre-token counting is fully distributed either way, and only the
    deduplicated (pretoken, count) vocabulary reaches the driver
    (``max_pretokens`` guards the driver-state cliff explicitly, the
    same contract as ``tfidf_top_terms``'s max_vocab).
    """
    from .exact_agg import grouped_aggregate
    from .sampling import hash_sample

    ds = docs_ds
    if sample_rate < 1.0:
        ds = hash_sample(ds, sample_rate, id_col="doc_id")

    def pretoken_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts: dict[str, int] = {}
        for t in texts:
            for tok in _SPLIT.findall(t):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({
            "pretoken": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        })

    vocab_ds = grouped_aggregate(
        ds.map_batches(pretoken_counts, batch_format="pyarrow"),
        ["pretoken"], [("n", "sum", "n")])
    from ..util import collect_small_arrow

    vocab_tbl = collect_small_arrow(vocab_ds.materialize())
    if vocab_tbl.num_columns and vocab_tbl.num_rows > max_pretokens:
        raise ValueError(
            f"train_bpe_merges: {vocab_tbl.num_rows:,} distinct "
            f"pre-tokens exceed max_pretokens={max_pretokens:,}; "
            "lower sample_rate")
    if vocab_tbl.num_columns == 0 or vocab_tbl.num_rows == 0:
        return []
    pretokens = vocab_tbl.column("pretoken").to_pylist()
    freqs = vocab_tbl.column("n").to_pylist()

    # driver merge loop over the (unique-pretoken -> symbol tuple) map
    words: list[list[bytes]] = [
        [bytes([b]) for b in p.encode("utf-8")] for p in pretokens]
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[bytes, bytes], int] = {}
        for syms, f in zip(words, freqs):
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                pair_counts[pr] = pair_counts.get(pr, 0) + f
        if not pair_counts:
            break
        # deterministic: max count, ties -> lexicographically least pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i:i + 2] = [joined]
                else:
                    i += 1
    return merges


class BPEEncoder:
    """Stateful encode stage: rank table + decode table + per-pretoken
    memo built ONCE (per actor / per worker process), then per batch:
    pre-token split, memoized merge loop, per-doc token-id arrays.

    Emits (doc_id, n_bytes, n_bpe_tokens, token_sum, roundtrip_ok):
    ``roundtrip_ok`` re-decodes every document from its token ids and
    compares bytes — the lossless-coding certificate."""

    def __init__(self, merges_ref):
        import ray

        merges = (ray.get(merges_ref)
                  if not isinstance(merges_ref, list) else merges_ref)
        self.ranks: dict[tuple[bytes, bytes], int] = {
            pr: i for i, pr in enumerate(merges)}
        # vocab: 0..255 raw bytes, 256+i = merge i
        self.vocab_ids: dict[bytes, int] = {
            bytes([b]): b for b in range(256)}
        self.decode_tbl: list[bytes] = [bytes([b]) for b in range(256)]
        for a, b in merges:
            self.vocab_ids[a + b] = len(self.decode_tbl)
            self.decode_tbl.append(a + b)
        self._memo: dict[str, list[int]] = {}

    def encode_pretoken(self, tok: str) -> list[int]:
        ids = self._memo.get(tok)
        if ids is not None:
            return ids
        syms = [bytes([b]) for b in tok.encode("utf-8")]
        while len(syms) > 1:
            # lowest-rank adjacent pair merges first (GPT-2 order)
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        ids = [self.vocab_ids[s] for s in syms]
        if len(self._memo) > 1_000_000:  # bound long-lived workers
            self._memo.clear()
        self._memo[tok] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for tok in _SPLIT.findall(text):
            out.extend(self.encode_pretoken(tok))
        return out

    def decode(self, ids) -> bytes:
        return b"".join(self.decode_tbl[i] for i in ids)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, np.int64)
        tok_sum = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            n_tok[i] = len(ids)
            tok_sum[i] = int(sum(ids))
            ok[i] = self.decode(ids) == t.encode("utf-8")
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "n_bytes": pc.cast(pc.binary_length(
                pc.cast(batch.column("text"), pa.binary())), pa.int64()),
            "n_bpe_tokens": pa.array(n_tok),
            "token_sum": pa.array(tok_sum),
            "roundtrip_ok": pa.array(ok),
        })


def tokenize_bpe(docs_ds, num_merges: int = 256,
                 sample_rate: float = 1.0, mode: str = "tasks"):
    """Train-then-encode over the documents table.

    Output per doc: (doc_id, n_bytes, n_bpe_tokens, tokens_le_bytes,
    roundtrip_ok) — ``n_bytes`` is SQL-exact (octet_length), the two
    booleans are engine-verified certificates the oracle pins TRUE
    (byte-level BPE never exceeds one token per byte and decodes
    losslessly; any plumbing bug flips a row to FALSE and fails the
    value-hash).  ``n_bpe_tokens`` itself is checked by the closed-loop
    pytest against a reference encoder (SQL cannot apply a merge
    table).

    ``mode='tasks'`` (default) ships the merge table via ``ray.put`` +
    per-process cache; ``mode='actor'`` runs the encoder as an actor
    pool (`util.default_pool`) — the heavy-state showcase, same
    results."""
    import ray

    from ..util import default_pool, process_cached, ref_key

    merges = train_bpe_merges(docs_ds, num_merges=num_merges,
                              sample_rate=sample_rate)
    ref = ray.put(merges)

    def project(t: pa.Table) -> pa.Table:
        keep = t.select(["doc_id", "n_bytes", "n_bpe_tokens",
                         "roundtrip_ok"])
        le = pc.less_equal(t.column("n_bpe_tokens"), t.column("n_bytes"))
        return keep.append_column("tokens_le_bytes", le).select(
            ["doc_id", "n_bytes", "n_bpe_tokens", "tokens_le_bytes",
             "roundtrip_ok"])

    if mode == "actor":
        enc = docs_ds.map_batches(BPEEncoder, fn_constructor_args=(ref,),
                                  concurrency=default_pool(),
                                  batch_format="pyarrow")
    else:
        enc = docs_ds.map_batches(
            process_cached(BPEEncoder, ref_key(ref), ref),
            batch_format="pyarrow")
    return enc.map_batches(project, batch_format="pyarrow")


def tokenize_bpe_cert(docs_ds, num_merges: int = 256,
                      sample_rate: float = 1.0):
    """Driver-facing oracled projection of :func:`tokenize_bpe`:
    (doc_id, n_bytes, tokens_le_bytes, roundtrip_ok)."""
    out = tokenize_bpe(docs_ds, num_merges=num_merges,
                       sample_rate=sample_rate)
    return out.map_batches(
        lambda t: t.select(["doc_id", "n_bytes", "tokens_le_bytes",
                            "roundtrip_ok"]),
        batch_format="pyarrow")


def tokenize_bpe_cert_sql() -> str:
    return """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       TRUE AS tokens_le_bytes,
       TRUE AS roundtrip_ok
FROM documents"""
