"""Deterministic hash-mod sampling (SURVEY §2 "Sorts/sampling" note).

The reference has no sampling; large-scale pipelines need a *deterministic*,
partition-invariant sample (same rows on every run / cluster size) for test
corpora and presampling — ``ds.random_sample`` is seed-per-task and not
reproducible across executions. Here: keep a row iff
``((key mod 2^32) * 2654435761) mod 2^32 < rate * 2^32`` (Knuth
multiplicative hash). Every op is exact integer arithmetic, expressible
identically in DuckDB HUGEINT (the oracle twin in ``__ray_entry__``), and
key-wraparound-safe at any id magnitude.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def sample_threshold(rate: float) -> int:
    """Bucket threshold for a sampling rate (truncating, like the SQL twin)."""
    return int(rate * (1 << 32))


def hash_mod_sample(ds: rd.Dataset, key_col: str, rate: float,
                    columns: list[str] | None = None) -> rd.Dataset:
    """Deterministic sample of ``ds`` on an integer key column.

    A pure per-batch filter: no shuffle, no state, invariant under any
    repartitioning — the 100 TB-safe way to cut a reproducible slice.
    """
    thr = np.uint64(sample_threshold(rate))

    def keep(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = ((ids % _MOD32) * _KNUTH) % _MOD32 < thr
        out = t.filter(pa.array(mask))
        return out.select(columns) if columns else out

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_events(sf_dir: str, rate: float = 0.25) -> rd.Dataset:
    """Driver-contract entry: deterministic 25% sample of the events table."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id"])
    return hash_mod_sample(ds, "event_id", rate)


DEFAULT_LANG_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25}
DEFAULT_OTHER_RATE = 0.125


def sample_docs_by_lang(sf_dir: str,
                        rates: dict[str, float] | None = None,
                        other_rate: float = DEFAULT_OTHER_RATE) -> rd.Dataset:
    """Stratified deterministic sample: per-language keep rates (the
    standard pre-training language-rebalancing pass), same hash-mod rule as
    :func:`hash_mod_sample` so it stays partition-invariant and
    SQL-oracle-checkable. Output: doc_id, lang.
    """
    rates = DEFAULT_LANG_RATES if rates is None else rates
    thr = {lang: np.uint64(sample_threshold(r)) for lang, r in rates.items()}
    other = np.uint64(sample_threshold(other_rate))
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        buckets = ((ids % _MOD32) * _KNUTH) % _MOD32
        limits = _per_lang_values(t["lang"], thr, other)
        return t.filter(pa.array(buckets < limits))

    return ds.map_batches(keep, batch_format="pyarrow")


def _per_lang_values(col, table: dict[str, np.uint64],
                     default: np.uint64) -> np.ndarray:
    """Per-row threshold lookup, one Python dict get per DISTINCT lang
    (dictionary-encode + gather), not per row — the fromiter loop this
    replaces was the whole cost of the filter stage."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    codes = pc.fill_null(enc.indices, len(enc.dictionary)) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    langs = enc.dictionary.to_pylist() + [None]
    per_code = np.fromiter((table.get(g, default) for g in langs),
                           dtype=np.uint64, count=len(langs))
    return per_code[codes]


def docs_per_source_cap(sf_dir: str, cap: int = 20) -> rd.Dataset:
    """Per-source document quota: keep the ``cap`` lowest doc_ids per source.

    The standard web-pipeline per-domain cap (one domain must not dominate a
    training mix). Deterministic total order (source, doc_id) makes it
    reproducible and SQL-oracle-checkable (ROW_NUMBER <= cap). Runs as a
    bounded-part shuffle + one vectorized segmented rank per part — no
    per-source Python call (millions of domains at web scale).
    """
    from .relational import keyed_part_kernel, _segment_starts
    from .util import fill_null_key, restore_null_key

    # NULL source is ONE partition (SQL PARTITION BY; sentinel-encoded —
    # the part hash cannot take a None key)
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "source"]) \
        .map_batches(lambda t: t.set_column(
            t.schema.get_field_index("source"), "source",
            fill_null_key(t["source"])), batch_format="pyarrow")

    def kern(t: pa.Table) -> pa.Table:
        t = t.sort_by([("source", "ascending"), ("doc_id", "ascending")])
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        starts = np.nonzero(_segment_starts(src))[0]
        seg_len = np.diff(np.r_[starts, len(src)])
        rank = np.arange(len(src), dtype=np.int64) \
            - np.repeat(starts, seg_len)
        return restore_null_key(t.filter(pa.array(rank < cap)), "source")

    return keyed_part_kernel(ds, "source", kern)


SPLIT_NAMES = ("train", "val", "test")


def assign_splits(sf_dir: str,
                  ratios: tuple[float, float, float] = (0.9, 0.05, 0.05)
                  ) -> rd.Dataset:
    """Deterministic train/val/test assignment: (doc_id, split).

    The same Knuth-multiplicative bucket as :func:`hash_mod_sample` cut at
    cumulative ratio thresholds, so the split is a pure per-batch map —
    partition-invariant, reproducible at any cluster size, every doc in
    exactly one split, and leakage-free by construction (membership depends
    only on doc_id). Exact integer thresholds keep the DuckDB twin
    bit-identical."""
    t1 = np.uint64(sample_threshold(ratios[0]))
    t2 = np.uint64(sample_threshold(ratios[0] + ratios[1]))

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        buckets = ((ids % _MOD32) * _KNUTH) % _MOD32
        split = np.where(buckets < t1, SPLIT_NAMES[0],
                         np.where(buckets < t2, SPLIT_NAMES[1],
                                  SPLIT_NAMES[2]))
        return pa.table({"doc_id": t["doc_id"],
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow")


def temperature_sample_by_lang(sf_dir: str, t_num: int = 1,
                               t_den: int = 2) -> rd.Dataset:
    """Temperature-weighted language resampling (the multilingual rebalance
    of XLM-R / mC4, Conneau et al. 2020 §3.1, at alpha = 0.5): language l
    with count c_l is sampled in proportion to c_l^alpha, so low-resource
    languages are upsampled relative to their corpus share, rescaled to a
    ``t_num/t_den`` fraction of the corpus overall.

    Unlike :func:`sample_docs_by_lang` the per-language rates are computed
    FROM the data: pass 1 folds per-block language ``value_counts`` partials
    on the driver (bounded by language cardinality — dozens, never corpus
    rows); pass 2 is a stateless per-batch filter, partition-invariant.

    All arithmetic is EXACT integers so the DuckDB twin is bit-identical:
    weights are integer square roots (``math.isqrt``; the twin corrects
    float ``sqrt`` by one ULP step), the per-language quota is
    ``m_l = min(c_l, target * w_l // W)``, and a document is kept iff its
    Knuth bucket mod c_l lands below m_l. Output: doc_id, lang (kept rows).
    """
    import math

    from .util import collect_table
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        # NULL lang = no language -> excluded from the rebalance entirely,
        # matching the twin's inner JOIN ... USING (lang) null semantics
        vc = t["lang"].drop_null().value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"lang": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partials = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                            batch_size=None))
    agg = partials.group_by("lang").aggregate([("n", "sum")])
    counts = dict(zip(agg["lang"].to_pylist(), agg["n_sum"].to_pylist()))
    total = sum(counts.values())
    weights = {lang: math.isqrt(n) for lang, n in counts.items()}
    wsum = max(1, sum(weights.values()))
    target = (total * t_num) // t_den
    quota = {lang: min(counts[lang], (target * w) // wsum)
             for lang, w in weights.items()}

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        buckets = ((ids % _MOD32) * _KNUTH) % _MOD32
        col = t["lang"].combine_chunks() \
            if isinstance(t["lang"], pa.ChunkedArray) else t["lang"]
        enc = pc.dictionary_encode(col)
        # null codes dictionary-encode to null indices -> fill with -1 and
        # route to a zero quota (null lang is never kept, like the twin)
        codes = pc.fill_null(enc.indices, -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        langs = enc.dictionary.to_pylist() + [None]
        c_arr = np.fromiter((counts.get(g, 1) or 1 for g in langs),
                            dtype=np.uint64, count=len(langs))
        m_arr = np.fromiter((quota.get(g, 0) for g in langs),
                            dtype=np.uint64, count=len(langs))
        mask = (buckets % c_arr[codes]) < m_arr[codes]
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
