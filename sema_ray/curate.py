"""End-to-end corpus curation: exact dedup -> quality gate -> stratified
language-rebalanced sample, as ONE streaming pass.

The composition a pre-training data pipeline actually runs, assembled from
the engine's own oracle-checked pieces: duplicate *member* ids (bounded by
duplicate-family volume, from the two-pass hot-bucket dedup) broadcast into
a single ``map_batches`` filter that also computes the quality ratio and
the deterministic hash-mod language sample — three curation stages, one
scan of the corpus, zero shuffles. The whole pipeline has an exact DuckDB
twin (window-function dedup + identical IEEE ratio arithmetic + HUGEINT
hash-mod), so the driver value-hash-checks the composition end to end.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .dedup import exact_rep_map
from .sampling import _KNUTH, _MOD32, sample_threshold
from .sampling import DEFAULT_LANG_RATES, DEFAULT_OTHER_RATE
from .util import round_half_up

MIN_ALPHA_RATIO = 0.6


def curate_corpus(sf_dir: str,
                  min_alpha_ratio: float = MIN_ALPHA_RATIO,
                  rates: dict[str, float] | None = None,
                  other_rate: float = DEFAULT_OTHER_RATE) -> rd.Dataset:
    """(doc_id, lang) of the curated subset: exact-dedup representatives
    whose alpha ratio (rounded half-up to 4, the oracle-exact form) clears
    ``min_alpha_ratio``, language-rebalanced by the deterministic hash-mod
    rule. One streaming pass after the bounded dedup pre-pass."""
    rates = DEFAULT_LANG_RATES if rates is None else rates
    thr = {lang: np.uint64(sample_threshold(r)) for lang, r in rates.items()}
    other = np.uint64(sample_threshold(other_rate))
    drop = np.sort(np.fromiter(exact_rep_map(sf_dir).keys(),
                               dtype=np.int64))
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang", "text"])

    def kern(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, drop)                       # dedup reps only
        text = t["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        denom = pc.max_element_wise(n_chars, pa.scalar(1.0))
        n_alpha = pc.cast(
            pc.count_substring_regex(text, pattern="[A-Za-z]"), pa.float64())
        ar = round_half_up(pc.divide(n_alpha, denom), 4) \
            .to_numpy(zero_copy_only=False)
        keep &= ar >= min_alpha_ratio                    # quality gate
        buckets = ((ids.astype(np.uint64) % _MOD32) * _KNUTH) % _MOD32
        from .sampling import _per_lang_values
        limits = _per_lang_values(t["lang"], thr, other)
        keep &= buckets < limits                         # stratified sample
        sel = pa.array(np.nonzero(keep)[0], pa.int64())
        return pa.table({"doc_id": pa.array(ids, pa.int64()).take(sel),
                         "lang": t["lang"].take(sel)})

    return ds.map_batches(kern, batch_format="pyarrow", batch_size=None)
