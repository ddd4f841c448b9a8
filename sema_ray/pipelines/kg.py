"""Flagship pipeline: KG construction over transcript Parquet (north star).

Dataflow (BASELINE.json north_star, SURVEY §3.4)::

    read_parquet(transcripts shards)
      -> map_batches(normalize)                       # derived cols only
      -> map_batches(MentionDetectStage, actor pool)  # turns -> mentions
      -> map_batches(TripleExtractStage, actor pool)  # turns -> triples
      entity side:
      mentions -> per-batch partial counts -> groupby(surface).sum  # distinct
               -> map_batches(minhash/LSH bands) -> groupby(band)   # blocking
               -> candidate pairs -> union-find (single reducer)    # merge
               -> canonical entity table (broadcast via ray.put)
      -> map_batches(LinkStage, actor pool)           # triples + entity ids
      -> groupby(subj_id,pred,obj_id).count           # adjacency aggregate
      -> write_parquet(triples/part=<shard>, adjacency/) + lineage manifests

Partitioning: per-turn stages need no conversation locality — blocks are
balanced by the input shuffle; the only per-conversation operation is the
coherence pass (``groupby(conv_id).map_groups(sort turn_idx)``), and skewed
high-turn conversations are handled there by *salted* keys for the per-turn
part and unsalted grouping only at the final, cheap regroup (SURVEY §4.1).

Scale notes (100 TB design):
- extraction is embarrassingly parallel: no shuffle until the entity side;
- the surface-form aggregate is pre-combined inside each batch before the
  ``groupby`` (partial aggregation), so the shuffle moves one row per
  distinct surface per batch, not one per mention;
- the canonical map is the *small* side (entity vocabulary ≪ turns) and is
  broadcast once via ``ray.put``, read per actor in ``__init__`` — never
  re-shipped per batch;
- union-find sees only LSH candidate pairs (≪ distinct surfaces).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..canonicalize import (band_hashes, build_canonical_map,
                            char_shingle_hashes, minhash_signature,
                            normalize_surface)
from ..extract import (MentionDetectStage, TripleExtractStage,
                       detect_mentions_batch, extract_triples_batch)
from ..hashing import stable_id64
from ..state.manifest import (load_manifests, shard_fingerprint,
                              shard_is_done, write_manifest)

# Batch sizing: the vectorized extraction stages want WHOLE BLOCKS
# (batch_size=None) — per-batch Arrow-kernel overhead at 4096-row batches
# measured 2.3x slower at 32 cpus; block memory is already bounded by
# DataContext.target_max_block_size (128 MB). 4096 remains the default for
# ACTOR stages whose per-call outputs balloon (SURVEY §4.3(4)).
DEFAULT_BATCH_SIZE = 4096
EXTRACT_BATCH_SIZE = None  # per block

# Transient-failure policy for the long extraction stages: a worker killed
# mid-task (preemption, OOM) retries the task instead of failing the run —
# the reference silently SKIPS failed files (processor.rs:18); we retry and
# then fail loudly, never drop (SURVEY §4.1 "Retries").
RETRY_ARGS = {"retry_exceptions": True, "max_retries": 3}


def _pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the current session."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(2, cpus))


def read_transcripts(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Source: transcript shards (a directory of parquet files or one file).

    Column pruning is pushed into the read (SURVEY S1: the crawler collapses
    into datasource planning).
    """
    return rd.read_parquet(path, columns=columns)


def triples_dataset(ds: rd.Dataset,
                    batch_size: int | None = EXTRACT_BATCH_SIZE) -> rd.Dataset:
    """Turns -> triples (reads only conv_id, turn_idx, text).

    Task-pool ``map_batches`` over WHOLE blocks — the extractor's only state
    is module-level compiled regex, cached per worker process; measured ~3x
    faster than the autoscaling actor pool at bench scale, and per-block
    batches ~2.3x faster than 4096-row batches (vectorized RE2 kernels
    amortize per-call overhead). Swap in ``TripleExtractStage`` +
    ``concurrency=(n, m)`` when the extractor loads real model weights.
    """
    return ds.map_batches(
        extract_triples_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        **RETRY_ARGS,
    )


def mentions_dataset(ds: rd.Dataset,
                     batch_size: int | None = EXTRACT_BATCH_SIZE) -> rd.Dataset:
    """Turns -> entity mentions (task-pool; see :func:`triples_dataset`)."""
    return ds.map_batches(
        detect_mentions_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        **RETRY_ARGS,
    )


def surface_form_counts(mentions: rd.Dataset) -> rd.Dataset:
    """Distinct mention surfaces with counts.

    Pre-aggregates inside each batch (one row per distinct surface per batch)
    before the global ``groupby`` — the shuffle moves partials, not mentions.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch["surface"].value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table(
            {
                "surface": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    partials = mentions.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("surface").aggregate(Sum("n", alias_name="n"))


_BUCKET_GOLDEN = 0x9E3779B97F4A7C15


class _BandRowStage:
    """Per-batch LSH band rows for the entity vocabulary.

    Emits one ``(bucket, norm_key)`` row per band per distinct normalized
    key in the batch (casing/suffix variants have already collapsed to equal
    keys and don't need LSH); ``bucket`` folds the band index into the band
    hash so a single int64 column is the whole blocking key (same trick as
    :class:`sema_ray.dedup.MinHashBandStage`). With ``hot`` set (pass 2),
    only rows whose bucket is in the broadcast hot set survive.
    """

    def __init__(self, hot: np.ndarray | None = None):
        self.hot = np.sort(hot) if hot is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        buckets: list[int] = []
        keys: list[str] = []
        seen: set[str] = set()
        for s in batch["surface"].to_pylist():
            k = normalize_surface(s)
            if not k or k in seen:
                continue
            seen.add(k)
            sig = minhash_signature(char_shingle_hashes(k))
            for b, h in enumerate(band_hashes(sig)):
                buckets.append((h + b * _BUCKET_GOLDEN)
                               & 0x7FFF_FFFF_FFFF_FFFF)
                keys.append(k)
        barr = np.array(buckets, dtype=np.int64)
        if self.hot is None:  # pass 1 is the counting shuffle: bucket only
            return pa.table({"bucket": pa.array(barr, pa.int64())})
        keep = np.isin(barr, self.hot)
        return pa.table({"bucket": pa.array(barr[keep], pa.int64()),
                         "norm_key": pa.array(
                             [k for k, kp in zip(keys, keep) if kp],
                             pa.string())})


def _star_pairs_kernel(mt: pa.Table, max_bucket: int) -> pa.Table:
    """Hot-bucket member rows (bucket, norm_key) -> star pairs (lexicographic
    rep vs rest), dedup'd within the table. Correct on any union of whole
    buckets (the :func:`sema_ray.dedup._verified_pairs` contract)."""
    if mt.num_rows == 0 or "bucket" not in mt.column_names:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string())})
    mt = mt.group_by(["bucket", "norm_key"]).aggregate([]) \
        .sort_by([("bucket", "ascending"), ("norm_key", "ascending")])
    buckets = mt["bucket"].to_numpy(zero_copy_only=False)
    keys = mt["norm_key"].to_pylist()
    starts = np.nonzero(np.r_[True, buckets[1:] != buckets[:-1]])[0]
    ends = np.r_[starts[1:], len(buckets)]
    out_a: list[str] = []
    out_b: list[str] = []
    for s, e in zip(starts, ends):
        members = keys[s:min(e, s + max_bucket)]
        if len(members) < 2:
            continue
        rep = members[0]
        out_a.extend([rep] * (len(members) - 1))
        out_b.extend(members[1:])
    return pa.table({"a": pa.array(out_a, pa.string()),
                     "b": pa.array(out_b, pa.string())})


def lsh_candidate_pairs(surfaces: rd.Dataset, max_bucket: int = 1000,
                        approx_rows: int | None = None
                        ) -> list[tuple[str, str]]:
    """Candidate pairs from LSH buckets (star pairing: first member vs rest).

    Two-pass hot-bucket shape (VERDICT r2 #6 — the round-2 version paid one
    Python ``map_groups`` call per mostly-singleton band bucket): pass 1
    shuffles only 8-byte bucket ids and counts them; only buckets with ≥2
    member rows survive to pass 2, which re-derives the band rows for the
    colliding buckets and star-pairs them inside the adaptive
    local-vs-distributed verification harness shared with the dedup family
    (:func:`sema_ray.dedup._verified_pairs`). Buckets over ``max_bucket``
    keys are truncated (hot-bucket guard) — at LSH band width 4 a bucket
    that large means near-identical keys that the star pairs already connect
    transitively through union-find. ``approx_rows``: vocabulary-size hint
    (row count of ``surfaces``) driving the local-combine-vs-distributed
    choice for the bucket count.
    """
    from ..canonicalize import BANDS
    from ..dedup import _hot_buckets, _verified_pairs

    light = surfaces.map_batches(_BandRowStage(), batch_format="pyarrow",
                                 batch_size=None)
    hot, member_rows = _hot_buckets(
        light, approx_rows * BANDS if approx_rows is not None else None)
    if not len(hot):
        return []
    members = surfaces.map_batches(_BandRowStage(hot=hot),
                                   batch_format="pyarrow", batch_size=None)
    pair_tbl = _verified_pairs(
        members, lambda mt: _star_pairs_kernel(mt, max_bucket), member_rows)
    if pair_tbl.num_rows == 0 or "a" not in pair_tbl.column_names:
        return []
    return sorted(set(zip(pair_tbl["a"].to_pylist(),
                          pair_tbl["b"].to_pylist())))


# Above this many (approximate) mention rows the per-block count partials
# are aggregated by a DISTRIBUTED groupby before anything reaches the
# driver (VERDICT r3 item 5) — the driver then only ever holds the
# vocabulary-sized result it needs for the union-find reduction (the
# documented boundary), never O(blocks x vocabulary) partial rows.
DIST_COUNT_MIN_ROWS = 4_000_000


def canonical_entities(mentions: rd.Dataset,
                       distributed_blocking: bool = False,
                       approx_rows: int | None = None,
                       ) -> tuple[dict[str, tuple[int, str]], pa.Table]:
    """Full canonicalization: counts -> LSH pairs -> union-find -> table.

    Returns (surface -> (entity_id, canonical_surface) map, entity table with
    columns entity_id | canonical | surface | n).

    The vocabulary (distinct surfaces) is the small side by construction —
    it is collected to the driver for the union-find reduction regardless.
    Below ``DIST_COUNT_MIN_ROWS`` (estimated) mention rows the per-batch
    count partials are merged locally (no shuffle); above it they are summed
    by a distributed ``groupby`` so the driver only receives the final
    vocabulary-sized table. ``distributed_blocking=True`` switches to the
    groupby-based banding path for vocabularies too large to block locally
    (the shuffle still only moves vocabulary rows, never the corpus).
    """
    from ..canonicalize import local_lsh_pairs
    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch["surface"].value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"surface": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    # per-BLOCK partials (batch_size=None): downstream sees
    # O(blocks x vocabulary) rows, not O(row-batches x vocabulary)
    partials = mentions.map_batches(partial, batch_format="pyarrow",
                                    batch_size=None)
    if distributed_blocking or (approx_rows is not None
                                and approx_rows > DIST_COUNT_MIN_ROWS):
        counts_tbl = collect_table(
            partials.groupby("surface").aggregate(
                Sum("n", alias_name="n"))).sort_by("surface")
    else:
        partials_tbl = collect_table(partials)
        counts_tbl = partials_tbl.group_by("surface") \
            .aggregate([("n", "sum")]) \
            .rename_columns(["surface", "n"]).sort_by("surface")
    surface_counts = list(zip(counts_tbl["surface"].to_pylist(),
                              counts_tbl["n"].to_pylist()))
    if distributed_blocking:
        pairs = lsh_candidate_pairs(rd.from_arrow(counts_tbl),
                                    approx_rows=counts_tbl.num_rows)
    else:
        pairs = local_lsh_pairs(
            [normalize_surface(s) for s, _n in surface_counts])
    cmap = build_canonical_map(surface_counts, pairs)
    ent = pa.table(
        {
            "entity_id": pa.array([cmap[s][0] for s, _ in surface_counts], pa.int64()),
            "canonical": pa.array([cmap[s][1] for s, _ in surface_counts], pa.string()),
            "surface": pa.array([s for s, _ in surface_counts], pa.string()),
            "n": pa.array([n for _, n in surface_counts], pa.int64()),
        }
    )
    return cmap, ent


def cmap_arrays(cmap: dict[str, tuple[int, str]]
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical map as three parallel surface-sorted arrays (the
    ``assign_reps`` broadcast shape, VERDICT r3 item 5): sorted surfaces,
    entity ids, canonical surfaces. Ships/deserializes as flat arrays — no
    per-entry Python dict overhead on the receiving worker."""
    surfaces = np.array(sorted(cmap), dtype=object)
    ids = np.fromiter((cmap[s][0] for s in surfaces), np.int64,
                      count=len(surfaces))
    canon = np.array([cmap[s][1] for s in surfaces], dtype=object)
    return surfaces, ids, canon


class LinkStage:
    """Broadcast-join entity linker (actor pool).

    The canonical map travels once to each actor via an object-store ref
    (``ray.put`` on the driver, ``ray.get`` in ``__init__``) as three
    surface-sorted arrays — the broadcast hash-join pattern for a small
    dimension side (SURVEY §2 "Joins"), resolved per distinct surface with
    one ``np.searchsorted`` gather. Surfaces outside the map (possible only
    if linking runs on a different corpus than canonicalization) fall back
    to self-canonicalization, so the stage is total and deterministic.
    """

    def __init__(self, cmap_ref):
        self.surfaces, self.ids, self.canon = ray.get(cmap_ref)

    def _lookup_cols(self, arr) -> tuple[pa.Array, pa.Array]:
        """Vectorized: resolve each *distinct* surface once, then gather.

        Surfaces are low-cardinality relative to triples, so dictionary-
        encode the column and binary-search only the dictionary against the
        sorted broadcast arrays; the per-row work is one int gather.
        """
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        enc = arr.dictionary_encode()
        vocab = np.array(enc.dictionary.to_pylist(), dtype=object)
        n_map = len(self.surfaces)
        if n_map:
            pos = np.minimum(np.searchsorted(self.surfaces, vocab), n_map - 1)
            hit = self.surfaces[pos] == vocab
            ids = np.where(hit, self.ids[pos], 0)
            canon = np.where(hit, self.canon[pos], vocab)
        else:
            hit = np.zeros(len(vocab), dtype=bool)
            ids = np.zeros(len(vocab), dtype=np.int64)
            canon = vocab.copy()
        for i in np.nonzero(~hit)[0]:  # misses only (normally none)
            s = vocab[i]
            ids[i] = stable_id64(normalize_surface(s) or s)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        return (pa.array(ids[idx].astype(np.int64), pa.int64()),
                pa.array(canon[idx].tolist(), pa.string()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = batch.append_column("subj_id", pa.array([], pa.int64()))
            out = out.append_column("obj_id", pa.array([], pa.int64()))
            out = out.append_column("subj_canonical", pa.array([], pa.string()))
            return out.append_column("obj_canonical", pa.array([], pa.string()))
        s_ids, s_canon = self._lookup_cols(batch["subj"])
        o_ids, o_canon = self._lookup_cols(batch["obj"])
        out = batch.append_column("subj_id", s_ids)
        out = out.append_column("obj_id", o_ids)
        out = out.append_column("subj_canonical", s_canon)
        out = out.append_column("obj_canonical", o_canon)
        return out


SMALL_CMAP_ROWS = 100_000


def link_triples(triples: rd.Dataset, cmap: dict[str, tuple[int, str]],
                 batch_size: int = DEFAULT_BATCH_SIZE) -> rd.Dataset:
    """Broadcast-join triples -> canonical entity ids.

    Small canonical maps ship inside the task function (Ray caches the
    serialized function per worker process — the broadcast cost is paid once
    per worker, with zero actor-pool startup). Large maps go through the
    actor-pool + ``ray.put`` path so the dict is deserialized once per actor
    rather than once per worker-function cache miss.
    """
    arrays = cmap_arrays(cmap)
    if len(cmap) <= SMALL_CMAP_ROWS:
        stage = LinkStage.__new__(LinkStage)
        stage.surfaces, stage.ids, stage.canon = arrays

        def link(batch: pa.Table) -> pa.Table:
            return LinkStage.__call__(stage, batch)

        # per-block batches: one dictionary-encode per block
        return triples.map_batches(link, batch_format="pyarrow",
                                   batch_size=None)
    cmap_ref = ray.put(arrays)
    lo, hi = _pool()
    return triples.map_batches(
        LinkStage,
        fn_constructor_args=(cmap_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        # capped so pool startup never dominates and readers keep headroom
        concurrency=(lo, min(hi, 16)),
    )


def adjacency(linked: rd.Dataset) -> rd.Dataset:
    """Graph edge aggregate: support count per (subj_id, pred, obj_id).

    Pre-combines per batch before the groupby (partial aggregation), so the
    all-to-all moves edge partials, not triples.
    """

    def partial(batch: pa.Table) -> pa.Table:
        # group on the int edge key only: canonical strings are 1:1 with ids
        # and would inflate every shuffled partial row for nothing (the
        # global aggregate keeps keys + support; names join back from the
        # entities table when needed)
        g = batch.group_by(["subj_id", "pred", "obj_id"]).aggregate(
            [("conf", "count")]
        )
        return g.rename_columns(["subj_id", "pred", "obj_id", "n"])

    def recombine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["subj_id", "pred", "obj_id"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["subj_id", "pred", "obj_id", "n"])

    # two-level partial aggregation: per-block partials, then a coalescing
    # combine (large batch_size bundles many partial blocks per task with no
    # shuffle), so the one sort-shuffle sees O(tasks x distinct edges) rows
    # instead of O(blocks x distinct edges)
    partials = linked.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)
    combined = partials.map_batches(recombine, batch_format="pyarrow",
                                    batch_size=1 << 21)
    return (
        combined.groupby(["subj_id", "pred", "obj_id"])
        .aggregate(Sum("n", alias_name="support"))
    )


def write_adjacency(adj: rd.Dataset, out_dir: str,
                    num_buckets: int = 64) -> None:
    """Graph materialize (SURVEY §7.6): adjacency partitioned by subj-id
    bucket with stable (subj_id, pred, obj_id) ordering inside each
    partition — so neighbor lookups touch one bucket directory and a
    resumable writer can re-emit one bucket at a time.
    """

    def bucketed(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["subj_id"], pa.scalar(num_buckets - 1,
                                                    pa.int64())),
            pa.int32())
        return t.append_column("subj_bucket", b)

    def sort_group(g: pa.Table) -> pa.Table:
        return g.sort_by([("subj_id", "ascending"), ("pred", "ascending"),
                          ("obj_id", "ascending")])

    (adj.map_batches(bucketed, batch_format="pyarrow", batch_size=None)
        .groupby("subj_bucket")
        .map_groups(sort_group, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["subj_bucket"]))


def entity_degrees(adj: rd.Dataset) -> rd.Dataset:
    """Graph query: per-entity out-degree + total support, ranked desc.

    Pre-combined per block before the (tiny) groupby.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["subj_id"]).aggregate(
            [("obj_id", "count"), ("support", "sum")])
        return g.rename_columns(["subj_id", "out_degree", "total_support"])

    partials = adj.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
    return (partials.groupby("subj_id")
            .aggregate(Sum("out_degree", alias_name="out_degree"),
                       Sum("total_support", alias_name="total_support"))
            .sort(["out_degree", "subj_id"], descending=[True, False]))


def neighbors(adj_dir: str, subj_id: int, num_buckets: int = 64) -> pa.Table:
    """Point lookup over the bucketed adjacency layout: read ONE bucket
    partition, filter to the entity (the reference's file_index point-lookup
    idea, ``lance_indexer.rs:165-189``, on graph data)."""
    import pyarrow.parquet as pq_mod
    bucket = subj_id & (num_buckets - 1)
    part = os.path.join(adj_dir, f"subj_bucket={bucket}")
    if not os.path.isdir(part):  # missing key -> empty result, not an error
        return pa.schema([
            ("subj_id", pa.int64()), ("pred", pa.string()),
            ("obj_id", pa.int64()), ("support", pa.int64()),
        ]).empty_table()
    t = pq_mod.read_table(part)
    return t.filter(pc.equal(t["subj_id"], pa.scalar(subj_id, pa.int64())))


def conv_stats(input_dir: str) -> rd.Dataset:
    """Per-conversation profile over the FULL input-hint schema
    (role / tool / ts alongside conv_id / text): (conv_id, n_turns,
    n_user, n_assistant, n_tool_calls, total_chars, span_us).

    Conversation cardinality is unbounded, so this is the canonical
    partial-aggregation shape: one per-block Arrow ``group_by`` partial
    (7 numbers per conv per block), one distributed groupby merge
    (sum/sum/sum/sum/sum/min/max), and a final vectorized projection —
    never a driver fold. Exact integers end to end (ts min/max carried as
    int64 microseconds), so the DuckDB twin hashes identically."""
    from ray.data.aggregate import Max, Min

    ds = read_transcripts(input_dir,
                          columns=["conv_id", "role", "text", "tool", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        flags = pa.table({
            "conv_id": t["conv_id"],
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "n_user": pc.cast(pc.equal(t["role"], "user"), pa.int64()),
            "n_assistant": pc.cast(pc.equal(t["role"], "assistant"),
                                   pa.int64()),
            "n_tool_calls": pc.cast(pc.not_equal(t["tool"], ""),
                                    pa.int64()),
            "total_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            "ts_min": ts_us,
            "ts_max": ts_us,
        })
        return flags.group_by("conv_id").aggregate(
            [("n", "sum"), ("n_user", "sum"), ("n_assistant", "sum"),
             ("n_tool_calls", "sum"), ("total_chars", "sum"),
             ("ts_min", "min"), ("ts_max", "max")]).rename_columns(
            ["conv_id", "n", "n_user", "n_assistant", "n_tool_calls",
             "total_chars", "ts_min", "ts_max"])

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("conv_id").aggregate(
            Sum("n", alias_name="n_turns"),
            Sum("n_user", alias_name="n_user"),
            Sum("n_assistant", alias_name="n_assistant"),
            Sum("n_tool_calls", alias_name="n_tool_calls"),
            Sum("total_chars", alias_name="total_chars"),
            Min("ts_min", alias_name="ts_min"),
            Max("ts_max", alias_name="ts_max"))

    def finish(t: pa.Table) -> pa.Table:
        cols = {c: pc.cast(t[c], pa.int64())
                for c in ["n_turns", "n_user", "n_assistant",
                          "n_tool_calls", "total_chars"]}
        return pa.table({
            "conv_id": t["conv_id"], **cols,
            "span_us": pc.cast(pc.subtract(t["ts_max"], t["ts_min"]),
                               pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)


def assistant_latency(input_dir: str) -> rd.Dataset:
    """Assistant response latency: (conv_id, turn_idx, latency_us) for
    every assistant turn whose PREVIOUS turn (by turn_idx within the
    conversation) is a user turn — the agent-transcript counterpart of
    the events LAG op (``relational.event_gaps``).

    One bounded-part keyed shuffle (complete conversations per part),
    segmented numpy LAG — exact integer microseconds end to end, so the
    DuckDB LAG twin hashes identically. Null-ts turns are dropped up
    front (policy: a turn without a timestamp participates in no latency
    pair — a nullable int64 would otherwise round-trip through float64
    NaN and poison the integer subtraction)."""
    from ..relational import keyed_part_kernel, sorted_segments

    ds = read_transcripts(input_dir,
                          columns=["conv_id", "turn_idx", "role", "ts"])

    def kern(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["ts"]))
        t, starts, _seg_len = sorted_segments(
            t, "conv_id", [("conv_id", "ascending"),
                           ("turn_idx", "ascending")])
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        role = t["role"].to_numpy(zero_copy_only=False)
        n = len(us)
        lat = np.empty(n, dtype=np.int64)
        prev_is_user = np.zeros(n, dtype=bool)
        if n:
            lat[1:] = us[1:] - us[:-1]
            prev_is_user[1:] = role[:-1] == "user"
            prev_is_user[starts] = False  # no previous turn in-conv
        keep = (role == "assistant") & prev_is_user
        return pa.table({
            "conv_id": t["conv_id"].filter(pa.array(keep)),
            "turn_idx": pc.cast(t["turn_idx"].filter(pa.array(keep)),
                                pa.int64()),
            "latency_us": pa.array(lat[keep], pa.int64()),
        })

    return keyed_part_kernel(ds, "conv_id", kern)


def tool_usage(input_dir: str) -> rd.Dataset:
    """Per-tool usage profile: (tool, n_calls, n_convs) over tool turns.

    COUNT DISTINCT across blocks done the scale-safe way: per-block
    distinct (tool, conv_id) partials carry per-pair call counts, one
    groupby collapses cross-block repeats exactly, and the per-tool
    rollup is a second (tool-cardinality-sized) aggregate — the distinct
    set itself is never centralized."""
    ds = read_transcripts(input_dir, columns=["conv_id", "tool"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["tool"], ""))
        return t.group_by(["tool", "conv_id"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["tool", "conv_id", "n"])

    pair = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .groupby(["tool", "conv_id"]).aggregate(Sum("n", alias_name="n"))

    def per_tool(t: pa.Table) -> pa.Table:
        g = t.group_by("tool").aggregate([("n", "sum"),
                                          ("conv_id", "count")])
        return pa.table({"tool": g["tool"],
                         "n_calls": pc.cast(g["n_sum"], pa.int64()),
                         "n_convs": pc.cast(g["conv_id_count"],
                                            pa.int64())})

    # the (tool, conv) table holds complete pairs after the groupby, but
    # a tool's pairs can span blocks — one per-block partial + a final
    # tool-sized combine
    parts = pair.map_batches(per_tool, batch_format="pyarrow",
                             batch_size=None)
    from ..util import collect_table
    tbl = collect_table(parts)
    if tbl.num_rows == 0 or "tool" not in tbl.column_names:
        return rd.from_arrow(pa.table({"tool": pa.array([], pa.string()),
                                       "n_calls": pa.array([], pa.int64()),
                                       "n_convs": pa.array([], pa.int64())}))
    g = tbl.group_by("tool").aggregate([("n_calls", "sum"),
                                        ("n_convs", "sum")])
    return rd.from_arrow(pa.table({
        "tool": pc.cast(g["tool"], pa.string()),
        "n_calls": pc.cast(g["n_calls_sum"], pa.int64()),
        "n_convs": pc.cast(g["n_convs_sum"], pa.int64())}))


def coherent_turns(ds: rd.Dataset) -> rd.Dataset:
    """Stable turn ordering: per-conversation sort on turn_idx.

    The only stage needing conversation locality. Expressed as a
    bounded-part shuffle (`keyed_part_kernel`): every conversation's turns
    land wholly in one of ORDERED_PARTS parts and one Arrow sort per part
    makes conversations contiguous and turn-ordered — one Python call per
    PART, not per conversation (the r3 per-group map_groups cost one call
    per conv_id; at 10^9 conversations that is 10^9 Python calls).
    """
    from ..relational import keyed_part_kernel

    def kern(t: pa.Table) -> pa.Table:
        return t.sort_by([("conv_id", "ascending"),
                          ("turn_idx", "ascending")])

    return keyed_part_kernel(ds, "conv_id", kern)


def detect_heavy_convs(ds: rd.Dataset, threshold: int = 1000) -> set[str]:
    """Cheap presample for skew: conv_ids with > threshold turns (SURVEY §4.3)."""
    from ..util import collect_table
    counts = ds.groupby("conv_id").aggregate(Count(alias_name="n_turns"))
    heavy = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n_turns"], threshold)),
        batch_format="pyarrow",
    )
    tbl = collect_table(heavy)  # empty-block-safe (CLAUDE.md)
    if "conv_id" not in tbl.column_names:
        return set()
    return set(tbl["conv_id"].to_pylist())


def salted_repartition(ds: rd.Dataset, num_partitions: int,
                       heavy: set[str] | None = None,
                       salt_span: int = 256) -> rd.Dataset:
    """Hash-partition on conv_id with per-span salt for heavy conversations.

    Per-turn stages don't need whole-conversation locality, so a heavy
    conversation's turns are spread over ``ceil(n_turns/salt_span)`` salted
    keys (`conv#<turn_idx//span>`), keeping partitions balanced
    (FP-Hadoop-style skew split, PAPERS.md).
    """
    heavy = heavy or set()
    heavy_ref = ray.put(heavy)

    class AddKey:
        """Vectorized salted part-key (VERDICT r2 #7): conv_id is
        dictionary-encoded so ``stable_id64`` runs once per *distinct*
        conversation per block, and the salted variant only touches the rows
        of heavy conversations (composed key built with Arrow kernels, then
        hashed once per distinct ``conv#span`` value)."""

        def __init__(self):
            self.heavy = ray.get(heavy_ref)
            self.span = salt_span
            self.P = num_partitions

        def __call__(self, batch: pa.Table) -> pa.Table:
            conv = batch["conv_id"]
            if isinstance(conv, pa.ChunkedArray):
                conv = conv.combine_chunks()
            enc = conv.dictionary_encode()
            vocab = enc.dictionary.to_pylist()
            idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            base = np.array([stable_id64(c) % self.P for c in vocab],
                            dtype=np.int64)
            keys = base[idx]
            if self.heavy:
                hv = np.array([c in self.heavy for c in vocab], dtype=bool)
                hrows = np.nonzero(hv[idx])[0]
                if len(hrows):
                    tids = batch["turn_idx"].to_numpy(zero_copy_only=False)
                    span_idx = tids[hrows] // self.span
                    composed = pc.binary_join_element_wise(
                        conv.take(pa.array(hrows)),
                        pc.cast(pa.array(span_idx), pa.string()), "#")
                    cenc = composed.dictionary_encode()
                    salted = np.array(
                        [stable_id64(s) % self.P
                         for s in cenc.dictionary.to_pylist()],
                        dtype=np.int64)
                    keys[hrows] = salted[
                        cenc.indices.to_numpy(zero_copy_only=False)]
            return batch.append_column(
                "part_key", pa.array(keys.astype(np.int32), pa.int32()))

    return ds.map_batches(AddKey, batch_format="pyarrow", concurrency=_pool())


def triple_surfaces(trip: rd.Dataset) -> rd.Dataset:
    """Surfaces appearing in triples (subj + obj), as a 'surface' column —
    the entity vocabulary the link stage needs to resolve."""

    def surf(t: pa.Table) -> pa.Table:
        def chunks_of(col):
            c = t[col]
            return c.chunks if isinstance(c, pa.ChunkedArray) else [c]
        # zero-copy: reuse the arrow buffers, no Python string round-trip
        both = pa.chunked_array(chunks_of("subj") + chunks_of("obj"),
                                pa.string())
        return pa.table({"surface": both})

    # batch_size=None => one call per block: the downstream count partials
    # shrink to (blocks x vocab) rows instead of (batches x vocab)
    return trip.map_batches(surf, batch_format="pyarrow", batch_size=None)


def _keys_connected(keys: list[str], embedder,
                    jaccard_threshold: float = 0.4,
                    cosine_threshold: float = 0.6) -> bool:
    """Exact connectivity of one cluster's distinct normalized keys under
    the pairwise merge rule (:func:`sema_ray.canonicalize.verify_pair`) —
    NO LSH blocking, so a blocking or union-find fault upstream cannot hide
    in the recheck. O(m²) pairwise in the worst case, but m is the distinct
    keys of ONE entity's surface variants — single digits in practice."""
    from ..canonicalize import verify_pair
    m = len(keys)
    if m <= 1:
        return True
    seen = np.zeros(m, bool)
    seen[0] = True
    frontier = [0]
    while frontier:
        i = frontier.pop()
        for j in range(m):
            if not seen[j] and verify_pair(keys[i], keys[j], embedder,
                                           jaccard_threshold,
                                           cosine_threshold):
                seen[j] = True
                frontier.append(j)
    return bool(seen.all())


def entity_validity(mentions: rd.Dataset,
                    approx_rows: int | None = None) -> pa.Table:
    """(surface, entity_ok) over the distinct mention surfaces — an
    independent exact audit of the canonicalization contract (VERDICT r4
    next-#6: entity ids are permutation-dependent, validity is not).
    entity_ok is 1 iff the surface's cluster satisfies ALL of:

    (a) one canonical per entity_id, and that canonical is a MEMBER;
    (b) entity_id == stable_id64(normalize(canonical) or canonical);
    (c) the canonical is the (max mention count, lexicographic-min) member
        — the rep rule of build_canonical_map, recomputed from the counts;
    (d) no other cluster holds a surface with the same normalized key
        (exact-key merges are mandatory);
    (e) the cluster's distinct normalized keys are CONNECTED under the
        exact pairwise merge rule, recomputed with no LSH blocking
        (:func:`_keys_connected`).

    The audit is vocabulary-sized and driver-local — the same boundary as
    the union-find it checks. SQL twin: the distinct mention surfaces with
    entity_ok pinned TRUE (the dedup_minhash validity-twin shape)."""
    from ..embed import HashEmbedder
    _cmap, ent = canonical_entities(mentions, approx_rows=approx_rows)
    surfaces = ent["surface"].to_pylist()
    ids = ent["entity_id"].to_pylist()
    canon = ent["canonical"].to_pylist()
    count_of = dict(zip(surfaces, ent["n"].to_pylist()))
    clusters: dict[int, list[int]] = {}
    for i, eid in enumerate(ids):
        clusters.setdefault(eid, []).append(i)
    key_owner: dict[str, set[int]] = {}
    for i, s in enumerate(surfaces):
        key_owner.setdefault(normalize_surface(s), set()).add(ids[i])
    emb = HashEmbedder()
    ok = np.ones(len(surfaces), bool)
    for eid, idxs in clusters.items():
        members = [surfaces[i] for i in idxs]
        rep = canon[idxs[0]]
        good = all(canon[i] == rep for i in idxs) and rep in members
        good = good and eid == stable_id64(normalize_surface(rep) or rep)
        good = good and rep == sorted(
            members, key=lambda s: (-count_of[s], s))[0]
        good = good and all(
            key_owner[normalize_surface(s)] == {eid} for s in members)
        good = good and _keys_connected(
            sorted({normalize_surface(s) for s in members}), emb)
        if not good:
            for i in idxs:
                ok[i] = False
    order = np.argsort(np.array(surfaces, dtype=object))
    return pa.table({
        "surface": pa.array([surfaces[i] for i in order], pa.string()),
        "entity_ok": pa.array(ok[order].astype(np.int64), pa.int64())})


def linked_triple_validity(linked: rd.Dataset) -> rd.Dataset:
    """(conv_id, turn_idx, subj, pred, obj, link_ok) over the flagship's
    linked triples — the link-stage counterpart of :func:`entity_validity`.
    The distinct (surface -> entity_id, canonical) assignments are folded
    out of the OUTPUT itself (vocabulary-sized partials, the
    canonical_entities count shape) and audited exactly on the driver:

    (a) functional dependency — every surface maps to exactly ONE
        (entity_id, canonical) across all rows and both roles;
    (b) entity_id == stable_id64(normalize(canonical) or canonical);
    (c) the canonical is itself a linked surface of the same cluster;
    (d) the cluster's normalized keys are connected under the exact
        pairwise merge rule (no LSH).

    link_ok = both endpoint surfaces pass; the SQL twin re-derives the
    triple rows and pins link_ok TRUE. The rep-choice rule needs mention
    counts and is audited by entity_validity, not here."""
    from ..embed import HashEmbedder
    from ..util import collect_table

    def mapping_partial(t: pa.Table) -> pa.Table:
        parts = []
        for role in ("subj", "obj"):
            parts.append(pa.table({
                "surface": pc.cast(t[role], pa.string()),
                "entity_id": pc.cast(t[f"{role}_id"], pa.int64()),
                "canonical": pc.cast(t[f"{role}_canonical"], pa.string())}))
        both = pa.concat_tables(parts)
        grp = both.group_by(["surface", "entity_id", "canonical"]) \
            .aggregate([])
        return grp

    maps = collect_table(linked.map_batches(
        mapping_partial, batch_format="pyarrow", batch_size=None))
    bad: set[str] = set()
    if maps.num_rows and "surface" in maps.column_names:
        maps = maps.group_by(["surface", "entity_id", "canonical"]) \
            .aggregate([])
        surfaces = maps["surface"].to_pylist()
        ids = maps["entity_id"].to_pylist()
        canon = maps["canonical"].to_pylist()
        by_surface: dict[str, list[int]] = {}
        for i, s in enumerate(surfaces):
            by_surface.setdefault(s, []).append(i)
        clusters: dict[int, list[int]] = {}
        for i, eid in enumerate(ids):
            clusters.setdefault(eid, []).append(i)
        emb = HashEmbedder()
        for s, idxs in by_surface.items():
            if len(idxs) != 1:  # (a)
                bad.add(s)
        for eid, idxs in clusters.items():
            members = {surfaces[i] for i in idxs}
            rep = canon[idxs[0]]
            good = all(canon[i] == rep for i in idxs) and rep in members
            good = good and eid == stable_id64(
                normalize_surface(rep) or rep)  # (b), (c)
            good = good and _keys_connected(
                sorted({normalize_surface(s) for s in members}), emb)  # (d)
            if not good:
                bad.update(members)
    bad_sorted = np.array(sorted(bad), dtype=object)

    def flag(t: pa.Table) -> pa.Table:
        s = np.array(t["subj"].to_pylist(), dtype=object)
        o = np.array(t["obj"].to_pylist(), dtype=object)
        okv = ~(np.isin(s, bad_sorted) | np.isin(o, bad_sorted))
        return pa.table({
            "conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
            "subj": t["subj"], "pred": t["pred"], "obj": t["obj"],
            "link_ok": pa.array(okv.astype(np.int64), pa.int64())})

    return linked.map_batches(flag, batch_format="pyarrow",
                              batch_size=None)


def kg_flagship(input_dir: str, batch_size: int = DEFAULT_BATCH_SIZE) -> rd.Dataset:
    """Flagship pipeline, streaming form (no intermediate writes):
    transcripts -> triples (one extraction pass) -> canonicalized links.

    Returns the linked-triples Dataset (conv_id, turn_idx, subj, pred, obj,
    conf, subj_id, obj_id, subj_canonical, obj_canonical). The triples
    Dataset is materialized once (object store, spills under pressure)
    because it has two consumers — the surface-vocabulary aggregate feeding
    canonicalization, then the link stage; without it Ray would re-execute
    extraction per consumer. The checkpointed variant is :func:`run_kg`
    (which persists triples/mentions to parquet instead).
    """
    cols = ["conv_id", "turn_idx", "text"]
    trip = triples_dataset(read_transcripts(input_dir, columns=cols),
                           batch_size=EXTRACT_BATCH_SIZE).materialize()
    # count() is metadata-cheap on a materialized Dataset; surfaces = 2/triple
    cmap, _ent = canonical_entities(triple_surfaces(trip),
                                    approx_rows=2 * trip.count())
    return link_triples(trip, cmap, batch_size=batch_size)


def run_kg(input_dir: str, out_dir: str, *, shards_per_wave: int = 4,
           batch_size: int = DEFAULT_BATCH_SIZE) -> dict:
    """End-to-end checkpointed run: extraction per shard wave (resumable),
    then global canonicalize + link + adjacency.

    Output layout (resumable, SURVEY §4.3)::

        out_dir/triples/part=<shard>/*.parquet     # per-shard, overwritable
        out_dir/mentions/part=<shard>/*.parquet
        out_dir/entities/*.parquet                 # global (phase B)
        out_dir/linked/*.parquet
        out_dir/adjacency/*.parquet
        out_dir/_manifest/part=<shard>.json        # lineage per shard
    """
    t0 = time.time()
    shard_paths = sorted(
        os.path.join(input_dir, p) for p in os.listdir(input_dir)
        if p.endswith(".parquet")
    )
    manifests = load_manifests(out_dir)
    pending: list[tuple[str, str, str]] = []  # (shard_name, path, fingerprint)
    skipped = 0
    for p in shard_paths:
        shard = os.path.basename(p).removesuffix(".parquet")
        fp = shard_fingerprint(p)
        if shard_is_done(out_dir, shard, fp, manifests):
            skipped += 1
        else:
            pending.append((shard, p, fp))

    rows_in = rows_out = 0
    for w0 in range(0, len(pending), shards_per_wave):
        wave = pending[w0 : w0 + shards_per_wave]
        for shard, path, fp in wave:
            tw = time.time()
            # metadata-only row counts (no extra Ray read passes)
            import pyarrow.parquet as pq
            n_in = pq.ParquetFile(path).metadata.num_rows
            ds = read_transcripts(path, columns=["conv_id", "turn_idx", "text"])
            trip = triples_dataset(ds, batch_size=EXTRACT_BATCH_SIZE)
            tdir = os.path.join(out_dir, "triples", f"part={shard}")
            shutil.rmtree(tdir, ignore_errors=True)  # recompute = overwrite (S6)
            trip.write_parquet(tdir)
            t_trip = time.time()
            ment = mentions_dataset(
                read_transcripts(path, columns=["conv_id", "turn_idx", "text"]),
                batch_size=EXTRACT_BATCH_SIZE,
            )
            mdir = os.path.join(out_dir, "mentions", f"part={shard}")
            shutil.rmtree(mdir, ignore_errors=True)
            ment.write_parquet(mdir)
            t_ment = time.time()
            n_out = sum(pq.ParquetFile(os.path.join(tdir, f)).metadata.num_rows
                        for f in os.listdir(tdir) if f.endswith(".parquet"))
            rows_in += n_in
            rows_out += n_out
            wall_ms = int((time.time() - tw) * 1000)
            write_manifest(out_dir, shard, {
                "input_fingerprint": fp,
                "input_path": path,
                "rows_in": n_in,
                "rows_out": n_out,
                "wall_ms": wall_ms,
                "stages": ["normalize", "triple_extract", "mention_detect"],
                # per-stage throughput metrics (north-star lineage item).
                # normalize is fused into the extraction pass (one read),
                # so its wall is part of the first key; the key names say
                # so rather than misattributing setup/write time.
                "stage_ms": {
                    "normalize+triple_extract": int((t_trip - tw) * 1000),
                    "mention_detect": int((t_ment - t_trip) * 1000),
                },
                "turns_per_sec": int(n_in * 1000 / max(1, wall_ms)),
            })

    # Phase B: global entity resolution over all shards' mentions + triples.
    # canonical_entities only needs the surface column (VERDICT r3 item 5 —
    # the other 4 mention columns never leave storage), and the mention row
    # count is free from parquet footers.
    tb = time.time()
    mdir = os.path.join(out_dir, "mentions")
    import pyarrow.parquet as pq
    n_mentions = sum(
        pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        for root, _dirs, files in os.walk(mdir)
        for f in files if f.endswith(".parquet"))
    mentions = rd.read_parquet(mdir, columns=["surface"])
    cmap, ent_table = canonical_entities(mentions, approx_rows=n_mentions)
    ent_dir = os.path.join(out_dir, "entities")
    shutil.rmtree(ent_dir, ignore_errors=True)  # phase B is global: overwrite
    rd.from_arrow(ent_table).write_parquet(ent_dir)
    triples = rd.read_parquet(os.path.join(out_dir, "triples"))
    linked = link_triples(triples, cmap, batch_size=batch_size)
    linked_dir = os.path.join(out_dir, "linked")
    shutil.rmtree(linked_dir, ignore_errors=True)
    linked.write_parquet(linked_dir)
    adj = adjacency(rd.read_parquet(linked_dir))
    adj_dir = os.path.join(out_dir, "adjacency")
    shutil.rmtree(adj_dir, ignore_errors=True)
    write_adjacency(adj, adj_dir)  # bucketed + sorted graph materialize
    n_adj = rd.read_parquet(adj_dir).count()

    return {
        "shards_total": len(shard_paths),
        "shards_skipped": skipped,
        "shards_processed": len(pending),
        "rows_in": rows_in,
        "triples_out": rows_out,
        "entities": ent_table.num_rows,
        "adjacency_edges": n_adj,
        "phase_b_ms": int((time.time() - tb) * 1000),
        "wall_ms": int((time.time() - t0) * 1000),
        "turns_per_sec": int(rows_in / max(1e-9, time.time() - t0)),
        "triples_per_sec": int(rows_out / max(1e-9, time.time() - t0)),
    }
