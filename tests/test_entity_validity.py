"""Canonicalization validity twins (VERDICT r4 next-#6): the pinned-TRUE
oracle is only worth its rows if the audit actually REJECTS broken
clusterings — these are the mutation tests behind the kg_entities_valid /
kg_linked_valid contract entries (which run green in tests/test_oracles.py
and assert the positive direction against DuckDB)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from sema_ray.embed import HashEmbedder
from sema_ray.hashing import stable_id64
from sema_ray.pipelines import kg


def _mentions(surfaces):
    return rd.from_arrow(pa.table({
        "surface": pa.array(surfaces, pa.string())}))


def test_keys_connected_exact():
    emb = HashEmbedder()
    assert kg._keys_connected([], emb)
    assert kg._keys_connected(["acme"], emb)
    # same key / near keys connect; unrelated words do not
    assert kg._keys_connected(["acme", "acme"], emb)
    assert kg._keys_connected(["international widgets",
                               "international widget"], emb)
    assert not kg._keys_connected(["acme", "zebra"], emb)
    # chain connectivity: a-b and b-c verified, a-c not required directly
    assert kg._keys_connected(
        ["weather api", "weather apis", "weather apis v2"], emb)


def test_entity_validity_all_ok_on_clean_input(ray_session):
    surfaces = ["Acme Corp", "ACME corp.", "Acme Corporation",
                "Weather API", "Zebra Ltd", "Acme Corp"]
    out = kg.entity_validity(_mentions(surfaces)).to_pandas()
    assert sorted(out["surface"]) == sorted(set(surfaces))
    assert (out["entity_ok"] == 1).all()


def test_entity_validity_flags_bogus_merge(ray_session, monkeypatch):
    """A union-find that merges unrelated keys (a blocking/hash-collision
    fault) must be caught by the exact no-LSH connectivity recheck."""
    real = kg.build_canonical_map

    def broken(surface_counts, pairs, *a, **kw):
        out = real(surface_counts, pairs, *a, **kw)
        # force-merge Zebra into Acme's cluster, as union-find would on a
        # spurious verified pair
        acme = out["Acme Corp"]
        out["Zebra Ltd"] = acme
        return out

    monkeypatch.setattr(kg, "build_canonical_map", broken)
    surfaces = ["Acme Corp", "ACME corp.", "Zebra Ltd", "Weather API"]
    out = kg.entity_validity(_mentions(surfaces)).to_pandas()
    flags = dict(zip(out["surface"], out["entity_ok"]))
    assert flags["Zebra Ltd"] == 0
    assert flags["Acme Corp"] == 0  # whole broken cluster is flagged
    assert flags["Weather API"] == 1  # untouched cluster stays ok


def test_entity_validity_flags_wrong_rep(ray_session, monkeypatch):
    """A canonical that is not the (max count, lex-min) member violates
    the rep rule."""
    real = kg.build_canonical_map

    def broken(surface_counts, pairs, *a, **kw):
        out = real(surface_counts, pairs, *a, **kw)
        # swap the cluster's canonical to a lower-count member
        eid, _rep = out["Acme Corp"]
        for s, (e, _r) in list(out.items()):
            if e == eid:
                out[s] = (stable_id64("acme corp x"), "ACME corp.")
        return out

    monkeypatch.setattr(kg, "build_canonical_map", broken)
    # "Acme Corp" occurs twice -> it must be the rep, not "ACME corp."
    surfaces = ["Acme Corp", "Acme Corp", "ACME corp.", "Weather API"]
    out = kg.entity_validity(_mentions(surfaces)).to_pandas()
    flags = dict(zip(out["surface"], out["entity_ok"]))
    assert flags["Acme Corp"] == 0 and flags["ACME corp."] == 0
    assert flags["Weather API"] == 1


def _linked_table(rows):
    cols = {k: [] for k in ["conv_id", "turn_idx", "subj", "pred", "obj",
                            "subj_id", "obj_id", "subj_canonical",
                            "obj_canonical"]}
    for r in rows:
        for k, v in zip(cols, r):
            cols[k].append(v)
    return pa.table({
        "conv_id": pa.array(cols["conv_id"], pa.string()),
        "turn_idx": pa.array(cols["turn_idx"], pa.int64()),
        "subj": pa.array(cols["subj"], pa.string()),
        "pred": pa.array(cols["pred"], pa.string()),
        "obj": pa.array(cols["obj"], pa.string()),
        "subj_id": pa.array(cols["subj_id"], pa.int64()),
        "obj_id": pa.array(cols["obj_id"], pa.int64()),
        "subj_canonical": pa.array(cols["subj_canonical"], pa.string()),
        "obj_canonical": pa.array(cols["obj_canonical"], pa.string()),
    })


def _ids(s):
    from sema_ray.canonicalize import normalize_surface
    return stable_id64(normalize_surface(s) or s)


def test_linked_validity_clean_and_mutated(ray_session):
    a_id, w_id = _ids("Acme Corp"), _ids("Weather API")
    clean = _linked_table([
        ("c1", 0, "Acme Corp", "uses", "Weather API",
         a_id, w_id, "Acme Corp", "Weather API"),
        ("c1", 1, "ACME corp.", "uses", "Weather API",
         a_id, w_id, "Acme Corp", "Weather API"),
    ])
    out = kg.linked_triple_validity(rd.from_arrow(clean)).to_pandas()
    assert (out["link_ok"] == 1).all() and len(out) == 2

    # (a) functional dependency break: same surface, two ids
    fd = _linked_table([
        ("c1", 0, "Acme Corp", "uses", "Weather API",
         a_id, w_id, "Acme Corp", "Weather API"),
        ("c1", 1, "Acme Corp", "uses", "Weather API",
         a_id + 1, w_id, "Acme Corp", "Weather API"),
    ])
    out = kg.linked_triple_validity(rd.from_arrow(fd)).to_pandas()
    assert (out["link_ok"] == 0).all()

    # (b) id rule break: id not derived from the canonical
    idr = _linked_table([
        ("c1", 0, "Acme Corp", "uses", "Weather API",
         12345, w_id, "Acme Corp", "Weather API"),
    ])
    out = kg.linked_triple_validity(rd.from_arrow(idr)).to_pandas()
    assert (out["link_ok"] == 0).all()

    # (d) budget break: two unrelated surfaces under one entity id
    bud = _linked_table([
        ("c1", 0, "Acme Corp", "uses", "Weather API",
         a_id, w_id, "Acme Corp", "Weather API"),
        ("c1", 1, "Zebra Ltd", "uses", "Weather API",
         a_id, w_id, "Acme Corp", "Weather API"),
    ])
    out = kg.linked_triple_validity(rd.from_arrow(bud)).to_pandas()
    flags = dict(zip(out["subj"], out["link_ok"]))
    assert flags["Acme Corp"] == 0 and flags["Zebra Ltd"] == 0
