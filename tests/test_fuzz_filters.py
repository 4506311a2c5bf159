"""Randomized filter-tree fuzz: compile_filter vs a python-dict oracle.

Random $and/$or/$eq/$ne/$in/$nin/$gt/$gte/$lt/$lte/$contains trees over
random typed metadata (categorical, boolean, numeric, set-valued),
checked row by row against a direct python evaluation.
"""

from __future__ import annotations

import numpy as np
import pytest

from rag_dpo_tpu.index.metadata import MetadataStore, compile_filter

_NATURES = ["GUIDE", "SANCTION", "DOCTRINE", "TECHNIQUE"]
_TOPICS = ["registre", "aipd", "cookies", "sanctions", "transfert"]


def _rand_docs(rng, n):
    docs = []
    for i in range(n):
        docs.append({
            "nature": str(rng.choice(_NATURES)),
            "is_priority": bool(rng.integers(0, 2)),
            "importance": float(rng.integers(1, 11)),
            "rgpd_topics": list(rng.choice(
                _TOPICS, size=rng.integers(0, 4), replace=False)),
        })
    return docs


def _oracle(doc, node):
    if "$and" in node:
        return all(_oracle(doc, sub) for sub in node["$and"])
    if "$or" in node:
        return any(_oracle(doc, sub) for sub in node["$or"])
    for key, cond in node.items():
        if not isinstance(cond, dict):
            cond = {"$eq": cond}
        v = doc.get(key)
        for op, val in cond.items():
            if op == "$eq":
                if v != val:
                    return False
            elif op == "$ne":
                if v == val:
                    return False
            elif op == "$in":
                if v not in val:
                    return False
            elif op == "$nin":
                if v in val:
                    return False
            elif op == "$contains":
                if val not in (v or []):
                    return False
            elif op in ("$gt", "$gte", "$lt", "$lte"):
                if v is None:
                    return False
                import operator as _op

                f = {"$gt": _op.gt, "$gte": _op.ge,
                     "$lt": _op.lt, "$lte": _op.le}[op]
                if not f(float(v), float(val)):
                    return False
    return True


def _rand_filter(rng, depth=0):
    r = rng.integers(0, 8 if depth else 6)
    if r == 0 and depth < 2:
        return {"$and": [_rand_filter(rng, depth + 1)
                         for _ in range(rng.integers(2, 4))]}
    if r == 1 and depth < 2:
        return {"$or": [_rand_filter(rng, depth + 1)
                        for _ in range(rng.integers(2, 4))]}
    if r == 2:
        return {"nature": str(rng.choice(_NATURES))}
    if r == 3:
        return {"is_priority": bool(rng.integers(0, 2))}
    if r == 4:
        op = str(rng.choice(["$gt", "$gte", "$lt", "$lte"]))
        return {"importance": {op: float(rng.integers(1, 11))}}
    if r == 5:
        return {"rgpd_topics":
                {"$contains": str(rng.choice(_TOPICS))}}
    if r == 6:
        return {"nature": {"$in": list(rng.choice(
            _NATURES, size=rng.integers(1, 3), replace=False))}}
    return {"nature": {"$ne": str(rng.choice(_NATURES))}}


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_filter_compiler(seed):
    rng = np.random.default_rng(seed)
    docs = _rand_docs(rng, int(rng.integers(10, 60)))
    store = MetadataStore()
    store.append(docs)
    for _ in range(25):
        where = _rand_filter(rng)
        mask = compile_filter(store, where)
        want = np.asarray([_oracle(d, where) for d in docs])
        assert mask is not None
        np.testing.assert_array_equal(
            mask, want, err_msg=f"seed {seed} filter {where}")
