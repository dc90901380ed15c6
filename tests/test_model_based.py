"""Model-based parity: random operation sequences against the Spark
facade must match a plain dict+numpy model of the reference semantics
(ids, metadata, kNN results). Seeded, bounded length."""

from __future__ import annotations

import numpy as np
import pytest

from lightweight_vector_database_spark.api import SparkVectorDatabase

DIM = 3


class DictModel:
    """The reference's semantics in ~30 lines: the trusted model."""

    def __init__(self):
        self.store: dict[int, tuple[np.ndarray, object]] = {}
        self.next_id = 0

    def insert(self, pos, meta):
        i = self.next_id
        self.next_id += 1
        self.store[i] = (np.asarray(pos, dtype=np.float32), meta)
        return i

    def delete(self, i):
        return self.store.pop(i, None)

    def update_position(self, i, pos):
        self.store[i] = (np.asarray(pos, dtype=np.float32), self.store[i][1])

    def update_metadata(self, i, meta):
        if i not in self.store:
            raise KeyError(i)
        self.store[i] = (self.store[i][0], meta)

    def knn(self, probe, k):
        p = np.asarray(probe, dtype=np.float64)
        scored = sorted(
            (float(((v.astype(np.float64) - p) ** 2).sum()), i)
            for i, (v, _) in self.store.items()
        )
        return [(i, d) for d, i in scored[:k]]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_operation_sequences(spark, seed):
    rng = np.random.RandomState(seed)
    db = SparkVectorDatabase(spark, DIM, [0.0] * DIM, [1.0] * DIM, index_depth=3)
    model = DictModel()

    for step in range(15):
        op = rng.choice(["insert", "insert", "insert", "delete", "upd_pos", "upd_meta"])
        if op == "insert" or not model.store:
            pos = rng.random(DIM).astype(np.float32)
            meta = {"step": int(step)}
            assert db.insert(pos, meta) == model.insert(pos, meta)
        elif op == "delete":
            target = int(rng.choice(sorted(model.store)))
            got, exp = db.delete(target), model.delete(target)
            assert (got is None) == (exp is None)
        elif op == "upd_pos":
            target = int(rng.choice(sorted(model.store)))
            pos = rng.random(DIM).astype(np.float32)
            db.update_position(target, pos)
            model.update_position(target, pos)
        else:
            target = int(rng.choice(sorted(model.store)))
            meta = {"upd": int(step)}
            db.update_metadata(target, meta)
            model.update_metadata(target, meta)
        assert len(db) == len(model.store)

    # final state parity: ids, metadata, kNN (ids and distances)
    assert {i for i, _ in db} == set(model.store)
    for i, entry in db:
        assert entry.metadata == model.store[i][1]
    probe = rng.random(DIM).astype(np.float32)
    res = db.find_k_nearest_neighbors(probe, 5)
    exp = model.knn(probe, 5)
    assert len(res) == len(exp)
    for (entry, dist), (exp_i, exp_d) in zip(res, exp):
        assert model.store[exp_i][1] == entry.metadata
        assert abs(dist - exp_d) < 1e-9
