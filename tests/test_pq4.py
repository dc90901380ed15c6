"""4-bit (fast-scan layout) PQ codes — operators/similarity.pack_codes4
/ unpack_codes4 and the packed serving path through ann_join_topk
(VERDICT r10 item 4).

The packing is a pure STORAGE transform: ksub<=16 code values
round-trip losslessly through the nibble layout, so the batched join
over a packed snapshot must emit bit-identically to the same model's
unpacked snapshot — including under the predicate and adaptive
compositions. Reference contract: find_k_nearest_neighbors
(kd_tree_database.py:285-304) served at half the code bytes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightweight_vector_database_spark.operators.similarity import (
    ivfpq_encode,
    pack_codes4,
    train_ivfpq,
    unpack_codes4,
)
from lightweight_vector_database_spark.plans.ann_join import ann_join_topk
from lightweight_vector_database_spark.sources import load_table

SF001 = "/root/testdata/sf0.01"


def test_pack_unpack_round_trip_all_widths():
    rng = np.random.RandomState(7)
    for m in (1, 2, 3, 8, 15, 16):
        codes = rng.randint(0, 16, size=(257, m))
        packed = pack_codes4(codes)
        assert all(len(b) == (m + 1) // 2 for b in packed)
        assert (unpack_codes4(packed, m) == codes).all()


def test_pack4_requires_nibble_sized_codebooks(spark):
    emb = load_table(spark, SF001, "embeddings")
    cents, books = train_ivfpq(
        emb, n_centroids=4, m=8, ksub=32, iters=1, sample_rows=512,
        sample_id_col="vec_id",
    )
    with pytest.raises(ValueError, match="pack4"):
        ivfpq_encode(emb, cents, books, pack4=True)


def test_pack_codes4_rejects_oversized_values():
    # a code >= 16 would silently bleed into the adjacent nibble
    # ([17, 1] round-trips to [1, 1]) — the packer must fail loudly
    with pytest.raises(ValueError, match="\\[0, 16\\)"):
        pack_codes4(np.array([[17, 1]]))
    with pytest.raises(ValueError, match="\\[0, 16\\)"):
        pack_codes4(np.array([[3, -1]]))
    assert pack_codes4(np.zeros((0, 4), dtype=np.int64)) == []


def test_ivfpq_search_refuses_packed_snapshot(spark, pq4_model):
    from lightweight_vector_database_spark.operators.similarity import (
        ivfpq_search,
    )

    _emb, cents, books, _unpacked, packed = pq4_model
    probe = [0.0] * len(cents[0])
    with pytest.raises(ValueError, match="ann_join_topk"):
        ivfpq_search(packed, cents, books, probe, k=3)


@pytest.fixture(scope="module")
def pq4_model(spark):
    emb = load_table(spark, SF001, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cents, books = train_ivfpq(
        emb, n_centroids=8, m=16, ksub=16, iters=3, sample_id_col="vec_id"
    )
    unpacked = ivfpq_encode(emb, cents, books).select(
        "vec_id", "label", "cell", "pq_code"
    ).cache()
    packed = ivfpq_encode(emb, cents, books, pack4=True).select(
        "vec_id", "label", "cell", "pq_code"
    ).cache()
    unpacked.count(), packed.count()
    return emb, cents, books, unpacked, packed


@pytest.fixture(scope="module")
def pq4_probes(spark, pq4_model):
    emb, *_ = pq4_model
    return emb.filter(F.col("vec_id") % 9 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("probe_vec"),
    ).cache()


def _canon(df):
    return sorted(
        (r.probe_id, r.vec_id, round(r.dist, 9), r["rank"])
        for r in df.collect()
    )


def test_packed_codes_round_trip_in_snapshot(pq4_model):
    """The stored binary column itself decodes back to the unpacked
    snapshot's codes, row for row."""
    emb, cents, books, unpacked, packed = pq4_model
    m = books.shape[0]
    want = {r["vec_id"]: list(r["pq_code"]) for r in unpacked.collect()}
    got_rows = packed.collect()
    assert len(got_rows) == len(want)
    for r in got_rows:
        assert unpack_codes4([bytes(r["pq_code"])], m)[0].tolist() == want[
            r["vec_id"]
        ]


def test_packed_serving_is_bit_identical(spark, pq4_model, pq4_probes):
    emb, cents, books, unpacked, packed = pq4_model
    kw = dict(k=5, nprobe=4, refine=8)
    a = ann_join_topk(unpacked, cents, books, pq4_probes, raw=emb, **kw)
    b = ann_join_topk(packed, cents, books, pq4_probes, raw=emb, **kw)
    assert _canon(a) == _canon(b)


def test_packed_serving_composes_with_pred_and_adaptive(
    spark, pq4_model, pq4_probes
):
    emb, cents, books, unpacked, packed = pq4_model
    kw = dict(
        k=5, nprobe=2, refine=4, pred=F.col("label") % 2 == 0,
        adaptive=True, esc_nprobe=4, esc_refine=16,
    )
    a = ann_join_topk(unpacked, cents, books, pq4_probes, raw=emb, **kw)
    b = ann_join_topk(packed, cents, books, pq4_probes, raw=emb, **kw)
    assert _canon(a) == _canon(b)


def test_maintained_packed_view_matches_reencode_and_serving(
    spark, tmp_path, pq4_model, pq4_probes
):
    """CodesSnapshot(pack4=True): the nibble-packed codes table stays
    maintainable — after a full bootstrap + an incremental CDC refresh
    the maintained packed table equals a from-scratch packed encode,
    and the batched join served from it is bit-identical to one served
    from a byte-code view of the same history."""
    from lightweight_vector_database_spark.plans.ann_maintenance import (
        CodesSnapshot,
    )
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    emb, cents, books, _unpacked, _packed = pq4_model
    v = F.col("vec_id")
    base = DeltaSnapshotStore(spark, str(tmp_path / "base"))
    packed_cs = CodesSnapshot(
        base, DeltaSnapshotStore(spark, str(tmp_path / "p4")),
        cents, books, keep_cols=("label",), pack4=True,
    )
    byte_cs = CodesSnapshot(
        base, DeltaSnapshotStore(spark, str(tmp_path / "b8")),
        cents, books, keep_cols=("label",),
    )
    base.commit_full(emb.filter(v % 4 != 3))
    packed_cs.refresh(), byte_cs.refresh()
    assert packed_cs.last_refresh_mode == "full"
    # CDC epoch: delete some, replace some, insert the held-out rows
    repl = emb.filter((v % 4 != 3) & (v % 11 == 5)).select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x * F.lit(1.02))
        .cast(emb.schema["embedding"].dataType)
        .alias("embedding"),
    )
    news = emb.filter((v % 4 == 3) & (v % 7 != 0))
    dels = (
        emb.filter((v % 7 == 0) & (v % 4 != 3))
        .select("vec_id")
        .unionByName(repl.select("vec_id"))
    )
    base.commit_mutation(append_df=repl.unionByName(news), delete_ids=dels)
    packed_cs.refresh(), byte_cs.refresh()
    assert packed_cs.last_refresh_mode == "incremental"

    scratch = CodesSnapshot(
        base, DeltaSnapshotStore(spark, str(tmp_path / "scratch")),
        cents, books, keep_cols=("label",), pack4=True,
    )
    scratch.refresh()
    got = sorted(
        (r.vec_id, r.label, r.cell, bytes(r.pq_code))
        for r in packed_cs.codes().collect()
    )
    want = sorted(
        (r.vec_id, r.label, r.cell, bytes(r.pq_code))
        for r in scratch.codes().collect()
    )
    assert got == want and len(got) > 0

    raw = base.read()
    kw = dict(k=5, nprobe=4, refine=8)
    a = ann_join_topk(
        packed_cs.codes(), cents, books, pq4_probes, raw=raw, **kw
    )
    b = ann_join_topk(
        byte_cs.codes(), cents, books, pq4_probes, raw=raw, **kw
    )
    assert _canon(a) == _canon(b)

    # the layout is part of the view identity: resuming the packed
    # store with a byte-code snapshot refuses like a retrained model
    with pytest.raises(ValueError, match="different model"):
        CodesSnapshot(
            base, DeltaSnapshotStore(spark, str(tmp_path / "p4")),
            cents, books, keep_cols=("label",),
        )


def test_pack4_maintenance_validation(spark, tmp_path, pq4_model):
    from lightweight_vector_database_spark.plans.ann_maintenance import (
        CodesSnapshot,
    )
    from lightweight_vector_database_spark.sources.delta_snapshots import (
        DeltaSnapshotStore,
    )

    emb, cents, books, *_ = pq4_model
    base = DeltaSnapshotStore(spark, str(tmp_path / "vb"))
    view = DeltaSnapshotStore(spark, str(tmp_path / "vv"))
    with pytest.raises(ValueError, match="IMI"):
        CodesSnapshot(
            base, view, None, books, pack4=True,
            imi=(np.zeros((2, 32)), np.zeros((2, 32))),
        )
    wide = np.zeros((4, 32, 16))  # ksub 32 > 16
    with pytest.raises(ValueError, match="nibble"):
        CodesSnapshot(base, view, cents, wide, pack4=True)
