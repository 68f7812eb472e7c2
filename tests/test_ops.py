"""Kernel unit tests: exactness vs numpy (SURVEY.md §4 called these out as a
gap in the reference — its only accuracy checks were self-query smoke tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_vector_db.ops import distance as D
from tpu_vector_db.ops.scan import flat_scan_topk
from tpu_vector_db.ops.topk import top_k, merge_topk


def np_cosine(q, db):
    qn = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    dn = db / np.maximum(np.linalg.norm(db, axis=-1, keepdims=True), 1e-8)
    return qn @ dn.T


class TestDistance:
    def test_cosine_matches_numpy(self, rng):
        q = rng.standard_normal((4, 64), dtype=np.float32)
        db = rng.standard_normal((100, 64), dtype=np.float32)
        got = np.asarray(D.cosine_scores(jnp.asarray(q), jnp.asarray(db)))
        np.testing.assert_allclose(got, np_cosine(q, db), atol=1e-5)

    def test_euclidean_matches_numpy(self, rng):
        q = rng.standard_normal((3, 32), dtype=np.float32)
        db = rng.standard_normal((50, 32), dtype=np.float32)
        got = np.asarray(D.euclidean_distances(jnp.asarray(q), jnp.asarray(db)))
        want = np.linalg.norm(q[:, None, :] - db[None, :, :], axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_dot_matches_numpy(self, rng):
        q = rng.standard_normal((2, 16), dtype=np.float32)
        db = rng.standard_normal((20, 16), dtype=np.float32)
        got = np.asarray(D.dot_scores(jnp.asarray(q), jnp.asarray(db)))
        np.testing.assert_allclose(got, q @ db.T, atol=1e-5)

    def test_normalize_eps_clamp(self):
        x = jnp.zeros((2, 8))
        out = np.asarray(D.l2_normalize(x))
        assert np.all(np.isfinite(out))

    def test_pad_dim_is_score_noop(self, rng):
        q = rng.standard_normal((2, 100), dtype=np.float32)
        db = rng.standard_normal((30, 100), dtype=np.float32)
        base = np_cosine(q, db)
        got = np.asarray(D.cosine_scores(D.pad_dim(jnp.asarray(q)),
                                         D.pad_dim(jnp.asarray(db))))
        np.testing.assert_allclose(got, base, atol=1e-5)

    def test_score_conventions(self):
        s, d = D.raw_score_to_similarity_distance(0.9, "cosine")
        assert s == 0.9 and abs(d - 0.1) < 1e-9
        s, d = D.raw_score_to_similarity_distance(2.0, "euclidean")
        assert d == 2.0 and abs(s - 1 / 3) < 1e-9
        s, d = D.raw_score_to_similarity_distance(5.0, "dot_product")
        assert s == 5.0 and d == -5.0


class TestTopK:
    def test_topk_matches_numpy(self, rng):
        x = rng.standard_normal((5, 200), dtype=np.float32)
        vals, idx = top_k(jnp.asarray(x), 7)
        want = np.sort(x, axis=-1)[:, ::-1][:, :7]
        np.testing.assert_allclose(np.asarray(vals), want, atol=1e-6)
        np.testing.assert_allclose(
            np.take_along_axis(x, np.asarray(idx), axis=-1), want, atol=1e-6)

    def test_bottom_k(self, rng):
        x = rng.standard_normal((3, 50), dtype=np.float32)
        vals, _ = top_k(jnp.asarray(x), 5, largest=False)
        want = np.sort(x, axis=-1)[:, :5]
        np.testing.assert_allclose(np.asarray(vals), want, atol=1e-6)

    def test_merge_topk_equals_global(self, rng):
        a = rng.standard_normal((2, 40), dtype=np.float32)
        b = rng.standard_normal((2, 60), dtype=np.float32)
        va, ia = top_k(jnp.asarray(a), 10)
        vb, ib = top_k(jnp.asarray(b), 10)
        mv, _ = merge_topk(va, ia, vb, ib + 40, 10)
        allx = np.concatenate([a, b], axis=-1)
        want = np.sort(allx, axis=-1)[:, ::-1][:, :10]
        np.testing.assert_allclose(np.asarray(mv), want, atol=1e-6)


class TestFlatScan:
    @pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
    @pytest.mark.parametrize("n,block", [(100, 8192), (5000, 1024)])
    def test_scan_equals_bruteforce(self, rng, metric, n, block):
        d, q_n, k = 48, 3, 10
        db = rng.standard_normal((n, d), dtype=np.float32)
        q = rng.standard_normal((q_n, d), dtype=np.float32)
        n_pad = ((n + block - 1) // block) * block
        db_pad = np.zeros((n_pad, d), np.float32)
        db_pad[:n] = db
        keys, idx = flat_scan_topk(
            D.pad_dim(jnp.asarray(q)), D.pad_dim(jnp.asarray(db_pad)),
            jnp.int32(n), k, metric=metric, block_rows=block)
        keys, idx = np.asarray(keys), np.asarray(idx)

        if metric == "cosine":
            ref = np_cosine(q, db)
        elif metric == "dot_product":
            ref = q @ db.T
        else:
            ref = -np.linalg.norm(q[:, None] - db[None], axis=-1) ** 2
        want = np.sort(ref, axis=-1)[:, ::-1][:, :k]
        np.testing.assert_allclose(keys, want, atol=1e-3)
        got_scores = np.take_along_axis(ref, idx, axis=-1)
        np.testing.assert_allclose(got_scores, want, atol=1e-3)

    def test_count_masks_padding(self, rng):
        db = np.zeros((1024, 16), np.float32)
        db[:5] = rng.standard_normal((5, 16))
        q = db[:1].copy()
        keys, idx = flat_scan_topk(
            D.pad_dim(jnp.asarray(q)), D.pad_dim(jnp.asarray(db)),
            jnp.int32(5), 10, metric="cosine")
        assert np.all(np.asarray(idx)[0][np.isfinite(np.asarray(keys)[0])] < 5)
        finite = np.isfinite(np.asarray(keys)[0])
        assert finite.sum() == 5

    def test_filter_mask(self, rng):
        n, d = 64, 16
        db = rng.standard_normal((n, d), dtype=np.float32)
        q = rng.standard_normal((1, d), dtype=np.float32)
        mask = np.zeros(n, np.bool_)
        mask[10:20] = True
        keys, idx = flat_scan_topk(
            D.pad_dim(jnp.asarray(q)), D.pad_dim(jnp.asarray(db)),
            jnp.int32(n), 5, metric="cosine", filter_mask=jnp.asarray(mask))
        idx = np.asarray(idx)[0]
        keys = np.asarray(keys)[0]
        assert np.all((idx[np.isfinite(keys)] >= 10) & (idx[np.isfinite(keys)] < 20))


class TestPallasScan:
    """Interpret-mode parity of the fused kernel vs the XLA scan."""

    @pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
    def test_pallas_matches_scan(self, rng, metric):
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        n, d, qn, k = 2048, 64, 4, 10
        count = 2000
        db = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((qn, d)).astype(np.float32)
        dbj = jnp.asarray(db)
        qj = jnp.asarray(q)
        if metric == "cosine":
            dbj = D.l2_normalize(dbj)
            qj = D.l2_normalize(qj)
        sq = (jnp.sum(dbj.astype(jnp.float32) ** 2, -1)
              if metric == "euclidean" else None)
        vals, idx = pallas_flat_topk(
            qj, dbj, np.int32(count), k, metric=metric, db_sqnorms=sq,
            block_rows=512, interpret=True)
        rvals, ridx = flat_scan_topk(
            qj, dbj, jnp.int32(count), k, metric=metric, db_normalized=True,
            db_sqnorms=sq, block_rows=512)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals),
                                   atol=1e-3)
        assert (np.asarray(idx) == np.asarray(ridx)).mean() > 0.95

    def test_pallas_count_masking(self, rng):
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        db = np.zeros((1024, 128), np.float32)
        db[:5] = rng.standard_normal((5, 128))
        dbj = D.l2_normalize(jnp.asarray(db))
        vals, idx = pallas_flat_topk(
            dbj[:1], dbj, np.int32(5), 10, metric="cosine",
            block_rows=512, interpret=True)
        vals, idx = np.asarray(vals), np.asarray(idx)
        live = np.isfinite(vals[0])
        assert live.sum() == 5
        assert np.all(idx[0][live] < 5)

    @pytest.mark.parametrize("k", [10, 100])
    def test_pallas_int8_matches_scan(self, rng, k):
        """int8 capacity mode through the fused kernel: the DMA stays
        int8 (half of bf16's bytes); the kernel widens in VMEM. Keys must
        match the XLA int8 scan exactly up to bf16 query rounding."""
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        n, d, qn = 2048, 64, 4
        count = 2000
        db = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((qn, d)).astype(np.float32)
        dbj = D.l2_normalize(jnp.asarray(db))
        qj = D.l2_normalize(jnp.asarray(q))
        db8 = jnp.clip(jnp.round(dbj * 127.0), -127, 127).astype(jnp.int8)
        vals, idx = pallas_flat_topk(
            qj, db8, np.int32(count), k, metric="cosine",
            block_rows=512, interpret=True)
        rvals, ridx = flat_scan_topk(
            qj, db8, jnp.int32(count), k, metric="cosine",
            db_normalized=True, block_rows=512)
        # int8 values are integers <= 127: exact in bf16, so the only
        # divergence is the query's f32->bf16 rounding
        np.testing.assert_allclose(np.asarray(vals) / 127.0,
                                   np.asarray(rvals) / 127.0, atol=5e-3)
        # bf16 rounding swaps near-tied ranks, so gate via SCORE recall
        # (CLAUDE.md r2 lesson), not id agreement: every selected row's
        # exact f32 score must reach the f32 ground-truth k-th score
        gt = np.asarray(qj, np.float32) @ np.asarray(
            db8[:count], np.float32).T
        kth = np.sort(gt, axis=1)[:, -k]
        sel = np.take_along_axis(gt, np.asarray(idx), axis=1)
        assert np.all(sel >= kth[:, None] - 1.0), (sel.min(), kth)

    def test_pallas_k_cap(self, rng):
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        with pytest.raises(ValueError):
            pallas_flat_topk(jnp.zeros((1, 128)), jnp.zeros((512, 128)),
                             np.int32(10), 2000, interpret=True)

    @pytest.mark.parametrize("metric", ["cosine", "euclidean"])
    @pytest.mark.parametrize("k", [33, 100, 250, 600])
    def test_pallas_bigk_matches_scan(self, rng, metric, k):
        """32 < k: the bitonic-merge kernel must stay exact."""
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        n, d, qn = 4096, 64, 3
        count = 3900
        db = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((qn, d)).astype(np.float32)
        dbj, qj = jnp.asarray(db), jnp.asarray(q)
        if metric == "cosine":
            dbj, qj = D.l2_normalize(dbj), D.l2_normalize(qj)
        sq = (jnp.sum(dbj.astype(jnp.float32) ** 2, -1)
              if metric == "euclidean" else None)
        vals, idx = pallas_flat_topk(
            qj, dbj, np.int32(count), k, metric=metric, db_sqnorms=sq,
            block_rows=512, interpret=True)
        rvals, ridx = flat_scan_topk(
            qj, dbj, jnp.int32(count), k, metric=metric, db_normalized=True,
            db_sqnorms=sq, block_rows=512)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals),
                                   atol=1e-3)
        assert (np.asarray(idx) == np.asarray(ridx)).mean() > 0.95

    def test_pallas_bigk_adversarial_order(self, rng):
        """All true winners packed into ONE block / ONE segment: forces the
        multi-round extraction loop instead of the common 1-round case."""
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        n, d, k = 2048, 128, 64
        db = rng.standard_normal((n, d)).astype(np.float32) * 0.01
        # rows 256..383 (inside block 0, consecutive segments) are the
        # strongest matches, in descending strength
        q = rng.standard_normal((1, d)).astype(np.float32)
        for j in range(128):
            db[256 + j] = q[0] * (100.0 - j)
        dbj = jnp.asarray(db)
        qj = jnp.asarray(q)
        sq = jnp.sum(dbj.astype(jnp.float32) ** 2, -1)
        vals, idx = pallas_flat_topk(
            qj, dbj, np.int32(n), k, metric="euclidean", db_sqnorms=sq,
            block_rows=512, interpret=True)
        rvals, ridx = flat_scan_topk(
            qj, dbj, jnp.int32(n), k, metric="euclidean",
            db_sqnorms=sq, block_rows=512)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))

    def test_pallas_bigk_count_and_filter(self, rng):
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        n, d, k = 2048, 64, 40
        db = rng.standard_normal((n, d)).astype(np.float32)
        dbj = D.l2_normalize(jnp.asarray(db))
        mask = np.zeros(n, np.bool_)
        mask[500:560] = True
        vals, idx = pallas_flat_topk(
            dbj[:2], dbj, np.int32(n), k, metric="cosine",
            filter_mask=jnp.asarray(mask), block_rows=512, interpret=True)
        idx, vals = np.asarray(idx), np.asarray(vals)
        live = np.isfinite(vals)
        assert np.all((idx[live] >= 500) & (idx[live] < 560))
        # count masking: only 30 live rows -> 30 finite results
        vals, idx = pallas_flat_topk(
            dbj[:1], dbj, np.int32(30), k, metric="cosine",
            block_rows=512, interpret=True)
        vals, idx = np.asarray(vals), np.asarray(idx)
        assert np.isfinite(vals[0]).sum() == 30
        assert np.all(idx[0][np.isfinite(vals[0])] < 30)

    def test_pallas_filter_mask(self, rng):
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        n, d = 1024, 64
        db = rng.standard_normal((n, d)).astype(np.float32)
        dbj = D.l2_normalize(jnp.asarray(db))
        mask = np.zeros(n, np.bool_)
        mask[100:200] = True
        vals, idx = pallas_flat_topk(
            dbj[:2], dbj, np.int32(n), 5, metric="cosine",
            filter_mask=jnp.asarray(mask), block_rows=512, interpret=True)
        rvals, ridx = flat_scan_topk(
            dbj[:2], dbj, jnp.int32(n), 5, metric="cosine",
            db_normalized=True, filter_mask=jnp.asarray(mask),
            block_rows=512)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
        idx = np.asarray(idx)
        live = np.isfinite(np.asarray(vals))
        assert np.all((idx[live] >= 100) & (idx[live] < 200))

    def test_block_pick_is_query_count_aware(self):
        """r5: the merge-branch VMEM term scales with the actual query
        count (floored at 8 — Mosaic sublane padding), so batch-1 gets
        2-4x taller blocks while Q=64 picks stay EXACTLY as measured
        (B1_BLOCK_AB_r05.json: 1Mx768 b1 2.811 -> 2.659 ms at 4096;
        1.25Mx128 b1 1.071 -> 0.995 ms, plateau past 8192)."""
        from tpu_vector_db.ops.pallas_scan import pick_block_rows
        # Q=64 picks unchanged from the r2-measured table
        assert pick_block_rows(128, 2) == 4096
        assert pick_block_rows(384, 2) == 2048
        assert pick_block_rows(768, 2) == 2048
        assert pick_block_rows(1536, 2) == 1024
        # small-Q picks grow within the same 14.5MB budget
        assert pick_block_rows(768, 2, q_n=1) == 4096
        assert pick_block_rows(128, 2, q_n=1) == 16384
        assert pick_block_rows(128, 2, q_n=8) == 16384
        assert pick_block_rows(1024, 2, q_n=1) == 2048

    def test_oversized_default_block_shrinks_to_capacity(self, rng):
        """A batch-1 pick (16384 at d=128) must shrink to divide a
        4096-row-padded capacity instead of tripping the grid assert."""
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        db = rng.standard_normal((4096, 128)).astype(np.float32)
        dbj = D.l2_normalize(jnp.asarray(db))
        vals, idx = pallas_flat_topk(
            dbj[:1], dbj, np.int32(4000), 10, metric="cosine",
            interpret=True)
        rvals, ridx = pallas_flat_topk(
            dbj[:1], dbj, np.int32(4000), 10, metric="cosine",
            block_rows=512, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals))


class TestInt4Quantization:
    """int4 capacity mode (ops/quant4.py + the quant4 kernel path):
    2x int8's rows-per-chip; keys are the true scores of the dequantized
    (on-sphere for cosine) rows."""

    def test_pack_unpack_roundtrip(self, rng):
        from tpu_vector_db.ops.quant4 import pack_int4, unpack_int4
        x = rng.standard_normal((64, 256)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        packed, scales = pack_int4(jnp.asarray(x))
        assert packed.shape == (64, 128) and packed.dtype == jnp.uint8
        deq = np.asarray(unpack_int4(packed, scales))
        # normalized packing: dequantized rows sit exactly on the sphere
        np.testing.assert_allclose(np.linalg.norm(deq, axis=1), 1.0,
                                   atol=1e-5)
        # quantization error bounded by the nibble step (~1 - d*step^2/24;
        # 0.99 expected at d=256)
        cos = np.sum(deq * x, axis=1)
        assert np.all(cos > 0.98), cos.min()

    def test_dequant_sqnorms(self, rng):
        from tpu_vector_db.ops.quant4 import (dequant_sqnorms, pack_int4,
                                              unpack_int4)
        x = rng.standard_normal((32, 256)).astype(np.float32) * 3.0
        packed, scales = pack_int4(jnp.asarray(x), normalize=False)
        deq = np.asarray(unpack_int4(packed, scales))
        got = np.asarray(dequant_sqnorms(packed, scales))
        np.testing.assert_allclose(got, np.sum(deq * deq, axis=1),
                                   rtol=1e-5)

    @pytest.mark.parametrize("k", [10, 100])
    def test_pallas_int4_cosine(self, rng, k):
        """Kernel keys == numpy scores of the dequantized rows (up to bf16
        matmul rounding), and selected rows reach the f32 ground-truth
        k-th score within the int4 noise bound."""
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        from tpu_vector_db.ops.quant4 import pack_int4, unpack_int4
        n, d, qn = 2048, 256, 4
        count = 2000
        db = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((qn, d)).astype(np.float32)
        dbj = D.l2_normalize(jnp.asarray(db))
        qj = D.l2_normalize(jnp.asarray(q))
        packed, scales = pack_int4(dbj)
        vals, idx = pallas_flat_topk(
            qj, packed, np.int32(count), k, metric="cosine",
            db_scales=scales, block_rows=512, interpret=True)
        vals, idx = np.asarray(vals), np.asarray(idx)

        deq = np.asarray(unpack_int4(packed, scales), np.float32)
        gt_deq = np.asarray(qj, np.float32) @ deq[:count].T
        sel_deq = np.take_along_axis(gt_deq, idx, axis=1)
        np.testing.assert_allclose(vals, sel_deq, atol=5e-3)

        gt = np.asarray(qj, np.float32) @ np.asarray(
            dbj[:count], np.float32).T
        kth = np.sort(gt, axis=1)[:, -k]
        sel = np.take_along_axis(gt, idx, axis=1)
        assert np.all(sel >= kth[:, None] - 0.05), (sel.min(), kth)

    def test_pallas_int4_euclidean(self, rng):
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        from tpu_vector_db.ops.quant4 import (dequant_sqnorms, pack_int4,
                                              unpack_int4)
        n, d, qn, k = 1024, 256, 3, 10
        db = rng.standard_normal((n, d)).astype(np.float32) * 2.0
        q = rng.standard_normal((qn, d)).astype(np.float32)
        packed, scales = pack_int4(jnp.asarray(db), normalize=False)
        sq = dequant_sqnorms(packed, scales)
        vals, idx = pallas_flat_topk(
            jnp.asarray(q), packed, np.int32(n), k, metric="euclidean",
            db_scales=scales, db_sqnorms=sq, block_rows=512,
            interpret=True)
        vals, idx = np.asarray(vals), np.asarray(idx)
        # keys are -(||q - deq||^2)
        deq = np.asarray(unpack_int4(packed, scales))
        d2 = ((q[:, None, :] - deq[None, :, :]) ** 2).sum(-1)
        sel = np.take_along_axis(-d2, idx, axis=1)
        np.testing.assert_allclose(vals, sel, rtol=1e-2, atol=0.3)

    def test_pallas_int4_rejects_narrow_dim(self, rng):
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        with pytest.raises(ValueError, match="256"):
            pallas_flat_topk(
                jnp.zeros((1, 128)), jnp.zeros((512, 64), jnp.uint8),
                np.int32(10), 5, db_scales=jnp.ones((512,)),
                interpret=True)

    def test_scales_only_for_int4(self, rng):
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        with pytest.raises(ValueError, match="scales"):
            pallas_flat_topk(
                jnp.zeros((1, 256)), jnp.zeros((512, 256)),
                np.int32(10), 5, db_scales=jnp.ones((512,)),
                interpret=True)
