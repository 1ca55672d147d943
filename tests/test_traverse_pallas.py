"""Pallas wide-packet traversal must agree with the XLA lockstep walk
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.ops.traverse import FLT_MAX, closest_hit, occlusion_test
from pathtracer_tpu.ops.traverse_pallas import (
    closest_hit_wbvh_pallas,
    occlusion_wbvh_pallas,
)
from pathtracer_tpu.scene.flatscene import build_flat_scene
from pathtracer_tpu.scene.parser import load_scene
from tests.test_traverse import random_rays, tri_soup_scene

DEAD_T = jnp.float32(-FLT_MAX)


@pytest.fixture(scope="module")
def soup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("soup_pk")
    scene = load_scene(tri_soup_scene(tmp, n=200, seed=3))
    return build_flat_scene(scene)


def _closest(flat, static, o, d, t_init):
    return closest_hit_wbvh_pallas(
        flat.bvh_wf, flat.bvh_wi, flat.bvh_wp, flat.tri_pk, o, d, t_init,
        leaf_k=static.wide_leaf_k, interpret=True,
    )


class TestPacketClosest:
    def test_matches_xla_traversal(self, soup):
        flat, static = soup
        o, d = random_rays(2048, seed=21)
        ref = closest_hit(flat, static, o, d)
        t_init = jnp.full((2048,), FLT_MAX, jnp.float32)
        t, tri, u, v = _closest(flat, static, o, d, t_init)
        ref_tri = np.asarray(ref.tri)
        hits = ref_tri >= 0
        np.testing.assert_array_equal(np.asarray(tri), ref_tri)
        np.testing.assert_allclose(
            np.asarray(t)[hits], np.asarray(ref.t)[hits], rtol=1e-5
        )

    def test_respects_t_init(self, soup):
        flat, static = soup
        o, d = random_rays(1024, seed=22)
        # with a tiny t budget nothing can beat it
        t_init = jnp.full((1024,), 1e-3, jnp.float32)
        t, tri, u, v = _closest(flat, static, o, d, t_init)
        assert (np.asarray(tri) == -1).all()

    def test_dead_sentinel_is_inert(self, soup):
        flat, static = soup
        o, d = random_rays(1024, seed=26)
        t_init = jnp.full((1024,), DEAD_T, jnp.float32)
        t, tri, u, v = _closest(flat, static, o, d, t_init)
        assert (np.asarray(tri) == -1).all()

    @pytest.mark.parametrize("dense", [1, 8, 64])
    def test_dense_top_matches(self, soup, dense):
        # dense_top D unrolls the BFS-prefix nodes 0..D-1 as a straight-
        # line preamble; any D (clamped to the node count inside) must be
        # packet-for-packet identical to the stack walk
        flat, static = soup
        o, d = random_rays(2048, seed=28)
        t_init = jnp.full((2048,), FLT_MAX, jnp.float32)
        ref_t, ref_tri, _, _ = _closest(flat, static, o, d, t_init)
        t, tri, u, v = closest_hit_wbvh_pallas(
            flat.bvh_wf, flat.bvh_wi, flat.bvh_wp, flat.tri_pk, o, d, t_init,
            leaf_k=static.wide_leaf_k, interpret=True, dense_top=dense,
        )
        np.testing.assert_array_equal(np.asarray(tri), np.asarray(ref_tri))
        hits = np.asarray(ref_tri) >= 0
        np.testing.assert_allclose(
            np.asarray(t)[hits], np.asarray(ref_t)[hits], rtol=1e-5
        )

    def test_dense_top_dead_sentinel(self, soup):
        flat, static = soup
        o, d = random_rays(1024, seed=29)
        t_init = jnp.full((1024,), DEAD_T, jnp.float32)
        t, tri, u, v = closest_hit_wbvh_pallas(
            flat.bvh_wf, flat.bvh_wi, flat.bvh_wp, flat.tri_pk, o, d, t_init,
            leaf_k=static.wide_leaf_k, interpret=True, dense_top=16,
        )
        assert (np.asarray(tri) == -1).all()

    def test_pool_padding(self, soup):
        flat, static = soup
        o, d = random_rays(1000, seed=23)  # not a multiple of 2048
        t_init = jnp.full((1000,), FLT_MAX, jnp.float32)
        t, tri, u, v = _closest(flat, static, o, d, t_init)
        assert t.shape == (1000,)
        ref = closest_hit(flat, static, o, d)
        np.testing.assert_array_equal(np.asarray(tri), np.asarray(ref.tri))


class TestPacketOcclusion:
    def test_matches_xla_occlusion(self, soup):
        flat, static = soup
        o, d = random_rays(2048, seed=24)
        des = o + d * 3.0
        ref = occlusion_test(flat, static, o, d, des)
        min_t = jnp.linalg.norm(des - o, axis=-1)
        occ = occlusion_wbvh_pallas(
            flat.bvh_wf, flat.bvh_wi, flat.tri_pk, o, d, min_t,
            jnp.zeros((2048,), bool), leaf_k=static.wide_leaf_k,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))

    def test_pre_occluded_preserved(self, soup):
        flat, static = soup
        o, d = random_rays(1024, seed=25)
        des = o + d * 3.0
        min_t = jnp.linalg.norm(des - o, axis=-1)
        pre = jnp.ones((1024,), bool)
        occ = occlusion_wbvh_pallas(
            flat.bvh_wf, flat.bvh_wi, flat.tri_pk, o, d, min_t, pre,
            leaf_k=static.wide_leaf_k, interpret=True,
        )
        assert np.asarray(occ).all()

    def test_disabled_sentinel_never_blocks(self, soup):
        flat, static = soup
        o, d = random_rays(1024, seed=27)
        min_t = jnp.full((1024,), DEAD_T, jnp.float32)
        occ = occlusion_wbvh_pallas(
            flat.bvh_wf, flat.bvh_wi, flat.tri_pk, o, d, min_t,
            jnp.zeros((1024,), bool), leaf_k=static.wide_leaf_k,
            interpret=True,
        )
        assert not np.asarray(occ).any()


class TestShadowSort:
    def test_shadow_sort_output_identical(self, soup):
        # the occlusion-pass re-sort is pure reordering (sort + un-permute);
        # results must be lane-for-lane identical with it on or off —
        # packet_auto now enables it for resident untextured scenes
        flat, static = soup
        o, d = random_rays(2048, seed=30)
        des = o + d * 2.5
        enabled = (np.arange(2048) % 3 != 0)
        res = {}
        for ss in (False, True):
            res[ss] = np.asarray(occlusion_test(
                flat, static, o, d, des, enabled=jnp.asarray(enabled),
                use_pallas=True, interpret=True, shadow_sort=ss,
            ))
        np.testing.assert_array_equal(res[True], res[False])


class TestStreamTraversal:
    """Streaming (two-level, DMA-ring) kernels must agree with the XLA
    walk.  The soup is forced onto the streaming path by shrinking the
    resident budget and the per-block budgets so it splits into many
    subtree blocks (accel/bvh.py partition_stream)."""

    @pytest.fixture(scope="class")
    def stream_soup(self, tmp_path_factory, request):
        import pathtracer_tpu.scene.flatscene as fs

        old = (fs.RESIDENT_SMEM_BUDGET, fs.STREAM_SUB_NODES, fs.STREAM_SUB_TRIS)
        fs.RESIDENT_SMEM_BUDGET = 0
        fs.STREAM_SUB_NODES, fs.STREAM_SUB_TRIS = 8, 48
        try:
            tmp = tmp_path_factory.mktemp("soup_stream")
            scene = load_scene(tri_soup_scene(tmp, n=300, seed=5))
            flat, static = build_flat_scene(scene)
        finally:
            (fs.RESIDENT_SMEM_BUDGET, fs.STREAM_SUB_NODES,
             fs.STREAM_SUB_TRIS) = old
        assert static.stream_subs > 1, "soup did not split into blocks"
        return flat, static

    def _closest_stream(self, flat, static, o, d, t_init, sort_blocks=False):
        from pathtracer_tpu.ops.traverse_pallas import closest_hit_stream_pallas

        return closest_hit_stream_pallas(
            flat.str_topf, flat.str_topl, flat.str_topp,
            flat.str_subf, flat.str_subi, flat.str_subp, flat.str_subt,
            flat.str_base, o, d, t_init,
            leaf_k=static.wide_leaf_k,
            sub_nodes=static.stream_sub_nodes,
            sub_tris=static.stream_sub_tris,
            interpret=True,
            sort_blocks=sort_blocks,
        )

    def test_partition_invariants(self, stream_soup):
        flat, static = stream_soup
        from pathtracer_tpu.accel.bvh import (
            build_bvh, collapse_wide, partition_stream, validate_stream_bvh,
        )

        tris = np.asarray(flat.tri_pk[:, 0:9]).reshape(-1, 3, 3)
        w = collapse_wide(build_bvh(tris), leaf_k=static.wide_leaf_k)
        s = partition_stream(w, 8, 48)
        assert validate_stream_bvh(s, w, tris.shape[0]) == []

    # both block schedules are checked: sort_blocks=False is the shipped
    # default (the r4 near->far sort measured out on bigbunny640k), True is
    # the A/B variant kept behind STREAM_SORT_BLOCKS
    @pytest.mark.parametrize("sort_blocks", [False, True])
    def test_closest_matches_xla(self, stream_soup, sort_blocks):
        flat, static = stream_soup
        o, d = random_rays(2048, seed=31)
        ref = closest_hit(flat, static, o, d)
        t_init = jnp.full((2048,), FLT_MAX, jnp.float32)
        t, tri, u, v = self._closest_stream(
            flat, static, o, d, t_init, sort_blocks=sort_blocks
        )
        np.testing.assert_array_equal(np.asarray(tri), np.asarray(ref.tri))
        hits = np.asarray(ref.tri) >= 0
        np.testing.assert_allclose(
            np.asarray(t)[hits], np.asarray(ref.t)[hits], rtol=1e-5
        )

    @pytest.mark.parametrize("sort_blocks", [False, True])
    def test_dead_sentinel_is_inert(self, stream_soup, sort_blocks):
        flat, static = stream_soup
        o, d = random_rays(512, seed=32)
        t_init = jnp.full((512,), DEAD_T, jnp.float32)
        t, tri, u, v = self._closest_stream(
            flat, static, o, d, t_init, sort_blocks=sort_blocks
        )
        assert (np.asarray(tri) == -1).all()

    def _closest_blockmajor(self, flat, static, o, d, t_init, chunk_rows=16):
        from pathtracer_tpu.ops.traverse_pallas import (
            closest_hit_blockmajor_pallas,
        )

        return closest_hit_blockmajor_pallas(
            flat.str_topf, flat.str_topl,
            flat.str_subf, flat.str_subi, flat.str_subp, flat.str_subt,
            flat.str_base, o, d, t_init,
            leaf_k=static.wide_leaf_k,
            sub_nodes=static.stream_sub_nodes,
            sub_tris=static.stream_sub_tris,
            interpret=True,
            chunk_rows=chunk_rows,
        )

    # chunk_rows=16 -> one packet per chunk, multiple chunks; 32 -> two
    # packets share a chunk (the per-packet walk loop + the cross-chunk
    # DMA ring handoff both get exercised)
    @pytest.mark.parametrize("chunk_rows", [16, 32])
    def test_blockmajor_matches_xla(self, stream_soup, chunk_rows):
        flat, static = stream_soup
        o, d = random_rays(4096, seed=31)
        ref = closest_hit(flat, static, o, d)
        t_init = jnp.full((4096,), FLT_MAX, jnp.float32)
        t, tri, u, v = self._closest_blockmajor(
            flat, static, o, d, t_init, chunk_rows=chunk_rows
        )
        np.testing.assert_array_equal(np.asarray(tri), np.asarray(ref.tri))
        hits = np.asarray(ref.tri) >= 0
        np.testing.assert_allclose(
            np.asarray(t)[hits], np.asarray(ref.t)[hits], rtol=1e-5
        )

    def test_blockmajor_matches_packet_major(self, stream_soup):
        """Same tables, same caps: the two schedules must agree exactly
        (the closest-hit min commutes over block order)."""
        flat, static = stream_soup
        o, d = random_rays(2048, seed=35)
        t_init = jnp.full((2048,), FLT_MAX, jnp.float32)
        a = self._closest_stream(flat, static, o, d, t_init)
        b = self._closest_blockmajor(flat, static, o, d, t_init)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_blockmajor_dead_sentinel_is_inert(self, stream_soup):
        flat, static = stream_soup
        o, d = random_rays(512, seed=32)
        t_init = jnp.full((512,), DEAD_T, jnp.float32)
        t, tri, u, v = self._closest_blockmajor(flat, static, o, d, t_init)
        assert (np.asarray(tri) == -1).all()

    def test_occlusion_matches_xla(self, stream_soup):
        flat, static = stream_soup
        from pathtracer_tpu.ops.traverse_pallas import occlusion_stream_pallas

        o, d = random_rays(2048, seed=33)
        des = o + d * 3.0
        ref = occlusion_test(flat, static, o, d, des)
        min_t = jnp.linalg.norm(des - o, axis=-1)
        occ = occlusion_stream_pallas(
            flat.str_topf, flat.str_topl, flat.str_topp,
            flat.str_subf, flat.str_subi, flat.str_subp, flat.str_subt,
            flat.str_base, o, d, min_t, jnp.zeros((2048,), bool),
            leaf_k=static.wide_leaf_k,
            sub_nodes=static.stream_sub_nodes,
            sub_tris=static.stream_sub_tris,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


class TestPacketModeSelection:
    def test_modes(self, soup):
        import dataclasses

        from pathtracer_tpu.ops.traverse import packet_mode

        flat, static = soup
        assert packet_mode(static) == "resident"
        big = dataclasses.replace(
            static, wide_nodes=10**6, num_tris=10**6, stream_subs=40
        )
        assert packet_mode(big) == "stream"
        neither = dataclasses.replace(
            static, wide_nodes=10**6, num_tris=10**6, stream_subs=0
        )
        assert packet_mode(neither) is None
