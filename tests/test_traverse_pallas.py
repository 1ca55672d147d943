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
