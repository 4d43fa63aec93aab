"""Tests for masking strategies (reference model/backbone/vit.py:66-105)."""

import jax
import jax.numpy as jnp
import numpy as np

from eventpretrain_tpu.ops import random_masking, make_mask_from_noise
from eventpretrain_tpu.ops.masking import density_noise, masking_noise


def test_random_masking_invariants():
    key = jax.random.key(0)
    ids_keep, mask, ids_restore = random_masking(key, 4, 196, 0.75)
    assert ids_keep.shape == (4, 49)
    assert mask.shape == (4, 196)
    assert ids_restore.shape == (4, 196)
    # mask sums: exactly L - len_keep removed per sample
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), 147.0)
    # kept positions have mask 0
    m = np.asarray(mask)
    k = np.asarray(ids_keep)
    for b in range(4):
        assert (m[b, k[b]] == 0).all()
    # ids_restore inverts ids_shuffle
    noise = jax.random.uniform(key, (4, 196))
    ids_shuffle = np.argsort(np.asarray(noise), axis=1)
    for b in range(4):
        np.testing.assert_array_equal(
            ids_shuffle[b][np.asarray(ids_restore)[b]], np.arange(196)
        )


def test_density_noise_pooling():
    # one bright patch should have the highest density
    x = jnp.zeros((1, 8, 8, 5))
    x = x.at[0, 0:4, 0:4, :].set(2.0)
    noise = density_noise(x, 4)
    assert noise.shape == (1, 4)
    n = np.asarray(noise[0])
    assert n[0] == 10.0  # |sum over 5 bins| = 10 averaged over full patch
    assert (n[1:] == 0).all()


def test_density_vs_anti_density_keep_opposite_patches():
    x = jnp.zeros((1, 8, 8, 5))
    x = x.at[0, 0:4, 0:4, :].set(1.0)
    key = jax.random.key(0)
    noise_d = masking_noise(key, x, 4, "density")
    noise_a = masking_noise(key, x, 4, "anti-density")
    ids_keep_d, _, _ = make_mask_from_noise(noise_d, 1)
    ids_keep_a, _, _ = make_mask_from_noise(noise_a, 1)
    # density keeps the least dense patch; anti-density keeps the densest
    assert int(ids_keep_d[0, 0]) != 0
    assert int(ids_keep_a[0, 0]) == 0
