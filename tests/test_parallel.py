"""Mesh data-parallel correctness on the 8-virtual-device CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.parallel import make_mesh, replicate, shard_batch
from tests.test_steps import HW, make_batch, make_states
from adaptsegnet_tpu.train.steps import make_adversarial_step


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_sharded_step_matches_single_device(rng):
    """Data-parallel multi-level step == single-device step on the same
    global batch (psum gradient identity)."""
    model, disc, state = make_states()
    step = make_adversarial_step(
        model, disc, level="multi-level", input_hw=HW, donate=False
    )
    # Global batch of 8, one per device.
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((1, 8, *HW, 3)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, 19, size=(1, 8, *HW)).astype(np.int32)),
        "target_images": jnp.asarray(
            rng.standard_normal((1, 8, *HW, 3)).astype(np.float32)),
    }

    single_state, single_metrics = step(state, batch)

    mesh = make_mesh(8)
    sharded_state = replicate(mesh, state)
    sharded_batch = shard_batch(mesh, batch, batch_axis=1)
    multi_state, multi_metrics = step(sharded_state, sharded_batch)

    for k in single_metrics:
        np.testing.assert_allclose(
            float(single_metrics[k]), float(multi_metrics[k]),
            rtol=1e-4, atol=1e-5,
        )
    for a, b in zip(jax.tree.leaves(single_state.generator.params),
                    jax.tree.leaves(multi_state.generator.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    p1, p2 = out
    assert p1.shape == (1, 32, 64, 19)
    assert p2.shape == (1, 32, 64, 19)
