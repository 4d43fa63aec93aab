"""ECDP objective parity vs the ACTUAL reference loss methods.

The reference's ECDP losses are instance methods of PrECDPModel
(pr_ecdp_hub_model.py:128-234) that only touch self.args/self.T_image/
self.queue_length, so they are exercised here on a lightweight shim `self`
— no need to build the full model. Values AND input-gradients are compared
(input-gradient parity pins the backward formulas of sinkhorn's
stop-gradients and the KL/batchmean reduction exactly)."""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from eventpretrain_tpu.objectives.ecdp import (
    SampleQueueState,
    ecdp_kl_loss,
    global_sample_infonce,
    sample_infonce_queue,
    sinkhorn,
    vector_project,
)

from tests._torch_ref import load_reference

load_reference()


def ref_cls():
    from model.pretrain.pr_ecdp_hub_model import PrECDPModel

    return PrECDPModel


def make_shim(**kw):
    shim = types.SimpleNamespace(
        args=types.SimpleNamespace(distributed=False),
        T_image=0.1,
        queue_length=kw.get("queue_length", 16),
    )
    shim._dequeue_and_enqueue = lambda *a, **k: ref_cls()._dequeue_and_enqueue(
        shim, *a, **k
    )
    shim.sinkhorn = lambda out: ref_cls().sinkhorn(shim, out)
    for k, v in kw.items():
        setattr(shim, k, v)
    return shim


def rnd(*shape, seed=0, grad=False):
    torch.manual_seed(seed)
    t = torch.randn(*shape)
    if grad:
        t.requires_grad_(True)
    return t


def test_vector_project_parity():
    v1, v2 = rnd(4, 8, seed=1), rnd(4, 8, seed=2)
    ref = ref_cls().vector_project(make_shim(), v1, v2)
    ours = vector_project(jnp.asarray(v1.numpy()), jnp.asarray(v2.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_sinkhorn_parity():
    out = rnd(6, 5, seed=3)  # (B, K)
    ref = ref_cls().sinkhorn(make_shim(), out)
    ours = sinkhorn(jnp.asarray(out.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_kl_loss_value_and_grad_parity():
    q_t = rnd(6, 8, seed=4, grad=True)
    k_t = rnd(6, 8, seed=5, grad=True)
    shim = make_shim()
    loss_t = ref_cls().kl_loss(shim, q_t, k_t)
    loss_t.backward()

    def loss_fn(q, k):
        return ecdp_kl_loss(q, k, temperature=shim.T_image)

    q_j, k_j = jnp.asarray(q_t.detach().numpy()), jnp.asarray(
        k_t.detach().numpy()
    )
    loss_j, (gq, gk) = jax.value_and_grad(loss_fn, argnums=(0, 1))(q_j, k_j)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gq), q_t.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), k_t.grad.numpy(), atol=1e-5)


@pytest.mark.parametrize("l2_norm", [True, False])
def test_global_infonce_value_and_grad_parity(l2_norm):
    q_t = rnd(6, 8, seed=6, grad=True)
    k_t = rnd(6, 8, seed=7, grad=True)
    loss_t = ref_cls().contrastive_loss(
        make_shim(), q_t, k_t, T=0.07, l2_norm=l2_norm
    )
    loss_t.backward()
    q_j, k_j = jnp.asarray(q_t.detach().numpy()), jnp.asarray(
        k_t.detach().numpy()
    )
    loss_j, (gq, gk) = jax.value_and_grad(
        lambda q, k: global_sample_infonce(q, k, 0.07, l2_norm=l2_norm),
        argnums=(0, 1),
    )(q_j, k_j)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gq), q_t.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), k_t.grad.numpy(), atol=1e-5)


def test_queue_infonce_value_and_update_parity():
    B, C, K = 4, 8, 16
    q_t = rnd(B, C, seed=8, grad=True)
    k_t = rnd(B, C, seed=9)
    torch.manual_seed(10)
    queue_t = torch.nn.functional.normalize(torch.randn(C, K), dim=0)
    queue0 = queue_t.clone().numpy()  # the reference call mutates in place
    ptr_t = torch.zeros(1, dtype=torch.long)
    shim = make_shim(queue_length=K)
    loss_t = ref_cls().contrastive_loss_queue(
        shim, q_t, k_t, T=0.07, queue=queue_t, queue_ptr=ptr_t, l2_norm=True
    )
    loss_t.backward()

    state = SampleQueueState(
        buffer=jnp.asarray(queue0), ptr=jnp.zeros((), jnp.int32)
    )
    q_j = jnp.asarray(q_t.detach().numpy())
    k_j = jnp.asarray(k_t.numpy())

    def loss_fn(q):
        loss, _ = sample_infonce_queue(q, k_j, state, 0.07, l2_norm=True)
        return loss

    loss_j, gq = jax.value_and_grad(loss_fn)(q_j)
    _, new_state = sample_infonce_queue(q_j, k_j, state, 0.07, l2_norm=True)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gq), q_t.grad.numpy(), atol=1e-5)
    # reference mutates (queue, ptr) in place with the normalized keys
    np.testing.assert_allclose(np.asarray(new_state.buffer), queue_t.numpy(),
                               atol=1e-6)
    assert int(new_state.ptr) == int(ptr_t[0])
